"""Spatial-autocorrelation operators: Getis-Ord Gi* and Moran's I
(operators/hotspot.py) against an independent dense-numpy reference, plus
degenerate / invariance properties."""

import math

import numpy as np
import pytest

from bufr2geojson_spark.operators.hotspot import getis_ord_gi, morans_i

NLON = 8  # small wrap modulus so wrap cases are easy to construct


def _cells_df(spark, cells):
    return spark.createDataFrame(
        [(gi, gj, float(x)) for gi, gj, x in cells],
        "gi int, gj int, value double",
    )


def _neighbors(cells, include_self):
    """Dense reference: observed-cell 3x3 neighborhoods with lon wrap."""
    idx = {(gi, gj): x for gi, gj, x in cells}
    out = {}
    for gi, gj, _ in cells:
        nb = []
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if not include_self and (di, dj) == (0, 0):
                    continue
                key = (gi + di, (gj + dj) % NLON)
                if key in idx:
                    nb.append(idx[key])
        out[(gi, gj)] = nb
    return out


def _ref_gi_star(cells):
    xs = np.array([float(x) for _, _, x in cells])
    n = len(xs)
    xbar = xs.sum() / n
    s = math.sqrt(max((xs * xs).sum() / n - xbar * xbar, 0.0))
    nbs = _neighbors(cells, include_self=True)
    out = {}
    for (gi, gj, _x) in cells:
        nb = nbs[(gi, gj)]
        w = len(nb)
        den = s * math.sqrt((n * w - w * w) / (n - 1))
        num = sum(nb) - xbar * w
        out[(gi, gj)] = num / den if den > 0 else None
    return out


def _ref_morans_i(cells):
    xs = np.array([float(x) for _, _, x in cells])
    n = len(xs)
    xbar = xs.mean()
    z = {(gi, gj): x - xbar for gi, gj, x in cells}
    nbs = _neighbors(cells, include_self=False)
    num = sum(
        z[(gi, gj)] * (nb - xbar)
        for gi, gj, _x in cells
        for nb in nbs[(gi, gj)]
    )
    s0 = sum(len(v) for v in nbs.values())
    den = float(((xs - xbar) ** 2).sum())
    return (n / s0) * num / den if s0 and den else None


CELLS = [
    # a hot 2x2 block...
    (10, 1, 9.0), (10, 2, 8.0), (11, 1, 7.0), (11, 2, 9.0),
    # ...a pair straddling the antimeridian (gj 7 and 0 are neighbors)...
    (20, 7, 5.0), (20, 0, 6.0),
    # ...and scattered cold singletons
    (30, 4, 1.0), (40, 2, 1.0), (50, 6, 2.0),
]


class TestGetisOrdGi:
    def test_matches_dense_reference(self, spark):
        got = {
            (r["gi"], r["gj"]): r["gi_star"]
            for r in getis_ord_gi(_cells_df(spark, CELLS), NLON).collect()
        }
        ref = _ref_gi_star(CELLS)
        assert set(got) == set(ref)
        for k, v in ref.items():
            assert got[k] == pytest.approx(v, abs=1e-6), k

    def test_wrap_neighborhood_counted(self, spark):
        rows = {
            (r["gi"], r["gj"]): r
            for r in getis_ord_gi(_cells_df(spark, CELLS), NLON).collect()
        }
        # (20,7) and (20,0) see each other across the wrap: w_i = 2
        assert rows[(20, 7)]["w_i"] == 2 and rows[(20, 0)]["w_i"] == 2
        # s1 is on the val_dp=2 fixed-point scale: (5.0 + 6.0) * 100
        assert rows[(20, 7)]["s1"] == 1100 and rows[(20, 0)]["s1"] == 1100

    def test_hot_block_scores_highest(self, spark):
        rows = getis_ord_gi(_cells_df(spark, CELLS), NLON).collect()
        top = max(rows, key=lambda r: r["gi_star"])
        assert (top["gi"], top["gj"]) in {(10, 1), (10, 2), (11, 1), (11, 2)}
        cold = {r["gi_star"] for r in rows if r["gi"] in (30, 40, 50)}
        assert all(v < 0 for v in cold)

    def test_scale_invariance(self, spark):
        """Gi* is invariant to a uniform rescaling of x (the property
        that lets the fixed-point quantization cancel)."""
        scaled = [(gi, gj, x * 100.0) for gi, gj, x in CELLS]
        a = getis_ord_gi(_cells_df(spark, CELLS), NLON, val_dp=2)
        b = getis_ord_gi(_cells_df(spark, scaled), NLON, val_dp=0)
        ga = {(r["gi"], r["gj"]): r["gi_star"] for r in a.collect()}
        gb = {(r["gi"], r["gj"]): r["gi_star"] for r in b.collect()}
        for k in ga:
            assert ga[k] == pytest.approx(gb[k], abs=2e-6)

    def test_constant_field_is_null(self, spark):
        flat = [(gi, gj, 5.0) for gi, gj, _ in CELLS]
        rows = getis_ord_gi(_cells_df(spark, flat), NLON).collect()
        assert all(r["gi_star"] is None for r in rows)

    def test_single_cell_is_null(self, spark):
        rows = getis_ord_gi(_cells_df(spark, [(3, 3, 7.0)]), NLON).collect()
        assert len(rows) == 1 and rows[0]["gi_star"] is None

    def test_partitioning_invariance(self, spark):
        df = _cells_df(spark, CELLS)
        a = getis_ord_gi(df.coalesce(1), NLON).collect()
        b = getis_ord_gi(df.repartition(7), NLON).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestMoransI:
    def test_matches_dense_reference(self, spark):
        row = morans_i(_cells_df(spark, CELLS), NLON).collect()[0]
        ref = _ref_morans_i(CELLS)
        assert row["n_cells"] == len(CELLS)
        assert row["morans_i"] == pytest.approx(ref, abs=1e-6)
        assert row["expected_i"] == pytest.approx(-1 / (len(CELLS) - 1),
                                                  abs=1e-6)

    def test_clustered_field_positive(self, spark):
        # smooth gradient: neighbors alike -> strong positive I
        cells = [(i, j, float(10 * i + j)) for i in range(4)
                 for j in range(4)]
        row = morans_i(_cells_df(spark, cells), NLON).collect()[0]
        assert row["morans_i"] > 0.3

    def test_stripes_negative(self, spark):
        # horizontal stripes, not a checkerboard: under queen (8-neighbor)
        # weights a checkerboard's diagonal neighbors AGREE and mostly
        # cancel the rook disagreement (dense ref: -0.14); stripes
        # disagree on 6 of 8 neighbors (dense ref: -0.43)
        cells = [(i, j, float(i % 2)) for i in range(4) for j in range(4)]
        row = morans_i(_cells_df(spark, cells), NLON).collect()[0]
        assert row["morans_i"] == pytest.approx(_ref_morans_i(cells),
                                                abs=1e-6)
        assert row["morans_i"] < -0.3

    def test_isolated_cells_keep_global_moments(self, spark):
        # two far-apart cells: no neighbor pairs -> s0 = 0 -> null I,
        # but both cells still counted
        row = morans_i(
            _cells_df(spark, [(0, 0, 1.0), (50, 4, 9.0)]), NLON
        ).collect()[0]
        assert row["n_cells"] == 2 and row["s0"] == 0
        assert row["morans_i"] is None
        assert row["expected_i"] == pytest.approx(-1.0, abs=1e-6)


def _floor6(v):
    return math.floor(v * 1e6 + 0.5) / 1e6


def _ref_emerging(binned, hot_z):
    """Dense reference of the whole emerging-hotspot pipeline: per-bin
    Gi* (rounded to 6dp like the engine), Mann-Kendall over the rounded
    scores, same classification CASE."""
    by_bin = {}
    for b, gi, gj, x in binned:
        by_bin.setdefault(b, []).append((gi, gj, x))
    z = {}  # (gi, gj) -> [(bin, z6)]
    for b, cells in by_bin.items():
        ref = _ref_gi_star(cells)
        for k, v in ref.items():
            if v is not None:
                z.setdefault(k, []).append((b, _floor6(v)))
    out = {}
    for k, seq in z.items():
        seq.sort()
        zs = [v for _, v in seq]
        mk = sum(
            (zs[j] > zs[i]) - (zs[j] < zs[i])
            for i in range(len(zs)) for j in range(i + 1, len(zs))
        )
        n_hot = sum(v > hot_z for v in zs)
        n_cold = sum(v < -hot_z for v in zs)
        last = zs[-1]
        if n_hot > 0 and last > hot_z and n_hot == 1:
            cat = "new_hot"
        elif n_hot > 0 and last > hot_z and mk > 0:
            cat = "intensifying_hot"
        elif n_hot > 0 and last > hot_z and mk < 0:
            cat = "diminishing_hot"
        elif n_hot > 0 and last > hot_z:
            cat = "persistent_hot"
        elif n_hot > 0:
            cat = "sporadic_hot"
        elif n_cold > 0 and last < -hot_z and n_cold == 1:
            cat = "new_cold"
        elif n_cold > 0 and last < -hot_z and mk < 0:
            cat = "intensifying_cold"
        elif n_cold > 0 and last < -hot_z and mk > 0:
            cat = "diminishing_cold"
        elif n_cold > 0 and last < -hot_z:
            cat = "persistent_cold"
        elif n_cold > 0:
            cat = "sporadic_cold"
        else:
            cat = "none"
        out[k] = (len(zs), n_hot, n_cold, mk, last, cat)
    return out


class TestEmergingHotspots:
    # scattered singleton background plus a ramping "city" cell and a
    # fading one; 5 time bins
    BACKGROUND = [(10 * i, (3 * i) % NLON) for i in range(2, 12)]
    CITY = (55, 3)
    FADE = (75, 5)

    def _binned(self):
        rows = []
        ramp = [5.0, 10.0, 20.0, 40.0, 80.0]
        for b in range(5):
            for gi, gj in self.BACKGROUND:
                rows.append((b, gi, gj, 5.0))
            rows.append((b, *self.CITY, ramp[b]))
            rows.append((b, *self.FADE, ramp[4 - b]))
        return rows

    def _df(self, spark, rows):
        return spark.createDataFrame(
            [(b, gi, gj, float(x)) for b, gi, gj, x in rows],
            "t_bin int, gi int, gj int, value double",
        )

    def test_matches_dense_reference(self, spark):
        from bufr2geojson_spark.operators.hotspot import emerging_hotspots

        rows = self._binned()
        got = {
            (r["gi"], r["gj"]):
                (r["n_bins"], r["n_hot"], r["n_cold"], r["mk_s"],
                 r["last_z"], r["category"])
            for r in emerging_hotspots(
                self._df(spark, rows), NLON, hot_z=1.5).collect()
        }
        ref = _ref_emerging(rows, hot_z=1.5)
        assert set(got) == set(ref)
        for k in ref:
            rb, rh, rc, rmk, rlast, rcat = ref[k]
            gb, gh, gc, gmk, glast, gcat = got[k]
            assert (gb, gh, gc, gmk, gcat) == (rb, rh, rc, rmk, rcat), k
            assert glast == pytest.approx(rlast, abs=1e-9), k

    def test_city_intensifies_fade_fades(self, spark):
        from bufr2geojson_spark.operators.hotspot import emerging_hotspots

        got = {
            (r["gi"], r["gj"]): r
            for r in emerging_hotspots(
                self._df(spark, self._binned()), NLON, hot_z=1.5).collect()
        }
        city, fade = got[self.CITY], got[self.FADE]
        assert city["category"] == "intensifying_hot"
        assert city["mk_s"] > 0
        assert fade["mk_s"] < 0
        assert fade["category"] in ("sporadic_hot", "diminishing_hot")
        # background never significant
        for k in self.BACKGROUND:
            assert got[k]["category"] == "none", k

    def test_binned_single_bin_equals_unbinned(self, spark):
        from bufr2geojson_spark.operators.hotspot import getis_ord_gi

        one = [(0, gi, gj, x) for gi, gj, x in CELLS]
        binned = getis_ord_gi(
            self._df(spark, one), NLON, val_dp=2, bin_col="t_bin"
        ).drop("t_bin")
        plain = getis_ord_gi(_cells_df(spark, CELLS), NLON, val_dp=2)
        assert sorted(map(tuple, binned.collect())) == \
            sorted(map(tuple, plain.collect()))


def _ref_local_morans(cells):
    xs = np.array([float(x) for _, _, x in cells])
    n = len(xs)
    xbar = xs.mean()
    m2 = float(((xs - xbar) ** 2).sum()) / n
    nbs = _neighbors(cells, include_self=False)
    out = {}
    for gi, gj, x in cells:
        lag = sum(v - xbar for v in nbs[(gi, gj)])
        out[(gi, gj)] = ((x - xbar) * lag / m2) if m2 > 0 else None
    return out


class TestLocalMorans:
    def test_matches_dense_reference(self, spark):
        from bufr2geojson_spark.operators.hotspot import local_morans

        got = {
            (r["gi"], r["gj"]): r
            for r in local_morans(_cells_df(spark, CELLS), nlon=NLON,
                                  val_dp=2).collect()
        }
        ref = _ref_local_morans(CELLS)
        assert set(got) == set(ref)
        for k, want in ref.items():
            assert got[k]["lisa_i"] == pytest.approx(want, abs=2e-5), k

    def test_quadrant_labels(self, spark):
        from bufr2geojson_spark.operators.hotspot import local_morans

        got = {
            (r["gi"], r["gj"]): r["quadrant"]
            for r in local_morans(_cells_df(spark, CELLS), nlon=NLON,
                                  val_dp=2).collect()
        }
        # the hot 2x2 block members are high values in high neighborhoods
        assert got[(10, 1)] == "HH" and got[(11, 2)] == "HH"
        # isolated cells (no observed neighbor) are NS
        assert got[(30, 4)] == "NS" and got[(40, 2)] == "NS"

    def test_constant_field_is_null(self, spark):
        from bufr2geojson_spark.operators.hotspot import local_morans

        flat = [(gi, gj, 3.0) for gi, gj, _ in CELLS]
        rows = local_morans(_cells_df(spark, flat), nlon=NLON).collect()
        assert all(r["lisa_i"] is None for r in rows)
        assert all(r["quadrant"] == "NS" for r in rows)

    def test_partitioning_invariance(self, spark):
        from bufr2geojson_spark.operators.hotspot import local_morans

        a = local_morans(_cells_df(spark, CELLS).repartition(1),
                         nlon=NLON).orderBy("gi", "gj").collect()
        b = local_morans(_cells_df(spark, CELLS).repartition(13),
                         nlon=NLON).orderBy("gi", "gj").collect()
        assert a == b
