"""Cell-index unit tests (N1/N2): round-trips, hierarchy containment,
locality, and the Spark UDF surface."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bufr2geojson_spark.functions import cells as C


def _grid(n=500, seed=3):
    rng = np.random.RandomState(seed)  # test-only randomness, seeded
    lat = rng.uniform(-89.5, 89.5, n)
    lon = rng.uniform(-180.0, 180.0, n)
    return lat, lon


def test_s2_roundtrip_center():
    lat, lon = _grid()
    for level in (5, 10, 14, 20, C.MAX_LEVEL):
        cell = C.s2_encode(lat, lon, level)
        assert (C.s2_level(cell) == level).all()
        clat, clon = C.s2_center(cell)
        again = C.s2_encode(clat, clon, level)
        assert (again == cell).all()


def test_s2_hierarchy_containment():
    lat, lon = _grid()
    child = C.s2_encode(lat, lon, 16)
    for pl in (4, 8, 12, 15):
        parent = C.s2_parent(child, pl)
        assert (C.s2_level(parent) == pl).all()
        # parent of the point directly equals parent-of-child
        direct = C.s2_encode(lat, lon, pl)
        assert (direct == parent).all()
        # child id within parent's [lo, hi] range
        lsb = np.int64(1) << np.int64(2 * (C.MAX_LEVEL - pl))
        lo = parent - (lsb - 1)
        hi = parent + (lsb - 1)
        assert ((child >= lo) & (child <= hi)).all()


def test_s2_ids_positive_and_face_bits():
    lat, lon = _grid()
    cell = C.s2_encode(lat, lon, 14)
    assert (cell > 0).all()
    faces = cell >> 57
    assert set(np.unique(faces)) <= {0, 1, 2, 3, 4, 5}
    # all six faces reachable
    biglat, biglon = _grid(5000, seed=11)
    faces = np.unique(C.s2_encode(biglat, biglon, 5) >> 57)
    assert len(faces) == 6


def test_s2_locality():
    """Nearby points share coarse ancestors (Hilbert locality)."""
    lat = np.array([51.47, 51.4701])
    lon = np.array([-9.42, -9.4201])
    a, b = C.s2_encode(lat, lon, 12)
    assert a == b


def test_hex_roundtrip_and_parent():
    lat, lon = _grid()
    for res in (3, 7, 11):
        cell = C.hex_encode(lat, lon, res)
        assert (C.hex_res(cell) == res).all()
        clat, clon = C.hex_center(cell)
        assert (C.hex_encode(clat, clon, res) == cell).all()
        parent = C.hex_parent(cell, res - 2)
        # child center lies inside parent (H3 parent semantics)
        assert (C.hex_encode(clat, clon, res - 2) == parent).all()


def test_hex_and_s2_distinct_id_spaces():
    lat, lon = _grid(100)
    hx = C.hex_encode(lat, lon, 7)
    s2 = C.s2_encode(lat, lon, 14)
    assert (hx >> 62 == 1).all()
    assert (s2 >> 62 == 0).all()


def test_with_cells_spark(spark):
    import pandas as pd

    lat, lon = _grid(200)
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    out = df.transform(C.with_cells).toPandas()
    exp_s2 = C.s2_encode(lat, lon, 14)
    exp_hx = C.hex_encode(lat, lon, 7)
    got = out.sort_values(["lat", "lon"]).reset_index(drop=True)
    ref = (
        pd.DataFrame({"lat": lat, "lon": lon, "s2": exp_s2, "hx": exp_hx})
        .sort_values(["lat", "lon"])
        .reset_index(drop=True)
    )
    assert (got["cell_s2"].to_numpy() == ref["s2"].to_numpy()).all()
    assert (got["cell_h3"].to_numpy() == ref["hx"].to_numpy()).all()
    assert (got["cell_prefix"].to_numpy() == (ref["s2"].to_numpy() >> 48)).all()


def test_s2_parent_col_matches_numpy(spark):
    import pandas as pd

    lat, lon = _grid(200)
    cell = C.s2_encode(lat, lon, 14)
    df = spark.createDataFrame(pd.DataFrame({"cell": cell}))
    out = df.select(
        C.s2_parent_col(F.col("cell"), 8).alias("p")
    ).toPandas()["p"].to_numpy()
    # JVM bit math == numpy bit math (order-insensitive compare)
    assert sorted(out) == sorted(C.s2_parent(cell, 8))


def test_zorder_key_matches_python_interleave(spark):
    """zorder_key must equal the reference bit-interleave for arbitrary
    32-bit inputs, and preserve 2-D locality ordering on a grid."""
    from pyspark.sql import functions as F
    from bufr2geojson_spark.functions.cells import zorder_key

    def morton(a, b):
        a &= 0x7FFFFFFF
        b &= 0x7FFFFFFF
        out = 0
        for i in range(31):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    vals = [(0, 0), (1, 0), (0, 1), (123456789, 987654321),
            (0x7FFFFFFF, 0), (0, 0x7FFFFFFF), (0xDEADBEEF, 0xCAFEBABE)]
    df = spark.createDataFrame(vals, "a long, b long").select(
        "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z"))
    for r in df.collect():
        assert r.z == morton(r.a, r.b), (r.a, r.b)
        assert r.z >= 0  # sign bit never set -> sort order == z order


class TestGeohash:
    def test_published_vectors(self, spark):
        from bufr2geojson_spark.functions.cells import geohash_col

        df = spark.createDataFrame(
            [(42.605, -5.603), (57.64911, 10.40744)], "lat double, lon double")
        out = df.select(
            F.col("lat"),
            geohash_col(F.col("lat"), F.col("lon"), 5).alias("g5"),
            geohash_col(F.col("lat"), F.col("lon"), 11).alias("g11"),
        ).collect()
        by_lat = {r["lat"]: r for r in out}
        assert by_lat[42.605]["g5"] == "ezs42"
        assert by_lat[57.64911]["g11"] == "u4pruydqqvj"

    def test_prefix_property(self, spark):
        from bufr2geojson_spark.functions.cells import geohash_col

        rows = [(float((i * 37) % 170 - 85 + 0.3), float((i * 53) % 350 - 175 + 0.7))
                for i in range(200)]
        df = spark.createDataFrame(rows, "lat double, lon double")
        bad = df.select(
            (F.substring(geohash_col(F.col("lat"), F.col("lon"), 9), 1, 4)
             != geohash_col(F.col("lat"), F.col("lon"), 4)).alias("mismatch")
        ).filter("mismatch").count()
        assert bad == 0

    def test_domain_edges_clamp(self, spark):
        from bufr2geojson_spark.functions.cells import geohash_col

        df = spark.createDataFrame(
            [(90.0, 180.0), (-90.0, -180.0)], "lat double, lon double")
        out = [r[0] for r in df.select(
            geohash_col(F.col("lat"), F.col("lon"), 6)).collect()]
        assert sorted(out) == ["000000", "zzzzzz"]

    def test_pure_jvm_plan(self, spark):
        from bufr2geojson_spark.functions.cells import geohash_col

        df = spark.createDataFrame([(1.0, 2.0)], "lat double, lon double")
        plan = (df.select(geohash_col(F.col("lat"), F.col("lon"), 7))
                ._jdf.queryExecution().executedPlan().toString())
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_bad_precision_raises(self, spark):
        from bufr2geojson_spark.functions.cells import geohash_col

        with pytest.raises(ValueError):
            geohash_col(F.lit(0.0), F.lit(0.0), 13)
