"""Spatial-autocorrelation statistics over a sparse regular grid.

Getis-Ord Gi* hot-spot scores and global Moran's I, the two classic
"where is activity significantly clustered" analyses a geospatial engine
is expected to ship (reference scope: the engine-side tile analytics of
SURVEY.md §2.2 N5-N7; the reference itself stops at per-tile aggregation,
these extend the same grid model to neighborhood statistics).

Both operators take a *sparse* grid of observed cells ``(gi, gj, value)``
— the output shape of a cell-count aggregation or ``idw_grid``, with ONE
row per cell and ``gj`` canonical in ``[0, nlon)`` (the neighbor scatter
wraps longitudes modulo ``nlon``, so a cell indexed at ``gj = -1`` would
never receive its own neighborhood; wrap with ``pmod`` upstream) — with
binary weights over the 3x3 neighborhood (longitudes wrap modulo
``nlon``, latitudes clamp at the poles). Missing cells are simply not
neighbors: on sparse data the population is "observed cells", the
standard formulation for event grids.

Exactness contract (repo-wide convention, see tiles.tile_trend): values
are re-quantized to their declared fixed point so every distributed sum
(neighbor sums, global moments, cross-products) is an INTEGER sum —
bit-exact under any partitioning — and the final statistic is one
closed-form double expression evaluated with a fixed association, then
floor-rounded. Gi* and Moran's I are scale-invariant in x, so the
quantization scale cancels and never appears in the result.

Scale shape: one 9x (8x for Moran) explode + one groupBy keyed on the
target cell (map-side combined), a semi/inner join back to observed
cells, and a broadcast of the single global-moment row. Shuffle volume
is O(9 * cells), never O(cells^2); no UDF, no window, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


_DEC = "decimal(38,0)"


def _neighbor_scatter(
    cells: DataFrame,
    nlon: int,
    gi_col: str,
    gj_col: str,
    value_col: str,
    val_dp: int,
    include_self: bool,
    bin_col: str | None = None,
) -> DataFrame:
    """Scatter each observed cell's quantized value to its 3x3 neighbor
    positions; returns (gi, gj[, _b], _v) rows addressed to the
    *receiving* cell. Longitude wraps modulo ``nlon``; out-of-range
    latitudes are emitted and later dropped by the join back to observed
    cells. With ``bin_col`` the scatter stays within the time bin (the
    space-TIME neighborhood of emerging-hotspot analysis is spatial-only
    per slice)."""
    v = F.floor(
        F.col(value_col) * F.lit(float(10 ** val_dp)) + F.lit(0.5)
    ).cast("long")
    offsets = [
        (di, dj)
        for di in (-1, 0, 1)
        for dj in (-1, 0, 1)
        if include_self or (di, dj) != (0, 0)
    ]
    offs = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di, dj in offsets
    ])
    bins = [F.col(bin_col).alias("_b")] if bin_col else []
    src = cells.select(
        F.col(gi_col).alias("_i"), F.col(gj_col).alias("_j"),
        *bins, v.alias("_v"),
    )
    keep = ["_b"] if bin_col else []
    return (
        src.select("_i", "_j", *keep, "_v", F.explode(offs).alias("_o"))
        .select(
            (F.col("_i") + F.col("_o.di")).alias("gi"),
            F.pmod(F.col("_j") + F.col("_o.dj"), F.lit(nlon)).alias("gj"),
            *keep,
            "_v",
        )
    )


def _quantized(cells: DataFrame, gi_col: str, gj_col: str,
               value_col: str, val_dp: int,
               bin_col: str | None = None) -> DataFrame:
    v = F.floor(
        F.col(value_col) * F.lit(float(10 ** val_dp)) + F.lit(0.5)
    ).cast("long")
    bins = [F.col(bin_col).alias("_b")] if bin_col else []
    return cells.select(
        F.col(gi_col).alias("gi"), F.col(gj_col).alias("gj"),
        *bins, v.alias("_x")
    )


def getis_ord_gi(
    cells: DataFrame,
    nlon: int,
    gi_col: str = "gi",
    gj_col: str = "gj",
    value_col: str = "value",
    val_dp: int = 2,
    out_dp: int = 6,
    bin_col: str | None = None,
) -> DataFrame:
    """Getis-Ord Gi* per observed cell (Ord & Getis 1995, the ArcGIS
    "hot spot analysis" statistic) with binary 3x3 weights including
    self:

        Gi* = (S1_i - xbar*W_i)
              / ( S * sqrt((n*W_i - W_i^2) / (n-1)) )

    where S1_i is the neighborhood value sum, W_i the count of observed
    neighbors (incl. self), xbar/S the global mean/std over observed
    cells. Positive scores are hot spots, negative are cold spots;
    |Gi*| > 1.96 is the usual 95% significance cut.

    With ``bin_col`` the whole computation runs independently PER TIME
    BIN (neighborhoods, moments, and the population n are per-slice) —
    the per-slice stage of emerging-hotspot analysis.

    Plan: neighbor scatter + one groupBy for (S1_i, W_i), a broadcast
    join of the per-bin (or single) global-moment row, one projection.
    Returns ([bin,] gi, gj, x, w_i, s1, gi_star) with null gi_star when
    the variance is degenerate (all cells equal, or n < 2). ``x`` and
    ``s1`` are exact longs on the quantized scale
    (``value * 10^val_dp``); Gi* is scale-invariant, so the statistic
    itself is on the natural scale.
    """
    q = _quantized(cells, gi_col, gj_col, value_col, val_dp, bin_col)
    keys = (["_b"] if bin_col else []) + ["gi", "gj"]
    nb = (
        _neighbor_scatter(cells, nlon, gi_col, gj_col, value_col, val_dp,
                          include_self=True, bin_col=bin_col)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("w_i"), F.sum("_v").alias("s1"))
        .join(q, keys)
    )
    gb = q.groupBy("_b") if bin_col else q.groupBy()
    glob = gb.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sv"),
        F.sum(F.col("_x").cast(_DEC) * F.col("_x")).alias("_svv"),
    )
    n = F.col("_n").cast("double")
    sv = F.col("_sv").cast("double")
    svv = F.col("_svv").cast("double")
    w = F.col("w_i").cast("double")
    s1 = F.col("s1").cast("double")
    xbar = sv / n
    s = F.sqrt(F.greatest(svv / n - xbar * xbar, F.lit(0.0)))
    den = s * F.sqrt((n * w - w * w) / (n - F.lit(1.0)))
    p = F.lit(float(10 ** out_dp))
    joined = (nb.join(F.broadcast(glob), "_b") if bin_col
              else nb.join(F.broadcast(glob)))
    head = [F.col("_b").alias(bin_col)] if bin_col else []
    return joined.select(
        *head,
        "gi", "gj", F.col("_x").alias("x"), "w_i", "s1",
        F.when(
            (F.col("_n") > 1) & (den > 0.0),
            F.floor((s1 - xbar * w) / den * p + F.lit(0.5)) / p,
        ).alias("gi_star"),
    )


def morans_i(
    cells: DataFrame,
    nlon: int,
    gi_col: str = "gi",
    gj_col: str = "gj",
    value_col: str = "value",
    val_dp: int = 2,
    out_dp: int = 6,
) -> DataFrame:
    """Global Moran's I over the observed cells with symmetric binary
    3x3 weights (self excluded):

        I = (n / S0) * sum_ij w_ij (x_i-xbar)(x_j-xbar)
                     / sum_i (x_i-xbar)^2

    Computed from exact integer moments via the expansion

        num = CP - 2*xbar*RS + xbar^2*S0

    where CP = sum_ij w_ij x_i x_j, RS = sum_i W_i x_i and S0 = sum_i W_i
    (weights are symmetric, so the row- and column-weighted sums are both
    RS). Every moment is an integer sum — CP accumulates as
    DECIMAL(38,0) — so the result is bit-stable under any partitioning.

    Returns ONE row (n_cells, s0, morans_i, expected_i); morans_i is
    null when the variance or S0 is degenerate. expected_i = -1/(n-1) is
    the no-autocorrelation reference value.
    """
    q = _quantized(cells, gi_col, gj_col, value_col, val_dp)
    nbagg = (
        _neighbor_scatter(cells, nlon, gi_col, gj_col, value_col, val_dp,
                          include_self=False)
        .groupBy("gi", "gj")
        .agg(F.count(F.lit(1)).alias("_wn"), F.sum("_v").alias("_nsn"))
    )
    # left join: cells with no observed neighbor keep _w = 0 and still
    # contribute to the global moments
    allc = q.join(nbagg, ["gi", "gj"], "left").select(
        "gi", "gj",
        F.coalesce(F.col("_wn"), F.lit(0)).alias("_w"),
        F.coalesce(F.col("_nsn"), F.lit(0).cast("long")).alias("_ns"),
        "_x",
    )
    agg = allc.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("_w").alias("s0"),
        F.sum("_x").alias("_sv"),
        F.sum(F.col("_x").cast(_DEC) * F.col("_x")).alias("_svv"),
        F.sum(F.col("_x").cast(_DEC) * F.col("_ns")).alias("_cp"),
        F.sum(F.col("_x").cast(_DEC) * F.col("_w")).alias("_rs"),
    )
    n = F.col("n_cells").cast("double")
    s0 = F.col("s0").cast("double")
    sv = F.col("_sv").cast("double")
    svv = F.col("_svv").cast("double")
    cp = F.col("_cp").cast("double")
    rs = F.col("_rs").cast("double")
    xbar = sv / n
    num = cp - F.lit(2.0) * xbar * rs + xbar * xbar * s0
    den = svv - sv * sv / n
    p = F.lit(float(10 ** out_dp))
    return agg.select(
        "n_cells", "s0",
        F.when(
            (F.col("s0") > 0) & (den > 0.0),
            F.floor(n / s0 * num / den * p + F.lit(0.5)) / p,
        ).alias("morans_i"),
        F.when(
            F.col("n_cells") > 1,
            F.floor(F.lit(-1.0) / (n - F.lit(1.0)) * p + F.lit(0.5)) / p,
        ).alias("expected_i"),
    )


def emerging_hotspots(
    cells: DataFrame,
    nlon: int,
    bin_col: str = "t_bin",
    gi_col: str = "gi",
    gj_col: str = "gj",
    value_col: str = "value",
    val_dp: int = 2,
    hot_z: float = 1.96,
    out_dp: int = 6,
) -> DataFrame:
    """Emerging hot-spot analysis (the ESRI space-time pattern mining
    tool, simplified): per-time-bin Gi* scores, then a Mann-Kendall
    trend over each cell's score sequence

        MK_S = sum over bin pairs (t1 < t2) of sign(z_t2 - z_t1)

    and a deterministic classification: new / intensifying / diminishing
    / persistent / sporadic hot (symmetrically cold) or none, keyed off
    whether the LAST bin is significant (|z| > hot_z), how many bins
    were, and the trend sign.

    Oracle-parity note: gi_star is floor-rounded to ``out_dp`` BEFORE the
    sign comparisons, so MK_S and the classification depend only on
    already-exact values — a SQL oracle reproduces them bit-for-bit.

    Scale shape: the per-bin Gi* stage is the binned scatter (shuffle
    O(9 * cell-bins)); the MK pair join is keyed on the cell and costs
    O(bins^2) rows per cell — bins is a small constant (weeks, months),
    so this is linear in cells. Degenerate slices (null gi_star) are
    excluded from both the trend and the bin counts.

    Returns (gi, gj, n_bins, n_hot, n_cold, mk_s, last_z, category).
    """
    z = getis_ord_gi(
        cells, nlon, gi_col=gi_col, gj_col=gj_col, value_col=value_col,
        val_dp=val_dp, out_dp=out_dp, bin_col=bin_col,
    ).filter(F.col("gi_star").isNotNull()) \
     .select(F.col(bin_col).alias("_t"), "gi", "gj", "gi_star")
    a = z.select("gi", "gj", F.col("_t").alias("_t1"),
                 F.col("gi_star").alias("_z1"))
    b = z.select("gi", "gj", F.col("_t").alias("_t2"),
                 F.col("gi_star").alias("_z2"))
    mk = (
        a.join(b, ["gi", "gj"])
        .filter(F.col("_t1") < F.col("_t2"))
        .groupBy("gi", "gj")
        .agg(F.sum(
            F.signum(F.col("_z2") - F.col("_z1")).cast("long")
        ).alias("mk_s"))
    )
    hz = F.lit(float(hot_z))
    per = z.groupBy("gi", "gj").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum((F.col("gi_star") > hz).cast("long")).alias("n_hot"),
        F.sum((F.col("gi_star") < -hz).cast("long")).alias("n_cold"),
        F.max_by("gi_star", "_t").alias("last_z"),
    )
    out = per.join(mk, ["gi", "gj"], "left").select(
        "gi", "gj", "n_bins", "n_hot", "n_cold",
        F.coalesce(F.col("mk_s"), F.lit(0).cast("long")).alias("mk_s"),
        "last_z",
    )
    n_hot, n_cold = F.col("n_hot"), F.col("n_cold")
    last = F.col("last_z")
    mk_s = F.col("mk_s")
    cat = (
        F.when((n_hot > 0) & (last > hz) & (n_hot == 1), "new_hot")
        .when((n_hot > 0) & (last > hz) & (mk_s > 0), "intensifying_hot")
        .when((n_hot > 0) & (last > hz) & (mk_s < 0), "diminishing_hot")
        .when((n_hot > 0) & (last > hz), "persistent_hot")
        .when(n_hot > 0, "sporadic_hot")
        .when((n_cold > 0) & (last < -hz) & (n_cold == 1), "new_cold")
        .when((n_cold > 0) & (last < -hz) & (mk_s < 0),
              "intensifying_cold")
        .when((n_cold > 0) & (last < -hz) & (mk_s > 0),
              "diminishing_cold")
        .when((n_cold > 0) & (last < -hz), "persistent_cold")
        .when(n_cold > 0, "sporadic_cold")
        .otherwise("none")
    )
    return out.withColumn("category", cat)


def local_morans(
    cells: DataFrame,
    nlon: int,
    gi_col: str = "gi",
    gj_col: str = "gj",
    value_col: str = "value",
    val_dp: int = 2,
    out_dp: int = 6,
) -> DataFrame:
    """Local Moran's I (Anselin 1995 LISA) per observed cell with binary
    3x3 weights (self excluded) — the cluster/outlier map that pairs
    with the global ``morans_i``:

        I_i = n * (x_i - xbar) * sum_j w_ij (x_j - xbar)
                / sum_k (x_k - xbar)^2

    Exact-arithmetic form: with quantized integer values x, S = sum x,
    the n-scaled deviations n*z_i = n*x_i - S and n-scaled lag
    n*L_i = n*NS_i - W_i*S (NS_i = neighbor sum, W_i = neighbor count)
    are integers, and

        I_i = n * (n*z_i) * (n*L_i) / (n^2*sum x^2 - n*S^2)

    — every term an integer (DECIMAL(38,0) products), one double
    division at the end, floor-rounded. The quadrant label classifies
    the (deviation, lag) signs: HH/LL clusters, HL/LH outliers, NS when
    either side is exactly zero or the cell has no observed neighbor.

    Plan: identical to ``morans_i`` — one 8x scatter + groupBy, a left
    join back (isolated cells keep W_i = 0), a broadcast of the single
    global-moment row. Shuffle O(8 * cells); no UDF, no window.
    """
    q = _quantized(cells, gi_col, gj_col, value_col, val_dp)
    nbagg = (
        _neighbor_scatter(cells, nlon, gi_col, gj_col, value_col, val_dp,
                          include_self=False)
        .groupBy("gi", "gj")
        .agg(F.count(F.lit(1)).alias("_wn"), F.sum("_v").alias("_nsn"))
    )
    allc = q.join(nbagg, ["gi", "gj"], "left").select(
        "gi", "gj",
        F.coalesce(F.col("_wn"), F.lit(0)).alias("_w"),
        F.coalesce(F.col("_nsn"), F.lit(0).cast("long")).alias("_ns"),
        "_x",
    )
    glob = allc.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sv"),
        F.sum(F.col("_x").cast(_DEC) * F.col("_x")).alias("_svv"),
    )
    joined = allc.join(F.broadcast(glob))
    n_d = F.col("_n").cast(_DEC)
    nz = n_d * F.col("_x") - F.col("_sv").cast(_DEC)          # n*z_i
    nlag = n_d * F.col("_ns") - F.col("_w").cast(_DEC) * F.col("_sv")
    den = (
        n_d * n_d * F.col("_svv")
        - n_d * F.col("_sv").cast(_DEC) * F.col("_sv")
    )
    p = F.lit(float(10 ** out_dp))
    lisa = (
        F.col("_n").cast("double")
        * nz.cast("double") * nlag.cast("double") / den.cast("double")
    )
    quadrant = (
        F.when((F.col("_w") == 0) | (nz == 0) | (nlag == 0), "NS")
        .when((nz > 0) & (nlag > 0), "HH")
        .when((nz < 0) & (nlag < 0), "LL")
        .when((nz > 0) & (nlag < 0), "HL")
        .otherwise("LH")
    )
    return joined.select(
        "gi", "gj", F.col("_x").alias("x"), F.col("_w").alias("w_i"),
        F.when(
            (F.col("_n") > 1) & (den > 0),
            F.floor(lisa * p + F.lit(0.5)) / p,
        ).alias("lisa_i"),
        quadrant.alias("quadrant"),
    )
