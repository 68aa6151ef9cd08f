"""Trajectory analytics over (entity, timestamp, lat, lon) point streams.

The geospatial engine's moving-object surface: per-entity track statistics
(distance / speed) and dwell ("stay-point") detection. Both are single-pass
window computations — ONE hash shuffle on the entity id, everything else
whole-stage-codegen window/lag/aggregate — so the plan is the 100 TB shape:
shuffle volume is the point stream itself (once), state per entity is O(1)
for stats and O(points-in-one-dwell) for stops, and skewed entities (one
device emitting millions of pings) stay correct because windows stream
within a partition.

Determinism / oracle parity: segment speed over a non-positive time delta
is NULL (excluded from max/avg on both engines); window order is
(ts, tiebreak id) so duplicate timestamps cannot reorder between runs.
Everything SUMMED is fixed-point integer (hop lengths floor-quantized to
``SEG_DP`` = 2 dp, centroids summed at 1e-6) — the ``idw_grid`` trick — so
aggregates are bit-exact under any partitioning or aggregation order and a
SQL oracle reproduces them exactly; min/max/count are order-independent
already. Float outputs pass through floor-form ``round_dp``.

No analogue in the reference (single-station observation ETL,
`/root/reference/bufr2geojson/__init__.py`); this extends the engine the
way its N-operators (SURVEY.md §2.2) extend decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bufr2geojson_spark.operators.spatial import haversine_col
from bufr2geojson_spark.operators.textops import round_dp

# hop lengths are floor-quantized to this many decimals (2 dp = 10 m) so
# distance totals are exact integer sums under any aggregation order
SEG_DP = 2


def _ts_seconds(points: DataFrame, col: str):
    """Epoch seconds as double. TIMESTAMP_NTZ (what parquet scans yield)
    cannot be cast to a number directly; read it as UTC wall time — the
    same semantics as DuckDB's ``epoch()`` on its naive TIMESTAMP."""
    if dict(points.dtypes).get(col) == "timestamp_ntz":
        return F.to_utc_timestamp(F.col(col), "UTC").cast("double")
    return F.col(col).cast("double")


def _segments(
    points: DataFrame,
    id_col: str,
    ts_col: str,
    lat_col: str,
    lon_col: str,
    seq_col: str,
) -> DataFrame:
    """Per-point incoming segment: previous point's (ts, lat, lon) and the
    haversine length / duration / speed of the hop. First point of each
    entity has NULL segment fields. One window = one shuffle on id.
    ``seg_km`` is floor-quantized to ``SEG_DP`` (2 dp = 10 m) so every
    downstream sum can be an exact integer sum."""
    w = Window.partitionBy(id_col).orderBy(F.col(ts_col), F.col(seq_col))
    pts = points.withColumn("_ts_s", _ts_seconds(points, ts_col))
    prev_ts = F.lag(ts_col).over(w)
    prev_ts_s = F.lag("_ts_s").over(w)
    prev_lat = F.lag(lat_col).over(w)
    prev_lon = F.lag(lon_col).over(w)
    dt_s = F.col("_ts_s") - F.col("prev_ts_s")
    seg_km = round_dp(
        haversine_col(prev_lat, prev_lon, F.col(lat_col), F.col(lon_col)),
        SEG_DP,
    )
    speed = F.when(
        F.col("dt_s") > 0, F.col("seg_km") / (F.col("dt_s") / 3600.0)
    )  # NULL on first point and on non-positive deltas
    return (
        pts.withColumn("prev_ts", prev_ts)
        .withColumn("prev_ts_s", prev_ts_s)
        .withColumn("dt_s", dt_s)
        .withColumn("seg_km", seg_km)
        .withColumn("speed_kmh", speed)
    )


def track_stats(
    points: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    seq_col: str = "event_id",
    dp: int = 4,
) -> DataFrame:
    """Per-entity track summary: point/segment counts, total haversine
    distance, longest hop, max and overall average speed.

    ``avg_kmh`` is total distance over total elapsed time (first→last ts),
    not the mean of segment speeds — the quantity a fleet/telemetry user
    actually wants. Entities whose track has no positive elapsed time get
    NULL speeds. Output rounded to ``dp`` for exact oracle comparison.

    Plan: one shuffle (window on id) + the groupBy reuses the same hash
    partitioning, so Catalyst plans a single Exchange. At 100 TB: shuffle
    = one pass of the point stream; no driver state; AQE handles entity
    skew (a window partition streams, it does not materialize).
    """
    seg = _segments(points, id_col, ts_col, lat_col, lon_col, seq_col)
    elapsed = F.max(F.col("_ts_s")) - F.min(F.col("_ts_s"))
    # exact integer sum of the 2dp-quantized hops (order-independent)
    seg_e2 = F.sum(
        F.floor(F.col("seg_km") * F.lit(float(10 ** SEG_DP)) + F.lit(0.5))
        .cast("long")
    )
    total_km = seg_e2.cast("double") / F.lit(float(10 ** SEG_DP))
    out = seg.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.count("seg_km").alias("n_segments"),
        round_dp(total_km, dp).alias("total_km"),
        round_dp(F.max("seg_km"), dp).alias("max_hop_km"),
        round_dp(F.max("speed_kmh"), dp).alias("max_kmh"),
        round_dp(
            F.when(elapsed > 0, total_km / (elapsed / 3600.0)), dp
        ).alias("avg_kmh"),
    )
    return out


def detect_stops(
    points: DataFrame,
    max_speed_kmh: float = 5.0,
    min_dwell_s: float = 600.0,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    seq_col: str = "event_id",
    dp: int = 4,
) -> DataFrame:
    """Dwell episodes (stay-points): maximal runs of consecutive slow hops.

    A hop is *slow* when its speed is defined and ≤ ``max_speed_kmh``.
    Episode boundaries come from the classic gaps-and-islands cumulative
    sum (no iteration): ``episode = running count of non-slow points``,
    computed in the SAME window (and thus the same shuffle) as the lag.
    An episode spans from its first hop's predecessor timestamp to its
    last point; it is kept when that span ≥ ``min_dwell_s``. The reported
    centroid is the mean of the slow hops' endpoints (rounded ``dp``).

    Plan: one shuffle on id for both windows + the final groupBy
    (same key ⇒ Catalyst reuses the partitioning), then a row_number
    window for the per-entity stop sequence. State per entity is one
    running counter — safe for arbitrarily long tracks.
    """
    seg = _segments(points, id_col, ts_col, lat_col, lon_col, seq_col)
    slow = (
        F.col("speed_kmh").isNotNull()
        & (F.col("speed_kmh") <= F.lit(float(max_speed_kmh)))
    )
    w = Window.partitionBy(id_col).orderBy(F.col(ts_col), F.col(seq_col))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg = seg.withColumn("is_slow", slow).withColumn(
        "episode",
        F.sum(F.when(F.col("is_slow"), 0).otherwise(1)).over(run),
    )
    ep = (
        seg.filter("is_slow")
        .groupBy(id_col, "episode")
        .agg(
            F.min("prev_ts").alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            round_dp(
                F.max(F.col("_ts_s")) - F.min(F.col("prev_ts_s")), dp
            ).alias("dwell_s"),
            # centroid over fixed-point 1e-6 coordinates: exact integer
            # sums, so the mean is aggregation-order-independent
            round_dp(
                F.sum(
                    F.floor(F.col(lat_col) * 1e6 + F.lit(0.5)).cast("long")
                ).cast("double") / 1e6 / F.count(F.lit(1)), dp
            ).alias("c_lat"),
            round_dp(
                F.sum(
                    F.floor(F.col(lon_col) * 1e6 + F.lit(0.5)).cast("long")
                ).cast("double") / 1e6 / F.count(F.lit(1)), dp
            ).alias("c_lon"),
            F.count(F.lit(1)).alias("n_hops"),
        )
        .filter(F.col("dwell_s") >= F.lit(float(min_dwell_s)))
    )
    wseq = Window.partitionBy(id_col).orderBy("start_ts", "episode")
    return ep.withColumn("stop_seq", F.row_number().over(wseq)).select(
        id_col, "stop_seq", "start_ts", "end_ts", "dwell_s",
        "c_lat", "c_lon", "n_hops",
    )


def od_flows(
    stops: DataFrame,
    grid_deg: float = 2.0,
    id_col: str = "user_id",
    dp: int = 2,
) -> DataFrame:
    """Origin–destination flow matrix between dwell locations — the
    mobility-analytics aggregate over ``detect_stops`` output: each
    entity's consecutive stops form a trip; trips are binned by the
    origin/destination grid cell of the stop centroids and aggregated
    into (flow count, mean transit seconds).

    Plan: one lead-window shuffle on the entity id, then a groupBy on the
    4-part cell key — the flow matrix is tiny relative to the stop table,
    so the second shuffle carries map-side-combined partials. Transit
    times are exact integer-second epoch differences, so their sum (and
    the floor-rounded mean) is aggregation-order-independent.
    """
    g = float(grid_deg)
    w = Window.partitionBy(id_col).orderBy("stop_seq")
    end_s = _ts_seconds(stops, "end_ts")
    t = (
        stops.withColumn("_end_s", end_s)
        .withColumn("_start_s", _ts_seconds(stops, "start_ts"))
    )
    t = (
        t.withColumn("_n_lat", F.lead("c_lat").over(w))
        .withColumn("_n_lon", F.lead("c_lon").over(w))
        .withColumn("_n_start_s", F.lead("_start_s").over(w))
        .filter(F.col("_n_lat").isNotNull())
    )

    def cell(lat, lon):
        return (
            F.floor((lat + 90.0) / g).cast("int"),
            F.floor((lon + 180.0) / g).cast("int"),
        )

    o_gi, o_gj = cell(F.col("c_lat"), F.col("c_lon"))
    d_gi, d_gj = cell(F.col("_n_lat"), F.col("_n_lon"))
    transit = F.col("_n_start_s") - F.col("_end_s")
    return (
        t.select(
            o_gi.alias("o_gi"), o_gj.alias("o_gj"),
            d_gi.alias("d_gi"), d_gj.alias("d_gj"),
            transit.alias("_transit"),
        )
        .groupBy("o_gi", "o_gj", "d_gi", "d_gj")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            round_dp(
                F.sum("_transit") / F.count(F.lit(1)), dp
            ).alias("avg_transit_s"),
        )
    )


def track_similarity(
    points: DataFrame,
    grid_deg: float = 1.0,
    min_jaccard: float = 0.0,
    min_shared: int = 1,
    max_users_per_cell: int | None = None,
    id_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    dp: int = 6,
) -> DataFrame:
    """Co-traveler detection: pairwise Jaccard similarity between the
    *sets of grid cells* each entity visited. The spatial twin of the
    n-gram Jaccard dedup operator (textops.ngram_jaccard_pairs): an
    inverted index cell -> entities generates candidate pairs, so cost is
    O(sum over cells of users^2-in-cell), never O(entities^2).

    Scale levers: ``max_users_per_cell`` drops cells hotter than the cap
    from PAIR GENERATION only (an airport cell shared by every entity
    adds no discriminating signal but quadratic pairs — the classic
    stopword cut); the per-entity cell-set size still counts all cells,
    so Jaccard stays a true upper bound when the cap binds. Shuffles:
    distinct on (entity, cell), the bounded self-join keyed on the cell,
    one groupBy per pair — all map-side combinable.

    Returns (user_a, user_b, shared_cells, cells_a, cells_b, jaccard)
    with user_a < user_b, filtered to >= min_shared and >= min_jaccard.
    """
    g = float(grid_deg)
    cells = (
        points.select(
            F.col(id_col).alias("u"),
            F.floor((F.col(lat_col) + 90.0) / g).cast("int").alias("gi"),
            F.floor((F.col(lon_col) + 180.0) / g).cast("int").alias("gj"),
        )
        .distinct()
    )
    sizes = cells.groupBy("u").agg(F.count(F.lit(1)).alias("n_cells"))
    idx = cells
    if max_users_per_cell is not None:
        hot = (
            cells.groupBy("gi", "gj")
            .agg(F.count(F.lit(1)).alias("_nu"))
            .filter(F.col("_nu") > int(max_users_per_cell))
            .select("gi", "gj")
        )
        idx = cells.join(hot, ["gi", "gj"], "left_anti")
    a = idx.select("gi", "gj", F.col("u").alias("user_a"))
    b = idx.select("gi", "gj", F.col("u").alias("user_b"))
    pairs = (
        a.join(b, ["gi", "gj"])
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("shared_cells"))
        .filter(F.col("shared_cells") >= int(min_shared))
    )
    out = (
        pairs
        .join(sizes.withColumnsRenamed({"u": "user_a",
                                        "n_cells": "cells_a"}), "user_a")
        .join(sizes.withColumnsRenamed({"u": "user_b",
                                        "n_cells": "cells_b"}), "user_b")
    )
    jac = F.col("shared_cells").cast("double") / (
        F.col("cells_a") + F.col("cells_b") - F.col("shared_cells")
    ).cast("double")
    return (
        out.select(
            "user_a", "user_b", "shared_cells", "cells_a", "cells_b",
            round_dp(jac, dp).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= float(min_jaccard))
    )


def detect_convoys(
    points: DataFrame,
    grid_deg: float = 1.0,
    bin_s: int = 3600,
    min_run: int = 2,
    max_users_per_cell: int | None = None,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Convoy / travelling-companion detection: entity pairs co-located
    in the same grid cell for at least ``min_run`` CONSECUTIVE time bins
    (the convoy-query pattern of the moving-object literature — stricter
    than cell-set Jaccard, which ignores time).

    Plan: distinct (entity, bin, cell) presence -> pair generation keyed
    on (bin, cell) (cost proportional to co-located pairs per bin, never
    entities^2; ``max_users_per_cell`` caps pathological cells the same
    way as ``track_similarity``) -> per-pair longest consecutive run via
    gaps-and-islands (bin - row_number is constant within a run). The
    window and both follow-up groupBys share the pair hash partitioning,
    so the run analysis adds no extra shuffle.

    Returns (user_a, user_b, n_bins_together, longest_run, first_bin,
    last_bin) filtered to longest_run >= min_run.
    """
    g = float(grid_deg)
    pres = (
        points.select(
            F.col(id_col).alias("u"),
            F.floor(_ts_seconds(points, ts_col) / float(bin_s))
             .cast("long").alias("b"),
            F.floor((F.col(lat_col) + 90.0) / g).cast("int").alias("gi"),
            F.floor((F.col(lon_col) + 180.0) / g).cast("int").alias("gj"),
        )
        .distinct()
    )
    if max_users_per_cell is not None:
        hot = (
            pres.groupBy("b", "gi", "gj")
            .agg(F.count(F.lit(1)).alias("_nu"))
            .filter(F.col("_nu") > int(max_users_per_cell))
            .select("b", "gi", "gj")
        )
        pres = pres.join(hot, ["b", "gi", "gj"], "left_anti")
    a = pres.select("b", "gi", "gj", F.col("u").alias("user_a"))
    bb = pres.select("b", "gi", "gj", F.col("u").alias("user_b"))
    # a pair may share several cells in one bin -> collapse to one row
    together = (
        a.join(bb, ["b", "gi", "gj"])
        .filter(F.col("user_a") < F.col("user_b"))
        .select("user_a", "user_b", "b")
        .distinct()
    )
    w = Window.partitionBy("user_a", "user_b").orderBy("b")
    runs = (
        together
        .withColumn("_isl", F.col("b") - F.row_number().over(w))
        .groupBy("user_a", "user_b", "_isl")
        .agg(
            F.count(F.lit(1)).alias("_run"),
            F.min("b").alias("_rfirst"),
            F.max("b").alias("_rlast"),
        )
        .groupBy("user_a", "user_b")
        .agg(
            F.sum("_run").alias("n_bins_together"),
            F.max("_run").alias("longest_run"),
            F.min("_rfirst").alias("first_bin"),
            F.max("_rlast").alias("last_bin"),
        )
        .filter(F.col("longest_run") >= int(min_run))
    )
    return runs


def speed_anomalies(
    points: DataFrame,
    max_kmh: float = 900.0,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    seq_col: str = "event_id",
    dp: int = 4,
) -> DataFrame:
    """Impossible-travel detection: hops whose implied speed exceeds
    ``max_kmh`` (the classic telemetry-integrity / account-compromise
    analytic — two pings too far apart for the elapsed time).

    Pure segment filter: the one ``_segments`` window shuffle, then a
    codegen filter+projection — nothing else. The speed is derived from
    the 2 dp-quantized hop length and the exact epoch-second delta, so
    the threshold comparison is bit-identical on any engine and under
    any partitioning. Emits one row per offending hop with both
    endpoints' timestamps and the landing coordinates.
    """
    seg = _segments(points, id_col, ts_col, lat_col, lon_col, seq_col)
    return seg.filter(F.col("speed_kmh") > F.lit(float(max_kmh))).select(
        id_col,
        F.col(seq_col),
        "prev_ts",
        F.col(ts_col),
        F.col("dt_s"),
        "seg_km",
        round_dp(F.col("speed_kmh"), dp).alias("speed_kmh"),
        F.col(lat_col),
        F.col(lon_col),
    )


def detect_trips(
    points: DataFrame,
    max_gap_s: float = 21600.0,
    min_km: float = 0.0,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    seq_col: str = "event_id",
    dp: int = 4,
) -> DataFrame:
    """Trip segmentation: maximal runs of consecutive hops whose time
    delta is ≤ ``max_gap_s`` (the dual of ``detect_stops`` — split the
    track where the device went dark, summarize each continuous journey).

    Same gaps-and-islands shape as ``detect_stops``: the episode counter
    is a running sum in the SAME window (same shuffle) as the lag; the
    per-trip aggregate reuses the partitioning. Trip distance is the
    exact integer sum of the 2 dp-quantized hops (order-independent);
    ``avg_kmh`` is trip distance over first→last elapsed time. Trips
    shorter than ``min_km`` are dropped.
    """
    seg = _segments(points, id_col, ts_col, lat_col, lon_col, seq_col)
    linked = (
        F.col("dt_s").isNotNull()
        & (F.col("dt_s") <= F.lit(float(max_gap_s)))
    )
    w = Window.partitionBy(id_col).orderBy(F.col(ts_col), F.col(seq_col))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg = seg.withColumn("is_linked", linked).withColumn(
        "episode",
        F.sum(F.when(F.col("is_linked"), 0).otherwise(1)).over(run),
    )
    scale = float(10 ** SEG_DP)
    km_e2 = F.sum(
        F.floor(F.col("seg_km") * F.lit(scale) + F.lit(0.5)).cast("long")
    )
    total_km = km_e2.cast("double") / F.lit(scale)
    elapsed = F.max(F.col("_ts_s")) - F.min(F.col("prev_ts_s"))
    ep = (
        seg.filter("is_linked")
        .groupBy(id_col, "episode")
        .agg(
            F.min("prev_ts").alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            round_dp(elapsed, dp).alias("duration_s"),
            round_dp(total_km, dp).alias("trip_km"),
            F.count(F.lit(1)).alias("n_hops"),
            round_dp(
                F.when(elapsed > 0, total_km / (elapsed / 3600.0)), dp
            ).alias("avg_kmh"),
        )
        .filter(F.col("trip_km") >= F.lit(float(min_km)))
    )
    wseq = Window.partitionBy(id_col).orderBy("start_ts", "episode")
    return ep.withColumn("trip_seq", F.row_number().over(wseq)).select(
        id_col, "trip_seq", "start_ts", "end_ts", "duration_s",
        "trip_km", "n_hops", "avg_kmh",
    )


def infer_home_cells(
    points: DataFrame,
    grid_deg: float = 1.0,
    night_hours: tuple[int, int] = (0, 5),
    id_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    dp: int = 4,
) -> DataFrame:
    """Home-location inference: each entity's modal grid cell among
    night-hour pings (hour in ``[night_hours[0], night_hours[1]]``,
    inclusive) — the standard mobility prior ("where does this device
    sleep"). Ties break to the smallest (gi, gj), so the answer is
    deterministic.

    Plan: codegen filter + cell projection, one groupBy on
    (entity, cell) (map-side combined), one top-1 window on the entity —
    two shuffles total, both keyed on the entity id, output one row per
    entity. ``home_lat``/``home_lon`` are the cell center.
    """
    g = float(grid_deg)
    h = F.hour(F.col(ts_col))
    counts = (
        points.filter(
            (h >= int(night_hours[0])) & (h <= int(night_hours[1]))
        )
        .select(
            F.col(id_col),
            F.floor((F.col(lat_col) + 90.0) / g).cast("int").alias("gi"),
            F.floor((F.col(lon_col) + 180.0) / g).cast("int").alias("gj"),
        )
        .groupBy(id_col, "gi", "gj")
        .agg(F.count(F.lit(1)).alias("n_pings"))
    )
    wtop = Window.partitionBy(id_col).orderBy(
        F.col("n_pings").desc(), F.col("gi"), F.col("gj")
    )
    return (
        counts.withColumn("_rk", F.row_number().over(wtop))
        .filter(F.col("_rk") == 1)
        .select(
            id_col, "gi", "gj", "n_pings",
            round_dp((F.col("gi") + 0.5) * g - 90.0, dp).alias("home_lat"),
            round_dp((F.col("gj") + 0.5) * g - 180.0, dp).alias("home_lon"),
        )
    )


def geofence_transitions(
    points: DataFrame,
    fences: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    seq_col: str = "event_id",
) -> DataFrame:
    """Geofence enter/exit events: for each entity's ordered ping stream
    and each fence (an axis-aligned box ``(fence_id, lat_min, lat_max,
    lon_min, lon_max)``, half-open on the max edges), emit a row when
    fence membership CHANGES between consecutive pings — 'enter' at the
    first ping observed inside, 'exit' at the first ping observed
    outside after being inside.

    Single-pass rank-gap formulation (no per-(entity, fence) dense
    stream, no self-joins): rank pings per entity and carry the NEXT
    ping's timestamp in the same window (one shuffle), join once to the
    broadcast fence table on containment — membership rows are
    O(matches), not O(pings x fences) — then one window over
    (entity, fence) ordered by rank reads both transitions off the rank
    gaps: a row whose predecessor rank isn't r-1 starts a visit
    ('enter' at its own ts); a row whose successor rank isn't r+1 ends
    one ('exit' at the carried next-ping ts — absent when the track
    simply ends inside). Both events emit from one
    ``explode(array(...))`` projection. The executed plan is ONE hash
    exchange total: the (entity, fence) window's clustering is satisfied
    by the entity partitioning already in place (subset rule), so it
    costs only a partition-local sort (verified). For a continent-sized fence
    layer, replace the broadcast with a cell-prefix join and keep the
    identical window algebra.
    """
    w = Window.partitionBy(id_col).orderBy(F.col(ts_col), F.col(seq_col))
    ranked = (
        points.select(
            F.col(id_col), F.col(ts_col), F.col(lat_col), F.col(lon_col),
            F.col(seq_col),
        )
        .withColumn("_r", F.row_number().over(w))
        .withColumn("_next_ts", F.lead(ts_col).over(w))
    )
    mem = ranked.join(
        F.broadcast(fences),
        (F.col(lat_col) >= F.col("lat_min"))
        & (F.col(lat_col) < F.col("lat_max"))
        & (F.col(lon_col) >= F.col("lon_min"))
        & (F.col(lon_col) < F.col("lon_max")),
    ).select(id_col, "fence_id", "_r", ts_col, "_next_ts")
    wf = Window.partitionBy(id_col, "fence_id").orderBy("_r")
    mem = mem.withColumn("_prev_r", F.lag("_r").over(wf)).withColumn(
        "_next_r", F.lead("_r").over(wf)
    )
    enter = F.when(
        F.col("_prev_r").isNull() | (F.col("_prev_r") != F.col("_r") - 1),
        F.struct(
            F.col(ts_col).alias("ts"), F.lit("enter").alias("transition")
        ),
    )
    exit_ = F.when(
        (F.col("_next_r").isNull() | (F.col("_next_r") != F.col("_r") + 1))
        & F.col("_next_ts").isNotNull(),
        F.struct(
            F.col("_next_ts").alias("ts"), F.lit("exit").alias("transition")
        ),
    )
    return (
        mem.select(
            F.col(id_col), F.col("fence_id"),
            F.explode(F.array(enter, exit_)).alias("_e"),
        )
        .filter(F.col("_e").isNotNull())
        .select(
            id_col, "fence_id",
            F.col("_e.ts").alias(ts_col), F.col("_e.transition"),
        )
    )


def radius_of_gyration(
    points: DataFrame,
    id_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    dp: int = 4,
) -> DataFrame:
    """Radius of gyration per entity (Gonzalez et al. 2008, the standard
    mobility-range metric): the RMS haversine distance of an entity's
    pings from its centroid.

    Exactness: the centroid is the mean of 1e-6-quantized coordinates
    (integer sums, floor-rounded to 6 dp) so both engines feed haversine
    identical doubles; squared distances are floor-quantized to 2 dp and
    integer-summed, so the RMS is aggregation-order-independent.

    Plan: ONE hash shuffle on the entity — the centroid comes from an
    unbounded window over the entity partition, and the final groupBy
    reuses that partitioning. No join, no driver state.
    """
    w = Window.partitionBy(id_col)
    lat6 = F.floor(F.col(lat_col) * 1e6 + F.lit(0.5)).cast("long")
    lon6 = F.floor(F.col(lon_col) * 1e6 + F.lit(0.5)).cast("long")
    n_w = F.count(F.lit(1)).over(w)
    c_lat = round_dp(
        F.sum(lat6).over(w).cast("double") / 1e6 / n_w, 6
    )
    c_lon = round_dp(
        F.sum(lon6).over(w).cast("double") / 1e6 / n_w, 6
    )
    pts = points.withColumn("_clat", c_lat).withColumn("_clon", c_lon)
    d = haversine_col(
        F.col("_clat"), F.col("_clon"), F.col(lat_col), F.col(lon_col)
    )
    d2_e2 = F.floor(d * d * F.lit(100.0) + F.lit(0.5)).cast("long")
    g = pts.withColumn("_d2e2", d2_e2).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.first("_clat").alias("c_lat"),
        F.first("_clon").alias("c_lon"),
        F.sum("_d2e2").alias("_s"),
    )
    rg = F.sqrt(
        F.col("_s").cast("double") / F.lit(100.0)
        / F.col("n_pings").cast("double")
    )
    return g.select(
        id_col, "n_pings", "c_lat", "c_lon",
        round_dp(rg, dp).alias("rg_km"),
    )


def visit_entropy(
    points: DataFrame,
    grid_deg: float = 1.0,
    id_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    dp: int = 6,
) -> DataFrame:
    """Shannon entropy of each entity's visited-cell distribution — the
    classic mobility-predictability score (Song et al. 2010): low
    entropy = a routine-bound entity, high = an erratic one.

    Uses H = ln(N) - (sum_c n_c ln n_c) / N with each per-cell term
    floor-quantized to 1e-9 and integer-summed (the BM25 trick), so the
    distributed sum is bit-stable under any partitioning.

    Plan: one map-side-combined groupBy on (entity, cell), one tiny
    groupBy on the entity. All codegen; no UDF.
    """
    g = float(grid_deg)
    counts = (
        points.select(
            F.col(id_col),
            F.floor((F.col(lat_col) + 90.0) / g).cast("int").alias("gi"),
            F.floor((F.col(lon_col) + 180.0) / g).cast("int").alias("gj"),
        )
        .groupBy(id_col, "gi", "gj")
        .agg(F.count(F.lit(1)).alias("n_c"))
    )
    term = F.floor(
        F.col("n_c").cast("double") * F.log(F.col("n_c").cast("double"))
        * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    agg = counts.withColumn("_t", term).groupBy(id_col).agg(
        F.sum("n_c").alias("n_pings"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("_t").alias("_ts"),
    )
    n_d = F.col("n_pings").cast("double")
    ent = F.log(n_d) - F.col("_ts").cast("double") / F.lit(1e9) / n_d
    return agg.select(
        id_col, "n_pings", "n_cells", round_dp(ent, dp).alias("entropy")
    )


def contact_events(
    points: DataFrame,
    dist_km: float = 250.0,
    window_s: float = 86400.0,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    seq_col: str = "event_id",
    dp: int = 2,
) -> DataFrame:
    """Proximity contact mining: entity pairs with pings within
    ``dist_km`` AND ``window_s`` of each other, aggregated per pair
    (contact count, first/last contact time, closest approach).

    Bucketed candidate join, never all-pairs: each ping keys on
    (latitude band, time bin) with band width >= dist_km / 111.19 km/deg
    (a spherical bound: any pair within dist_km differs by <= 1 band)
    and bin width = window_s. ONE side explodes to its 3x3
    (band, bin) neighborhood; the other keeps its exact bucket — a ping
    pair can therefore match in exactly ONE bucket (the right side's),
    so no candidate dedup is needed. The exact haversine/time filter
    runs on candidates only; distances are floor-quantized to ``dp``
    before the threshold so the cut is engine-stable.

    Plan: explode (9x one side) -> hash join on (band, bin) -> codegen
    filter -> map-side-combined pair groupBy. Shuffle is candidates, not
    |pings|^2. At polar latitudes a longitude band key stretched by
    sec(lat) would tighten candidates further; the latitude band alone
    is already correct (longitude never increases great-circle
    distance bounds).
    """
    import math

    band_deg = max(float(dist_km) / 111.19, 1e-6)
    n_bands = int(math.ceil(180.0 / band_deg))
    ws = float(window_s)
    s = _ts_seconds(points, ts_col)
    base = points.select(
        F.col(id_col).alias("u"), F.col(ts_col).alias("t"),
        F.col(seq_col).alias("e"), F.col(lat_col).alias("la"),
        F.col(lon_col).alias("lo"), s.alias("sec"),
        F.floor((F.col(lat_col) + 90.0) / band_deg).cast("int").alias("bb"),
        F.floor(s / ws).cast("long").alias("tb"),
    )
    offs = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di in (-1, 0, 1) for dj in (-1, 0, 1)
    ])
    left = base.select(
        "u", "t", "e", "la", "lo", "sec",
        F.explode(offs).alias("_o"), "bb", "tb",
    ).select(
        F.col("u").alias("user_a"), F.col("t").alias("ts_a"),
        F.col("e").alias("e_a"), F.col("la").alias("la_a"),
        F.col("lo").alias("lo_a"), F.col("sec").alias("s_a"),
        # no clamping: an out-of-range band simply never matches the
        # unexploded side, and clamping could alias two offsets onto one
        # bucket and double-count a pair
        (F.col("bb") + F.col("_o.di")).alias("bb"),
        (F.col("tb") + F.col("_o.dj")).alias("tb"),
    )
    right = base.select(
        F.col("u").alias("user_b"), F.col("t").alias("ts_b"),
        F.col("e").alias("e_b"), F.col("la").alias("la_b"),
        F.col("lo").alias("lo_b"), F.col("sec").alias("s_b"), "bb", "tb",
    )
    d = round_dp(
        haversine_col(
            F.col("la_a"), F.col("lo_a"), F.col("la_b"), F.col("lo_b")
        ),
        dp,
    )
    # force a SHUFFLED hash join on (band, bin) building the un-exploded
    # side: Catalyst underestimates the 9x explode and otherwise
    # broadcasts 9x|pings| rows (driver-built hashed relation — measured
    # 17 s vs 3 s at sf0.1); at 100 TB both sides are huge and the
    # shuffled join is the only right shape anyway
    cand = (
        left.join(right.hint("shuffle_hash"), ["bb", "tb"])
        .filter(F.col("user_a") < F.col("user_b"))
        .filter(F.abs(F.col("s_a") - F.col("s_b")) <= F.lit(ws))
        .withColumn("_d", d)
        .filter(F.col("_d") <= F.lit(float(dist_km)))
    )
    return cand.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_contacts"),
        F.min(F.least("ts_a", "ts_b")).alias("first_ts"),
        F.max(F.greatest("ts_a", "ts_b")).alias("last_ts"),
        F.min("_d").alias("min_km"),
    )


def track_hausdorff(
    points: DataFrame,
    grid_deg: float = 5.0,
    min_shared: int = 1,
    id_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    seq_col: str = "event_id",
    dp: int = 2,
) -> DataFrame:
    """Symmetric Hausdorff distance between entity tracks (as point
    sets), exact on LSH-style candidate pairs: the standard trajectory
    -clustering distance, computed only for pairs that share >=
    ``min_shared`` grid cells (the ``track_similarity`` inverted-index
    candidate generation), never for all entity pairs.

    H(A,B) = max(h(A->B), h(B->A)), h(A->B) = max_a min_b d(a, b).
    Distances are floor-quantized to ``dp``; min/max are order-
    independent, so no further fixed-point care is needed.

    Plan: candidate pairs (cell-keyed inverted index) join the ping
    table twice; the |A|x|B| distance table is keyed on the pair, and
    both directed maxima reduce it with (pair, ping) then (pair)
    groupBys that reuse the pair-hash partitioning. Shuffle is
    sum over candidate pairs of |A|x|B| — bounded by candidate
    generation, tunable via ``grid_deg`` / ``min_shared``.
    """
    g = float(grid_deg)
    cells = (
        points.select(
            F.col(id_col).alias("u"),
            F.floor((F.col(lat_col) + 90.0) / g).cast("int").alias("gi"),
            F.floor((F.col(lon_col) + 180.0) / g).cast("int").alias("gj"),
        )
        .distinct()
    )
    a = cells.select("gi", "gj", F.col("u").alias("user_a"))
    b = cells.select("gi", "gj", F.col("u").alias("user_b"))
    pairs = (
        a.join(b, ["gi", "gj"])
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .filter(F.col("_shared") >= int(min_shared))
        .select("user_a", "user_b")
    )
    pa = points.select(
        F.col(id_col).alias("user_a"), F.col(lat_col).alias("la_a"),
        F.col(lon_col).alias("lo_a"), F.col(seq_col).alias("_ra"),
    )
    pb = points.select(
        F.col(id_col).alias("user_b"), F.col(lat_col).alias("la_b"),
        F.col(lon_col).alias("lo_b"), F.col(seq_col).alias("_rb"),
    )
    d = round_dp(
        haversine_col(
            F.col("la_a"), F.col("lo_a"), F.col("la_b"), F.col("lo_b")
        ),
        dp,
    )
    dists = (
        pairs.join(pa, "user_a").join(pb, "user_b").withColumn("_d", d)
        .select("user_a", "user_b", "_ra", "_rb", "_d")
    )
    # both directed minima in ONE pass over the distance table: the two
    # whole-partition window minima and the final pair groupBy all have
    # their clustering satisfied by one hash partitioning on the pair
    # (subset rule), so the |A|x|B| join is built and shuffled once —
    # the two-branch groupBy formulation recomputed it per direction
    w_a = Window.partitionBy("user_a", "user_b", "_ra")
    w_b = Window.partitionBy("user_a", "user_b", "_rb")
    out = (
        dists.withColumn("_ma", F.min("_d").over(w_a))
        .withColumn("_mb", F.min("_d").over(w_b))
        .groupBy("user_a", "user_b")
        .agg(F.max("_ma").alias("h_ab"), F.max("_mb").alias("h_ba"))
    )
    return out.select(
        "user_a", "user_b", "h_ab", "h_ba",
        F.greatest("h_ab", "h_ba").alias("hausdorff_km"),
    )


def co_dwells(
    stops: DataFrame,
    dist_km: float = 250.0,
    min_overlap_s: float = 0.0,
    id_col: str = "user_id",
    dp: int = 2,
) -> DataFrame:
    """Rendezvous detection: entity pairs whose DWELL EPISODES (from
    ``detect_stops``) overlap in time with centroids within ``dist_km``
    — "who met whom, where, for how long", the episode-level complement
    of instantaneous ``contact_events``.

    Bucketed join on the centroid latitude band (width >= dist_km /
    111.19 deg; one side explodes to its 3 neighbor bands, so a
    qualifying episode pair matches exactly once — no dedup). Candidates
    pass the exact quantized-distance and interval-overlap filters; the
    per-pair aggregate sums overlaps as 2 dp fixed-point integers
    (order-independent). Dwell tables are orders of magnitude smaller
    than ping streams, so the shuffle is tiny by construction.

    Returns (user_a, user_b, n_meetings, total_overlap_s,
    max_overlap_s, min_km).
    """
    band_deg = max(float(dist_km) / 111.19, 1e-6)
    s_start = _ts_seconds(stops, "start_ts")
    s_end = _ts_seconds(stops, "end_ts")
    base = stops.select(
        F.col(id_col).alias("u"), F.col("c_lat").alias("la"),
        F.col("c_lon").alias("lo"), s_start.alias("s0"), s_end.alias("s1"),
        F.floor((F.col("c_lat") + 90.0) / band_deg).cast("int").alias("bb"),
    )
    left = base.select(
        F.col("u").alias("user_a"), F.col("la").alias("la_a"),
        F.col("lo").alias("lo_a"), F.col("s0").alias("a0"),
        F.col("s1").alias("a1"),
        F.explode(
            F.array(F.col("bb") - 1, F.col("bb"), F.col("bb") + 1)
        ).alias("bb"),
    )
    right = base.select(
        F.col("u").alias("user_b"), F.col("la").alias("la_b"),
        F.col("lo").alias("lo_b"), F.col("s0").alias("b0"),
        F.col("s1").alias("b1"), "bb",
    )
    d = round_dp(
        haversine_col(
            F.col("la_a"), F.col("lo_a"), F.col("la_b"), F.col("lo_b")
        ),
        dp,
    )
    overlap = F.least("a1", "b1") - F.greatest("a0", "b0")
    cand = (
        left.join(right.hint("shuffle_hash"), "bb")
        .filter(F.col("user_a") < F.col("user_b"))
        .withColumn("_ov", overlap)
        .filter(F.col("_ov") >= F.lit(float(min_overlap_s)))
        .withColumn("_d", d)
        .filter(F.col("_d") <= F.lit(float(dist_km)))
    )
    ov_e2 = F.floor(F.col("_ov") * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (
        cand.withColumn("_ove2", ov_e2)
        .groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_meetings"),
            (F.sum("_ove2").cast("double") / F.lit(100.0))
            .alias("total_overlap_s"),
            (F.max("_ove2").cast("double") / F.lit(100.0))
            .alias("max_overlap_s"),
            F.min("_d").alias("min_km"),
        )
    )


def simplify_tracks(
    points: DataFrame,
    tol_deg: float = 0.015625,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Distributed Douglas-Peucker polyline simplification: per entity,
    keep the minimal vertex subset whose planar (lon, lat)-degree
    perpendicular deviation from the simplified chain is <= ``tol_deg``.

    Returns the KEPT points as (id, idx, lat, lon) where ``idx`` is the
    0-based position in (ts, seq)-order — so downstream ops (corridor
    joins, rendering, track similarity) run on the reduced chain.

    Custom-operator path (b) from the build rules: the recursion is
    per-track sequential, so it runs as an Arrow-batched
    ``applyInPandas`` over a single hash shuffle on the entity id; state
    is one track's arrays (split long tracks by day upstream if a single
    entity's history exceeds executor memory). Everything before and
    after the grouped map stays whole-stage codegen.

    Exact-oracle determinism: the split test uses the squared-cross-
    product form ``cross^2 > tol^2 * |b-a|^2`` (no sqrt, no division),
    with ``cross = (bx-ax)*(py-ay) - (by-ay)*(px-ax)`` evaluated in IEEE
    doubles in exactly that operand order, and the split vertex is the
    FIRST index attaining the maximum squared deviation (numpy argmax ==
    SQL ``row_number() ... ORDER BY dev DESC, idx ASC``). A DuckDB
    recursive CTE reproduces the kept set bit-for-bit. Coincident
    segment endpoints give cross == 0, so closed loops collapse to their
    endpoints — same on both engines. Default ``tol_deg`` is a power of
    two (1/64 deg ~ 1.7 km) so ``tol^2 * den`` is an exact scaling.

    No analogue in the reference (single-station ETL); extends the
    engine's trajectory family (SURVEY.md 2.2 N-operators).
    """
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    tol2 = float(tol_deg) * float(tol_deg)
    # alias BEFORE the window so the window's hash partitioning on _id is
    # exactly what the grouped map requires — one shuffle, not two
    base = points.select(
        F.col(id_col).alias("_id"), F.col(ts_col).alias("_ts"),
        F.col(seq_col).alias("_seq"),
        F.col(lat_col).alias("lat"), F.col(lon_col).alias("lon"),
    )
    w = Window.partitionBy("_id").orderBy("_ts", "_seq")
    pts = base.select(
        "_id",
        (F.row_number().over(w) - F.lit(1)).alias("idx"),
        "lat", "lon",
    )

    def _simplify(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values("idx").reset_index(drop=True)
        x = pdf["lon"].to_numpy(dtype="float64")
        y = pdf["lat"].to_numpy(dtype="float64")
        n = len(x)
        keep = np.zeros(n, dtype=bool)
        keep[0] = True
        keep[n - 1] = True
        stack = [(0, n - 1)]
        while stack:
            lo, hi = stack.pop()
            if hi - lo < 2:
                continue
            ax, ay, bx, by = x[lo], y[lo], x[hi], y[hi]
            px = x[lo + 1: hi]
            py = y[lo + 1: hi]
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            num = cross * cross
            den = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
            k = int(np.argmax(num))  # first max == smallest-idx tiebreak
            if num[k] > tol2 * den:
                ki = lo + 1 + k
                keep[ki] = True
                stack.append((lo, ki))
                stack.append((ki, hi))
        return pdf.loc[keep, ["_id", "idx", "lat", "lon"]]

    out = pts.groupBy("_id").applyInPandas(
        _simplify, schema="_id long, idx long, lat double, lon double"
    )
    return out.withColumnRenamed("_id", id_col)


def locate_at(
    points: DataFrame,
    at_ts,
    max_gap_s: float = 86400.0,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    dp: int = 6,
) -> DataFrame:
    """Where was every entity at time ``at_ts``? Linear interpolation
    between the bracketing pings (last ping <= t, first ping > t); an
    entity whose track ends before t within ``max_gap_s`` reports its
    last known position (method='last_known'), otherwise it is absent.

    ONE map-side-combinable groupBy: the bracketing pings are conditional
    ``max(struct(ts, seq, lat, lon))`` / ``min(struct(...))`` aggregates
    — no window, no self-join, shuffle carries two structs per entity.
    That is the 100 TB shape for the classic "fleet snapshot at time T"
    query: a scan + one aggregation regardless of track lengths, with
    duplicate-timestamp ties broken by the seq field inside the struct
    ordering (deterministic on any engine).

    The interpolation is plain linear in (lat, lon) degrees — documented
    small-gap semantics; tracks that cross the antimeridian between two
    pings should be localized upstream. Outputs floor-rounded to ``dp``.

    Returns (id, at_lat, at_lon, method).
    """
    from bufr2geojson_spark.operators.textops import round_dp

    is_ntz = dict(points.dtypes).get(ts_col) == "timestamp_ntz"
    t = F.lit(at_ts).cast("timestamp_ntz" if is_ntz else "timestamp")
    tsec = _ts_seconds(points, ts_col)
    pt = points.select(
        F.col(id_col).alias("_id"), F.col(ts_col).alias("_ts"),
        tsec.alias("_s"), F.col(seq_col).alias("_seq"),
        F.col(lat_col).alias("_lat"), F.col(lon_col).alias("_lon"),
    )
    before = F.max(
        F.when(F.col("_ts") <= t, F.struct(
            F.col("_s").alias("s"), F.col("_seq").alias("q"),
            F.col("_lat").alias("la"), F.col("_lon").alias("lo")))
    ).alias("b")
    after = F.min(
        F.when(F.col("_ts") > t, F.struct(
            F.col("_s").alias("s"), F.col("_seq").alias("q"),
            F.col("_lat").alias("la"), F.col("_lon").alias("lo")))
    ).alias("a")
    g = pt.groupBy("_id").agg(before, after)
    # target epoch seconds via the same NTZ-safe path as the pings
    if is_ntz:
        tq = F.to_utc_timestamp(t, "UTC").cast("double")
    else:
        tq = t.cast("double")
    frac = (tq - F.col("b.s")) / (F.col("a.s") - F.col("b.s"))
    interp_ok = (
        F.col("b").isNotNull() & F.col("a").isNotNull()
        & (F.col("a.s") > F.col("b.s"))
    )
    last_ok = (
        F.col("b").isNotNull() & F.col("a").isNull()
        & ((tq - F.col("b.s")) <= F.lit(float(max_gap_s)))
    )
    lat = F.when(
        interp_ok, F.col("b.la") + frac * (F.col("a.la") - F.col("b.la"))
    ).when(last_ok, F.col("b.la"))
    lon = F.when(
        interp_ok, F.col("b.lo") + frac * (F.col("a.lo") - F.col("b.lo"))
    ).when(last_ok, F.col("b.lo"))
    method = F.when(interp_ok, F.lit("interp")).when(
        last_ok, F.lit("last_known"))
    return (
        g.select(
            F.col("_id").alias(id_col),
            round_dp(lat, dp).alias("at_lat"),
            round_dp(lon, dp).alias("at_lon"),
            method.alias("method"),
        )
        .filter(F.col("method").isNotNull())
    )


def _hull_chain(pts):
    """Andrew's monotone chain over deduped (x, y) int tuples, STRICT
    turns (collinear mid-edge points popped): returns the true hull
    vertices in CCW order. 1 or 2 points pass through unchanged."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts

    def _half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = _half(pts)
    upper = _half(list(reversed(pts)))
    return lower[:-1] + upper[:-1]


def convex_hulls(
    points: DataFrame,
    id_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    scale: int = 100,
) -> DataFrame:
    """Per-entity convex hull as an ALGEBRAIC aggregate: (id, n_hull,
    area2, lat_s_sum, lon_s_sum) where n_hull is the count of true hull
    vertices, area2 is twice the hull area, and the *_s_sum columns pin
    the exact vertex set (sums of the vertices' scaled coordinates) —
    the activity-footprint primitive (home-range area, territory
    estimation) over track points.

    EXACT-INTEGER contract: coordinates are quantized to
    ``round(coord * scale)`` int64 before any geometry, so every cross
    product and the shoelace sum are exact integers — bit-equal across
    engines, partitionings, and aggregation orders. area2 is in
    (1/scale degree)² units, doubled (the shoelace numerator), which
    keeps it integral without a lossy halving. Collinear mid-edge points
    are NOT vertices (strict-turn monotone chain; the oracle prunes
    betweenness with exact integer predicates).

    100 TB shape — convex hull is a two-level algebraic aggregate
    (hull(A ∪ B) = hull(hull(A) ∪ hull(B))): stage 1 computes a PARTIAL
    hull per (input partition, entity) inside ``mapInPandas`` with NO
    shuffle, so the single entity-keyed exchange carries only partial
    hull vertices (O(h) per entity per partition, h ≈ dozens) instead of
    every raw point; stage 2 merges per entity in ``applyInPandas``.
    A skewed entity with 10^8 pings across 10^4 partitions shuffles
    ~10^5 rows, not 10^8.
    """
    import pandas as pd

    s = int(scale)
    base = points.select(
        F.col(id_col).alias("_id"),
        F.round(F.col(lat_col) * s).cast("long").alias("y"),
        F.round(F.col(lon_col) * s).cast("long").alias("x"),
    )

    def _partial(batches):
        for pdf in batches:
            out = {"_id": [], "x": [], "y": []}
            for uid, g in pdf.groupby("_id"):
                for x, y in _hull_chain(
                    list(zip(g["x"].tolist(), g["y"].tolist()))
                ):
                    out["_id"].append(uid)
                    out["x"].append(x)
                    out["y"].append(y)
            yield pd.DataFrame(out)

    partial = base.mapInPandas(_partial, schema="_id long, x long, y long")

    def _merge(pdf):
        hull = _hull_chain(list(zip(pdf["x"].tolist(), pdf["y"].tolist())))
        area2 = 0
        n = len(hull)
        if n >= 3:
            for i in range(n):
                x1, y1 = hull[i]
                x2, y2 = hull[(i + 1) % n]
                area2 += x1 * y2 - x2 * y1
        return pd.DataFrame({
            "_id": [pdf["_id"].iloc[0]],
            "n_hull": [n],
            "area2": [abs(area2)],
            "lat_s_sum": [sum(y for _, y in hull)],
            "lon_s_sum": [sum(x for x, _ in hull)],
        })

    return (
        partial.groupBy("_id")
        .applyInPandas(
            _merge,
            schema="_id long, n_hull long, area2 long, "
                   "lat_s_sum long, lon_s_sum long",
        )
        .withColumnRenamed("_id", id_col)
    )


def track_crossings(
    points: DataFrame,
    grid_deg: float = 2.5,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    scale: int = 100,
) -> DataFrame:
    """Trajectory crossing detection: for every pair of entities, count
    the pairs of track segments (consecutive pings, (ts, seq)-ordered)
    that PROPERLY intersect — the path-conflict primitive (shipping-lane
    crossings, airspace deconfliction, contact tracing on paths rather
    than points).

    Exactness: endpoints are quantized to ``round(coord * scale)`` int64
    and the proper-intersection test is the classic four-orientation
    predicate evaluated as SIGN COMPARISONS of exact integer cross
    products (never a product of two cross products, which could
    overflow int64) — no floats anywhere, so any SQL engine reproduces
    the pair set bit-for-bit. Collinear/touching contacts are excluded
    (proper crossings only), which makes the predicate tolerance-free.

    100 TB shape: a segment-segment theta-join is never materialized as
    a cartesian — each segment is replicated to the ``grid_deg`` cells
    its bbox covers (segments are ping-to-ping, so a handful of cells),
    candidates come from a hash equi-join on the cell key, are filtered
    by the codegen predicate, then deduped on the segment-pair key
    (a pair sharing k cells appears k times). Shuffle is O(candidate
    pairs), the blocking is COMPLETE (an intersection point lies in a
    cell both bboxes cover), and skewed dense cells salt the same way
    tile aggregation does.

    Returns (user_a, user_b, n_crossings), user_a < user_b.
    """
    s = int(scale)
    base = points.select(
        F.col(id_col).alias("_id"),
        F.col(ts_col).alias("_ts"),
        F.col(seq_col).alias("_seq"),
        F.round(F.col(lon_col) * s).cast("long").alias("x1"),
        F.round(F.col(lat_col) * s).cast("long").alias("y1"),
    )
    w = Window.partitionBy("_id").orderBy("_ts", "_seq")
    segs = (
        base.select(
            "_id",
            (F.row_number().over(w) - F.lit(1)).alias("seg"),
            "x1", "y1",
            F.lead("x1").over(w).alias("x2"),
            F.lead("y1").over(w).alias("y2"),
        )
        .filter(F.col("x2").isNotNull())
    )
    g = int(round(float(grid_deg) * s))
    lo = F.floor(F.least("x1", "x2") / g).cast("long")
    hi = F.floor(F.greatest("x1", "x2") / g).cast("long")
    lo_y = F.floor(F.least("y1", "y2") / g).cast("long")
    hi_y = F.floor(F.greatest("y1", "y2") / g).cast("long")
    cells = segs.select(
        "*",
        F.explode(F.sequence(lo, hi)).alias("cx"),
    ).select(
        "*",
        F.explode(F.sequence(lo_y, hi_y)).alias("cy"),
    )
    a = cells.select(
        F.col("_id").alias("ua"), F.col("seg").alias("sa"),
        F.col("x1").alias("ax1"), F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"), F.col("y2").alias("ay2"),
        "cx", "cy",
    )
    b = cells.select(
        F.col("_id").alias("ub"), F.col("seg").alias("sb"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"), F.col("y2").alias("by2"),
        "cx", "cy",
    )

    def _orient(ox, oy, px, py, qx, qy):
        return (
            (F.col(px) - F.col(ox)) * (F.col(qy) - F.col(oy))
            - (F.col(py) - F.col(oy)) * (F.col(qx) - F.col(ox))
        )

    o1 = _orient("ax1", "ay1", "ax2", "ay2", "bx1", "by1")
    o2 = _orient("ax1", "ay1", "ax2", "ay2", "bx2", "by2")
    o3 = _orient("bx1", "by1", "bx2", "by2", "ax1", "ay1")
    o4 = _orient("bx1", "by1", "bx2", "by2", "ax2", "ay2")
    proper = (
        (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0)))
        & (((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0)))
    )
    hits = (
        a.join(b, ["cx", "cy"])
        .filter(F.col("ua") < F.col("ub"))
        .filter(proper)
        .select("ua", "ub", "sa", "sb")
        .distinct()
    )
    return (
        hits.groupBy(F.col("ua").alias("user_a"), F.col("ub").alias("user_b"))
        .agg(F.count(F.lit(1)).alias("n_crossings"))
    )


def track_dtw(
    points: DataFrame,
    grid_deg: float = 5.0,
    min_shared: int = 1,
    band: int | None = None,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    scale: int = 100,
) -> DataFrame:
    """Dynamic-time-warping alignment cost between entity tracks — the
    order-sensitive complement to ``track_hausdorff`` (which treats
    tracks as point sets): two entities that visit the same places in a
    DIFFERENT order are near under Hausdorff but far under DTW.

    EXACT-INTEGER contract: step cost is the SQUARED planar distance on
    ``round(coord * scale)`` int64 coordinates (the squared-cost DTW
    variant), so the whole DP is int64 adds/mins — bit-exact across
    engines; a DuckDB recursive CTE over anti-diagonals reproduces every
    cell. dtw_cost is in (1/scale degree)^2 units.

    ``band`` (Sakoe-Chiba) restricts |i - j| <= band — the published
    O(n*band) mitigation for long tracks; None = full O(n*m) DP (exact).
    Cells outside the band are unreachable (infinite), and the DP falls
    back to monotone steps inside the band; band >= max(n, m) equals the
    full DP. When the band makes the (n, m) corner UNREACHABLE
    (|n - m| > band), ``dtw_cost`` is NULL — not the internal infinity
    sentinel — so rankings over the column never see a garbage value
    that looks like a measurement.

    Plan: candidate pairs come from the same cell-keyed inverted index
    as ``track_hausdorff`` (never all-pairs); each entity's track is
    pre-reduced to ONE row of ordered coordinate arrays (map-side-
    combinable collect + sort at ~2 ints per ping), the pair join
    carries only those arrays, and the DP runs vectorized per pair
    inside ``mapInPandas`` — O(n*m) ints per candidate pair, no
    shuffle after the pair join. Split multi-day tracks upstream if one
    entity's history outgrows a row.

    Returns (user_a, user_b, n_a, n_b, dtw_cost).
    """
    import numpy as np
    import pandas as pd

    s = int(scale)
    g = float(grid_deg)
    cells = (
        points.select(
            F.col(id_col).alias("u"),
            F.floor((F.col(lat_col) + 90.0) / g).cast("int").alias("gi"),
            F.floor((F.col(lon_col) + 180.0) / g).cast("int").alias("gj"),
        )
        .distinct()
    )
    a = cells.select("gi", "gj", F.col("u").alias("user_a"))
    b = cells.select("gi", "gj", F.col("u").alias("user_b"))
    pairs = (
        a.join(b, ["gi", "gj"])
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .filter(F.col("_shared") >= int(min_shared))
        .select("user_a", "user_b")
    )
    seqs = (
        points.select(
            F.col(id_col).alias("u"),
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(seq_col).alias("r"),
                F.round(F.col(lon_col) * s).cast("long").alias("x"),
                F.round(F.col(lat_col) * s).cast("long").alias("y"),
            ).alias("p"),
        )
        .groupBy("u")
        .agg(F.sort_array(F.collect_list("p")).alias("ps"))
        .select(
            "u",
            F.col("ps.x").alias("xs"),
            F.col("ps.y").alias("ys"),
        )
    )
    joined = (
        pairs.join(
            seqs.select(
                F.col("u").alias("user_a"), F.col("xs").alias("xa"),
                F.col("ys").alias("ya"),
            ),
            "user_a",
        )
        .join(
            seqs.select(
                F.col("u").alias("user_b"), F.col("xs").alias("xb"),
                F.col("ys").alias("yb"),
            ),
            "user_b",
        )
    )
    bnd = None if band is None else int(band)

    def _dtw_batches(batches):
        big = np.iinfo(np.int64).max // 4
        for pdf in batches:
            out = {"user_a": [], "user_b": [], "n_a": [], "n_b": [],
                   "dtw_cost": []}
            for _, row in pdf.iterrows():
                xa = np.asarray(row["xa"], dtype=np.int64)
                ya = np.asarray(row["ya"], dtype=np.int64)
                xb = np.asarray(row["xb"], dtype=np.int64)
                yb = np.asarray(row["yb"], dtype=np.int64)
                n, m = len(xa), len(xb)
                cost = (
                    (xa[:, None] - xb[None, :]) ** 2
                    + (ya[:, None] - yb[None, :]) ** 2
                )
                acc = np.full((n + 1, m + 1), big, dtype=np.int64)
                acc[0, 0] = 0
                for i in range(1, n + 1):
                    j0, j1 = 1, m
                    if bnd is not None:
                        j0 = max(1, i - bnd)
                        j1 = min(m, i + bnd)
                    if j0 > j1:
                        continue
                    prev = np.minimum(
                        acc[i - 1, j0 - 1:j1], acc[i - 1, j0:j1 + 1]
                    )
                    # acc[i, j-1] is sequential within the row
                    run = big
                    for j in range(j0, j1 + 1):
                        run = min(prev[j - j0], run)
                        run = cost[i - 1, j - 1] + run
                        acc[i, j] = run
                out["user_a"].append(row["user_a"])
                out["user_b"].append(row["user_b"])
                out["n_a"].append(n)
                out["n_b"].append(m)
                # corner unreachable under the band (acc still holds the
                # infinity sentinel) -> NULL, never the sentinel value
                out["dtw_cost"].append(
                    None if acc[n, m] >= big else int(acc[n, m])
                )
            pdf_out = pd.DataFrame(
                {k: v for k, v in out.items() if k != "dtw_cost"}
            )
            # nullable Int64, not float64: a float column would silently
            # round costs above 2^53
            pdf_out["dtw_cost"] = pd.array(out["dtw_cost"], dtype="Int64")
            yield pdf_out

    return joined.mapInPandas(
        _dtw_batches,
        schema="user_a long, user_b long, n_a long, n_b long, "
               "dtw_cost long",
    )
