"""Custom stateful streaming operator: online stay-point detection.

The streaming twin of ``operators.trajectory.detect_stops``: a point
stream keyed by entity folds into O(1) state per entity (last point +
the currently-open dwell episode), and a finished episode is emitted
EXACTLY once — when motion resumes. A batch recompute touches all
history; this touches only new pings per micro-batch, which is the shape
a 100 TB/day telemetry feed needs (state is per-entity constants, not
per-ping).

Semantics parity: identical per-hop arithmetic to the batch operator —
hops floor-quantized to ``SEG_DP`` (2 dp), speed NULL on non-positive
time deltas (closing any open episode, exactly like the batch
gaps-and-islands counter), fixed-point 1e-6 centroid sums, floor-form
rounding — so closed episodes are value-identical to
``detect_stops`` output (pinned by a batch-equality test across
multi-micro-batch replays).

Ordering contract: one group's rows for a micro-batch are materialized
and sorted (ts, seq) ONCE (the Arrow chunk iterator carries no
cross-chunk order); across micro-batches each entity's pings must arrive
in time order (the usual watermark/ordered-ingest assumption for
trajectory feeds — the same one ``latest_obs_per_station`` documents
for its changelog). Epoch seconds are computed JVM-side before Arrow so
results are session-timezone-independent and match ``detect_stops``.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bufr2geojson_spark.operators.trajectory import SEG_DP

STOP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stop_seq", IntegerType()),
        StructField("start_epoch", DoubleType()),
        StructField("end_epoch", DoubleType()),
        StructField("dwell_s", DoubleType()),
        StructField("c_lat", DoubleType()),
        StructField("c_lon", DoubleType()),
        StructField("n_hops", LongType()),
    ]
)

# last point + open-episode accumulators + emitted-episode counter
_STATE_SCHEMA = (
    "last_s DOUBLE, last_lat DOUBLE, last_lon DOUBLE, open INT, "
    "ep_start_s DOUBLE, sum_lat_e6 LONG, sum_lon_e6 LONG, n_hops LONG, "
    "end_s DOUBLE, n_emitted INT"
)

_SEG_SCALE = float(10 ** SEG_DP)


def _rdp(x: float, dp: int = 4) -> float:
    m = float(10 ** dp)
    return math.floor(x * m + 0.5) / m


def _hav_km(lat1, lon1, lat2, lon2) -> float:
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    d = 2.0 * 6371.0 * math.asin(math.sqrt(a))
    return math.floor(d * _SEG_SCALE + 0.5) / _SEG_SCALE


def _update_stops(
    key: Tuple[int],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    max_speed_kmh: float,
    min_dwell_s: float,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:  # silent entity: drop its state (open dwell too —
        state.remove()     # with no further pings it can never close)
        return
    if state.exists:
        (last_s, last_lat, last_lon, open_, ep_start_s,
         sum_lat, sum_lon, n_hops, end_s, n_emitted) = state.get
    else:
        last_s = None
        last_lat = last_lon = ep_start_s = end_s = 0.0
        open_ = 0
        sum_lat = sum_lon = n_hops = 0
        n_emitted = 0

    # applyInPandasWithState hands one group's rows as an ITERATOR of
    # Arrow chunks with no cross-chunk ordering guarantee (a >10k-ping
    # entity spans several); materialize the whole micro-batch group and
    # sort ONCE so hops never straddle an unsorted chunk boundary. Memory
    # is one entity's rows for one micro-batch — the same bound any
    # applyInPandas stage has.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out = []
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts_s", "event_id"])
        for cur_s, cur_lat, cur_lon in zip(
            pdf["ts_s"].tolist(), pdf["lat"].tolist(), pdf["lon"].tolist()
        ):
            slow = False
            if last_s is not None:
                dt = cur_s - last_s
                if dt > 0:
                    seg = _hav_km(last_lat, last_lon, cur_lat, cur_lon)
                    slow = (seg / (dt / 3600.0)) <= max_speed_kmh
            if slow:
                if not open_:
                    open_, ep_start_s = 1, last_s
                    sum_lat = sum_lon = n_hops = 0
                sum_lat += int(math.floor(cur_lat * 1e6 + 0.5))
                sum_lon += int(math.floor(cur_lon * 1e6 + 0.5))
                n_hops += 1
                end_s = cur_s
            elif open_:
                dwell = _rdp(end_s - ep_start_s)
                if dwell >= min_dwell_s:
                    n_emitted += 1
                    out.append({
                        "user_id": int(key[0]),
                        "stop_seq": n_emitted,
                        "start_epoch": float(ep_start_s),
                        "end_epoch": float(end_s),
                        "dwell_s": dwell,
                        "c_lat": _rdp(sum_lat / 1e6 / n_hops),
                        "c_lon": _rdp(sum_lon / 1e6 / n_hops),
                        "n_hops": int(n_hops),
                    })
                open_ = 0
            last_s, last_lat, last_lon = cur_s, cur_lat, cur_lon

    state.update((
        float(last_s) if last_s is not None else None,
        float(last_lat), float(last_lon), int(open_),
        float(ep_start_s), int(sum_lat), int(sum_lon), int(n_hops),
        float(end_s), int(n_emitted),
    ))
    if out:
        yield pd.DataFrame(out)


def streaming_stops(
    points: DataFrame,
    max_speed_kmh: float = 5.0,
    min_dwell_s: float = 600.0,
    state_ttl_ms: int = 0,
) -> DataFrame:
    """Append-mode stream of CLOSED dwell episodes per entity.

    Input stream columns: user_id, ts (timestamp), lat, lon, event_id.
    ``state_ttl_ms > 0`` retires entities that stop pinging (their open
    episode is discarded — without further pings it can never close).
    """
    from bufr2geojson_spark.operators.trajectory import _ts_seconds

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms > 0 else GroupStateTimeout.NoTimeout
    )
    # epoch seconds are derived JVM-SIDE with the batch operator's exact
    # rule (_ts_seconds: NTZ read as UTC wall time, LTZ cast to true
    # epoch) BEFORE rows cross Arrow — pandas would otherwise hand the
    # UDF session-timezone wall-clock datetimes, shifting every epoch by
    # the zone offset (and by an hour across DST folds) vs detect_stops
    prepped = points.select(
        "user_id",
        _ts_seconds(points, "ts").alias("ts_s"),
        "lat", "lon", "event_id",
    )

    def fn(key, pdfs, state):
        if state_ttl_ms > 0 and not state.hasTimedOut:
            state.setTimeoutDuration(state_ttl_ms)
        yield from _update_stops(
            key, pdfs, state, max_speed_kmh, min_dwell_s
        )

    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=STOP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_streaming_stops_once(
    spark,
    input_path: str,
    checkpoint_path: str,
    max_speed_kmh: float = 5.0,
    min_dwell_s: float = 600.0,
    max_files_per_trigger: int | None = 1,
    query_name: str = "streaming_stops",
) -> DataFrame:
    """AvailableNow drain into a memory sink. ``max_files_per_trigger=1``
    replays each input file as its own micro-batch, exercising
    cross-batch state carry (the episode that spans a batch boundary)."""
    reader = (
        spark.readStream.schema(
            "user_id LONG, ts TIMESTAMP, lat DOUBLE, lon DOUBLE, "
            "event_id LONG"
        )
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    stops = streaming_stops(stream, max_speed_kmh, min_dwell_s)
    q = (
        stops.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


GEOFENCE_EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("fence_id", IntegerType()),
        StructField("ts_epoch", DoubleType()),
        StructField("transition", StringType()),
    ]
)

# the membership set the entity was last observed inside, as a sorted
# comma-joined id string (state schemas are flat — no array columns)
_GEOFENCE_STATE_SCHEMA = "inside STRING"


def _update_geofences(
    key: Tuple[int],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    fences: list,
) -> Iterator[pd.DataFrame]:
    """Online membership-set diffing: per ping (sorted within the
    micro-batch), the set of containing fences is compared with the
    previous ping's set; additions emit 'enter' at the current ping,
    removals emit 'exit' at the current ping (the first ping observed
    outside — identical to the batch rank-gap semantics, including the
    first-ever ping counting as an enter). State is one short string per
    entity, O(entities) total."""
    if state.hasTimedOut:
        state.remove()
        return
    prev: set = set()
    if state.exists:
        raw = state.get[0]
        if raw:
            prev = {int(x) for x in raw.split(",")}

    chunks = [pdf for pdf in pdfs if len(pdf)]
    out = []
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts_s", "event_id"])
        uid = int(key[0])
        for ts_s, la, lo in zip(
            pdf["ts_s"].tolist(), pdf["lat"].tolist(), pdf["lon"].tolist()
        ):
            cur = {
                fid
                for fid, la0, la1, lo0, lo1 in fences
                if la0 <= la < la1 and lo0 <= lo < lo1
            }
            for fid in sorted(cur - prev):
                out.append({"user_id": uid, "fence_id": int(fid),
                            "ts_epoch": float(ts_s),
                            "transition": "enter"})
            for fid in sorted(prev - cur):
                out.append({"user_id": uid, "fence_id": int(fid),
                            "ts_epoch": float(ts_s),
                            "transition": "exit"})
            prev = cur

    state.update((",".join(str(x) for x in sorted(prev)),))
    if out:
        yield pd.DataFrame(out)


def streaming_geofences(
    points: DataFrame,
    fences: list,
    state_ttl_ms: int = 0,
) -> DataFrame:
    """Append-mode stream of geofence enter/exit events — the streaming
    twin of ``operators.trajectory.geofence_transitions``.

    ``fences`` is a plain list of ``(fence_id, lat_min, lat_max,
    lon_min, lon_max)`` tuples shipped in the UDF closure (the fence
    layer is the broadcast side in the batch operator too). State per
    entity is ONE membership-set string — O(entities), not O(pings) —
    and each transition is emitted exactly once, when the ping that
    reveals it arrives. A batch recompute over a growing feed replays
    all history per run; this touches only new pings.

    Same ordering contract as ``streaming_stops``: per-entity pings
    arrive in time order across micro-batches; within a micro-batch the
    group is materialized and sorted once.
    """
    from bufr2geojson_spark.operators.trajectory import _ts_seconds

    fences = [
        (int(f[0]), float(f[1]), float(f[2]), float(f[3]), float(f[4]))
        for f in fences
    ]
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms > 0 else GroupStateTimeout.NoTimeout
    )
    prepped = points.select(
        "user_id",
        _ts_seconds(points, "ts").alias("ts_s"),
        "lat", "lon", "event_id",
    )

    def fn(key, pdfs, state):
        if state_ttl_ms > 0 and not state.hasTimedOut:
            state.setTimeoutDuration(state_ttl_ms)
        yield from _update_geofences(key, pdfs, state, fences)

    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=GEOFENCE_EVENT_SCHEMA,
        stateStructType=_GEOFENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_streaming_geofences_once(
    spark,
    input_path: str,
    checkpoint_path: str,
    fences: list,
    max_files_per_trigger: int | None = 1,
    query_name: str = "streaming_geofences",
) -> DataFrame:
    """AvailableNow drain into a memory sink; ``max_files_per_trigger=1``
    replays each input file as its own micro-batch so membership carries
    across batch boundaries."""
    reader = (
        spark.readStream.schema(
            "user_id LONG, ts TIMESTAMP, lat DOUBLE, lon DOUBLE, "
            "event_id LONG"
        )
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    events = streaming_geofences(stream, fences)
    q = (
        events.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def streaming_contacts(
    points: DataFrame,
    dist_km: float = 250.0,
    window_s: float = 3600.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Online proximity alerting — the streaming twin of
    ``operators.trajectory.contact_events``'s candidate/filter stage: an
    append stream of (entity pair, ping pair, distance) rows for pings
    within ``dist_km`` and ``window_s`` of each other.

    Built on Spark's watermarked stream-stream self-join (no custom
    state): both sides carry an event-time watermark, the equality key
    is the latitude band (band width >= dist_km / 111.19 deg, the
    spherical bound), ONE side explodes to its 3 neighbor bands — so a
    qualifying ping pair matches on exactly one band key (the
    unexploded side's) and needs no dedup — and the time constraint is
    the native ts-interval join condition, which is what lets Spark
    expire join state at the watermark horizon. State is
    O(pings within the watermark window), independent of feed length.

    Emits user_a < user_b with both event ids, both timestamps and the
    2 dp-quantized distance; aggregation per pair (counts, closest
    approach) composes downstream exactly as in the batch operator.
    """
    from bufr2geojson_spark.operators.spatial import haversine_col
    from bufr2geojson_spark.operators.textops import round_dp

    band_deg = max(float(dist_km) / 111.19, 1e-6)
    ws = int(window_s)
    base = (
        points.withWatermark("ts", watermark)
        .select(
            F.col("user_id"), F.col("ts"), F.col("event_id"),
            F.col("lat"), F.col("lon"),
            F.floor((F.col("lat") + 90.0) / band_deg).cast("int")
             .alias("bb"),
        )
    )
    left = base.select(
        F.col("user_id").alias("user_a"), F.col("ts").alias("ts_a"),
        F.col("event_id").alias("e_a"), F.col("lat").alias("la_a"),
        F.col("lon").alias("lo_a"),
        F.explode(
            F.array(F.col("bb") - 1, F.col("bb"), F.col("bb") + 1)
        ).alias("bb"),
    )
    right = base.select(
        F.col("user_id").alias("user_b"), F.col("ts").alias("ts_b"),
        F.col("event_id").alias("e_b"), F.col("lat").alias("la_b"),
        F.col("lon").alias("lo_b"), "bb",
    )
    d = round_dp(
        haversine_col(
            F.col("la_a"), F.col("lo_a"), F.col("la_b"), F.col("lo_b")
        ),
        2,
    )
    joined = left.join(
        right,
        (left["bb"] == right["bb"])
        & (F.col("ts_a") >= F.col("ts_b") - F.expr(
            f"INTERVAL {ws} SECONDS"))
        & (F.col("ts_a") <= F.col("ts_b") + F.expr(
            f"INTERVAL {ws} SECONDS")),
    )
    return (
        joined.filter(F.col("user_a") < F.col("user_b"))
        .withColumn("km", d)
        .filter(F.col("km") <= F.lit(float(dist_km)))
        .select("user_a", "user_b", "e_a", "e_b", "ts_a", "ts_b", "km")
    )


def run_streaming_contacts_once(
    spark,
    input_path: str,
    checkpoint_path: str,
    dist_km: float = 250.0,
    window_s: float = 3600.0,
    max_files_per_trigger: int | None = 1,
    query_name: str = "streaming_contacts",
) -> DataFrame:
    """AvailableNow drain into a memory sink."""
    reader = (
        spark.readStream.schema(
            "user_id LONG, ts TIMESTAMP, lat DOUBLE, lon DOUBLE, "
            "event_id LONG"
        )
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    events = streaming_contacts(stream, dist_km, window_s)
    q = (
        events.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
