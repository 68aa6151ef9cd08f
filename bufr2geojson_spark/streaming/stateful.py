"""Custom stateful streaming operator: per-station latest observation.

SURVEY.md §2.3 defers custom stateful streaming to
``applyInPandasWithState``; this implements the canonical one for an
observation stream — a continuously-updated "current conditions" table:
for every station (WSI), keep the observation with the maximum event time
seen so far, emitting a changelog row whenever a station's latest advances.

State per key is one small tuple (event epoch, feature_id, value, units,
phenomenon_time) regardless of stream length; a processing-time timeout
(``state_ttl``) retires stations that stop reporting, bounding total state
by the live-station cardinality. This is the stateful pattern the batch
engine cannot express incrementally — a batch window/row_number recomputes
over all history, while this holds O(stations) state and touches only new
rows per micro-batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LATEST_OBS_SCHEMA = StructType(
    [
        StructField("wsi", StringType()),
        StructField("feature_id", StringType()),
        StructField("event_epoch", LongType()),
        StructField("phenomenon_time", StringType()),
        StructField("result_value", DoubleType()),
        StructField("result_units", StringType()),
    ]
)

_STATE_SCHEMA = (
    "event_epoch LONG, feature_id STRING, phenomenon_time STRING, "
    "result_value DOUBLE, result_units STRING"
)


def _update_latest(
    key: Tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one station into the held maximum;
    emit one changelog row iff the latest advanced (or expire on timeout)."""
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        best_epoch, best_fid, best_pt, best_val, best_units = state.get
    else:
        best_epoch, best_fid, best_pt, best_val, best_units = (
            -1, None, None, None, None
        )
    advanced = False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # batch max with deterministic tie-break: max epoch, then max
        # feature_id among the epoch ties (matches the batch
        # window row_number(desc(epoch), desc(feature_id)) equivalent)
        mx = pdf["event_epoch"].max()
        ties = pdf[pdf["event_epoch"] == mx]
        row = ties.loc[ties["feature_id"].astype(str).idxmax()]
        cand = (int(row["event_epoch"]), str(row["feature_id"]))
        if cand > (best_epoch, best_fid or ""):
            best_epoch = int(row["event_epoch"])
            best_fid = str(row["feature_id"])
            best_pt = row["phenomenon_time"]
            best_val = (
                float(row["result_value"])
                if pd.notna(row["result_value"]) else None
            )
            best_units = row["result_units"]
            advanced = True
    if advanced:
        state.update((best_epoch, best_fid, best_pt, best_val, best_units))
        yield pd.DataFrame(
            [{
                "wsi": key[0],
                "feature_id": best_fid,
                "event_epoch": best_epoch,
                "phenomenon_time": best_pt,
                "result_value": best_val,
                "result_units": best_units,
            }]
        )


def latest_obs_per_station(
    features: DataFrame,
    state_ttl_ms: int = 0,
) -> DataFrame:
    """Changelog stream of per-station latest observations.

    Works on a streaming features DataFrame (from ``decode_stream``); each
    micro-batch emits one row per station whose latest observation advanced.
    ``state_ttl_ms > 0`` enables processing-time expiry of silent stations.
    """
    from bufr2geojson_spark.streaming.ingest import event_time

    prepped = (
        event_time(features)
        .filter(F.col("event_ts").isNotNull())
        .filter(F.col("wsi").isNotNull())
        .select(
            "wsi", "feature_id", "phenomenon_time",
            "result_value", "result_units",
            F.unix_timestamp("event_ts").alias("event_epoch"),
        )
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms > 0 else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state):
        if state_ttl_ms > 0 and not state.hasTimedOut:
            state.setTimeoutDuration(state_ttl_ms)
        yield from _update_latest(key, pdfs, state)

    return prepped.groupBy("wsi").applyInPandasWithState(
        fn,
        outputStructType=LATEST_OBS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def run_latest_obs_once(
    spark,
    input_path: str,
    checkpoint_path: str,
    query_name: str = "latest_obs",
) -> DataFrame:
    """AvailableNow drain of the stateful operator into a memory sink."""
    from bufr2geojson_spark.streaming.ingest import (
        decode_stream,
        read_document_stream,
    )

    stream = decode_stream(read_document_stream(spark, input_path))
    latest = latest_obs_per_station(stream)
    q = (
        latest.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def run_latest_obs_changelog(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
) -> int:
    """Resumable changelog drain: foreachBatch parquet sink (memory sinks
    cannot recover from a checkpoint), idempotent per batch_id like
    ``run_ingest_once``. Returns batches committed this run."""
    from bufr2geojson_spark.streaming.ingest import (
        decode_stream,
        read_document_stream,
    )

    stream = decode_stream(read_document_stream(spark, input_path))
    latest = latest_obs_per_station(stream)
    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{output_path}/batch_id={batch_id}"
        )
        n_batches["n"] += 1

    q = (
        latest.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]
