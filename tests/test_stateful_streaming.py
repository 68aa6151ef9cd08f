"""Custom stateful streaming operator (applyInPandasWithState): per-station
latest-observation changelog, checked against the batch window equivalent."""

import shutil
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bufr2geojson_spark.functions.cells import with_cells
from bufr2geojson_spark.operators.decode import decode_documents
from bufr2geojson_spark.sources.synth import synth_documents
from bufr2geojson_spark.streaming.ingest import event_time
from bufr2geojson_spark.streaming.stateful import run_latest_obs_once


@pytest.fixture(scope="module")
def dirs(spark):
    base = tempfile.mkdtemp(prefix="b2g_state_")
    docs = synth_documents(spark, 120, partitions=4)
    docs.write.mode("overwrite").parquet(f"{base}/in")
    yield base, docs
    shutil.rmtree(base, ignore_errors=True)


def _batch_latest(spark, docs):
    feats = event_time(
        with_cells(decode_documents(docs).filter("error is null"))
    ).filter("event_ts is not null and wsi is not null")
    w = Window.partitionBy("wsi").orderBy(
        F.desc(F.unix_timestamp("event_ts")), F.desc("feature_id")
    )
    return (
        feats.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("wsi", "feature_id",
                F.unix_timestamp("event_ts").alias("event_epoch"))
    )


def test_latest_obs_matches_batch_window(spark, dirs):
    base, docs = dirs
    table = run_latest_obs_once(spark, f"{base}/in", f"{base}/ck1")
    # update-mode changelog: the last emission per wsi is the current latest
    w = Window.partitionBy("wsi").orderBy(
        F.desc("event_epoch"), F.desc("feature_id")
    )
    got = (
        table.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("wsi", "feature_id", "event_epoch")
    )
    exp = _batch_latest(spark, docs)
    assert got.count() == exp.count()
    assert got.subtract(exp).count() == 0


def test_latest_obs_incremental_only_advances(spark, dirs):
    from bufr2geojson_spark.streaming.stateful import run_latest_obs_changelog

    base, _ = dirs
    out, ck = f"{base}/changelog", f"{base}/ck2"
    n1 = run_latest_obs_changelog(spark, f"{base}/in", out, ck)
    assert n1 >= 1
    before = spark.read.parquet(out).count()
    assert before > 0
    # append new docs; the resumed stateful query processes ONLY them and
    # emits changelog rows only for stations whose latest advanced
    extra = synth_documents(spark, 30, partitions=1, start_id=50_000)
    extra.write.mode("append").parquet(f"{base}/in")
    n2 = run_latest_obs_changelog(spark, f"{base}/in", out, ck)
    assert n2 >= 1
    after = spark.read.parquet(out).count()
    assert 0 <= after - before <= 30
