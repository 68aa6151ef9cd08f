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


class TestStreamingStops:
    """Online stay-point detection == batch detect_stops on closed episodes,
    across micro-batch boundaries (one file per batch)."""

    @staticmethod
    def _tracks(spark):
        import datetime as dt

        # 3 users; per user: fast approach, 30-min dwell (tiny hops),
        # fast hop (closes ep 1), second dwell, fast FINAL hop (closes ep 2)
        rows = []
        t0 = dt.datetime(2024, 3, 1)
        for u in (1, 2, 3):
            s = 0
            def pt(sec, la, lo):
                rows.append((u, t0 + dt.timedelta(seconds=sec),
                             50.0 + u + la, 0.0 + lo, len(rows)))
            pt(0, 0.0, 0.0)
            pt(3600, 1.0, 0.0)                    # fast (~111 km/h)
            for i in range(1, 4):                 # dwell A: 3 slow hops
                pt(3600 + 600 * i, 1.0 + 0.0001 * i, 0.0)
            pt(3600 + 1800 + 600, 2.0, 0.0)       # fast -> closes A
            base = 3600 + 2400
            for i in range(1, 5):                 # dwell B: 4 slow hops
                pt(base + 700 * i, 2.0, 0.0002 * i)
            pt(base + 2800 + 600, 3.0, 0.0)       # fast FINAL -> closes B
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, lat double, lon double, "
                  "event_id long")

    def test_matches_batch_across_batches(self, spark, tmp_path):
        from bufr2geojson_spark.operators.trajectory import detect_stops
        from bufr2geojson_spark.streaming.trajectory import (
            run_streaming_stops_once)

        pts = self._tracks(spark)
        path = str(tmp_path / "pts")
        # three time-ordered appends -> three micro-batches; episodes span
        # file boundaries (dwell A starts in batch 1, closes in batch 2).
        # Each track is exactly 11 points appended in time order, so
        # event_id % 11 is the in-track position; sleep keeps mod-times
        # distinct so the file source replays the batches in write order.
        import time as _time

        import pyspark.sql.functions as F
        for lo, hi in [(0, 4), (4, 8), (8, 11)]:
            (pts.filter(f"event_id % 11 >= {lo} and event_id % 11 < {hi}")
             .repartition(1).write.mode("append").parquet(path))
            _time.sleep(1.1)
        # stream over the dir, one file per trigger
        got = run_streaming_stops_once(
            spark, path, str(tmp_path / "ck"),
            max_speed_kmh=5.0, min_dwell_s=900,
            query_name="stops_t1",
        ).select("user_id", "stop_seq", "start_epoch", "end_epoch",
                 "dwell_s", "c_lat", "c_lon", "n_hops")
        batch_pts = spark.read.parquet(path).select(
            "user_id", "ts", "lat", "lon", "event_id")
        exp = detect_stops(batch_pts, max_speed_kmh=5.0, min_dwell_s=900)
        exp = exp.select(
            "user_id", "stop_seq",
            F.to_utc_timestamp("start_ts", "UTC").cast("double")
             .alias("start_epoch"),
            F.to_utc_timestamp("end_ts", "UTC").cast("double")
             .alias("end_epoch"),
            "dwell_s", "c_lat", "c_lon", "n_hops")
        g = sorted(map(tuple, got.collect()))
        e = sorted(map(tuple, exp.collect()))
        assert len(g) == 6           # 2 closed dwells x 3 users
        assert g == e

    def test_short_dwell_not_emitted(self, spark, tmp_path):
        from bufr2geojson_spark.streaming.trajectory import (
            run_streaming_stops_once)

        pts = self._tracks(spark)
        path = str(tmp_path / "pts2")
        pts.repartition(1).write.parquet(path)
        got = run_streaming_stops_once(
            spark, path, str(tmp_path / "ck2"),
            max_speed_kmh=5.0, min_dwell_s=10_000,   # nothing dwells 10ks
            max_files_per_trigger=None,
            query_name="stops_t2",
        )
        assert got.count() == 0


class TestStreamingGeofences:
    FENCES = [(1, 0.0, 10.0, 0.0, 10.0), (2, 5.0, 15.0, 5.0, 15.0)]

    @staticmethod
    def _tracks(spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        # three users wandering across both (overlapping) fences; the
        # crossings land in different appended files below
        paths = {
            1: [(-5, 5), (5, 5), (6, 6), (12, 12), (20, 20), (7, 7)],
            2: [(1, 1), (1, 2), (11, 11), (11, 12), (1, 1), (-1, -1)],
            3: [(20, 20), (21, 20), (20, 21), (22, 22), (20, 20), (21, 21)],
        }
        for u, pts in paths.items():
            for i, (la, lo) in enumerate(pts):
                rows.append((u, t0 + dt.timedelta(seconds=600 * i),
                             float(la), float(lo), eid))
                eid += 1
        return spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, lat double, lon double, "
            "event_id long",
        )

    def test_matches_batch_across_batches(self, spark, tmp_path):
        import time as _time

        import pyspark.sql.functions as F

        from bufr2geojson_spark.operators.trajectory import (
            geofence_transitions,
        )
        from bufr2geojson_spark.streaming.trajectory import (
            run_streaming_geofences_once,
        )

        pts = self._tracks(spark)
        path = str(tmp_path / "gf_pts")
        # 6 points per track -> position within track = event_id % 6;
        # three appends put fence crossings astride batch boundaries
        for lo, hi in [(0, 2), (2, 4), (4, 6)]:
            (pts.filter(f"event_id % 6 >= {lo} and event_id % 6 < {hi}")
             .repartition(1).write.mode("append").parquet(path))
            _time.sleep(1.1)
        got = run_streaming_geofences_once(
            spark, path, str(tmp_path / "gf_ck"), self.FENCES,
            query_name="geofences_t1",
        ).select("user_id", "fence_id", "ts_epoch", "transition")
        fences_df = spark.createDataFrame(
            self.FENCES,
            "fence_id int, lat_min double, lat_max double, "
            "lon_min double, lon_max double",
        )
        exp = geofence_transitions(
            spark.read.parquet(path), fences_df
        ).select(
            "user_id", "fence_id",
            F.to_utc_timestamp("ts", "UTC").cast("double")
             .alias("ts_epoch"),
            "transition",
        )
        g = sorted(map(tuple, got.collect()))
        e = sorted(map(tuple, exp.collect()))
        assert len(g) > 0 and g == e
        # user 3 never touches a fence
        assert all(r[0] != 3 for r in g)

    def test_all_in_one_batch_still_matches(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from bufr2geojson_spark.operators.trajectory import (
            geofence_transitions,
        )
        from bufr2geojson_spark.streaming.trajectory import (
            run_streaming_geofences_once,
        )

        pts = self._tracks(spark)
        path = str(tmp_path / "gf_pts2")
        pts.repartition(1).write.parquet(path)
        got = run_streaming_geofences_once(
            spark, path, str(tmp_path / "gf_ck2"), self.FENCES,
            max_files_per_trigger=None, query_name="geofences_t2",
        ).select("user_id", "fence_id", "ts_epoch", "transition")
        fences_df = spark.createDataFrame(
            self.FENCES,
            "fence_id int, lat_min double, lat_max double, "
            "lon_min double, lon_max double",
        )
        exp = geofence_transitions(
            spark.read.parquet(path), fences_df
        ).select(
            "user_id", "fence_id",
            F.to_utc_timestamp("ts", "UTC").cast("double")
             .alias("ts_epoch"),
            "transition",
        )
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, exp.collect()))


class TestStreamingContacts:
    @staticmethod
    def _pings(spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        # users 1/2 nearby (~55 km), user 3 far; interleaved timestamps
        rows = [
            (1, t0 + dt.timedelta(seconds=0), 10.0, 20.0, 0),
            (2, t0 + dt.timedelta(seconds=600), 10.5, 20.0, 1),
            (1, t0 + dt.timedelta(seconds=1200), 10.1, 20.0, 2),
            (3, t0 + dt.timedelta(seconds=1300), -60.0, 150.0, 3),
            (2, t0 + dt.timedelta(seconds=5000), 10.6, 20.1, 4),
            (1, t0 + dt.timedelta(seconds=5400), 10.0, 20.2, 5),
        ]
        return spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, lat double, lon double, "
            "event_id long",
        )

    @staticmethod
    def _expected(pts):
        import math

        def hav(a, b):
            la1, lo1, la2, lo2 = a[2], a[3], b[2], b[3]
            x = (math.sin(math.radians(la2 - la1) / 2) ** 2
                 + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
                 * math.sin(math.radians(lo2 - lo1) / 2) ** 2)
            d = 2 * 6371.0 * math.asin(math.sqrt(x))
            return math.floor(d * 100 + 0.5) / 100

        rows = [tuple(r) for r in pts.collect()]
        out = set()
        for a in rows:
            for b in rows:
                if a[0] < b[0] and abs((a[1] - b[1]).total_seconds()) <= 3600:
                    km = hav(a, b)
                    if km <= 100.0:
                        out.add((a[0], b[0], a[4], b[4], km))
        return out

    def test_matches_brute_force_across_batches(self, spark, tmp_path):
        import time as _time

        from bufr2geojson_spark.streaming.trajectory import (
            run_streaming_contacts_once,
        )

        pts = self._pings(spark)
        path = str(tmp_path / "ct_pts")
        for lo, hi in [(0, 2), (2, 4), (4, 6)]:
            (pts.filter(f"event_id >= {lo} and event_id < {hi}")
             .repartition(1).write.mode("append").parquet(path))
            _time.sleep(1.1)
        got = run_streaming_contacts_once(
            spark, path, str(tmp_path / "ct_ck"),
            dist_km=100.0, window_s=3600.0, query_name="contacts_t1",
        )
        g = {(r["user_a"], r["user_b"], r["e_a"], r["e_b"], r["km"])
             for r in got.collect()}
        assert g == self._expected(spark.read.parquet(path)
                                   .select("user_id", "ts", "lat", "lon",
                                           "event_id"))
        assert len(g) >= 2  # the nearby pair produced multiple contacts
