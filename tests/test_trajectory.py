"""Trajectory analytics: track stats and dwell detection vs brute force."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from bufr2geojson_spark.operators.trajectory import detect_stops, track_stats

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _hav(lat1, lon1, lat2, lon2):
    r = 6371.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    # the operator floor-quantizes hops to 2 dp (SEG_DP) for exact sums
    return math.floor(2 * r * math.asin(math.sqrt(a)) * 100 + 0.5) / 100


def _mk_points(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), float(la), float(lo), i)
         for i, (u, s, la, lo) in enumerate(rows)],
        "user_id int, ts timestamp, lat double, lon double, event_id long",
    )


class TestTrackStats:
    def test_against_brute_force(self, spark):
        rows = [
            # user 1: a 3-hop track
            (1, 0, 50.0, 0.0), (1, 3600, 50.5, 0.0),
            (1, 7200, 50.5, 1.0), (1, 10800, 51.0, 1.0),
            # user 2: single point (no segments)
            (2, 0, 10.0, 10.0),
        ]
        out = {r["user_id"]: r for r in
               track_stats(_mk_points(spark, rows)).collect()}
        hops = [_hav(50.0, 0, 50.5, 0), _hav(50.5, 0, 50.5, 1.0),
                _hav(50.5, 1.0, 51.0, 1.0)]
        u1 = out[1]
        assert u1["n_points"] == 4 and u1["n_segments"] == 3
        assert u1["total_km"] == pytest.approx(sum(hops), abs=2e-4)
        assert u1["max_hop_km"] == pytest.approx(max(hops), abs=2e-4)
        # each hop took exactly 1 h -> speed number equals hop km
        assert u1["max_kmh"] == pytest.approx(max(hops), abs=2e-4)
        assert u1["avg_kmh"] == pytest.approx(sum(hops) / 3.0, abs=2e-4)
        u2 = out[2]
        assert u2["n_points"] == 1 and u2["n_segments"] == 0
        assert u2["total_km"] is None and u2["max_kmh"] is None

    def test_duplicate_timestamp_segment_excluded_from_speed(self, spark):
        rows = [(1, 0, 0.0, 0.0), (1, 0, 0.0, 1.0), (1, 3600, 0.0, 2.0)]
        r = track_stats(_mk_points(spark, rows)).collect()[0]
        # distance counts both hops; speed only the positive-duration one
        assert r["n_segments"] == 2
        assert r["total_km"] == pytest.approx(2 * _hav(0, 0, 0, 1), abs=2e-4)
        assert r["max_kmh"] == pytest.approx(_hav(0, 1, 0, 2), abs=2e-4)

    def test_single_shuffle_plan(self, spark):
        rows = [(1, 0, 0.0, 0.0), (1, 60, 0.1, 0.0)]
        plan = (track_stats(_mk_points(spark, rows))
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange hashpartitioning") == 1
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestDetectStops:
    def test_dwell_episode_found(self, spark):
        # drive fast, dwell 30 min in ~0 km hops, drive fast again
        rows = [
            (1, 0, 50.0, 0.0),
            (1, 3600, 51.0, 0.0),        # fast hop (~111 km/h)
            (1, 3600 + 600, 51.001, 0.0),   # slow
            (1, 3600 + 1200, 51.002, 0.0),  # slow
            (1, 3600 + 1800, 51.001, 0.0),  # slow
            (1, 7200 + 1800, 52.0, 0.0),    # fast again
        ]
        out = detect_stops(
            _mk_points(spark, rows), max_speed_kmh=5.0, min_dwell_s=900
        ).collect()
        assert len(out) == 1
        s = out[0]
        assert s["stop_seq"] == 1 and s["n_hops"] == 3
        assert s["dwell_s"] == pytest.approx(1800.0)
        assert s["c_lat"] == pytest.approx((51.001 + 51.002 + 51.001) / 3,
                                           abs=1e-4)
        assert s["start_ts"] == T0 + dt.timedelta(seconds=3600)
        assert s["end_ts"] == T0 + dt.timedelta(seconds=3600 + 1800)

    def test_short_dwell_filtered_and_runs_split(self, spark):
        rows = [
            (1, 0, 50.0, 0.0),
            (1, 600, 50.001, 0.0),       # slow run A (10 min -> filtered)
            (1, 1200, 51.0, 0.0),        # fast breaks the run
            (1, 1800, 51.001, 0.0),      # slow run B...
            (1, 4800, 51.002, 0.0),      # ...3000 s total -> kept
        ]
        out = detect_stops(
            _mk_points(spark, rows), max_speed_kmh=5.0, min_dwell_s=2000
        ).collect()
        assert len(out) == 1 and out[0]["dwell_s"] == pytest.approx(3600.0)

    def test_multi_user_independent(self, spark):
        rows = [(u, s, 50.0 + u + 0.0001 * (s // 600), 0.0)
                for u in (1, 2) for s in range(0, 3600, 600)]
        out = detect_stops(
            _mk_points(spark, rows), max_speed_kmh=5.0, min_dwell_s=1800
        ).collect()
        assert {r["user_id"] for r in out} == {1, 2}
        for r in out:
            assert r["stop_seq"] == 1

    def test_determinism_across_partitioning(self, spark):
        rows = [(u, s * 300 + (u * 7) % 60,
                 50.0 + u + 0.01 * ((s * 13) % 5),
                 0.1 * ((s * 7) % 11))
                for u in range(5) for s in range(40)]
        a = detect_stops(_mk_points(spark, rows).repartition(1))
        b = detect_stops(_mk_points(spark, rows).repartition(13))
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestOdFlows:
    def test_flows_between_dwells(self, spark):
        from bufr2geojson_spark.operators.trajectory import od_flows

        # two users; user 1 makes A->B and B->A trips, user 2 makes A->B
        rows = []
        def stop(u, seq, start_s, end_s, la, lo):
            rows.append((u, seq, T0 + dt.timedelta(seconds=start_s),
                         T0 + dt.timedelta(seconds=end_s), float(end_s - start_s),
                         la, lo, 3))
        import datetime as dt
        A = (10.5, 20.5)    # cell (50, 100)
        B = (30.5, 40.5)    # cell (60, 110)
        stop(1, 1, 0, 1000, *A)
        stop(1, 2, 2000, 3000, *B)      # A->B transit 1000 s
        stop(1, 3, 4500, 5000, *A)      # B->A transit 1500 s
        stop(2, 1, 0, 1000, *A)
        stop(2, 2, 3000, 4000, *B)      # A->B transit 2000 s
        df = spark.createDataFrame(
            rows, "user_id int, stop_seq int, start_ts timestamp, "
                  "end_ts timestamp, dwell_s double, c_lat double, "
                  "c_lon double, n_hops int")
        got = {(r["o_gi"], r["o_gj"], r["d_gi"], r["d_gj"]):
               (r["n_trips"], r["avg_transit_s"])
               for r in od_flows(df).collect()}
        assert got == {
            (50, 100, 60, 110): (2, 1500.0),   # two A->B trips, mean 1500
            (60, 110, 50, 100): (1, 1500.0),   # one B->A trip
        }

    def test_single_stop_user_emits_nothing(self, spark):
        import datetime as dt

        from bufr2geojson_spark.operators.trajectory import od_flows

        df = spark.createDataFrame(
            [(1, 1, T0, T0 + dt.timedelta(seconds=900), 900.0,
              10.0, 10.0, 2)],
            "user_id int, stop_seq int, start_ts timestamp, "
            "end_ts timestamp, dwell_s double, c_lat double, "
            "c_lon double, n_hops int")
        assert od_flows(df).count() == 0


class TestTrackSimilarity:
    def _pts(self, spark, rows):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(u, t0 + dt.timedelta(seconds=i), float(la), float(lo))
             for i, (u, la, lo) in enumerate(rows)],
            "user_id int, ts timestamp, lat double, lon double")

    def test_jaccard_over_cell_sets(self, spark):
        from bufr2geojson_spark.operators.trajectory import track_similarity

        # 1-degree cells; duplicates within a cell collapse (set semantics)
        pts = self._pts(spark, [
            (1, 10.2, 20.2), (1, 10.8, 20.8),   # same cell, counted once
            (1, 11.5, 20.5), (1, 12.5, 20.5),   # user 1: 3 cells
            (2, 10.4, 20.4), (2, 11.1, 20.1),   # user 2: 2 cells, 2 shared
            (3, 50.5, 60.5),                    # user 3: disjoint
        ])
        rows = track_similarity(pts, grid_deg=1.0).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["user_a"], r["user_b"]) == (1, 2)
        assert (r["shared_cells"], r["cells_a"], r["cells_b"]) == (2, 3, 2)
        assert r["jaccard"] == pytest.approx(2 / 3, abs=1e-6)

    def test_hot_cell_cap_prunes_pairs_not_sizes(self, spark):
        from bufr2geojson_spark.operators.trajectory import track_similarity

        # cell (10,20) visited by everyone (the "airport"), plus a
        # discriminating cell shared only by users 1 and 2
        pts = self._pts(spark, [
            (u, 10.5, 20.5) for u in (1, 2, 3, 4)
        ] + [(1, 30.5, 40.5), (2, 30.5, 40.5)])
        uncapped = track_similarity(pts, grid_deg=1.0)
        assert uncapped.count() == 6  # all C(4,2) pairs share the airport
        capped = {
            (r["user_a"], r["user_b"]):
                (r["shared_cells"], r["cells_a"], r["cells_b"], r["jaccard"])
            for r in track_similarity(
                pts, grid_deg=1.0, max_users_per_cell=3).collect()
        }
        # only the discriminating cell survives pair generation, but the
        # airport still counts toward cell-set sizes (jaccard stays an
        # upper bound: 1 / (2 + 2 - 1))
        assert set(capped) == {(1, 2)}
        sc, ca, cb, jac = capped[(1, 2)]
        assert (sc, ca, cb) == (1, 2, 2)
        assert jac == pytest.approx(1 / 3, abs=1e-6)

    def test_thresholds(self, spark):
        from bufr2geojson_spark.operators.trajectory import track_similarity

        pts = self._pts(spark, [
            (1, 10.5, 20.5), (1, 11.5, 20.5),
            (2, 10.5, 20.5), (2, 50.5, 60.5),
        ])
        # one shared cell, jaccard 1/3
        assert track_similarity(pts, grid_deg=1.0, min_shared=2).count() == 0
        assert track_similarity(
            pts, grid_deg=1.0, min_jaccard=0.5).count() == 0
        assert track_similarity(
            pts, grid_deg=1.0, min_jaccard=0.3).count() == 1


class TestDetectConvoys:
    def _pts(self, spark, rows):
        """rows: (user, bin, lat, lon) with bin_s=100 -> ts = bin*100."""
        import datetime as dt
        base = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(u, base + dt.timedelta(seconds=b * 100 + 5),
              float(la), float(lo)) for u, b, la, lo in rows],
            "user_id int, ts timestamp, lat double, lon double")

    def test_longest_consecutive_run(self, spark):
        from bufr2geojson_spark.operators.trajectory import detect_convoys

        A = (10.5, 20.5)
        rows = []
        # users 1,2 together in bins 0,1,2 then apart in 3, together in 5
        for b in (0, 1, 2, 5):
            rows += [(1, b, *A), (2, b, *A)]
        rows += [(1, 3, *A), (2, 3, 50.5, 60.5)]
        out = detect_convoys(
            self._pts(spark, rows), grid_deg=1.0, bin_s=100, min_run=2
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["user_a"], r["user_b"]) == (1, 2)
        assert r["n_bins_together"] == 4      # bins 0,1,2,5
        assert r["longest_run"] == 3          # 0-2
        assert (r["first_bin"], r["last_bin"]) == (
            r["first_bin"], r["first_bin"] + 5)

    def test_non_consecutive_filtered(self, spark):
        from bufr2geojson_spark.operators.trajectory import detect_convoys

        A = (10.5, 20.5)
        rows = [(1, 0, *A), (2, 0, *A), (1, 2, *A), (2, 2, *A)]
        assert detect_convoys(
            self._pts(spark, rows), grid_deg=1.0, bin_s=100, min_run=2
        ).count() == 0

    def test_multi_cell_same_bin_counts_once(self, spark):
        from bufr2geojson_spark.operators.trajectory import detect_convoys

        rows = []
        for b in (0, 1):
            # together in TWO cells within each bin
            for cell in ((10.5, 20.5), (30.5, 40.5)):
                rows += [(1, b, *cell), (2, b, *cell)]
        r = detect_convoys(
            self._pts(spark, rows), grid_deg=1.0, bin_s=100, min_run=2
        ).collect()[0]
        assert r["n_bins_together"] == 2 and r["longest_run"] == 2

    def test_hot_cell_cap(self, spark):
        from bufr2geojson_spark.operators.trajectory import detect_convoys

        A = (10.5, 20.5)
        rows = [(u, b, *A) for u in (1, 2, 3) for b in (0, 1)]
        assert detect_convoys(
            self._pts(spark, rows), grid_deg=1.0, bin_s=100, min_run=2
        ).count() == 3
        assert detect_convoys(
            self._pts(spark, rows), grid_deg=1.0, bin_s=100, min_run=2,
            max_users_per_cell=2,
        ).count() == 0


class TestSpeedAnomalies:
    def test_fast_hop_flagged(self, spark):
        from bufr2geojson_spark.operators.trajectory import speed_anomalies

        rows = [
            # hop 1: ~55.6 km in 1 h -> ~55.6 km/h; hop 2: ~11 km in 1 h
            (1, 0, 50.0, 0.0), (1, 3600, 50.5, 0.0), (1, 7200, 50.6, 0.0),
        ]
        out = speed_anomalies(_mk_points(spark, rows), max_kmh=30.0).collect()
        assert len(out) == 1
        r = out[0]
        assert r["user_id"] == 1 and r["dt_s"] == 3600.0
        assert r["speed_kmh"] == pytest.approx(
            _hav(50.0, 0, 50.5, 0), abs=2e-4
        )
        assert (r["lat"], r["lon"]) == (50.5, 0.0)

    def test_first_ping_and_zero_dt_never_flagged(self, spark):
        from bufr2geojson_spark.operators.trajectory import speed_anomalies

        # second point duplicates the timestamp: dt = 0 -> speed NULL
        rows = [(1, 0, 0.0, 0.0), (1, 0, 10.0, 10.0)]
        assert speed_anomalies(_mk_points(spark, rows), max_kmh=0.1).count() == 0


class TestDetectTrips:
    def test_split_at_gap(self, spark):
        from bufr2geojson_spark.operators.trajectory import detect_trips

        rows = [
            (1, 0, 50.0, 0.0), (1, 3600, 50.5, 0.0), (1, 7200, 51.0, 0.0),
            # 26 h of darkness, then one more hop
            (1, 7200 + 26 * 3600, 60.0, 0.0),
            (1, 7200 + 27 * 3600, 60.5, 0.0),
        ]
        out = detect_trips(
            _mk_points(spark, rows), max_gap_s=43200.0
        ).orderBy("trip_seq").collect()
        assert [r["trip_seq"] for r in out] == [1, 2]
        t1, t2 = out
        assert t1["n_hops"] == 2 and t2["n_hops"] == 1
        assert t1["duration_s"] == 7200.0 and t2["duration_s"] == 3600.0
        assert t1["trip_km"] == pytest.approx(
            _hav(50.0, 0, 50.5, 0) + _hav(50.5, 0, 51.0, 0), abs=2e-4
        )
        assert t1["avg_kmh"] == pytest.approx(t1["trip_km"] / 2.0, abs=2e-4)

    def test_min_km_filter_and_single_point(self, spark):
        from bufr2geojson_spark.operators.trajectory import detect_trips

        rows = [
            (1, 0, 0.0, 0.0), (1, 3600, 0.001, 0.0),  # ~0.11 km trip
            (2, 0, 10.0, 10.0),  # single point: no hops at all
        ]
        out = detect_trips(_mk_points(spark, rows), min_km=1.0).collect()
        assert out == []


class TestInferHomeCells:
    def test_modal_night_cell(self, spark):
        from bufr2geojson_spark.operators.trajectory import infer_home_cells

        rows = (
            # 3 night pings (hours 0-2) in cell (140, 190) = lat 50.x lon 10.x
            [(1, h * 3600, 50.2, 10.2) for h in range(3)]
            # 2 night pings in a different cell
            + [(1, (3 + h) * 3600, 20.5, 30.5) for h in range(2)]
            # 5 daytime pings elsewhere (hour 12) must not count
            + [(1, 12 * 3600 + i, -40.5, -60.5) for i in range(5)]
        )
        out = infer_home_cells(_mk_points(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["gi"], r["gj"]) == (140, 190) and r["n_pings"] == 3
        assert r["home_lat"] == 50.5 and r["home_lon"] == 10.5

    def test_tie_breaks_to_smallest_cell(self, spark):
        from bufr2geojson_spark.operators.trajectory import infer_home_cells

        rows = [(1, 0, 50.2, 10.2), (1, 3600, 20.5, 30.5)]
        r = infer_home_cells(_mk_points(spark, rows)).collect()[0]
        assert (r["gi"], r["gj"]) == (110, 210)  # lat 20.5 sorts first


class TestGeofenceTransitions:
    def _fences(self, spark):
        return spark.createDataFrame(
            [(1, 0.0, 10.0, 0.0, 10.0)],
            "fence_id int, lat_min double, lat_max double, "
            "lon_min double, lon_max double",
        )

    def test_enter_exit_reenter(self, spark):
        from bufr2geojson_spark.operators.trajectory import (
            geofence_transitions,
        )

        rows = [
            (1, 0, -5.0, 5.0),     # outside
            (1, 60, 5.0, 5.0),     # enter
            (1, 120, 6.0, 5.0),    # still inside: no event
            (1, 180, 15.0, 5.0),   # exit
            (1, 240, 5.0, 5.0),    # re-enter; track ends inside: no exit
        ]
        out = geofence_transitions(
            _mk_points(spark, rows), self._fences(spark)
        ).orderBy("ts").collect()
        assert [(r["transition"], r["ts"]) for r in out] == [
            ("enter", T0 + dt.timedelta(seconds=60)),
            ("exit", T0 + dt.timedelta(seconds=180)),
            ("enter", T0 + dt.timedelta(seconds=240)),
        ]
        assert all(r["fence_id"] == 1 for r in out)

    def test_first_ping_inside_is_enter(self, spark):
        from bufr2geojson_spark.operators.trajectory import (
            geofence_transitions,
        )

        rows = [(1, 0, 5.0, 5.0), (1, 60, 6.0, 6.0)]
        out = geofence_transitions(
            _mk_points(spark, rows), self._fences(spark)
        ).collect()
        assert [(r["transition"],) for r in out] == [("enter",)]

    def test_half_open_edges(self, spark):
        from bufr2geojson_spark.operators.trajectory import (
            geofence_transitions,
        )

        # lat 10.0 is OUTSIDE [0, 10); lat 0.0 is inside
        rows = [(1, 0, 0.0, 5.0), (1, 60, 10.0, 5.0)]
        out = geofence_transitions(
            _mk_points(spark, rows), self._fences(spark)
        ).orderBy("ts").collect()
        assert [r["transition"] for r in out] == ["enter", "exit"]


class TestRadiusOfGyration:
    def test_two_point_track(self, spark):
        from bufr2geojson_spark.operators.trajectory import radius_of_gyration

        rows = [(1, 0, 0.0, 0.0), (1, 3600, 0.0, 1.0)]
        r = radius_of_gyration(_mk_points(spark, rows)).collect()[0]
        # centroid (0, 0.5); both pings sit half the 1-degree arc away
        half = _hav(0.0, 0.0, 0.0, 0.5)
        assert r["n_pings"] == 2
        assert (r["c_lat"], r["c_lon"]) == (0.0, 0.5)
        assert r["rg_km"] == pytest.approx(half, abs=0.05)

    def test_single_point_is_zero(self, spark):
        from bufr2geojson_spark.operators.trajectory import radius_of_gyration

        r = radius_of_gyration(
            _mk_points(spark, [(1, 0, 10.0, 20.0)])
        ).collect()[0]
        assert r["rg_km"] == 0.0

    def test_partitioning_invariance(self, spark):
        from bufr2geojson_spark.operators.trajectory import radius_of_gyration

        rows = [(u, s * 60, 10.0 + u + s / 7.0, 20.0 + s / 11.0)
                for u in (1, 2, 3) for s in range(9)]
        a = radius_of_gyration(_mk_points(spark, rows).repartition(1)
                               ).orderBy("user_id").collect()
        b = radius_of_gyration(_mk_points(spark, rows).repartition(7)
                               ).orderBy("user_id").collect()
        assert a == b


class TestVisitEntropy:
    def test_single_cell_zero(self, spark):
        from bufr2geojson_spark.operators.trajectory import visit_entropy

        rows = [(1, s, 10.1, 20.1) for s in range(5)]
        r = visit_entropy(_mk_points(spark, rows)).collect()[0]
        assert r["n_cells"] == 1 and r["entropy"] == 0.0

    def test_uniform_two_cells_ln2(self, spark):
        import math

        from bufr2geojson_spark.operators.trajectory import visit_entropy

        rows = [(1, s, 10.5, 20.5) for s in range(3)] + \
               [(1, 10 + s, 40.5, 60.5) for s in range(3)]
        r = visit_entropy(_mk_points(spark, rows)).collect()[0]
        assert r["n_cells"] == 2
        assert r["entropy"] == pytest.approx(math.log(2.0), abs=1e-5)


class TestContactEvents:
    def test_close_pair_found_far_pair_not(self, spark):
        from bufr2geojson_spark.operators.trajectory import contact_events

        rows = [
            (1, 0, 10.0, 20.0),
            (2, 1800, 10.5, 20.0),    # ~55 km, 30 min apart -> contact
            (3, 0, -60.0, 150.0),     # far away
        ]
        out = contact_events(
            _mk_points(spark, rows), dist_km=100.0, window_s=3600.0
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["user_a"], r["user_b"]) == (1, 2) and r["n_contacts"] == 1
        assert r["min_km"] == pytest.approx(_hav(10.0, 20.0, 10.5, 20.0),
                                            abs=0.05)

    def test_time_window_excludes(self, spark):
        from bufr2geojson_spark.operators.trajectory import contact_events

        rows = [(1, 0, 10.0, 20.0), (2, 7200, 10.1, 20.0)]
        assert contact_events(
            _mk_points(spark, rows), dist_km=100.0, window_s=3600.0
        ).count() == 0

    def test_adjacent_band_pair_found_once(self, spark):
        from bufr2geojson_spark.operators.trajectory import contact_events

        # 100 km band ~ 0.9 deg; put the pair astride a band boundary
        rows = [(1, 0, 0.88, 0.0), (2, 60, 0.92, 0.0)]
        out = contact_events(
            _mk_points(spark, rows), dist_km=100.0, window_s=3600.0
        ).collect()
        assert len(out) == 1 and out[0]["n_contacts"] == 1


class TestTrackHausdorff:
    def test_matches_brute_force(self, spark):
        from bufr2geojson_spark.operators.trajectory import track_hausdorff

        tracks = {
            1: [(0.0, 0.0), (0.0, 1.0), (0.5, 0.5)],
            2: [(0.0, 0.5), (0.2, 0.5)],
            3: [(1.0, 3.0)],
        }
        rows = [(u, 60 * i, la, lo)
                for u, ps in tracks.items() for i, (la, lo) in enumerate(ps)]
        out = {(r["user_a"], r["user_b"]): r
               for r in track_hausdorff(_mk_points(spark, rows)).collect()}

        def directed(a, b):
            return max(min(_hav(x1, y1, x2, y2) for x2, y2 in b)
                       for x1, y1 in a)

        for (ua, ub), r in out.items():
            ta, tb = tracks[ua], tracks[ub]
            assert r["h_ab"] == pytest.approx(directed(ta, tb), abs=0.05)
            assert r["h_ba"] == pytest.approx(directed(tb, ta), abs=0.05)
            assert r["hausdorff_km"] == pytest.approx(
                max(directed(ta, tb), directed(tb, ta)), abs=0.05)
        # all three tracks share the 5-degree cell around the origin-ish
        assert (1, 2) in out

    def test_identical_tracks_zero(self, spark):
        from bufr2geojson_spark.operators.trajectory import track_hausdorff

        rows = [(u, 60 * i, la, lo) for u in (1, 2)
                for i, (la, lo) in enumerate([(0.0, 0.0), (0.0, 1.0)])]
        r = track_hausdorff(_mk_points(spark, rows)).collect()[0]
        assert r["hausdorff_km"] == 0.0


class TestCoDwells:
    def _stops(self, spark, rows):
        # build a stop table directly: (user, start_s, end_s, lat, lon)
        import datetime as dt

        data = [
            (u, i + 1, T0 + dt.timedelta(seconds=s0),
             T0 + dt.timedelta(seconds=s1), float(s1 - s0),
             float(la), float(lo), 2)
            for i, (u, s0, s1, la, lo) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data,
            "user_id int, stop_seq int, start_ts timestamp, "
            "end_ts timestamp, dwell_s double, c_lat double, "
            "c_lon double, n_hops int",
        )

    def test_overlapping_nearby_dwells_meet(self, spark):
        from bufr2geojson_spark.operators.trajectory import co_dwells

        stops = self._stops(spark, [
            (1, 0, 4000, 10.0, 20.0),
            (2, 1000, 5000, 10.3, 20.0),   # ~33 km away, 3000 s overlap
            (3, 0, 4000, -50.0, -100.0),   # far away
            (4, 9000, 12000, 10.0, 20.0),  # near user 1 but later
        ])
        out = co_dwells(stops, dist_km=100.0).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["user_a"], r["user_b"]) == (1, 2)
        assert r["n_meetings"] == 1
        assert r["total_overlap_s"] == 3000.0
        assert r["min_km"] == pytest.approx(_hav(10.0, 20.0, 10.3, 20.0),
                                            abs=0.05)

    def test_min_overlap_filters(self, spark):
        from bufr2geojson_spark.operators.trajectory import co_dwells

        stops = self._stops(spark, [
            (1, 0, 4000, 10.0, 20.0),
            (2, 3900, 8000, 10.1, 20.0),   # only 100 s overlap
        ])
        assert co_dwells(stops, dist_km=100.0,
                         min_overlap_s=600.0).count() == 0
        assert co_dwells(stops, dist_km=100.0).count() == 1


class TestSimplifyTracks:
    """Douglas-Peucker simplification: endpoints, tolerance guarantee,
    idempotence, partitioning invariance."""

    def _points(self, spark):
        import random

        rng = random.Random(7)
        rows = []
        for u in (1, 2):
            for i in range(120):
                rows.append((u, 60 * i,
                             10.0 + 0.05 * i + rng.uniform(-0.03, 0.03),
                             20.0 + 0.02 * i + rng.uniform(-0.03, 0.03)))
        return _mk_points(spark, rows)

    def test_endpoints_kept_and_tolerance_holds(self, spark):
        from bufr2geojson_spark.operators.trajectory import simplify_tracks

        tol = 0.015625
        pts = self._points(spark)
        kept = simplify_tracks(pts, tol_deg=tol).orderBy("user_id", "idx")
        rows = kept.collect()
        orig = {
            u: sorted(
                (r["event_id"], r["lat"], r["lon"])
                for r in pts.filter(F.col("user_id") == u).collect()
            )
            for u in (1, 2)
        }
        for u in (1, 2):
            pk = [(r["idx"], r["lat"], r["lon"]) for r in rows
                  if r["user_id"] == u]
            n = len(orig[u])
            assert pk[0][0] == 0 and pk[-1][0] == n - 1
            assert 2 < len(pk) < n  # actually simplified, non-trivially
            # DP guarantee: every dropped point deviates <= tol from the
            # kept segment spanning it (squared-cross form, no sqrt)
            xs = [p[2] for p in orig[u]]  # lon by idx (event order)
            ys = [p[1] for p in orig[u]]
            for (i0, _, _), (i1, _, _) in zip(pk, pk[1:]):
                ax, ay, bx, by = xs[i0], ys[i0], xs[i1], ys[i1]
                den = (bx - ax) ** 2 + (by - ay) ** 2
                for j in range(i0 + 1, i1):
                    cross = ((bx - ax) * (ys[j] - ay)
                             - (by - ay) * (xs[j] - ax))
                    assert cross * cross <= tol * tol * den + 1e-18

    def test_idempotent(self, spark):
        from bufr2geojson_spark.operators.trajectory import simplify_tracks

        pts = self._points(spark)
        k1 = simplify_tracks(pts, tol_deg=0.015625)
        # re-simplify the kept chain (re-index by kept order via ts proxy:
        # feed idx as both ts-order and seq)
        again = simplify_tracks(
            k1.withColumn("ts", F.col("idx")), tol_deg=0.015625,
            ts_col="ts", seq_col="idx",
        )
        assert again.count() == k1.count()

    def test_partitioning_invariance(self, spark):
        from bufr2geojson_spark.operators.trajectory import simplify_tracks

        pts = self._points(spark)
        a = simplify_tracks(pts.repartition(1), tol_deg=0.015625)
        b = simplify_tracks(pts.repartition(13), tol_deg=0.015625)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_tiny_tracks(self, spark):
        from bufr2geojson_spark.operators.trajectory import simplify_tracks

        pts = _mk_points(spark, [(1, 0, 5.0, 5.0),
                                 (2, 0, 6.0, 6.0), (2, 60, 6.5, 6.5)])
        out = sorted(map(tuple, simplify_tracks(pts).collect()))
        assert out == [(1, 0, 5.0, 5.0), (2, 0, 6.0, 6.0), (2, 1, 6.5, 6.5)]


class TestLocateAt:
    def test_interpolates_midpoint(self, spark):
        from bufr2geojson_spark.operators.trajectory import locate_at

        pts = _mk_points(spark, [(1, 0, 10.0, 20.0), (1, 100, 12.0, 24.0)])
        t = T0 + dt.timedelta(seconds=50)
        [row] = locate_at(pts, t).collect()
        assert row["method"] == "interp"
        assert row["at_lat"] == 11.0 and row["at_lon"] == 22.0

    def test_last_known_within_gap_only(self, spark):
        from bufr2geojson_spark.operators.trajectory import locate_at

        pts = _mk_points(spark, [(1, 0, 10.0, 20.0),   # dark after t0
                                 (2, 0, 30.0, 40.0)])
        near = T0 + dt.timedelta(seconds=3600)
        out = {r["user_id"]: r for r in
               locate_at(pts, near, max_gap_s=7200.0).collect()}
        assert out[1]["method"] == "last_known"
        assert out[1]["at_lat"] == 10.0
        far = T0 + dt.timedelta(seconds=10**6)
        assert locate_at(pts, far, max_gap_s=7200.0).count() == 0

    def test_track_starting_after_t_absent(self, spark):
        from bufr2geojson_spark.operators.trajectory import locate_at

        pts = _mk_points(spark, [(1, 1000, 10.0, 20.0)])
        assert locate_at(pts, T0 + dt.timedelta(seconds=10)).count() == 0

    def test_exact_ping_at_t_is_before_side(self, spark):
        from bufr2geojson_spark.operators.trajectory import locate_at

        t = T0 + dt.timedelta(seconds=100)
        pts = _mk_points(spark, [(1, 0, 0.0, 0.0), (1, 100, 5.0, 5.0),
                                 (1, 200, 9.0, 9.0)])
        [row] = locate_at(pts, t).collect()
        # ts <= t wins the before bracket: interp from (100s) to (200s)
        # at frac 0 -> exactly the ping at t
        assert row["method"] == "interp"
        assert row["at_lat"] == 5.0 and row["at_lon"] == 5.0

    def test_single_aggregation_plan(self, spark):
        from bufr2geojson_spark.operators.trajectory import locate_at

        pts = _mk_points(spark, [(1, 0, 10.0, 20.0), (1, 100, 12.0, 24.0)])
        plan = locate_at(pts, T0)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1       # one groupBy shuffle
        assert "Window" not in plan


class TestConvexHulls:
    @staticmethod
    def _brute(pts):
        """Boundary q-form + betweenness prune, exact ints (the oracle's
        formulation, independent of the monotone chain)."""
        pts = sorted(set(pts))
        if len(pts) <= 2:
            return set(pts)
        bnd = set()
        for p in pts:
            for q in pts:
                if q == p:
                    continue
                if all(
                    (q[0] - p[0]) * (r[1] - p[1])
                    - (q[1] - p[1]) * (r[0] - p[0]) >= 0
                    for r in pts
                ):
                    bnd.add(p)
                    break
        verts = set()
        for p in bnd:
            between = False
            for a in bnd:
                for b in bnd:
                    if a == p or b == p or a == b:
                        continue
                    collin = (
                        (b[0] - a[0]) * (p[1] - a[1])
                        == (b[1] - a[1]) * (p[0] - a[0])
                    )
                    if collin and min(a[0], b[0]) <= p[0] <= max(a[0], b[0]) \
                            and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]):
                        between = True
                        break
                if between:
                    break
            if not between:
                verts.add(p)
        return verts

    @staticmethod
    def _area2(verts):
        import math
        if len(verts) < 3:
            return 0
        cx = sum(x for x, _ in verts) / len(verts)
        cy = sum(y for _, y in verts) / len(verts)
        ordered = sorted(verts, key=lambda p: math.atan2(p[1] - cy,
                                                         p[0] - cx))
        a = 0
        for i in range(len(ordered)):
            x1, y1 = ordered[i]
            x2, y2 = ordered[(i + 1) % len(ordered)]
            a += x1 * y2 - x2 * y1
        return abs(a)

    def _run(self, spark, groups, parts=5):
        from bufr2geojson_spark.operators.trajectory import convex_hulls

        rows = [
            (uid, y / 100.0, x / 100.0)
            for uid, pts in groups.items() for (x, y) in pts
        ]
        df = spark.createDataFrame(
            rows, "user_id long, lat double, lon double"
        ).repartition(parts)
        return {
            r["user_id"]: (r["n_hull"], r["area2"], r["lat_s_sum"],
                           r["lon_s_sum"])
            for r in convex_hulls(df).collect()
        }

    def test_matches_bruteforce_random(self, spark):
        import random

        rng = random.Random(23)
        groups = {
            uid: [(rng.randrange(-50, 50), rng.randrange(-50, 50))
                  for _ in range(40)]
            for uid in range(6)
        }
        got = self._run(spark, groups)
        for uid, pts in groups.items():
            verts = self._brute(pts)
            want = (len(verts), self._area2(verts),
                    sum(y for _, y in verts), sum(x for x, _ in verts))
            assert got[uid] == want, (uid, got[uid], want)

    def test_collinear_and_degenerate_groups(self, spark):
        groups = {
            1: [(0, 0), (10, 10), (20, 20), (5, 5)],      # all collinear
            2: [(3, 4)],                                   # single point
            3: [(0, 0), (7, 1)],                           # two points
            4: [(0, 0), (10, 0), (5, 0), (10, 10), (0, 10), (5, 10),
                (5, 5)],                                   # mid-edge points
        }
        got = self._run(spark, groups)
        assert got[1] == (2, 0, 20, 20)        # endpoints only
        assert got[2] == (1, 0, 4, 3)
        assert got[3] == (2, 0, 1, 7)
        # square 10x10: 4 corners, area2 = 200; (5,0),(5,10),(5,5) pruned
        assert got[4] == (4, 200, 20, 20)

    def test_partition_invariant(self, spark):
        import random

        rng = random.Random(5)
        groups = {uid: [(rng.randrange(-30, 30), rng.randrange(-30, 30))
                        for _ in range(25)] for uid in range(4)}
        assert self._run(spark, groups, parts=1) == \
            self._run(spark, groups, parts=13)


class TestTrackCrossings:
    def test_matches_bruteforce(self, spark):
        import datetime as dt
        import random

        from bufr2geojson_spark.operators.trajectory import track_crossings

        rng = random.Random(31)
        base = dt.datetime(2024, 3, 1)
        rows = []
        eid = 0
        for uid in range(6):
            for _ in range(15):
                rows.append((
                    uid, base + dt.timedelta(minutes=eid), eid,
                    rng.randrange(-300, 300) / 100.0,
                    rng.randrange(-300, 300) / 100.0,
                ))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_id long, "
            "lat double, lon double",
        )
        got = {
            (r["user_a"], r["user_b"]): r["n_crossings"]
            for r in track_crossings(df, grid_deg=1.0).collect()
        }

        # brute force in exact ints
        segs = {}
        for uid in range(6):
            pts = [(round(lon * 100), round(lat * 100))
                   for u2, _, _, lat, lon in rows if u2 == uid]
            segs[uid] = list(zip(pts, pts[1:]))

        def o(a, b, c):
            return ((b[0] - a[0]) * (c[1] - a[1])
                    - (b[1] - a[1]) * (c[0] - a[0]))

        want = {}
        for ua in range(6):
            for ub in range(ua + 1, 6):
                n = 0
                for p1, p2 in segs[ua]:
                    for q1, q2 in segs[ub]:
                        o1, o2 = o(p1, p2, q1), o(p1, p2, q2)
                        o3, o4 = o(q1, q2, p1), o(q1, q2, p2)
                        if ((o1 > 0 > o2) or (o1 < 0 < o2)) and \
                                ((o3 > 0 > o4) or (o3 < 0 < o4)):
                            n += 1
                if n:
                    want[(ua, ub)] = n
        assert got == want

    def test_touching_and_collinear_excluded(self, spark):
        import datetime as dt

        from bufr2geojson_spark.operators.trajectory import track_crossings

        t = dt.datetime(2024, 3, 1)
        m = dt.timedelta(minutes=1)
        rows = [
            # user 0: horizontal segment (0,0)->(2,0) [lon,lat scaled]
            (0, t, 0, 0.0, 0.0), (0, t + m, 1, 0.0, 0.02),
            # user 1: touches at endpoint (1,0)->(1,2): T-touch, excluded
            (1, t, 2, 0.0, 0.01), (1, t + m, 3, 0.02, 0.01),
            # user 2: collinear overlap along lat=0, excluded
            (2, t, 4, 0.0, 0.01), (2, t + m, 5, 0.0, 0.03),
            # user 3: genuine crossing of user 0's segment
            (3, t, 6, -0.01, 0.01), (3, t + m, 7, 0.01, 0.01),
        ]
        df = spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_id long, "
            "lat double, lon double",
        )
        got = {
            (r["user_a"], r["user_b"]): r["n_crossings"]
            for r in track_crossings(df, grid_deg=1.0).collect()
        }
        assert got.get((0, 3)) == 1
        assert (0, 1) not in got   # endpoint touch is not proper
        assert (0, 2) not in got   # collinear overlap is not proper

    def test_blocking_complete_across_cells(self, spark):
        import datetime as dt

        from bufr2geojson_spark.operators.trajectory import track_crossings

        t = dt.datetime(2024, 3, 1)
        m = dt.timedelta(minutes=1)
        # long segments spanning several 1-degree cells, crossing far from
        # either endpoint's cell
        rows = [
            (0, t, 0, 0.0, -5.0), (0, t + m, 1, 0.0, 5.0),
            (1, t, 2, -5.0, 0.5), (1, t + m, 3, 5.0, 0.5),
        ]
        df = spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_id long, "
            "lat double, lon double",
        )
        got = track_crossings(df, grid_deg=1.0).collect()
        assert len(got) == 1 and got[0]["n_crossings"] == 1


class TestTrackDtw:
    @staticmethod
    def _brute(sa, sb, band=None):
        big = 1 << 60
        n, m = len(sa), len(sb)
        acc = [[big] * (m + 1) for _ in range(n + 1)]
        acc[0][0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                if band is not None and abs(i - j) > band:
                    continue
                c = ((sa[i - 1][0] - sb[j - 1][0]) ** 2
                     + (sa[i - 1][1] - sb[j - 1][1]) ** 2)
                acc[i][j] = c + min(acc[i - 1][j], acc[i][j - 1],
                                    acc[i - 1][j - 1])
        return acc[n][m]

    def _df(self, spark, tracks):
        import datetime as dt

        base = dt.datetime(2024, 3, 1)
        rows = []
        eid = 0
        for uid, pts in tracks.items():
            for (x, y) in pts:
                rows.append((uid, base + dt.timedelta(minutes=eid), eid,
                             y / 100.0, x / 100.0))
                eid += 1
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, "
                  "lat double, lon double",
        )

    def test_matches_bruteforce(self, spark):
        import random

        from bufr2geojson_spark.operators.trajectory import track_dtw

        rng = random.Random(41)
        tracks = {
            uid: [(rng.randrange(-200, 200), rng.randrange(-200, 200))
                  for _ in range(rng.randrange(5, 20))]
            for uid in range(5)
        }
        got = {
            (r["user_a"], r["user_b"]): (r["n_a"], r["n_b"], r["dtw_cost"])
            for r in track_dtw(self._df(spark, tracks),
                               grid_deg=5.0).collect()
        }
        assert got  # candidate pairs exist (all tracks share cells)
        for (ua, ub), (na, nb, c) in got.items():
            assert na == len(tracks[ua]) and nb == len(tracks[ub])
            assert c == self._brute(tracks[ua], tracks[ub]), (ua, ub)

    def test_order_sensitivity_vs_point_sets(self, spark):
        from bufr2geojson_spark.operators.trajectory import track_dtw

        # same point SET, opposite visit order: DTW must be far from 0
        pts = [(i * 10, i * 10) for i in range(10)]
        tracks = {0: pts, 1: list(reversed(pts)), 2: list(pts)}
        got = {(r["user_a"], r["user_b"]): r["dtw_cost"]
               for r in track_dtw(self._df(spark, tracks),
                                  grid_deg=5.0).collect()}
        assert got[(0, 2)] == 0            # identical order aligns freely
        assert got[(0, 1)] > 0             # reversed order pays alignment

    def test_band_equals_full_when_wide_and_narrow_is_upper_bound(
            self, spark):
        import random

        from bufr2geojson_spark.operators.trajectory import track_dtw

        rng = random.Random(43)
        tracks = {
            uid: [(rng.randrange(-100, 100), rng.randrange(-100, 100))
                  for _ in range(12)]
            for uid in range(3)
        }
        df = self._df(spark, tracks)
        full = {(r["user_a"], r["user_b"]): r["dtw_cost"]
                for r in track_dtw(df, grid_deg=5.0).collect()}
        wide = {(r["user_a"], r["user_b"]): r["dtw_cost"]
                for r in track_dtw(df, grid_deg=5.0, band=50).collect()}
        narrow = {(r["user_a"], r["user_b"]): r["dtw_cost"]
                  for r in track_dtw(df, grid_deg=5.0, band=2).collect()}
        assert wide == full
        for k, v in narrow.items():
            assert v >= full[k]           # band restricts the path set
            assert v == self._brute(tracks[k[0]], tracks[k[1]], band=2)

    def test_band_unreachable_corner_yields_null_not_sentinel(self, spark):
        """|n_a - n_b| > band makes the (n, m) corner unreachable: the
        cost must surface as NULL, never as the internal int64 infinity
        sentinel that looks like a (huge) real measurement."""
        from bufr2geojson_spark.operators.trajectory import track_dtw

        tracks = {
            0: [(i * 5, i * 5) for i in range(14)],   # n=14
            1: [(i * 5, i * 5) for i in range(4)],    # m=4, gap 10 > band 3
            2: [(i * 5, i * 5) for i in range(13)],   # gap 1 <= band
        }
        got = {(r["user_a"], r["user_b"]): r["dtw_cost"]
               for r in track_dtw(self._df(spark, tracks),
                                  grid_deg=5.0, band=3).collect()}
        assert got[(0, 1)] is None
        assert got[(1, 2)] is None
        assert got[(0, 2)] is not None and got[(0, 2)] >= 0
