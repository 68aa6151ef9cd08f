"""interval_join_bucketed: the time-bucketed point-in-interval join."""

import datetime as dt

from pyspark.sql import functions as F

from bufr2geojson_spark.operators.events import interval_join_bucketed


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def _windows(spark, rows):
    return spark.createDataFrame(
        rows, "w_id long, w_start timestamp, w_end timestamp"
    )


class TestThrottleEvents:
    def test_chain_vs_bruteforce(self, spark):
        from bufr2geojson_spark.operators.events import throttle_events

        base = _ts("2024-03-01 00:00:00")
        # drizzle every 3 min; cooldown 5 min -> kept at 0, 6, 12, ... min
        # (gap sessionization would keep ONLY the first event)
        ev = [(i, base + dt.timedelta(minutes=3 * i), 1, 0.0)
              for i in range(20)]
        got = sorted(r.event_id for r in throttle_events(
            _events(spark, ev), cooldown_s=300).collect())
        kept, last = [], None
        for i, t, _, _ in ev:
            if last is None or (t - last).total_seconds() >= 300:
                kept.append(i)
                last = t
        assert got == kept
        assert len(kept) > 1  # proves it is not gap-sessionization

    def test_exact_boundary_inclusive(self, spark):
        from bufr2geojson_spark.operators.events import throttle_events

        base = _ts("2024-03-01 00:00:00")
        ev = [(0, base, 1, 0.0),
              (1, base + dt.timedelta(seconds=300), 1, 0.0),
              (2, base + dt.timedelta(seconds=599), 1, 0.0)]
        got = sorted(r.event_id for r in throttle_events(
            _events(spark, ev), cooldown_s=300).collect())
        assert got == [0, 1]  # exactly-cooldown kept; 299 s later dropped

    def test_partitioning_invariant(self, spark):
        from bufr2geojson_spark.operators.events import throttle_events

        base = _ts("2024-03-01 00:00:00")
        ev = [(i, base + dt.timedelta(minutes=7 * (i % 50), seconds=i), i % 5,
               0.0) for i in range(200)]
        outs = []
        for p in (2, 16):
            outs.append(sorted(
                (r.event_id, r.user_id)
                for r in throttle_events(
                    _events(spark, ev).repartition(p),
                    cooldown_s=600).collect()))
        assert outs[0] == outs[1]


class TestIntervalJoinBucketed:
    def test_matches_bruteforce(self, spark):
        # events every 17 minutes for 2 days; windows of assorted lengths,
        # some overlapping, some empty, some spanning many buckets
        base = _ts("2024-03-01 00:00:00")
        ev = [
            (i, base + dt.timedelta(minutes=17 * i), i % 7, float(i))
            for i in range(170)
        ]
        ws = [
            (0, _ts("2024-03-01 01:00:00"), _ts("2024-03-01 02:00:00")),
            (1, _ts("2024-03-01 01:30:00"), _ts("2024-03-01 05:00:00")),
            (2, _ts("2024-03-01 23:00:00"), _ts("2024-03-02 08:30:00")),
            (3, _ts("2024-03-05 00:00:00"), _ts("2024-03-06 00:00:00")),
        ]
        got = sorted(
            (r.event_id, r.w_id)
            for r in interval_join_bucketed(
                _events(spark, ev), _windows(spark, ws)
            ).collect()
        )
        exp = sorted(
            (e[0], w[0])
            for e in ev for w in ws
            if w[1] <= e[1] < w[2]
        )
        assert got == exp
        assert exp  # fixture actually produces matches
        # overlapping windows 0 and 1 both match events in [01:30, 02:00)
        both = {e for e, w in exp if w == 0} & {e for e, w in exp if w == 1}
        assert both

    def test_end_exclusive_start_inclusive(self, spark):
        ev = [
            (0, _ts("2024-03-01 01:00:00"), 1, 1.0),  # == start: in
            (1, _ts("2024-03-01 02:00:00"), 1, 1.0),  # == end: out
        ]
        ws = [(0, _ts("2024-03-01 01:00:00"), _ts("2024-03-01 02:00:00"))]
        got = [r.event_id for r in interval_join_bucketed(
            _events(spark, ev), _windows(spark, ws)).collect()]
        assert got == [0]

    def test_no_duplicate_matches_per_pair(self, spark):
        # a window spanning 30 buckets must still emit each (event, window)
        # pair once — the event keys to ONE bucket
        ev = [(0, _ts("2024-03-01 12:00:00"), 1, 1.0)]
        ws = [(0, _ts("2024-03-01 00:00:00"), _ts("2024-03-02 06:00:00"))]
        out = interval_join_bucketed(
            _events(spark, ev), _windows(spark, ws)).collect()
        assert len(out) == 1

    def test_bucket_width_invariant(self, spark):
        base = _ts("2024-03-01 00:00:00")
        ev = [(i, base + dt.timedelta(minutes=11 * i), i % 3, 0.0)
              for i in range(120)]
        ws = [(j, base + dt.timedelta(hours=2 * j),
               base + dt.timedelta(hours=2 * j, minutes=90))
              for j in range(6)]
        res = []
        for b in (60, 3600, 7 * 3600):
            res.append(sorted(
                (r.event_id, r.w_id)
                for r in interval_join_bucketed(
                    _events(spark, ev), _windows(spark, ws),
                    bucket_seconds=b).collect()
            ))
        assert res[0] == res[1] == res[2]

    def test_plan_is_equi_join_not_cartesian(self, spark):
        ev = _events(spark, [(0, _ts("2024-03-01 00:30:00"), 1, 1.0)])
        ws = _windows(
            spark, [(0, _ts("2024-03-01 00:00:00"),
                     _ts("2024-03-01 01:00:00"))])
        plan = interval_join_bucketed(ev, ws)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestMarkovTransitions:
    def test_matches_bruteforce(self, spark):
        from collections import Counter, defaultdict

        from bufr2geojson_spark.operators.events import markov_transitions

        base = _ts("2024-03-01 00:00:00")
        rows = []
        types = ["view", "click", "buy"]
        for eid in range(60):
            rows.append((
                eid,
                base + dt.timedelta(minutes=(eid * 7) % 97),
                eid % 5,
                types[(eid * eid) % 3],
            ))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        got = {
            (r["from_state"], r["to_state"]):
                (r["n_transitions"], r["prob_e6"])
            for r in markov_transitions(df).collect()
        }
        seqs = defaultdict(list)
        for eid, ts, uid, et in rows:
            seqs[uid].append((ts, eid, et))
        counts = Counter()
        for uid, evs in seqs.items():
            evs.sort()
            for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
                counts[(a, b)] += 1
        row_tot = Counter()
        for (a, b), n in counts.items():
            row_tot[a] += n
        want = {
            (a, b): (n, int(n * 1_000_000 / row_tot[a]))
            for (a, b), n in counts.items()
        }
        assert got == want

    def test_tie_timestamps_deterministic(self, spark):
        from bufr2geojson_spark.operators.events import markov_transitions

        t0 = _ts("2024-03-01 00:00:00")
        # two events at the SAME ts: event_id breaks the tie -> a then b
        df = spark.createDataFrame(
            [(1, t0, 1, "a"), (2, t0, 1, "b"), (3, t0, 1, "c")],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        got = {(r["from_state"], r["to_state"]): r["n_transitions"]
               for r in markov_transitions(df).collect()}
        assert got == {("a", "b"): 1, ("b", "c"): 1}


class TestSequenceNgrams:
    def test_matches_bruteforce(self, spark):
        from collections import Counter, defaultdict

        from bufr2geojson_spark.operators.events import sequence_ngrams

        base = _ts("2024-03-01 00:00:00")
        types = ["v", "c", "b", "x"]
        rows = [
            (eid, base + dt.timedelta(minutes=(eid * 3) % 53), eid % 4,
             types[(eid * 7) % 4])
            for eid in range(80)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string"
        )
        got = {r["gram"]: r["n_occurrences"]
               for r in sequence_ngrams(df, n=3, min_support=1).collect()}
        seqs = defaultdict(list)
        for eid, ts, uid, et in rows:
            seqs[uid].append((ts, eid, et))
        want = Counter()
        for evs in seqs.values():
            evs.sort()
            ts_ = [e[2] for e in evs]
            for i in range(len(ts_) - 2):
                want[">".join(ts_[i:i + 3])] += 1
        assert got == dict(want)

    def test_support_filter_and_no_cross_user_grams(self, spark):
        from bufr2geojson_spark.operators.events import sequence_ngrams

        t0 = _ts("2024-03-01 00:00:00")
        m = dt.timedelta(minutes=1)
        rows = [
            (0, t0, 1, "a"), (1, t0 + m, 1, "b"),
            # user 2 continues with c,d: a>b>c must NOT appear (user split)
            (2, t0 + 2 * m, 2, "c"), (3, t0 + 3 * m, 2, "d"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string"
        )
        assert sequence_ngrams(df, n=3, min_support=1).collect() == []

    def test_null_states_dropped_and_delimiter_escaped(self, spark):
        """A NULL mid-sequence state must not produce a misleading
        skip-gram ('a>c'), and a '>' inside a state value must not make
        the gram string ambiguous."""
        from bufr2geojson_spark.operators.events import sequence_ngrams

        t0 = _ts("2024-03-01 00:00:00")
        m = dt.timedelta(minutes=1)
        rows = [
            (0, t0, 1, "a"), (1, t0 + m, 1, None), (2, t0 + 2 * m, 1, "c"),
            (3, t0 + 3 * m, 1, "d"),
            # user 2: a state containing the delimiter
            (4, t0, 2, "x>y"), (5, t0 + m, 2, "z"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string"
        )
        got = {r["gram"]: r["n_occurrences"]
               for r in sequence_ngrams(df, n=2, min_support=1).collect()}
        # null row dropped from the SEQUENCE: a's next surviving state is c
        assert got == {"a>c": 1, "c>d": 1, "x\\>y>z": 1}
