"""CDC merge_upsert: last-writer-wins, idempotence, tombstones."""

import pytest
from pyspark.sql import functions as F

from bufr2geojson_spark.operators.maintenance import merge_upsert


@pytest.fixture(scope="module")
def tables(spark):
    target = spark.createDataFrame(
        [(1, 10, "a", 1.0), (2, 11, "b", 2.0), (3, 12, "c", 3.0)],
        "k int, v int, payload string, x double",
    )
    updates = spark.createDataFrame(
        [
            (2, 20, "b2", 2.5),      # newer version -> replaces
            (3, 5, "c_old", 0.0),    # older version -> ignored
            (4, 1, "d", 4.0),        # new key -> inserted
            (1, 10, "a_dup", 1.5),   # same version -> update wins the tie
        ],
        "k int, v int, payload string, x double",
    )
    return target, updates


class TestMergeUpsert:
    def test_last_writer_wins(self, spark, tables):
        target, updates = tables
        out = {r["k"]: r for r in
               merge_upsert(target, updates, ["k"], ["v"]).collect()}
        assert out[2]["payload"] == "b2" and out[2]["x"] == 2.5
        assert out[3]["payload"] == "c"          # stale update ignored
        assert out[4]["payload"] == "d"          # insert
        assert out[1]["payload"] == "a_dup"      # tie -> update side wins

    def test_idempotent(self, spark, tables):
        target, updates = tables
        once = merge_upsert(target, updates, ["k"], ["v"])
        twice = merge_upsert(once, updates, ["k"], ["v"])
        assert sorted(map(tuple, once.collect())) == \
            sorted(map(tuple, twice.collect()))

    def test_tombstone_deletes(self, spark, tables):
        target, updates = tables
        tomb = updates.withColumn(
            "payload", F.when(F.col("k") == 2, "DEL").otherwise("payload"))
        out = merge_upsert(target, tomb, ["k"], ["v"],
                           tombstone=F.col("payload") == "DEL")
        assert 2 not in {r["k"] for r in out.collect()}

    def test_stale_tombstone_does_not_delete(self, spark, tables):
        target, _ = tables
        stale = spark.createDataFrame(
            [(3, 1, "DEL", 0.0)], "k int, v int, payload string, x double")
        out = merge_upsert(target, stale, ["k"], ["v"],
                           tombstone=F.col("payload") == "DEL")
        rows = {r["k"]: r for r in out.collect()}
        assert rows[3]["payload"] == "c"   # live row outranks old tombstone

    def test_schema_mismatch_raises(self, spark, tables):
        target, _ = tables
        with pytest.raises(ValueError):
            merge_upsert(target, target.drop("x"), ["k"], ["v"])

    def test_single_shuffle_plan(self, spark, tables):
        target, updates = tables
        plan = (merge_upsert(target, updates, ["k"], ["v"])
                ._jdf.queryExecution().executedPlan().toString())
        # one hash-partitioning exchange on the merge key, no Python stages
        assert plan.count("Exchange hashpartitioning") == 1
        assert "ArrowEvalPython" not in plan


class TestMergeSequenceProperties:
    def test_delta_sequence_equals_one_shot(self, spark):
        """Applying CDC deltas one at a time must converge to the same
        table as merging everything at once (order of arrival respected
        via the version column)."""
        rows = [(i % 17, (i * 7) % 50, f"p{i}", float(i % 13))
                for i in range(300)]
        df = spark.createDataFrame(rows, "k int, v int, payload string, x double")
        d1 = df.filter("v < 15")
        d2 = df.filter("v >= 15 AND v < 35")
        d3 = df.filter("v >= 35")
        empty = df.filter("1 = 0")
        stepwise = merge_upsert(
            merge_upsert(merge_upsert(empty, d1, ["k"], ["v"]),
                         d2, ["k"], ["v"]),
            d3, ["k"], ["v"])
        oneshot = merge_upsert(empty, df, ["k"], ["v"])
        assert sorted(map(tuple, stepwise.collect())) == \
            sorted(map(tuple, oneshot.collect()))

    def test_out_of_order_stale_deltas_ignored(self, spark):
        """A late-arriving delta carrying only older versions must be a
        no-op regardless of when it lands."""
        base = spark.createDataFrame(
            [(1, 10, "new", 0.0)], "k int, v int, payload string, x double")
        stale = spark.createDataFrame(
            [(1, 3, "old", 0.0)], "k int, v int, payload string, x double")
        out = merge_upsert(base, stale, ["k"], ["v"]).collect()
        assert len(out) == 1 and out[0]["payload"] == "new"
