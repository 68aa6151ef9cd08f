"""End-to-end pipeline, lineage, and checkpoint-resume tests (N9/N10,
FIXTURES.md §7)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bufr2geojson_spark.plans.pipeline import PipelineConfig, run_pipeline
from bufr2geojson_spark.plans import lineage as L
from bufr2geojson_spark.sources.io import read_snapshot, snapshot_id_for
from bufr2geojson_spark.sources.synth import (
    synth_documents,
    synth_region_polygons,
    synth_stations,
)

N_DOCS = 400
N_ST = 60


@pytest.fixture(scope="module")
def dims(spark):
    return synth_stations(spark, N_ST), synth_region_polygons(spark)


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="b2g_pipe_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _conf():
    return PipelineConfig(hot_threshold=50, output_partitions=8,
                          rollup_levels=(10, 6))


def test_full_pipeline(spark, dims, workdir):
    stations, polygons = dims
    docs = synth_documents(spark, N_DOCS, n_stations=N_ST, partitions=4)
    res = run_pipeline(
        spark, docs, stations, polygons, workdir, "full", snapshot_id=123,
        resume=False, conf=_conf(),
    )
    assert res.executed == ["D", "T", "J", "A", "W"]
    nf = res.features.count()
    assert nf > N_DOCS
    # every feature got cells, a region or null, and a nearest station
    row = res.features.filter("cell_s2 is not null").count()
    assert row == nf
    assert res.features.filter("nearest_station_id is null").count() == 0
    assert res.tiles.count() > 0
    assert {r.level for r in res.tiles.select("level").distinct().collect()} \
        == {14, 10, 6}
    # quarantine empty for clean synth
    assert res.quarantine.count() == 0


def test_lineage_records(spark, dims, workdir):
    lin = L.read_lineage(spark, workdir, "full")
    rows = lin.collect()
    stages = {r.stage for r in rows}
    assert stages == {"D", "T", "J", "A", "W"}
    for r in rows:
        assert r.run_id == "full"
        assert r.snapshot_id == 123
        assert r.row_count > 0
        assert len(r.checksum) == 16
    # lineage row counts sum to stage row counts
    d_total = sum(r.row_count for r in rows if r.stage == "W")
    assert d_total == L.read_stage(spark, workdir, "full", "W").count()
    # W stage carries cell ranges
    w = [r for r in rows if r.stage == "W"]
    assert all(r.cell_lo is not None and r.cell_hi <= 2**60 for r in w)


def test_resume_skips_completed_stages(spark, dims, workdir):
    stations, polygons = dims
    docs = synth_documents(spark, N_DOCS, n_stations=N_ST, partitions=4)
    conf = _conf()

    # 1) run only D and T, then "die" (kill after tiling stage)
    partial_conf = PipelineConfig(**{**conf.__dict__, "stages": ("D", "T")})
    res1 = run_pipeline(
        spark, docs, stations, polygons, workdir, "resume1",
        snapshot_id=7, resume=True, conf=partial_conf,
    )
    assert res1.executed == ["D", "T"]
    t_lineage = {
        (r.partition_id, r.checksum)
        for r in L.read_lineage(spark, workdir, "resume1")
        .filter("stage = 'T'").collect()
    }

    # 2) resume the full run: D and T must be skipped, not recomputed
    res2 = run_pipeline(
        spark, docs, stations, polygons, workdir, "resume1",
        snapshot_id=7, resume=True, conf=conf,
    )
    assert res2.skipped == ["D", "T"]
    assert res2.executed == ["J", "A", "W"]
    t_lineage_after = {
        (r.partition_id, r.checksum)
        for r in L.read_lineage(spark, workdir, "resume1")
        .filter("stage = 'T'").collect()
    }
    assert t_lineage_after == t_lineage  # byte-identical checkpoint

    # 3) resumed final output == uninterrupted run's output (checksums)
    res_full = run_pipeline(
        spark, docs, stations, polygons, workdir, "uninterrupted",
        snapshot_id=7, resume=False, conf=conf,
    )

    def content_hash(df):
        cols = [f.name for f in df.schema.fields if f.dataType.typeName() != "map"]
        return df.select(
            F.bit_xor(F.xxhash64(F.struct(*sorted(cols)))).alias("h")
        ).collect()[0].h

    assert content_hash(res2.features) == content_hash(res_full.features)
    assert content_hash(res2.tiles) == content_hash(res_full.tiles)


def test_snapshot_id_tracks_manifest(spark, workdir, dims):
    stations, _ = dims
    p = f"{workdir}/snap_docs"
    synth_documents(spark, 50).write.mode("overwrite").parquet(p)
    s1 = snapshot_id_for(spark, p)
    df, s2 = read_snapshot(spark, p)
    assert s1 == s2 and s1 > 0
    assert df.count() == 50
    # appending files changes the snapshot id
    synth_documents(spark, 10).write.mode("append").parquet(p)
    assert snapshot_id_for(spark, p) != s1


def test_coarse_checkpoints_equivalent(spark, dims, workdir):
    """checkpoint_stages=('J','A','W') fuses D/T into J's single pass; the
    final feature and tile tables must be identical to full checkpointing."""
    stations, polygons = dims
    docs = synth_documents(spark, N_DOCS, n_stations=N_ST, partitions=4)
    conf = _conf()
    conf.checkpoint_stages = ("J", "A", "W")
    res = run_pipeline(
        spark, docs, stations, polygons, workdir, "coarse", snapshot_id=123,
        resume=False, conf=conf,
    )
    assert res.executed == ["D~fused", "T~fused", "J", "A", "W"]
    full = run_pipeline(
        spark, docs, stations, polygons, workdir, "full", snapshot_id=123,
        resume=True, conf=_conf(),  # resume: reuses test_full_pipeline output
    )
    key = ["feature_id", "cell_s2", "cell_prefix", "region_id",
           "nearest_station_id"]
    assert res.features.select(*key).subtract(
        full.features.select(*key)).count() == 0
    assert res.features.count() == full.features.count()
    t = ["level", "cell", "n_obs"]
    assert res.tiles.select(*t).subtract(full.tiles.select(*t)).count() == 0
    # lineage only for checkpointed stages
    stages = {r.stage for r in res.lineage.select("stage").distinct().collect()}
    assert stages == {"J", "A", "W"}


def test_fused_chain_cached_for_multiple_consumers(spark, dims, workdir):
    """checkpoint_stages=('A','W'): the fused decode+join chain feeds BOTH
    the tile agg and the final write — it must be persisted so the pass
    doesn't re-execute once per consumer, and the outputs must match full
    checkpointing."""
    stations, polygons = dims
    docs = synth_documents(spark, N_DOCS, n_stations=N_ST, partitions=4)
    conf = _conf()
    conf.checkpoint_stages = ("A", "W")
    res = run_pipeline(
        spark, docs, stations, polygons, workdir, "aw_only", snapshot_id=9,
        resume=False, conf=conf,
    )
    assert res.executed == ["D~fused", "T~fused", "J~fused", "A", "W"]
    full = run_pipeline(
        spark, docs, stations, polygons, workdir, "full", snapshot_id=123,
        resume=True, conf=_conf(),  # reuses test_full_pipeline output
    )
    assert res.features.count() == full.features.count()
    t = ["level", "cell", "n_obs"]
    assert res.tiles.select(*t).subtract(full.tiles.select(*t)).count() == 0


def test_missing_final_write_warns(spark, dims, workdir):
    """'W' in stages but not in checkpoint_stages would silently skip the
    final feature-table write — must warn."""
    import warnings as _w

    stations, polygons = dims
    docs = synth_documents(spark, 20, n_stations=N_ST, partitions=2)
    conf = _conf()
    conf.checkpoint_stages = ("D", "T", "J", "A")
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        run_pipeline(
            spark, docs, stations, polygons, workdir, "no_w", snapshot_id=1,
            resume=False, conf=conf,
        )
    assert any("final" in str(c.message).lower() for c in caught)


class TestIncrementalRead:
    def test_reads_only_appended_files(self, spark, tmp_path):
        from bufr2geojson_spark.sources.io import incremental_read
        from bufr2geojson_spark.sources.synth import synth_documents

        path = str(tmp_path / "docs")
        docs = synth_documents(spark, 60, partitions=3)
        wave1 = docs.filter(F.crc32("doc_id") % 2 == 0)
        wave2 = docs.filter(F.crc32("doc_id") % 2 == 1)
        wave1.write.parquet(path)
        d1, m1 = incremental_read(spark, path, None)
        assert sorted(r["doc_id"] for r in d1.select("doc_id").collect()) == \
            sorted(r["doc_id"] for r in wave1.select("doc_id").collect())
        # nothing new -> None, manifest unchanged
        d_none, m_same = incremental_read(spark, path, m1)
        assert d_none is None and m_same == m1
        wave2.write.mode("append").parquet(path)
        d2, m2 = incremental_read(spark, path, m1)
        assert sorted(r["doc_id"] for r in d2.select("doc_id").collect()) == \
            sorted(r["doc_id"] for r in wave2.select("doc_id").collect())
        assert len(m2) > len(m1)

    def test_mutated_file_raises_not_remerges(self, spark, tmp_path):
        import os

        import pytest as _pytest

        from bufr2geojson_spark.sources.io import incremental_read
        from bufr2geojson_spark.sources.synth import synth_documents

        path = str(tmp_path / "docs")
        synth_documents(spark, 20, partitions=1).write.parquet(path)
        _, m1 = incremental_read(spark, path, None)
        # mutate a data file in place (append-only contract violation):
        # silently treating it as new would re-merge consumed rows
        victim = next(f for f in os.listdir(path) if f.endswith(".parquet"))
        with open(os.path.join(path, victim), "ab") as f:
            f.write(b"xx")
        with _pytest.raises(ValueError, match="append-only"):
            incremental_read(spark, path, m1)

    def test_incremental_decode_merge_equals_batch(self, spark, tmp_path):
        from bufr2geojson_spark.functions.cells import with_cells
        from bufr2geojson_spark.operators.decode import decode_documents
        from bufr2geojson_spark.operators.tiles import tile_aggregate, tile_merge
        from bufr2geojson_spark.sources.io import incremental_read
        from bufr2geojson_spark.sources.synth import synth_documents

        path = str(tmp_path / "docs")
        docs = synth_documents(spark, 60, partitions=3)
        docs.filter(F.crc32("doc_id") % 2 == 0).write.parquet(path)
        d1, m1 = incremental_read(spark, path, None)
        tiles = tile_aggregate(
            with_cells(decode_documents(d1).filter("error is null")))
        docs.filter(F.crc32("doc_id") % 2 == 1) \
            .write.mode("append").parquet(path)
        d2, _ = incremental_read(spark, path, m1)
        delta = tile_aggregate(
            with_cells(decode_documents(d2).filter("error is null")))
        merged = {r["cell_s2"]: r
                  for r in tile_merge(tiles, delta).collect()}
        full = {r["cell_s2"]: r for r in tile_aggregate(
            with_cells(decode_documents(docs).filter("error is null"))
        ).collect()}
        assert set(merged) == set(full)
        for c in full:
            assert merged[c]["n_obs"] == full[c]["n_obs"]
            assert abs(merged[c]["sum_val"] - full[c]["sum_val"]) < 1e-6


class TestMaintenancePlan:
    def test_incremental_runs_converge_to_batch(self, spark, tmp_path):
        from bufr2geojson_spark.functions.cells import with_cells
        from bufr2geojson_spark.operators.decode import decode_documents
        from bufr2geojson_spark.operators.tiles import tile_aggregate
        from bufr2geojson_spark.plans.maintenance import (
            run_maintenance, standing_tiles)
        from bufr2geojson_spark.sources.synth import synth_documents

        docs_path = str(tmp_path / "docs")
        work = str(tmp_path / "work")
        docs = synth_documents(spark, 60, partitions=3)
        docs.filter(F.crc32("doc_id") % 2 == 0).write.parquet(docs_path)
        r1 = run_maintenance(spark, docs_path, work)
        assert not r1["no_op"] and r1["version"] == 0
        # no-op when nothing new
        assert run_maintenance(spark, docs_path, work)["no_op"]
        docs.filter(F.crc32("doc_id") % 2 == 1) \
            .write.mode("append").parquet(docs_path)
        r2 = run_maintenance(spark, docs_path, work)
        assert r2["version"] == 1
        got = {r["cell_s2"]: r
               for r in standing_tiles(spark, work).collect()}
        want = {r["cell_s2"]: r for r in tile_aggregate(
            with_cells(decode_documents(docs).filter("error is null"))
        ).collect()}
        assert set(got) == set(want)
        for c in want:
            assert got[c]["n_obs"] == want[c]["n_obs"]

    def test_crash_before_commit_does_not_double_merge(self, spark, tmp_path):
        import json as _json

        from bufr2geojson_spark.plans.maintenance import (
            load_state, run_maintenance, standing_tiles)
        from bufr2geojson_spark.sources.synth import synth_documents

        docs_path = str(tmp_path / "docs")
        work = str(tmp_path / "work")
        docs = synth_documents(spark, 40, partitions=2)
        docs.filter(F.crc32("doc_id") % 2 == 0).write.parquet(docs_path)
        run_maintenance(spark, docs_path, work)
        state_v0 = load_state(work)
        docs.filter(F.crc32("doc_id") % 2 == 1) \
            .write.mode("append").parquet(docs_path)
        run_maintenance(spark, docs_path, work)
        final = sorted(map(tuple, standing_tiles(spark, work).collect()))
        # simulate a crash between the tile write and the manifest commit:
        # roll the manifest back to v0 (tiles/v=1 already exists on disk)
        with open(f"{work}/manifest.json", "w") as f:
            _json.dump(state_v0, f)
        rerun = run_maintenance(spark, docs_path, work)
        assert rerun["version"] == 1   # overwrote the same version
        after = sorted(map(tuple, standing_tiles(spark, work).collect()))
        assert after == final          # identical, not double-merged

    def test_time_travel_and_expiry(self, spark, tmp_path):
        import pytest as _pytest

        from bufr2geojson_spark.plans.maintenance import (
            expire_snapshots, read_tiles, run_maintenance, snapshot_history,
            standing_tiles)
        from bufr2geojson_spark.sources.synth import synth_documents

        docs_path = str(tmp_path / "docs")
        work = str(tmp_path / "work")
        docs = synth_documents(spark, 60, partitions=3)
        # three appends -> three committed snapshots v=0,1,2
        for m in range(3):
            docs.filter(F.crc32("doc_id") % 3 == m) \
                .write.mode("append").parquet(docs_path)
            run_maintenance(spark, docs_path, work)
        hist = snapshot_history(work)
        assert [s["version"] for s in hist] == [0, 1, 2]
        # source-file counts in the log are monotone (append-only source)
        counts = [s["n_source_files"] for s in hist]
        assert counts == sorted(counts)
        # latest read == standing table; old snapshots readable & smaller-or-equal
        latest = sorted(map(tuple, read_tiles(spark, work).collect()))
        assert latest == sorted(map(tuple,
                                    standing_tiles(spark, work).collect()))
        v0 = read_tiles(spark, work, as_of_version=0)
        n0 = v0.agg(F.sum("n_obs")).collect()[0][0]
        n2 = read_tiles(spark, work, as_of_version=2) \
            .agg(F.sum("n_obs")).collect()[0][0]
        assert n0 < n2                       # old snapshot = old state
        # an uncommitted version number is not readable
        with _pytest.raises(ValueError, match="not a committed snapshot"):
            read_tiles(spark, work, as_of_version=7)
        # expiry drops the oldest, keeps current; expired version unreadable
        assert expire_snapshots(work, keep_last=2) == [0]
        assert [s["version"] for s in snapshot_history(work)] == [1, 2]
        with _pytest.raises(ValueError):
            read_tiles(spark, work, as_of_version=0)
        # current snapshot always survives even keep_last=0
        assert expire_snapshots(work, keep_last=0) == [1]
        assert read_tiles(spark, work).count() > 0
        # expiry is idempotent
        assert expire_snapshots(work, keep_last=2) == []


class TestCompaction:
    def test_compacts_preserving_rows(self, spark, tmp_path):
        from bufr2geojson_spark.sources.io import compact_table
        from bufr2geojson_spark.sources.synth import synth_documents

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        docs = synth_documents(spark, 60, partitions=24)  # 24 tiny files
        docs.write.parquet(src)
        summary = compact_table(spark, src, dst, target_bytes=1 << 30)
        assert summary["n_files_in"] >= 24
        assert summary["n_files_out"] == 1
        a = sorted(r["doc_id"] for r in spark.read.parquet(src).collect())
        b = sorted(r["doc_id"] for r in spark.read.parquet(dst).collect())
        assert a == b

    def test_order_cols_restore_clustering(self, spark, tmp_path):
        from bufr2geojson_spark.sources.io import compact_table

        src = str(tmp_path / "s2")
        dst = str(tmp_path / "d2")
        df = spark.range(4000).selectExpr(
            "id", "CAST(pmod(id * 131, 97) AS INT) AS cell")
        df.repartition(16).write.parquet(src)
        compact_table(spark, src, dst, target_bytes=12_000,
                      order_cols=("cell",))
        # range-partitioned output: per-file cell ranges must not overlap
        import pyspark.sql.functions as F
        out = spark.read.parquet(dst).withColumn(
            "f", F.input_file_name()
        ).groupBy("f").agg(F.min("cell").alias("lo"), F.max("cell").alias("hi"))
        rows = sorted(map(tuple, out.select("lo", "hi").collect()))
        assert len(rows) > 1
        for (lo1, hi1), (lo2, hi2) in zip(rows, rows[1:]):
            assert hi1 <= lo2


class TestLegacyManifestUpgrade:
    def test_pre_log_manifest_keeps_old_version_readable(self, spark, tmp_path):
        """A manifest committed before the snapshot log existed must seed
        the log on the next commit — the already-committed version stays
        readable and expirable, never orphaned."""
        import json as _json

        from bufr2geojson_spark.plans.maintenance import (
            load_state, read_tiles, run_maintenance, snapshot_history)
        from bufr2geojson_spark.sources.synth import synth_documents

        docs_path = str(tmp_path / "docs")
        work = str(tmp_path / "work")
        docs = synth_documents(spark, 40, partitions=2)
        docs.filter(F.crc32("doc_id") % 2 == 0).write.parquet(docs_path)
        run_maintenance(spark, docs_path, work)
        # simulate a legacy manifest: strip the snapshot log
        state = load_state(work)
        del state["snapshots"]
        with open(f"{work}/manifest.json", "w") as f:
            _json.dump(state, f)
        docs.filter(F.crc32("doc_id") % 2 == 1) \
            .write.mode("append").parquet(docs_path)
        run_maintenance(spark, docs_path, work)
        assert [s["version"] for s in snapshot_history(work)] == [0, 1]
        assert read_tiles(spark, work, as_of_version=0).count() > 0


class TestSnapshotChangesAndCompaction:
    def _three_snapshots(self, spark, tmp_path):
        from bufr2geojson_spark.plans.maintenance import run_maintenance
        from bufr2geojson_spark.sources.synth import synth_documents

        docs_path = str(tmp_path / "docs")
        work = str(tmp_path / "work")
        docs = synth_documents(spark, 60, partitions=3)
        for m in range(2):
            docs.filter(F.crc32("doc_id") % 2 == m) \
                .write.mode("append").parquet(docs_path)
            run_maintenance(spark, docs_path, work)
        return work

    def test_changelog_applies_to_old_snapshot(self, spark, tmp_path):
        from bufr2geojson_spark.plans.maintenance import (
            read_changes, read_tiles)

        work = self._three_snapshots(spark, tmp_path)
        ch = read_changes(spark, work, 0, 1)
        types = {r["_change_type"] for r in ch.collect()}
        assert types <= {"insert", "update", "delete"}
        assert ch.count() > 0
        # applying the changelog to v0 reproduces v1 exactly
        v0 = read_tiles(spark, work, 0)
        v1 = sorted(map(tuple, read_tiles(spark, work, 1).collect()))
        changed = {r["cell_s2"] for r in ch.collect()}
        kept = [tuple(r) for r in v0.collect()
                if r["cell_s2"] not in changed]
        applied = sorted(
            kept
            + [tuple(r)[:-1] for r in ch.collect()
               if r["_change_type"] != "delete"]
        )
        assert applied == v1
        # self-diff is empty, same schema
        assert read_changes(spark, work, 1, 1).count() == 0

    def test_compaction_commits_new_identical_snapshot(self, spark, tmp_path):
        import os as _os

        from bufr2geojson_spark.plans.maintenance import (
            compact_snapshot, read_changes, read_tiles, snapshot_history)

        work = self._three_snapshots(spark, tmp_path)
        before = sorted(map(tuple, read_tiles(spark, work).collect()))
        n_files_before = len([
            f for f in _os.listdir(f"{work}/tiles/v=1")
            if f.endswith(".parquet")])
        s = compact_snapshot(spark, work, target_files=1)
        assert s["version"] == 2 and s["n_files"] == 1 <= n_files_before
        assert [x["version"] for x in snapshot_history(work)] == [0, 1, 2]
        after = sorted(map(tuple, read_tiles(spark, work).collect()))
        assert after == before                     # row-identical rewrite
        # a compaction is invisible to the changelog
        assert read_changes(spark, work, 1, 2).count() == 0

    def test_maintenance_continues_after_compaction(self, spark, tmp_path):
        from bufr2geojson_spark.plans.maintenance import (
            compact_snapshot, run_maintenance, standing_tiles)
        from bufr2geojson_spark.sources.synth import synth_documents

        docs_path = str(tmp_path / "docs")
        work = str(tmp_path / "work")
        docs = synth_documents(spark, 60, partitions=3)
        docs.filter(F.crc32("doc_id") % 3 == 0).write.parquet(docs_path)
        run_maintenance(spark, docs_path, work)
        compact_snapshot(spark, work, target_files=1)
        # source gains files after the compaction; the next run folds ONLY
        # the appended delta (manifest files state carried through)
        docs.filter(F.crc32("doc_id") % 3 != 0) \
            .write.mode("append").parquet(docs_path)
        r = run_maintenance(spark, docs_path, work)
        assert not r["no_op"] and r["version"] == 2
        total = standing_tiles(spark, work).agg(
            F.sum("n_obs")).collect()[0][0]
        from bufr2geojson_spark.functions.cells import with_cells
        from bufr2geojson_spark.operators.decode import decode_documents
        from bufr2geojson_spark.operators.tiles import tile_aggregate
        want = tile_aggregate(
            with_cells(decode_documents(docs).filter("error is null"))
        ).agg(F.sum("n_obs")).collect()[0][0]
        assert total == want

    def test_empty_compaction_is_noop(self, spark, tmp_path):
        from bufr2geojson_spark.plans.maintenance import compact_snapshot

        assert compact_snapshot(
            spark, str(tmp_path / "nowork"))["no_op"] is True
