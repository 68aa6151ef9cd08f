"""Multimodal plumbing tests: explode → decode(stub) → frame-sample →
resize → cross-modal join. The pixel decode is an environment-forced stub
(no Pillow/ffmpeg here, flagged is_stub); everything Spark-side — schemas,
Arrow batch shapes, determinism, join plumbing — is real and asserted."""

from pyspark.sql import functions as F

from bufr2geojson_spark.operators.media import (
    decode_media,
    frame_sample,
    media_feature_join,
    media_table,
    resize_media,
)
from bufr2geojson_spark.sources.synth import synth_documents


def _media(spark, n=60):
    docs = synth_documents(spark, n, n_stations=20, partitions=3)
    return media_table(docs)


def test_media_table_explodes_media_spans_only(spark):
    m = _media(spark).collect()
    assert len(m) == 20  # every media_every=3rd doc
    assert all(r.media_ref.startswith("synthetic://") for r in m)


def test_decode_media_stub_schema_and_determinism(spark):
    m = _media(spark)
    a = {(r.media_ref, r.width, r.height, r.sha)
         for r in decode_media(m).collect()}
    b = {(r.media_ref, r.width, r.height, r.sha)
         for r in decode_media(m.repartition(7)).collect()}
    assert a == b and len(a) == 20
    assert all(r.is_stub for r in decode_media(m).collect())


def test_resize_media_fixed_grid(spark):
    m = _media(spark)
    rows = resize_media(m, out_w=4, out_h=4).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.out_w == 4 and r.out_h == 4
        assert len(r.pixels) == 16
        assert all(0.0 <= p <= 1.0 for p in r.pixels)
        assert r.is_stub
    # deterministic across partitioning
    again = resize_media(m.repartition(5), out_w=4, out_h=4).collect()
    assert {(r.media_ref, tuple(r.pixels)) for r in rows} == {
        (r.media_ref, tuple(r.pixels)) for r in again
    }


def test_frame_sample_even_spacing(spark):
    m = _media(spark)
    r = frame_sample(m, n_frames=4, duration_s=60.0).collect()[0]
    assert r.frame_ts == [7.5, 22.5, 37.5, 52.5]


def test_media_feature_join_topk(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    feats = decode_media(_media(spark))
    out = media_feature_join(feats, emb, k=3)
    rows = out.collect()
    n_media = feats.count()
    assert len(rows) == 3 * n_media
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    for ref, rs in by_ref.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3]
        assert rs[0].cos >= rs[1].cos >= rs[2].cos


class TestAudio:
    def test_metadata_deterministic_and_typed(self, spark):
        from bufr2geojson_spark.operators.media import decode_audio

        media = _media(spark)
        a = decode_audio(media)
        r1 = sorted(map(tuple, a.collect()))
        r2 = sorted(map(tuple, decode_audio(media.repartition(5)).collect()))
        assert r1 == r2 and len(r1) > 0
        row = r1[0]
        assert a.schema["sample_rate"].dataType.typeName() == "integer"
        for r in r1:
            d = dict(zip(a.columns, r))
            assert d["sample_rate"] in (8000, 16000, 22050, 44100)
            assert abs(d["duration_s"] - d["n_samples"] / d["sample_rate"]) \
                < 1e-9
            assert d["is_stub"] is True

    def test_segments_tile_the_clip(self, spark):
        from bufr2geojson_spark.operators.media import (
            audio_segments, decode_audio)

        media = _media(spark)
        meta_df = decode_audio(media)
        meta = {(r["doc_id"], r["media_ref"]): r for r in meta_df.collect()}
        # compose over the decoded metadata (decode runs ONCE)
        segs = audio_segments(meta_df, segment_s=10.0, min_tail_s=1.0)
        rows_all = segs.collect()
        assert all(r["seg_idx"] >= 0 for r in rows_all)
        by_clip = {}
        for r in rows_all:
            by_clip.setdefault((r["doc_id"], r["media_ref"]), []).append(r)
        assert by_clip
        for key, rows in by_clip.items():
            rows.sort(key=lambda r: r["seg_idx"])
            dur = meta[key]["duration_s"]
            # contiguous tiling from 0, no overlap, last end <= duration
            assert rows[0]["start_s"] == 0.0
            for a, b in zip(rows, rows[1:]):
                assert b["start_s"] == a["end_s"]
            assert rows[-1]["end_s"] <= dur + 1e-9
            # the tail is either KEPT (end == duration) or DROPPED and then
            # strictly shorter than segment boundary + min_tail_s in total
            tail = dur - rows[-1]["end_s"]
            assert tail == 0.0 or 0.0 < tail < 1.0, (key, tail)
            for r in rows[:-1]:
                assert r["end_s"] - r["start_s"] == 10.0
            # per-clip sample conservation on fully-kept clips: segment
            # samples sum back to n_samples (half-up rounding, not cast)
            if tail == 0.0:
                assert sum(r["n_seg_samples"] for r in rows) ==                     meta[key]["n_samples"]

    def test_sub_min_tail_clip_yields_no_segments(self, spark):
        """A clip shorter than min_tail_s must yield ZERO segments — the
        sequence(0, n-1) n=0 case that silently produced a seg_idx=-1 row
        (sequence yields DESCENDING [0,-1]) before the guard."""
        from bufr2geojson_spark.operators.media import audio_segments

        meta = spark.createDataFrame(
            [("d1", "clip://short", 44100, 22050, 0.5, True),
             ("d1", "clip://long", 16000, 320000, 20.0, True)],
            "doc_id string, media_ref string, sample_rate int, "
            "n_samples long, duration_s double, is_stub boolean",
        )
        rows = audio_segments(meta, segment_s=10.0, min_tail_s=1.0).collect()
        refs = {r["media_ref"] for r in rows}
        assert "clip://short" not in refs
        assert len([r for r in rows if r["media_ref"] == "clip://long"]) == 2
        assert all(r["seg_idx"] >= 0 for r in rows)
