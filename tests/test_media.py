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
        meta = {(r["doc_id"], r["media_ref"]): r
                for r in decode_audio(media).collect()}
        segs = audio_segments(media, segment_s=10.0, min_tail_s=1.0)
        by_clip = {}
        for r in segs.collect():
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
            # dropped tail is shorter than min_tail_s
            assert dur - rows[-1]["end_s"] < 10.0
            for r in rows[:-1]:
                assert r["end_s"] - r["start_s"] == 10.0
