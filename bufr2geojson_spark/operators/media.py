"""Multimodal column plumbing: media spans as opaque refs + typed metadata.

The corpus interleaves media spans (north_rule: "interleaved text + media
documents"). Image/audio libraries are NOT installed in this container, so
the decode step is STUBBED — ``decode_media`` tries Pillow and otherwise
produces a clearly-marked deterministic fake — but every piece of Spark-side
plumbing is real and tested: the explode to a media table (pure built-ins),
the mapInPandas batch shape for binary decode, the typed metadata schema,
and deterministic frame sampling.
"""

from __future__ import annotations

from typing import Iterator

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


# --- decoder seam ----------------------------------------------------------
# Real decoders plug in here WITHOUT code changes (round-2 verdict #7):
#   * pixel decoder: callable(refs: pd.Series) -> pd.DataFrame with columns
#     width, height, channels, n_bytes, sha, features (MEDIA_META_SCHEMA
#     minus the id columns) — e.g. a Pillow open()+histogram over the blob
#     the ref points to;
#   * audio decoder: callable(refs: pd.Series) -> pd.DataFrame with columns
#     sample_rate, n_samples — e.g. soundfile/ffprobe;
#   * resize decoder: callable(refs: pd.Series, out_w, out_h) ->
#     pd.Series of flat float lists (len out_w*out_h).
# When a decoder is None (this container ships no Pillow/ffmpeg) the
# deterministic md5 stub runs and every row carries is_stub=true. The seam
# is captured into the mapInPandas closure at PLAN BUILD time so a
# registered decoder (even a test-local function) is cloudpickled by value
# to the Python workers.
_PIXEL_DECODER = None
_AUDIO_DECODER = None
_RESIZE_DECODER = None


def set_pixel_decoder(fn) -> None:
    """Register (or clear with None) the real image decoder."""
    global _PIXEL_DECODER
    _PIXEL_DECODER = fn


def set_audio_decoder(fn) -> None:
    """Register (or clear with None) the real audio decoder."""
    global _AUDIO_DECODER
    _AUDIO_DECODER = fn


def set_resize_decoder(fn) -> None:
    """Register (or clear with None) the real decode+resize kernel."""
    global _RESIZE_DECODER
    _RESIZE_DECODER = fn


def media_table(docs: DataFrame) -> DataFrame:
    """Explode interleaved documents to one row per media span —
    pure built-ins (posexplode + filter), no UDF."""
    return (
        docs.select(
            "doc_id", F.posexplode("spans").alias("span_idx", "span")
        )
        .filter(F.col("span.kind") == "media")
        .select(
            "doc_id",
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.text").alias("caption"),
            F.col("span.offset").alias("offset"),
            "span_idx",
        )
    )


MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("sha", StringType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("is_stub", BooleanType()),
    ]
)


def _fake_decode(refs: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: dimensions/feature vector derived from the
    md5 of the media_ref. STUB — replace the body with a real
    Pillow/ffmpeg decode when the libraries are present; the Spark-side
    contract (Arrow batch in, MEDIA_META_SCHEMA out) stays identical."""
    out = {"width": [], "height": [], "channels": [], "n_bytes": [],
           "sha": [], "features": []}
    for ref in refs:
        digest = hashlib.md5(str(ref).encode()).digest()
        out["width"].append(64 + digest[0] * 4)
        out["height"].append(64 + digest[1] * 4)
        out["channels"].append(3)
        out["n_bytes"].append(int.from_bytes(digest[2:5], "big"))
        out["sha"].append(digest.hex())
        out["features"].append(
            [round(b / 255.0, 6) for b in digest[:8]]
        )
    return pd.DataFrame(out)


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched media decode (mapInPandas). With no registered decoder
    (no imaging libs in this container) the pixel decode is a deterministic
    stub (``is_stub=true``); the batching, schema, and partition behavior
    are the real thing, and a decoder registered via ``set_pixel_decoder``
    flips ``is_stub`` with zero code changes (seam test:
    tests/test_media.py)."""
    decoder = _PIXEL_DECODER  # capture at plan-build time (see seam note)
    is_stub = decoder is None
    decode_fn = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = decode_fn(pdf["media_ref"])
            meta.insert(0, "media_ref", pdf["media_ref"].to_numpy())
            meta.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            meta["is_stub"] = is_stub
            yield meta[[f.name for f in MEDIA_META_SCHEMA.fields]]

    return media.select("doc_id", "media_ref").mapInPandas(
        run, schema=MEDIA_META_SCHEMA
    )


def frame_sample(media: DataFrame, n_frames: int = 4,
                 duration_s: float = 60.0) -> DataFrame:
    """Deterministic frame-sampling plan for video refs: evenly spaced
    timestamps (pure built-ins; the actual frame grab would live in the
    decode stub)."""
    step = duration_s / n_frames
    return media.select(
        "doc_id",
        "media_ref",
        F.transform(
            F.sequence(F.lit(0), F.lit(n_frames - 1)),
            lambda i: F.round(i.cast("double") * step + step / 2.0, 3),
        ).alias("frame_ts"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("pixels", ArrayType(DoubleType())),
        StructField("is_stub", BooleanType()),
    ]
)


def resize_media(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Arrow-batched resize to a fixed (out_w × out_h) grayscale grid.

    Real pipeline shape: mapInPandas over (doc_id, media_ref) with the
    target dims closed over, one flat float array per image out (the layout
    a training pipeline feeds to a vision tower). Pixel synthesis is the
    deterministic STUB (no Pillow/ffmpeg in this container): each pixel is
    hash-derived from (media_ref, pixel index) — replace `_stub_pixels`
    with a real decode+bilinear resize; schema/batching stay identical."""
    n_px = out_w * out_h
    decoder = _RESIZE_DECODER  # seam capture (see module note)
    is_stub = decoder is None

    def _stub_pixels(ref: str) -> list:
        digest = hashlib.md5(str(ref).encode()).digest()
        return [
            round(digest[(i * 7 + 3) % 16] / 255.0, 6) for i in range(n_px)
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                px = [_stub_pixels(r) for r in pdf["media_ref"]]
            else:
                px = list(decoder(pdf["media_ref"], out_w, out_h))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "out_w": np.full(len(pdf), out_w, dtype=np.int32),
                    "out_h": np.full(len(pdf), out_h, dtype=np.int32),
                    "pixels": px,
                    "is_stub": np.full(len(pdf), is_stub),
                }
            )

    return media.select("doc_id", "media_ref").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def media_feature_join(media_features: DataFrame,
                       embeddings: DataFrame,
                       k: int = 3) -> DataFrame:
    """Cross-modal retrieval plumbing: top-k embedding rows per media
    feature vector by cosine — reuses the ANN kernel over the media
    `features` column (dim 8 here), demonstrating that media features are
    first-class vectors to the similarity operators."""
    from pyspark.sql import Window

    from bufr2geojson_spark.operators.ann import _cos_pre, _dot, _norm

    dim = 8
    m = media_features.select(
        "media_ref", F.col("features").alias("mv")
    ).withColumn("mn", _norm(F.col("mv"), dim))
    e = embeddings.select(
        F.col("vec_id"),
        F.slice(F.col("embedding").cast("array<double>"), 1, dim).alias("ev"),
    ).withColumn("en", _norm(F.col("ev"), dim))
    scored = (
        F.broadcast(m).crossJoin(e)
        .select("media_ref", "vec_id",
                _cos_pre(_dot(F.col("mv"), F.col("ev"), dim),
                         F.col("mn"), F.col("en")).alias("cos"))
    )
    w = Window.partitionBy("media_ref").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("media_ref", "vec_id", "cos", "rank")
    )


AUDIO_META_SCHEMA = StructType([
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_s", DoubleType()),
    StructField("is_stub", BooleanType()),
])


def _fake_audio_decode(refs: pd.Series) -> pd.DataFrame:
    """Deterministic fake audio probe (md5-derived sample rate / length).
    STUB — a real soundfile/ffprobe decoder registered via
    ``set_audio_decoder`` replaces this with identical output columns."""
    rates = np.array([8000, 16000, 22050, 44100])
    h = refs.map(
        lambda r: int(hashlib.md5(f"audio:{r}".encode()).hexdigest()[:8], 16)
    )
    sr = rates[(h % 4).to_numpy()]
    n = (h % 400_000 + 8_000).to_numpy()
    return pd.DataFrame({
        "sample_rate": sr.astype("int32"),
        "n_samples": n.astype("int64"),
    })


def decode_audio(media: DataFrame) -> DataFrame:
    """Audio metadata decode — the third modality's plumbing. No audio
    library ships in this container, so the default decode is a
    clearly-marked deterministic fake (flagged ``is_stub``); a real
    soundfile/ffprobe callable registered via ``set_audio_decoder`` drops
    into the same mapInPandas batch shape and flips the flag without code
    changes. Schema: sample_rate, n_samples, duration_s."""
    decoder = _AUDIO_DECODER  # seam capture (see module note)
    is_stub = decoder is None
    decode_fn = decoder or _fake_audio_decode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = decode_fn(pdf["media_ref"])
            out = pdf[["doc_id", "media_ref"]].copy()
            out["sample_rate"] = meta["sample_rate"].to_numpy()
            out["n_samples"] = meta["n_samples"].to_numpy()
            out["duration_s"] = (
                out["n_samples"] / out["sample_rate"]
            )
            out["is_stub"] = is_stub
            yield out

    schema = StructType(
        [media.schema["doc_id"], media.schema["media_ref"]]
        + list(AUDIO_META_SCHEMA.fields)
    )
    return media.select("doc_id", "media_ref").mapInPandas(gen, schema)


def audio_segments(
    media_or_meta: DataFrame,
    segment_s: float = 10.0,
    min_tail_s: float = 1.0,
) -> DataFrame:
    """Fixed-window audio segmentation (the chunking step an audio training
    pipeline runs before feature extraction): each clip splits into
    ``segment_s``-second windows; a final tail shorter than ``min_tail_s``
    is dropped — a clip shorter than ``min_tail_s`` yields NO segments.
    Pure Column ops over the decoded metadata — the segment table is
    (doc_id, media_ref, seg_idx, start_s, end_s, n_seg_samples); the
    (stubbed) waveform read happens downstream per segment, so the shuffle
    carries bounded metadata, never audio bytes.

    Accepts either a raw media table or an already-decoded metadata frame
    (a ``decode_audio`` output — detected by its columns), so callers that
    also need the metadata decode once, like ``frame_sample`` composing
    over ``decode_media``."""
    if "duration_s" in media_or_meta.columns:
        meta = media_or_meta
    else:
        meta = decode_audio(media_or_meta)
    n_seg = F.greatest(
        F.floor(
            (F.col("duration_s") - F.lit(float(min_tail_s)))
            / F.lit(float(segment_s))
        ).cast("int") + 1,
        F.lit(0),
    )
    # sequence(0, n-1) with n=0 yields the DESCENDING [0, -1], not an empty
    # array — guard with an explicit empty (live-verified failure mode)
    idxs = F.when(
        n_seg > 0, F.sequence(F.lit(0), n_seg - 1)
    ).otherwise(F.array().cast("array<int>"))
    segs = meta.withColumn("seg_idx", F.explode(idxs))
    start = F.col("seg_idx") * F.lit(float(segment_s))
    end = F.least(start + F.lit(float(segment_s)), F.col("duration_s"))
    # half-up rounding, not truncation: duration_s*sr can compute to
    # n-0.000...1 in binary floating point and a cast would undercount the
    # tail by one sample (breaking per-clip sample conservation)
    return segs.select(
        "doc_id", "media_ref", "sample_rate", "seg_idx",
        start.alias("start_s"), end.alias("end_s"),
        F.floor((end - start) * F.col("sample_rate") + 0.5).cast("long")
        .alias("n_seg_samples"),
    )


AHASH_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("media_ref", StringType()),
    StructField("phash", LongType()),
    StructField("is_stub", BooleanType()),
])


def media_ahash(resized: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) perceptual fingerprint over
    ``resize_media`` output: bit i = (pixel_i > mean pixel), packed
    little-endian into a signed 64-bit int (two's complement).

    The comparison is done on integer-quantized pixels (``floor(p * 1e6
    + 0.5)``, then ``64 * q_i > sum(q)``) so the hash is exact integer
    arithmetic — engine- and float-representation-independent, which is
    what lets a DuckDB oracle reproduce it bit-for-bit from the
    deterministic stub decode. With a real resize decoder registered the
    same code produces real perceptual hashes (is_stub flips).

    Arrow-batched numpy kernel (dim-64 per-row reduction — the measured
    law: wide kernels go to numpy, not unrolled codegen).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = np.asarray(list(pdf["pixels"]), dtype=np.float64)
            if px.size == 0:
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                    "phash": np.array([], dtype=np.int64),
                    "is_stub": pdf["is_stub"]})
                continue
            q = np.floor(px * 1e6 + 0.5).astype(np.int64)
            n = q.shape[1]
            bits = (n * q) > q.sum(axis=1, keepdims=True)
            weights = (np.uint64(1) << np.arange(
                min(n, 64), dtype=np.uint64))
            packed = (bits[:, :64].astype(np.uint64) * weights).sum(
                axis=1, dtype=np.uint64).view(np.int64)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                "phash": packed, "is_stub": pdf["is_stub"]})

    return resized.select(
        "doc_id", "media_ref", "pixels", "is_stub"
    ).mapInPandas(run, schema=AHASH_SCHEMA)


def phash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 7,
    ref_col: str = "media_ref",
    hash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash Hamming distance —
    the SimHash banding scheme applied to image fingerprints: split the
    64-bit hash into ``max_hamming + 1`` byte-ish bands (pigeonhole: two
    hashes within ``max_hamming`` bits agree exactly on >= 1 band), meet
    candidates in an equi-join keyed on (band index, band value), then
    verify the exact popcount on the deduped candidates.

    Everything is JVM-side codegen bit math (shift/mask/xor/bit_count);
    the shuffle carries (band key, ref, hash) — never the pixel data —
    and candidate volume is governed by band collisions, not |media|².
    max_hamming <= 63 (band count clamps to 64/width >= 8 one-byte
    bands for the default 7).
    """
    n_bands = int(max_hamming) + 1
    width = 64 // n_bands
    h = F.col(hash_col)
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("b"),
            (F.shiftright(h, b * width)
             .bitwiseAND(F.lit((1 << width) - 1))).alias("v"),
        )
        for b in range(n_bands)
    ])
    t = hashes.select(
        F.col(ref_col).alias("ref"), h.alias("h"),
        F.explode(bands).alias("band"),
    ).select("ref", "h", F.col("band.b").alias("b"),
             F.col("band.v").alias("v"))
    a = t.select(F.col("ref").alias("ref_a"), F.col("h").alias("h_a"),
                 "b", "v")
    bside = t.select(F.col("ref").alias("ref_b"), F.col("h").alias("h_b"),
                     "b", "v")
    cand = (
        a.join(bside, on=["b", "v"])
        .filter(F.col("ref_a") < F.col("ref_b"))
        .select("ref_a", "ref_b", "h_a", "h_b")
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= int(max_hamming))
        .select("ref_a", "ref_b", "hamming")
    )
