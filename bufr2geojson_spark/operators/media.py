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
    """Arrow-batched media decode (mapInPandas). With no imaging libs in the
    container the pixel decode is a deterministic stub (``is_stub=true``);
    the batching, schema, and partition behavior are the real thing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = _fake_decode(pdf["media_ref"])
            meta.insert(0, "media_ref", pdf["media_ref"].to_numpy())
            meta.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            # unconditionally a stub: only _fake_decode exists today, so the
            # flag must not claim a real decode just because PIL happens to
            # be importable — flip this only when a real PIL path is wired
            meta["is_stub"] = True
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
