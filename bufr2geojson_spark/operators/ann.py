"""Similarity search over embedding columns (array<float>).

Two paths per the training-data mandate:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query set
  against the corpus; cosine computed JVM-side with zip_with/aggregate (a
  left-to-right fold, bit-reproducible against the DuckDB oracle's
  ``list_dot_product``), ranked with a window. The baseline.
* ``lsh_ann_topk`` — the scale path: random-hyperplane LSH buckets (planes
  derived deterministically from md5, shipped as literal arrays so the
  oracle can reproduce them), exact cosine only within the query's bucket.
  At 100 TB the bucket join replaces the full cross product; recall trades
  off with ``n_planes``.

No Python UDFs; everything is Column expressions.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).
    Plan shape: broadcast(queries) × corpus → window rank — one shuffle
    (the window partitioning by query), corpus scanned once."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic md5-derived hyperplanes in [-1, 1) — reproducible as
    SQL literals on the oracle side."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append(round(h / float(2 ** 31) - 1.0, 6))
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a vector against the literal hyperplanes."""
    bits = []
    for p, plane in enumerate(planes):
        lit = F.array(*[F.lit(x) for x in plane])
        bits.append(
            F.when(_dot(vec, lit) > 0,
                   F.shiftleft(F.lit(1).cast("long"), p))
            .otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket only."""
    planes = hyperplanes(n_planes, dim)
    base = embeddings.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(base.withColumnRenamed(id_col, "neighbor_id")
              .withColumnRenamed("v", "cv"), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
