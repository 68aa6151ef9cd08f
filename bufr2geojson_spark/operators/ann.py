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
* ``ivf_topk`` — IVF-style ANN: corpus vectors are assigned to their nearest
  of C deterministic centroids (a coarse quantizer); each query probes the
  ``nprobe`` nearest centroid lists only. The inverted-list equi-join is the
  100 TB plan shape: shuffle keyed on centroid id, list sizes bounded by
  C >> skew.
* ``embedding_near_dup`` — near-duplicate *pairs* by cosine ≥ threshold
  (the embedding leg of the dedup family). Scale path = LSH-bucketed
  self-join (same-bucket candidates only); the all-pairs form is the oracle.

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


# ---------------------------------------------------------------------------
# IVF-style ANN (coarse quantizer + inverted lists)
# ---------------------------------------------------------------------------


def ivf_centroid_ids(n_centroids: int, corpus_size: int) -> list[int]:
    """Deterministic coarse-quantizer 'training': centroids are the vectors
    at evenly spaced ids (reproducible on the oracle side; a k-means refit
    drops in behind the same signature on a real cluster)."""
    step = max(1, corpus_size // n_centroids)
    return [i * step for i in range(n_centroids)]


def ivf_assign(
    embeddings: DataFrame,
    centroid_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, ties → lower
    centroid id). Centroids are broadcast; assignment is a narrow argmax fold
    over a literal-array struct — no shuffle, no UDF."""
    cents = embeddings.filter(F.col(id_col).isin(centroid_ids)).select(
        F.col(id_col).alias("centroid_id"),
        _as_double(F.col(vec_col)).alias("centv"),
    )
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    scored = (
        base.join(F.broadcast(cents))
        .select(
            id_col, "v", "centroid_id",
            cosine(F.col("v"), F.col("centv")).alias("ccos"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("ccos"), F.asc("centroid_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "v", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    corpus_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: exact cosine only against vectors whose centroid is among the
    query's ``nprobe`` nearest centroids. Plan: broadcast(query probes) ⋈
    inverted lists on centroid_id — the corpus is scanned once and shuffled
    once on a C-ary key."""
    if corpus_size is None:
        corpus_size = embeddings.count()
    cids = ivf_centroid_ids(n_centroids, corpus_size)
    assigned = ivf_assign(embeddings, cids, id_col, vec_col)

    cents = embeddings.filter(F.col(id_col).isin(cids)).select(
        F.col(id_col).alias("centroid_id"),
        _as_double(F.col(vec_col)).alias("centv"),
    )
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    qprobe_scored = F.broadcast(q).crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "centroid_id",
        cosine(F.col("qv"), F.col("centv")).alias("ccos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("centroid_id")
    )
    probes = (
        qprobe_scored.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    scored = (
        F.broadcast(probes)
        .join(
            assigned.withColumnRenamed(id_col, "neighbor_id")
            .withColumnRenamed("v", "cv"),
            on="centroid_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (the embedding leg of the dedup family)
# ---------------------------------------------------------------------------


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 0,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, cosine ≥ threshold).

    ``n_planes > 0`` enables the LSH-bucketed self-join (candidates must share
    a hyperplane-sign bucket) — the scale path that bounds the pair count at
    100 TB. ``n_planes = 0`` is the exact all-pairs form used as the oracle
    reference at small scale.
    """
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    if n_planes > 0:
        planes = hyperplanes(n_planes, dim)
        base = base.withColumn("bucket", lsh_bucket(F.col("v"), planes))
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"),
        *(["bucket"] if n_planes > 0 else []),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
        *(["bucket"] if n_planes > 0 else []),
    )
    if n_planes > 0:
        joined = a.join(b, on="bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        joined = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        joined.select(
            "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
    )
