"""Table-maintenance operators: CDC merge/upsert for incremental runs.

The reference is a one-shot batch ETL (``bufr2geojson/cli.py:65-85`` writes a
fresh output dir per invocation); an engine that owns a 10^12-row feature
table instead maintains it incrementally — each new bulletin batch is a CDC
update stream merged into the standing table. ``merge_upsert`` is the
Iceberg-MERGE stand-in for that path (the sandbox has no Iceberg runtime jar;
the real catalog's MERGE INTO drops in behind the same signature, see
``sources/io.py`` for the snapshot-manifest stand-in).

Plan shape (the part that must survive 100 TB): ``unionByName`` +
one window ``row_number`` over the merge key — a SINGLE hash shuffle on the
key, identical to what a sort-merge MERGE does. No driver-side diffing, no
per-row Python. If the standing table is stored bucketed by the key (or
range-partitioned by cell prefix as ``tiles.range_partition_by_cell``
writes it), the big side arrives pre-partitioned and only the (small)
update batch shuffles; AQE handles the skewed-key case. Last-writer-wins
ties are deterministic: explicit ``order_cols`` then source priority
(updates beat target), never partition order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    tombstone: Column | None = None,
) -> DataFrame:
    """Last-writer-wins merge of a CDC ``updates`` batch into ``target``.

    For each merge key, the surviving row is the one with the greatest
    ``order_cols`` tuple across both inputs (updates win exact ties —
    re-delivering the same version must be idempotent). Rows whose survivor
    matches ``tombstone`` (a boolean Column over the unioned schema) are
    deleted from the result — tombstones must win their key first, so they
    carry ordinary versions.

    Returns the merged table with ``target``'s columns. Idempotent:
    merging the same batch twice yields the same table.
    """
    if not keys or not order_cols:
        raise ValueError("merge_upsert needs non-empty keys and order_cols")
    cols = target.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target {cols} vs updates {updates.columns}")
    unioned = (
        target.select(*cols).withColumn("_src", F.lit(0))
        .unionByName(updates.select(*cols).withColumn("_src", F.lit(1)))
    )
    w = Window.partitionBy(*keys).orderBy(
        *[F.desc(c) for c in order_cols], F.desc("_src")
    )
    survivors = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    if tombstone is not None:
        survivors = survivors.filter(~F.coalesce(tombstone, F.lit(False)))
    return survivors.select(*cols)
