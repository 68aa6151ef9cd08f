"""Lineage truncation for iterative operators (connected components,
k-core, BFS, SSSP, DBSCAN, IVF training).

Each driver-side round must materialize its result with an O(1)-deep plan
or planning cost compounds (~4x plan growth per round measured on the CC
loop; see ``connected_components``). Two modes, selected by the
``reliable_checkpoint`` kwarg every iterative operator exposes:

* ``False`` (default): ``localCheckpoint`` — blocks live on executors.
  Right for ``local[...]`` masters and this sandbox; on a real cluster a
  lost executor loses blocks and kills the job mid-loop.
* ``True``: ``checkpoint()`` against the SparkContext checkpoint dir
  (HDFS/S3-backed on a real cluster) — survives executor loss. Requires
  ``spark.sparkContext.setCheckpointDir(<fault-tolerant path>)`` first; a
  clear error is raised up front otherwise rather than letting Spark fail
  rounds deep into the loop.

This used to be a code-edit note in each operator docstring ("swap
localCheckpoint for checkpoint before a lossy-executor deployment");
round-3 verdict #6 made it a switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_round(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Materialize one iterative round with truncated lineage. See the
    module docstring for the two modes."""
    if not reliable:
        return df.localCheckpoint(eager=True)
    require_checkpoint_dir(df.sparkSession)
    return df.checkpoint(eager=True)


def require_checkpoint_dir(spark) -> None:
    """Fail fast (with the fix in the message) when reliable checkpointing
    is requested but no checkpoint dir is configured."""
    if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        raise ValueError(
            "reliable_checkpoint=True requires a fault-tolerant checkpoint "
            "directory: call spark.sparkContext.setCheckpointDir"
            "('hdfs://... or s3://...') before running the operator"
        )
