"""spark-submit entry point for the Structured Streaming ingest.

Usage:
    spark-submit --py-files bufr2geojson_spark.zip jobs/stream.py \
        --input /path/to/doc_parquet_dir --output /path/to/features \
        --checkpoint /path/to/ckpt [--mode ingest|tiles]

--mode ingest (default): AvailableNow drain — decode + cell-encode every
new document file, append features parquet partitioned by cell_prefix,
exactly-once via the checkpoint dir (re-running with nothing new is a
no-op). --mode tiles: fold each micro-batch into the standing tile table
(streaming continuous aggregate; see streaming/ingest.py). Prints one JSON
summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", choices=("ingest", "tiles"), default="ingest")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from bufr2geojson_spark.streaming.ingest import (
        run_ingest_once,
        run_tile_maintenance_once,
    )

    spark = (
        SparkSession.builder.appName(f"b2g-stream-{args.mode}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    try:
        if args.mode == "ingest":
            n = run_ingest_once(spark, args.input, args.output,
                                args.checkpoint)
        else:
            n = run_tile_maintenance_once(spark, args.input, args.output,
                                          args.checkpoint)
        print(json.dumps({"mode": args.mode, "batches": n}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
