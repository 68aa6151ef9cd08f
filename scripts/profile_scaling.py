"""Per-phase scaling profiler: times each pipeline phase in isolation from a
pre-materialized input, so phase-level scaling efficiency (N vs 4N cores) can
be attributed. Usage:

    spark-submit --master local[C] --py-files bufr2geojson_spark.zip \
        scripts/profile_scaling.py --docs <parquet> [--synth N]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--synth", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("profile-scaling").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from bufr2geojson_spark.functions.cells import with_cells
    from bufr2geojson_spark.operators.decode import decode_documents
    from bufr2geojson_spark.operators.spatial import assign_region, knn_join
    from bufr2geojson_spark.operators.tiles import (
        range_partition_by_cell,
        tile_aggregate,
    )
    from bufr2geojson_spark.sources.synth import (
        default_n_stations,
        synth_documents,
        synth_region_polygons,
        synth_stations,
    )

    timings: dict[str, float] = {}

    def phase(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 2)
        return out

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    if args.synth:
        phase("synth", lambda: noop(
            synth_documents(spark, args.synth, partitions=cores * 2)))

    docs = spark.read.parquet(args.docs)
    n_docs = docs.count()
    stations = synth_stations(spark, default_n_stations(n_docs))
    polygons = synth_region_polygons(spark)

    phase("read_only", lambda: noop(docs))
    phase("decode", lambda: noop(decode_documents(docs)))

    feats = decode_documents(docs).filter("error is null")
    phase("decode_cells", lambda: noop(with_cells(feats)))

    fc = spark.read.parquet(args.docs)  # re-plan to avoid cache effects
    feats2 = with_cells(decode_documents(fc).filter("error is null"))
    phase("decode_cells_pip", lambda: noop(assign_region(feats2, polygons)))
    feats3 = with_cells(
        decode_documents(spark.read.parquet(args.docs)).filter("error is null")
    )
    phase("decode_cells_knn", lambda: noop(
        knn_join(feats3, stations, k=1, grid_deg=2.0)))
    feats4 = with_cells(
        decode_documents(spark.read.parquet(args.docs)).filter("error is null")
    )
    phase("decode_cells_agg", lambda: noop(
        tile_aggregate(feats4, salt_buckets=16, hot_threshold=200)))
    feats5 = with_cells(
        decode_documents(spark.read.parquet(args.docs)).filter("error is null")
    )
    phase("decode_cells_write", lambda: range_partition_by_cell(
        feats5, cores, "cell_s2", "cell_prefix"
    ).write.mode("overwrite").parquet(f"/dev/shm/prof_out_{cores}"))

    print(json.dumps({"cores": cores, "n_docs": n_docs, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
