#!/usr/bin/env bash
# Scaling-efficiency evidence for the north rule: the same pipeline job via
# spark-submit --py-files at two parallelism levels (local[8] ~ N executors,
# local[32] ~ 4N executors) on the same synthesized input.
#
#   efficiency = (throughput_32 / throughput_8) / 4
#
# Results are reported in BENCH/BASELINE.md. Run on an otherwise-idle box —
# concurrent load invalidates the comparison.
#
# Usage: scripts/bench_scaling.sh [n_docs] [checkpoints]
set -euo pipefail
cd "$(dirname "$0")/.."

N_DOCS="${1:-240000}"
CKPT="${2:-J,A,W}"
WORK="${SCALE_WORK:-/dev/shm/b2g_scale}"

rm -f bufr2geojson_spark.zip
zip -qr bufr2geojson_spark.zip bufr2geojson_spark

for C in ${SCALE_CORES:-2 8 32}; do
  rm -rf "$WORK/n$C"
  spark-submit --master "local[$C]" --driver-memory 40g \
    --conf spark.sql.shuffle.partitions=$((C * 2)) \
    --conf spark.default.parallelism=$C \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.ui.enabled=false \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.sql.parquet.compression.codec=zstd \
    --conf spark.local.dir="$WORK/spark-local-$C" \
    --py-files bufr2geojson_spark.zip jobs/pipeline.py \
    --synth "$N_DOCS" --work "$WORK/n$C" --run-id "scale$C" \
    --partitions $((C * 4)) --checkpoints "$CKPT" 2>/dev/null | tail -1
done
