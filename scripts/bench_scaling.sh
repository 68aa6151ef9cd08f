#!/usr/bin/env bash
# Scaling-efficiency evidence for the north rule: the same pipeline job via
# spark-submit --py-files at two parallelism levels (local[8] ~ N executors,
# local[32] ~ 4N executors) on the same synthesized input.
#
#   efficiency = (throughput_32 / throughput_8) / 4
#
# Results are reported in BENCH/BASELINE.md, and the pair is written to
# scaling_controlled.json at the repo root so bench.py can attach the latest
# controlled measurement to its per-round scaling block. Run on an
# otherwise-idle box — concurrent load invalidates the comparison.
#
# Usage: scripts/bench_scaling.sh [n_docs] [checkpoints]
set -euo pipefail
cd "$(dirname "$0")/.."

N_DOCS="${1:-240000}"
CKPT="${2:-J,A,W}"
WORK="${SCALE_WORK:-/dev/shm/b2g_scale}"
OUT="${SCALE_OUT:-scaling_controlled.json}"

rm -f bufr2geojson_spark.zip
zip -qr bufr2geojson_spark.zip bufr2geojson_spark

LINES=""
for C in ${SCALE_CORES:-2 8 32}; do
  rm -rf "$WORK/n$C"
  LINE=$(spark-submit --master "local[$C]" --driver-memory 40g \
    --conf spark.sql.shuffle.partitions=$((C * 2)) \
    --conf spark.default.parallelism=$C \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.ui.enabled=false \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.sql.parquet.compression.codec=zstd \
    --conf spark.local.dir="$WORK/spark-local-$C" \
    --py-files bufr2geojson_spark.zip jobs/pipeline.py \
    --synth "$N_DOCS" --work "$WORK/n$C" --run-id "scale$C" \
    --partitions $((C * 4)) --checkpoints "$CKPT" 2>/dev/null | tail -1)
  echo "$LINE"
  LINES="$LINES$C $LINE"$'\n'
done

# summarize the pair(s) into $OUT for bench.py's scaling block (legs travel
# via env — `python3 -` reads its PROGRAM from stdin, so piping them there
# would be swallowed by the heredoc). The summarizer ACCUMULATES: it merges
# this run's legs with an existing $OUT at the SAME n_docs, keeping the
# per-width try lists (tries_rows_per_sec) and best-of (round-4 advice —
# the checked-in artifact must be reproducible by this documented command,
# and a rerun must not silently drop the tries provenance). A different
# n_docs starts a fresh record — ratios across corpus sizes don't merge.
LINES="$LINES" N_DOCS="$N_DOCS" OUT="$OUT" python3 - <<'EOF'
import json, os, datetime

rows = {}
for line in os.environ["LINES"].splitlines():
    line = line.strip()
    if not line:
        continue
    cores, payload = line.split(" ", 1)
    rows[cores] = json.loads(payload)
n_docs = int(os.environ["N_DOCS"])
out = os.environ["OUT"]

tries: dict[str, list[float]] = {}
try:
    with open(out) as f:
        prev = json.load(f)
    if prev.get("n_docs") == n_docs:
        tries = {str(c): list(v)
                 for c, v in (prev.get("tries_rows_per_sec") or {}).items()}
        # older records carried only the best-of pair; seed tries from it
        for c, v in (prev.get("rows_per_sec") or {}).items():
            tries.setdefault(str(c), [])
            if v not in tries[str(c)]:
                tries[str(c)].append(v)
except (OSError, ValueError):
    pass
for c, r in rows.items():
    tries.setdefault(c, []).append(r["rows_per_sec"])

th = {c: max(v) for c, v in tries.items() if v}
rec = {
    "source": "scripts/bench_scaling.sh spark-submit --py-files pair, "
              "full pipeline at synth docs, fresh JVM + tmpfs work/shuffle "
              "dirs per leg; best-of per width across accumulated tries",
    "measured_utc": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "n_docs": n_docs,
    "rows_per_sec": th,
    "tries_rows_per_sec": tries,
}
if "2" in th and "8" in th and th["2"]:
    rec["efficiency_2_to_8"] = round(th["8"] / th["2"] / 4.0, 3)
if "8" in th and "32" in th and th["8"]:
    rec["efficiency_8_to_32"] = round(th["32"] / th["8"] / 4.0, 3)
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec))
EOF
