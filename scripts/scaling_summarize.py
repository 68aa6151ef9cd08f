"""Session-grouped summarizer for scripts/bench_scaling.sh (schema 2).

Accumulates spark-submit scaling legs into scaling_controlled.json. A
session groups legs from ONE host window (<3 h apart) AND one engine
version; the north-rule criterion is the best SAME-SESSION 2->8 pair —
merging best-of per width across sessions would pair legs from
anti-correlated host windows and fabricate a pair no single window ran
(measured: this box flips fast/slow PER RESOURCE across windows,
BENCH.md §5j). The cross-session merged best-of is still reported for
transparency, and every try of every session is retained (round-4
advice: the checked-in artifact must be reproducible by the documented
command, and a rerun must not silently drop provenance).

Invoked by bench_scaling.sh with legs in $LINES (one "<cores> <json>"
per line — a list, not a dict keyed by cores, so repeated widths within
one invocation, e.g. SCALE_CORES="2 8 2 8", keep every try). Pure logic
lives in summarize() so tests can drive it with a fixed clock.
"""

import datetime
import json
import os
import sys

SESSION_WINDOW_H = 3.0


def _age_h(stamp: str, now: datetime.datetime) -> float:
    try:
        t = datetime.datetime.strptime(
            stamp, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=datetime.timezone.utc)
        return (now - t).total_seconds() / 3600.0
    except ValueError:
        return 1e9


def _pair(tries: dict) -> dict:
    th = {c: max(v) for c, v in tries.items() if v}
    p: dict = {"rows_per_sec": th}
    if "2" in th and "8" in th and th["2"]:
        p["efficiency_2_to_8"] = round(th["8"] / th["2"] / 4.0, 3)
    if "8" in th and "32" in th and th["8"]:
        p["efficiency_8_to_32"] = round(th["32"] / th["8"] / 4.0, 3)
    return p


def summarize(lines: str, n_docs: int, prev: dict | None,
              now: datetime.datetime, engine_commit: str) -> dict:
    """Fold this invocation's legs into the previous artifact (if any at
    the same n_docs) and return the new schema-2 record."""
    rows = []
    for line in lines.splitlines():
        line = line.strip()
        if not line:
            continue
        cores, payload = line.split(" ", 1)
        rows.append((cores, json.loads(payload)))
    now_s = now.strftime("%Y-%m-%dT%H:%M:%SZ")

    sessions: list = []
    notes = None
    if prev and prev.get("n_docs") == n_docs:
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

    # a session groups legs from ONE host window AND one engine version:
    # legs measured on a different commit must not pair with older legs
    # inside a single "session" record (the criterion is the best
    # same-session pair, so a cross-engine merge could fabricate a pair
    # no single engine ran)
    if sessions and _age_h(sessions[-1]["measured_utc"], now) < SESSION_WINDOW_H \
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
    return rec


def main() -> None:
    out = os.environ["OUT"]
    prev = None
    try:
        with open(out) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        pass
    rec = summarize(
        lines=os.environ["LINES"],
        n_docs=int(os.environ["N_DOCS"]),
        prev=prev,
        now=datetime.datetime.now(datetime.timezone.utc),
        engine_commit=os.environ.get("ENGINE_COMMIT", "unknown"),
    )
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
