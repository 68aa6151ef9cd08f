"""Regression guard for the bench artifact's FINAL stdout line.

Round 4's BENCH_r04 recorded ``"parsed": null`` because the single final
JSON line outgrew the driver's 2000-char tail capture (the r3 line was
1,538 chars and parsed; r4's was truncated mid-record once the controlled
scaling pair with its prose notes was embedded). bench.py now prints a
compact machine record as the final line (``compact_record``); these tests
pin that the record stays under the cap for the real 43-query table, that
it still parses and carries every field the driver grades, and that the
fallback rounding path engages rather than ever exceeding the cap.
"""
import json

import bench


# The real headline table shape: every query bench.py times at sf0.1,
# with realistically long names and 3-dp walls.
_QUERY_NAMES = bench.headline_queries() + ["engine_pipeline"]


def _qtimes(names):
    return {n: 3.0 + (i % 17) * 0.123 for i, n in enumerate(names)}


def _pipe():
    return {
        "docs": 240000,
        "features": 1921480,
        "tiles": 357844,
        "wall_sec": 23.431,
        "walls_sec": [60.321, 25.002, 23.431],
        "features_tiles_per_sec": 97278.9,
    }


def _scaling(available=True):
    crit = {
        "available": available,
        "pass": True,
        "efficiency_2_to_8": 0.806,
        "rows_per_sec": {"2": 11488.4, "8": 37022.5},
        "n_docs": 960000,
        # prose fields that blew the r4 line — must NOT reach the record
        "notes": "x" * 1200,
        "source": "y" * 300,
        "sessions": [{"tries_rows_per_sec": {"8": [1.0] * 12}}] * 3,
    }
    return {
        "criterion": crit,
        "smoke": {
            "n_docs": 120000,
            "throughput": {"2": 20620.7, "8": 80907.9, "32": 60258.6},
            "tries": {"2": [20620.7, 18505.2], "8": [71722.3, 80907.9]},
            "efficiency_2_to_8": 0.981,
            "efficiency_8_to_32": 0.186,
        },
    }


def test_final_line_under_driver_cap():
    line = bench.compact_record(_qtimes(_QUERY_NAMES), _pipe(), _scaling(), 0.1)
    assert len(line) < 2000, len(line)
    rec = json.loads(line)
    assert rec["metric"] == "headline_total"
    assert rec["scaling"]["criterion"]["pass"] is True
    assert rec["scaling"]["criterion"]["efficiency_2_to_8"] == 0.806
    assert rec["scaling"]["smoke"]["efficiency_2_to_8"] == 0.981
    assert set(rec["queries"]) == set(_QUERY_NAMES)
    assert rec["features_tiles_per_sec"] == 97278.9
    # the prose/provenance fields stay on the earlier FULL line only
    assert "notes" not in json.dumps(rec)
    assert "tries" not in json.dumps(rec["scaling"]["criterion"])


def test_fallback_rounding_engages_before_cap():
    # a future 110-query table whose 2-dp encoding (2,055 chars) would
    # blow the driver's 2000-char tail capture: the guard must re-round
    # to 1 dp, landing the emitted line back under the cap
    names = [("q" + str(i)).ljust(7, "x") for i in range(110)]
    qtimes = {n: 10.111 + (i % 80) * 0.111 for i, n in enumerate(names)}
    line = bench.compact_record(qtimes, _pipe(), _scaling(), 0.1)
    assert len(line) < 2000, len(line)
    rec = json.loads(line)
    assert len(rec["queries"]) == 110
    # 1-dp rounding was applied (guard path, not the default 2-dp path)
    assert all(round(v, 1) == v for v in rec["queries"].values())


def test_missing_criterion_is_flagged_not_fabricated():
    # round-4 advice: no hardcoded fallback pair — when the controlled
    # artifact is absent, the record says so explicitly
    line = bench.compact_record(
        _qtimes(_QUERY_NAMES), _pipe(), {"criterion": {"available": False}, "smoke": {}}, 0.1
    )
    rec = json.loads(line)
    assert rec["scaling"]["criterion"] == {"available": False}
    assert "efficiency_2_to_8" not in rec["scaling"]["criterion"]
