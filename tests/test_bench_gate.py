"""Unit tests for bench.py's regression gate (no Spark session)."""

from __future__ import annotations

import json

import bench


def test_no_baseline_no_flags():
    assert bench.compute_regressions({"q1": 9.9}, None) == {}


def test_flags_only_beyond_threshold_plus_spread():
    prev = {
        "queries": {"q1": 1.0, "q2": 1.0, "q3": 1.0},
        "queries_warm_spread": {"q1": 0.0, "q2": 0.3, "q3": 0.0},
    }
    cur = {"q1": 1.6, "q2": 1.7, "q3": 1.4, "q_new": 50.0}
    got = bench.compute_regressions(cur, prev)
    # q1: 1.6 > 1.5*1.0 + 0       → flagged
    # q2: 1.7 <= 1.5*1.0 + 0.3    → spread absorbs it
    # q3: 1.4 <= 1.5              → inside the factor
    # q_new: no baseline          → never flagged
    assert set(got) == {"q1"}
    assert got["q1"] == {"prev": 1.0, "cur": 1.6, "prev_spread": 0.0}


def test_last_history_record_picks_latest_matching_sf(tmp_path):
    p = tmp_path / "hist.jsonl"
    rows = [
        {"sf": 0.1, "queries": {"q1": 1.0}, "queries_warm_spread": {}},
        {"sf": 1.0, "queries": {"q1": 9.0}, "queries_warm_spread": {}},
        {"sf": 0.1, "queries": {"q1": 2.0}, "queries_warm_spread": {}},
        "not json at all",
    ]
    p.write_text(
        "\n".join(r if isinstance(r, str) else json.dumps(r) for r in rows) + "\n"
    )
    rec = bench.last_history_record(str(p), 0.1)
    assert rec["queries"]["q1"] == 2.0  # latest 0.1 row, 1.0 row ignored
    assert bench.last_history_record(str(tmp_path / "missing"), 0.1) is None
