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


def test_spread_norms_median_per_query(tmp_path):
    p = tmp_path / "hist.jsonl"
    rows = [
        {"sf": 0.1, "queries": {}, "queries_warm_spread": {"q1": 0.10, "q2": 0.02}},
        {"sf": 0.1, "queries": {}, "queries_warm_spread": {"q1": 0.30}},
        {"sf": 0.1, "queries": {}, "queries_warm_spread": {"q1": 0.12}},
        {"sf": 1.0, "queries": {}, "queries_warm_spread": {"q1": 9.99}},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    norms = bench.spread_norms(str(p), 0.1)
    # median of [0.10, 0.12, 0.30]; the sf=1.0 record is excluded
    assert norms == {"q1": 0.12, "q2": 0.02}
    assert bench.spread_norms(str(tmp_path / "missing.jsonl"), 0.1) == {}


def test_detect_contention_suite_wide_not_single_query():
    norms = {f"q{i}": 0.1 for i in range(12)}
    quiet = {f"q{i}": 0.12 for i in range(12)}
    ok, noisy = bench.detect_contention(quiet, norms)
    assert not ok and not noisy
    # ONE noisy query = possible plan problem, not machine contention
    one = dict(quiet, q0=5.0)
    ok, noisy = bench.detect_contention(one, norms)
    assert not ok and set(noisy) == {"q0"}
    # a third of the suite noisy → contended (r10's artifact showed
    # spreads ~10x family norms across 19 queries)
    many = dict(quiet, **{f"q{i}": 1.5 for i in range(4)})
    ok, noisy = bench.detect_contention(many, norms)
    assert ok and len(noisy) == 4


def test_detect_contention_floor_absorbs_submillisecond_norms():
    # 3x a 1 ms norm is 3 ms — scheduler jitter alone exceeds that; the
    # 0.05 s floor keeps sub-100 ms queries from crying wolf
    ok, noisy = bench.detect_contention({"q1": 0.04}, {"q1": 0.001})
    assert not ok and not noisy


def test_detect_contention_no_history_never_contended():
    ok, noisy = bench.detect_contention({"q1": 99.0}, {})
    assert not ok and not noisy


def test_history_anchor_best_quiet_record(tmp_path):
    p = tmp_path / "hist.jsonl"
    rows = [
        {"sf": 0.1, "value": 20.0, "queries": {"q1": 2.0, "q2": 3.0}},
        # contended records measure the machine — excluded from the anchor
        {"sf": 0.1, "value": 10.0, "queries": {"q1": 1.0}, "regime": "contended"},
        {"sf": 0.1, "value": 17.0, "queries": {"q1": 1.5, "q2": 4.0}, "cpu_ref": 0.2},
        {"sf": 1.0, "value": 5.0, "queries": {"q1": 0.1}},  # other sf ignored
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    a = bench.history_anchor(str(p), 0.1)
    assert a["best_total"] == 17.0  # the contended 10.0 does not win
    assert a["best_cpu_ref"] == 0.2
    assert a["n_records"] == 2
    # per-query best spans all quiet records, not just the best-total one
    assert a["best_queries"] == {"q1": 1.5, "q2": 3.0}
    assert bench.history_anchor(str(tmp_path / "missing.jsonl"), 0.1) is None


def test_history_anchor_rolling_window(tmp_path):
    p = tmp_path / "hist.jsonl"
    rows = [{"sf": 0.1, "value": 1.0, "queries": {"q": 1.0}}] + [
        {"sf": 0.1, "value": 30.0 + i, "queries": {"q": 30.0}} for i in range(12)
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    a = bench.history_anchor(str(p), 0.1, n=12)
    # the ancient 1.0s record fell out of the 12-record window — the
    # anchor tracks the recent best, not the all-time best (a fixture
    # or catalog change legitimately moves the attainable floor)
    assert a["best_total"] == 30.0


def test_audit_sf1_heavy_rotation_never_proven_first(tmp_path, monkeypatch):
    import tools.audit_sf1 as audit

    monkeypatch.setattr(audit, "LEDGER", str(tmp_path / "ledger.json"))
    heavy = {"b_old": None, "a_never": None, "c_oldest": None, "d_new": None}
    (tmp_path / "ledger.json").write_text(
        json.dumps({"b_old": 9, "c_oldest": 8, "d_new": 11})
    )
    # never-proven first, then oldest round, alphabetical tiebreak
    assert audit.pick_heavy(heavy, 3) == ["a_never", "c_oldest", "b_old"]
