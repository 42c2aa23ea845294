"""Selection semantics of the standing scale-sweep gate
(tools/scale_sweep.py, VERDICT r9 item 3).

The gate's value is the SELECTION contract: a changed plans module
touches exactly its own queries; a changed engine module touches
exactly the queries whose function (or module import-block) references
it; the rotation third is deterministic in the round number. Pin those
here so a refactor of the tool can't silently shrink sweep coverage.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "scale_sweep", os.path.join(REPO, "tools", "scale_sweep.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _specs():
    sys.path.insert(0, REPO)
    from rag_application_with_vectordb_spark.plans.registry import load_all

    return load_all()


def test_changed_plans_module_touches_exactly_its_queries():
    tool, specs = _tool(), _specs()
    touched = tool._touched_queries(specs, {"plans.dedup_queries"})
    by_mod = {
        n
        for n, s in specs.items()
        if s.fn.__module__.endswith(".plans.dedup_queries")
    }
    assert touched == by_mod
    assert "dedup_minhash_lsh_pairs" in touched
    assert "q1_pricing_summary" not in touched


def test_changed_engine_module_touches_referencing_queries_only():
    tool, specs = _tool(), _specs()
    touched = tool._touched_queries(specs, {"operators.prefix"})
    # the prefix-sum consumers import it function-locally
    assert "parts_pareto_abc" in touched
    assert "inventory_abc_xyz" in touched
    assert "stats_spearman_activity_spend" in touched
    assert "feature_quantile_normalize" in touched
    # per-function granularity: an unrelated query in the SAME module
    # (plans/analytics.py) must NOT be dragged in
    assert "funnel_signup_click_purchase" not in touched
    # ...and changed-set coverage stays a small fraction of the catalog
    assert len(touched) < len(specs) / 4


def test_rotation_third_partitions_catalog():
    specs = _specs()
    names = sorted(specs)
    thirds = [set(names[r % 3 :: 3]) for r in range(3)]
    assert thirds[0] | thirds[1] | thirds[2] == set(names)
    assert not (thirds[0] & thirds[1])
    # round N and round N+3 sweep the same third (deterministic)
    assert set(names[10 % 3 :: 3]) == set(names[13 % 3 :: 3])


def test_expected_refusals_are_registered_queries():
    tool, specs = _tool(), _specs()
    assert tool.EXPECTED_SCALE_REFUSALS <= set(specs)


def _oracle_tool():
    spec = importlib.util.spec_from_file_location(
        "check_oracle_mod", os.path.join(REPO, "tools", "check_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_log_retry_and_supersede_semantics(tmp_path):
    """ADVICE r10: the full retry contract — TIMEOUT is a 1-strike
    retryable failure (not resume-done), 2 strikes settle, and a
    re-run green supersedes earlier FAIL rows (last state wins)."""
    tool = _tool()
    log = tmp_path / "sweep.log"
    log.write_text(
        "# header\n"
        "ok    a: 5 rows [1.0s]\n"
        "TIMEOUT  b: exceeded 600s, jobs cancelled\n"
        "FAIL  c: spark error: OOM\n"
        "FAIL  c: spark error: OOM\n"
        "FAIL  d: spark error: dead context\n"
        "rows  d: 12 rows [2.0s]\n"
    )
    sel = {"a", "b", "c", "d", "e"}
    green, failed, fc = tool.parse_log(str(log), sel)
    assert green == {"a", "d"}  # d's green supersedes its FAIL row
    assert failed == {"b", "c"}
    assert fc == {"b": 1, "c": 2, "d": 1}
    pending = tool.pending_queries(sel, green, failed, fc)
    # b (1 strike) gets its fresh-session second chance; c (2 strikes)
    # is settled; e never ran
    assert pending == {"b", "e"}
    # progress heuristic input: a failed->green conversion SHRINKS
    # pending even though len(green)+len(failed) is unchanged
    log.write_text(log.read_text() + "ok    b: 3 rows [1.0s]\n")
    g2, f2, fc2 = tool.parse_log(str(log), sel)
    assert len(g2) + len(f2) == len(green) + len(failed)  # the old heuristic's blind spot
    assert tool.pending_queries(sel, g2, f2, fc2) == {"e"}


def test_check_oracle_resume_excludes_timeouts(tmp_path):
    """ADVICE r10 (medium): check_oracle's resume done-set must not
    contain TIMEOUT rows, or scale_sweep's retry loop passes the name
    as pending forever while check_oracle silently skips it."""
    co = _oracle_tool()
    log = tmp_path / "sweep.log"
    log.write_text(
        "rows  a: 5 rows [1.0s]\n"
        "ok    b: 2 rows [0.5s]\n"
        "TIMEOUT  c: exceeded 600s, jobs cancelled\n"
        "FAIL  d: spark error: boom\n"
        "rows  \n"  # truncated mid-write line must not crash the resume
    )
    assert co.parse_resume_done(str(log)) == {"a", "b"}


def test_check_oracle_exact_name_filter():
    """ADVICE r10 (medium): scale_sweep passes --exact so a pending
    name that is a PREFIX of a settled query can't re-run it."""
    co = _oracle_tool()
    flt = ["dedup_prefix_filter_pairs"]
    # substring mode (default): the settled _keyed twin matches too
    assert co.name_selected("dedup_prefix_filter_pairs_keyed", flt, exact=False)
    # exact mode: only the whole name
    assert not co.name_selected("dedup_prefix_filter_pairs_keyed", flt, exact=True)
    assert co.name_selected("dedup_prefix_filter_pairs", flt, exact=True)
    assert co.name_selected("anything", [], exact=True)  # no filter = all


def test_scale_sweep_passes_exact_flag():
    """The sweep's check_oracle invocation must carry --exact (pin the
    wiring, not just the helper)."""
    src = open(os.path.join(REPO, "tools", "scale_sweep.py")).read()
    assert '"--exact"' in src
