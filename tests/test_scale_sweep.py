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
