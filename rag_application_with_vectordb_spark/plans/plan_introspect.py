"""Physical-plan introspection helpers backing the catalog plan lints.

The r8/r9 audits proved two plan-shape bug classes are invisible to
every value gate (a query can be hash-green at every tested SF and
still be quadratic or N-fold-rescanning at 100 TB):

1. CartesianProduct hiding behind the auto-broadcast fallback at
   fixture scale (geo_radius_pairs, knn_analogy).
2. N-fold fact re-scans from CTE re-inlining / repeated subtree
   derivation (graph_triangles: 70 lineitem scans; curation_funnel: 24).

``tests/test_registry_contract.py`` builds every registered plan and
gates both classes with these helpers; ``tools/plan_audit.py`` is the
ad-hoc audit harness over the same code.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame

#: the tables whose re-scan cost dominates at 100 TB
FACT_TABLES = ("lineitem", "events", "documents")


def effective_fact_scans(df: DataFrame, facts: tuple[str, ...] = FACT_TABLES) -> dict[str, int]:
    """EFFECTIVE parquet scans per fact table in ``df``'s physical plan.

    Tree-walk counting each scan node once, descending into each
    DISTINCT cached (InMemoryRelation) subplan exactly once — a
    relation five branches read from cache fills with ONE scan, and a
    raw text count of the explain output would report five.
    ``localCheckpoint``'ed subtrees appear as RDD scans and so count
    zero here (their single build ran at checkpoint time).
    """
    counts: Counter = Counter()
    seen_caches: set[int] = set()

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if cls in ("FileSourceScanExec", "BatchScanExec"):
            s = node.toString()
            for t in facts:
                if f"{t}.parquet" in s:
                    counts[t] += 1
            return
        if cls == "InMemoryTableScanExec":
            rel = node.relation()
            key = rel.cachedPlan().semanticHash()
            if key not in seen_caches:
                seen_caches.add(key)
                walk(rel.cachedPlan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        try:  # scalar/IN subqueries carry their own plans
            sq = node.subqueries()
            for i in range(sq.size()):
                walk(sq.apply(i))
        except Exception:  # noqa: BLE001 — not every node exposes subqueries
            pass

    walk(df._jdf.queryExecution().executedPlan())
    return dict(counts)
