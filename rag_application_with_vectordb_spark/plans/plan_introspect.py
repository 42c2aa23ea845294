"""Physical-plan introspection helpers backing the catalog plan lints.

The r8/r9 audits proved three plan-shape bug classes are invisible to
every value gate (a query can be hash-green at every tested SF and
still be quadratic, N-fold-rescanning, or one-task-bound at 100 TB):

1. CartesianProduct hiding behind the auto-broadcast fallback at
   fixture scale (geo_radius_pairs, knn_analogy).
2. N-fold fact re-scans from CTE re-inlining / repeated subtree
   derivation (graph_triangles: 70 lineitem scans; curation_funnel: 24).
3. SinglePartition funnels — an unbounded fact-derived relation
   shuffled into ONE task (global ``Window.orderBy`` and friends);
   bounded-by-construction shapes are allowlisted with their
   documented bound in the gate.

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


#: physical nodes that bound the row count flowing out of a subtree:
#: limits/top-k are bounded by k; a ZERO-grouping-key aggregate emits
#: one row per input partition (partial) or one row total (final).
#: Grouped aggregates are NOT here — their output cardinality is the
#: group count, which can be fact-scale (group by doc_id).
_LIMIT_NODES = (
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
    "TakeOrderedAndProjectExec",
)
_AGG_NODES = (
    "HashAggregateExec",
    "ObjectHashAggregateExec",
    "SortAggregateExec",
)


def single_partition_fact_exposures(df: DataFrame, facts: tuple[str, ...] = FACT_TABLES) -> int:
    """Count SinglePartition shuffle exchanges fed UNBOUNDED fact rows.

    The third plan-shape bug class (after CartesianProduct and N-fold
    fact re-scans): a global ``Window.orderBy()`` / ``coalesce(1)``-like
    shape funnels every row of a fact-derived relation through ONE task.
    At fixture scale it finishes instantly and every value gate stays
    green; at 100 TB that task is the job.

    An exchange is SAFE (not counted) when every path from a fact scan
    up to it passes a bounding node: a limit/top-k, or a
    zero-grouping-key (scalar) aggregate. Grouped aggregates do NOT
    bound (group count can be fact-scale), so shapes like
    "group by bucket → global window" are flagged and must carry an
    explicit allowlist entry documenting why the group domain is
    bounded (e.g. coarse 2^20 histogram buckets, ≤C centroids).

    Known hole: ``localCheckpoint``'ed subtrees surface as RDD scans
    and read as bounded here — same blind spot as
    ``effective_fact_scans``; the checkpoint call sites are themselves
    reviewed (each checkpoints a bounded relation by contract).
    """

    def is_scalar_agg(node) -> bool:
        try:
            return node.groupingExpressions().size() == 0
        except Exception:  # noqa: BLE001 — not an aggregate node
            return False

    def exposed(node) -> bool:
        """Does this subtree emit row counts proportional to a fact scan?"""
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            return exposed(node.initialPlan())
        if cls in _LIMIT_NODES:
            return False
        if cls in _AGG_NODES and is_scalar_agg(node):
            return False
        if cls in ("FileSourceScanExec", "BatchScanExec"):
            s = node.toString()
            return any(f"{t}.parquet" in s for t in facts)
        if cls == "InMemoryTableScanExec":
            return exposed(node.relation().cachedPlan())
        ch = node.children()
        return any(exposed(ch.apply(i)) for i in range(ch.size()))

    hits = 0
    seen_caches: set[int] = set()

    def walk(node) -> None:
        nonlocal hits
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if cls == "ShuffleExchangeExec" and "SinglePartition" in node.outputPartitioning().toString():
            ch = node.children()
            if any(exposed(ch.apply(i)) for i in range(ch.size())):
                hits += 1
            # still recurse: nested single-partition stages each count
        if cls == "InMemoryTableScanExec":
            key = node.relation().cachedPlan().semanticHash()
            if key not in seen_caches:
                seen_caches.add(key)
                walk(node.relation().cachedPlan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        try:
            sq = node.subqueries()
            for i in range(sq.size()):
                walk(sq.apply(i))
        except Exception:  # noqa: BLE001
            pass

    walk(df._jdf.queryExecution().executedPlan())
    return hits
