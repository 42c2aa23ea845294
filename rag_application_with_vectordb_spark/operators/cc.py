"""Connected components via alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014) — the O(log n)-round CC algorithm for graphs whose
components are too deep for per-round label propagation.

The engine already ships min-label propagation
(``operators/dedup.py: duplicate_components``), whose round count is
the component DIAMETER — fine for near-dup clusters (shallow), fatal
for chain-shaped graphs at 100 TB. Two-star instead contracts toward
each component's minimum in O(log n) alternations:

- **large-star(u)**: connect every strictly-larger neighbor of ``u``
  to ``m = min(N(u) ∪ {u})``.
- **small-star(u)**: connect every smaller-or-equal neighbor (and
  ``u``) to that minimum.

Each step is one groupBy-min plus one equi-join on the node key — no
global structure, skew bounded by max degree (the star centers DO
concentrate; at extreme scale the standard mitigation is hash-salting
the high-degree centers' aggregation, the ``skew_salted_user_spend``
pattern). The driver loop only checks a convergence COUNT per round
(the edge relation itself never reaches the driver), and
``localCheckpoint`` truncates the per-round lineage exactly like the
trained-quantizer loops in ``operators/kmeans.py``.

On convergence the edge set is a union of min-rooted stars, so the
root IS the component minimum — the same canonical id min-label
propagation and the DuckDB recursive-closure oracle produce, which is
what makes the two algorithms hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["twostar_components"]


def _large_star(e: DataFrame) -> DataFrame:
    """e: DIRECTED both-ways edge relation (u, v), u != v."""
    m = (
        e.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    )
    return (
        e.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """e: edges (a, b) with a > b (large-star output). Returns the same
    orientation."""
    m = (
        e.groupBy("a")
        .agg(F.min("b").alias("mn"))
        .select(F.col("a").alias("u"), F.col("mn").alias("m"))
    )
    # connect every smaller neighbor AND u itself to the minimum
    nbrs = e.select(F.col("a").alias("u"), F.col("b").alias("v"))
    self_rows = m.select("u", F.col("u").alias("v"))
    return (
        nbrs.unionByName(self_rows)
        .join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def twostar_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    node_id: str = "doc_id",
    max_rounds: int = 12,
) -> DataFrame:
    """Component assignment ``(doc_id, component_id, component_size,
    is_canonical)`` — the exact output contract of
    ``duplicate_components``, computed by two-star contraction."""
    e = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        e_new = _small_star(_large_star(sym)).localCheckpoint()
        changed = e_new.exceptAll(e).limit(1).count() + e.exceptAll(e_new).limit(1).count()
        e = e_new
        if changed == 0:
            break
    else:
        raise RuntimeError(f"two-star CC did not converge in {max_rounds} rounds")
    # converged: e is a union of min-rooted stars (a -> component min b)
    members = e.select(F.col("a").alias(node_id), F.col("b").alias("component_id"))
    roots = e.select(F.col("b").alias(node_id), F.col("b").alias("component_id")).distinct()
    isolated = (
        nodes.select(node_id)
        .join(members.unionByName(roots), node_id, "left_anti")
        .select(node_id, F.col(node_id).alias("component_id"))
    )
    comp = members.unionByName(roots).unionByName(isolated)
    sizes = comp.groupBy("component_id").agg(F.count("*").cast("bigint").alias("component_size"))
    return comp.join(sizes, "component_id").select(
        node_id,
        F.col("component_id").cast("bigint").alias("component_id"),
        "component_size",
        (F.col(node_id) == F.col("component_id")).cast("bigint").alias("is_canonical"),
    )
