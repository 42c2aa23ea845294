"""Graph-based ANN (HNSW-lite): a deterministic kNN neighbor graph +
fixed-depth beam search, composed entirely from DataFrame operators.

This fills the one mainstream ANN family the engine lacked (NEXT.md /
VERDICT r6 gap #3): IVF/PQ/LSH/sign-bit partition or quantize the
space; graph methods instead walk a neighbor graph from an entry point
toward the query. Full HNSW's search loop is data-dependent ("expand
until no closer node"), which is driver-side control flow; the
established distributed re-expression — and what keeps this DETERMINISTIC
and oracle-checkable — is a FIXED-DEPTH beam search: ``hops`` rounds of
(frontier ⋈ edges → score → keep best ``beam`` new nodes per query).
Fixed depth makes the whole search ONE declarative plan (the unrolled-
iteration pattern proven by ``graph_pagerank``), at the cost of HNSW's
adaptive termination — recall is then governed by (beam, hops), which
the clustered-recall monitor measures.

Scale design (100 TB posture):
- Graph BUILD is cluster-bounded, never all-pairs: candidate pairs
  come from a shared IVF cell (the SemDeDup blocking pattern) —
  per-cell cost is |cell|², bounded by corpus/#cells, and cells build
  independently in parallel. The build is index-construction work: at
  scale it writes a persisted edge table once (like ``ivf_assign``),
  and every search reads it.
- SEARCH per hop is: frontier (queries × ≤beam nodes — tiny) ⋈ edges
  (shuffle-free if edges are bucketed by src) → score only the
  frontier's neighbors. Per-query work is O(hops · beam · M · d),
  INDEPENDENT of corpus size — the property that makes graph ANN
  attractive — vs IVF's O(cell size · d).
- Everything is exact fp64 HOF cosine with total-order tie-breaks
  (similarity DESC, vec_id ASC), so results bit-match the DuckDB
  oracle (``plans.ann_queries.ann_graph_topk``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine_sim, cosine_sim_prenormed, l2_norm
from .ann import ivf_assign

__all__ = ["knn_graph_edges", "cell_medoids", "graph_entry_points", "graph_beam_topk"]


def knn_graph_edges(
    corpus: DataFrame,
    centroids,
    m: int = 6,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Symmetrized cluster-bounded exact kNN graph: per node, its ``m``
    nearest same-cell neighbors (cosine DESC, id ASC), then both edge
    directions, deduped. Output ``(src, dst)``.

    The pair scoring uses prenormed cosine (cast + norm computed ONCE
    per node, not once per pair) — bit-identical values, but the
    per-pair expression is just the dot product, which keeps the
    codegen'd pair stage narrow (the full cosine tree per pair measured
    ~4× slower to JIT and run on the |cell|² stage)."""
    assigned = ivf_assign(corpus, centroids, corpus_id, corpus_vec, dim=dim)
    # both pair sides reference this relation — persist so the
    # nearest-centroid assignment computes once, not once per side
    prep = (
        assigned.select(
            F.col(corpus_id), "centroid_id", as_double(F.col(corpus_vec)).alias("__vd")
        )
        .withColumn("__n", l2_norm(F.col("__vd")))
        .persist()
    )
    a = prep.select(
        F.col(corpus_id).alias("src"), F.col("__vd").alias("__sv"),
        F.col("__n").alias("__sn"), "centroid_id",
    )
    b = prep.select(
        F.col(corpus_id).alias("dst"), F.col("__vd").alias("__dv"),
        F.col("__n").alias("__dn"), "centroid_id",
    )
    # Score each UNORDERED pair once (src < dst) and mirror the slim
    # triple afterwards — the fold-order dot is bitwise-symmetric
    # (element-wise products commute, fold order is the shared zip
    # order), so this halves the dominant cost of the build. Projecting
    # to (src, dst, sim) BEFORE the top-m window also matters: the
    # window shuffles the whole pair relation, and carrying the two
    # dim-length vectors through it is ~40x the bytes of the 24-byte
    # triple (at sf10: ~1e8 pairs — the difference between a few-GB
    # shuffle and a few-hundred-GB one; the wedge the r9 sweep caught).
    pairs = a.join(b, "centroid_id").filter(F.col("src") < F.col("dst"))
    if dim is not None:
        # r12 optimization (guide §4.1): the per-pair HOF dot paid ~250
        # interpreted lambda evals per pair (the |cell|² stage is the
        # whole build cost — 257 s at sf10). Unrolled sequential fold =
        # identical IEEE op order (inputs are already array<double>, so
        # the as_double pass was a value no-op); whole-stage codegen is
        # scope-disabled for the caller's plan (huge-method JIT limit).
        from ..functions.vector import dot_fold_sql
        from ..session import scoped_no_wholestage_codegen

        scoped_no_wholestage_codegen(corpus.sparkSession)
        sim = F.expr(
            f"CASE WHEN __sn = 0.0D OR __dn = 0.0D THEN 0.0D"
            f" ELSE {dot_fold_sql('__sv', '__dv', dim)} / (__sn * __dn) END"
        )
    else:
        sim = cosine_sim_prenormed(
            F.col("__sv"), F.col("__sn"), F.col("__dv"), F.col("__dn")
        )
    half = pairs.select("src", "dst", sim.alias("__sim"))
    # mirror via an inline explode (a Generate in the same stage), NOT a
    # self-union — a union would reference the scoring subtree twice and
    # recompute every dot product, undoing the halving
    scored = half.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("s"), F.col("dst").alias("d")),
                F.struct(F.col("dst").alias("s"), F.col("src").alias("d")),
            )
        ).alias("__e"),
        "__sim",
    ).select(
        F.col("__e.s").alias("src"), F.col("__e.d").alias("dst"), "__sim"
    )
    w = Window.partitionBy("src").orderBy(F.desc("__sim"), F.asc("dst"))
    top = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(m))
        .select("src", "dst")
    )
    return top.union(
        top.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def cell_medoids(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "cvec",
    dim: int | None = None,
) -> DataFrame:
    """Per IVF cell, the member closest to the centroid (cosine DESC,
    id ASC) — the deterministic entry node for searches landing in that
    cell. Output ``(centroid_id, vec_id)``. ``dim`` engages the
    unrolled fixed-dim cosine (r12, value-identical — see
    functions.vector.cosine_sim_sql)."""
    assigned = ivf_assign(corpus, centroids, corpus_id, corpus_vec, dim=dim)
    if dim is not None:
        from ..functions.vector import cosine_sim_sql

        sim = F.expr(cosine_sim_sql(corpus_vec, centroid_vec, dim))
    else:
        sim = cosine_sim(F.col(corpus_vec), F.col(centroid_vec))
    joined = assigned.join(F.broadcast(centroids), centroid_id)
    w = Window.partitionBy(centroid_id).orderBy(F.desc(sim), F.asc(corpus_id))
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(centroid_id, corpus_id)
    )


def graph_entry_points(
    queries: DataFrame,
    centroids: DataFrame,
    medoids: DataFrame,
    query_id: str = "query_id",
    query_vec: str = "qvec",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "cvec",
    n_entries: int = 1,
) -> DataFrame:
    """Each query starts at the medoids of its ``n_entries`` nearest
    cells (the nprobe analog — multiple entries cover queries landing
    near cell boundaries). Output ``(query_id, vec_id)``."""
    w = Window.partitionBy(query_id).orderBy(
        F.desc(cosine_sim(F.col(query_vec), F.col(centroid_vec))), F.asc(centroid_id)
    )
    probe = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(n_entries))
        .select(query_id, centroid_id)
    )
    return (
        probe.join(F.broadcast(medoids), centroid_id)
        .select(query_id, "vec_id")
        .distinct()
    )


def graph_beam_topk(
    corpus: DataFrame,
    edges: DataFrame,
    entries: DataFrame,
    queries: DataFrame,
    k: int = 5,
    beam: int = 8,
    hops: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "qvec",
    persist_levels: bool = True,
) -> DataFrame:
    """Fixed-depth beam search: ``hops`` rounds of expand-score-prune,
    then exact top-``k`` over every node visited. Candidate budget per
    query is ≤ ``1 + beam·hops`` scored nodes — compare IVF nprobe=1's
    whole-cell budget. Output ``(query_id, vec_id, similarity)``.

    ``persist_levels``: each level's visited set (≤ queries × beam rows
    — tiny) is cached; without it, level ``h``'s anti-join re-derives
    every earlier level's subtree and the plan re-evaluates the edge
    relation O(2^hops) times (measured 31 s → 2 s at sf0.1). Caches are
    bounded and per-plan; pass False for a purely declarative tree."""
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"), as_double(F.col(corpus_vec)).alias("__cv")
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    q = queries.select(
        F.col(query_id).alias("query_id"), as_double(F.col(query_vec)).alias("__qv")
    ).withColumn("__qn", l2_norm(F.col("__qv")))

    def score(nodes: DataFrame) -> DataFrame:
        return (
            nodes.join(c, "vec_id")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                "vec_id",
                cosine_sim_prenormed(
                    F.col("__cv"), F.col("__cn"), F.col("__qv"), F.col("__qn")
                ).alias("similarity"),
            )
        )

    visited = score(entries.select("query_id", "vec_id"))
    if persist_levels:
        visited = visited.persist()
    frontier = visited.select("query_id", "vec_id")
    w = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("vec_id"))
    for _ in range(int(hops)):
        nbrs = (
            frontier.join(edges, frontier["vec_id"] == edges["src"])
            .select("query_id", F.col("dst").alias("vec_id"))
            .distinct()
            .join(visited.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_anti")
        )
        new = (
            score(nbrs)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= int(beam))
            .drop("__rn")
        )
        visited = visited.unionByName(new)
        if persist_levels:
            visited = visited.persist()
        frontier = new.select("query_id", "vec_id")
    return (
        visited.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .drop("__rn")
    )
