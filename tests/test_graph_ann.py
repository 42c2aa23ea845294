"""Graph ANN (HNSW-lite) behavior pins: recall parity at matched
candidate budget, bounded visited sets, graph well-formedness, and
determinism under repartitioned input (the properties the bit-exact
oracle can't express as a single relation)."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.operators.graph_ann import (
    cell_medoids,
    graph_beam_topk,
    graph_entry_points,
    knn_graph_edges,
)


@pytest.fixture(scope="module")
def specs():
    from rag_application_with_vectordb_spark.plans.registry import load_all

    return load_all()


@pytest.fixture(scope="module")
def clustered(spark):
    from rag_application_with_vectordb_spark.plans.ann_queries import (
        _cl_trained_centroids,
        _clustered_corpus_df,
    )

    corpus = _clustered_corpus_df(spark)
    cents = spark.createDataFrame(
        _cl_trained_centroids(spark, corpus), "centroid_id int, cvec array<double>"
    )
    edges = knn_graph_edges(corpus, cents, m=6).persist()
    medoids = cell_medoids(corpus, cents).persist()
    edges.count(), medoids.count()
    queries = corpus.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return corpus, cents, edges, medoids, queries


def test_clustered_recall_parity_at_matched_budget(spark, specs):
    rows = specs["ann_graph_clustered_recall"].fn(spark, "/root/testdata/sf0.001").collect()
    g = statistics.mean(r["recall_graph"] for r in rows)
    i = statistics.mean(r["recall_ivf"] for r in rows)
    # graph scores <=66 candidates/query; IVF scans its whole cell (up
    # to 162). Parity within 0.05 at the matched budget is the pin.
    assert g >= 0.85, (g, i)
    assert g >= i - 0.05, (g, i)


def test_visited_budget_is_bounded(clustered):
    corpus, cents, edges, medoids, queries = clustered
    entries = graph_entry_points(queries, cents, medoids, n_entries=2)
    # k larger than any possible visited set -> returns every visited
    # node, so per-query row count IS the scored-candidate budget
    allv = graph_beam_topk(corpus, edges, entries, queries, k=10_000, beam=16, hops=4)
    per_q = {r["query_id"]: r["n"] for r in allv.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert len(per_q) == 10
    assert all(2 <= n <= 2 + 16 * 4 for n in per_q.values()), per_q


def test_edges_symmetric_bounded_no_self_loops(clustered):
    corpus, cents, edges, medoids, queries = clustered
    e = {(r["src"], r["dst"]) for r in edges.collect()}
    assert e and all(s != d for s, d in e)
    assert all((d, s) in e for s, d in e)  # symmetrized
    # every node keeps its own m=6 nearest out-edges (degree >= m after
    # symmetrization; hubs gain unbounded IN-degree — expected in kNN
    # graphs and what makes them navigable), and every node appears
    from collections import Counter

    deg = Counter(s for s, _ in e)
    assert len(deg) == corpus.count()
    assert min(deg.values()) >= 6


def test_beam_deterministic_under_repartition(clustered):
    corpus, cents, edges, medoids, queries = clustered
    entries = graph_entry_points(queries, cents, medoids, n_entries=2)

    def run(c, ed):
        return sorted(
            (r["query_id"], r["vec_id"], r["similarity"])
            for r in graph_beam_topk(c, ed, entries, queries, k=5, beam=16, hops=4).collect()
        )

    base = run(corpus, edges)
    shuffled = run(
        corpus.repartition(7, "vec_id"),
        edges.repartition(5).sortWithinPartitions(F.desc("dst")),
    )
    assert base == shuffled
    assert len(base) == 50


def _pair_join_edges(corpus, centroids, m=6, corpus_id="vec_id", corpus_vec="embedding"):
    """The pre-r13 pair-join + window edge builder (HOF cosine) — the
    bitwise reference for the applyInArrow per-cell scorer."""
    from pyspark.sql import Window

    from rag_application_with_vectordb_spark.functions.vector import (
        as_double,
        cosine_sim_prenormed,
        l2_norm,
    )
    from rag_application_with_vectordb_spark.operators.ann import ivf_assign

    assigned = ivf_assign(corpus, centroids, corpus_id, corpus_vec)
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
    pairs = a.join(b, "centroid_id").filter(F.col("src") != F.col("dst"))
    scored = pairs.select(
        "src",
        "dst",
        cosine_sim_prenormed(
            F.col("__sv"), F.col("__sn"), F.col("__dv"), F.col("__dn")
        ).alias("__sim"),
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


@pytest.mark.parametrize("n_cells", [14, 80])
def test_knn_graph_edges_matches_pair_join(spark, n_cells):
    """r13: the per-cell applyInArrow scorer replays the pair-join +
    window form's edge set exactly — both with the literal-path
    assignment (14 cells) and the mapInArrow assignment (80 > 64)."""
    from rag_application_with_vectordb_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    got = {(r["src"], r["dst"]) for r in knn_graph_edges(emb, cents, m=6, dim=64).collect()}
    ref = {(r["src"], r["dst"]) for r in _pair_join_edges(emb, cents, m=6).collect()}
    assert got == ref and len(got) > 0
