"""Two-star connected components (operators/cc.py): correctness on
adversarial shapes and the O(log n) round bound that motivates it —
a 100-node chain (diameter 99) must converge within the 12-round cap,
which label propagation could never do."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.operators.cc import twostar_components


def _run(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "doc_a long, doc_b long"
    )
    if not edge_pairs:
        pairs = pairs.filter(F.col("doc_a").isNotNull())
    out = twostar_components(nodes, pairs).collect()
    comp = {r.doc_id: r.component_id for r in out}
    sizes = {r.doc_id: r.component_size for r in out}
    canon = {r.doc_id for r in out if r.is_canonical}
    return comp, sizes, canon


def test_deep_chain_converges_in_log_rounds(spark):
    # diameter-99 path: propagation needs ~99 rounds; two-star's 12-round
    # cap suffices (log2(100) ≈ 7 alternations) or the operator raises
    n = 100
    comp, sizes, canon = _run(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    assert set(comp.values()) == {0}
    assert all(s == n for s in sizes.values())
    assert canon == {0}


def test_mixed_shapes(spark):
    # two components (star + triangle), plus isolated nodes
    edges = [(10, 11), (10, 12), (10, 13), (20, 21), (21, 22), (22, 20)]
    comp, sizes, canon = _run(spark, [10, 11, 12, 13, 20, 21, 22, 30, 31], edges)
    assert {comp[n] for n in (10, 11, 12, 13)} == {10}
    assert {comp[n] for n in (20, 21, 22)} == {20}
    assert comp[30] == 30 and comp[31] == 31
    assert sizes[10] == 4 and sizes[20] == 3 and sizes[30] == 1
    assert canon == {10, 20, 30, 31}


def test_matches_label_propagation_on_random_graph(spark):
    # deterministic pseudo-random graph: same components as the shipped
    # min-label propagation operator
    import random

    rng = random.Random(42)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    comp, _, _ = _run(spark, range(n), edges)

    from rag_application_with_vectordb_spark.operators.dedup import duplicate_components

    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = {
        r.doc_id: r.component_id for r in duplicate_components(nodes, pairs).collect()
    }
    assert comp == want
