"""KNN operator tests — vectorDb.ts:11-24 semantics (SURVEY.md §2.3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.operators.knn import knn, knn_join
from rag_application_with_vectordb_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def numpy_topk(emb_rows, q, k):
    ids = np.array([r[0] for r in emb_rows])
    M = np.array([r[1] for r in emb_rows], dtype=np.float64)
    qv = np.array(q, dtype=np.float64)
    sims = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:k]
    return [int(ids[i]) for i in order]


def test_knn_matches_numpy(spark, emb):
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    q = [float(x) for x in rows[0][1]]
    got = knn(emb, q, k=5).collect()
    assert [r["vec_id"] for r in got] == numpy_topk(rows, q, 5)
    assert got[0]["similarity"] == pytest.approx(1.0, abs=1e-12)
    # descending similarity
    sims = [r["similarity"] for r in got]
    assert sims == sorted(sims, reverse=True)


def test_knn_k_larger_than_corpus(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    assert knn(df, [1.0, 0.0], k=10).count() == 2


def test_knn_k_zero(spark, emb):
    assert knn(emb, [1.0] * 64, k=0).count() == 0


def test_knn_empty_corpus(spark):
    # vectorDb.ts:12-14 — empty store → empty result, no error.
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert knn(empty, [1.0, 2.0], k=5).count() == 0


def test_knn_tie_break_by_id(spark):
    # Duplicate vectors → identical similarity → id-asc order (K3).
    df = spark.createDataFrame(
        [(9, [1.0, 1.0]), (2, [1.0, 1.0]), (5, [1.0, 1.0]), (1, [-1.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    got = [r["vec_id"] for r in knn(df, [1.0, 1.0], k=3).collect()]
    assert got == [2, 5, 9]


def test_knn_join_per_query_topk(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = knn_join(emb, queries, k=4).collect()
    assert len(out) == 12
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    for qid, hits in by_q.items():
        assert len(hits) == 4
        q = [float(x) for x in dict(rows)[qid]]
        # each query's own vector is its nearest neighbor
        top_ids = [h["vec_id"] for h in sorted(hits, key=lambda h: (-h["similarity"], h["vec_id"]))]
        assert top_ids == numpy_topk(rows, q, 4)


def test_knn_join_two_stage_identical(spark, emb):
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    one = knn_join(emb.repartition(8), queries, k=5, two_stage=False)
    two = knn_join(emb.repartition(8), queries, k=5, two_stage=True)
    a = {(r["query_id"], r["vec_id"], r["similarity"]) for r in one.collect()}
    b = {(r["query_id"], r["vec_id"], r["similarity"]) for r in two.collect()}
    assert a == b


def test_knn_join_auto_two_stage(spark, emb):
    # AUTO: a wide corpus scan (> TWO_STAGE_MIN_PARTITIONS) must get the
    # per-partition partial rank stage (two Window operators; the partial
    # one keyed by spark_partition_id), a narrow one must not.
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    wide = knn_join(emb.repartition(16), queries, k=3)
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2 and "__pid" in plan
    narrow = knn_join(emb.coalesce(1), queries, k=3)
    nplan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "__pid" not in nplan
    # auto result identical to the explicit single-stage form
    a = {(r["query_id"], r["vec_id"], r["similarity"]) for r in wide.collect()}
    b = {
        (r["query_id"], r["vec_id"], r["similarity"])
        for r in knn_join(emb, queries, k=3, two_stage=False).collect()
    }
    assert a == b


def test_knn_reference_dimensionality(spark):
    # Dimension is a parameter, never hard-coded (reference nominal is 768,
    # constants.ts:6; fixtures use 64) — run the full path at 768.
    from pyspark.sql import functions as F

    dim = 768
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000))).cast("double") / 1000.0,
    )
    corpus = spark.range(2000).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    q = [float((hash((0, j)) % 1000)) / 1000.0 for j in range(dim)]  # any 768-dim probe
    got = knn(corpus, q, k=5).collect()
    assert len(got) == 5
    sims = [r["similarity"] for r in got]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_knn_plan_is_take_ordered(spark, emb):
    # The physical plan must be TakeOrderedAndProject (partial per-partition
    # top-k), not a global Sort — this is the scalability claim, verified.
    plan = knn(emb, [1.0] * 64, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
