"""Tests for BM25 + RRF hybrid retrieval (plans/hybrid_queries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.plans.hybrid_queries import _TERMS, _bm25_scores
from rag_application_with_vectordb_spark.plans.registry import load_all
from rag_application_with_vectordb_spark.sources.catalog import load_table


def test_bm25_zero_tf_scores_zero_and_positive_tf_positive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = _bm25_scores(docs).collect()
    assert rows
    for r in rows:
        total_tf = sum(r[f"tf_{t}"] for t in _TERMS)
        if total_tf == 0:
            assert r.bm25 == 0.0
        else:
            assert r.bm25 > 0.0


def test_bm25_topk_is_sorted_and_distinct(spark, sf_dir):
    out = load_all()["text_bm25_topk"].fn(spark, sf_dir).collect()
    assert len(out) == 10
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)
    assert len({r.doc_id for r in out}) == 10


def test_rrf_fuses_both_retrievers(spark, sf_dir):
    out = load_all()["hybrid_rrf_topk"].fn(spark, sf_dir).collect()
    assert len(out) == 10
    # every fused row came from at least one retriever's top-20
    for r in out:
        assert r.vec_rank > 0 or r.bm25_rank > 0
        expect = (1.0 / (60 + r.vec_rank) if r.vec_rank else 0.0) + (
            1.0 / (60 + r.bm25_rank) if r.bm25_rank else 0.0
        )
        assert abs(r.rrf_score - expect) < 1e-12
    # a doc in BOTH lists must outrank a doc in only one at similar ranks:
    # top fused score should exceed the best single-list-only score bound
    both = [r for r in out if r.vec_rank > 0 and r.bm25_rank > 0]
    if both:
        assert out[0].rrf_score >= max(r.rrf_score for r in both)


def test_rrf_plan_has_no_corpus_wide_window(spark, sf_dir):
    plan = load_all()["hybrid_rrf_topk"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # each retriever reduces via TakeOrderedAndProject before any window
    assert "TakeOrderedAndProject" in plan


# --- WAND / max-score pruning ---------------------------------------------------

def _wand_full_scores(spark, sf_dir):
    """Unpruned reference: exact micro scores for every doc containing
    at least one query term, via the same contribution expression."""
    from rag_application_with_vectordb_spark.plans.hybrid_queries import (
        _WAND_TERMS,
        _prf_contrib,
        _prf_views,
    )

    _prf_views(spark, sf_dir)
    spark.createDataFrame([(t,) for t in _WAND_TERMS], "word string").createOrReplaceTempView(
        "wand_full_q"
    )
    return {
        r.doc_id: r.score_micro
        for r in spark.sql(
            f"""
            SELECT tf.doc_id, CAST(SUM({_prf_contrib("1.0")}) AS BIGINT) AS score_micro
            FROM prf_tf tf JOIN wand_full_q q ON tf.word = q.word
            JOIN prf_dfs d ON tf.word = d.word
            CROSS JOIN prf_stats s
            GROUP BY tf.doc_id
            """
        ).collect()
    }


def test_wand_matches_unpruned_topk(spark, sf_dir):
    from rag_application_with_vectordb_spark.plans.hybrid_queries import _WAND_K

    out = load_all()["retrieval_wand_topk"].fn(spark, sf_dir).collect()
    full = _wand_full_scores(spark, sf_dir)
    expect = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:_WAND_K]
    got = [(r.doc_id, r.score_micro) for r in out]
    assert got == expect
    # the pruning bookkeeping is consistent: every candidate doc is
    # either exactly scored or pruned
    assert out[0].scored_docs + out[0].pruned_docs == len(full)


def test_wand_prunes_on_skewed_vocabulary(spark):
    # at sf0.01 the 'dup' essential term appears in ~5% of docs, so the
    # bound check must prune most of the other candidates
    out = load_all()["retrieval_wand_topk"].fn(spark, "/root/testdata/sf0.01").collect()
    assert out[0].pruned_docs > 0
    assert out[0].scored_docs < (out[0].scored_docs + out[0].pruned_docs) * 0.25
    # and the pruned result still equals the unpruned top-k
    full = _wand_full_scores(spark, "/root/testdata/sf0.01")
    expect = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.doc_id, r.score_micro) for r in out] == expect
