"""Unit tests for the round-5 operators: exact percentiles vs numpy,
SemDeDup's planted-copy detection, and containment's asymmetric-dup
property that Jaccard misses."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.plans.registry import load_all


@pytest.fixture(scope="module")
def specs():
    return load_all()


def test_percentile_exact_matches_numpy(spark, sf_dir, specs):
    rows = specs["percentile_exact"].fn(spark, sf_dir).collect()
    import duckdb

    li = duckdb.sql(
        f"SELECT l_returnflag, l_extendedprice FROM '{sf_dir}/lineitem.parquet'"
    ).df()
    for r in rows:
        x = li[li.l_returnflag == r["l_returnflag"]].l_extendedprice.to_numpy(float)
        # numpy 'linear' interpolation is the same h = p*(n-1) definition
        assert r["price_p50"] == pytest.approx(np.percentile(x, 50), rel=1e-12)
        assert r["price_p95"] == pytest.approx(np.percentile(x, 95), rel=1e-12)


def test_percentile_sketch_tracks_exact(spark, sf_dir, specs):
    exact = {
        r["l_returnflag"]: r for r in specs["percentile_exact"].fn(spark, sf_dir).collect()
    }
    est = {
        r["l_returnflag"]: r
        for r in specs["approx_percentile_sketch"].fn(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for flag, e in est.items():
        # a 25% uniform sample's p50/p95 should land within a few percent
        assert e["price_p50"] == pytest.approx(exact[flag]["price_p50"], rel=0.10)
        assert e["price_p95"] == pytest.approx(exact[flag]["price_p95"], rel=0.10)
        assert 0 < e["n_sample"] < e["n_total"]


def test_semdedup_drops_exactly_the_planted_copies(spark, sf_dir, specs):
    from rag_application_with_vectordb_spark.plans.dedup_queries import _AUG_EXACT_OFF

    rows = specs["dedup_semantic_semdedup"].fn(spark, sf_dir).collect()
    dropped = {r["dropped_id"] for r in rows}
    assert dropped == {_AUG_EXACT_OFF + i for i in range(20)}
    for r in rows:
        assert r["kept_id"] == r["dropped_id"] - _AUG_EXACT_OFF  # keeper is the source
        assert r["similarity"] > 0.98


def test_containment_catches_subset_doc_jaccard_misses(spark):
    from rag_application_with_vectordb_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(1, short), (2, short + " " + filler)], "doc_id long, text string"
    )
    cont = containment_pairs(docs, min_containment=0.9).collect()
    # every shingle of doc 1 appears in doc 2 -> containment_a == 1.0
    assert len(cont) == 1 and cont[0]["containment_a"] == 1.0
    # while the Jaccard of the same pair is far below a dedup threshold
    jac = ngram_jaccard_pairs(docs).collect()
    assert len(jac) == 1 and jac[0]["jaccard"] < 0.2


def test_doc_meanpool_is_true_mean(spark, sf_dir, specs):
    out = specs["doc_embedding_meanpool"].fn(spark, sf_dir)
    one = out.filter(F.col("doc_id") == 0).orderBy("dim").collect()
    assert len(one) == 16
    n = one[0]["n_chunks"]
    assert all(r["n_chunks"] == n for r in one)
    assert all(abs(r["mean_val"]) <= 1.0 for r in one)


def test_opq_learned_perm_is_valid_and_variance_balanced(spark, sf_dir):
    import duckdb

    from rag_application_with_vectordb_spark.plans.ann_queries import (
        _DIM,
        _OPQL_VSCALE,
        _PQ_M,
        _PQ_TRAIN_MOD,
        _opq_learned_perm,
    )

    perm = _opq_learned_perm(spark, sf_dir)
    assert sorted(perm) == list(range(_DIM))

    # independent recompute: fixed-point variance ranks from DuckDB
    rows = duckdb.sql(f"""
        SELECT CAST(j AS INTEGER) AS j, COUNT(*) AS n,
               SUM(CAST(FLOOR(CAST(embedding[CAST(j AS INTEGER)+1] AS DOUBLE) * {_OPQL_VSCALE}.0) AS BIGINT)) AS s1,
               SUM(CAST(FLOOR(CAST(embedding[CAST(j AS INTEGER)+1] AS DOUBLE) * {_OPQL_VSCALE}.0) AS BIGINT)
                   * CAST(FLOOR(CAST(embedding[CAST(j AS INTEGER)+1] AS DOUBLE) * {_OPQL_VSCALE}.0) AS BIGINT)) AS s2
        FROM '{sf_dir}/embeddings.parquet', (SELECT unnest(range(0, {_DIM}))) t(j)
        WHERE vec_id % {_PQ_TRAIN_MOD} = 0 GROUP BY j
    """).fetchall()
    var_fp = {j: n * s2 - s1 * s1 for j, n, s1, s2 in rows}
    ranked = sorted(range(_DIM), key=lambda j: (-var_fp[j], j))
    m = _PQ_M
    assign = []
    for r, j in enumerate(ranked):
        b = r % (2 * m)
        s = b if b < m else 2 * m - 1 - b
        assign.append((s, r, j))
    want = [j for s, r, j in sorted(assign)]
    assert perm == want
    # snake property: every subspace receives exactly dim/m dims, and the
    # top-m-ranked dims land in m DISTINCT subspaces (balanced allocation)
    sub = _DIM // m
    by_s = {}
    for s, r, j in assign:
        by_s.setdefault(s, []).append(r)
    assert all(len(v) == sub for v in by_s.values())
    top_m_subspaces = {s for s, r, j in assign if r < m}
    assert len(top_m_subspaces) == m


def test_resample_linear_matches_numpy_interp(spark, sf_dir, specs):
    import duckdb
    import numpy as np

    rows = specs["events_resample_linear"].fn(spark, sf_dir).collect()
    ev = duckdb.sql(f"""
        SELECT user_id, epoch_us(ts) AS m, value
        FROM '{sf_dir}/events.parquet'
        WHERE event_type = 'purchase' ORDER BY user_id, m, event_id
    """).fetchall()
    by_user = {}
    for u, m, v in ev:
        by_user.setdefault(u, []).append((m, v))
    grid = duckdb.sql(f"""
        WITH ev AS (SELECT user_id, ts FROM '{sf_dir}/events.parquet'
                    WHERE event_type = 'purchase')
        SELECT user_id, epoch_us(unnest(generate_series(
                 date_trunc('hour', MIN(ts)), MAX(ts), INTERVAL 6 HOUR))) AS g
        FROM ev GROUP BY user_id
    """).fetchall()
    want = {}
    for u, g in grid:
        pts = by_user[u]
        xs = np.array([m for m, _ in pts], dtype=np.int64)
        # np.interp needs strictly usable xp; duplicates at the same
        # micros are resolved by event_id order in the query — collapse
        # to the LAST value at each x to mirror the window's pick
        uniq = {}
        for m, v in pts:
            uniq[m] = v
        xs = np.array(sorted(uniq), dtype=np.int64)
        ys = np.array([uniq[m] for m in sorted(uniq)])
        want[(u, g)] = float(np.interp(float(g), xs.astype(float), ys))
    got = {(r["user_id"], int(r["grid_ts"].timestamp() * 1_000_000)): r["value_interp"] for r in rows}
    assert set(got) == set(want)
    import math
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-9), k
