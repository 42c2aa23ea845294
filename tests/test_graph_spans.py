"""Unit tests for fixed-point PageRank and duplicated-span coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.operators.dedup import (
    duplicated_span_coverage,
)
from rag_application_with_vectordb_spark.operators.graph import pagerank_fp


def _pagerank_py(edges, iterations, scale):
    """Pure-Python twin of the integer recurrence."""
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: scale for v in outdeg}
    base = 15 * scale // 100
    for _ in range(iterations):
        inflow: dict[int, int] = {}
        for s, d in edges:
            inflow[d] = inflow.get(d, 0) + pr[s] // outdeg[s]
        pr = {v: base + (85 * inflow.get(v, 0)) // 100 for v in outdeg}
    return pr


def test_pagerank_matches_python_reference(spark):
    # Undirected triangle + pendant: symmetrize by hand.
    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    scale = 10**9
    got = {
        r["part"]: (r["outdeg"], r["pr"])
        for r in pagerank_fp(df, iterations=3, scale=scale).collect()
    }
    want = _pagerank_py(edges, 3, scale)
    assert set(got) == set(want)
    for v, pr in want.items():
        assert got[v][1] == pr, v
    # Hub (node 3, degree 3) must outrank the pendant (node 4, degree 1).
    assert got[3][1] > got[4][1]
    assert got[3][0] == 3 and got[4][0] == 1


def test_pagerank_mass_is_conserved_approximately(spark):
    # On a regular graph (cycle) every rank stays exactly 1.0: shares
    # divide evenly, so the integer recurrence hits the fixed point.
    cyc = [(i, (i + 1) % 5) for i in range(5)] + [((i + 1) % 5, i) for i in range(5)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    scale = 10**9
    rows = pagerank_fp(df, iterations=4, scale=scale).collect()
    for r in rows:
        assert abs(r["pr"] - scale) <= 2  # integer-division rounding only


def test_span_coverage_exact_copy_and_overlap(spark):
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact copy: full coverage both ways
            (3, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"),  # untouched
            # shares only the first 8 tokens of base → spans at pos 1..1
            (4, "w0 w1 w2 w3 w4 w5 w6 w7 z8 z9"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in duplicated_span_coverage(docs, n=8).collect()
    }
    assert got[1]["n_tokens"] == 10
    # copy pair: every 8-gram shared; spans [1,9),[2,10),[3,11) union = 10
    assert got[1]["dup_tokens"] == 10 and got[1]["dup_fraction"] == 1.0
    assert got[2]["dup_tokens"] == 10
    assert got[3]["dup_tokens"] == 0 and got[3]["dup_fraction"] == 0.0
    # doc 4 shares exactly one 8-gram (pos 1) with doc 1 → 8 tokens; and
    # doc 1's pos-1 span is already inside its full coverage (no change).
    assert got[4]["dup_tokens"] == 8 and got[4]["dup_fraction"] == 0.8


def test_span_coverage_short_docs_yield_zero(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    rows = duplicated_span_coverage(docs, n=8).collect()
    assert {r["doc_id"]: r["dup_tokens"] for r in rows} == {1: 0, 2: 0}
    assert all(r["n_tokens"] == 3 for r in rows)


def test_triangle_counts_match_bruteforce(spark, sf_dir):
    import duckdb

    from rag_application_with_vectordb_spark.plans.registry import load_all

    rows = load_all()["graph_triangles"].fn(spark, sf_dir).collect()
    got = {r["part_id"]: r["triangles"] for r in rows}
    got_total = sum(got.values()) // 3  # each triangle counted at 3 nodes

    # brute force: every unordered triple of mutually-connected nodes
    brute = duckdb.sql(f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{sf_dir}/lineitem.parquet'),
        prs AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2
        )
        SELECT COUNT(*) FROM prs e1
        JOIN prs e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
        JOIN prs e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
    """).fetchone()[0]
    assert got_total == brute
    # clustering coefficient bounds + zero-degree-1 property
    for r in rows:
        assert 0.0 <= r["clustering_coeff"] <= 1.0
        if r["degree"] < 2:
            assert r["triangles"] == 0 and r["clustering_coeff"] == 0.0


def test_weighted_pagerank_reduces_to_uniform_on_equal_weights(spark):
    from pyspark.sql import functions as F

    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long").withColumn(
        "w", F.lit(7).cast("long")
    )
    plain = {
        r["part"]: r["pr"]
        for r in pagerank_fp(df, iterations=3, scale=10**9).collect()
    }
    weighted = {
        r["part"]: r["pr"]
        for r in pagerank_fp(df, iterations=3, scale=10**9, weight_col="w").collect()
    }
    # equal weights cancel: (pr*7) div (7*d) == pr div d for every value
    # reachable here (shares stay integral at the same points)... not in
    # general! (pr*w) div (w*d) >= pr div d, equality iff the remainder
    # structure matches — with w=7 and pr=1e9, 7e9 div 21 != (1e9 div 3)*...
    # So assert the FLOAT ranks agree to within the integer-division
    # granularity instead of bit equality.
    for v in plain:
        assert abs(plain[v] - weighted[v]) <= 100, v
    # and a genuinely skewed weight changes the ranking in the expected
    # direction: loading edge (1,2) pulls rank toward 2
    skew = df.withColumn(
        "w", F.when((F.col("src") == 1) & (F.col("dst") == 2), F.lit(100)).otherwise(F.lit(1)).cast("long")
    )
    sk = {
        r["part"]: r["pr"]
        for r in pagerank_fp(skew, iterations=3, scale=10**9, weight_col="w").collect()
    }
    assert sk[2] > weighted[2]
