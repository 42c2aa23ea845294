"""Independent recomputes for the batch-10 round-7 additions: Wilcoxon
signed-rank, vocabulary coverage, and FD auditing."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "documents", "orders", "lineitem", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_wilcoxon_matches_scipy_convention(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT
             CAST(SUM(CASE WHEN event_type='purchase'
                  AND ts < TIMESTAMP '2024-01-16' THEN
                  CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN event_type='purchase'
                  AND ts >= TIMESTAMP '2024-01-16' THEN
                  CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT)
           FROM events GROUP BY user_id""",
    )
    diffs = [y - x for x, y in rows if y != x]
    n = len(diffs)
    # average ranks of |d| with ties
    sorted_abs = sorted(abs(d) for d in diffs)
    rank_of = {}
    i = 0
    while i < len(sorted_abs):
        j = i
        while j < len(sorted_abs) and sorted_abs[j] == sorted_abs[i]:
            j += 1
        avg2 = (i + 1) + j  # doubled average rank = first + last
        rank_of[sorted_abs[i]] = avg2
        i = j
    w2 = sum(rank_of[abs(d)] for d in diffs if d > 0)
    ties = Counter(abs(d) for d in diffs)
    tie3 = sum(t**3 - t for t in ties.values())
    z = (w2 - n * (n + 1) / 2.0) / math.sqrt(
        (n * (n + 1) * (2 * n + 1) - tie3 / 2.0) / 6.0
    )
    r = _q("stats_wilcoxon_signed_rank", spark, sf_dir).collect()[0]
    assert (r.n_pairs, r.w_plus_doubled) == (n, w2)
    assert math.isclose(r.w_plus, w2 / 2.0, rel_tol=1e-12)
    assert math.isclose(r.z, z, rel_tol=1e-12)


def test_vocab_coverage_matches_python(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT text FROM documents")
    wc = Counter()
    for (text,) in rows:
        for w in text.strip().split():
            if w:
                wc[w] += 1
    total = sum(wc.values())
    ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {r.vocab_size: r for r in _q("text_vocab_coverage", spark, sf_dir).collect()}
    assert set(got) == {1, 2, 4, 8, 16, 32}
    for k, r in got.items():
        cov = sum(n for _, n in ranked[:k])
        assert (r.covered_tokens, r.total_tokens) == (cov, total)
        assert math.isclose(r.coverage, cov / total, rel_tol=1e-12)
        assert math.isclose(r.oov_rate, 1 - cov / total, rel_tol=1e-12)
    # monotone in vocab size, saturating at 1.0 once vocab is exhausted
    covs = [got[k].coverage for k in (1, 2, 4, 8, 16, 32)]
    assert covs == sorted(covs)
    if len(wc) <= 32:
        assert covs[-1] == 1.0


def test_fd_audit_matches_python(spark, sf_dir):
    got = {r.fd: r for r in _q("audit_functional_deps", spark, sf_dir).collect()}
    specs = {
        "orders.o_orderkey->o_custkey":
            ("SELECT o_orderkey, o_custkey FROM orders", 1),
        "orders.o_custkey->o_orderstatus":
            ("SELECT o_custkey, o_orderstatus FROM orders", 1),
        "lineitem.(l_orderkey,l_linenumber)->l_partkey":
            ("SELECT (l_orderkey, l_linenumber), l_partkey FROM lineitem", 1),
        "lineitem.l_orderkey->l_suppkey":
            ("SELECT l_orderkey, l_suppkey FROM lineitem", 1),
        "part.p_name->p_brand": ("SELECT p_name, p_brand FROM part", 1),
        "documents.doc_id->lang": ("SELECT doc_id, lang FROM documents", 1),
    }
    assert set(got) == set(specs)
    holds = {}
    for fd, (sql, _) in specs.items():
        groups = defaultdict(set)
        for lhs, rhs in _duck(sf_dir, sql):
            groups[str(lhs)].add(rhs)
        r = got[fd]
        viol = sum(1 for v in groups.values() if len(v) > 1)
        assert r.n_lhs_groups == len(groups), fd
        assert r.n_violating_groups == viol, fd
        assert r.max_distinct_rhs == max(len(v) for v in groups.values()), fd
        holds[fd] = viol == 0
    # key constraints hold; the fan-out candidates are genuinely violated
    assert holds["orders.o_orderkey->o_custkey"]
    assert holds["documents.doc_id->lang"]
    # discovered violations: the fixture's (orderkey, linenumber) is NOT
    # a key (linenumbers repeat within an order) and names span brands
    assert not holds["lineitem.(l_orderkey,l_linenumber)->l_partkey"]
    assert not holds["lineitem.l_orderkey->l_suppkey"]
    assert not holds["part.p_name->p_brand"]
