"""Independent recomputes for the batch-9 round-7 additions: variance
driver analysis and empirical-Bayes reliability shrinkage. (The
streaming rate-limit twin is covered in test_streaming_stateful.py.)"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _rha(x: float) -> int:
    m = math.floor(abs(x))
    m = m + 1 if abs(x) - m >= 0.5 else m
    return int(m) if x >= 0 else -int(m)


def test_driver_eta2_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT p.p_brand, l.l_returnflag, l.l_linestatus,
                  CAST(round(l.l_discount*100) AS BIGINT),
                  year(l.l_shipdate), month(l.l_shipdate),
                  CAST(floor(l.l_extendedprice) AS BIGINT)
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey""",
    )
    dims = ["brand", "return_flag", "line_status", "discount_pct",
            "ship_year", "ship_month"]
    got = {r.dimension: r for r in _q("driver_analysis_eta2", spark, sf_dir).collect()}
    assert set(got) == set(dims)
    for di, dim in enumerate(dims):
        groups = defaultdict(lambda: [0, 0, 0])
        for row in rows:
            g = row[di]
            x = row[6]
            st = groups[g]
            st[0] += 1
            st[1] += x
            st[2] += x * x
        n = sum(g[0] for g in groups.values())
        s = sum(g[1] for g in groups.values())
        q = sum(g[2] for g in groups.values())
        sum_term = sum(_rha(g[1] * g[1] / g[0]) for g in groups.values())
        ssb = sum_term - _rha(s * s / n)
        ssw = q - sum_term
        k = len(groups)
        r = got[dim]
        assert (r.k, r.n) == (k, n)
        assert math.isclose(r.eta_squared, ssb / (ssb + ssw), rel_tol=1e-9)
        assert math.isclose(
            r.f_stat, (ssb / (k - 1)) / (ssw / (n - k)), rel_tol=1e-9
        )
        assert 0.0 <= r.eta_squared <= 1.0


def test_eb_shrinkage_matches_and_reorders(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT l_suppkey, CAST(COUNT(*) AS BIGINT),
                  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM lineitem GROUP BY 1""",
    )
    nn = sum(n for _, n, _ in rows)
    kk = sum(k for _, _, k in rows)
    m = kk / nn
    tau = 20.0
    scored = sorted(
        ((k + tau * m) / (n + tau), sk, n, k) for sk, n, k in rows
    )
    expect = [(sk, n, k, k / n, sr) for sr, sk, n, k in scored[:10]]
    got = [
        (r.supp_key, r.n_lines, r.n_returned, r.raw_rate, r.shrunk_rate)
        for r in _q("supplier_return_eb_shrunk", spark, sf_dir).collect()
    ]
    assert len(got) == 10
    for (esk, en, ek, eraw, eshr), (gsk, gn, gk, graw, gshr) in zip(expect, got):
        assert (esk, en, ek) == (gsk, gn, gk)
        assert math.isclose(eraw, graw, rel_tol=1e-12)
        assert math.isclose(eshr, gshr, rel_tol=1e-12)
    # contraction property: every shrunk rate sits between the raw rate
    # and the global mean, strictly closer to the mean (the fixtures'
    # suppliers are uniformly large, so reordering doesn't occur here —
    # the contraction is the testable invariant)
    for sk, n, k, raw, shr in got:
        assert abs(shr - m) <= abs(raw - m) + 1e-15
        lo, hi = min(raw, m), max(raw, m)
        assert lo - 1e-15 <= shr <= hi + 1e-15
