"""Independent recomputes for the batch-11 round-7 additions:
newsvendor stocking and off-policy IPS/SNIPS evaluation."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _hex13(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_newsvendor_matches_and_is_optimal(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT l.l_partkey, CAST(o.o_orderdate AS DATE),
                  CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT)
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2""",
    )
    n_days = _duck(
        sf_dir,
        "SELECT COUNT(DISTINCT CAST(o_orderdate AS DATE)) FROM orders",
    )[0][0]
    demand = defaultdict(Counter)
    totals = Counter()
    for part, _, d in rows:
        demand[part][d] += 1
        totals[part] += d
    top5 = sorted(totals, key=lambda p: (-totals[p], p))[:5]
    cu, co = 5, 2

    def cost(hist, stock):
        c = 0
        for d, nd in hist.items():
            c += nd * (co * max(stock - d, 0) + cu * max(d - stock, 0))
        return c

    got = {r.part_key: r for r in _q("inventory_newsvendor", spark, sf_dir).collect()}
    assert set(got) == set(top5)
    for part in top5:
        hist = Counter(demand[part])
        hist[0] += n_days - sum(hist.values())
        cum = 0
        stock = None
        for d in sorted(hist):
            cum += hist[d]
            if cum * (cu + co) >= cu * n_days:
                stock = d
                break
        r = got[part]
        assert (r.n_days, r.stock_opt) == (n_days, stock)
        assert r.total_cost_units == cost(hist, stock)
        assert math.isclose(
            r.expected_daily_cost_units, cost(hist, stock) / n_days, rel_tol=1e-12
        )
        # the fractile solution minimizes expected cost over all levels
        best = min(cost(hist, s) for s in list(hist) + [stock])
        assert cost(hist, stock) == best


def test_offpolicy_ips_matches_and_passes_aa(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT user_id, CAST(COUNT(*) AS BIGINT),
                  CAST(SUM(CASE WHEN event_type='purchase'
                       THEN CAST(round(value*100) AS BIGINT) ELSE 0 END)
                       AS BIGINT)
           FROM events GROUP BY user_id""",
    )
    n = len(rows)
    n_match = r_match = r_all = 0
    for u, act, cents in rows:
        b = 1 if _hex13(f"ab42|{u}") % 2 == 0 else 0
        pi = 1 if act >= 60 else 0
        r_all += cents
        if b == pi:
            n_match += 1
            r_match += cents
    r = _q("eval_offpolicy_ips", spark, sf_dir).collect()[0]
    assert (r.n, r.n_match, r.r_match) == (n, n_match, r_match)
    assert math.isclose(r.v_ips_dollars, 2 * r_match / n / 100, rel_tol=1e-12)
    assert math.isclose(r.v_snips_dollars, r_match / n_match / 100, rel_tol=1e-12)
    assert math.isclose(r.v_onpolicy_dollars, r_all / n / 100, rel_tol=1e-12)
    # A/A sanity: rewards are policy-independent, so SNIPS must sit near
    # the on-policy mean (SNIPS is consistent; raw IPS needs ~n_match/n
    # rescaling noise allowance)
    assert abs(r.v_snips_dollars - r.v_onpolicy_dollars) < 0.5 * r.v_onpolicy_dollars
