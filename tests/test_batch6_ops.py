"""Independent recomputes for the batch-6 round-7 additions:
personalized PageRank, binary-segmentation changepoint, and
partition fingerprints."""

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


# --- personalized PageRank ---------------------------------------------------------


def test_ppr_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
           SELECT a.l_partkey, b.l_partkey
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                              AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING COUNT(*) >= 2""",
    )
    adj = defaultdict(list)
    for a, b in rows:
        adj[a].append(b)
        adj[b].append(a)
    scale = 10**9
    seed = min(adj)
    pr = {v: scale if v == seed else 0 for v in adj}
    for _ in range(6):
        inflow = Counter()
        for u, nbrs in adj.items():
            share = pr[u] // len(nbrs)
            for v in nbrs:
                inflow[v] += share
        pr = {
            v: (15 * scale // 100 if v == seed else 0) + (85 * inflow[v]) // 100
            for v in adj
        }
    expect = {v: p for v, p in pr.items() if p > 0}
    got = {r.part_id: r for r in _q("graph_ppr_seed", spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for v, r in got.items():
        assert r.ppr_fixed == expect[v]
        assert r.outdeg == len(adj[v])
        assert math.isclose(r.ppr, expect[v] / scale, rel_tol=1e-12)
    # restart mass concentrates on the seed
    assert max(got, key=lambda v: got[v].ppr_fixed) == seed


# --- binseg changepoint -------------------------------------------------------------


def test_binseg_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT date_trunc('day', ts) AS day,
                  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS c
           FROM events WHERE event_type = 'purchase'
           GROUP BY 1 ORDER BY 1""",
    )
    xs = [c // 100 for _, c in rows]
    days = [d for d, _ in rows]
    n = len(xs)
    s_tot, q_tot = sum(xs), sum(x * x for x in xs)
    total_sse = q_tot - s_tot * s_tot / n
    best = None
    s1 = q1 = 0
    for k in range(1, n):
        s1 += xs[k - 1]
        q1 += xs[k - 1] ** 2
        sse = (q1 - s1 * s1 / k) + ((q_tot - q1) - (s_tot - s1) ** 2 / (n - k))
        key = (sse, days[k - 1])
        if best is None or key < best[0]:
            best = (key, k, s1)
    (_, split_day), k, s1 = best
    r = _q("events_changepoint_binseg", spark, sf_dir).collect()[0]
    import datetime as dt

    want_day = split_day.date() if isinstance(split_day, dt.datetime) else split_day
    assert r.split_day == want_day
    assert (r.n_left, r.n_right) == (k, n - k)
    assert math.isclose(r.mean_left, s1 / k, rel_tol=1e-12)
    assert math.isclose(r.mean_right, (s_tot - s1) / (n - k), rel_tol=1e-12)
    assert math.isclose(r.total_sse, total_sse, rel_tol=1e-9)
    assert 0.0 <= r.sse_reduction <= 1.0


# --- partition fingerprints ----------------------------------------------------------


def test_fingerprints_match_python_and_detect_divergence(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT o_orderkey, o_custkey,
                  CAST(round(o_totalprice*100) AS BIGINT),
                  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                  year(o_orderdate) * 12 + month(o_orderdate)
           FROM orders""",
    )
    agg = defaultdict(lambda: [0, 0])
    for ok, ck, cents, dd, m in rows:
        h = _hex13(f"{ok}|{ck}|{cents}|{dd}")
        agg[m][0] += 1
        agg[m][1] ^= h
    got = {
        r.month_idx: (r.n_rows, r.xor_fingerprint)
        for r in _q("audit_partition_fingerprints", spark, sf_dir).collect()
    }
    assert got == {m: tuple(v) for m, v in agg.items()}
    # a single-row perturbation must flip exactly its month's fingerprint
    ok, ck, cents, dd, m = rows[0]
    perturbed = dict(got)
    h_old = _hex13(f"{ok}|{ck}|{cents}|{dd}")
    h_new = _hex13(f"{ok}|{ck}|{cents + 1}|{dd}")
    perturbed[m] = (perturbed[m][0], perturbed[m][1] ^ h_old ^ h_new)
    diverged = [k for k in got if got[k] != perturbed[k]]
    assert diverged == [m]
