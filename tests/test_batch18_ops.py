"""Independent recomputes for the batch-18 round-7 additions: HHI
concentration and sequence entropy rate."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("orders", "customer", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _rha(x: float) -> int:
    m = math.floor(abs(x))
    m = m + 1 if abs(x) - m >= 0.5 else m
    return int(m) if x >= 0 else -int(m)


def test_hhi_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT year(o.o_orderdate), o.o_custkey,
                  CAST(SUM(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT)
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           GROUP BY 1, 2""",
    )
    per_year = defaultdict(dict)
    for yr, ck, cents in rows:
        per_year[yr][ck] = cents
    got = {r.yr: r for r in _q("market_concentration_hhi", spark, sf_dir).collect()}
    assert set(got) == set(per_year)
    for yr, book in per_year.items():
        tot = sum(book.values())
        hhi_nano = sum(_rha(1e9 * (c / tot) ** 2) for c in book.values())
        r = got[yr]
        assert r.n_cust == len(book)
        assert math.isclose(r.hhi, hhi_nano / 1e9, rel_tol=1e-9)
        assert math.isclose(
            r.hhi_normalized_x_n, hhi_nano / 1e9 * len(book), rel_tol=1e-9
        )
        # HHI bounds: [1/n, 1]
        assert 1 / len(book) - 1e-9 <= r.hhi <= 1 + 1e-9


def test_entropy_rate_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id",
    )
    seqs = defaultdict(list)
    for u, t in rows:
        seqs[u].append(t)
    cnt = Counter()
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    n = sum(cnt.values())
    marg = Counter()
    for (a, _), c in cnt.items():
        marg[a] += c
    h_nano = sum(
        _rha(-1e9 * (c / n) * math.log(c / marg[a])) for (a, _), c in cnt.items()
    )
    hm_nano = sum(_rha(-1e9 * (c / n) * math.log(c / n)) for c in marg.values())
    r = _q("events_entropy_rate", spark, sf_dir).collect()[0]
    assert r.n_transitions == n
    assert math.isclose(r.entropy_rate_nats, h_nano / 1e9, rel_tol=1e-9)
    assert math.isclose(r.marginal_entropy_nats, hm_nano / 1e9, rel_tol=1e-9)
    # conditioning can only reduce entropy (up to grid slack)
    assert r.entropy_rate_nats <= r.marginal_entropy_nats + 1e-6
