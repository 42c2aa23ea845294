"""Independent recomputes for the batch-17 round-7 additions: decayed
popularity, column entropy, and the distribution-free median CI."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _rha(x: float) -> int:
    m = math.floor(abs(x))
    m = m + 1 if abs(x) - m >= 0.5 else m
    return int(m) if x >= 0 else -int(m)


def test_decayed_popularity_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT),
                  date_diff('day', CAST(ts AS DATE),
                            (SELECT MAX(CAST(ts AS DATE)) FROM events))
           FROM events WHERE event_type IN ('click', 'purchase')""",
    )
    score = Counter()
    cnt = Counter()
    for item, age in rows:
        score[item] += _rha(math.exp(-0.1 * age) * 1e6)
        cnt[item] += 1
    top = sorted(score, key=lambda i: (-score[i], i))[:10]
    got = [
        (r.item, r.n_events, r.decayed_micro, r.decayed_score)
        for r in _q("reco_decayed_popularity", spark, sf_dir).collect()
    ]
    assert [g[0] for g in got] == top
    for item, n, micro, sc in got:
        assert (n, micro) == (cnt[item], score[item])
        assert math.isclose(sc, score[item] / 1e6, rel_tol=1e-12)


def test_column_entropy_matches_python(spark, sf_dir):
    got = {r.column_name: r for r in _q("audit_column_entropy", spark, sf_dir).collect()}
    cols = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
            "o_totalprice")
    assert set(got) == set(cols)
    for col in cols:
        counts = Counter(v for (v,) in _duck(sf_dir, f"SELECT {col} FROM orders"))
        n = sum(counts.values())
        ent = _rha(math.log(n) * 1e9) / 1e9 - sum(
            _rha(c * math.log(c) * 1e9) for c in counts.values()
        ) / n / 1e9
        r = got[col]
        assert (r.n_distinct, r.n_rows) == (len(counts), n)
        assert math.isclose(r.entropy_nats, ent, rel_tol=1e-9)
    # key column: entropy == ln(n); status column far below
    assert math.isclose(
        got["o_orderkey"].entropy_nats,
        _rha(math.log(got["o_orderkey"].n_rows) * 1e9) / 1e9,
        rel_tol=1e-9,
    )
    assert got["o_orderstatus"].entropy_nats < 2.0


def test_median_ci_matches_python(spark, sf_dir):
    vals = sorted(
        r[0]
        for r in _duck(
            sf_dir,
            """SELECT CAST(round(value*100) AS BIGINT) FROM events
               WHERE event_type = 'purchase'""",
        )
    )
    n = len(vals)
    klo = int(math.floor(n / 2 - 0.98 * math.sqrt(n)))
    khi = int(math.ceil(n / 2 + 1 + 0.98 * math.sqrt(n)))
    r = _q("stats_median_ci", spark, sf_dir).collect()[0]
    assert (r.n_obs, r.rank_lo, r.rank_hi) == (n, klo, khi)
    assert r.ci_lo_cents == vals[klo - 1]
    assert r.ci_hi_cents == vals[khi - 1]
    # median = first value whose cum*2 >= n (lower median)
    assert r.median_cents == vals[(n - 1) // 2] if n % 2 else vals[n // 2 - 1]
    assert r.ci_lo_cents <= r.median_cents <= r.ci_hi_cents
