"""Independent recomputes for the batch-8 round-7 additions: token-
bucket rate-limit audit, price/volume decomposition, and Neyman
allocation."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "lineitem", "orders", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


# --- token bucket -----------------------------------------------------------------


def test_rate_limit_matches_python_simulation(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id
           FROM events""",
    )
    by_user = defaultdict(list)
    for u, es, eid in rows:
        by_user[u].append(es * 10_000_000 + eid % 10_000_000)
    cap, cost = 2 * 21600, 21600
    expect = {}
    for u, encs in by_user.items():
        s, acc, rej, prev = cap, 0, 0, -1
        for enc in sorted(encs):
            ep = enc // 10_000_000
            s = cap if prev < 0 else min(cap, s + (ep - prev))
            if s >= cost:
                s -= cost
                acc += 1
            else:
                rej += 1
            prev = ep
        expect[u] = (len(encs), acc, rej, s)
    got = {
        r.user_id: (r.n_events, r.accepted, r.rejected, r.credit_sec_left)
        for r in _q("events_rate_limit_audit", spark, sf_dir).collect()
    }
    assert got == expect
    # the fixture's event density must actually exercise the throttle
    assert sum(v[2] for v in expect.values()) > 0


# --- price/volume decomposition ----------------------------------------------------


def test_price_volume_identity(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT l.l_partkey, year(o.o_orderdate),
                  CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT),
                  CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT)
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           WHERE year(o.o_orderdate) IN (1996, 1997)
           GROUP BY 1, 2""",
    )
    y0, y1 = {}, {}
    for part, yr, qty, cents in rows:
        (y0 if yr == 1996 else y1)[part] = (qty, cents)
    total = sum(c for _, c in y1.values()) - sum(c for _, c in y0.values())
    pe = ve = 0
    new_c = disc_c = 0
    n_common = 0
    for part in set(y0) | set(y1):
        if part in y0 and part in y1:
            q0, r0 = y0[part]
            q1, r1 = y1[part]
            pe += _rha((r1 * q0 / q1 - r0) * 1000)
            ve += _rha((q1 - q0) * r1 / q1 * 1000)
            n_common += 1
        elif part in y1:
            new_c += y1[part][1]
        else:
            disc_c -= y0[part][1]
    r = _q("sales_price_volume_decomp", spark, sf_dir).collect()[0]
    assert r.total_change_cents == total
    assert math.isclose(r.price_effect_dollars, pe / 100000, rel_tol=1e-12)
    assert math.isclose(r.volume_effect_dollars, ve / 100000, rel_tol=1e-12)
    assert math.isclose(r.new_parts_dollars, new_c / 100, rel_tol=1e-12)
    assert math.isclose(r.discontinued_dollars, disc_c / 100, rel_tol=1e-12)
    # the Laspeyres+Paasche identity is exact; the residual is pure grid
    # rounding, bounded by half a milli-cent per common part
    assert abs(r.residual_dollars) <= n_common * 0.5e-3 / 100 + 1e-9


# --- Neyman allocation ---------------------------------------------------------------


def test_neyman_allocation_sums_to_budget_and_matches(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT lang, CAST(COUNT(*) AS BIGINT),
                  CAST(SUM(n_chars) AS BIGINT),
                  CAST(SUM(n_chars*n_chars) AS BIGINT)
           FROM documents GROUP BY lang""",
    )
    w = {
        lang: (n, _rha(math.sqrt(q * n - s * s) * 1e6))
        for lang, n, s, q in rows
    }
    wtot = sum(x for _, x in w.values())
    quotas = {lang: 1000.0 * x / wtot for lang, (_, x) in w.items()}
    floors = {lang: int(math.floor(q)) for lang, q in quotas.items()}
    leftover = 1000 - sum(floors.values())
    order = sorted(quotas, key=lambda k: (-(quotas[k] - floors[k]), k))
    alloc = dict(floors)
    for lang in order[:leftover]:
        alloc[lang] += 1
    got = {r.lang: r for r in _q("sample_neyman_allocation", spark, sf_dir).collect()}
    assert {k: v.alloc_n for k, v in got.items()} == alloc
    assert sum(v.alloc_n for v in got.values()) == 1000
    for lang, r in got.items():
        assert r.stratum_size == w[lang][0]
        assert math.isclose(r.exact_quota, quotas[lang], rel_tol=1e-12)


def _rha(x: float) -> int:
    # SQL round() is half-AWAY-FROM-ZERO for negatives too
    m = math.floor(abs(x))
    m = m + 1 if abs(x) - m >= 0.5 else m
    return int(m) if x >= 0 else -int(m)
