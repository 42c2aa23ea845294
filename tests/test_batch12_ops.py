"""Independent recomputes for the batch-12 round-7 additions: random
walks, Croston forecasting, and ABC-XYZ classification."""

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


def _item_adj(sf_dir):
    ui = _duck(
        sf_dir,
        """SELECT DISTINCT user_id,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
           FROM events WHERE event_type IN ('click', 'purchase')""",
    )
    by_user = defaultdict(set)
    for u, i in ui:
        by_user[u].add(i)
    co = Counter()
    for items in by_user.values():
        ss = sorted(items)
        for a in ss:
            for b in ss:
                if a != b:
                    co[(a, b)] += 1
    per_src = defaultdict(list)
    for (a, b), c in co.items():
        per_src[a].append((c, b))
    edges = set()
    for a, lst in per_src.items():
        for c, b in sorted(lst, key=lambda t: (-t[0], t[1]))[:3]:
            edges.add((a, b))
            edges.add((b, a))
    adj = defaultdict(list)
    for a, b in sorted(edges):
        adj[a].append(b)  # dst-ASC order == the query's neighbor index
    return adj


def test_random_walks_match_python(spark, sf_dir):
    adj = _item_adj(sf_dir)
    expect = set()
    for start in adj:
        node = start
        expect.add((start, 0, node))
        for t in range(1, 9):
            pick = _hex13(f"walk|{start}|{t}") % len(adj[node])
            node = adj[node][pick]
            expect.add((start, t, node))
    got = {
        (r.start, r.step, r.node)
        for r in _q("graph_random_walks", spark, sf_dir).collect()
    }
    assert got == expect
    # every walk runs the full length
    steps = Counter(s for _, s, _ in got)
    assert all(steps[t] == len(adj) for t in range(9))


def test_croston_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT l.l_partkey,
                  date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)),
                  CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT)
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2""",
    )
    series = defaultdict(dict)
    totals = Counter()
    d0 = min(d for _, d, _ in rows)
    for part, d, q in rows:
        series[part][d] = q
        totals[part] += q
    top5 = sorted(totals, key=lambda p: (-totals[p], p))[:5]
    got = {r.part_key: r for r in _q("forecast_croston", spark, sf_dir).collect()}
    assert set(got) == set(top5)
    for part in top5:
        days = sorted(series[part])
        prev = d0 - 1
        z = p = None
        for d in days:
            q, gap = series[part][d], d - prev
            if z is None:
                z, p = float(q), float(gap)
            else:
                z = 0.2 * q + 0.8 * z
                p = 0.2 * gap + 0.8 * p
            prev = d
        r = got[part]
        assert r.n_demand_days == len(days)
        assert math.isclose(r.z_size, z, rel_tol=1e-12)
        assert math.isclose(r.p_interval, p, rel_tol=1e-12)
        assert math.isclose(r.demand_rate_per_day, z / p, rel_tol=1e-12)
        assert r.p_interval >= 1.0


def test_abc_xyz_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT l.l_partkey, CAST(o.o_orderdate AS DATE),
                  CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT)
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2""",
    )
    n_days = _duck(
        sf_dir, "SELECT COUNT(DISTINCT CAST(o_orderdate AS DATE)) FROM orders"
    )[0][0]
    s = Counter()
    sq = Counter()
    for part, _, q in rows:
        s[part] += q
        sq[part] += q * q
    tot = sum(s.values())
    ranked = sorted(s, key=lambda p: (-s[p], p))
    cells = Counter()
    qty = Counter()
    cum = 0
    for part in ranked:
        cum += s[part]
        abc = "A" if cum * 10 <= tot * 8 else ("B" if cum * 100 <= tot * 95 else "C")
        if n_days * sq[part] * 4 < s[part] ** 2 * 5:
            xyz = "X"
        elif n_days * sq[part] < s[part] ** 2 * 2:
            xyz = "Y"
        else:
            xyz = "Z"
        cells[(abc, xyz)] += 1
        qty[(abc, xyz)] += s[part]
    got = {
        (r.abc_class, r.xyz_class): (r.n_parts, r.total_qty)
        for r in _q("inventory_abc_xyz", spark, sf_dir).collect()
    }
    assert got == {k: (cells[k], qty[k]) for k in cells}
