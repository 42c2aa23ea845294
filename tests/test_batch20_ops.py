"""Independent recomputes for the batch-20 round-7 additions: rich-club
coefficient and Heaps'-law fit."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _rha(x: float) -> int:
    m = math.floor(abs(x))
    m = m + 1 if abs(x) - m >= 0.5 else m
    return int(m) if x >= 0 else -int(m)


def _item_edges(sf_dir):
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
    return edges


def test_rich_club_matches_python(spark, sf_dir):
    edges = _item_edges(sf_dir)
    deg = Counter(a for a, _ in edges)
    got = {r.k: r for r in _q("graph_rich_club", spark, sf_dir).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    for k, r in got.items():
        hubs = {v for v, d in deg.items() if d > k}
        e_dir = sum(1 for a, b in edges if a in hubs and b in hubs)
        assert r.n_hubs == len(hubs)
        assert r.edges_within == e_dir // 2
        if len(hubs) < 2:
            assert r.rich_club_phi is None
        else:
            assert math.isclose(
                r.rich_club_phi, e_dir / (len(hubs) * (len(hubs) - 1)),
                rel_tol=1e-12,
            )
            assert 0 <= r.rich_club_phi <= 1


def test_heaps_fit_matches_python(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT doc_id, text FROM documents ORDER BY doc_id")
    seen = set()
    n = v = 0
    pts = []
    for _, text in rows:
        ws = [w for w in text.strip().split() if w]
        n += len(ws)
        for w in ws:
            if w not in seen:
                seen.add(w)
                v += 1
        if n > 0 and v > 0:
            pts.append((_rha(math.log(n) * 1e3), _rha(math.log(v) * 1e3)))
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    kk = _rha(math.exp((sy - sx * beta) / k / 1e3) * 1e6) / 1e6
    r = _q("text_heaps_law_fit", spark, sf_dir).collect()[0]
    assert r.n_points == k
    assert math.isclose(r.heaps_beta, beta, rel_tol=1e-12)
    assert math.isclose(r.heaps_k, kk, rel_tol=1e-9)
    # growth exponent must be sub-linear on a closed vocabulary
    assert 0 < r.heaps_beta < 1
