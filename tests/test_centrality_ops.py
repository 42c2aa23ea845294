"""Independent recomputes for the batch-4 round-7 additions: Brandes
sampled betweenness (grid-exact), Qini uplift curve, and the
nearest-centroid classifier."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all
from rag_application_with_vectordb_spark.plans.stats_queries import (
    _BC_GRID,
    _BC_ROUNDS,
    _BC_SOURCES,
)


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _hex13(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _item_edges(sf_dir):
    """Mirror of _lpa_edges: directed top-3 per src over the full pair
    relation, then symmetrize selected pairs."""
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
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    return adj


def test_betweenness_matches_python_brandes(spark, sf_dir):
    adj = _item_edges(sf_dir)
    sources = sorted(adj)[:_BC_SOURCES]
    bc = Counter()
    visited_any = set()
    max_dist = 0
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        frontier = [s]
        d = 0
        while frontier and d < _BC_ROUNDS:
            d += 1
            nxt = defaultdict(int)
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        nxt[v] += sigma[u]
            for v in nxt:
                dist[v] = d
            # second pass: sigma(v) = sum over preds at d-1
            for v in nxt:
                sigma[v] = sum(sigma[u] for u in adj[v] if dist.get(u) == d - 1)
            frontier = sorted(nxt)
            if frontier:
                levels.append(frontier)
                max_dist = max(max_dist, d)
        delta = {v: 0 for v in dist}
        for lev in range(len(levels) - 1, 0, -1):
            for v in levels[lev - 1]:
                tot = 0
                for w in adj[v]:
                    if dist.get(w) == lev:
                        tot += (sigma[v] * (_BC_GRID + delta[w])) // sigma[w]
                delta[v] = tot
        for v in dist:
            if v != s:
                bc[v] += delta[v]
                visited_any.add(v)
        visited_any.update(x for x in dist if x != s)
    got = {r.node: r for r in _q("graph_betweenness_4src", spark, sf_dir).collect()}
    assert set(got) == visited_any
    for v, r in got.items():
        assert r.bc_nano == bc.get(v, 0), v
        assert math.isclose(r.betweenness, bc.get(v, 0) / _BC_GRID, rel_tol=1e-12)
    # forward fixpoint: the BFS exhausted before the unroll limit
    assert max_dist < _BC_ROUNDS
    # some node must actually lie on shortest paths
    assert any(x > 0 for x in bc.values())


# --- Qini -----------------------------------------------------------------------


def test_qini_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT user_id, CAST(COUNT(*) AS BIGINT),
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                                THEN CAST(round(value*100) AS BIGINT)
                                ELSE 0 END) AS BIGINT)
           FROM events GROUP BY user_id""",
    )
    hist = defaultdict(lambda: [0, 0, 0, 0])  # score -> nt, nc, st, sc
    for u, score, cents in rows:
        is_t = _hex13(f"ab42|{u}") % 2 == 0
        h = hist[score]
        if is_t:
            h[0] += 1
            h[2] += cents
        else:
            h[1] += 1
            h[3] += cents
    nn = sum(h[0] + h[1] for h in hist.values())
    prefix = []
    cn = cnt = cnc = cst = csc = 0
    for sc_v in sorted(hist, reverse=True):
        nt, nc, st, sc_ = hist[sc_v]
        cn += nt + nc
        cnt += nt
        cnc += nc
        cst += st
        csc += sc_
        prefix.append((cn, cnt, cnc, cst, csc))
    got = {r.decile: r for r in _q("eval_qini_uplift", spark, sf_dir).collect()}
    assert set(got) == set(range(1, 11))
    for k in range(1, 11):
        cn, cnt, cnc, cst, csc = next(t for t in prefix if t[0] * 10 >= k * nn)
        r = got[k]
        assert (r.n_targeted, r.n_treat, r.n_ctrl) == (cn, cnt, cnc)
        assert (r.treat_cents, r.ctrl_cents) == (cst, csc)
        if cnc == 0:
            assert r.qini_dollars is None
        else:
            assert math.isclose(
                r.qini_dollars, (cst - csc * cnt / cnc) / 100.0, rel_tol=1e-12
            )


# --- nearest centroid ------------------------------------------------------------


def test_nearest_centroid_matches_python(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT vec_id, label, embedding FROM embeddings")
    train, test = [], []
    for vid, label, emb in rows:
        xm = [round(e * 1_000_000) for e in emb]
        (train if _hex13(f"nc42|{vid}") % 1000 < 800 else test).append(
            (vid, label, xm)
        )
    sums = defaultdict(lambda: None)
    counts = Counter()
    for _, label, xm in train:
        counts[label] += 1
        if sums[label] is None:
            sums[label] = list(xm)
        else:
            for j, x in enumerate(xm):
                sums[label][j] += x
    cents = {
        lab: [int(_round_half_away(s / counts[lab])) for s in vec]
        for lab, vec in sums.items()
    }
    cm = Counter()
    for _, label, xm in test:
        best = min(
            cents,
            key=lambda lab: (
                sum((x - c) ** 2 for x, c in zip(xm, cents[lab])),
                lab,
            ),
        )
        cm[(label, best)] += 1
    got = {
        (r.label_true, r.label_pred): r.n
        for r in _q("classify_nearest_centroid", spark, sf_dir).collect()
    }
    assert got == dict(cm)


def test_nearest_centroid_learns_at_sf1(spark):
    # the small fixtures' embeddings are noise-dominated (the documented
    # PQ finding: label SNR only emerges at scale) — at sf1.0 the
    # centroids must separate the labels almost perfectly
    import os

    sf1 = "/root/repo/testdata_local/sf1.0"
    if not os.path.isdir(sf1):
        import pytest

        pytest.skip("sf1.0 local fixture not generated")
    rows = _q("classify_nearest_centroid", spark, sf1).collect()
    total = sum(r.n for r in rows)
    diag = sum(r.n for r in rows if r.label_true == r.label_pred)
    n_labels = len({r.label_true for r in rows})
    assert diag / total > 0.9 and n_labels >= 5


def _round_half_away(x: float) -> float:
    import math as _m

    f = _m.floor(x)
    return f + 1 if x - f >= 0.5 else f
