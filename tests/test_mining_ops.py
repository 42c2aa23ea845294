"""Independent recomputes for the mining/model-fitting batch
(plans/mining_queries.py + graph_modularity + eval_cohens_kappa):
each test rebuilds the expected answer from the raw fixture with plain
Python/duckdb — no shared SQL with the queries under test."""

from __future__ import annotations

import itertools
import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("lineitem", "documents", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


# --- frequent 3-itemsets --------------------------------------------------------


def test_freq_itemsets_match_bruteforce(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")
    baskets = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    support = Counter()
    for items in baskets.values():
        for tri in itertools.combinations(sorted(items), 3):
            support[tri] += 1
    expect = {t: s for t, s in support.items() if s >= 2}
    got = {
        (r.item_a, r.item_b, r.item_c): r.support
        for r in _q("freq_itemsets_3", spark, sf_dir).collect()
    }
    assert got == expect
    assert got  # non-degenerate at sf0.001 (94 triples)


def test_freq_itemsets_triples_are_sorted_and_supported(spark, sf_dir):
    for r in _q("freq_itemsets_3", spark, sf_dir).collect():
        assert r.item_a < r.item_b < r.item_c
        assert r.support >= 2


# --- decision stump -------------------------------------------------------------


def test_tree_split_matches_python_exhaustive(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT n_chars, lang FROM documents")
    hist = Counter()
    pos = Counter()
    for v, lang in rows:
        hist[v] += 1
        pos[v] += 1 if lang == "en" else 0
    nn, pp = sum(hist.values()), sum(pos.values())
    cand = []
    nl = pl = 0
    for v in sorted(hist):
        nl += hist[v]
        pl += pos[v]
        if nl == nn:
            continue
        nr, pr = nn - nl, pp - pl
        gnum = nr * (nl * nl - pl * pl - (nl - pl) ** 2) + nl * (
            nr * nr - pr * pr - (nr - pr) ** 2
        )
        cand.append((gnum / (nn * nl * nr), v, nl, nr, pl, pr))
    cand.sort()
    expect = cand[:10]
    got = [
        (r.gini, r.threshold, r.n_left, r.n_right, r.pos_left, r.pos_right)
        for r in _q("tree_split_gini", spark, sf_dir)
        .orderBy("gini", "threshold")
        .collect()
    ]
    assert got == expect
    # the best split must actually beat the parent's impurity
    parent = 1.0 - (pp / nn) ** 2 - ((nn - pp) / nn) ** 2
    assert expect[0][0] < parent


# --- Yule-Walker AR(2) ----------------------------------------------------------


def test_ar2_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT date_trunc('day', ts) AS day,
                  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS c
           FROM events WHERE event_type = 'purchase' GROUP BY 1""",
    )
    series = {day: c // 100 for day, c in rows}  # whole dollars, truncated
    n = len(series)
    s = sum(series.values())

    def gamma(k):
        tot = 0
        for day, x in series.items():
            import datetime as dt

            nxt = day + dt.timedelta(days=k)
            if nxt in series:
                tot += (n * x - s) * (n * series[nxt] - s)
        return tot

    g0, g1, g2 = gamma(0), gamma(1), gamma(2)
    r1, r2 = g1 / g0, g2 / g0
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    row = _q("stats_ar2_yule_walker", spark, sf_dir).collect()[0]
    assert row.n_days == n
    assert math.isclose(row.r1, r1, rel_tol=1e-12)
    assert math.isclose(row.r2, r2, rel_tol=1e-12)
    assert math.isclose(row.phi1, phi1, rel_tol=1e-12)
    assert math.isclose(row.phi2, phi2, rel_tol=1e-12)
    # stationarity of the fitted model (sanity, not a tautology):
    assert abs(row.phi2) < 1 and row.phi2 + row.phi1 < 1 and row.phi2 - row.phi1 < 1


# --- modularity -----------------------------------------------------------------


def test_modularity_consistent_with_lpa_partition(spark, sf_dir):
    labels = {
        r.node: r.community
        for r in _q("graph_lpa_communities", spark, sf_dir).collect()
    }
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
        for a, b in itertools.permutations(sorted(items), 2):
            co[(a, b)] += 1
    # top-3 sparsification per src over the DIRECTED pair relation, then
    # symmetrize each selected pair (mirrors _lpa_edges: ranked has both
    # orders; edge (a,b) exists iff b in top3(a) OR a in top3(b))
    per_src = defaultdict(list)
    for (a, b), c in co.items():
        per_src[a].append((c, b))
    edges = {}
    for a, lst in per_src.items():
        for c, b in sorted(lst, key=lambda t: (-t[0], t[1]))[:3]:
            edges[(a, b)] = c
            edges[(b, a)] = c
    m2 = sum(edges.values())
    intra = Counter()
    deg = Counter()
    for (a, b), c in edges.items():
        deg[labels[a]] += c
        if labels[a] == labels[b]:
            intra[labels[a]] += c
    got = {r.community: r for r in _q("graph_modularity", spark, sf_dir).collect()}
    assert set(got) == set(deg)
    for comm, r in got.items():
        assert r.intra_w == intra.get(comm, 0)
        assert r.deg_w == deg[comm]
        expect = (intra.get(comm, 0) * m2 - deg[comm] ** 2) / (m2 * m2)
        assert math.isclose(r.q_contrib, expect, rel_tol=1e-12)
    # the partition should beat the degree-preserving null model
    assert sum(r.q_contrib for r in got.values()) > 0


# --- Cohen's kappa --------------------------------------------------------------


def test_kappa_matches_confusion_recompute(spark, sf_dir):
    cm = _q("text_nb_confusion", spark, sf_dir).collect()
    n = sum(r.n for r in cm)
    diag = sum(r.n for r in cm if r.lang_true == r.lang_pred)
    rowm = Counter()
    colm = Counter()
    for r in cm:
        rowm[r.lang_true] += r.n
        colm[r.lang_pred] += r.n
    pe_num = sum(rowm[k] * colm.get(k, 0) for k in rowm)
    row = _q("eval_cohens_kappa", spark, sf_dir).collect()[0]
    assert (row.n_test, row.n_agree, row.pe_num) == (n, diag, pe_num)
    assert math.isclose(row.po, diag / n, rel_tol=1e-12)
    assert math.isclose(row.pe, pe_num / n**2, rel_tol=1e-12)
    assert math.isclose(
        row.kappa, (n * diag - pe_num) / (n * n - pe_num), rel_tol=1e-12
    )
    assert -1.0 <= row.kappa <= 1.0
