"""Independent Python/numpy recomputes for the round-8 driver-window
queries that had no pytest of their own (the r7 lesson: a dialect-SHARED
oracle cannot catch semantic bugs — both engines agree on the same wrong
SQL — so every window query needs a third, engine-independent
recomputation)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _h13(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _unit(s: str) -> float:
    return _h13(s) / 4503599627370496.0  # / 2^52


def _round_away(x: float) -> int:
    # SQL round(): half away from zero (Python round() is half-even)
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cosine(a, b) -> float:
    na = math.sqrt(_seq_dot(a, a))
    nb = math.sqrt(_seq_dot(b, b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return _seq_dot(a, b) / (na * nb)


def test_benford_prices_matches_recompute(spark, sf_dir):
    cents = [
        int(_round_away(r[0] * 100.0))
        for r in duckdb.sql(
            f"SELECT o_totalprice FROM '{sf_dir}/orders.parquet' WHERE o_totalprice > 0"
        ).fetchall()
    ]
    digs = Counter(int(str(c)[0]) for c in cents)
    n = sum(digs.values())
    got = {r.digit: r for r in _q("audit_benford_prices", spark, sf_dir).collect()}
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        c = digs.get(d, 0)
        assert got[d].n_obs == c
        assert got[d].obs_micro == _round_away(1000000.0 * c / n)
        assert got[d].absdev_micro == abs(got[d].obs_micro - got[d].exp_micro)


def test_split_balance_chi2_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, lang FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    cells = Counter(
        (lang, "train" if _h13(f"split42|{doc_id}") % 1000 < 900 else "heldout")
        for doc_id, lang in rows
    )
    n_x = Counter()
    n_y = Counter()
    for (lang, split), c in cells.items():
        n_x[lang] += c
        n_y[split] += c
    n = sum(cells.values())
    got = {(r.lang, r.split): r for r in _q("split_balance_chi2", spark, sf_dir).collect()}
    assert set(got) == set(cells)
    for (lang, split), c in cells.items():
        exp = float(n_x[lang]) * float(n_y[split]) / float(n)
        nano = _round_away((c - exp) * (c - exp) / exp * 1000000000)
        assert got[(lang, split)].n_xy == c
        # ln-free double chain — engines and Python agree to the last ulp
        # on these magnitudes, but tolerate the rounding boundary
        assert abs(got[(lang, split)].chi2_contrib_nano - nano) <= 1


def test_feature_mi_lang_source_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT lang, source FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    cells = Counter(rows)
    n_x = Counter()
    n_y = Counter()
    for (lang, source), c in cells.items():
        n_x[lang] += c
        n_y[source] += c
    n = sum(cells.values())
    got = {
        (r.lang, r.source): r
        for r in _q("feature_mi_lang_source", spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for (lang, source), c in cells.items():
        contrib = (c / n) * math.log((c * n) / (n_x[lang] * n_y[source]))
        nano = _round_away(contrib * 1000000000)
        assert got[(lang, source)].n_xy == c
        # ln() may differ in the last ulp between libm builds → ±1 nano
        assert abs(got[(lang, source)].mi_contrib_nano - nano) <= 1


def test_events_holt_linear_matches_recompute(spark, sf_dir):
    ev = duckdb.sql(
        f"SELECT user_id, ts, event_id, value FROM '{sf_dir}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    series = defaultdict(list)
    for user_id, ts, event_id, value in ev:
        series[user_id].append((event_id, float(value)))
    expect = {}
    for user_id, vals in series.items():
        for i, (event_id, _) in enumerate(vals):
            win = [v for _, v in vals[max(0, i - 19) : i + 1]]
            lvl, trend = win[0], 0.0
            for x in win[1:]:
                new_lvl = 0.25 * x + 0.75 * (lvl + trend)
                trend = 0.1 * (new_lvl - lvl) + 0.9 * trend
                lvl = new_lvl
            expect[event_id] = (lvl, trend)
    got = _q("events_holt_linear", spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        lvl, trend = expect[r.event_id]
        # identical fold order → bit-equal doubles
        assert r.level20 == lvl and r.trend20 == trend
        assert r.forecast_next == lvl + trend


def _kmv_sketch(keys, k=64):
    us = sorted(_unit(f"{ck}") for ck in keys)
    theta = 1.0 if len(us) < k else us[k - 1]
    return us[:k], theta


def test_kmv_diff_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT o_custkey, o_orderstatus FROM '{sf_dir}/orders.parquet' "
        "WHERE o_orderstatus IN ('F', 'O')"
    ).fetchall()
    a = {ck for ck, s in rows if s == "F"}
    b = {ck for ck, s in rows if s == "O"}
    ka, tha = _kmv_sketch(a)
    kb, thb = _kmv_sketch(b)
    theta = min(tha, thb)
    kb_set = set(kb)
    c = sum(1 for u in ka if u < theta and u not in kb_set)
    r = _q("approx_distinct_diff_kmv", spark, sf_dir).collect()[0]
    assert r.only_a_below_theta == c
    assert r.theta == theta
    assert r.est_diff == c / theta
    assert r.exact_diff == len(a - b)


def test_kmv_cube_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT DISTINCT date_trunc('month', o_orderdate) AS m, o_custkey "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    per_month = defaultdict(set)
    for m, ck in rows:
        per_month[m].add(ck)

    def in_range(m):
        return m.year == 1996

    k = 64
    merged_us = set()
    for m, keys in per_month.items():
        if in_range(m):
            merged_us.update(_kmv_sketch(keys, k)[0])
    mu = sorted(merged_us)
    est_merged = float(len(mu)) if len(mu) < k else (k - 1) / mu[k - 1]
    direct_keys = set().union(
        *(keys for m, keys in per_month.items() if in_range(m))
    )
    du = sorted(_unit(f"{ck}") for ck in direct_keys)
    est_direct = float(len(du)) if len(du) < k else (k - 1) / du[k - 1]
    r = _q("approx_distinct_kmv_cube", spark, sf_dir).collect()[0]
    assert r.est_merged == est_merged
    assert r.est_direct == est_direct
    # the global k-minima over the range are inside the union of the
    # months' k-minima — the merge must be exactly lossless
    assert est_merged == est_direct
    assert r.merge_is_lossless == 1
    assert r.exact_customers == len(direct_keys)


def test_ann_rp_recall_matches_recompute(spark, sf_dir):
    from rag_application_with_vectordb_spark.plans.ann_queries import (
        _RP_M,
        _rp_sign_matrix,
    )

    emb = {
        r[0]: [float(x) for x in r[1]]
        for r in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    }
    dim = len(next(iter(emb.values())))
    mat = _rp_sign_matrix(_RP_M, dim)
    red = {v: [_seq_dot(e, row) for row in mat] for v, e in emb.items()}

    def top5(space, q):
        scored = sorted(
            ((-_cosine(vec, q), vid) for vid, vec in space.items())
        )[:5]
        return {vid for _, vid in scored}

    expect = {}
    for qid in range(10):
        exact = top5(emb, emb[qid])
        approx = top5(red, red[qid])
        expect[qid] = len(exact & approx) / 5.0
    got = {r.query_id: r.recall_at_5 for r in _q("ann_rp_recall", spark, sf_dir).collect()}
    assert got == expect
    # JL with 16 dims must beat chance on a 500-vector corpus
    assert sum(expect.values()) / len(expect) > 0.2


def test_incremental_join_merge_matches_direct_recompute(spark, sf_dir):
    # the oracle already proves merge == full recompute cross-engine;
    # this guards the Spark side alone (and the retraction algebra) so a
    # same-wrong-SQL drift can't slip through a dialect-shared oracle
    rows = duckdb.sql(
        f"""
        WITH cnew AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 31 = 0 THEN 'SEG_MOVED'
                      ELSE c_mktsegment END AS segment
          FROM '{sf_dir}/customer.parquet'
        )
        SELECT segment, COUNT(*) AS cnt,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM '{sf_dir}/orders.parquet' o JOIN cnew c ON o.o_custkey = c.c_custkey
        GROUP BY segment
        """
    ).fetchall()
    expect = {seg: (cnt, cents) for seg, cnt, cents in rows}
    got = {
        r.segment: (r.order_cnt, r.revenue_cents)
        for r in _q("incremental_join_merge", spark, sf_dir).collect()
    }
    assert got == expect
    assert "SEG_MOVED" in got  # the dimension mutation actually moved rows
