"""Independent Python recomputes for dialect-SHARED SQL queries.

These queries run (modulo dialect splits) the SAME SQL text on Spark
and DuckDB, so the oracle hash proves engine parity but NOT semantics —
both engines agree on the same wrong SQL (the r7 stats_hill_tail_index
lesson). Each test here recomputes the statistic from the raw parquet
with plain Python and compares against the registered query."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _round_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def test_spend_gini_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT o_custkey, o_totalprice FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    spend = Counter()
    for ck, p in rows:
        spend[ck] += _round_away(p * 100)  # TPC-H prices are exact cents
    ranked = sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    total = sum(c for _, c in ranked)
    wsum = sum((2 * i - n - 1) * c for i, (_, c) in enumerate(ranked, start=1))
    r = _q("spend_gini", spark, sf_dir).collect()[0]
    assert r.n_customers == n
    assert r.total_spend == total / 100
    assert math.isclose(r.gini, wsum / (n * total), rel_tol=1e-12)
    assert 0.0 <= r.gini < 1.0


def _interp_median(xs: list[float]) -> float:
    xs = sorted(xs)
    h = 0.5 * (len(xs) - 1)
    lo, hi = xs[math.floor(h)], xs[math.ceil(h)]
    return lo + (h - math.floor(h)) * (hi - lo)


def test_robust_outliers_mad_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT l_returnflag, l_extendedprice FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for flag, x in rows:
        groups[flag].append(float(x))
    got = {r.l_returnflag: r for r in _q("robust_outliers_mad", spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for flag, xs in groups.items():
        med = _interp_median(xs)
        mad = _interp_median([abs(x - med) for x in xs])
        n_out = sum(1 for x in xs if abs(0.6745 * (x - med) / mad) > 3.5)
        r = got[flag]
        assert r.n == len(xs)
        assert math.isclose(r.median_price, med, rel_tol=1e-12)
        assert math.isclose(r.mad, mad, rel_tol=1e-12)
        assert r.n_outliers == n_out


def test_events_markov_transitions_matches_recompute(spark, sf_dir):
    ev = duckdb.sql(
        f"SELECT user_id, event_type FROM '{sf_dir}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs = defaultdict(list)
    for u, t in ev:
        seqs[u].append(t)
    cnt = Counter()
    for s in seqs.values():
        for a, b in zip(s, s[1:]):
            cnt[(a, b)] += 1
    n_from = Counter()
    for (a, _), c in cnt.items():
        n_from[a] += c
    got = {(r.from_type, r.to_type): r for r in _q("events_markov_transitions", spark, sf_dir).collect()}
    assert set(got) == set(cnt)
    for (a, b), c in cnt.items():
        assert got[(a, b)].n == c
        assert got[(a, b)].p == c / n_from[a]
    # each row is a probability; rows per from_type sum to 1
    for a in n_from:
        assert math.isclose(
            sum(r.p for (f, _), r in got.items() if f == a), 1.0, rel_tol=1e-12
        )


def _week_start(d):
    return (d - timedelta(days=d.weekday())).date() if hasattr(d, "weekday") else d


def test_retention_cohorts_matches_recompute(spark, sf_dir):
    ev = duckdb.sql(
        f"SELECT user_id, ts FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    first = {}
    weeks = defaultdict(set)
    for u, ts in ev:
        if u not in first or ts < first[u]:
            first[u] = ts
        weeks[u].add(_week_start(ts))
    matrix = Counter()
    for u, ws in weeks.items():
        cohort = _week_start(first[u])
        for w in ws:
            matrix[(cohort, (w - cohort).days // 7)] += 1
    got = {
        (r.cohort_week, r.week_offset): r.active_users
        for r in _q("retention_cohorts", spark, sf_dir).collect()
    }
    assert got == dict(matrix)
    # cohort sizes: offset-0 row equals the number of users first seen
    # that week (every user is active in their own cohort week)
    sizes = Counter(_week_start(ts) for ts in first.values())
    for cw, size in sizes.items():
        assert got[(cw, 0)] == size


def test_events_forward_fill_matches_recompute(spark, sf_dir):
    ev = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type, value FROM "
        f"'{sf_dir}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    expect = {}
    last = {}
    for u, ts, eid, et, v in ev:
        if et == "purchase":
            last[u] = float(v)
        expect[eid] = last.get(u)
    got = {r.event_id: r.last_purchase_value for r in _q("events_forward_fill", spark, sf_dir).collect()}
    assert got == expect


def test_tfidf_top_terms_matches_recompute(spark, sf_dir):
    docs = {
        r[0]: [w for w in r[1].strip().split() if w]
        for r in duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    }
    df = Counter()
    for ws in docs.values():
        df.update(set(ws))
    n_docs = sum(1 for ws in docs.values() if ws)
    expect = {}
    for d, ws in docs.items():
        if not ws:
            continue
        tf = Counter(ws)
        scored = [
            (w, _round_away(c * math.log((n_docs + 1.0) / (df[w] + 1.0)) * 1e6) / 1e6)
            for w, c in tf.items()
        ]
        scored.sort(key=lambda t: (-t[1], t[0]))
        expect[d] = scored[:3]
    got = defaultdict(list)
    for r in _q("text_tfidf_top_terms", spark, sf_dir).collect():
        got[r.doc_id].append((r.word, r.tfidf))
    assert set(got) == set(expect)
    for d, top in expect.items():
        got_sorted = sorted(got[d], key=lambda t: (-t[1], t[0]))
        assert [w for w, _ in got_sorted] == [w for w, _ in top]
        for (_, gs), (_, es) in zip(got_sorted, top):
            assert math.isclose(gs, es, abs_tol=2e-6)


def _micros(ts) -> int:
    # exact integer microseconds since the epoch (naive timestamps)
    from datetime import datetime

    return int((ts - datetime(1970, 1, 1)).total_seconds() * 1e6) if False else (
        (ts - datetime(1970, 1, 1)).days * 86400_000_000
        + (ts - datetime(1970, 1, 1)).seconds * 1_000_000
        + (ts - datetime(1970, 1, 1)).microseconds
    )


def test_events_session_stats_matches_recompute(spark, sf_dir):
    ev = duckdb.sql(
        f"SELECT user_id, ts, event_id FROM '{sf_dir}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    per_user = defaultdict(list)
    for u, ts, eid in ev:
        per_user[u].append(ts)
    got = {r.user_id: r for r in _q("events_session_stats", spark, sf_dir).collect()}
    assert set(got) == set(per_user)
    for u, tss in per_user.items():
        sessions = []
        cur = [tss[0]]
        for prev, ts in zip(tss, tss[1:]):
            if (ts - prev).total_seconds() > 4 * 3600:
                sessions.append(cur)
                cur = []
            cur.append(ts)
        sessions.append(cur)
        durs = [_micros(max(s)) - _micros(min(s)) for s in sessions]
        r = got[u]
        assert r.n_sessions == len(sessions)
        assert r.events_per_session == sum(len(s) for s in sessions) / len(sessions)
        assert math.isclose(
            r.avg_session_sec, sum(durs) / (len(sessions) * 1e6), rel_tol=1e-12
        )
        assert r.max_session_sec == max(durs) / 1e6
        assert r.max_session_events == max(len(s) for s in sessions)


def test_window_session_gap_rank_matches_recompute(spark, sf_dir):
    ev = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM '{sf_dir}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    per_user = defaultdict(list)
    for u, ts, eid, et in ev:
        per_user[u].append((ts, eid, et))
    expect = {}
    for u, rows in per_user.items():
        gaps = [
            (_micros(ts) - _micros(pts), eid, et)
            for (pts, _, _), (ts, eid, et) in zip(rows, rows[1:])
        ]
        gaps.sort(key=lambda g: (-g[0], g[1]))
        for rank, (gap_us, eid, et) in enumerate(gaps[:3], start=1):
            expect[(u, rank)] = (gap_us / 1e6, eid, et)
    got = {
        (r.user_id, r.gap_rank): (r.gap_sec, r.event_id, r.event_type)
        for r in _q("window_session_gap_rank", spark, sf_dir).collect()
    }
    assert got == expect


def test_docs_dataset_card_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT lang, source, n_chars, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def stats(sel):
        chars = [nc for _, _, nc, _ in sel]
        toks = [len(t) - len(t.replace(" ", "")) + 1 for _, _, _, t in sel]
        return (
            len(sel),
            sum(chars),
            sum(toks),
            min(chars),
            max(chars),
            sum(chars) / len(sel),
            len({t for _, _, _, t in sel}),
        )

    expect = {}
    for lang in {r[0] for r in rows}:
        sub = [r for r in rows if r[0] == lang]
        expect[(lang, None)] = stats(sub)
        for source in {r[1] for r in sub}:
            expect[(lang, source)] = stats([r for r in sub if r[1] == source])
    expect[(None, None)] = stats(rows)
    got = {
        (r.lang, r.source): (
            r.n_docs,
            r.total_chars,
            r.total_tokens,
            r.min_chars,
            r.max_chars,
            r.avg_chars,
            r.n_unique_texts,
        )
        for r in _q("docs_dataset_card", spark, sf_dir).collect()
    }
    assert got == expect


def _baskets(sf_dir):
    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    b = defaultdict(set)
    for ok, pk in rows:
        b[ok].add(pk)
    return b


def test_copurchase_edges_and_assoc_rules_match_recompute(spark, sf_dir):
    baskets = _baskets(sf_dir)
    undirected = Counter()
    directed = Counter()
    item = Counter()
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        sp = sorted(parts)
        for i, a in enumerate(sp):
            for b in sp[i + 1 :]:
                undirected[(a, b)] += 1
                directed[(a, b)] += 1
                directed[(b, a)] += 1
    n_baskets = len(baskets)

    edges = {
        (r.part_a, r.part_b): r.n_orders
        for r in _q("graph_copurchase_edges", spark, sf_dir).collect()
    }
    assert edges == {k: c for k, c in undirected.items() if c >= 2}

    rules = {(r.ante, r.cons): r for r in _q("assoc_rules_parts", spark, sf_dir).collect()}
    expect_rules = {k: c for k, c in directed.items() if c >= 2}
    assert set(rules) == set(expect_rules)
    for (a, c), n_pair in expect_rules.items():
        r = rules[(a, c)]
        assert r.n_pair == n_pair
        assert r.support == n_pair / n_baskets
        assert r.confidence == n_pair / item[a]
        assert math.isclose(
            r.lift, (n_pair / item[a]) / (item[c] / n_baskets), rel_tol=1e-12
        )


def test_zorder_cells_match_recompute(spark, sf_dir):
    from datetime import datetime

    rows = duckdb.sql(
        f"SELECT o_totalprice, o_orderdate FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    cells = defaultdict(lambda: [0, 256, -1, 256, -1])
    for price, od in rows:
        px = min(int(math.floor(price / 2000)), 255)
        dx = min(int((od - datetime(1995, 1, 1)).days // 10), 255)
        z = 0
        for i in range(8):
            z += ((px >> i) & 1) << (2 * i + 1)
            z += ((dx >> i) & 1) << (2 * i)
        c = cells[z // 4096]
        c[0] += 1
        c[1], c[2] = min(c[1], px), max(c[2], px)
        c[3], c[4] = min(c[3], dx), max(c[4], dx)
    got = {r.zcell: r for r in _q("zorder_orders_cells", spark, sf_dir).collect()}
    assert set(got) == set(cells)
    for z, (n, mnp, mxp, mnd, mxd) in cells.items():
        r = got[z]
        assert (r.n_orders, r.min_px, r.max_px, r.min_dx, r.max_dx) == (
            n, mnp, mxp, mnd, mxd,
        )
        # the locality property z-ordering exists for: zcell keeps the
        # top 2 bits of each dimension, so every cell is a tight 64x64
        # rectangle in (price-bucket x date-bucket) space
        assert mxp - mnp <= 63 and mxd - mnd <= 63


def test_feature_winsorize_prices_matches_recompute(spark, sf_dir):
    from decimal import Decimal

    rows = duckdb.sql(
        f"SELECT l_returnflag, l_extendedprice FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for flag, x in rows:
        groups[flag].append(float(x))
    got = {r.l_returnflag: r for r in _q("feature_winsorize_prices", spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for flag, xs in groups.items():
        xs.sort()
        n = len(xs)
        lo = xs[max(math.ceil(0.05 * n), 1) - 1]
        hi = xs[max(math.ceil(0.95 * n), 1) - 1]
        clipped = [min(max(x, lo), hi) for x in xs]
        mean = float(sum(Decimal(f"{x:.2f}") for x in clipped)) / n
        r = got[flag]
        assert r.n == n
        assert r.n_clipped_lo == sum(1 for x in xs if x < lo)
        assert r.n_clipped_hi == sum(1 for x in xs if x > hi)
        assert (r.lo_bound, r.hi_bound) == (lo, hi)
        assert math.isclose(r.mean_winsorized, mean, rel_tol=1e-12)


def test_window_distribution_funcs_match_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT c_custkey, c_nationkey, c_acctbal FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for ck, nk, bal in rows:
        groups[nk].append((float(bal), ck))
    got = {r.c_custkey: r for r in _q("window_distribution_funcs", spark, sf_dir).collect()}
    assert len(got) == len(rows)
    for nk, mem in groups.items():
        mem.sort()
        n = len(mem)
        richest = max(mem, key=lambda t: (t[0], -t[1]))[1]
        # ANSI ntile: first (n % 4) tiles get ceil(n/4) rows
        q, rem = divmod(n, 4)
        tile_of = []
        for t in range(1, 5):
            tile_of += [t] * (q + (1 if t <= rem else 0))
        for i, (bal, ck) in enumerate(mem):
            r = got[ck]
            assert r.c_nationkey == nk
            assert r.bal_quartile == tile_of[i]
            assert r.bal_pct_rank == (i / (n - 1) if n > 1 else 0.0)
            assert r.bal_cume_dist == (i + 1) / n
            assert r.richest_custkey == richest


def _cents(x: float) -> int:
    return _round_away(x * 100)  # fixture money is an exact 2-decimal grid


def test_agg_distinct_orders_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT o_orderstatus, o_custkey FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    custs = defaultdict(set)
    n = Counter()
    for s, ck in rows:
        custs[s].add(ck)
        n[s] += 1
    got = {r.o_orderstatus: r for r in _q("agg_distinct_orders", spark, sf_dir).collect()}
    assert {s: (r.n_customers, r.n_orders) for s, r in got.items()} == {
        s: (len(custs[s]), n[s]) for s in custs
    }


def test_agg_part_stats_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT p_brand, p_retailprice FROM '{sf_dir}/part.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for b, p in rows:
        groups[b].append(float(p))
    got = {r.p_brand: r for r in _q("agg_part_stats", spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for b, xs in groups.items():
        r = got[b]
        assert (r.n_parts, r.min_price, r.max_price) == (len(xs), min(xs), max(xs))
        assert math.isclose(
            r.avg_price, sum(_cents(x) for x in xs) / 100.0 / len(xs), rel_tol=1e-12
        )


def test_rollup_and_cube_and_grouping_sets_match_recompute(spark, sf_dir):
    sup = duckdb.sql(
        f"""SELECT r_name, n_name, s_acctbal
        FROM '{sf_dir}/supplier.parquet' s
        JOIN '{sf_dir}/nation.parquet' n ON s_nationkey = n_nationkey
        JOIN '{sf_dir}/region.parquet' r ON n_regionkey = r_regionkey"""
    ).fetchall()

    def agg(sel):
        return (len(sel), float(sum(_cents(b) for _, _, b in sel)) / 100.0)

    expect = {}
    for rn in {x[0] for x in sup}:
        sub = [x for x in sup if x[0] == rn]
        expect[(rn, None)] = agg(sub)
        for nn in {x[1] for x in sub}:
            expect[(rn, nn)] = agg([x for x in sub if x[1] == nn])
    expect[(None, None)] = agg(sup)
    got = {
        (r.r_name, r.n_name): (r.n_suppliers, r.total_bal)
        for r in _q("rollup_supplier_balance", spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (n, tot) in expect.items():
        assert got[k][0] == n and math.isclose(got[k][1], tot, rel_tol=1e-12)

    orders = duckdb.sql(
        f"SELECT o_orderstatus, o_orderpriority, o_totalprice FROM '{sf_dir}/orders.parquet'"
    ).fetchall()

    def oagg(sel):
        return (len(sel), float(sum(_cents(p) for _, _, p in sel)) / 100.0)

    cube = {}
    for s in {None} | {x[0] for x in orders}:
        for p in {None} | {x[1] for x in orders}:
            sel = [
                x
                for x in orders
                if (s is None or x[0] == s) and (p is None or x[1] == p)
            ]
            if sel:
                cube[(s, p)] = oagg(sel)
    got_cube = {
        (r.o_orderstatus, r.o_orderpriority): (r.n, r.total_price)
        for r in _q("cube_order_counts", spark, sf_dir).collect()
    }
    assert set(got_cube) == set(cube)
    for k, (n, tot) in cube.items():
        assert got_cube[k][0] == n and math.isclose(got_cube[k][1], tot, rel_tol=1e-12)

    # grouping-sets variant: (status, priority), (status), () with
    # grouping() markers distinguishing "aggregated away" from NULL data
    gs = {
        k: v
        for k, v in cube.items()
        if k == (None, None) or k[0] is not None
    }
    got_gs = {}
    for r in _q("grouping_sets_order_stats", spark, sf_dir).collect():
        assert r.g_status == (1 if r.o_orderstatus is None else 0)
        assert r.g_priority == (1 if r.o_orderpriority is None else 0)
        got_gs[(r.o_orderstatus, r.o_orderpriority)] = (r.n, r.total_price)
    assert set(got_gs) == set(gs)
    for k, (n, tot) in gs.items():
        assert got_gs[k][0] == n and math.isclose(got_gs[k][1], tot, rel_tol=1e-12)


def test_window_balance_rank_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT c_custkey, c_nationkey, c_acctbal FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for ck, nk, bal in rows:
        groups[nk].append((float(bal), ck))
    got = {r.c_custkey: r for r in _q("window_balance_rank", spark, sf_dir).collect()}
    assert len(got) == len(rows)
    for nk, mem in groups.items():
        mem.sort(key=lambda t: (-t[0], t[1]))
        for i, (_, ck) in enumerate(mem, start=1):
            # the order key includes c_custkey, so there are no ties:
            # rank == dense_rank == position
            assert got[ck].bal_rank == i
            assert got[ck].bal_dense_rank == i


def test_window_running_spend_matches_recompute(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice "
        f"FROM '{sf_dir}/orders.parquet' ORDER BY o_custkey, o_orderdate, o_orderkey"
    ).fetchall()
    got = {r.o_orderkey: r for r in _q("window_running_spend", spark, sf_dir).collect()}
    assert len(got) == len(rows)
    per_cust = defaultdict(list)
    for ck, ok, od, p in rows:
        per_cust[ck].append((ok, _cents(p)))
    for ck, seq in per_cust.items():
        run = 0
        for i, (ok, cents) in enumerate(seq):
            run += cents
            r = got[ok]
            assert math.isclose(r.running_spend, run / 100.0, rel_tol=1e-12)
            assert r.prev_orderkey == (seq[i - 1][0] if i > 0 else None)
            assert r.next_orderkey == (seq[i + 1][0] if i + 1 < len(seq) else None)


def test_set_ops_match_recompute(spark, sf_dir):
    cn = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT c_nationkey FROM '{sf_dir}/customer.parquet'"
        ).fetchall()
    }
    sn = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT s_nationkey FROM '{sf_dir}/supplier.parquet'"
        ).fetchall()
    }
    sneg = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT s_nationkey FROM '{sf_dir}/supplier.parquet' WHERE s_acctbal < 0"
        ).fetchall()
    }
    both = {r[0] for r in _q("set_nations_customers_and_suppliers", spark, sf_dir).collect()}
    assert both == (cn & sn)
    only = {r[0] for r in _q("set_nations_customers_only", spark, sf_dir).collect()}
    assert only == (cn - sneg)
    n_c = duckdb.sql(f"SELECT COUNT(*) FROM '{sf_dir}/customer.parquet'").fetchone()[0]
    n_s = duckdb.sql(f"SELECT COUNT(*) FROM '{sf_dir}/supplier.parquet'").fetchone()[0]
    kinds = Counter(r.kind for r in _q("set_union_all_keys", spark, sf_dir).collect())
    assert kinds == {"customer": n_c, "supplier": n_s}


def test_subquery_and_having_match_recompute(spark, sf_dir):
    bals = duckdb.sql(
        f"SELECT c_custkey, c_acctbal FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    thresh = float(sum(_cents(b) for _, b in bals)) / 100.0 / len(bals)
    expect = {ck for ck, b in bals if float(b) > thresh}
    got = {r.c_custkey for r in _q("subquery_above_avg_balance", spark, sf_dir).collect()}
    assert got == expect
    assert 0 < len(got) < len(bals)

    qty = duckdb.sql(
        f"SELECT l_orderkey, SUM(CAST(round(l_quantity*100) AS BIGINT)) "
        f"FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"
    ).fetchall()
    big = {ok for ok, q in qty if q > 15000}
    got_big = {r.o_orderkey for r in _q("having_big_orders", spark, sf_dir).collect()}
    assert got_big == big
