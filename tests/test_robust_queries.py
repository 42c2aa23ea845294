"""Isotonic calibration / Theil-Sen / path mining: semantics verified
against independent pure-python re-implementations (PAVA by actual
pooling, Theil-Sen by brute pairwise slopes, sessionization replayed
row by row)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _pava(pos, n):
    """Classic sequential pool-adjacent-violators on [sum_pos, weight,
    span] blocks — merges any adjacent pair whose rates violate
    monotonicity, then expands each pooled block back to its bins."""
    merged = []
    for p, w in zip(pos, n):
        merged.append([p, w, 1])
        while len(merged) > 1 and (
            merged[-2][0] / merged[-2][1] >= merged[-1][0] / merged[-1][1]
        ):
            p2, w2, s2 = merged.pop()
            merged[-1][0] += p2
            merged[-1][1] += w2
            merged[-1][2] += s2
    rates = []
    for p, w, s in merged:
        rates.extend([p / w] * s)
    return rates


def test_isotonic_equals_true_pava_and_is_monotone(spark, sf_dir):
    rows = sorted(_q("eval_calibration_isotonic", spark, sf_dir).collect(),
                  key=lambda r: r.bin)
    expect = _pava([r.n_pos for r in rows], [r.n_docs for r in rows])
    for r, e in zip(rows, expect):
        assert abs(r.iso_rate - e) < 1e-12
    # monotone non-decreasing by construction
    for a, b in zip(rows, rows[1:]):
        assert a.iso_rate <= b.iso_rate + 1e-15
    # pooling preserves the weighted mean (isotonic fit is a projection)
    tot_fit = sum(r.iso_rate * r.n_docs for r in rows)
    tot_obs = sum(r.n_pos for r in rows)
    assert abs(tot_fit - tot_obs) < 1e-6
    # and where the raw curve is already monotone, the fit equals it
    raw = [r.pos_rate for r in rows]
    if raw == sorted(raw):
        assert all(abs(r.iso_rate - r.pos_rate) < 1e-12 for r in rows)


def test_theil_sen_matches_brute_pairwise_median(spark, sf_dir):
    row = _q("regress_theil_sen", spark, sf_dir).collect()[0]
    daily = duckdb.sql(
        f"""SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT) AS y
            FROM '{sf_dir}/orders.parquet'
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    assert row.n_days == len(daily)
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(daily)
        for (x2, y2) in daily[i + 1:]
    )
    m = slopes[(len(slopes) + 1) // 2 - 1]  # lower median, 1-based floor((n+1)/2)
    assert row.slope_cents_per_day == m
    resid = sorted(y - m * x for x, y in daily)
    assert row.intercept_cents == resid[(len(resid) + 1) // 2 - 1]


def test_top_paths_match_replayed_sessionization(spark, sf_dir):
    rows = _q("events_top_paths", spark, sf_dir).collect()
    ev = duckdb.sql(
        f"""SELECT user_id, ts, event_id, event_type
            FROM '{sf_dir}/events.parquet' ORDER BY user_id, ts, event_id"""
    ).fetchall()
    by_user = defaultdict(list)
    for u, ts, eid, et in ev:
        by_user[u].append((ts, eid, et))
    paths = Counter()
    for u, evs in by_user.items():
        sess, last = [], None
        for ts, eid, et in evs:
            if last is not None and (ts - last).total_seconds() > 4 * 3600:
                paths[">".join(sess[:5])] += 1
                sess = []
            sess.append(et)
            last = ts
        if sess:
            paths[">".join(sess[:5])] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.path, r.n_sessions) for r in rows] == expect
    # every path is a '>'-joined prefix of at most 5 event types
    assert all(1 <= len(r.path.split(">")) <= 5 for r in rows)


def _bm25_micro(docs, terms_w):
    """Python recomputation of the PRF scorer: per-(doc,term) BM25
    contributions rounded to micro-integers, summed exactly."""
    import math

    toks = {d: t.strip().split() for d, t in docs.items()}
    dl = {d: len(w) for d, w in toks.items()}
    n, sum_dl = len(docs), sum(dl.values())
    avgdl = sum_dl / n
    tf = {d: Counter(w) for d, w in toks.items()}
    df = Counter()
    for d, c in tf.items():
        df.update(c.keys())
    scores = Counter()
    for d, c in tf.items():
        s = 0
        for t, wt in terms_w.items():
            if c[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            part = (c[t] * 2.2) / (c[t] + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
            s += int(round(1e6 * wt * idf * part))
        if s:
            scores[d] = s
    return scores, tf, df


def test_prf_terms_and_rescoring_match_python(spark, sf_dir):
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    orig = ("table", "join", "vector")
    s1, tf, df = _bm25_micro(docs, {t: 1.0 for t in orig})
    r = [d for d, _ in sorted(s1.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    cand = Counter()
    for d in r:
        for w in tf[d]:
            if w not in orig and df[w] >= 5:
                cand[w] += 1
    picked = sorted(cand.items(), key=lambda kv: (-kv[1], df[kv[0]], kv[0]))[:3]

    trows = _q("retrieval_prf_terms", spark, sf_dir).collect()
    assert [(t.word, t.r_docs, t.df) for t in trows] == [
        (w, c, df[w]) for w, c in picked
    ]

    terms_w = {t: 1.0 for t in orig} | {w: 0.5 for w, _ in picked}
    s2, _, _ = _bm25_micro(docs, terms_w)
    top = sorted(s2.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = _q("retrieval_prf_expanded_topk", spark, sf_dir).collect()
    assert [(x.doc_id, x.score_micro) for x in rows] == top
    # expansion can only add mass: every expanded score >= its stage-1 score
    assert all(s2[d] >= s1[d] for d, _ in top)


def test_grid_density_separates_planted_blobs(spark, tmp_path):
    """Two far-apart dense blobs (one spanning two adjacent cells) plus
    scattered noise: exactly two clusters with the planted sizes, and
    the adjacent dense cells merge through 8-neighbor CC."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 62

    rows = []
    # blob A: 10 points in cell (0,0) + 10 in adjacent cell (0,1) -> one
    # cluster, n_cells=2, n_points=20
    for i in range(10):
        rows.append(vec(0.015 + 0.001 * i, 0.05))
        rows.append(vec(0.015 + 0.001 * i, 0.15))
    # blob B: 15 points in cell (30,30)
    for i in range(15):
        rows.append(vec(3.015 + 0.001 * i, 3.05))
    # noise: 5 isolated points in distinct sparse cells
    for i in range(5):
        rows.append(vec(-2.05 - 0.2 * i, -2.05))
    tbl = pa.table({
        "vec_id": pa.array(range(len(rows)), pa.int64()),
        "embedding": pa.array(rows, pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    out = _q("cluster_grid_density", spark, str(tmp_path)).collect()
    got = {(r.cluster_id, r.n_cells, r.n_points) for r in out}
    enc = lambda cx, cy: (cx + 50) * 100000 + (cy + 50)
    assert got == {
        (enc(0, 0), 2, 20),   # blob A: two adjacent dense cells merged
        (enc(30, 30), 1, 15), # blob B
        (-1, 0, 5),           # noise
    }


def test_checkpointed_queries_have_zero_parquet_scans_in_final_plan(spark, sf_dir):
    """These queries materialize their base relation ONCE (Spark inlines
    CTEs per reference — the pure-SQL forms re-scanned the corpus 8-20
    times); the final plan must probe only checkpointed RDDs."""
    import io
    from contextlib import redirect_stdout

    for name in (
        "regress_theil_sen",
        "eval_calibration_isotonic",
        "retrieval_prf_terms",
        "retrieval_prf_expanded_topk",
    ):
        df = _q(name, spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        assert buf.getvalue().count("Scan parquet") == 0, name


def test_coverage_matches_python_replay(spark, sf_dir):
    """Day-set replay of the interval union — also the pin for the
    DuckDB 1.0 multi-threaded chained-window bug this query's oracle
    deliberately avoids (the window form returned inflated
    covered_days for ~23/10k suppliers at sf1.0; threads=1 correct)."""
    rows = _q("intervals_coverage_supplier", spark, sf_dir).collect()
    ship = duckdb.sql(
        f"""SELECT l_suppkey,
                   date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
            FROM '{sf_dir}/lineitem.parquet'"""
    ).fetchall()
    days, n = defaultdict(set), Counter()
    for s, a in ship:
        n[s] += 1
        days[s].update(range(a, a + 7))
    for r in rows:
        d = days[r.suppkey]
        assert r.n_intervals == n[r.suppkey]
        assert r.covered_days == len(d)
        assert r.n_islands == sum(1 for x in d if x - 1 not in d)
    assert {r.suppkey for r in rows} == set(days)


def test_yoy_mom_alignment_matches_python(spark, sf_dir):
    rows = _q("sales_yoy_mom", spark, sf_dir).collect()
    monthly = dict(duckdb.sql(
        f"""SELECT year(o_orderdate) * 12 + month(o_orderdate),
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT)
            FROM '{sf_dir}/orders.parquet' GROUP BY 1"""
    ).fetchall())
    assert len(rows) == len(monthly)
    for r in rows:
        mi = r.yr * 12 + r.mo
        assert r.rev_cents == monthly[mi]
        assert r.prev_month_cents == monthly.get(mi - 1)
        assert r.prev_year_cents == monthly.get(mi - 12)
        if r.prev_month_cents:
            assert r.mom_pct == (r.rev_cents - r.prev_month_cents) / r.prev_month_cents
        if r.prev_year_cents:
            assert r.yoy_pct == (r.rev_cents - r.prev_year_cents) / r.prev_year_cents


def test_funnel_deadline_matches_python_replay(spark, sf_dir):
    rows = {r.step_no: r for r in _q("funnel_deadline_48h", spark, sf_dir).collect()}
    ev = duckdb.sql(
        f"""SELECT user_id, event_type, ts FROM '{sf_dir}/events.parquet'
            WHERE event_type IN ('signup', 'click', 'purchase')"""
    ).fetchall()
    by_user = defaultdict(lambda: defaultdict(list))
    for u, t, ts in ev:
        by_user[u][t].append(ts)
    H = 48 * 3600
    signups, clicks, purchases, lat2, lat3 = 0, 0, 0, [], []
    for u, evs in by_user.items():
        if not evs["signup"]:
            continue
        signups += 1
        s = min(evs["signup"])
        cands = [t for t in evs["click"] if t > s and (t - s).total_seconds() <= H]
        if not cands:
            continue
        clicks += 1
        c = min(cands)
        lat2.append(round((c - s).total_seconds() * 1e6))
        pc = [t for t in evs["purchase"] if t > c and (t - c).total_seconds() <= H]
        if not pc:
            continue
        purchases += 1
        p = min(pc)
        lat3.append(round((p - c).total_seconds() * 1e6))
    assert (rows[1].users, rows[2].users, rows[3].users) == (signups, clicks, purchases)
    assert rows[1].median_latency_us is None
    for step, lat in ((2, lat2), (3, lat3)):
        lat.sort()
        assert rows[step].median_latency_us == lat[(len(lat) + 1) // 2 - 1]
    # a deadline can only shrink each step relative to the open funnel
    open_rows = {r.step_no: r.users
                 for r in _q("funnel_signup_click_purchase", spark, sf_dir).collect()}
    assert rows[2].users <= open_rows[2] and rows[3].users <= open_rows[3]


def test_skyline_matches_brute_force_dominance(spark, sf_dir):
    rows = _q("skyline_parts_price_size", spark, sf_dir).collect()
    pts = duckdb.sql(
        f"SELECT p_partkey, p_retailprice, p_size FROM '{sf_dir}/part.parquet'"
    ).fetchall()
    sky = [
        (k, pr, sz)
        for k, pr, sz in pts
        if not any(
            (p2 <= pr and s2 <= sz and (p2 < pr or s2 < sz))
            for _, p2, s2 in pts
        )
    ]
    sky.sort(key=lambda t: (t[1], t[0]))
    assert [(r.partkey, r.price, r.size) for r in rows] == sky
    # frontier law: strictly increasing size as price decreases
    by_price = sorted({(r.price, r.size) for r in rows})
    sizes = [s for _, s in by_price]
    assert sizes == sorted(sizes, reverse=True)


def test_fuzzy_trigram_match_replays_in_python(spark, sf_dir):
    rows = _q("er_fuzzy_trigram_match", spark, sf_dir).collect()
    names = {r[0] for r in duckdb.sql(
        f"SELECT DISTINCT p_name FROM '{sf_dir}/part.parquet'"
    ).fetchall()}
    probes = ["cold widgit", "blu rod", "large blot", "smal widget", "xyzzy qux"]

    def tris(s):
        return {s[i:i + 3] for i in range(max(len(s) - 2, 1))}

    expect = []
    for p in probes:
        tp = tris(p)
        best = None
        for n in sorted(names):
            tn = tris(n)
            i = len(tp & tn)
            if i == 0:
                continue
            j = i / (len(tp) + len(tn) - i)
            if j >= 0.45 and (best is None or j > best[3]):
                best = (p, n, i, j)
        if best:
            expect.append(best)
    assert [(r.probe, r.matched_name, r.shared_trigrams, r.jaccard) for r in rows] \
        == sorted(expect)
    # threshold honesty: the garbage probe and the too-far typo are absent
    got_probes = {r.probe for r in rows}
    assert "xyzzy qux" not in got_probes and "blu rod" not in got_probes
