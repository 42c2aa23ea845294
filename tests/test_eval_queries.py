"""Round-7 continuation: eval/experimentation/profiling queries checked
against independent numpy/python re-implementations (the oracle gate
already cross-checks DuckDB; these tests verify the SEMANTICS against a
third implementation and pin the internal invariants)."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from rag_application_with_vectordb_spark.plans.eval_queries import (
    _NDCG_CUM,
    _NDCG_W,
    _RANKEVAL_K,
    _RANKEVAL_N_PROBES,
)
from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _emb_numpy(sf_dir):
    df = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    return (
        df.vec_id.to_numpy(),
        np.array([np.array(e, dtype=np.float64) for e in df.embedding]),
        df.label.to_numpy(),
    )


def test_ndcg_weights_are_the_rounded_log2_discounts():
    for i, w in enumerate(_NDCG_W):
        assert w == round(1e6 / math.log2(i + 2))
    assert _NDCG_CUM == [sum(_NDCG_W[:k]) for k in range(11)]


def test_retrieval_ranking_matches_numpy(spark, sf_dir):
    ids, X, labels = _emb_numpy(sf_dir)
    norms = np.linalg.norm(X, axis=1)
    rows = {r.query_id: r for r in _q("eval_retrieval_ranking", spark, sf_dir).collect()}
    assert len(rows) == _RANKEVAL_N_PROBES
    label_counts = {lab: int((labels == lab).sum()) for lab in set(labels.tolist())}
    for qi in range(_RANKEVAL_N_PROBES):
        q = X[qi]
        sims = X @ q / (norms * norms[qi])
        order = sorted(
            (int(i) for i in ids if i != qi),
            key=lambda i: (-sims[i], i),
        )[:_RANKEVAL_K]
        rel = [1 if labels[i] == labels[qi] else 0 for i in order]
        r = rows[qi]
        n_rel = label_counts[labels[qi]] - 1
        dcg = sum(rv * _NDCG_W[pos] for pos, rv in enumerate(rel))
        idcg = _NDCG_CUM[min(n_rel, _RANKEVAL_K)]
        assert r.n_rel == n_rel
        assert r.hits_at_10 == sum(rel)
        assert r.dcg_micro == dcg
        assert r.idcg_micro == idcg
        assert r.ndcg_at_10 == (dcg / idcg if idcg else 0.0)
        first = next((pos + 1 for pos, rv in enumerate(rel) if rv), 0)
        assert r.rr_rank == first
        assert r.mrr_at_10 == (1.0 / first if first else 0.0)


def test_calibration_bins_partition_and_bound(spark, sf_dir):
    rows = _q("eval_calibration_bins", spark, sf_dir).collect()
    total = duckdb.sql(
        f"SELECT COUNT(*) n, SUM(CASE WHEN lang='en' THEN 1 ELSE 0 END) p "
        f"FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    assert sum(r.n_docs for r in rows) == total[0]
    assert sum(r.n_pos for r in rows) == total[1]
    assert all(0 <= r.bin <= 9 for r in rows)
    assert all(0.0 <= r.pos_rate <= 1.0 for r in rows)
    # mean scores must be monotone across equal-width bins
    means = [r.mean_score for r in sorted(rows, key=lambda r: r.bin)]
    assert means == sorted(means)


def test_regression_matches_numpy_lstsq(spark, sf_dir):
    per_user = duckdb.sql(
        f"""SELECT COUNT(*) AS x,
                   SUM(CASE WHEN event_type='purchase'
                            THEN CAST(round(value*100.0) AS BIGINT) ELSE 0 END) AS y
            FROM '{sf_dir}/events.parquet' GROUP BY user_id"""
    ).df()
    x = per_user.x.to_numpy(float)
    y = per_user.y.to_numpy(float) / 100.0
    slope, intercept = np.polyfit(x, y, 1)
    r = _q("regress_spend_on_activity", spark, sf_dir).collect()[0]
    assert r.n_users == len(x)
    assert abs(r.slope_dollars_per_event - slope) < 1e-9 * max(1.0, abs(slope))
    assert abs(r.intercept_dollars - intercept) < 1e-9 * max(1.0, abs(intercept))
    corr = np.corrcoef(x, y)[0, 1]
    assert abs(r.r_squared - corr * corr) < 1e-9


def test_permutation_test_agrees_with_welch_uplift(spark, sf_dir):
    perm = _q("stats_permutation_test", spark, sf_dir).collect()[0]
    welch = _q("ab_test_spend_welch", spark, sf_dir).collect()[0]
    # b=0 reuses the Welch arm assignment, so the observed uplift is shared
    assert abs(perm.uplift_dollars - welch.uplift_dollars) < 1e-9
    assert perm.n_permutations == 199
    assert perm.p_value == (1 + perm.n_as_extreme) / 200.0
    assert 0.0 < perm.p_value <= 1.0


def test_seasonal_decompose_matches_numpy(spark, sf_dir):
    daily = duckdb.sql(
        f"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   SUM(CASE WHEN event_type='purchase'
                            THEN CAST(round(value*100.0) AS BIGINT) ELSE 0 END) AS cents
            FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY day"""
    ).df()
    cents = daily.cents.to_numpy(np.int64)
    days = daily.day.to_numpy()
    epoch_days = (days - np.datetime64("1970-01-01")).astype("timedelta64[D]").astype(int)
    got = {r.dow_num: r for r in _q("forecast_seasonal_decompose", spark, sf_dir).collect()}
    sums, counts = {}, {}
    for i in range(3, len(cents) - 3):
        detr7 = 7 * int(cents[i]) - int(cents[i - 3 : i + 4].sum())
        d = int(epoch_days[i]) % 7
        sums[d] = sums.get(d, 0) + detr7
        counts[d] = counts.get(d, 0) + 1
    assert set(got) == set(sums)
    for d, r in got.items():
        assert r.sum_detr7_cents == sums[d]
        assert r.n_days == counts[d]
        assert r.seasonal_dollars == sums[d] / (7.0 * counts[d]) / 100.0


def test_ams_f2_exact_side_and_consistency(spark, sf_dir):
    r = _q("sketch_ams_f2", spark, sf_dir).collect()[0]
    f2 = duckdb.sql(
        f"""SELECT SUM(cnt*cnt) FROM (
              SELECT COUNT(*) AS cnt FROM '{sf_dir}/events.parquet' GROUP BY user_id)"""
    ).fetchone()[0]
    assert r.f2_exact == f2
    assert r.n_estimators == 16
    assert r.f2_est > 0
    assert r.rel_err_micro == round(1e6 * (r.f2_est - f2) / f2)
    # 16 averaged estimators should land within ~3 std errors of exact
    assert abs(r.f2_est - f2) / f2 < 1.5


def test_column_profile_shape_and_keys(spark, sf_dir):
    rows = {r.column_name: r for r in _q("audit_column_profile", spark, sf_dir).collect()}
    assert set(rows) == {"doc_id", "text", "lang", "source", "n_chars"}
    n = {r.n_rows for r in rows.values()}
    assert len(n) == 1  # every branch sees the same row count
    assert rows["doc_id"].n_distinct == rows["doc_id"].n_rows  # primary key
    assert rows["lang"].n_distinct < 30
    for r in rows.values():
        assert r.n_nonnull <= r.n_rows
        assert r.min_value <= r.max_value or r.n_nonnull == 0


# --- analytics tail: ANOVA / target encoding / ABC / rolling median -----------


def test_anova_matches_scipy_formula(spark, sf_dir):
    import pandas as pd

    df = duckdb.sql(
        f"SELECT lang, n_chars FROM '{sf_dir}/documents.parquet'"
    ).df()
    groups = [g.n_chars.to_numpy(float) for _, g in df.groupby("lang")]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_np = (ssb / (k - 1)) / (ssw / (n - k))
    r = _q("stats_anova_lang_length", spark, sf_dir).collect()[0]
    assert r.k_groups == k and r.n_docs == n
    assert abs(r.ss_between - ssb) < 1e-3  # 1e-6 grid rounding
    assert abs(r.ss_within - ssw) < 1e-3
    assert abs(r.f_stat - f_np) < 1e-6 * max(1.0, abs(f_np))
    assert 0.0 <= r.eta_squared <= 1.0


def test_target_encoding_is_leave_one_out(spark, sf_dir):
    rows = _q("feature_target_encode_loo", spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        s = sum(r.y for r in rs)
        n = len(rs)
        for r in rs:
            if n == 1:
                assert r.loo_encoding is None
            else:
                assert r.loo_encoding == (s - r.y) / (n - 1)


def test_pareto_abc_classes_partition_revenue(spark, sf_dir):
    rows = {r.abc_class: r for r in _q("parts_pareto_abc", spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"}
    total_share = sum(r.revenue_share for r in rows.values())
    assert abs(total_share - 1.0) < 1e-12
    # A holds at most 80% + one part's worth; shares ordered A > B-boundary
    assert rows["A"].revenue_share <= 0.8 + 0.2  # boundary part inclusive
    n_parts = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_partkey) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    assert sum(r.n_parts for r in rows.values()) == n_parts


def test_rolling_median_matches_numpy(spark, sf_dir):
    rows = _q("events_rolling_median", spark, sf_dir).collect()
    per_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        hist = per_user.setdefault(r.user_id, [])
        hist.append(r.cents)
        win = sorted(hist[-7:])
        n = len(win)
        lo, hi = win[(n + 1) // 2 - 1], win[n // 2]
        assert r.median2_cents == lo + hi
        assert r.rolling_median_dollars == (lo + hi) / 200.0


def test_weighted_shortest_paths_match_python_bellman_ford(spark, sf_dir):
    edges = duckdb.sql(
        f"""
        WITH ui AS (
          SELECT DISTINCT user_id,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
          FROM '{sf_dir}/events.parquet'
          WHERE event_type IN ('click', 'purchase')
        ),
        pairs AS (
          SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co
          FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item <> b.item
          GROUP BY a.item, b.item
        ),
        ranked AS (
          SELECT item_a, item_b, co,
                 row_number() OVER (PARTITION BY item_a
                                    ORDER BY co DESC, item_b ASC) AS rnk
          FROM pairs
        ),
        kept AS (SELECT item_a, item_b, co FROM ranked WHERE rnk <= 3)
        SELECT src, dst, CAST(floor(1000000.0 / co) AS BIGINT) AS w FROM (
          SELECT item_a AS src, item_b AS dst, co FROM kept
          UNION
          SELECT item_b AS src, item_a AS dst, co FROM kept
        ) e
        """
    ).fetchall()
    dist = {0: 0}
    for _ in range(3):
        nxt = dict(dist)
        for src, dst, w in edges:
            if src in dist and dist[src] + w < nxt.get(dst, float("inf")):
                nxt[dst] = dist[src] + w
        dist = nxt
    rows = {r.node: r for r in _q("graph_shortest_path_weighted", spark, sf_dir).collect()}
    assert set(rows) == set(dist)
    for node, r in rows.items():
        assert r.dist_micro == dist[node]
        assert r.dist_cost == dist[node] / 1e6
    # same reachable set as the unweighted BFS over the same edges
    khop = {r.node for r in _q("graph_khop_items", spark, sf_dir).collect()}
    assert set(rows) == khop


def test_active_users_sweep_equals_brute_count_distinct(spark, sf_dir):
    rows = {r.day: r for r in _q("events_active_users", spark, sf_dir).collect()}
    brute = duckdb.sql(
        f"""
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
          FROM '{sf_dir}/events.parquet'
        ),
        cal AS (
          SELECT unnest(range(CAST((SELECT MIN(day) FROM ud) AS DATE),
                              CAST((SELECT MAX(day) FROM ud) AS DATE) + INTERVAL 1 DAY,
                              INTERVAL 1 DAY))::DATE AS day
        )
        SELECT c.day,
               COUNT(DISTINCT CASE WHEN u.day = c.day THEN u.user_id END) AS dau,
               COUNT(DISTINCT CASE WHEN u.day >= c.day - 6 THEN u.user_id END) AS wau,
               COUNT(DISTINCT u.user_id) AS mau
        FROM cal c LEFT JOIN ud u ON u.day BETWEEN c.day - 29 AND c.day
        GROUP BY c.day ORDER BY c.day
        """
    ).fetchall()
    assert len(rows) == len(brute)
    for day, dau, wau, mau in brute:
        r = rows[day]
        assert (r.dau, r.wau, r.mau) == (dau, wau, mau), day


def test_zipf_fit_matches_numpy_on_grid_points(spark, sf_dir):
    head = duckdb.sql(
        rf"""
        WITH freq AS (
          SELECT word, COUNT(*) AS c FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
            FROM '{sf_dir}/documents.parquet' WHERE length(trim(text)) > 0)
          GROUP BY word
        )
        SELECT c FROM freq ORDER BY c DESC, word ASC LIMIT 1000
        """
    ).fetchall()
    x = np.array([round(np.log(i + 1) * 1e6) for i in range(len(head))])
    y = np.array([round(np.log(c[0]) * 1e6) for c in head])
    slope, intercept = np.polyfit(x.astype(float), y.astype(float), 1)
    r = _q("text_zipf_fit", spark, sf_dir).collect()[0]
    assert r.n_words == len(head)
    assert abs(r.zipf_exponent - slope) < 1e-9
    assert abs(r.intercept_ln - intercept / 1e6) < 1e-9
    corr = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
    assert abs(r.r_squared - corr * corr) < 1e-9


def test_power_mde_consistent_with_welch(spark, sf_dir):
    p = _q("ab_test_power_mde", spark, sf_dir).collect()[0]
    w = _q("ab_test_spend_welch", spark, sf_dir).collect()[0]
    assert (p.n_a, p.n_b) == (w.n_a, w.n_b)
    assert abs(p.observed_uplift_dollars - w.uplift_dollars) < 1e-12
    # mde = (z_a + z_b) * SE and t = uplift / SE  =>  mde * t = 2.801585 * uplift
    z = 1.959964 + 0.841621
    assert abs(p.mde_dollars * w.t_welch - z * w.uplift_dollars) < 1e-9
    assert p.mde_dollars > 0


def test_k_anonymity_flags_exactly_the_small_groups(spark, sf_dir):
    rows = _q("audit_k_anonymity", spark, sf_dir).collect()
    brute = duckdb.sql(
        f"""SELECT lang, source, CAST(floor(n_chars / 100.0) AS BIGINT) AS b,
                   COUNT(*) AS n
            FROM '{sf_dir}/documents.parquet' GROUP BY 1, 2, 3"""
    ).fetchall()
    small = {(l, s, b): n for l, s, b, n in brute if n < 5}
    assert {(r.lang, r.source, r.len_bucket): r.group_size for r in rows} == small
    assert all(r.group_size < 5 for r in rows)


def test_dp_counts_noise_is_keyed_and_bounded(spark, sf_dir):
    rows = _q("private_counts_laplace", spark, sf_dir).collect()
    true = dict(duckdb.sql(
        f"SELECT lang, COUNT(*) FROM '{sf_dir}/documents.parquet' GROUP BY lang"
    ).fetchall())
    assert {r.lang: r.true_count for r in rows} == true
    for r in rows:
        # noisy = true + noise on the 1e-6 grid, reproducible per key
        assert r.noisy_count == r.true_count + r.noise_micro / 1e6
        # Laplace(1) noise: |noise| beyond 15 has probability ~3e-7
        assert abs(r.noise_micro) < 15_000_000
    # keyed noise: distinct languages draw distinct noise (u collision-free)
    assert len({r.noise_micro for r in rows}) == len(rows)
