"""Round-7 operators: warehouse maintenance (CDC / SCD2 / incremental
aggregate merge), record linkage, MMR diversification, NB classifier,
leakage-safe grouped split."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.plans.registry import load_all
from rag_application_with_vectordb_spark.sources.catalog import load_table


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


# --- CDC ------------------------------------------------------------------


def test_cdc_diff_matches_construction_rules(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cut1 = F.lit("2000-01-01 00:00:00").cast("timestamp")
    cut2 = F.lit("2001-01-01 00:00:00").cast("timestamp")
    v1_keys = {
        r.o_orderkey
        for r in orders.filter(F.col("o_orderdate") < cut1).select("o_orderkey").collect()
    }
    v2_keys = {
        r.o_orderkey
        for r in orders.filter(
            (F.col("o_orderdate") < cut2) & (F.col("o_orderkey") % 97 != 0)
        )
        .select("o_orderkey")
        .collect()
    }
    out = _q("cdc_snapshot_diff", spark, sf_dir).collect()
    by_type = {t: {r.o_orderkey for r in out if r.change_type == t} for t in "IDU"}
    assert by_type["I"] == v2_keys - v1_keys
    assert by_type["D"] == v1_keys - v2_keys
    # updates: surviving v1 keys whose price was bumped (%13)
    assert by_type["U"] == {k for k in v1_keys & v2_keys if k % 13 == 0}
    for r in out:
        if r.change_type == "I":
            assert r.old_hash is None and r.new_hash is not None
        elif r.change_type == "D":
            assert r.old_hash is not None and r.new_hash is None
        else:
            assert r.old_hash is not None and r.new_hash is not None
            assert r.old_hash != r.new_hash


# --- SCD2 -----------------------------------------------------------------


def test_scd2_intervals_chain_and_cover(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = _q("scd2_customer_status_history", spark, sf_dir).collect()
    per_cust = {}
    for r in out:
        per_cust.setdefault(r.o_custkey, []).append(r)
    n_orders_expect = {
        r.o_custkey: r.n
        for r in orders.groupBy("o_custkey").agg(F.count("*").alias("n")).collect()
    }
    for ck, runs in per_cust.items():
        runs.sort(key=lambda r: (r.valid_from, r.status))
        # exactly one open-ended current run
        assert sum(1 for r in runs if r.is_current) == 1
        assert sum(1 for r in runs if r.valid_to is None) == 1
        # run counts add up to the customer's orders
        assert sum(r.n_orders for r in runs) == n_orders_expect[ck]
        # intervals chain: every non-null valid_to is some run's valid_from
        froms = {r.valid_from for r in runs}
        for r in runs:
            if r.valid_to is not None:
                assert r.valid_to in froms


def test_scd2_adjacent_runs_change_status(spark, sf_dir):
    out = _q("scd2_customer_status_history", spark, sf_dir)
    # rebuild adjacency by seq order via (valid_from, n_orders) is lossy;
    # instead assert via the definition: no two runs of one customer with
    # the same status share a boundary (valid_to == other's valid_from
    # with equal status would mean the island split incorrectly)
    rows = out.collect()
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r.o_custkey, []).append(r)
    for runs in per_cust.values():
        for a, b in itertools.combinations(runs, 2):
            if a.status == b.status:
                assert a.valid_to != b.valid_from or a.valid_to is None


# --- incremental aggregate maintenance -------------------------------------


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    full = {
        r.month: (r.order_cnt, r.revenue_cents)
        for r in orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
        )
        .agg(
            F.count("*").cast("bigint").alias("order_cnt"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .collect()
    }
    merged = {
        r.month: (r.order_cnt, r.revenue_cents)
        for r in _q("incremental_agg_merge", spark, sf_dir).collect()
    }
    assert merged == full


# --- record linkage ---------------------------------------------------------


def test_er_pairs_are_blocked_and_counted(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    name_counts = {
        r.p_name: r.n for r in part.groupBy("p_name").agg(F.count("*").alias("n")).collect()
    }
    out = _q("er_blocked_name_pairs", spark, sf_dir).collect()
    assert out
    seen = set()
    for r in out:
        assert r.name_a < r.name_b
        assert r.name_a.split(" ")[1] == r.block == r.name_b.split(" ")[1]
        assert r.edit_dist >= 1  # distinct names
        assert r.n_record_pairs == name_counts[r.name_a] * name_counts[r.name_b]
        seen.add((r.name_a, r.name_b))
    # completeness: every in-block distinct-name pair is present
    by_block = {}
    for n in name_counts:
        by_block.setdefault(n.split(" ")[1], []).append(n)
    expect = {
        (a, b)
        for names in by_block.values()
        for a, b in itertools.combinations(sorted(names), 2)
    }
    assert seen == expect


def test_er_clusters_match_union_find(spark, sf_dir):
    pairs = _q("er_blocked_name_pairs", spark, sf_dir).collect()
    part = load_table(spark, sf_dir, "part")
    name_counts = {
        r.p_name: r.n for r in part.groupBy("p_name").agg(F.count("*").alias("n")).collect()
    }
    parent = {n: n for n in name_counts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        if r.edit_dist <= 3:
            ra, rb = find(r.name_a), find(r.name_b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for n in name_counts:
        rep = find(n)
        names, recs = expect.get(rep, (0, 0))
        expect[rep] = (names + 1, recs + name_counts[n])
    got = {
        r.cluster_rep: (r.n_names, r.n_records)
        for r in _q("er_match_clusters", spark, sf_dir).collect()
    }
    assert got == expect


# --- MMR --------------------------------------------------------------------


def test_mmr_greedy_invariant(spark, sf_dir):
    from rag_application_with_vectordb_spark.embedder import hash_embedding_expr
    from rag_application_with_vectordb_spark.functions.vector import cosine_sim
    from rag_application_with_vectordb_spark.plans.hybrid_queries import (
        _DIM,
        _MMR_CAND,
        _MMR_LAMBDA,
        _QTEXT,
    )

    out = _q("retrieval_mmr_topk", spark, sf_dir).collect()
    assert [r.mmr_rank for r in sorted(out, key=lambda r: r.mmr_rank)] == [1, 2, 3, 4, 5]
    assert len({r.doc_id for r in out}) == 5
    # recompute the greedy selection from the candidate set + exact sims
    docs = load_table(spark, sf_dir, "documents")
    emb = hash_embedding_expr(F.col("text"), dim=_DIM)
    qv = hash_embedding_expr(F.lit(_QTEXT), dim=_DIM)
    cos = cosine_sim(emb, qv)
    cand = (
        docs.select("doc_id", F.round(cos, 6).alias("rel"), emb.alias("e"), cos.alias("o"))
        .orderBy(F.desc("o"), F.asc("doc_id"))
        .limit(_MMR_CAND)
        .drop("o")
    )
    a = cand.select(F.col("doc_id").alias("da"), F.col("e").alias("ea"))
    b = cand.select(F.col("doc_id").alias("db"), F.col("e").alias("eb"))
    sims = {
        (r.da, r.db): r.s
        for r in a.crossJoin(b)
        .select("da", "db", F.round(cosine_sim(F.col("ea"), F.col("eb")), 6).alias("s"))
        .collect()
    }
    rels = {r.doc_id: r.rel for r in cand.collect()}
    picked = []
    while len(picked) < 5:
        best = None
        for d, rel in rels.items():
            if d in picked:
                continue
            ms = max((sims[(d, p)] for p in picked), default=0.0)
            score = _MMR_LAMBDA * rel - round(1.0 - _MMR_LAMBDA, 10) * ms
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d)
        picked.append(best[1])
    got = [r.doc_id for r in sorted(out, key=lambda r: r.mmr_rank)]
    assert got == picked


def test_mmr_rank1_is_pure_relevance(spark, sf_dir):
    out = sorted(_q("retrieval_mmr_topk", spark, sf_dir).collect(), key=lambda r: r.mmr_rank)
    assert out[0].max_sim == 0.0
    assert abs(out[0].mmr_score - 0.7 * out[0].rel) < 1e-12
    assert out[0].rel == max(r.rel for r in out)


# --- NB classifier -----------------------------------------------------------


def test_nb_confusion_covers_all_test_docs(spark, sf_dir):
    from rag_application_with_vectordb_spark.plans.classify_queries import _split_col

    docs = load_table(spark, sf_dir, "documents")
    n_test = docs.filter(_split_col("test")).count()
    out = _q("text_nb_confusion", spark, sf_dir).collect()
    assert sum(r.n for r in out) == n_test
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    for r in out:
        assert r.lang_true in langs and r.lang_pred in langs


# --- leakage-safe grouped split ----------------------------------------------


def test_split_group_folds_partitions_users(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = _q("split_group_folds", spark, sf_dir).collect()
    assert sum(r.n_events for r in out) == events.count()
    assert sum(r.n_users for r in out) == events.select("user_id").distinct().count()
    for r in out:
        assert r.leaked_users == 0
        assert 0 <= r.fold < 5


# --- BPE merge training -------------------------------------------------------


def test_bpe_merges_match_canonical_reference(spark, sf_dir):
    """The engine's learned merge table must equal a straightforward
    Python implementation of Sennrich-style BPE over the same word
    counts (greedy left-to-right merge application)."""
    from rag_application_with_vectordb_spark.functions.text import tokens as tok_fn

    docs = load_table(spark, sf_dir, "documents")
    wc = {}
    for r in (
        docs.select(F.explode(tok_fn(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    ):
        wc[r.w] = r["count"]
    seqs = {w: list(w) for w in wc}
    expect = []
    for rank in range(1, 9):
        counts = {}
        for w, seq in seqs.items():
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] = counts.get((seq[i], seq[i + 1]), 0) + wc[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, a, b, cnt))
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in sorted(
            _q("text_bpe_train_merges", spark, sf_dir).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    assert got == expect


def test_bpe_merged_symbols_grow(spark, sf_dir):
    rules = sorted(
        _q("text_bpe_train_merges", spark, sf_dir).collect(), key=lambda r: r.merge_rank
    )
    assert len(rules) == 8
    # later merges may consume earlier merged symbols (that's the point
    # of BPE); at least one rule must build on a multi-char symbol
    assert any(len(r.left_sym) > 1 or len(r.right_sym) > 1 for r in rules)
    # counts are non-increasing is NOT guaranteed (merges create new
    # pairs), but every count is positive
    assert all(r.pair_count > 0 for r in rules)


def test_bpe_encode_compresses(spark, sf_dir):
    out = _q("text_bpe_encode_stats", spark, sf_dir).collect()
    assert out
    for r in out:
        # BPE tokens are at most one per char and at least one per word
        assert r.n_words <= r.n_bpe_tokens <= r.n_chars
        # 8 merges on a 31-word vocab must compress meaningfully
        assert r.n_bpe_tokens < r.n_chars


def test_ewma_first_event_is_identity_and_bounded(spark, sf_dir):
    rows = _q("events_ewma", spark, sf_dir).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    for user_rows in per_user.values():
        user_rows.sort(key=lambda r: (r.ts, r.event_id))
        assert user_rows[0].ewma20 == user_rows[0].value
        lo = min(r.value for r in user_rows)
        hi = max(r.value for r in user_rows)
        for r in user_rows:
            assert lo - 1e-9 <= r.ewma20 <= hi + 1e-9  # convex combination


def test_psi_contributions_nonnegative_and_complete(spark, sf_dir):
    out = _q("monitor_psi_price_drift", spark, sf_dir).collect()
    assert len(out) >= 2
    from rag_application_with_vectordb_spark.sources.catalog import load_table as lt
    n_orders = lt(spark, sf_dir, "orders").count()
    assert sum(r.n_a + r.n_b for r in out) == n_orders
    for r in out:
        assert r.psi_contrib_nano >= 0  # (p-q)ln(p/q) >= 0 always


def test_rfm_bins_are_balanced_quartiles(spark, sf_dir):
    out = _q("orders_rfm_segments", spark, sf_dir).collect()
    n = len(out)
    for col in ("r_bin", "f_bin", "m_bin"):
        counts = {}
        for r in out:
            counts[r[col]] = counts.get(r[col], 0) + 1
        assert set(counts) == {1, 2, 3, 4}
        assert max(counts.values()) - min(counts.values()) <= 1  # ntile balance
    assert n == len({r.o_custkey for r in out})


def test_pca_eigvec_dominates_random_direction(spark, sf_dir):
    """The power-iteration output must explain more variance than the
    all-ones start vector: Rayleigh(v3) >= Rayleigh(v0) in the same
    fixed-point metric, and the top component is at the +-1000 scale."""
    out = _q("embedding_pca_power", spark, sf_dir).collect()
    assert len(out) == 16
    vs = {r.comp_i: r.eig_fixed for r in out}
    assert max(abs(v) for v in vs.values()) == 1000  # renormalized
    num, den = out[0].rayleigh_num, out[0].rayleigh_den
    assert den > 0
    # compare against the start vector's quotient using the same scaled
    # covariance, recomputed via numpy from the fixture
    import numpy as np
    from rag_application_with_vectordb_spark.sources.catalog import load_table as lt

    emb = np.array(
        [r.embedding[:16] for r in lt(spark, sf_dir, "embeddings").collect()],
        dtype=np.float64,
    )
    q = np.round(emb * 1000)
    n = q.shape[0]
    cov0 = n * (q.T @ q) - np.outer(q.sum(0), q.sum(0))
    c = np.round(cov0 * 1_000_000 / np.abs(cov0).max())
    ones = np.full(16, 1000.0)
    v = np.array([vs[i + 1] for i in range(16)], dtype=np.float64)
    r_ones = (ones @ c @ ones) / (ones @ ones)
    r_v = (v @ c @ v) / (v @ v)
    assert r_v >= r_ones
    # engine's quotient agrees with numpy's for the same vector
    assert abs(num / den - r_v) / abs(r_v) < 1e-9


def test_phash_finds_every_planted_variant(spark, sf_dir):
    from rag_application_with_vectordb_spark.sources.catalog import load_table as lt

    out = _q("multimodal_phash_neardup_pairs", spark, sf_dir).collect()
    planted = {
        r.doc_id
        for r in lt(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0).collect()
    }
    found = {(r.doc_a, r.doc_b) for r in out}
    for d in planted:
        assert (d, d + 10000000) in found  # every 1-byte perturbation caught
    for r in out:
        assert 0 <= r.hamming <= 3


def test_hll_estimate_within_expected_error(spark, sf_dir):
    out = _q("approx_distinct_hll_det", spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r.m == 64
    # standard error for m=64 is ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(r.est_hll - r.exact_distinct) / r.exact_distinct < 0.39
    assert r.s_fixed > 0 and 0 <= r.n_zero_buckets <= 64


def test_heavy_hitters_partition_independent(spark, sf_dir):
    """The verified output must be identical under different partition
    layouts even though the MG proposal stage is partition-dependent."""
    from rag_application_with_vectordb_spark.operators.sketches import (
        misra_gries_candidates,
    )
    from rag_application_with_vectordb_spark.sources.catalog import load_table as lt

    out = sorted(tuple(r) for r in _q("heavy_hitters_verified", spark, sf_dir).collect())
    assert len(out) >= 1
    for item, cnt, n in out:
        assert cnt * 9 > n  # above the n/(cap+1) threshold, exactly counted
    # repartitioned proposal still covers every verified item
    events = lt(spark, sf_dir, "events")
    keyed = events.select(
        F.when(F.col("event_id") % 3 == 0, F.lit("hot"))
        .otherwise(F.col("user_id").cast("string"))
        .alias("item")
    ).repartition(13)
    cand = {r.candidate for r in misra_gries_candidates(keyed, "item").collect()}
    for item, _, _ in out:
        assert item in cand


def test_trigram_candidates_are_superset_of_matches(spark, sf_dir):
    from rag_application_with_vectordb_spark.sources.catalog import load_table as lt

    out = {r.doc_id for r in _q("text_substring_search_trigram", spark, sf_dir).collect()}
    exact = {
        r.doc_id
        for r in lt(spark, sf_dir, "documents")
        .filter(F.expr("locate('fast table', text) > 0"))
        .collect()
    }
    assert out == exact and len(out) > 0


# --- winnowing fingerprints ----------------------------------------------


def test_winnow_matches_python_recompute(spark, sf_dir):
    import hashlib

    K, W, PMOD = 4, 4, 1 << 20
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expect = set()
    for r in docs:
        words = r.text.strip().split()
        if len(words) < K:
            continue
        grams = [
            int(hashlib.md5(" ".join(words[i : i + K]).encode()).hexdigest()[:8], 16)
            for i in range(len(words) - K + 1)
        ]
        combs = [gh * PMOD + (PMOD - (i + 1)) for i, gh in enumerate(grams)]
        for j in range(W - 1, len(combs)):
            sel = min(combs[j - W + 1 : j + 1])
            expect.add((r.doc_id, PMOD - sel % PMOD, sel // PMOD))
    got = {
        (r.doc_id, r.pos, r.gram_hash)
        for r in _q("text_winnow_fingerprints", spark, sf_dir).collect()
    }
    assert got == expect
    assert len(got) > 0


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # two docs sharing a run of >= k+w-1 tokens must share a fingerprint
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 = k+w-1 tokens
    rows = [
        (1, "xx yy " + shared + " zz ww qq rr ss tt"),
        (2, "aa bb cc dd " + shared + " ee ff gg hh"),
        (3, "no overlap here at all just filler words one two three four"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        fp = _q("text_winnow_fingerprints", spark, d).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r.doc_id, set()).add(r.gram_hash)
    assert by_doc[1] & by_doc[2], "shared 7-token run must yield a shared fingerprint"
    assert not (by_doc[1] & by_doc[2] & by_doc[3])


# --- cross-correlation lead-lag ------------------------------------------


def test_ccf_matches_numpy_recompute(spark, sf_dir):
    import numpy as np
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    days = defaultdict(lambda: [0, 0])
    for r in ev:
        if r.event_type == "click":
            days[r.ts.date()][0] += 1
        elif r.event_type == "purchase":
            days[r.ts.date()][1] += 1
    out = {r.lag: (r.n_pairs, r.ccf) for r in _q("events_ccf_click_purchase", spark, sf_dir).collect()}
    import datetime

    for lag in (-7, -3, -1, 0, 1, 3, 7):
        pairs = [
            (v[0], days[d + datetime.timedelta(days=lag)][1])
            for d, v in days.items()
            if d + datetime.timedelta(days=lag) in days
        ]
        n, (xs, ys) = len(pairs), zip(*pairs)
        xs, ys = np.array(xs, dtype=float), np.array(ys, dtype=float)
        r_np = np.corrcoef(xs, ys)[0, 1]
        assert out[lag][0] == n
        assert abs(out[lag][1] - r_np) < 1e-9, (lag, out[lag][1], r_np)
    # lag 0 must correlate a day with itself consistently: n_pairs equals day count
    assert out[0][0] == len(days)


# --- label propagation communities ---------------------------------------


def test_lpa_matches_python_recompute(spark, sf_dir):
    import json
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "props").collect()
    ui = {
        (r.user_id, int(json.loads(r.props)["k"]))
        for r in ev
        if r.event_type in ("click", "purchase")
    }
    co = defaultdict(int)
    by_user = defaultdict(set)
    for u, i in ui:
        by_user[u].add(i)
    for items in by_user.values():
        for a in items:
            for b in items:
                if a != b:
                    co[(a, b)] += 1
    # top-3 sparsify + symmetrize
    by_src = defaultdict(list)
    for (a, b), c in co.items():
        by_src[a].append((c, b))
    edges = defaultdict(int)
    for a, lst in by_src.items():
        for c, b in sorted(lst, key=lambda t: (-t[0], t[1]))[:3]:
            edges[(a, b)] = c
            edges[(b, a)] = c
    nbrs = defaultdict(list)
    for (a, b), c in edges.items():
        nbrs[a].append((b, c))
    labels = {n: n for n in nbrs}
    for _ in range(4):
        new = {}
        for n, nb in nbrs.items():
            votes = defaultdict(int)
            for b, c in nb:
                votes[labels[b]] += c
            new[n] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
    sizes = defaultdict(int)
    for lab in labels.values():
        sizes[lab] += 1
    expect = {(n, lab, sizes[lab]) for n, lab in labels.items()}
    got = {
        (r.node, r.community, r.csize)
        for r in _q("graph_lpa_communities", spark, sf_dir).collect()
    }
    assert got == expect
    # LPA must coarsen: fewer communities than nodes
    assert len({c for _, c, _ in got}) < len(got)


# --- PR curve / drawdown / Mann-Kendall / t-closeness --------------------


def test_pr_curve_matches_python_recompute(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    pts = sorted(((r.n_chars, 1 if r.lang == "en" else 0) for r in docs), reverse=True)
    p_total = sum(lab for _, lab in pts)
    out = {r.threshold: r for r in _q("eval_pr_curve", spark, sf_dir).collect()}
    thresholds = sorted({s for s, _ in pts}, reverse=True)
    for t in thresholds:
        tp = sum(lab for s, lab in pts if s >= t)
        pred = sum(1 for s, _ in pts if s >= t)
        r = out[t]
        assert (r.tp, r.fp, r.fn) == (tp, pred - tp, p_total - tp)
        assert abs(r.prec - tp / pred) < 1e-12
        assert abs(r.rec - tp / p_total) < 1e-12
        assert abs(r.f1 - 2 * tp / (pred + p_total)) < 1e-12
    # recall is monotone nonincreasing in threshold
    recs = [out[t].rec for t in thresholds]
    assert recs == sorted(recs)


def test_max_drawdown_matches_python_recompute(spark, sf_dir):
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value").collect()
    net = defaultdict(int)
    for r in ev:
        if r.event_type == "purchase":
            net[r.ts.date()] += round(r.value * 100)
        elif r.event_type == "error":
            net[r.ts.date()] -= round(r.value * 100)
    bal, peak, best = 0, None, (-1, None)
    for d in sorted(net):
        bal += net[d]
        peak = bal if peak is None else max(peak, bal)
        draw = peak - bal
        if draw > best[0]:
            best = (draw, d)
    out = _q("events_max_drawdown", spark, sf_dir).collect()[0]
    assert out.max_drawdown_cents == best[0]
    assert out.trough_day == best[1]
    assert out.peak_cents - out.trough_cents == out.max_drawdown_cents


def test_mann_kendall_matches_python_recompute(spark, sf_dir):
    from collections import defaultdict
    import math

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value").collect()
    rev = defaultdict(int)
    for r in ev:
        if r.event_type == "purchase":
            rev[r.ts.date()] += round(r.value * 100)
    xs = [rev[d] for d in sorted(rev)]
    n = len(xs)
    s = sum(
        (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie18 = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xs).values() if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    out = _q("stats_mann_kendall", spark, sf_dir).collect()[0]
    assert (out.s_stat, out.n_days, out.var_s_x18) == (s, n, var18)
    assert abs(out.tau - s / (n * (n - 1) / 2)) < 1e-12
    zexp = 0.0 if s == 0 else (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
    assert abs(out.z - zexp) < 1e-12


def test_t_closeness_matches_python_recompute(spark, sf_dir):
    from collections import Counter, defaultdict

    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars", "source").collect()
    rows = [(r.lang, r.n_chars // 100, r.source) for r in docs]
    global_v = Counter(src for _, _, src in rows)
    total = len(rows)
    by_class = defaultdict(Counter)
    for lang, b, src in rows:
        by_class[(lang, b)][src] += 1
    out = {(r.lang, r.len_bucket): r for r in _q("audit_t_closeness", spark, sf_dir).collect()}
    assert set(out) == set(by_class)
    for key, cnt in by_class.items():
        n_c = sum(cnt.values())
        tvd = sum(abs(cnt[v] * total - global_v[v] * n_c) for v in global_v) / (
            2.0 * n_c * total
        )
        assert out[key].class_size == n_c
        assert abs(out[key].t_closeness - tvd) < 1e-12
        assert 0.0 <= out[key].t_closeness <= 1.0


# --- radius search / CUPED / k-core / TextRank ---------------------------


def test_knn_radius_matches_brute_force(spark, sf_dir):
    import math

    emb = {r.vec_id: r.embedding for r in load_table(spark, sf_dir, "embeddings").collect()}
    q = emb[0]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return 0.0 if na == 0 or nb == 0 else dot / (na * nb)

    expect = {vid for vid, v in emb.items() if cos(v, q) >= 0.15}
    out = _q("knn_radius", spark, sf_dir).collect()
    assert {r.vec_id for r in out} == expect
    assert all(r.similarity >= 0.15 for r in out)
    sims = [r.similarity for r in out]
    assert sims == sorted(sims, reverse=True)


def test_cuped_matches_numpy_recompute(spark, sf_dir):
    import datetime

    import numpy as np
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type", "value").collect()
    cut = datetime.datetime(2024, 1, 16)
    xs, ys = defaultdict(int), defaultdict(int)
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            (xs if r.ts < cut else ys)[r.user_id] += round(r.value * 100)
    x = np.array([xs[u] for u in sorted(users)], dtype=float)
    y = np.array([ys[u] for u in sorted(users)], dtype=float)
    cov = np.cov(x, y, ddof=1)
    theta = cov[0, 1] / cov[0, 0]
    rho2 = cov[0, 1] ** 2 / (cov[0, 0] * cov[1, 1])
    out = _q("ab_test_cuped", spark, sf_dir).collect()[0]
    assert out.n_users == len(users)
    assert abs(out.theta - theta) < 1e-9
    assert abs(out.var_y_dollars2 - cov[1, 1] / 10000.0) < 1e-6
    assert abs(out.var_cuped_dollars2 - cov[1, 1] * (1 - rho2) / 10000.0) < 1e-6
    assert abs(out.var_reduction_frac - rho2) < 1e-12
    # CUPED can only reduce variance
    assert out.var_cuped_dollars2 <= out.var_y_dollars2


def _kcore_python(spark, sf_dir, k):
    from collections import defaultdict

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct().collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    co = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                co[(a, b)] += 1
    nbr = defaultdict(set)
    for (a, b), c in co.items():
        if c >= 2:
            nbr[a].add(b)
            nbr[b].add(a)
    surv = set(nbr)
    while True:
        drop = {n for n in surv if len(nbr[n] & surv) < k}
        if not drop:
            break
        surv -= drop
    return {n: len(nbr[n] & surv) for n in surv}


def test_kcore_reaches_fixpoint_and_matches_python(spark, sf_dir):
    expect = _kcore_python(spark, sf_dir, 3)
    got = {r.node: r.core_degree for r in _q("graph_kcore", spark, sf_dir).collect()}
    assert got == expect
    # fixpoint: every surviving node keeps >= k surviving neighbors
    assert all(d >= 3 for d in got.values()) or not got


def test_kcore_fixpoint_at_sf001(spark):
    # the SF where the peel actually runs ~10 rounds and splits the graph
    sf = "/root/testdata/sf0.01"
    expect = _kcore_python(spark, sf, 3)
    got = {r.node: r.core_degree for r in _q("graph_kcore", spark, sf).collect()}
    assert got == expect
    assert 0 < len(got)  # non-trivial core survives at sf0.01


def test_textrank_matches_python_recompute(spark, sf_dir):
    from collections import defaultdict

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    co = defaultdict(int)
    for r in docs:
        ws = r.text.strip().split()
        for i, a in enumerate(ws):
            for d in (1, 2):
                if i + d < len(ws) and ws[i + d] != a:
                    key = tuple(sorted((a, ws[i + d])))
                    co[key] += 1
    edges = defaultdict(dict)
    for (a, b), c in co.items():
        if c >= 5:
            edges[a][b] = c
            edges[b][a] = c
    SCALE = 1_000_000_000
    outw = {n: sum(ws.values()) for n, ws in edges.items()}
    pr = {n: SCALE for n in edges}
    for _ in range(3):
        inflow = defaultdict(int)
        for u, ws in edges.items():
            for v, w in ws.items():
                inflow[v] += (pr[u] * w) // outw[u]
        pr = {n: 15 * SCALE // 100 + (85 * inflow[n]) // 100 for n in edges}
    top = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = [(w, len(edges[w]), p / SCALE) for w, p in top]
    got = [
        (r.word, r.outdeg, r.textrank)
        for r in _q("text_textrank_keywords", spark, sf_dir).collect()
    ]
    assert got == expect


# --- Spearman / IPF raking -----------------------------------------------


def test_spearman_matches_scipy_style_recompute(spark, sf_dir):
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value").collect()
    act, spend = defaultdict(int), defaultdict(int)
    for r in ev:
        act[r.user_id] += 1
        if r.event_type == "purchase":
            spend[r.user_id] += round(r.value * 100)
    users = sorted(act)
    xs = [act[u] for u in users]
    ys = [spend[u] for u in users]

    def avg_ranks(vals):
        import collections

        cnt = collections.Counter(vals)
        cum, r2 = 0, {}
        for v in sorted(cnt):
            r2[v] = 2 * cum + cnt[v] + 1
            cum += cnt[v]
        return [r2[v] for v in vals]

    import numpy as np

    ra, rb = np.array(avg_ranks(xs), dtype=float), np.array(avg_ranks(ys), dtype=float)
    rho = np.corrcoef(ra, rb)[0, 1]
    out = _q("stats_spearman_activity_spend", spark, sf_dir).collect()[0]
    assert out.n_users == len(users)
    assert abs(out.spearman_rho - rho) < 1e-9


def test_ipf_margins_converge_to_uniform(spark, sf_dir):
    from collections import defaultdict

    rows = _q("weights_raking_ipf", spark, sf_dir).collect()
    langs, sources = defaultdict(float), defaultdict(float)
    for r in rows:
        langs[r.lang] += r.raked_share
        sources[r.source] += r.raked_share
        assert r.raked_weight > 0
    # after 3 rounds each margin is within rounding slack of uniform
    for share in langs.values():
        assert abs(share - 1.0 / len(langs)) < 0.01
    for share in sources.values():
        assert abs(share - 1.0 / len(sources)) < 0.01
    # raking must upweight rare cells relative to common ones per lang
    total = sum(r.n_docs for r in rows)
    assert any(r.raked_weight > 1.0 for r in rows) and any(
        r.raked_weight < 1.0 for r in rows
    ), total


# --- SRM / assortativity / Cook's distance -------------------------------


def test_srm_counts_match_welch_arms(spark, sf_dir):
    out = _q("ab_test_srm", spark, sf_dir).collect()[0]
    welch = _q("ab_test_spend_welch", spark, sf_dir).collect()[0]
    assert (out.n_a, out.n_b) == (welch.n_a, welch.n_b)
    exp = (out.n_a - out.n_b) ** 2 / (out.n_a + out.n_b)
    assert abs(out.chi2_srm - exp) < 1e-12
    assert out.srm_flag == (exp > 3.841458820694124)


def test_assortativity_matches_python_recompute(spark, sf_dir):
    from collections import defaultdict

    import numpy as np

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct().collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    co = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                co[(a, b)] += 1
    edges = []
    nbr = defaultdict(set)
    for (a, b), c in co.items():
        if c >= 2:
            edges += [(a, b), (b, a)]
            nbr[a].add(b)
            nbr[b].add(a)
    deg = {n: len(v) for n, v in nbr.items()}
    js = np.array([deg[a] for a, _ in edges], dtype=float)
    ks = np.array([deg[b] for _, b in edges], dtype=float)
    out = _q("graph_assortativity", spark, sf_dir).collect()[0]
    assert out.n_directed_edges == len(edges)
    assert abs(out.assortativity - np.corrcoef(js, ks)[0, 1]) < 1e-9


def test_cooks_matches_numpy_recompute(spark, sf_dir):
    from collections import defaultdict

    import numpy as np

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value").collect()
    act, spend = defaultdict(int), defaultdict(int)
    for r in ev:
        act[r.user_id] += 1
        if r.event_type == "purchase":
            spend[r.user_id] += round(r.value * 100)
    users = sorted(act)
    x = np.array([act[u] for u in users], dtype=float)
    y = np.array([spend[u] for u in users], dtype=float)
    n = len(users)
    b1 = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
    b0 = y.mean() - b1 * x.mean()
    resid = y - b0 - b1 * x
    sxx = ((x - x.mean()) ** 2).sum()
    h = 1.0 / n + (x - x.mean()) ** 2 / sxx
    s2 = ((y - y.mean()) ** 2).sum() * (1 - ((x - x.mean()) * (y - y.mean())).sum() ** 2 / (sxx * ((y - y.mean()) ** 2).sum())) / (n - 2)
    d = resid**2 / (2 * s2) * h / (1 - h) ** 2
    ranked = sorted(zip(users, d), key=lambda kv: (-round(kv[1] * 1e6), kv[0]))[:10]
    out = _q("regress_influence_cooks", spark, sf_dir).collect()
    assert [r.user_id for r in out] == [u for u, _ in ranked]
    for r, (_, dd) in zip(out, ranked):
        assert abs(r.cooks_d - dd) < 1e-5
        assert 0 < r.leverage < 1


# --- quantile normalization / DiD ----------------------------------------


def test_quantile_normalize_matches_python_recompute(spark, sf_dir):
    from collections import defaultdict

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars").collect()
    pooled = sorted(r.n_chars for r in docs)
    n = len(pooled)
    by_src = defaultdict(list)
    for r in docs:
        by_src[r.source].append((r.n_chars, r.doc_id))
    expect = {}
    for src, rows in by_src.items():
        rows.sort()
        ns = len(rows)
        for i, (_, did) in enumerate(rows, start=1):
            k = ((2 * i - 1) * n + ns) // (2 * ns)
            expect[did] = (src, i, pooled[k - 1])
    out = _q("feature_quantile_normalize", spark, sf_dir).collect()
    assert len(out) == len(docs)
    for r in out:
        src, rnk, norm = expect[r.doc_id]
        assert (r.source, r.source_rank, r.normalized_chars) == (src, rnk, norm)
    # normalization preserves within-source order
    for src, rows in by_src.items():
        got = sorted(
            (r.source_rank, r.normalized_chars) for r in out if r.source == src
        )
        vals = [v for _, v in got]
        assert vals == sorted(vals)


def test_did_consistent_with_cuped_split(spark, sf_dir):
    out = _q("ab_test_diff_in_diff", spark, sf_dir).collect()[0]
    welch = _q("ab_test_spend_welch", spark, sf_dir).collect()[0]
    assert (out.n_a, out.n_b) == (welch.n_a, welch.n_b)
    assert abs(out.did_dollars - (out.delta_a_dollars - out.delta_b_dollars)) < 1e-9
    assert out.se_dollars > 0


# --- log-rank / CEM ------------------------------------------------------


def _arm_of(user_id):
    import hashlib

    h = hashlib.md5(f"ab42|{user_id}".encode()).hexdigest()
    return int(h[:13], 16) % 2 == 0  # True = arm A


def test_logrank_matches_python_recompute(spark, sf_dir):
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type").collect()
    max_ts = max(r.ts for r in ev)
    signup, first_p = {}, {}
    for r in sorted(ev, key=lambda r: r.ts):
        if r.event_type == "signup" and r.user_id not in signup:
            signup[r.user_id] = r.ts
    for r in sorted(ev, key=lambda r: r.ts):
        if (
            r.event_type == "purchase"
            and r.user_id in signup
            and r.ts > signup[r.user_id]
            and r.user_id not in first_p
        ):
            first_p[r.user_id] = r.ts
    rows = []
    for u, s in signup.items():
        end = first_p.get(u, max_ts)
        t = int((int(end.timestamp()) - int(s.timestamp())) // 86400)
        rows.append((t, u in first_p, _arm_of(u)))
    times = sorted({t for t, e, _ in rows if e})
    o1 = sum(1 for t, e, a in rows if e and a)
    e1m = vm = 0
    for t in times:
        na = sum(1 for tt, _, a in rows if tt >= t and a)
        nb = sum(1 for tt, _, a in rows if tt >= t and not a)
        da = sum(1 for tt, e, a in rows if tt == t and e and a)
        db = sum(1 for tt, e, a in rows if tt == t and e and not a)
        nt, dt = na + nb, da + db
        e1m += round(1e6 * dt * na / nt)
        if nt > 1:
            vm += round(1e6 * dt * (na / nt) * (1 - na / nt) * (nt - dt) / (nt - 1))
    out = _q("survival_logrank_arms", spark, sf_dir).collect()[0]
    assert out.observed_a == o1
    assert abs(out.expected_a - e1m / 1e6) < 1e-9
    assert abs(out.var_logrank - vm / 1e6) < 1e-9
    exp_chi2 = (o1 - e1m / 1e6) ** 2 / (vm / 1e6)
    assert abs(out.chi2_logrank - exp_chi2) < 1e-9


def test_cem_matches_python_recompute(spark, sf_dir):
    import datetime
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type", "value").collect()
    cut = datetime.datetime(2024, 1, 16)
    pre, post, users = defaultdict(int), defaultdict(int), set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            (pre if r.ts < cut else post)[r.user_id] += round(r.value * 100)
    cells = defaultdict(lambda: [0, 0, 0, 0])  # na, nb, sa, sb
    for u in users:
        b = pre[u] - pre[u] % 25000
        c = cells[b]
        if _arm_of(u):
            c[0] += 1
            c[2] += post[u]
        else:
            c[1] += 1
            c[3] += post[u]
    att_micro = n_a = n_b = ncells = dropped = 0
    for b, (na, nb, sa, sb) in cells.items():
        if na > 0 and nb > 0:
            att_micro += round(1e6 * na * (sa / na - sb / nb))
            n_a += na
            n_b += nb
            ncells += 1
        elif nb == 0:
            dropped += na
    out = _q("causal_cem_att", spark, sf_dir).collect()[0]
    assert (out.n_matched_a, out.n_matched_b, out.n_cells, out.n_dropped_a) == (
        n_a,
        n_b,
        ncells,
        dropped,
    )
    assert n_a > 0, "bucket width must produce matched cells on the fixture"
    assert abs(out.att_dollars - att_micro / 1e6 / n_a / 100.0) < 1e-9


# --- per-doc TextRank / histogram / revenue bridge / LTV -----------------


def test_textrank_doc_keywords_per_doc_properties(spark, sf_dir):
    out = _q("text_textrank_doc_keywords", spark, sf_dir).collect()
    assert out
    from collections import defaultdict

    by_doc = defaultdict(list)
    for r in out:
        by_doc[r.doc_id].append((r.kw_rank, r.word, r.textrank))
    for doc, rows in by_doc.items():
        rows.sort()
        assert [k for k, _, _ in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        scores = [s for _, _, s in rows]
        assert scores == sorted(scores, reverse=True)
        assert len({w for _, w, _ in rows}) == len(rows)
    # spot-check one doc against a local recompute
    doc_id = min(by_doc)
    text = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == doc_id)
        .collect()[0]
        .text
    )
    from collections import Counter

    ws = text.strip().split()
    co = Counter()
    for i, a in enumerate(ws):
        for d in (1, 2):
            if i + d < len(ws) and ws[i + d] != a:
                co[tuple(sorted((a, ws[i + d])))] += 1
    edges = defaultdict(dict)
    for (a, b), c in co.items():
        if c >= 2:
            edges[a][b] = c
            edges[b][a] = c
    if edges:
        SCALE = 1_000_000_000
        outw = {n: sum(v.values()) for n, v in edges.items()}
        pr = {n: SCALE for n in edges}
        for _ in range(3):
            inflow = Counter()
            for u, vs in edges.items():
                for v, w in vs.items():
                    inflow[v] += (pr[u] * w) // outw[u]
            pr = {n: 15 * SCALE // 100 + (85 * inflow[n]) // 100 for n in edges}
        top = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert [(k, w, p / SCALE) for k, (w, p) in enumerate(top, 1)] == by_doc[doc_id]


def test_histogram_covers_all_purchases(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    n = ev.count()
    cents = [round(r.value * 100) for r in ev.select("value").collect()]
    lo, hi = min(cents), max(cents)
    span = hi - lo + 1
    out = _q("events_value_histogram", spark, sf_dir).collect()
    assert sum(r.n_obs for r in out) == n
    from collections import Counter

    expect = Counter(((c - lo) * 20) // span for c in cents)
    assert {r.bin: r.n_obs for r in out} == dict(expect)
    for r in out:
        assert r.bin_lo_cents == lo + (r.bin * span) // 20
        assert 0 <= r.bin < 20


def test_revenue_bridge_telescopes(spark, sf_dir):
    out = sorted(_q("revenue_bridge_weekly", spark, sf_dir).collect(), key=lambda r: r.week)
    prev_total = 0
    for r in out:
        assert (
            r.net_change_cents
            == r.gained_cents + r.churned_cents + r.expansion_cents + r.contraction_cents
        )
        assert r.total_cents == prev_total + r.net_change_cents
        assert r.churned_cents <= 0 <= r.gained_cents
        assert r.contraction_cents <= 0 <= r.expansion_cents
        prev_total = r.total_cents
    # total of last week must equal that week's actual purchase revenue
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").collect()
    from collections import defaultdict
    import datetime

    wk = defaultdict(int)
    for r in ev:
        d = r.ts.date()
        monday = d - datetime.timedelta(days=d.weekday())
        wk[monday] += round(r.value * 100)
    for r in out:
        assert r.total_cents == wk.get(r.week, 0)


def test_ltv_curve_monotone_and_matches_recompute(spark, sf_dir):
    import datetime
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type", "value").collect()
    first = {}
    for r in sorted(ev, key=lambda r: r.ts):
        first.setdefault(r.user_id, r.ts)

    def monday(ts):
        d = ts.date()
        return d - datetime.timedelta(days=d.weekday())

    cohort = {u: monday(t) for u, t in first.items()}
    cs = defaultdict(int)
    for c in cohort.values():
        cs[c] += 1
    sp = defaultdict(int)
    for r in ev:
        if r.event_type == "purchase":
            age = (monday(r.ts) - cohort[r.user_id]).days // 7
            sp[(cohort[r.user_id], age)] += round(r.value * 100)
    out = sorted(
        _q("cohort_ltv_curve", spark, sf_dir).collect(),
        key=lambda r: (r.cohort_week, r.week_age),
    )
    cum = defaultdict(int)
    rows = {}
    for (c, a) in sorted(sp):
        cum[c] += sp[(c, a)]
        rows[(c, a)] = cum[c] / 100.0 / cs[c]
    assert {(r.cohort_week, r.week_age): r.n_users for r in out} == {
        k: cs[k[0]] for k in rows
    }
    for r in out:
        assert abs(r.cum_spend_per_user - rows[(r.cohort_week, r.week_age)]) < 1e-9
    # cumulative per-user spend is nondecreasing in age within a cohort
    from itertools import groupby

    for c, grp in groupby(out, key=lambda r: r.cohort_week):
        vals = [r.cum_spend_per_user for r in grp]
        assert vals == sorted(vals)


# --- semantic decontamination / hard negatives ---------------------------


def test_semantic_decon_flags_exactly_planted_bases(spark, sf_dir):
    out = _q("decontaminate_semantic", spark, sf_dir).collect()
    flagged = {r.doc_id for r in out}
    # the planted eval set consists of exact + suffixed copies of base
    # docs 0..19 — the exact copies guarantee those bases are flagged
    assert set(range(20)) <= flagged
    for r in out:
        if r.doc_id < 20:
            assert r.max_eval_cos == 1.0  # exact copy present in eval


def test_hard_negatives_match_brute_force(spark, sf_dir):
    import math

    rows = load_table(spark, sf_dir, "embeddings").collect()
    emb = {r.vec_id: (r.embedding, r.label) for r in rows}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return 0.0 if na == 0 or nb == 0 else dot / (na * nb)

    out = _q("mine_hard_negatives", spark, sf_dir).collect()
    for qid in range(5):
        qv, ql = emb[qid]
        cands = sorted(
            (
                (round(cos(v, qv), 6), -vid)
                for vid, (v, lab) in emb.items()
                if lab != ql
            ),
            reverse=True,
        )[:3]
        expect = [(-nvid, s) for s, nvid in cands]
        got = sorted(
            ((r.vec_id, r.similarity) for r in out if r.query_id == qid),
            key=lambda t: (-t[1], t[0]),
        )
        assert got == expect
        for r in out:
            if r.query_id == qid:
                assert r.label != ql


# --- scene changes / backlog ---------------------------------------------


def test_scene_changes_match_python_recompute(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expect = set()
    for r in docs:
        b = r.text.encode()
        n = len(b)
        nf = n % 30 + 1
        fl = max(n // nf, 1)
        ints = [sum(b[f * fl : f * fl + fl]) for f in range(nf)]
        for f in range(1, nf):
            d = ints[f] - ints[f - 1]
            expect.add(
                (r.doc_id, f, ints[f], ints[f - 1], d, 20 * abs(d) > ints[f] + ints[f - 1])
            )
    got = {
        (r.doc_id, r.frame_no, r.intensity, r.prev_intensity, r.delta, r.is_cut)
        for r in _q("multimodal_scene_changes", spark, sf_dir).collect()
    }
    assert got == expect
    assert any(cut for *_, cut in got)  # the threshold actually fires


def test_backlog_matches_python_sweep(spark, sf_dir):
    import datetime
    from collections import defaultdict

    def _day(v):
        return v.date() if isinstance(v, datetime.datetime) else v

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate").collect()
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate").collect()
    last_ship = {}
    for r in li:
        d = _day(r.l_shipdate)
        if r.l_orderkey not in last_ship or d > last_ship[r.l_orderkey]:
            last_ship[r.l_orderkey] = d
    deltas = defaultdict(int)
    for r in orders:
        if r.o_orderkey in last_ship:
            deltas[_day(r.o_orderdate)] += 1
            deltas[last_ship[r.o_orderkey] + datetime.timedelta(days=1)] -= 1
    out = sorted(_q("orders_backlog_daily", spark, sf_dir).collect(), key=lambda r: r.day)
    run = 0
    expect = {}
    for d in sorted(deltas):
        run += deltas[d]
        expect[d] = run
    assert {r.day: r.open_orders for r in out} == expect
    assert expect[max(expect)] == 0  # every order eventually ships
    assert max(expect.values()) > 0


# --- elasticity / Wilson / seasonal anomaly ------------------------------


def test_elasticity_matches_numpy_per_group(spark, sf_dir):
    import numpy as np
    from collections import defaultdict

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice").collect()
    pt = {r.p_partkey: r.p_brand for r in load_table(spark, sf_dir, "part").select("p_partkey", "p_brand").collect()}
    by_brand = defaultdict(list)
    for r in li:
        lnp = round(np.log(r.l_extendedprice / r.l_quantity) * 1000)
        lnq = round(np.log(r.l_quantity) * 1000)
        by_brand[pt[r.l_partkey]].append((lnp, lnq))
    out = {r.p_brand: r for r in _q("price_elasticity_by_brand", spark, sf_dir).collect()}
    for brand, pts in by_brand.items():
        if len(pts) < 30:
            assert brand not in out
            continue
        x = np.array([a for a, _ in pts], dtype=float)
        y = np.array([b for _, b in pts], dtype=float)
        slope = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        assert out[brand].n_lines == len(pts)
        assert abs(out[brand].elasticity - slope) < 1e-9
        assert abs(out[brand].r2 - r2) < 1e-9


def test_wilson_ci_properties(spark, sf_dir):
    out = _q("ab_test_wilson_ci", spark, sf_dir).collect()
    assert {r.arm for r in out} == {"A", "B"}
    import math

    z = 1.959963984540054
    for r in out:
        assert 0.0 <= r.wilson_lo <= r.conv_rate <= r.wilson_hi <= 1.0
        p, n = r.n_converted / r.n_users, r.n_users
        centre = (p + z * z / (2 * n)) / (1 + z * z / n)
        half = (
            z
            * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
            / (1 + z * z / n)
        )
        assert abs(r.wilson_lo - (centre - half)) < 1e-12
        assert abs(r.wilson_hi - (centre + half)) < 1e-12


def test_seasonal_anomaly_matches_python(spark, sf_dir):
    import datetime
    import math
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value").collect()
    daily = defaultdict(int)
    for r in ev:
        if r.event_type == "purchase":
            daily[r.ts.date()] += round(r.value * 100)
    days = sorted(set(daily) | set())
    # fill: only days with events appear; the query's day grid is the same
    det = {}
    for i in range(3, len(days) - 3):
        s7 = sum(daily[days[j]] for j in range(i - 3, i + 4))
        det[days[i]] = 7 * daily[days[i]] - s7
    dow = defaultdict(list)
    epoch = datetime.date(1970, 1, 1)
    for d, v in det.items():
        dow[(d - epoch).days % 7].append(v)
    def _round_half_away(x):
        # SQL round(): half away from zero; python round(): half to even
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    means = {k: sum(v) / len(v) for k, v in dow.items()}
    r_unit = {
        d: _round_half_away(v - means[(d - epoch).days % 7]) for d, v in det.items()
    }
    vals = list(r_unit.values())
    n = len(vals)
    # use the query's exact moment formula — the centered-sum form is
    # algebraically equal but fp-different in the last ulp
    s, sq = sum(vals), sum(x * x for x in vals)
    mu = s / n
    sd = math.sqrt((sq - s * s / n) / (n - 1))
    expect = {
        d: _round_half_away(1e6 * (x - mu) / sd)
        for d, x in r_unit.items()
        if abs(_round_half_away(1e6 * (x - mu) / sd)) > 1900000
    }
    out = _q("events_seasonal_anomaly", spark, sf_dir).collect()
    assert {r.day: _round_half_away(r.z * 1e6) for r in out} == expect


# --- CMS join-size estimate ----------------------------------------------


def test_cms_join_size_one_sided_and_exact_matches(spark, sf_dir):
    import datetime
    from collections import Counter

    out = _q("sketch_cms_join_size", spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_shipdate").collect()
    cut = datetime.date(1995, 6, 1)

    def _day(v):
        return v.date() if isinstance(v, datetime.datetime) else v

    a = Counter(r.l_suppkey for r in li if _day(r.l_shipdate) < cut)
    b = Counter(r.l_suppkey for r in li if _day(r.l_shipdate) >= cut)
    exact = sum(a[k] * b[k] for k in a if k in b)
    assert out.exact_rows == exact
    # count-min inner product never underestimates
    assert out.est_rows >= exact
    assert out.overestimate_ratio >= 1.0
    # ...and with 4096 cells over this key domain it should be close
    assert out.overestimate_ratio < 3.0


# --- recommender eval ----------------------------------------------------


def test_reco_hitrate_matches_python_recompute(spark, sf_dir):
    import hashlib
    import json
    from collections import Counter, defaultdict

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "props").collect()
    ui = {
        (r.user_id, int(json.loads(r.props)["k"]))
        for r in ev
        if r.event_type in ("click", "purchase")
    }
    by_user = defaultdict(set)
    for u, i in ui:
        by_user[u].add(i)
    multi = {u for u, items in by_user.items() if len(items) >= 2}

    def hk(u, i):
        return int(hashlib.md5(f"loo42|{u}|{i}".encode()).hexdigest()[:13], 16)

    hold, train = {}, defaultdict(set)
    for u in multi:
        ranked = sorted(by_user[u], key=lambda i: (-hk(u, i), i))
        hold[u] = ranked[0]
        train[u] = set(ranked[1:])
    co = defaultdict(int)
    for u in multi:
        for a in train[u]:
            for b in train[u]:
                if a != b:
                    co[(a, b)] += 1
    pop = Counter()
    for u in multi:
        pop.update(train[u])
    cf_hits = pop_hits = 0
    for u in multi:
        scores = defaultdict(int)
        for t in train[u]:
            for (a, b), c in co.items():
                if a == t:
                    scores[b] += c
        cand = [(s, i) for i, s in scores.items() if i not in train[u]]
        top3 = [i for _, i in sorted(((-s, i) for s, i in ((s, i) for s, i in cand)))[:3]]
        if hold[u] in top3:
            cf_hits += 1
        ptop = [
            i
            for i in sorted(pop, key=lambda i: (-pop[i], i))
            if i not in train[u]
        ][:3]
        if hold[u] in ptop:
            pop_hits += 1
    out = _q("eval_reco_hitrate", spark, sf_dir).collect()[0]
    assert out.n_eval_users == len(multi)
    assert (out.cf_hits, out.pop_hits) == (cf_hits, pop_hits)
    assert abs(out.cf_hitrate3 - cf_hits / len(multi)) < 1e-12


# --- winnow pairs / funnel z / inter-arrival fit -------------------------


def test_winnow_pairs_find_all_planted_copies(spark, sf_dir):
    out = {(r.doc_a, r.doc_b): r.shared_fingerprints for r in _q("dedup_winnow_pairs", spark, sf_dir).collect()}
    EX, NEAR = 1_000_000_000_000, 2_000_000_000_000
    for base in range(20):
        assert (base, base + EX) in out, f"exact copy pair for base {base} missing"
        assert (base, base + NEAR) in out, f"near copy pair for base {base} missing"
        assert (base + EX, base + NEAR) in out
    # exact copies share every fingerprint of the base doc
    for base in range(20):
        assert out[(base, base + EX)] >= out.get((base, base + NEAR), 0)


def test_funnel_steps_consistent_with_unkeyed_funnel(spark, sf_dir):
    out = {r.step_no: r for r in _q("ab_test_funnel_steps", spark, sf_dir).collect()}
    base = {r.step_no: r.users for r in _q("funnel_signup_click_purchase", spark, sf_dir).collect()}
    # arm counts partition the unkeyed funnel's counts at each step
    assert out[2].n_a + out[2].n_b == base[1]
    assert out[2].k_a + out[2].k_b == base[2]
    assert out[3].k_a + out[3].k_b == base[3]
    for r in out.values():
        if r.z_pooled is not None:
            assert abs(r.z_pooled) < 10


def test_interarrival_matches_python(spark, sf_dir):
    import math
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type").collect()
    by_user = defaultdict(list)
    for r in ev:
        if r.event_type == "purchase":
            by_user[r.user_id].append(int(r.ts.timestamp()))
    gaps = []
    for ts in by_user.values():
        ts.sort()
        gaps += [(b - a) // 60 for a, b in zip(ts, ts[1:])]
    n, s = len(gaps), sum(gaps)
    out = _q("events_interarrival_expfit", spark, sf_dir).collect()[0]
    assert out.n_gaps == n
    assert abs(out.mean_gap_min - s / n) < 1e-9
    assert abs(out.lambda_per_hour - 60.0 * n / s) < 1e-9
    # recompute KS with the query's grid rule
    from collections import Counter

    lam = n / s
    cnt = Counter(gaps)
    cum = 0
    dmax = 0
    for g in sorted(cnt):
        cum += cnt[g]
        emp = round(1e6 * cum / n)
        model = 1_000_000 - round(1e6 * math.exp(-lam * (g + 1.0)))
        dmax = max(dmax, abs(emp - model))
    assert abs(out.ks_stat - dmax / 1e6) < 1e-12


# --- analogy / expectations / churn labels -------------------------------


def test_analogy_matches_brute_force(spark, sf_dir):
    import math

    emb = {r.vec_id: r.embedding for r in load_table(spark, sf_dir, "embeddings").collect()}
    tv = [a - b + c for a, b, c in zip(emb[1], emb[2], emb[3])]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return 0.0 if na == 0 or nb == 0 else dot / (na * nb)

    expect = sorted(
        ((round(cos(v, tv), 6), -vid) for vid, v in emb.items() if vid not in (1, 2, 3)),
        reverse=True,
    )[:5]
    out = [(r.similarity, -r.vec_id) for r in _q("knn_analogy", spark, sf_dir).collect()]
    for (es, ei), (gs, gi) in zip(expect, out):
        assert ei == gi
        assert abs(es - gs) < 2e-6  # float32 vs float64 target assembly


def test_expectations_all_pass_on_clean_fixture(spark, sf_dir):
    out = {r.expectation: r for r in _q("audit_expectations", spark, sf_dir).collect()}
    assert len(out) == 6
    for name, r in out.items():
        assert r.n_checked > 0
        assert r.passed and r.n_violations == 0, name


def test_churn_labels_consistent(spark, sf_dir):
    import datetime

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    h = max(r.ts for r in ev)
    from collections import defaultdict

    first, last = {}, {}
    for r in ev:
        if r.user_id not in first or r.ts < first[r.user_id]:
            first[r.user_id] = r.ts
        if r.user_id not in last or r.ts > last[r.user_id]:
            last[r.user_id] = r.ts

    def monday(ts):
        d = ts.date()
        return d - datetime.timedelta(days=d.weekday())

    from collections import Counter

    users_by_cohort = Counter(monday(t) for t in first.values())
    churned_by_cohort = Counter(
        monday(first[u]) for u in first if last[u] < h - datetime.timedelta(days=14)
    )
    out = {r.cohort_week: r for r in _q("churn_labels_cohort", spark, sf_dir).collect()}
    assert {c: r.n_users for c, r in out.items()} == dict(users_by_cohort)
    for c, r in out.items():
        assert r.n_churned == churned_by_cohort.get(c, 0)
        assert abs(r.churn_rate - r.n_churned / r.n_users) < 1e-12


# --- overdispersion / k-fold CV ------------------------------------------


def test_overdispersion_matches_python(spark, sf_dir):
    from collections import Counter, defaultdict

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    days = {r.ts.date() for r in ev}
    nd = len(days)
    by_type = defaultdict(Counter)
    for r in ev:
        by_type[r.event_type][r.ts.date()] += 1
    out = {r.event_type: r for r in _q("stats_overdispersion_daily", spark, sf_dir).collect()}
    assert set(out) == set(by_type)
    for t, cnt in by_type.items():
        tot = sum(cnt.values())
        sq = sum(c * c for c in cnt.values())
        mean = tot / nd
        var = (sq - tot * tot / nd) / (nd - 1)
        assert out[t].n_days == nd and out[t].n_events == tot
        assert abs(out[t].dispersion_index - var / mean) < 1e-9
        assert abs(out[t].chi2_dispersion - (nd - 1) * var / mean) < 1e-6


def test_kfold_cv_matches_numpy(spark, sf_dir):
    import hashlib

    import numpy as np
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value").collect()
    act, spend = defaultdict(int), defaultdict(int)
    for r in ev:
        act[r.user_id] += 1
        if r.event_type == "purchase":
            spend[r.user_id] += round(r.value * 100)
    folds = defaultdict(list)
    for u in act:
        f = int(hashlib.md5(f"cv42|{u}".encode()).hexdigest()[:13], 16) % 5
        folds[f].append((act[u], spend[u]))
    out = {r.fold: r for r in _q("regress_kfold_cv", spark, sf_dir).collect()}
    assert set(out) == set(folds)
    for f, test in folds.items():
        train = [p for g, pts in folds.items() if g != f for p in pts]
        x = np.array([a for a, _ in train], dtype=float)
        y = np.array([b for _, b in train], dtype=float)
        b1 = ((len(x) * (x * y).sum() - x.sum() * y.sum())
              / (len(x) * (x * x).sum() - x.sum() ** 2))
        b0 = (y.sum() - b1 * x.sum()) / len(x)
        tx = np.array([a for a, _ in test], dtype=float)
        ty = np.array([b for _, b in test], dtype=float)
        sse = ((ty - b0 - b1 * tx) ** 2).sum()
        r = out[f]
        assert (r.n_train, r.n_test) == (len(train), len(test))
        assert abs(r.beta1 - b1) < 1e-9
        assert abs(r.rmse_test_dollars - np.sqrt(sse / len(test)) / 100.0) < 1e-6


# --- pinball quantile forecast eval --------------------------------------


def test_pinball_matches_python(spark, sf_dir):
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value").collect()
    daily = defaultdict(int)
    for r in ev:
        if r.event_type == "purchase":
            daily[r.ts.date()] += round(r.value * 100)
    days = sorted(daily)
    H, QS = 14, ((1, 2), (5, 7), (9, 13))
    agg = {q: [0, 0, 0] for q, _ in QS}  # n, pinball10, covered
    for i in range(H, len(days)):
        y = daily[days[i]]
        hist = sorted(
            (daily[d], d) for d in days[i - H : i]
        )
        for q10, rk in QS:
            fc = hist[rk - 1][0]
            loss10 = q10 * (y - fc) if y >= fc else (q10 - 10) * (y - fc)
            a = agg[q10]
            a[0] += 1
            a[1] += loss10
            a[2] += 1 if y <= fc else 0
    out = {int(r.quantile_pct): r for r in _q("forecast_quantile_pinball", spark, sf_dir).collect()}
    for q10, _ in QS:
        n, p10, cov = agg[q10]
        r = out[q10 * 10]
        assert r.n_days == n
        assert abs(r.mean_pinball_dollars - p10 / (10 * n) / 100.0) < 1e-9
        assert abs(r.coverage - cov / n) < 1e-12
    # coverage ordering: higher quantiles cover more
    assert out[10].coverage <= out[50].coverage <= out[90].coverage
