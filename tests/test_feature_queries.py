"""Feature-engineering / governance tail: semantics checked against
independent python/duckdb re-implementations (the oracle gate already
cross-checks DuckDB SQL; these pin the math and the invariants)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.feature_queries import _FH_BUCKETS
from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _docs(sf_dir):
    return duckdb.sql(
        f"SELECT doc_id, text, lang, source, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()


def test_woe_iv_matches_python_log_odds(spark, sf_dir):
    rows = _q("feature_woe_iv", spark, sf_dir).collect()
    pos, neg = Counter(), Counter()
    for _, _, lang, source, _ in _docs(sf_dir):
        (pos if lang == "en" else neg)[source] += 1
    srcs = sorted(set(pos) | set(neg))
    assert [r.source for r in rows] == srcs
    p_tot, n_tot = sum(pos.values()), sum(neg.values())
    for r in rows:
        p, n = pos[r.source], neg[r.source]
        assert (r.pos, r.neg) == (p, n)
        woe = round(1e6 * math.log(((p + 0.5) * n_tot) / ((n + 0.5) * p_tot)))
        assert r.woe_micro == woe
        delta = p / p_tot - n / n_tot
        assert r.iv_micro == round(delta * woe)
        # sign law: a category over-representing the positive class gets
        # positive WOE, and every IV contribution is >= 0 up to smoothing
        if p / p_tot > n / n_tot:
            assert r.woe_micro > 0


def test_hash_buckets_match_python_md5_mapping(spark, sf_dir):
    rows = _q("feature_hash_buckets", spark, sf_dir).collect()
    signed = defaultdict(int)
    count = defaultdict(int)
    feats = defaultdict(set)
    for _, _, lang, source, _ in _docs(sf_dir):
        for feat in (f"lang={lang}", f"source={source}"):
            h = int(hashlib.md5(f"fh42|{feat}".encode()).hexdigest()[:13], 16)
            b = h % _FH_BUCKETS
            signed[b] += 1 if (h // _FH_BUCKETS) % 2 == 0 else -1
            count[b] += 1
            feats[b].add(feat)
    assert {r.bucket: r.signed_count for r in rows} == dict(signed)
    assert {r.bucket: r.feat_count for r in rows} == dict(count)
    assert {r.bucket: r.distinct_feats for r in rows} == {
        b: len(s) for b, s in feats.items()
    }
    # stateless total-mass law: every doc emits exactly two features
    assert sum(r.feat_count for r in rows) == 2 * len(_docs(sf_dir))


def test_l_diversity_flags_exactly_the_homogeneous_classes(spark, sf_dir):
    rows = _q("audit_l_diversity", spark, sf_dir).collect()
    classes = defaultdict(set)
    sizes = Counter()
    for _, _, lang, source, n_chars in _docs(sf_dir):
        k = (lang, n_chars // 100)
        classes[k].add(source)
        sizes[k] += 1
    expect = {k: (sizes[k], len(v)) for k, v in classes.items() if len(v) < 3}
    got = {(r.lang, r.len_bucket): (r.group_size, r.l_distinct) for r in rows}
    assert got == expect
    # the audit is the HOMOGENEITY screen: every flagged class has l < 3
    # even when its k-anonymity group size is large
    assert all(r.l_distinct < 3 for r in rows)


def test_distinct_ngram_ratio_matches_python_counts(spark, sf_dir):
    rows = _q("text_distinct_ngram_ratio", spark, sf_dir).collect()
    tok_n, tok_d = Counter(), defaultdict(set)
    bg_n, bg_d = Counter(), defaultdict(set)
    for _, text, lang, _, _ in _docs(sf_dir):
        w = text.strip().split()
        if not w:
            continue
        tok_n[lang] += len(w)
        tok_d[lang].update(w)
        for a, b in zip(w, w[1:]):
            bg_n[lang] += 1
            bg_d[lang].add(f"{a} {b}")
    for r in rows:
        assert r.tokens == tok_n[r.lang]
        assert r.distinct_tokens == len(tok_d[r.lang])
        assert r.bigrams == bg_n[r.lang]
        assert r.distinct_bigrams == len(bg_d[r.lang])
        assert r.ttr == len(tok_d[r.lang]) / tok_n[r.lang]
        assert r.distinct_2 == len(bg_d[r.lang]) / bg_n[r.lang]
        # diversity laws: bigrams are rarer but more distinct-per-token
        assert 0 < r.ttr <= 1 and 0 < r.distinct_2 <= 1
        assert r.distinct_2 >= r.ttr * 0.5  # bigram space is richer
