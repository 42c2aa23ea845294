"""Dedup + text-analysis operator tests (LLM-data-pipeline surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.functions.text import word_shingles
from rag_application_with_vectordb_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from rag_application_with_vectordb_spark.operators.multimodal import (
    decode_media_stub,
    with_binary_payload,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (3, "completely different content about spark engines"),
        (4, "  THE  quick   brown fox jumps over the lazy dog "),  # ws/case dup of 0
        (5, "tiny"),  # < 3 tokens → no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    out = {r["doc_id"]: r for r in exact_dup_groups(docs).collect()}
    # 0, 1, 4 normalize to the same fingerprint; 0 is canonical
    assert out[0]["group_size"] == 3 and out[0]["is_canonical"]
    assert out[1]["group_size"] == 3 and not out[1]["is_canonical"]
    assert out[4]["group_size"] == 3 and not out[4]["is_canonical"]
    assert out[3]["group_size"] == 1 and out[3]["is_canonical"]


def test_shingles_set_semantics(spark):
    df = spark.createDataFrame([("a b a b a b",)], "text string")
    out = df.select(word_shingles(F.col("text"), 3).alias("s")).first()["s"]
    assert sorted(out) == ["a b a", "b a b"]  # distinct


def test_ngram_jaccard_exact(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r for r in ngram_jaccard_pairs(docs).collect()
    }
    assert pairs[(0, 1)]["jaccard"] == 1.0
    near = pairs[(0, 2)]
    # "lazy"→"sleepy" changes 2 of 7 shingles: |∩|=5, |∪|=9
    assert near["intersection"] == 5
    assert near["jaccard"] == pytest.approx(5 / 9)
    assert (0, 3) not in pairs  # nothing shared
    assert not any(5 in p for p in pairs)  # shingle-less doc never appears


def test_minhash_signature_shape_and_dup_equality(docs):
    sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(docs, num_hashes=12).collect()}
    assert len(sigs[0]) == 12
    assert sigs[0] == sigs[1]  # identical text → identical signature
    assert sigs[0] != sigs[3]


def test_minhash_agreement_tracks_jaccard(docs):
    # MinHash property: P(sig element agrees) = Jaccard. With a fixed
    # hash family this is deterministic per pair — check the near-dup
    # pair's agreement lands in a sane band around its true Jaccard (5/9).
    sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(docs, num_hashes=12).collect()}
    agree = sum(a == b for a, b in zip(sigs[0], sigs[2])) / 12
    true_j = 5 / 9
    assert abs(agree - true_j) <= 0.35  # 12 hashes → coarse but bounded
    # and an unrelated pair agrees (much) less than the near-dup pair
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[3])) / 12
    assert agree_far < agree


def test_minhash_lsh_finds_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in minhash_lsh_pairs(docs).collect()}
    assert pairs[(0, 1)] == 1.0  # exact dup always collides in every band
    assert (0, 3) not in pairs


def test_minhash_lsh_persist_is_optional_and_releasable(docs):
    # r6 ADVICE: the operator's internal persist must not be a
    # session-lifetime leak for callers looping over different inputs —
    # persist=False recomputes (identical pairs), and intermediates=
    # hands back the cached relations for explicit unpersist.
    want = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, persist=False).collect()
    }
    assert got == want
    held: list = []
    out = minhash_lsh_pairs(docs, intermediates=held)
    assert {(r["doc_a"], r["doc_b"]) for r in out.collect()} == want
    assert len(held) == 2  # shingle sets + signatures
    for df in held:
        assert df.storageLevel.useMemory
        df.unpersist()
        assert not df.storageLevel.useMemory


def test_simhash_near_for_near_dups(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=32).collect()}
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] < pairs[(0, 3)]  # near-dup closer than unrelated


def test_embedding_neardup(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.99, 0.01, 0.0]),
            (2, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = embedding_neardup_pairs(emb, min_cosine=0.95).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(0, 1)]


def test_multimodal_stub_plumbing(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "x" * 700)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in decode_media_stub(with_binary_payload(df)).collect()}
    assert out[1]["n_bytes"] == 5 and out[1]["width"] == 5
    assert out[2]["n_bytes"] == 700 and out[2]["width"] == 700 % 640
    assert out[2]["height"] == (700 * 7) % 480
    assert out[2]["n_frames"] == 700 % 30 + 1


def test_multimodal_resize_and_frame_sample_bytes(spark):
    from rag_application_with_vectordb_spark.operators.multimodal import (
        resize_media_stub,
        sample_frames_stub,
    )

    text = "a" * 5000  # > 64*48 budget, 5000 % 30 + 1 = 21 frames
    df = spark.createDataFrame([(1, text), (2, "tiny")], "doc_id long, text string")

    resized = {r["doc_id"]: r for r in resize_media_stub(with_binary_payload(df)).collect()}
    assert resized[1]["orig_bytes"] == 5000
    assert resized[1]["resized_bytes"] == 64 * 48
    assert bytes(resized[1]["resized"]) == b"a" * (64 * 48)
    assert resized[2]["resized_bytes"] == 4  # under budget: unchanged
    assert bytes(resized[2]["resized"]) == b"tiny"

    frames = [
        r
        for r in sample_frames_stub(with_binary_payload(df)).collect()
        if r["doc_id"] == 1
    ]
    n_frames, frame_len = 5000 % 30 + 1, 5000 // (5000 % 30 + 1)
    assert [r["frame_no"] for r in frames] == list(range(0, n_frames, 5))
    for r in frames:
        assert r["frame_off"] == r["frame_no"] * frame_len
        assert bytes(r["frame"]) == b"a" * frame_len


def test_simhash_blocked_equals_allpairs(spark, sf_dir):
    # Pigeonhole blocking must be lossless: identical output to the
    # all-pairs form at the same threshold, on a real corpus slice.
    from rag_application_with_vectordb_spark.operators.dedup import simhash_blocked_pairs
    from rag_application_with_vectordb_spark.sources.catalog import load_table

    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    brute = {(r["doc_a"], r["doc_b"], r["hamming"])
             for r in simhash_pairs(corpus, max_hamming=3).collect()}
    blocked = {(r["doc_a"], r["doc_b"], r["hamming"])
               for r in simhash_blocked_pairs(corpus, max_hamming=3).collect()}
    assert blocked == brute
    assert blocked  # non-vacuous on the fixture corpus


def test_simhash_blocked_rejects_uneven_chunks(docs):
    from rag_application_with_vectordb_spark.operators.dedup import simhash_blocked_pairs

    with pytest.raises(ValueError):
        simhash_blocked_pairs(docs, max_hamming=4, bits=32)  # 32 % 5 != 0


def test_duplicate_components_merge_planted_triples(spark, sf_dir):
    from rag_application_with_vectordb_spark.plans.registry import load_all

    from rag_application_with_vectordb_spark.plans.dedup_queries import (
        _AUG_EXACT_OFF,
        _AUG_NEAR_OFF,
    )

    rows = {r.doc_id: r for r in load_all()["dedup_components"].fn(spark, sf_dir).collect()}
    # planted: doc d<20 has an exact copy (d+_AUG_EXACT_OFF) and a near
    # copy (d+_AUG_NEAR_OFF); all three must land in one component whose
    # canonical (min) id is the original
    for d in range(20):
        assert rows[d + _AUG_EXACT_OFF].component_id == rows[d].component_id
        assert rows[d + _AUG_NEAR_OFF].component_id == rows[d].component_id
        assert rows[d].component_id <= d
        assert rows[d + _AUG_EXACT_OFF].is_canonical == 0
        assert rows[d + _AUG_NEAR_OFF].is_canonical == 0
    # component_size consistent with membership counts
    from collections import Counter

    sizes = Counter(r.component_id for r in rows.values())
    for r in rows.values():
        assert r.component_size == sizes[r.component_id]
    # exactly one canonical row per component
    canon = Counter(r.component_id for r in rows.values() if r.is_canonical == 1)
    assert set(canon) == set(sizes) and all(v == 1 for v in canon.values())


def test_embedding_lsh_pairs_subset_of_exact(spark, sf_dir):
    """LSH blocking must only DROP pairs vs the exact all-pairs form,
    never invent or rescore one; and same-bucket near-identical vectors
    must survive."""
    from rag_application_with_vectordb_spark.operators.dedup import (
        embedding_lsh_neardup_pairs,
    )
    from rag_application_with_vectordb_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(emb, min_cosine=0.15).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_lsh_neardup_pairs(emb, n_planes=4, min_cosine=0.15).collect()
    }
    assert set(blocked) <= set(exact)
    for k, v in blocked.items():
        assert abs(v - exact[k]) < 1e-12
    # a vector paired with its own duplicate always collides (θ = 0)
    base = emb.select("vec_id", "embedding")
    dup = base.limit(1).select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    aug = base.unionByName(dup)
    self_pair = (
        embedding_lsh_neardup_pairs(aug, n_planes=4, min_cosine=0.99)
        .filter(F.col("id_b") >= 100000)
        .collect()
    )
    assert len(self_pair) == 1 and self_pair[0]["cosine"] > 0.999999


def test_kmv_estimate_properties(spark, sf_dir):
    from rag_application_with_vectordb_spark.plans.registry import load_all

    specs = load_all()
    rows = {
        r["o_orderstatus"]: r
        for r in specs["approx_distinct_kmv"].fn(spark, sf_dir).collect()
    }
    for status, r in rows.items():
        exact = r["exact_customers"]
        est = r["approx_customers_kmv"]
        if exact < 64:  # below sketch size the estimate IS the exact count
            assert est == float(exact)
        else:  # KMV with k=64 has ~1/sqrt(62) relative error; allow 5 sigma
            assert abs(est - exact) / exact < 0.65, (status, est, exact)


def test_prefix_filter_is_lossless_and_prunes(spark, sf_dir):
    from pyspark.sql import functions as F

    from rag_application_with_vectordb_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    from rag_application_with_vectordb_spark.plans.dedup_queries import (
        _augmented_docs,
    )

    docs = _augmented_docs(spark, sf_dir)
    t = 0.5
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_filter_jaccard_pairs(docs, threshold=t).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, min_jaccard=t).collect()
    }
    # LOSSLESS: prefix filtering finds exactly the >= t pairs
    assert got == want
    assert len(got) > 0
    # and it actually prunes: the prefix posting join generates strictly
    # fewer candidate pairs than the any-shared-shingle join
    full_candidates = ngram_jaccard_pairs(docs, min_jaccard=0.0).count()
    assert len(got) < full_candidates


def test_prefix_filter_per_doc_ordinal_is_equivalent(spark, sf_dir):
    # The scale formulation (no vocabulary-wide window; each doc orders
    # its postings by the (df, shingle) key directly) must produce the
    # bit-identical pair set: same total order -> same prefixes.
    from rag_application_with_vectordb_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )
    from rag_application_with_vectordb_spark.plans.dedup_queries import (
        _augmented_docs,
    )

    docs = _augmented_docs(spark, sf_dir)
    for t in (0.4, 0.5):
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in prefix_filter_jaccard_pairs(
                docs, threshold=t, vocab_ordinal="per-doc"
            ).collect()
        }
        want = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in prefix_filter_jaccard_pairs(docs, threshold=t).collect()
        }
        assert got == want
        assert len(got) > 0


def test_decontaminate_flags_planted_leaks(spark, sf_dir):
    # The eval split (doc_id >= 10000) contains exact + suffixed copies of
    # base docs 0-19; decontamination must flag ALL of them, with the
    # exact copies fully covered (every 8-gram leaked).
    from pyspark.sql import functions as F

    from rag_application_with_vectordb_spark.operators.dedup import decontaminate
    from rag_application_with_vectordb_spark.plans.dedup_queries import (
        _augmented_docs,
    )

    aug = _augmented_docs(spark, sf_dir)
    out = decontaminate(
        aug.filter(F.col("doc_id") < 10000),
        aug.filter(F.col("doc_id") >= 10000),
        n=8,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    planted = [d for d in range(20) if d in rows]
    # every base doc with >= 8 tokens must be flagged, fully covered
    n_tokens = {
        r["doc_id"]: len(r["text"].split())
        for r in aug.filter(F.col("doc_id") < 20).collect()
    }
    for d in range(20):
        if n_tokens[d] >= 8:
            assert d in rows, f"leaked doc {d} not flagged"
            assert rows[d]["contam_fraction"] == 1.0  # exact copy leaks every gram
    assert len(planted) > 0
    # contamination is rare outside the planted leaks (word-salad corpus)
    accidental = [d for d in rows if d >= 20]
    assert len(accidental) < len(rows) / 2


def test_audio_frames_exact_features_and_partial_last_frame(spark):
    from rag_application_with_vectordb_spark.operators.multimodal import (
        audio_frames_stub,
    )

    text = "A" * 64 + "z" * 10  # one full frame + a 10-sample partial
    df = spark.createDataFrame([(1, text), (2, "")], "doc_id long, text string")
    rows = sorted(
        audio_frames_stub(with_binary_payload(df)).collect(),
        key=lambda r: (r.doc_id, r.frame_id),
    )
    # empty payload -> no frames at all
    assert [r.doc_id for r in rows] == [1, 1]
    f0, f1 = rows
    a, z = ord("A") - 128, ord("z") - 128
    assert (f0.n_samples, f0.energy, f0.peak) == (64, 64 * a * a, abs(a))
    assert (f1.frame_id, f1.n_samples, f1.energy, f1.peak) == (1, 10, 10 * z * z, abs(z))


def test_plan_lsh_bands_minimizes_step_error():
    from rag_application_with_vectordb_spark.operators.dedup import plan_lsh_bands

    def err(b, r, t):
        tot = 0.0
        for i in range(1, 1000):
            s = i / 1000.0
            p = 1.0 - (1.0 - s**r) ** b
            tot += p if s < t else (1.0 - p)
        return tot

    for t in (0.3, 0.5, 0.7, 0.9):
        for n in (12, 64, 128):
            b, r = plan_lsh_bands(t, n)
            assert b * r == n
            chosen = err(b, r, t)
            for r2 in range(1, n + 1):
                if n % r2 == 0:
                    assert chosen <= err(n // r2, r2, t) + 1e-12
    # steeper similarity targets need more rows per band (monotone in t)
    rows = [plan_lsh_bands(t, 64)[1] for t in (0.3, 0.5, 0.7, 0.9)]
    assert rows == sorted(rows)
    # the engine's default catalog plan (12 hashes, 4 bands of 3) is the
    # planner's own choice for a ~0.5 target — pin that correspondence
    assert plan_lsh_bands(0.5, 12) == (4, 3)


def test_ngram_jaccard_max_df_guard(docs, spark):
    # The stopword-shingle guard (round 8, found at sf10): max_df drops
    # ultra-frequent shingles from CANDIDATE GENERATION only; surviving
    # pairs verify against the full shingle sets, so every reported
    # (intersection, jaccard) value stays exact.
    # (a) a cap that never binds reproduces the anchor exactly
    anchor = {
        (r.doc_a, r.doc_b): (r.intersection, r.size_a, r.size_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): (r.intersection, r.size_a, r.size_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, max_df=1000).collect()
    }
    assert capped == anchor

    # (b) a degenerate corpus: many docs share one stopword-ish shingle
    # chain, two docs are true near-dups through a SELECTIVE shingle.
    # With the cap the stopword shingle stops generating candidates,
    # but the near-dup pair still surfaces and its values stay exact
    # (verified against the full sets, cap notwithstanding).
    rows = [(i, "aaa bbb ccc extra%d word%d" % (i, i)) for i in range(40)]
    rows += [(100, "xxx yyy zzz qqq www"), (101, "xxx yyy zzz qqq vvv")]
    deg = spark.createDataFrame(rows, "doc_id long, text string")
    # 'aaa bbb ccc' has df=40 > cap=10 → the 40 filler docs generate NO
    # candidate pairs; 'xxx yyy zzz'/'yyy zzz qqq' have df=2 → survive
    out = {
        (r.doc_a, r.doc_b): r
        for r in ngram_jaccard_pairs(deg, max_df=10).collect()
    }
    assert set(out) == {(100, 101)}
    r = out[(100, 101)]
    # full sets: each doc has 3 shingles, 2 shared → J = 2/4
    assert r.intersection == 2 and r.size_a == 3 and r.size_b == 3
    assert r.jaccard == 0.5
    # the anchor (uncapped) additionally reports every filler pair
    uncapped = ngram_jaccard_pairs(deg).count()
    assert uncapped == 40 * 39 / 2 + 1


def test_candidate_volume_guard_refuses_dense_corpora(docs):
    # The shared docs fixture has shingle df > 1 (three dup docs), so a
    # 1-pair ceiling must trip with an error naming the scalable path;
    # a roomy ceiling and None must both pass through unchanged.
    from rag_application_with_vectordb_spark.operators.dedup import (
        containment_pairs,
        prefix_filter_jaccard_pairs,
    )

    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        ngram_jaccard_pairs(docs, max_candidate_pairs=1).collect()
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        prefix_filter_jaccard_pairs(docs, max_candidate_pairs=1).collect()
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        containment_pairs(docs, max_candidate_pairs=1).collect()
    guarded = ngram_jaccard_pairs(docs, max_candidate_pairs=10**9)
    unguarded = ngram_jaccard_pairs(docs)
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )


def test_augmented_docs_lineage_is_stable(spark):
    # Two invocations must produce semantically IDENTICAL plans: a
    # localCheckpoint mints a fresh RDD per call, and an un-memoized
    # checkpoint inside this builder gave every invocation a distinct
    # lineage — silently defeating Spark's persisted-relation cache in
    # everything derived from it (dedup_minhash_lsh_pairs warm passes
    # went 3.7 s -> 31 s at sf10 before the (SparkContext, fixture)
    # memoization). Value gates and plan lints can't see this class;
    # this pin can.
    from rag_application_with_vectordb_spark.plans.dedup_queries import (
        _augmented_docs,
    )

    a = _augmented_docs(spark, "/root/testdata/sf0.001")
    b = _augmented_docs(spark, "/root/testdata/sf0.001")
    ha = a._jdf.queryExecution().analyzed().semanticHash()
    hb = b._jdf.queryExecution().analyzed().semanticHash()
    assert ha == hb, "augmented-docs lineage drifted between invocations"
