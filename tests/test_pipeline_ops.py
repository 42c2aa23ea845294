"""Property tests for the training-data pipeline stages
(plans/pipeline_ops.py + operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name):
    return load_all()[name].fn


def test_pack_sequences_offsets_are_exact_prefix_sums(spark, sf_dir):
    rows = _q("pack_sequences_512")(spark, sf_dir).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1  # hash sharding actually spreads
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.start_offset)
        expect = 0
        for r in shard_rows:
            # no gaps, no overlap: each doc starts where the previous ended
            assert r.start_offset == expect
            assert 0 <= r.seq_offset < 512
            assert r.seq_id == r.shard * 1_000_000 + r.start_offset // 512
            expect += r.n_tokens


def test_pack_sequences_deterministic_across_runs(spark, sf_dir):
    a = {r.doc_id: (r.shard, r.start_offset) for r in _q("pack_sequences_512")(spark, sf_dir).collect()}
    b = {r.doc_id: (r.shard, r.start_offset) for r in _q("pack_sequences_512")(spark, sf_dir).collect()}
    assert a == b


def test_gopher_rules_reject_planted_pathologies(spark, sf_dir):
    rows = {r.doc_id: r for r in _q("text_gopher_rules")(spark, sf_dir).collect()}
    bullets = [r for d, r in rows.items() if d % 10 == 0]
    ellipsis = [r for d, r in rows.items() if d % 10 == 1]
    assert bullets and ellipsis
    # 10 planted bullet lines + 1 text line -> fraction 10/11 > 0.9
    assert all(r.bullet_line_frac > 0.9 and r.keep == 0 for r in bullets)
    # both planted tail lines end with '...' -> fraction 1.0 > 0.3
    assert all(r.ellipsis_line_frac > 0.3 and r.keep == 0 for r in ellipsis)
    # the rule set is not vacuously rejecting: some docs survive
    assert any(r.keep == 1 for r in rows.values())
    # word-count lower bound actually fires on short docs
    assert any(r.keep == 0 and r.n_words < 50 for r in rows.values())


def test_repetition_stats_bounds(spark, sf_dir):
    rows = _q("text_repetition_stats")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.distinct_word_frac <= 1.0
        assert 1 <= r.top_bigram_count <= r.n_words - 1
        assert 0.0 < r.top_bigram_frac <= 1.0
    # word salad repeats words heavily: distinctness must be < 1 somewhere
    assert any(r.distinct_word_frac < 1.0 for r in rows)


def test_contamination_covers_all_train_docs(spark, sf_dir):
    from rag_application_with_vectordb_spark.sources.catalog import load_table

    out = _q("contamination_check")(spark, sf_dir)
    rows = out.collect()
    docs = load_table(spark, sf_dir, "documents")
    n_train = (
        docs.select(F.col("doc_id"))
        .withColumn(
            "h",
            F.conv(
                F.substring(F.md5(F.concat(F.lit("split42|"), F.col("doc_id").cast("string"))), 1, 13),
                16,
                10,
            ).cast("long")
            % 1000,
        )
        .filter(F.col("h") < 900)
        .count()
    )
    assert len(rows) == n_train  # every train doc gets a row (left join)
    for r in rows:
        assert (r.contaminated == 1) == (r.n_shared_shingles >= 3)


def test_stratified_sample_downweights_en(spark, sf_dir):
    out = _q("sample_stratified_by_lang")(spark, sf_dir)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    from rag_application_with_vectordb_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # non-en languages pass through 100%
    for lang, n in full.items():
        if lang != "en":
            assert counts[lang] == n
    # en is down-sampled to ~30% (binomial tolerance on a few hundred docs)
    assert 0.15 * full["en"] <= counts["en"] <= 0.45 * full["en"]


def test_sample_weighted_k_matches_python_es(spark, sf_dir):
    import hashlib
    import math

    import duckdb

    from rag_application_with_vectordb_spark.plans.registry import load_all

    rows = load_all()["sample_weighted_k"].fn(spark, sf_dir).collect()
    assert len(rows) == 100 and len({r["doc_id"] for r in rows}) == 100

    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def cost(doc_id, n_chars):
        h = hashlib.md5(f"wres42|{doc_id}".encode()).hexdigest()
        u = int(h[:13], 16) / 4503599627370496.0
        micro = -round(math.log(u) * 1e6)
        return micro * 1000000 // n_chars

    want = sorted(docs, key=lambda d: (cost(*d), d[0]))[:100]
    assert {r["doc_id"] for r in rows} == {d[0] for d in want}
    # weighting skews the draw toward long documents
    corpus_avg = sum(n for _, n in docs) / len(docs)
    sample_avg = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_avg > corpus_avg


def test_boilerplate_removal_restores_originals(spark, sf_dir):
    import duckdb

    from rag_application_with_vectordb_spark.plans.registry import load_all

    rows = load_all()["text_remove_boilerplate"].fn(spark, sf_dir).collect()
    orig = dict(
        duckdb.sql(
            f"SELECT doc_id, md5(text) FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    for r in rows:
        # removal must return EVERY doc to its pre-plant text: planted
        # header/footer stripped, untouched docs bit-identical
        assert r["cleaned_fp"] == orig[r["doc_id"]], r["doc_id"]
        if r["doc_id"] % 3 == 0:
            assert r["n_lines"] == r["n_kept"] + 2
        else:
            assert r["n_lines"] == r["n_kept"]


def test_negative_sampling_never_hits_anchor(spark, sf_dir):
    from rag_application_with_vectordb_spark.plans.registry import load_all

    rows = load_all()["sample_negatives_k"].fn(spark, sf_dir).collect()
    assert len(rows) == 400  # 100 anchors x 4
    for r in rows:
        assert r["negative_id"] != r["anchor_id"]
        assert 0 <= r["negative_id"] < 500
    # deterministic: same draw every run
    again = load_all()["sample_negatives_k"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_tokenize_ids_array_matches_python_recompute(spark, sf_dir):
    # The registered text_tokenize_ids projects the sequence as a CSV
    # scalar (the driver canonicalizer can't hash top-level arrays — the
    # r07 red row); the raw array<int> form stays available for engine
    # consumers via tokenize_ids_array. Verify the array against an
    # independent Python recompute AND that the registered CSV is exactly
    # the joined array.
    from collections import Counter

    from rag_application_with_vectordb_spark.plans.textops import (
        tokenize_ids_array,
    )

    docs = {
        r.doc_id: r.text.strip().split()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    freq = Counter(w for ws in docs.values() for w in ws)
    vocab = {
        w: i + 1
        for i, (w, _) in enumerate(
            sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:256]
        )
    }
    expect = {
        d: [vocab.get(w, 0) for w in ws] for d, ws in docs.items() if ws
    }
    got = {r.doc_id: r for r in tokenize_ids_array(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for d, ids in expect.items():
        assert list(got[d].token_ids) == ids
        assert got[d].n_tokens == len(ids)
        assert got[d].n_oov == sum(1 for i in ids if i == 0)
    csv = {
        r.doc_id: r.token_ids_csv
        for r in _q("text_tokenize_ids")(spark, sf_dir).collect()
    }
    assert csv == {d: ",".join(map(str, ids)) for d, ids in expect.items()}
