r"""Training-data pipeline stages: quality-rule filtering, repetition
analysis, deterministic shuffle + sequence packing, benchmark
contamination checking, stratified sampling.

These extend the reference's single-document ingest
(``App.tsx:101-160``) to the corpus-level curation stages an LLM
training pipeline runs before any model sees the data. Every stage is
pure deterministic relational algebra / window algebra — no UDFs — so
each has an exact DuckDB oracle twin.

The fixture corpus is single-line, symbol-free word salad, so the
rule-based queries plant deterministic pathologies (bullet lists,
ellipsis lines, symbol runs) on a doc_id-keyed slice — same expression
on both engines, keeping results hash-checkable while exercising both
branches of every rule (the ``text_redact_pii`` pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS_EN,
    hash_split,
    hex13_to_long,
    token_count,
    tokens,
    word_shingles,
)
from ..operators.packing import pack_sequences
from ..session import tune
from ..sources.catalog import load_table
from .oracle_dialect import duck_hex13_to_long
from .registry import register

_STOPS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

# Deterministic pathology plants (doc_id % 10 selects the variant).
_BULLETS = "- alpha beta\n" * 10  # 10 bullet lines prepended -> bullet_frac 10/11
_ELLIPSIS_TAIL = "...\nto be continued..."  # both lines end '...' -> frac 1.0
_SYMBOL_TAIL = " # # # # # # # # # #"  # 10 '#' symbols appended

_GOPHER_AUG_SQL = f"""
      SELECT doc_id,
        CASE doc_id % 10
          WHEN 0 THEN '{_BULLETS}' || text
          WHEN 1 THEN text || '{_ELLIPSIS_TAIL}'
          WHEN 2 THEN text || '{_SYMBOL_TAIL}'
          ELSE text END AS text
      FROM documents
"""


@register(
    "text_gopher_rules",
    oracle=rf"""
    WITH aug AS ({_GOPHER_AUG_SQL}),
    t AS (
      SELECT doc_id, text,
        regexp_split_to_array(trim(text), '\s+') AS w,
        regexp_split_to_array(text, '\n') AS lines
      FROM aug
    ),
    m AS (
      SELECT doc_id,
        CAST(len(w) AS BIGINT) AS n_words,
        CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
          / CAST(len(w) AS DOUBLE) AS mean_word_len,
        CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
          / CAST(len(w) AS DOUBLE) AS symbol_word_ratio,
        CAST(len(list_filter(lines, l -> l LIKE '- %')) AS DOUBLE)
          / CAST(len(lines) AS DOUBLE) AS bullet_line_frac,
        CAST(len(list_filter(lines, l -> l LIKE '%...')) AS DOUBLE)
          / CAST(len(lines) AS DOUBLE) AS ellipsis_line_frac,
        CAST(len(list_distinct(list_filter(w, x -> lower(x) IN ({_STOPS_SQL}))))
          AS BIGINT) AS n_distinct_stopwords
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
      bullet_line_frac, ellipsis_line_frac, n_distinct_stopwords,
      CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                 AND mean_word_len BETWEEN 3.0 AND 10.0
                 AND symbol_word_ratio < 0.1
                 AND bullet_line_frac <= 0.9
                 AND ellipsis_line_frac <= 0.3
                 AND n_distinct_stopwords >= 2
            THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM m
    """,
    doc="Gopher-style quality-rule filter (Rae et al. 2021, §A1.1): "
    "word-count bounds, mean-word-length bounds, symbol-to-word ratio, "
    "bullet-line / ellipsis-line fractions, minimum distinct stopwords; "
    "per-rule features + the combined keep decision. Pure per-row "
    "expressions (one narrow scan, no shuffle) — at 100 TB this is a "
    "map-only stage that fuses with the scan.",
    tags=("text", "pipeline"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    variant = F.col("doc_id") % 10
    text = (
        F.when(variant == 0, F.concat(F.lit(_BULLETS), F.col("text")))
        .when(variant == 1, F.concat(F.col("text"), F.lit(_ELLIPSIS_TAIL)))
        .when(variant == 2, F.concat(F.col("text"), F.lit(_SYMBOL_TAIL)))
        .otherwise(F.col("text"))
    )
    aug = docs.select("doc_id", text.alias("text"))
    w = tokens(F.col("text"))
    lines = F.split(F.col("text"), r"\n")
    n_words = F.size(w).cast("bigint")
    mean_word_len = (
        F.length(F.regexp_replace(F.col("text"), r"\s+", "")).cast("double")
        / n_words.cast("double")
    )
    symbol_ratio = (
        (F.length(F.col("text")) - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))).cast("double")
        / n_words.cast("double")
    )
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.startswith("- "))).cast("double")
        / F.size(lines).cast("double")
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("double")
        / F.size(lines).cast("double")
    )
    n_stops = F.size(
        F.array_distinct(F.filter(w, lambda x: F.lower(x).isin(*STOPWORDS_EN)))
    ).cast("bigint")
    m = aug.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        n_stops.alias("n_distinct_stopwords"),
    )
    keep = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_word_ratio") < 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("n_distinct_stopwords") >= 2)
    )
    return m.withColumn("keep", keep.cast("bigint"))


@register(
    "text_repetition_stats",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents
    ),
    base AS (
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words, w
      FROM t WHERE len(w) >= 2
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM base
    ),
    cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
    top AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count FROM cnt GROUP BY 1)
    SELECT b.doc_id, b.n_words,
      CAST(b.n_distinct_words AS DOUBLE) / CAST(b.n_words AS DOUBLE) AS distinct_word_frac,
      top.top_bigram_count,
      CAST(top.top_bigram_count AS DOUBLE) / CAST(b.n_words - 1 AS DOUBLE) AS top_bigram_frac
    FROM base b JOIN top USING (doc_id)
    """,
    doc="Gopher-style repetition signals: distinct-word fraction and "
    "most-frequent-bigram fraction per document (the duplicate-n-gram "
    "family from Rae et al. 2021 §A1.1). Bigram counting explodes "
    "positional bigrams and aggregates per (doc, bigram) — partial "
    "aggregation is map-side, the shuffle key is doc_id, and the "
    "final join is doc_id-co-partitioned; no all-pairs anything.",
    tags=("text", "pipeline"),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct_words"),
        w.alias("w"),
    ).filter(F.size("w") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.concat(
            F.element_at("w", i + 1), F.lit(" "), F.element_at("w", i + 2)
        ),
    )
    bg = base.select("doc_id", F.explode(bigrams).alias("bigram"))
    top = (
        bg.groupBy("doc_id", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").cast("bigint").alias("top_bigram_count"))
    )
    return base.drop("w").join(top, "doc_id").select(
        "doc_id",
        "n_words",
        (F.col("n_distinct_words").cast("double") / F.col("n_words").cast("double")).alias(
            "distinct_word_frac"
        ),
        "top_bigram_count",
        (
            F.col("top_bigram_count").cast("double")
            / (F.col("n_words") - 1).cast("double")
        ).alias("top_bigram_frac"),
    )


_PACK_BUDGET = 512
_PACK_SHARDS = 32


@register(
    "pack_sequences_512",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        {duck_hex13_to_long("md5('pack42|' || CAST(doc_id AS VARCHAR))")} % {_PACK_SHARDS} AS shard,
        md5('ord42|' || CAST(doc_id AS VARCHAR)) AS okey
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
        CAST(COALESCE(SUM(n_tokens) OVER (
          PARTITION BY shard ORDER BY okey, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
      FROM t
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens, start_offset,
      CAST(shard * 1000000 + start_offset // {_PACK_BUDGET} AS BIGINT) AS seq_id,
      CAST(start_offset % {_PACK_BUDGET} AS BIGINT) AS seq_offset
    FROM c
    """,
    doc="Deterministic shuffle + sequence packing (operators/packing.py): "
    "hash-sharded corpus, keyed-md5 shuffle order within shard, running "
    "token cumsum -> start offset -> 512-token training-sequence id and "
    "in-sequence offset. The running sum is a window PARTITIONED BY "
    "shard (shards scale with the cluster), never a global single-"
    "partition window.",
    tags=("text", "pipeline", "window"),
)
def pack_sequences_512(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    return pack_sequences(
        with_tokens, budget=_PACK_BUDGET, shards=_PACK_SHARDS
    )


@register(
    "contamination_check",
    oracle=rf"""
    WITH s AS (
      SELECT doc_id,
        CASE WHEN {duck_hex13_to_long("md5('split42|' || CAST(doc_id AS VARCHAR))")} % 1000 < 900
             THEN 'train' ELSE 'heldout' END AS split,
        list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
                                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
      WHERE len(w) >= 3
    ),
    posting AS (SELECT doc_id, split, unnest(shingles) AS shingle FROM s),
    hold AS (SELECT DISTINCT shingle FROM posting WHERE split = 'heldout'),
    hits AS (
      SELECT p.doc_id, count(*) AS n_shared
      FROM posting p JOIN hold USING (shingle)
      WHERE p.split = 'train'
      GROUP BY 1
    )
    SELECT t.doc_id,
      CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared_shingles,
      CAST(CASE WHEN COALESCE(h.n_shared, 0) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
    FROM (SELECT doc_id FROM s WHERE split = 'train') t
    LEFT JOIN hits h USING (doc_id)
    """,
    doc="Benchmark-contamination check: flag training documents sharing "
    ">= 3 distinct word trigrams with the held-out (benchmark) split "
    "(hash_split, the same 90/10 keyed-md5 assignment as "
    "text_train_heldout_split). The held-out shingle set is DISTINCT'd "
    "and broadcast — benchmark sets are small by nature — so the train "
    "side streams through a map-side hash join: no shuffle of the "
    "corpus, no all-pairs comparison, linear in corpus size.",
    tags=("text", "pipeline", "dedup"),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        hash_split(F.col("doc_id")).alias("split"),
        word_shingles(F.col("text"), 3).alias("shingles"),
    ).filter(F.size(tokens(F.col("text"))) >= 3)
    posting = s.select("doc_id", "split", F.explode("shingles").alias("shingle"))
    hold = posting.filter(F.col("split") == "heldout").select("shingle").distinct()
    hits = (
        posting.filter(F.col("split") == "train")
        .join(F.broadcast(hold), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    train = s.filter(F.col("split") == "train").select("doc_id")
    n_shared = F.coalesce(F.col("n_shared"), F.lit(0))
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        n_shared.cast("bigint").alias("n_shared_shingles"),
        (n_shared >= 3).cast("bigint").alias("contaminated"),
    )


@register(
    "sample_stratified_by_lang",
    oracle=rf"""
    WITH b AS (
      SELECT doc_id, lang,
        {duck_hex13_to_long("md5('strat42|' || CAST(doc_id AS VARCHAR))")} % 1000 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, CAST(bucket AS BIGINT) AS sample_bucket
    FROM b
    WHERE bucket < CASE WHEN lang = 'en' THEN 300 ELSE 1000 END
    """,
    doc="Stratified deterministic sampling — the domain-mixture stage: "
    "down-weight the dominant language to 30% while keeping the rest "
    "at 100%, via keyed-md5 permille buckets (reproducible and "
    "partitioning-stable, unlike sample()/rand(); re-running on a "
    "re-partitioned corpus keeps exactly the same rows). Map-only: "
    "the predicate fuses with the scan.",
    tags=("text", "pipeline", "sampling"),
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        hex13_to_long(F.md5(F.concat(F.lit("strat42|"), F.col("doc_id").cast("string"))))
        % 1000
    )
    rate = F.when(F.col("lang") == "en", F.lit(300)).otherwise(F.lit(1000))
    return (
        docs.select("doc_id", "lang", bucket.alias("sample_bucket"))
        .filter(F.col("sample_bucket") < rate)
        .select("doc_id", "lang", F.col("sample_bucket").cast("bigint").alias("sample_bucket"))
    )


@register(
    "length_buckets",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens,
      CAST(ntile(8) OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS eqfreq_bucket,
      CAST(n_tokens // 16 AS BIGINT) AS range_bucket
    FROM t
    """,
    doc="Length bucketing — the batch-by-length stage that keeps padding "
    "waste down in training/inference: equal-frequency buckets via "
    "ntile(8) (exact, needs a global sort — the oracle anchor) plus "
    "fixed-width range buckets (map-only, the 100 TB path; at scale the "
    "range boundaries come from approx percentiles so buckets stay "
    "balanced without the sort).",
    tags=("text", "pipeline", "window"),
)
def length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    w = Window.orderBy("n_tokens", "doc_id")
    return t.select(
        "doc_id",
        "n_tokens",
        F.ntile(8).over(w).cast("bigint").alias("eqfreq_bucket"),
        F.floor(F.col("n_tokens") / 16).cast("bigint").alias("range_bucket"),
    )


@register(
    "sample_uniform_k",
    oracle=f"""
    SELECT doc_id, u FROM (
      SELECT doc_id,
             {duck_hex13_to_long("md5('res42|' || CAST(doc_id AS VARCHAR))")} / 4503599627370496.0 AS u
      FROM documents
    ) ORDER BY u, doc_id LIMIT 100
    """,
    doc="Uniform k-sample without replacement as a deterministic "
    "hash-rank top-k: keep the 100 documents with the smallest keyed-md5 "
    "unit hash — equivalent in distribution to reservoir sampling, but "
    "stateless, partitioning-stable, and re-runnable (the same corpus "
    "always yields the same sample; adding documents perturbs the "
    "sample exactly as a reservoir would). Plan: TakeOrderedAndProject "
    "— per-partition top-k heaps then a k-row merge, no global sort, no "
    "driver state. The hash doubles as the sampling proof: any auditor "
    "can recompute membership per row.",
    tags=("text", "pipeline", "sampling"),
)
def sample_uniform_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    u = (
        hex13_to_long(F.md5(F.concat(F.lit("res42|"), F.col("doc_id").cast("string"))))
        / F.lit(4503599627370496.0)
    ).alias("u")
    return docs.select("doc_id", u).orderBy(F.asc("u"), F.asc("doc_id")).limit(100)


@register(
    "mix_rebalance_weights",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    s AS (SELECT COUNT(*) AS n_langs FROM c),
    t AS (SELECT MIN(c.n_docs * s.n_langs) AS t_max FROM c, s)
    SELECT c.lang, CAST(c.n_docs AS BIGINT) AS n_docs,
      CAST(1.0 / s.n_langs AS DOUBLE) AS target_share,
      CAST(CAST(t.t_max AS DOUBLE) / s.n_langs AS DOUBLE) AS expected_docs,
      CAST(CAST(t.t_max AS DOUBLE) / s.n_langs / c.n_docs AS DOUBLE) AS sample_weight
    FROM c, s, t
    """,
    doc="Domain-mixture rebalancing — the stage that turns a skewed crawl "
    "into a target training mix: given per-language counts and a uniform "
    "target share, the largest downsample-only total is "
    "T = min_l(count_l / share_l); each group's sampling weight is "
    "share_l * T / count_l (≤ 1 — never upsamples). Two tiny aggregates "
    "broadcast over a groupBy — the per-doc accept step then reuses the "
    "keyed-md5 permille predicate of sample_stratified_by_lang, map-only "
    "at any scale.",
    tags=("text", "pipeline", "sampling"),
)
def mix_rebalance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    s = c.agg(F.count("*").alias("n_langs"))
    t = c.crossJoin(F.broadcast(s)).agg(
        F.min(F.col("n_docs") * F.col("n_langs")).alias("t_max")
    )
    return (
        c.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(t))
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            (F.lit(1.0) / F.col("n_langs")).cast("double").alias("target_share"),
            (F.col("t_max").cast("double") / F.col("n_langs"))
            .cast("double")
            .alias("expected_docs"),
            (F.col("t_max").cast("double") / F.col("n_langs") / F.col("n_docs"))
            .cast("double")
            .alias("sample_weight"),
        )
    )


@register(
    "mix_apply_rebalance",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    s AS (SELECT COUNT(*) AS n_langs FROM c),
    t AS (SELECT MIN(c.n_docs * s.n_langs) AS t_max FROM c, s),
    w AS (
      SELECT c.lang,
        CAST(CAST(t.t_max AS DOUBLE) / s.n_langs / c.n_docs AS DOUBLE) AS sample_weight
      FROM c, s, t
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN w ON d.lang = w.lang
    WHERE {duck_hex13_to_long("md5('mix42|' || CAST(d.doc_id AS VARCHAR))")} / 4503599627370496.0
          < w.sample_weight
    """,
    doc="The per-doc accept step for mix_rebalance_weights: each document "
    "keeps iff its keyed md5 unit hash falls under its language's "
    "sampling weight — deterministic and partitioning-stable (re-running "
    "on a re-shuffled corpus keeps exactly the same rows, unlike "
    "sample()/rand()). Broadcast join of the 5-row weight table + a "
    "map-only predicate: the whole rebalance is one corpus scan at any "
    "scale.",
    tags=("text", "pipeline", "sampling"),
)
def mix_apply_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    s = c.agg(F.count("*").alias("n_langs"))
    t = c.crossJoin(F.broadcast(s)).agg(
        F.min(F.col("n_docs") * F.col("n_langs")).alias("t_max")
    )
    w = (
        c.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(t))
        .select(
            "lang",
            (F.col("t_max").cast("double") / F.col("n_langs") / F.col("n_docs"))
            .cast("double")
            .alias("sample_weight"),
        )
    )
    u = hex13_to_long(
        F.md5(F.concat(F.lit("mix42|"), F.col("doc_id").cast("string")))
    ) / F.lit(4503599627370496.0)
    return (
        docs.join(F.broadcast(w), "lang")
        .filter(u < F.col("sample_weight"))
        .select("doc_id", "lang")
    )


@register(
    "length_buckets_approx",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    h AS (
      SELECT n_tokens, COUNT(*) AS c FROM t GROUP BY n_tokens
    ),
    b AS (
      SELECT n_tokens,
        CAST((SUM(c) OVER (ORDER BY n_tokens) * 8 + (SELECT COUNT(*) FROM t) - 1)
             // (SELECT COUNT(*) FROM t) AS BIGINT) AS histq_bucket
      FROM h
    )
    SELECT t.doc_id, t.n_tokens, b.histq_bucket
    FROM t JOIN b ON t.n_tokens = b.n_tokens
    """,
    doc="Equal-frequency length bucketing WITHOUT a global row sort — the "
    "100 TB path `length_buckets` promises. The distinct token-count "
    "domain is tiny and bounded (O(max doc length), independent of corpus "
    "size), so: histogram on n_tokens (one shuffle on a small key), "
    "cumulative counts over the histogram (a window over thousands of "
    "rows, not the corpus), integer-exact bucket = ceil(8*cum/n) per "
    "distinct length, then a broadcast join back onto the docs (map-side, "
    "no corpus shuffle). Ties share a bucket — the documented semantic "
    "difference vs ntile; boundaries are exact, not sketched, yet the "
    "plan scales like the percentile_approx variant.",
    tags=("text", "pipeline", "sampling"),
)
def length_buckets_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    hist = t.groupBy("n_tokens").agg(F.count("*").alias("c"))
    # Cumulative count over the tiny histogram; single-partition window is
    # fine — its cardinality is distinct lengths, not rows.
    cum = hist.withColumn(
        "cum", F.sum("c").over(Window.orderBy("n_tokens"))
    ).crossJoin(F.broadcast(t.agg(F.count("*").alias("n_total"))))
    buckets = cum.select(
        "n_tokens",
        F.expr("CAST((cum * 8 + n_total - 1) div n_total AS BIGINT)").alias(
            "histq_bucket"
        ),
    )
    return t.join(F.broadcast(buckets), "n_tokens").select(
        "doc_id", "n_tokens", "histq_bucket"
    )


# --- weighted sampling without replacement (Efraimidis–Spirakis) --------------


@register(
    "sample_weighted_k",
    oracle=f"""
    SELECT doc_id, n_chars, es_cost_fp FROM (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             (-CAST(round(ln(
                 {duck_hex13_to_long("md5('wres42|' || CAST(doc_id AS VARCHAR))")} / 4503599627370496.0
               ) * 1000000.0) AS BIGINT) * 1000000) // CAST(n_chars AS BIGINT) AS es_cost_fp
      FROM documents
    ) ORDER BY es_cost_fp ASC, doc_id ASC LIMIT 100
    """,
    doc="Length-weighted k-sample without replacement — "
    "Efraimidis-Spirakis A-ES: keep the k docs with the largest "
    "u^(1/w), equivalently the SMALLEST -ln(u)/w, with u the keyed-md5 "
    "unit hash of sample_uniform_k and w = n_chars (long documents "
    "proportionally likelier, the standard token-budget-aware corpus "
    "draw). Determinism: ln(u) is rounded onto the 1e-6 grid "
    "(seq_doc_logprob's fixed-point move), scaled, and integer-DIVIDED "
    "by the weight — both operands non-negative, so Spark's "
    "truncating div == DuckDB's flooring // and the whole sort key is "
    "one BIGINT, cross-engine exact. Plan: per-row expressions + "
    "TakeOrderedAndProject — stateless, partitioning-stable, no global "
    "sort; auditors can recompute any row's key from its id alone.",
    tags=("text", "pipeline", "sampling"),
)
def sample_weighted_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    u = hex13_to_long(
        F.md5(F.concat(F.lit("wres42|"), F.col("doc_id").cast("string")))
    ) / F.lit(4503599627370496.0)
    micro_neg_ln = -F.round(F.ln(u) * F.lit(1000000.0)).cast("long")
    out = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        (micro_neg_ln * F.lit(1000000)).alias("__num"),
    ).select(
        "doc_id",
        "n_chars",
        F.expr("__num div n_chars").alias("es_cost_fp"),
    )
    return out.orderBy(F.asc("es_cost_fp"), F.asc("doc_id")).limit(100)


# --- per-group cap: at most k docs per group (domain cap) ---------------------


@register(
    "sample_k_per_group",
    oracle=f"""
    SELECT doc_id, lang, pick_rank FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('cap42|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS pick_rank
      FROM documents
    ) WHERE pick_rank <= 20
    """,
    doc="Per-group cap — 'at most k documents per domain', the curation "
    "rule that stops one crawl domain from dominating a mixture: rank "
    "docs inside each lang group by keyed md5 (a deterministic uniform "
    "draw, same family as sample_uniform_k) and keep the first 20. One "
    "window per group key — the shuffle is on lang, per-group state is "
    "a k-counter, and the draw is auditable per row. Complements "
    "sample_stratified_by_lang (rate-based) with a hard per-group "
    "ceiling.",
    tags=("text", "pipeline", "sampling"),
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("cap42|"), F.col("doc_id").cast("string"))),
        F.asc("doc_id"),
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("pick_rank"))
        .filter(F.col("pick_rank") <= 20)
    )


# --- per-group z-score standardization (exact-integer moments) ----------------


@register(
    "feature_zscore_chars",
    oracle="""
    WITH m AS (
      SELECT lang, COUNT(*) AS n,
             SUM(CAST(n_chars AS BIGINT)) AS s1,
             SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS s2
      FROM documents GROUP BY lang
    ),
    st AS (
      SELECT lang,
             CAST(s1 AS DOUBLE) / n AS mu,
             sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n AS sigma
      FROM m
    )
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
           CAST(CASE WHEN st.sigma = 0 THEN 0.0
                     ELSE (CAST(d.n_chars AS DOUBLE) - st.mu) / st.sigma
                END AS DOUBLE) AS z_chars
    FROM documents d JOIN st USING (lang)
    """,
    doc="Per-group z-score standardization of a numeric feature "
    "(n_chars by lang) — the featurization step before any "
    "length-based outlier rule or model input. Determinism without "
    "fixed-point tricks: the inputs are integers, so Σx and Σx² are "
    "exact BIGINTs, the population variance (n·Σx² − (Σx)²)/n² is a "
    "ratio of exact integers, and fp64 division + IEEE sqrt are "
    "correctly rounded in both engines — every z value hash-matches. "
    "Plan: one tiny per-group aggregate broadcast back onto the scan; "
    "zero-variance groups clamp to z=0 instead of dividing by zero.",
    tags=("text", "pipeline", "analytics"),
)
def feature_zscore_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    m = docs.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(F.col("n_chars").cast("long")).alias("s1"),
        F.sum(F.col("n_chars").cast("long") * F.col("n_chars").cast("long")).alias("s2"),
    )
    st = m.select(
        "lang",
        (F.col("s1").cast("double") / F.col("n")).alias("mu"),
        (
            F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
            / F.col("n")
        ).alias("sigma"),
    )
    return docs.join(F.broadcast(st), "lang").select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.when(F.col("sigma") == 0, F.lit(0.0))
        .otherwise((F.col("n_chars").cast("double") - F.col("mu")) / F.col("sigma"))
        .cast("double")
        .alias("z_chars"),
    )


# --- cross-document boilerplate removal (CCNet-style paragraph dedup) ---------

_BP_HEADER = "SHARED NAV HEADER home products contact"
_BP_FOOTER = "SHARED FOOTER all rights reserved"

_BP_AUG_SQL = f"""
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0
             THEN '{_BP_HEADER}' || chr(10) || text || chr(10) || '{_BP_FOOTER}'
             ELSE text END AS text
      FROM documents
"""


@register(
    "text_remove_boilerplate",
    oracle=rf"""
    WITH aug AS ({_BP_AUG_SQL}),
    lines AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, l[CAST(i AS INTEGER)] AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM aug),
           LATERAL (SELECT unnest(range(1, len(l) + 1))) u(i)
    ),
    lf AS (SELECT doc_id, pos, line, md5(trim(line)) AS fp FROM lines),
    df AS (SELECT fp, COUNT(DISTINCT doc_id) AS ndocs FROM lf GROUP BY fp),
    kept AS (
      SELECT lf.doc_id, lf.pos, lf.line
      FROM lf JOIN df USING (fp) WHERE df.ndocs < 10
    ),
    rebuilt AS (
      SELECT doc_id,
             COALESCE(string_agg(line, chr(10) ORDER BY pos), '') AS cleaned
      FROM kept GROUP BY doc_id
    ),
    counts AS (
      SELECT l.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CASE WHEN d.ndocs < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM lf l JOIN df d USING (fp) GROUP BY l.doc_id
    )
    SELECT c.doc_id, c.n_lines, c.n_kept,
           md5(COALESCE(r.cleaned, '')) AS cleaned_fp,
           CAST(length(COALESCE(r.cleaned, '')) AS BIGINT) AS cleaned_chars
    FROM counts c LEFT JOIN rebuilt r ON r.doc_id = c.doc_id
    """,
    doc="Cross-document boilerplate removal (the CCNet/RefinedWeb "
    "paragraph-dedup stage): lines whose md5 fingerprint appears in "
    ">= 10 distinct documents (planted nav header/footer on every third "
    "doc — ~167 occurrences each) are dropped, and each document is "
    "reassembled in original line order. Fingerprints shuffle as 32-byte "
    "keys; the document-frequency decision is one hash groupBy; "
    "reassembly is an ORDER BY pos string_agg inside the doc_id group — "
    "deterministic in both engines. Output carries the cleaned-text md5 "
    "so the whole reconstruction is value-checked without hashing "
    "megabytes through the driver.",
    tags=("text", "pipeline", "dedup"),
)
def text_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    text = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(_BP_HEADER), F.lit("\n"), F.col("text"), F.lit("\n"), F.lit(_BP_FOOTER)
        ),
    ).otherwise(F.col("text"))
    aug = docs.select("doc_id", text.alias("text"))
    lines = aug.select(
        "doc_id", F.posexplode(F.split(F.col("text"), "\n")).alias("pos0", "line")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "line"
    )
    lf = lines.withColumn("fp", F.md5(F.trim(F.col("line"))))
    df = lf.groupBy("fp").agg(F.countDistinct("doc_id").alias("ndocs"))
    joined = lf.join(df, "fp")
    kept = joined.filter(F.col("ndocs") < 10)
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("arr")
        )
        .select(
            "doc_id",
            F.array_join(F.transform(F.col("arr"), lambda s: s["line"]), "\n").alias(
                "cleaned"
            ),
        )
    )
    counts = joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum((F.col("ndocs") < 10).cast("long")).cast("bigint").alias("n_kept"),
    )
    return counts.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.md5(F.coalesce(F.col("cleaned"), F.lit(""))).alias("cleaned_fp"),
        F.length(F.coalesce(F.col("cleaned"), F.lit(""))).cast("bigint").alias(
            "cleaned_chars"
        ),
    )


# --- deterministic negative sampling (contrastive-pair construction) ----------

_NEG_K = 4


@register(
    "sample_negatives_k",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    anchors AS (SELECT doc_id FROM documents WHERE doc_id < 100)
    SELECT a.doc_id AS anchor_id, CAST(j AS BIGINT) AS neg_rank,
           CAST((a.doc_id + 1 +
                 {duck_hex13_to_long("md5('neg42|' || CAST(a.doc_id AS VARCHAR) || '|' || CAST(j AS VARCHAR))")}
                 % (n.n_docs - 1)) % n.n_docs AS BIGINT) AS negative_id
    FROM anchors a, (SELECT unnest(range(0, {_NEG_K}))) t(j), n
    """,
    doc="Deterministic negative sampling for contrastive training: each "
    "anchor document draws k=4 uniform negatives via "
    "anchor + 1 + (keyed-md5 mod (N-1)) mod N — the shifted-modulus "
    "construction that is collision-free with the anchor BY ALGEBRA "
    "(offset ranges over [1, N-1]), so no rejection loop and no "
    "iterative resampling; every (anchor, rank) resolves to one "
    "auditable negative id. Map-only over the anchor set with one "
    "broadcast corpus count — the shape that pairs with "
    "mine-hard-negatives (knn_batch) in an embedding-training "
    "pipeline. Dense 0..N-1 ids assumed (the fixture's layout); at "
    "scale you'd draw against a zipWithIndex-style dense rank.",
    tags=("text", "pipeline", "sampling"),
)
def sample_negatives_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n_docs"))
    anchors = docs.filter(F.col("doc_id") < 100).select("doc_id")
    j = F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("j")
    pairs = anchors.select("doc_id", j).crossJoin(F.broadcast(n))
    off = hex13_to_long(
        F.md5(
            F.concat(
                F.lit("neg42|"),
                F.col("doc_id").cast("string"),
                F.lit("|"),
                F.col("j").cast("string"),
            )
        )
    ) % (F.col("n_docs") - 1)
    return pairs.select(
        F.col("doc_id").alias("anchor_id"),
        F.col("j").cast("bigint").alias("neg_rank"),
        ((F.col("doc_id") + 1 + off) % F.col("n_docs")).cast("bigint").alias(
            "negative_id"
        ),
    )


# --- embedding drift monitor (round 6) ----------------------------------------

_DRIFT_SCALE = 1 << 20


@register(
    "embedding_drift_monitor",
    oracle=f"""
    WITH pos AS (
      SELECT vec_id % 2 AS half, CAST(j AS INTEGER) AS j,
             CAST(FLOOR(CAST(embedding[CAST(j AS INTEGER)] AS DOUBLE) * {_DRIFT_SCALE}.0) AS BIGINT) AS fx
      FROM embeddings, (SELECT unnest(range(1, 65))) t(j)
    ),
    m AS (
      SELECT half, j,
             CAST(SUM(fx) AS DOUBLE) / (COUNT(*) * {_DRIFT_SCALE}.0) AS mean_fx
      FROM pos GROUP BY half, j
    )
    SELECT CAST(e.j - 1 AS INTEGER) AS component,
           e.mean_fx AS mean_even, o.mean_fx AS mean_odd,
           ABS(e.mean_fx - o.mean_fx) AS abs_diff
    FROM (SELECT * FROM m WHERE half = 0) e
    JOIN (SELECT * FROM m WHERE half = 1) o USING (j)
    """,
    doc="Embedding-distribution drift monitor: per-component means of two "
    "corpus halves (vec_id parity stands in for old-batch vs new-batch) "
    "and their absolute gap — the per-feature shift check an embedding "
    "pipeline alarms on before ANN recall quietly degrades (the same "
    "signal ann_ivf_staleness_drift measures at the index level, caught "
    "earlier and 64x cheaper). Means use the kmeans fixed-point trick "
    "(floor(x * 2^20) integer sums, one correctly-rounded fp64 division) "
    "so a cross-partition fp64 SUM's order-dependence never flaps the "
    "hash: every output bit reproduces in DuckDB. One scan, one 128-key "
    "aggregate; no shuffle of vectors themselves.",
    tags=("ann", "pipeline", "monitor"),
)
def embedding_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("component", "x"),
    ).select(
        "half",
        "component",
        F.floor(F.col("x") * float(_DRIFT_SCALE)).cast("long").alias("fx"),
    )
    m = pos.groupBy("half", "component").agg(
        (F.sum("fx").cast("double") / (F.count("*") * float(_DRIFT_SCALE))).alias("mean_fx")
    )
    e = m.filter(F.col("half") == 0).select("component", F.col("mean_fx").alias("mean_even"))
    o = m.filter(F.col("half") == 1).select("component", F.col("mean_fx").alias("mean_odd"))
    return e.join(o, "component").select(
        F.col("component").cast("int").alias("component"),
        "mean_even",
        "mean_odd",
        F.abs(F.col("mean_even") - F.col("mean_odd")).alias("abs_diff"),
    )


# --- referential-integrity audit (round 6) ------------------------------------


@register(
    "audit_referential_integrity",
    oracle="""
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_documents,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_embeddings,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)) AS n_docs_without_embedding,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings e
        WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)) AS n_embeddings_without_doc,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE text IS NULL OR length(trim(text)) = 0) AS n_empty_text,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
        WHERE len(embedding) <> 64) AS n_dim_mismatch,
      (SELECT CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) FROM documents) AS n_dup_doc_ids,
      (SELECT CAST(COUNT(*) - COUNT(DISTINCT vec_id) AS BIGINT) FROM embeddings) AS n_dup_vec_ids
    """,
    doc="Data-contract audit across the documents<->embeddings pair: row "
    "counts, orphans on both sides (anti joins on the shared id), "
    "empty/null text, wrong-dimension vectors, duplicate keys — one row "
    "of BIGINTs. The pre-flight check a pipeline runs before training "
    "or index build; at 100 TB each probe is one scan + hash anti-join, "
    "and any nonzero cell halts the run with a named defect instead of "
    "a silent downstream quality drop.",
    tags=("pipeline", "monitor"),
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE declarative plan, not a loop of driver-side count() jobs: each
    # table aggregates once (all its per-table probes in the same pass),
    # the two orphan checks are anti-join aggregates, and the four
    # single-row subtrees crossJoin into the output row. One action.
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    d_stats = docs.agg(
        F.count("*").alias("n_documents"),
        F.sum(
            (F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0)).cast("long")
        ).alias("n_empty_text"),
        (F.count("*") - F.countDistinct("doc_id")).alias("n_dup_doc_ids"),
    )
    e_stats = emb.agg(
        F.count("*").alias("n_embeddings"),
        F.sum((F.size("embedding") != 64).cast("long")).alias("n_dim_mismatch"),
        (F.count("*") - F.countDistinct("vec_id")).alias("n_dup_vec_ids"),
    )
    orphan_d = (
        docs.join(emb, docs["doc_id"] == emb["vec_id"], "left_anti")
        .agg(F.count("*").alias("n_docs_without_embedding"))
    )
    orphan_e = (
        emb.join(docs, emb["vec_id"] == docs["doc_id"], "left_anti")
        .agg(F.count("*").alias("n_embeddings_without_doc"))
    )
    return (
        d_stats.crossJoin(e_stats)
        .crossJoin(orphan_d)
        .crossJoin(orphan_e)
        .select(
            "n_documents",
            "n_embeddings",
            "n_docs_without_embedding",
            "n_embeddings_without_doc",
            "n_empty_text",
            "n_dim_mismatch",
            "n_dup_doc_ids",
            "n_dup_vec_ids",
        )
    )


# --- sharded training-data export manifest (round 7) --------------------------

_EXP_MIN_TOKENS = 8
_EXP_VOCAB = 256
_EXP_BUDGET = 512
_EXP_SHARDS = 32
_EXP_MOD = 1_000_000_007


@register(
    "export_manifest",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, text,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    s1 AS (SELECT * FROM tok WHERE n_tokens >= {_EXP_MIN_TOKENS}),
    fp AS (
      SELECT doc_id, text,
        md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
      FROM s1
    ),
    s2 AS (
      SELECT f.doc_id, f.text FROM fp f
      JOIN (SELECT fingerprint, min(doc_id) AS doc_id FROM fp GROUP BY 1) g
        ON f.fingerprint = g.fingerprint AND f.doc_id = g.doc_id
    ),
    posting AS (
      SELECT doc_id, w[CAST(i AS INTEGER)] AS word, CAST(i AS BIGINT) AS pos
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM s2) tw,
      LATERAL (SELECT unnest(range(1, len(w) + 1))) s(i)
    ),
    freq AS (SELECT word, COUNT(*) AS n FROM posting GROUP BY word),
    vocab AS (
      SELECT word, CAST(row_number() OVER (ORDER BY n DESC, word ASC) AS INTEGER) AS id
      FROM freq ORDER BY n DESC, word ASC LIMIT {_EXP_VOCAB}
    ),
    enc AS (
      SELECT p.doc_id, p.pos, COALESCE(v.id, 0) AS tid
      FROM posting p LEFT JOIN vocab v USING (word)
    ),
    perdoc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(tid * pos) % {_EXP_MOD} AS BIGINT) AS doc_checksum
      FROM enc GROUP BY doc_id
    ),
    t AS (
      SELECT doc_id, n_tokens, doc_checksum,
        {duck_hex13_to_long("md5('pack42|' || CAST(doc_id AS VARCHAR))")} % {_EXP_SHARDS} AS shard,
        md5('ord42|' || CAST(doc_id AS VARCHAR)) AS okey
      FROM perdoc
    ),
    c AS (
      SELECT doc_id, shard, n_tokens, doc_checksum,
        CAST(COALESCE(SUM(n_tokens) OVER (
          PARTITION BY shard ORDER BY okey, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
      FROM t
    )
    SELECT CAST(shard AS BIGINT) AS shard,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST((SUM(n_tokens) + {_EXP_BUDGET - 1}) // {_EXP_BUDGET} AS BIGINT) AS n_seqs,
      CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      CAST(SUM((doc_checksum * 31 + start_offset * 7 + n_tokens) % {_EXP_MOD}) AS BIGINT)
        AS checksum
    FROM c GROUP BY shard
    """,
    doc="The manifest of the sharded training-data export "
    "(operators/export.py): quality gate -> exact-dedup keep-canonical "
    "-> deterministic token-id encoding -> 512-token packing, then one "
    "row per shard with doc/sequence/token counts and an exact-integer "
    "content+placement checksum (sum over docs of "
    "(doc_checksum*31 + start_offset*7 + n_tokens) mod 1e9+7, where "
    "doc_checksum = sum(token_id*position)). Order-insensitive by "
    "construction, so the number is invariant to task scheduling and "
    "file layout -- re-verifiable from the written artifact at read "
    "time (read_training_shards). Every stage is a previously audited "
    "plan shape; the manifest aggregate adds one shuffle on the "
    "32-value shard key.",
    tags=("text", "pipeline", "export"),
)
def export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.export import curate_tokenize_pack, shard_manifest

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    packed = curate_tokenize_pack(
        docs,
        budget=_EXP_BUDGET,
        shards=_EXP_SHARDS,
        vocab_size=_EXP_VOCAB,
        min_tokens=_EXP_MIN_TOKENS,
    )
    return shard_manifest(packed, budget=_EXP_BUDGET)


# --- leakage-safe grouped split -------------------------------------------------

_FOLD_SEED = "fold42"
_N_FOLDS = 5


@register(
    "split_group_folds",
    oracle=f"""
    WITH assign AS (
      SELECT user_id,
        {duck_hex13_to_long(f"md5('{_FOLD_SEED}|' || CAST(user_id AS VARCHAR))")}
          % {_N_FOLDS} AS fold
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    leak AS (
      SELECT CAST(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS leaked
      FROM (SELECT user_id, COUNT(DISTINCT fold) AS nf FROM assign GROUP BY user_id)
    )
    SELECT a.fold, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      MAX(leak.leaked) AS leaked_users
    FROM events e JOIN assign a ON a.user_id = e.user_id CROSS JOIN leak
    GROUP BY a.fold
    """,
    doc="Leakage-safe k-fold assignment: the split key is the GROUP "
    "(user_id), not the row, so all of a user's events land in one "
    "fold and a model evaluated on fold i has never seen that user -- "
    "the grouped-split discipline that row-level random splits "
    "violate. Assignment is a keyed-md5 hash of the group key: "
    "stateless, reproducible, joinable from any engine. The "
    "leaked_users audit column (groups appearing in >1 fold) is "
    "computed in the same plan and is structurally zero -- a hash "
    "function is single-valued -- but the audit belongs in the "
    "artifact, not in a code comment. At 100 TB the assignment is a "
    "map-side expression on the fact table (no distinct-users table "
    "needed: the hash recomputes identically per row), one shuffle on "
    "the 5-value fold key for the counts.",
    tags=("pipeline", "sampling"),
)
def split_group_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    fold = (
        hex13_to_long(
            F.md5(F.concat(F.lit(f"{_FOLD_SEED}|"), F.col("user_id").cast("string")))
        )
        % _N_FOLDS
    ).alias("fold")
    assigned = events.select("user_id", fold)
    leak = (
        assigned.groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
        .agg(
            F.sum(F.when(F.col("nf") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("leaked")
        )
    )
    return (
        assigned.groupBy("fold")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .crossJoin(F.broadcast(leak))
        .select("fold", "n_users", "n_events", F.col("leaked").alias("leaked_users"))
    )
