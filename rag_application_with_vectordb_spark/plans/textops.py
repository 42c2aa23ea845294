"""Text-analysis + multimodal query catalog (LLM-data-pipeline surface).

Every heuristic here is a pure deterministic function of the text, so
the DuckDB oracle reproduces it exactly — including fp64 arithmetic
(same operations in the same order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS_EN, fingerprint, token_count, tokens
from ..operators.multimodal import (
    decode_media_stub,
    resize_media_stub,
    sample_frames_stub,
    with_binary_payload,
)
from ..session import tune
from ..sources.catalog import load_table, register_views
from .oracle_dialect import duck_hash_embedding, duck_hex13_to_long
from .registry import register

_STOPS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_EN)


@register(
    "text_token_stats",
    oracle=r"""
    WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
    SELECT doc_id,
      CAST(len(w) AS BIGINT) AS n_tokens,
      CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_nonspace_chars,
      CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_token_len
    FROM t
    """,
    doc="Whitespace token counting + average token length.",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    nonspace = F.length(F.regexp_replace(text, r"\s+", ""))
    n_tok = token_count(text)
    return docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        nonspace.cast("bigint").alias("n_nonspace_chars"),
        (nonspace.cast("double") / n_tok.cast("double")).alias("avg_token_len"),
    )


@register(
    "text_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
      CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
    doc="BPE-ish tokenizer: word pieces / digit runs / single punctuation "
    "via regexp_extract_all (identical RE semantics both engines).",
    tags=("text",),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return docs.select("doc_id", F.size(toks).cast("bigint").alias("n_bpe_tokens"))


@register(
    "text_quality_scores",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             w -> w IN ({_STOPS_SQL}))) AS BIGINT) AS n_stopwords
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens, n_stopwords,
      CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
      least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.5
        + least(CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 4.0, 1.0) * 0.5 AS quality_score
    FROM t
    """,
    doc="Document quality scoring: length + stopword-ratio features "
    "combined into a [0,1] score (the C4/Gopher-style rule shape).",
    tags=("text",),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_chars = F.length(text).cast("bigint")
    n_tokens = token_count(text).cast("bigint")
    stops = F.size(
        F.filter(tokens(F.lower(text)), lambda w: w.isin(*STOPWORDS_EN))
    ).cast("bigint")
    ratio = stops.cast("double") / n_tokens.cast("double")
    score = (
        F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0)) * 0.5
        + F.least(ratio * 4.0, F.lit(1.0)) * 0.5
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        stops.alias("n_stopwords"),
        ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


@register(
    "text_lang_id",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, lang,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             w -> w IN ({_STOPS_SQL}))) AS BIGINT) AS en_votes
      FROM documents
    )
    SELECT doc_id, lang, en_votes,
      CASE WHEN CAST(en_votes AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.05
           THEN 'en' ELSE 'und' END AS pred_lang
    FROM t
    """,
    doc="N-gram/stopword language-ID heuristic (the fixture corpus is "
    "synthetic word salad, so the heuristic's value is its determinism, "
    "not its accuracy).",
    tags=("text",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = token_count(text).cast("bigint")
    votes = F.size(F.filter(tokens(F.lower(text)), lambda w: w.isin(*STOPWORDS_EN))).cast("bigint")
    pred = F.when(votes.cast("double") / n_tokens.cast("double") >= 0.05, F.lit("en")).otherwise(
        F.lit("und")
    )
    return docs.select("doc_id", "lang", votes.alias("en_votes"), pred.alias("pred_lang"))


@register(
    "text_fingerprints",
    oracle=r"""
    SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
    doc="Document fingerprinting: md5 over whitespace-normalized lowercase "
    "text (DuckDB needs the 'g' flag to match Spark's replace-all).",
    tags=("text",),
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
      CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
      CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS n_frames
    FROM documents
    """,
    doc="Multimodal plumbing: binary payload column → Arrow-batched "
    "mapInPandas decode stage (decoder stubbed deterministically — no "
    "codec libs in this container; see operators.multimodal).",
    tags=("multimodal",),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return decode_media_stub(with_binary_payload(docs))


@register(
    "multimodal_resize_meta",
    oracle="""
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
      CAST(least(octet_length(encode(text)), 64 * 48) AS BIGINT) AS resized_bytes
    FROM documents
    """,
    doc="Multimodal resize stage (binary → binary, 1:1): mapInPandas "
    "truncation stub standing in for a real PIL resize; the oracle "
    "checks the size arithmetic, pytest checks the bytes.",
    tags=("multimodal",),
)
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return resize_media_stub(with_binary_payload(docs)).select(
        "doc_id", "orig_bytes", "resized_bytes"
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n,
             octet_length(encode(text)) % 30 + 1 AS n_frames,
             greatest(octet_length(encode(text)) // (octet_length(encode(text)) % 30 + 1), 1)
               AS frame_len
      FROM documents
    )
    SELECT doc_id,
      CAST(f.frame_no AS BIGINT) AS frame_no,
      CAST(f.frame_no * frame_len AS BIGINT) AS frame_off,
      CAST(frame_len AS BIGINT) AS frame_len
    FROM meta, LATERAL (SELECT unnest(range(0, n_frames, 5)) AS frame_no) f
    """,
    doc="Multimodal frame sampling (one row → one row per 5th frame): "
    "the fan-out runs inside the Arrow batch, no explode shuffle; frame "
    "count/window arithmetic is the deterministic decode stub's, so the "
    "oracle replays it in SQL (bytes themselves are pytest-checked).",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames_stub(with_binary_payload(docs)).select(
        "doc_id", "frame_no", "frame_off", "frame_len"
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
_PII_IP = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

# The fixture corpus is synthetic word salad with no PII, so the query
# plants deterministic PII into doc_id < 50 on BOTH engines — otherwise
# the redaction would be vacuously green (round-1 lesson: a query that
# matches nothing proves nothing).
_PII_AUG = """
      SELECT doc_id,
             CASE WHEN doc_id < 50
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or 555-123-4567 at 10.0.0.'
                       || CAST(doc_id % 256 AS VARCHAR)
                  ELSE text END AS text
      FROM documents
"""


@register(
    "text_redact_pii",
    oracle=f"""
    WITH aug AS ({_PII_AUG})
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
      CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ips,
      md5(regexp_replace(regexp_replace(regexp_replace(text,
            '{_PII_EMAIL}', '<EMAIL>', 'g'),
            '{_PII_PHONE}', '<PHONE>', 'g'),
            '{_PII_IP}', '<IP>', 'g')) AS redacted_fp
    FROM aug
    """,
    doc="PII redaction — the training-data scrub stage: emails, dashed "
    "phone numbers, and IPv4 literals replaced with typed placeholders, "
    "counts + an md5 fingerprint of the redacted text (hash-checkable "
    "without shipping the full text through the comparator). Patterns "
    "are Java-regex/RE2-portable; pure per-row expressions, no UDF.",
    tags=("text",),
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    from ..functions.text import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-123-4567 at 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
    )
    aug = docs.select(
        "doc_id", F.when(F.col("doc_id") < 50, planted).otherwise(F.col("text")).alias("text")
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), F.lit(0))).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_PHONE), F.lit(0))).cast("bigint").alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_IP), F.lit(0))).cast("bigint").alias("n_ips"),
        F.md5(redact_pii(F.col("text"))).alias("redacted_fp"),
    )


@register(
    "text_train_heldout_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             {duck_hex13_to_long("md5('split42|' || CAST(doc_id AS VARCHAR))")} % 1000 AS bucket
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 900 THEN 'train' ELSE 'heldout' END AS split
    FROM b
    """,
    doc="Deterministic 90/10 train/held-out split by keyed md5 hash "
    "(functions/text.py: hash_split) — reproducible and "
    "partitioning-stable, unlike random() sampling; the per-document "
    "assignment itself is value-checked against DuckDB.",
    tags=("text", "sampling"),
)
def text_train_heldout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    from ..functions.text import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", hash_split(F.col("doc_id")).alias("split"))

@register(
    "seq_ngram_lm_counts",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    big AS (
      SELECT w[CAST(i AS INTEGER)] AS w1, w[CAST(i AS INTEGER) + 1] AS w2
      FROM t, LATERAL (SELECT unnest(range(1, len(w)))) u(i)
    ),
    cnt AS (SELECT w1, w2, COUNT(*) AS n FROM big GROUP BY w1, w2),
    tot AS (SELECT w1, SUM(n) AS n1 FROM cnt GROUP BY w1)
    SELECT w1, w2, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / CAST(n1 AS DOUBLE) AS cond_p
    FROM cnt JOIN tot USING (w1)
    ORDER BY n DESC, w1 ASC, w2 ASC
    LIMIT 50
    """,
    doc="Bigram language-model counts over the corpus: top-50 bigrams "
    "with conditional probability p(w2|w1) = count(w1 w2)/count(w1 ·). "
    "The n-gram-LM/data-quality primitive (perplexity filters, "
    "contamination n-gram lookup tables). Tokens explode once; bigram "
    "pairing is a per-row transform over the token array (no window, no "
    "self-join); both aggregates are hash aggs with map-side partials, "
    "and the top-50 is TakeOrdered, never a global sort. cond_p divides "
    "exact integers, so the hash is stable cross-engine.",
    tags=("text", "analytics"),
)
def seq_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    bigrams = (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            F.explode(
                F.when(
                    F.size(w) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.struct(
                            F.element_at(w, i).alias("w1"),
                            F.element_at(w, i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    cnt = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("w1").agg(F.sum("n").alias("n1"))
    return (
        cnt.join(tot, "w1")
        .select(
            "w1",
            "w2",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n").cast("double") / F.col("n1").cast("double")).alias("cond_p"),
        )
        .orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
        .limit(50)
    )

# --- per-doc bigram LM quality score (perplexity-style filter) ----------------

@register(
    "seq_doc_logprob",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    big AS (
      SELECT doc_id, w[CAST(i AS INTEGER)] AS w1, w[CAST(i AS INTEGER) + 1] AS w2
      FROM t, LATERAL (SELECT unnest(range(1, len(w)))) u(i)
    ),
    cnt AS (SELECT w1, w2, COUNT(*) AS n FROM big GROUP BY w1, w2),
    tot AS (SELECT w1, SUM(n) AS n1 FROM cnt GROUP BY w1),
    terms AS (
      SELECT b.doc_id,
             CAST(round(ln(CAST(c.n AS DOUBLE) / CAST(tt.n1 AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS micro_ln
      FROM big b JOIN cnt c ON b.w1 = c.w1 AND b.w2 = c.w2
                 JOIN tot tt ON b.w1 = tt.w1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(micro_ln) AS DOUBLE) / (COUNT(*) * 1000000.0) AS avg_logprob
    FROM terms GROUP BY doc_id
    """,
    doc="Per-document bigram LM score: mean ln p(w2|w1) under the "
    "corpus-trained bigram model — the perplexity-style quality filter "
    "(low average log-prob = unnatural token sequences = drop "
    "candidate). Each ln is rounded onto a 1e-6 integer grid BEFORE the "
    "per-doc sum (exact BIGINT arithmetic, summation-order-free), so "
    "the cross-partition aggregate is deterministic — the same "
    "fixed-point move as the k-means mean update; ln itself is the "
    "catalog's one transcendental and the 1e-6 grid absorbs its ulp "
    "(pattern proven by BM25/TF-IDF). Model counts and doc terms reuse "
    "one bigram explode; everything shuffles on (w1,w2) or doc_id only.",
    tags=("text", "analytics"),
)
def seq_doc_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    bigrams = (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.size(w) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.struct(
                            F.element_at(w, i).alias("w1"),
                            F.element_at(w, i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    cnt = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("w1").agg(F.sum("n").alias("n1"))
    model = cnt.join(tot, "w1").select(
        "w1",
        "w2",
        F.round(
            F.log(F.col("n").cast("double") / F.col("n1").cast("double")) * 1000000.0
        ).cast("bigint").alias("micro_ln"),
    )
    terms = bigrams.join(model, ["w1", "w2"])
    return terms.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        (F.sum("micro_ln").cast("double") / (F.count("*") * F.lit(1000000.0))).alias(
            "avg_logprob"
        ),
    )

# --- mean-pooled document embeddings (chunk -> doc vector aggregation) --------

_POOL_DIM = 16
_POOL_SCALE = 1 << 20


@register(
    "doc_embedding_meanpool",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id,
             CAST(floor((i - 1) / 800) AS BIGINT) AS chunk_id,
             substring(text, CAST(i AS INTEGER), 1000) AS chunk_text
      FROM documents,
           LATERAL (SELECT unnest(range(1, greatest(length(text), 1) + 1, 800)) AS i) s
      WHERE length(trim(substring(text, CAST(i AS INTEGER), 1000))) > 0
    ),
    cemb AS (
      SELECT doc_id, chunk_id,
             {duck_hash_embedding('chunk_text', _POOL_DIM, 'pool42')} AS cvec
      FROM chunks
    ),
    comps AS (
      SELECT doc_id, j,
             SUM(CAST(floor(cvec[CAST(j AS INTEGER) + 1] * {_POOL_SCALE}.0) AS BIGINT)) AS fp_sum,
             COUNT(*) AS n
      FROM cemb, LATERAL (SELECT unnest(range(0, {_POOL_DIM}))) t(j)
      GROUP BY doc_id, j
    )
    SELECT doc_id, CAST(j AS BIGINT) AS dim,
           CAST(fp_sum AS DOUBLE) / CAST(n * {_POOL_SCALE} AS DOUBLE) AS mean_val,
           CAST(n AS BIGINT) AS n_chunks
    FROM comps
    """,
    doc="Chunk-to-document embedding aggregation: chunk the text with "
    "the reference's stride-800/width-1000 chunker, hash-embed each "
    "chunk, and mean-pool per (doc, dimension) — the standard "
    "multi-vector -> single-vector collapse for doc-level retrieval. "
    "The mean uses the fixed-point trick (floor onto a 2^20 grid, "
    "exact BIGINT sums, one correctly-rounded division), so the "
    "cross-partition aggregate is order-free and value-checked; output "
    "is long-format (doc, dim, mean) because the driver comparator "
    "hashes scalars. One explode + one hash-agg keyed (doc_id, dim).",
    tags=("text", "ann"),
)
def doc_embedding_meanpool(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..embedder import hash_embedding_expr
    from ..operators.chunker import chunk_documents

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs)
    cemb = chunks.select(
        "doc_id",
        "chunk_id",
        hash_embedding_expr(F.col("chunk_text"), _POOL_DIM, "pool42").alias("cvec"),
    )
    comps = cemb.select(
        "doc_id", F.posexplode("cvec").alias("dim", "val")
    ).groupBy("doc_id", "dim").agg(
        F.sum(F.floor(F.col("val") * F.lit(float(_POOL_SCALE))).cast("long")).alias("fp_sum"),
        F.count("*").alias("n"),
    )
    return comps.select(
        "doc_id",
        F.col("dim").cast("bigint").alias("dim"),
        (F.col("fp_sum").cast("double") / (F.col("n") * F.lit(_POOL_SCALE)).cast("double")).alias("mean_val"),
        F.col("n").cast("bigint").alias("n_chunks"),
    )


# --- per-doc token entropy (gibberish / templated-text signal) ----------------


@register(
    "text_token_entropy",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    tok AS (
      SELECT doc_id, unnest(w) AS word, len(w) AS n FROM t
    ),
    cnt AS (
      SELECT doc_id, word, COUNT(*) AS c, MAX(n) AS n
      FROM tok GROUP BY doc_id, word
    ),
    terms AS (
      SELECT doc_id, n,
             c * CAST(round(ln(CAST(c AS DOUBLE) / n) * 1000000.0) AS BIGINT)
               AS micro_term
      FROM cnt
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(-SUM(micro_term) AS DOUBLE) / (MAX(n) * 1000000.0) AS entropy
    FROM terms GROUP BY doc_id
    """,
    doc="Per-document unigram token entropy H = -sum p ln p — the "
    "information-density quality signal (near-zero for templated or "
    "repeated text, ln(n_distinct) for all-distinct word salad; "
    "gibberish detectors threshold on it next to the Gopher rules). "
    "Each ln(c/n) lands on the 1e-6 integer grid BEFORE the per-doc "
    "sum (seq_doc_logprob's fixed-point move), multiplied by the exact "
    "integer count c, so the cross-partition aggregate is order-free "
    "BIGINT arithmetic and the final division is one deterministic fp64 "
    "op — hash-matches DuckDB. One shuffle on (doc_id, word), one on "
    "doc_id.",
    tags=("text", "analytics"),
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    tok = (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", F.size(w).alias("n"), F.explode(w).alias("word"))
    )
    cnt = tok.groupBy("doc_id", "word").agg(
        F.count("*").alias("c"), F.max("n").alias("n")
    )
    micro_term = (
        F.col("c")
        * F.round(F.ln(F.col("c").cast("double") / F.col("n")) * F.lit(1000000.0)).cast("long")
    )
    terms = cnt.select("doc_id", "n", micro_term.alias("micro_term"))
    return terms.groupBy("doc_id").agg(
        F.max("n").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct"),
        ((-F.sum("micro_term")).cast("double") / (F.max("n") * F.lit(1000000.0))).alias(
            "entropy"
        ),
    )


# --- DSIR-style importance weights (data selection for language models) -------


@register(
    "text_dsir_importance",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    big AS (
      SELECT doc_id, lang,
             w[CAST(i AS INTEGER)] AS w1, w[CAST(i AS INTEGER) + 1] AS w2
      FROM t, LATERAL (SELECT unnest(range(1, len(w)))) u(i)
    ),
    cc AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY w1, w2),
    tc AS (SELECT w1, SUM(c) AS n1 FROM cc GROUP BY w1),
    ct AS (SELECT w1, w2, COUNT(*) AS c FROM big WHERE lang = 'en' GROUP BY w1, w2),
    tt AS (SELECT w1, SUM(c) AS n1 FROM ct GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM big),
    terms AS (
      SELECT b.doc_id,
        CAST(round(ln(CAST(COALESCE(ct.c, 0) + 1 AS DOUBLE)
                      / CAST(COALESCE(tt.n1, 0) + v.vocab AS DOUBLE)) * 1000000.0)
             AS BIGINT)
        - CAST(round(ln(CAST(cc.c + 1 AS DOUBLE)
                        / CAST(tc.n1 + v.vocab AS DOUBLE)) * 1000000.0)
               AS BIGINT) AS micro_lr
      FROM big b
      JOIN cc ON cc.w1 = b.w1 AND cc.w2 = b.w2
      JOIN tc ON tc.w1 = b.w1
      LEFT JOIN ct ON ct.w1 = b.w1 AND ct.w2 = b.w2
      LEFT JOIN tt ON tt.w1 = b.w1
      CROSS JOIN v
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(micro_lr) AS DOUBLE) / (COUNT(*) * 1000000.0) AS importance
      FROM terms GROUP BY doc_id
    )
    SELECT p.doc_id, d.lang, p.n_bigrams, p.importance
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    """,
    doc="DSIR-style importance weights (Xie et al. 2023, 'Data Selection "
    "for Language Models via Importance Resampling', hashed-ngram "
    "variant): per document, the mean bigram log-likelihood RATIO "
    "between a target-domain LM (here: the lang='en' slice) and the "
    "raw-corpus LM, add-one smoothed over the shared vocabulary — the "
    "score a selection pass resamples by to tilt a crawl toward a "
    "target distribution. Both models are count tables from ONE bigram "
    "explode; each ln lands on the 1e-6 grid before the order-free "
    "integer per-doc sum (the proven fixed-point move), so every "
    "importance value hash-matches DuckDB. English docs score near "
    "zero (the target IS their distribution); non-target docs go "
    "negative — the monitor shows the separation directly.",
    tags=("text", "pipeline", "analytics"),
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    big = (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.when(
                    F.size(w) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.struct(
                            F.element_at(w, i).alias("w1"),
                            F.element_at(w, i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            ).alias("bg"),
        )
        .select("doc_id", "lang", "bg.w1", "bg.w2")
        .persist()
    )
    cc = big.groupBy("w1", "w2").agg(F.count("*").alias("cc"))
    tc = cc.groupBy("w1").agg(F.sum("cc").alias("tcn"))
    ct = (
        big.filter(F.col("lang") == "en")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("ct"))
    )
    tt = ct.groupBy("w1").agg(F.sum("ct").alias("ttn"))
    v = big.agg(F.countDistinct("w2").alias("vocab"))
    micro = lambda num, den: F.round(F.ln(num.cast("double") / den.cast("double")) * F.lit(1000000.0)).cast("long")
    terms = (
        big.join(cc, ["w1", "w2"])
        .join(tc, "w1")
        .join(ct, ["w1", "w2"], "left")
        .join(tt, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            (
                micro(
                    F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1),
                    F.coalesce(F.col("ttn"), F.lit(0)) + F.col("vocab"),
                )
                - micro(F.col("cc") + F.lit(1), F.col("tcn") + F.col("vocab"))
            ).alias("micro_lr"),
        )
    )
    per_doc = terms.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        (F.sum("micro_lr").cast("double") / (F.count("*") * F.lit(1000000.0))).alias(
            "importance"
        ),
    )
    return per_doc.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "n_bigrams", "importance"
    )


# --- text → token-id encoding (round 6) ---------------------------------------

_VOCAB_SIZE = 256


@register(
    "text_tokenize_ids",
    oracle=rf"""
    WITH tw AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    ),
    posting AS (
      SELECT doc_id, w[CAST(i AS INTEGER)] AS word, CAST(i AS BIGINT) AS pos
      FROM tw, LATERAL (SELECT unnest(range(1, len(w) + 1))) s(i)
    ),
    freq AS (SELECT word, COUNT(*) AS n FROM posting GROUP BY word),
    vocab AS (
      SELECT word, CAST(row_number() OVER (ORDER BY n DESC, word ASC) AS INTEGER) AS id
      FROM freq ORDER BY n DESC, word ASC LIMIT {_VOCAB_SIZE}
    ),
    enc AS (
      SELECT p.doc_id, p.pos, COALESCE(v.id, 0) AS tid
      FROM posting p LEFT JOIN vocab v USING (word)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS token_ids_csv
    FROM enc GROUP BY doc_id
    """,
    doc="Text → token-id encoding with a DETERMINISTIC frequency "
    "vocabulary — the tokenization stage between curation and packing "
    "that the catalog previously only counted: top-256 words by "
    "(frequency DESC, word ASC) become ids 1..256, everything else OOV "
    "id 0; output is each doc's ordered id sequence plus its OOV count "
    "(the vocabulary-coverage monitor). Fully distributed: the vocab is "
    "a ranked 256-row relation broadcast onto the exploded postings, "
    "re-assembled per doc by position — no driver-side vocab, no "
    "all-pairs; the only global sort is over the BOUNDED candidate "
    "relation feeding the 256-row limit. Ids are exact integers. The "
    "registered output projects the sequence as a CSV scalar "
    "(token_ids_csv) — the driver's pandas canonicalizer lexsorts "
    "output columns and cannot hash a top-level array (the r07 red "
    "row); tokenize_ids_array keeps the raw array<int> form for "
    "engine consumers and is pytest-verified against an independent "
    "Python recompute.",
    tags=("text", "pipeline"),
)
def text_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    arr = tokenize_ids_array(spark, sf_dir)
    return arr.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.concat_ws(
            ",", F.transform(F.col("token_ids"), lambda t: t.cast("string"))
        ).alias("token_ids_csv"),
    )


def tokenize_ids_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw array<int> form of ``text_tokenize_ids`` (one row per doc,
    ``token_ids`` as an ordered sequence) — the shape downstream packing
    consumes. Not registered: the driver canonicalizer can't hash
    top-level arrays (enforced catalog-wide by
    tests/test_registry_contract.py); the registered query projects this
    exact relation through concat_ws."""
    from pyspark.sql import Window

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    posting = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    freq = posting.groupBy("word").agg(F.count("*").alias("n"))
    # 256-row candidate set first (TakeOrdered — no global sort of the
    # vocabulary), then a dense id by the same total order; the window's
    # single partition holds exactly _VOCAB_SIZE rows by construction.
    top = freq.orderBy(F.desc("n"), F.asc("word")).limit(_VOCAB_SIZE)
    vocab = top.select(
        "word",
        F.row_number()
        .over(Window.orderBy(F.desc("n"), F.asc("word")))
        .cast("int")
        .alias("id"),
    )
    enc = posting.join(F.broadcast(vocab), "word", "left").select(
        "doc_id", "pos", F.coalesce(F.col("id"), F.lit(0)).alias("tid")
    )
    return enc.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum((F.col("tid") == 0).cast("long")).alias("n_oov"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s.getField("tid"),
        ).alias("token_ids"),
    )


#: Frequent-bucket guard for the pHash chunk blocking. Measured at sf10
#: (tools/gen_sf.py): the degenerate chunk value (ch=3, v=0 — the hash's
#: high bits are all-zero for most payloads) collects 92,746 of 550k
#: docs, and the uncapped self-join on it alone expands to 4.3e9
#: candidate pairs in ONE task (a >30-min straggler). A chunk value
#: shared by orders of magnitude more docs than the ~8 expected under
#: uniform hashing carries no discriminative signal — dropping those
#: buckets is the standard LSH frequent-bucket guard (same trade as
#: MinHash banding). The cap never binds at the driver fixtures (max
#: observed bucket at sf0.01: 67), so results there are unchanged.
_PHASH_BUCKET_CAP = 1024


@register(
    "multimodal_phash_neardup_pairs",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000, substr(text, 1, len(text)-1) || 'q'
      FROM documents WHERE doc_id % 10 = 0
    ),
    cells AS (
      SELECT doc_id, list_transform(range(0, 64), k ->
        COALESCE(list_sum(list_transform(range(1+k, len(text)+1, 64),
                                         j -> ord(substr(text, j, 1)))), 0)) AS c
      FROM aug
    ),
    hsh AS MATERIALIZED (
      SELECT doc_id,
        list_transform(range(0, 4), ch ->
          list_sum(list_transform(range(0, 16), k ->
            CASE WHEN c[ch*16 + k + 1] * 64 > list_sum(c)
                 THEN 1 << k ELSE 0 END))) AS h
      FROM cells
    ),
    chunks AS MATERIALIZED (
      SELECT doc_id, ch, h[ch + 1] AS v
      FROM hsh, LATERAL (SELECT unnest(range(0, 4)) AS ch)
    ),
    keep AS (
      SELECT ch, v FROM chunks GROUP BY ch, v
      HAVING COUNT(*) <= {_PHASH_BUCKET_CAP}
    ),
    ck AS (SELECT c.doc_id, c.ch, c.v FROM chunks c JOIN keep USING (ch, v)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ck a JOIN ck b
        ON a.ch = b.ch AND a.v = b.v AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
      CAST(bit_count(xor(ha.h[1], hb.h[1])) + bit_count(xor(ha.h[2], hb.h[2]))
         + bit_count(xor(ha.h[3], hb.h[3])) + bit_count(xor(ha.h[4], hb.h[4]))
        AS BIGINT) AS hamming
    FROM cand c JOIN hsh ha ON ha.doc_id = c.doc_a
                JOIN hsh hb ON hb.doc_id = c.doc_b
    WHERE bit_count(xor(ha.h[1], hb.h[1])) + bit_count(xor(ha.h[2], hb.h[2]))
        + bit_count(xor(ha.h[3], hb.h[3])) + bit_count(xor(ha.h[4], hb.h[4])) <= 3
    """,
    doc="Perceptual-hash near-duplicate detection over BINARY media "
    "payloads — the multimodal twin of dedup_simhash_pairs. The corpus "
    "is augmented with 1-byte-perturbed copies of every 10th payload "
    "(the known-dup plant; real corpora bring their own), each payload "
    "hashes to 64 pHash bits via the Arrow-batched mapInPandas stub "
    "(integer byte-sum cells + mean test standing in for "
    "decode/resize/DCT), and pairs within Hamming distance 3 surface "
    "through 4x16-bit pigeonhole chunk blocking — never all-pairs. "
    f"Buckets larger than {_PHASH_BUCKET_CAP} docs are dropped before "
    "the self-join (the LSH frequent-bucket guard; see "
    "_PHASH_BUCKET_CAP — an uncapped degenerate chunk value expanded "
    "to 4.3e9 pairs in one task at sf10). Below the cap the blocking "
    "is provably lossless at <= 3 (a pair differing in <= 3 bits "
    "matches on >= 1 intact chunk); a pair whose ONLY intact chunk is "
    "a dropped degenerate bucket is traded away — the same bounded "
    "recall trade MinHash banding makes, documented rather than "
    "silent. The oracle recomputes the entire hash AND the guard from "
    "the payload bytes in integer algebra, making this a mapInPandas "
    "stage whose OUTPUT is value-hash-checked cross-engine — the stub "
    "swaps for PIL+DCT with the same schema and plan.",
    tags=("multimodal", "dedup"),
)
def multimodal_phash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import phash_stub, with_binary_payload

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    variants = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 10000000).alias("doc_id"),
            F.concat(
                F.expr("substring(text, 1, length(text)-1)"), F.lit("q")
            ).alias("text"),
        )
    )
    aug = docs.select("doc_id", "text").unionByName(variants)
    hsh = phash_stub(with_binary_payload(aug)).cache()
    chunks = hsh.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, 3), ch -> struct(ch AS ch, element_at(array(h0, h1, h2, h3), ch + 1) AS v))")
        ).alias("p"),
    ).select("doc_id", F.col("p.ch").alias("ch"), F.col("p.v").alias("v"))
    # frequent-bucket guard (see _PHASH_BUCKET_CAP): degenerate chunk
    # values would expand quadratically in one reducer; the kept-bucket
    # list is at most 4 * 2^16 rows, so it broadcasts
    keep = (
        chunks.groupBy("ch", "v")
        .agg(F.count("*").alias("bn"))
        .filter(F.col("bn") <= _PHASH_BUCKET_CAP)
        .select("ch", "v")
    )
    ck = chunks.join(F.broadcast(keep), ["ch", "v"])
    a = ck.select(F.col("doc_id").alias("doc_a"), "ch", "v")
    b = ck.select(F.col("doc_id").alias("doc_b"), F.col("ch").alias("ch_b"), F.col("v").alias("v_b"))
    cand = (
        a.join(
            b,
            (F.col("ch") == F.col("ch_b"))
            & (F.col("v") == F.col("v_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    ha = hsh.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{c}").alias(f"a{c}") for c in range(4)],
    )
    hb = hsh.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{c}").alias(f"b{c}") for c in range(4)],
    )
    dist = sum(
        F.expr(f"bit_count(a{c} ^ b{c})") for c in range(4)
    )
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .withColumn("hamming", dist.cast("bigint"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


_TRGM_PATTERN = "fast table"


@register(
    "text_substring_search_trigram",
    oracle=f"""
    SELECT doc_id, CAST(strpos(text, '{_TRGM_PATTERN}') AS BIGINT) AS pos
    FROM documents WHERE strpos(text, '{_TRGM_PATTERN}') > 0
    """,
    doc="Substring search served from a trigram inverted index (the "
    "pg_trgm / code-search design): each document explodes to its "
    "distinct character 3-grams, the pattern's trigrams select "
    "candidates that contain ALL of them (one group-count semi-join — "
    "a doc matching the pattern necessarily contains every pattern "
    "trigram, so candidates are a provable superset), and only "
    "candidates pay the exact contains() verify. The oracle is the "
    "naive full-scan LIKE — equality holds because the index path is "
    "lossless-by-superset + exact-verify, independent of how docs "
    "partition. At 100 TB the doc-trigram relation is a persisted "
    "posting-list index keyed by trigram (same lifecycle as the IVF "
    "inverted lists) and the verify touches only posting-intersection "
    "survivors; the full-scan LIKE form exists only as this oracle.",
    tags=("text", "index"),
)
def text_substring_search_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    n = len(_TRGM_PATTERN)
    pat_trigrams = sorted({_TRGM_PATTERN[i : i + 3] for i in range(n - 2)})
    tg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, greatest(length(text) - 2, 0)), "
                "i -> substring(text, i, 3)))"
            )
        ).alias("trigram"),
    )
    pat = spark.createDataFrame([(t,) for t in pat_trigrams], "trigram string")
    cand = (
        tg.join(F.broadcast(pat), "trigram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") == len(pat_trigrams))
        .select("doc_id")
    )
    return (
        docs.join(cand, "doc_id", "left_semi")
        .select("doc_id", F.locate(_TRGM_PATTERN, F.col("text")).cast("bigint").alias("pos"))
        .filter(F.col("pos") > 0)
    )


# --- positional phrase search (round-7 tail) ----------------------------------

_PHRASE = ("scan", "query", "big")


@register(
    "text_phrase_search_positional",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    m AS (
      SELECT doc_id, CAST(i AS BIGINT) - 1 AS start
      FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1))) u(i)
      WHERE w[CAST(i AS INTEGER)] = '{_PHRASE[0]}'
        AND w[CAST(i AS INTEGER) + 1] = '{_PHRASE[1]}'
        AND w[CAST(i AS INTEGER) + 2] = '{_PHRASE[2]}'
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(start) AS BIGINT) AS first_pos
    FROM m GROUP BY doc_id
    """,
    doc=f"Positional phrase search ('{' '.join(_PHRASE)}') over a "
    "token-level inverted index — the IR sibling of "
    "text_substring_search_trigram (substrings) at word granularity: "
    "tokens posexplode ONCE, rows matching any phrase word map to "
    "candidate start positions (pos - offset), and a start that "
    "collects ALL distinct offsets is a phrase hit — the classic "
    "positional-postings intersection rewritten as ONE aggregation on "
    "(doc_id, start), so the engine never rescans per phrase term "
    "(plan-asserted single scan) and never runs LIKE over raw text. "
    "At 100 TB the isin() pre-filter prunes the exploded stream to "
    "the phrase terms' postings before any shuffle, and both "
    "aggregations are keyed hash aggs. The DuckDB oracle is an "
    "INDEPENDENT per-doc lateral scan of the token array — two "
    "different algorithms, hash-identical output.",
    tags=("text", "search"),
)
def text_phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return phrase_search(docs, _PHRASE)


def phrase_search(docs: DataFrame, phrase: tuple[str, ...] | list[str]) -> DataFrame:
    """Positional phrase search: per-doc match count + first 0-based
    token position, one explode pass over ``docs(doc_id, text)``.

    Each posting row yields (start = pos - offset) for EVERY phrase
    offset its token matches, so repeated phrase words and overlapping
    occurrences are handled; a start is a hit iff it collects all
    distinct offsets (for a phrase of n words a window of n consecutive
    tokens matches iff each offset contributes — repeated words "a b a"
    included, since offsets 0 and 2 both require 'a' at their shifted
    positions and each contributes its own offset id)."""
    w = F.split(F.trim(F.col("text")), r"\s+")
    toks = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.posexplode(w).alias("pos", "tok")
    )
    offsets = F.filter(
        F.array(*[
            F.struct(F.lit(i).alias("i"), F.lit(t).alias("t"))
            for i, t in enumerate(phrase)
        ]),
        lambda s: s["t"] == F.col("tok"),
    )
    contrib = (
        toks.filter(F.col("tok").isin(*phrase))
        .select("doc_id", "pos", F.explode(offsets).alias("o"))
        .select("doc_id", (F.col("pos") - F.col("o.i")).alias("start"), F.col("o.i").alias("i"))
        .filter(F.col("start") >= 0)
    )
    hits = (
        contrib.groupBy("doc_id", "start")
        .agg(F.size(F.collect_set("i")).alias("n_offsets"))
        .filter(F.col("n_offsets") == len(phrase))
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_matches"),
        F.min("start").cast("bigint").alias("first_pos"),
    )


# --- split balance audit: chi-square lang x split (round-7 tail) ---------------

def _chi2_split_sql(h13: str) -> str:
    """``h13`` is the engine's md5-fold-to-integer of 'split42|doc_id' —
    the same keyed hash as functions.text.hash_split, so this audits the
    ACTUAL split the pipeline would ship."""
    exp = ("CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE) "
           "/ CAST(t.n AS DOUBLE)")
    return f"""
    WITH s AS (
      SELECT lang,
             CASE WHEN {h13} % 1000 < 900 THEN 'train' ELSE 'heldout' END AS split
      FROM documents
    ),
    c AS (SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_xy
          FROM s GROUP BY lang, split),
    mx AS (SELECT lang, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM c GROUP BY lang),
    my AS (SELECT split, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM c GROUP BY split),
    t AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM c)
    SELECT c.lang, c.split, c.n_xy,
           CAST(round((CAST(c.n_xy AS DOUBLE) - {exp})
                      * (CAST(c.n_xy AS DOUBLE) - {exp})
                      / ({exp})
                      * 1000000000) AS BIGINT) AS chi2_contrib_nano
    FROM c JOIN mx ON c.lang = mx.lang JOIN my ON c.split = my.split
    CROSS JOIN t
    """


@register(
    "split_balance_chi2",
    oracle=_chi2_split_sql(
        duck_hex13_to_long("md5('split42|' || CAST(doc_id AS VARCHAR))")
    ),
    doc="Chi-square balance audit of the train/heldout hash split "
    "against the language marginal — the statistical gate a pipeline "
    "runs before trusting a split: per-cell contribution (obs-exp)^2/"
    "exp of the lang x split contingency table, in integer nano-units "
    "(fixed-point, associative sum — the PSI/MI pattern), against the "
    "SAME seeded md5-permille assignment functions.text.hash_split "
    "ships (seed split42, 900 permille), so the audit covers the real "
    "artifact, not a model of it. One groupBy on the pair; marginals "
    "roll up from the cell table; sum over cells vs chi2(df=4) at "
    "alpha=0.05 (9.49) is the conventional reject line. Cells with "
    "zero observed count are absent in BOTH engines (their expected "
    "mass still shifts the emitted cells' marginals identically).",
    tags=("text", "sampling", "eval"),
)
def split_balance_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ["documents"])
    h13 = "conv(substring(md5(CONCAT('split42|', CAST(doc_id AS STRING))), 1, 13), 16, 10)"
    return spark.sql(_chi2_split_sql(h13))


# --- cross-modal retrieval over binary payloads (round-7 tail) -----------------

_XM_DIM = 16
_XM_SEED = "m42"
_XM_QUERY = "vector table scan"


def _crossmodal_oracle() -> str:
    from .oracle_dialect import duck_cosine

    # DuckDB 1.0's md5() takes VARCHAR only; the fabricated payload is
    # exactly the utf8 bytes of ``text``, so md5(text) is byte-identical
    # to Spark's md5(payload) over the BLOB
    mvec = duck_hash_embedding("md5(text)", _XM_DIM, _XM_SEED)
    qvec = duck_hash_embedding(f"'{_XM_QUERY}'", _XM_DIM, _XM_SEED)
    sim = duck_cosine("m.mvec", "q.qvec")
    return f"""
    WITH m AS (SELECT doc_id, {mvec} AS mvec FROM documents),
    q AS (SELECT {qvec} AS qvec)
    SELECT doc_id, similarity FROM (
      SELECT m.doc_id, {sim} AS similarity,
             row_number() OVER (ORDER BY {sim} DESC, m.doc_id) AS rn
      FROM m CROSS JOIN q
    ) WHERE rn <= 5
    """


@register(
    "multimodal_crossmodal_topk",
    oracle=_crossmodal_oracle(),
    doc="Cross-modal retrieval: media binary payloads and a TEXT query "
    "meet in one shared embedding space (the CLIP serving pattern) — "
    "the media side embeds a deterministic canonical key of the "
    "payload bytes (md5 of the blob; a real deployment embeds decoded "
    "features through the same mapInPandas stage multimodal_decode_meta "
    "exercises), the query side embeds the text with the SAME seed and "
    "dim, and serving is the engine's standard broadcast-query cosine "
    "top-k (TakeOrderedAndProject, never a corpus sort). Every stage "
    "is the md5-fold, so the scores value-check cross-engine.",
    tags=("multimodal", "ann"),
)
def multimodal_crossmodal_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..embedder import hash_embedding_expr
    from ..functions.vector import cosine_sim

    tune(spark)
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    media = docs.select(
        "doc_id",
        hash_embedding_expr(F.md5(F.col("payload")), dim=_XM_DIM, seed=_XM_SEED).alias("mvec"),
    )
    qvec = hash_embedding_expr(F.lit(_XM_QUERY), dim=_XM_DIM, seed=_XM_SEED)
    scored = media.select("doc_id", cosine_sim(F.col("mvec"), qvec).alias("similarity"))
    return scored.orderBy(F.desc("similarity"), F.asc("doc_id")).limit(5)


@register(
    "multimodal_audio_energy",
    oracle="""
    WITH sel AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
    ),
    frames AS (
      SELECT doc_id, CAST(f.f AS BIGINT) AS frame_id,
             list_transform(
               range(CAST(f.f * 64 + 1 AS BIGINT),
                     CAST(least(len(text), f.f * 64 + 64) + 1 AS BIGINT)),
               j -> ord(substr(text, CAST(j AS INTEGER), 1)) - 128) AS s
      FROM sel, LATERAL (SELECT unnest(range(0, CAST(ceil(len(text) / 64.0) AS BIGINT))) AS f) f
    )
    SELECT doc_id, frame_id,
           CAST(len(s) AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(s, v -> v * v)) AS BIGINT) AS energy,
           CAST(list_max(list_transform(s, v -> abs(v))) AS BIGINT) AS peak
    FROM frames
    """,
    doc="Audio frame-energy extraction over BINARY payloads: every 20th "
    "document's payload read as 8-bit unsigned PCM (recentred at 128), "
    "cut into 64-sample frames (last frame partial), per-frame energy "
    "= sum of squared amplitudes and peak = max |amplitude| — the "
    "windowed feature pass every audio pipeline starts with (VAD, "
    "silence trimming, loudness normalization all consume exactly this "
    "shape). Runs as an Arrow-batched mapInPandas stage "
    "(operators/multimodal.py: audio_frames_stub) whose integer OUTPUT "
    "is value-hash-checked cross-engine — the DuckDB oracle recomputes "
    "every frame from the payload bytes; swap the numpy body for a "
    "real decoder (soundfile/librosa) with the same schema and plan. "
    "The frame fan-out happens inside each Arrow batch, so rows never "
    "collect on the driver and a 100 TB audio corpus processes "
    "partition-parallel.",
    tags=("multimodal",),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_frames_stub, with_binary_payload

    tune(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    return audio_frames_stub(with_binary_payload(docs.select("doc_id", "text")))


# --- winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) -------------------
#
# The MOSS fingerprint-selection algorithm: hash every word k-gram,
# slide a window of w consecutive gram hashes over each document, and
# keep the MINIMUM hash of each window (rightmost position on ties) —
# the selected (position, hash) pairs are the document's fingerprints.
# Guarantees: any shared substring of >= k+w-1 tokens between two docs
# yields at least one shared fingerprint (the detection threshold), and
# the expected density is 2/(w+1) — an ~8x sketch here — while staying
# position-aware (unlike MinHash, matches localize to offsets).
#
# Relational form: the per-window argmin is ONE keyed window MIN over a
# combined key ``hash * 2^20 + (2^20 - pos)`` (min hash first, then max
# position — the rightmost-tie rule — decoded exactly afterwards; doc
# length < 2^20 tokens and 32-bit gram hashes keep the key < 2^52,
# fp64/BIGINT-exact in both engines). Everything is keyed by doc_id:
# gram explode, window, distinct — no global shuffle, no UDF. The
# DuckDB oracle computes the same window via a bounded pos-range
# self-join (window-free: sidesteps DuckDB 1.0's multithreaded-window
# hazards the intervals query hit).

_WIN_K = 4  # words per gram
_WIN_W = 4  # grams per window
_WIN_PMOD = 1 << 20


def _duck_hex8_to_long(hex_expr: str) -> str:
    """First 8 md5 hex chars -> BIGINT < 2^32 (DuckDB twin of Spark
    ``conv(substring(h, 1, 8), 16, 10)``)."""
    return (
        f"CAST(list_sum(list_transform(range(1, 9), j -> "
        f"(strpos('0123456789abcdef', substr({hex_expr}, CAST(j AS INTEGER), 1)) - 1) "
        f"* 2.0 ** (4 * (8 - j)))) AS BIGINT)"
    )


def winnow_fingerprints_df(docs: DataFrame) -> DataFrame:
    """Winnowing fingerprint selection over any (doc_id, text) relation —
    the Spark dataflow shared by text_winnow_fingerprints (raw corpus)
    and dedup_winnow_pairs (augmented corpus)."""
    from pyspark.sql import Window

    w = tokens(F.col("text"))
    grams = (
        docs.filter(F.size(w) >= _WIN_K)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - (_WIN_K - 1)),
                    lambda i: F.concat_ws(" ", F.slice(w, i, _WIN_K)),
                )
            ).alias("p0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).cast("bigint").alias("pos"),
            F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
            .cast("bigint")
            .alias("gh"),
        )
    )
    comb = grams.select(
        "doc_id",
        "pos",
        (F.col("gh") * _WIN_PMOD + (F.lit(_WIN_PMOD) - F.col("pos"))).alias("comb"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(_WIN_W - 1), 0)
    )
    sel = (
        comb.withColumn("sel", F.min("comb").over(win))
        .filter(F.col("pos") >= _WIN_W)
        .select("doc_id", "sel")
        .distinct()
    )
    return sel.select(
        "doc_id",
        (F.lit(_WIN_PMOD) - F.col("sel") % _WIN_PMOD).cast("bigint").alias("pos"),
        F.expr(f"sel DIV {_WIN_PMOD}").cast("bigint").alias("gram_hash"),
    )


@register(
    "text_winnow_fingerprints",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(ix.i AS BIGINT) AS pos,
             {_duck_hex8_to_long(f"md5(array_to_string(list_slice(w, ix.i, ix.i + {_WIN_K - 1}), ' '))")} AS gh
      FROM t, LATERAL (SELECT unnest(range(1, len(w) - {_WIN_K - 2})) AS i) ix
      WHERE len(w) >= {_WIN_K}
    ),
    c AS (
      SELECT doc_id, pos, gh * {_WIN_PMOD} + ({_WIN_PMOD} - pos) AS comb FROM g
    ),
    winmin AS (
      SELECT a.doc_id, a.pos AS wend, MIN(b.comb) AS sel
      FROM c a JOIN c b ON b.doc_id = a.doc_id
                       AND b.pos BETWEEN a.pos - {_WIN_W - 1} AND a.pos
      WHERE a.pos >= {_WIN_W}
      GROUP BY a.doc_id, a.pos
    ),
    s AS (SELECT DISTINCT doc_id, sel FROM winmin)
    SELECT doc_id,
           CAST({_WIN_PMOD} - (sel % {_WIN_PMOD}) AS BIGINT) AS pos,
           CAST(sel // {_WIN_PMOD} AS BIGINT) AS gram_hash
    FROM s
    """,
    doc=f"Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS "
    f"algorithm): word {_WIN_K}-gram hashes, window w={_WIN_W}, keep each "
    "window's min hash (rightmost on ties) — the position-aware ~8x "
    "document sketch whose guarantee is that any shared run of >= "
    f"{_WIN_K + _WIN_W - 1} tokens produces a shared fingerprint. One "
    "keyed window MIN over the combined (hash, rightmost-pos) integer "
    "key; per-doc dataflow end to end. Docs shorter than "
    f"{_WIN_K + _WIN_W - 1} tokens have no complete window and are "
    "excluded (fixture min length is 10).",
    tags=("text", "dedup"),
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return winnow_fingerprints_df(load_table(spark, sf_dir, "documents"))


# --- TextRank keyword extraction (PageRank over word co-occurrence) ------------

_TR_ITERS, _TR_SCALE = 3, 1_000_000_000
_TR_BASE = 15 * _TR_SCALE // 100
_TR_WIN = 2  # co-occurrence window: tokens at distance 1..2
_TR_MIN_CO = 5
_TR_TOPK = 20


def _textrank_oracle() -> str:
    parts = [
        rf"""t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents),
    tok AS MATERIALIZED (
      SELECT doc_id, CAST(ix.i AS BIGINT) AS pos, w[CAST(ix.i AS INTEGER)] AS word
      FROM t, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) ix
    ),
    prs AS (
      SELECT least(a.word, b.word) AS wa, greatest(a.word, b.word) AS wb,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id
                           AND b.pos - a.pos IN (1, {_TR_WIN})
                           AND a.word <> b.word
      GROUP BY 1, 2 HAVING COUNT(*) >= {_TR_MIN_CO}
    ),
    edges AS MATERIALIZED (
      SELECT wa AS src, wb AS dst, w FROM prs
      UNION ALL SELECT wb AS src, wa AS dst, w FROM prs
    ),
    deg AS MATERIALIZED (
      SELECT src AS part, CAST(COUNT(*) AS BIGINT) AS outdeg,
             CAST(SUM(w) AS BIGINT) AS outw
      FROM edges GROUP BY src
    ),
    pr0 AS (SELECT part, CAST({_TR_SCALE} AS BIGINT) AS pr FROM deg)"""
    ]
    for t in range(1, _TR_ITERS + 1):
        parts.append(
            f"""in{t} AS (
      SELECT e.dst AS part, SUM((p.pr * e.w) // d.outw) AS s
      FROM edges e JOIN pr{t - 1} p ON p.part = e.src
                   JOIN deg d ON d.part = e.src
      GROUP BY e.dst
    ),
    pr{t} AS MATERIALIZED (
      SELECT d.part,
             CAST({_TR_BASE} + (85 * COALESCE(i.s, 0)) // 100 AS BIGINT) AS pr
      FROM deg d LEFT JOIN in{t} i USING (part)
    )"""
        )
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT d.part AS word, d.outdeg,
           CAST(p.pr AS DOUBLE) / {_TR_SCALE}.0 AS textrank
    FROM deg d JOIN pr{_TR_ITERS} p USING (part)
    ORDER BY p.pr DESC, d.part ASC LIMIT {_TR_TOPK}
    """


@register(
    "text_textrank_keywords",
    oracle=_textrank_oracle(),
    doc=f"TextRank keyword extraction (Mihalcea & Tarau 2004): weighted "
    f"PageRank ({_TR_ITERS} iterations, damping 0.85) over the word "
    f"co-occurrence graph — tokens within distance {_TR_WIN} in any "
    f"document, pair support >= {_TR_MIN_CO} (vocabulary-bounded at "
    "any SF) — reporting the top-"
    f"{_TR_TOPK} words by rank. Reuses operators/graph.pagerank_fp "
    "verbatim (the rank is fixed-point BIGINT with integer shares "
    "(pr*w) div W_u, so the iterative walk is bit-exact against the "
    "unrolled DuckDB twin); the corpus tokenizes once, the word graph "
    "shuffles on the word key, and the rank vector never touches the "
    "driver. The unsupervised keyword stage run on corpora where no "
    "labels exist — the graph sibling of TF-IDF term ranking.",
    tags=("text", "graph", "iterative"),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_fp

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    tok = docs.select(
        "doc_id", F.posexplode(w).alias("p0", "word")
    ).select("doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "word")
    a, b = tok.alias("a"), tok.alias("b")
    prs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") - F.col("a.pos")).isin(1, _TR_WIN)
            & (F.col("a.word") != F.col("b.word")),
        )
        .groupBy(
            F.least(F.col("a.word"), F.col("b.word")).alias("wa"),
            F.greatest(F.col("a.word"), F.col("b.word")).alias("wb"),
        )
        .agg(F.count("*").cast("bigint").alias("w"))
        .filter(F.col("w") >= _TR_MIN_CO)
        # vocabulary-bounded pair relation: checkpoint once so the
        # symmetrizing union + pagerank_fp's deg/ed cache fills re-read
        # it instead of re-tokenizing the corpus per reference
        .localCheckpoint()
    )
    edges = prs.select(F.col("wa").alias("src"), F.col("wb").alias("dst"), "w").unionAll(
        prs.select(F.col("wb").alias("src"), F.col("wa").alias("dst"), "w")
    )
    ranked = pagerank_fp(edges, iterations=_TR_ITERS, scale=_TR_SCALE, weight_col="w")
    return (
        ranked.select(
            F.col("part").alias("word"),
            "outdeg",
            (F.col("pr").cast("double") / F.lit(float(_TR_SCALE))).alias("textrank"),
            F.col("pr").alias("__pr"),
        )
        .orderBy(F.desc("__pr"), F.asc("word"))
        .limit(_TR_TOPK)
        .drop("__pr")
    )


# --- per-document TextRank keywords --------------------------------------------
#
# The per-doc variant of text_textrank_keywords — what TextRank is
# actually run for in a curation pipeline: each document's OWN top-3
# keywords from a random walk over ITS co-occurrence graph (the corpus
# variant ranks globally salient vocabulary; tagging individual docs
# needs per-doc graphs). Node identity is the composite (doc_id, word)
# encoded as 'doc|word' so operators/graph.pagerank_fp runs verbatim —
# every join and aggregate in the walk then keys on the composite
# node, i.e. the whole iteration is doc-partitioned and shuffles
# token-scale relations by key; nothing is global. Top-3 per doc is a
# keyed window over the final rank table.

_TRD_ITERS = 3
_TRD_TOPK = 3
_TRD_MIN_CO = 2  # per-doc support floor: pair must co-occur twice IN the doc


def _textrank_doc_oracle() -> str:
    S = _TR_SCALE
    parts = [
        rf"""t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents),
    tok AS MATERIALIZED (
      SELECT doc_id, CAST(ix.i AS BIGINT) AS pos, w[CAST(ix.i AS INTEGER)] AS word
      FROM t, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) ix
    ),
    prs AS (
      SELECT a.doc_id,
             least(a.word, b.word) AS wa, greatest(a.word, b.word) AS wb,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id
                           AND b.pos - a.pos IN (1, {_TR_WIN})
                           AND a.word <> b.word
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= {_TRD_MIN_CO}
    ),
    edges AS MATERIALIZED (
      SELECT CAST(doc_id AS VARCHAR) || '|' || wa AS src,
             CAST(doc_id AS VARCHAR) || '|' || wb AS dst, doc_id, wa AS dw, w
      FROM prs
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR) || '|' || wb AS src,
             CAST(doc_id AS VARCHAR) || '|' || wa AS dst, doc_id, wb AS dw, w
      FROM prs
    ),
    deg AS MATERIALIZED (
      SELECT src AS part, MIN(doc_id) AS doc_id, MIN(dw) AS word,
             CAST(COUNT(*) AS BIGINT) AS outdeg,
             CAST(SUM(w) AS BIGINT) AS outw
      FROM edges GROUP BY src
    ),
    pr0 AS (SELECT part, CAST({S} AS BIGINT) AS pr FROM deg)"""
    ]
    for t in range(1, _TRD_ITERS + 1):
        parts.append(
            f"""in{t} AS (
      SELECT e.dst AS part, SUM((p.pr * e.w) // d.outw) AS s
      FROM edges e JOIN pr{t - 1} p ON p.part = e.src
                   JOIN deg d ON d.part = e.src
      GROUP BY e.dst
    ),
    pr{t} AS MATERIALIZED (
      SELECT d.part,
             CAST({_TR_BASE} + (85 * COALESCE(i.s, 0)) // 100 AS BIGINT) AS pr
      FROM deg d LEFT JOIN in{t} i USING (part)
    )"""
        )
    body = ",\n    ".join(parts)
    return f"""
    WITH {body},
    fin AS (
      SELECT d.doc_id, d.word, p.pr,
             row_number() OVER (PARTITION BY d.doc_id
                                ORDER BY p.pr DESC, d.word ASC) AS rn
      FROM deg d JOIN pr{_TRD_ITERS} p USING (part)
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, word,
           CAST(rn AS BIGINT) AS kw_rank,
           CAST(pr AS DOUBLE) / {S}.0 AS textrank
    FROM fin WHERE rn <= {_TRD_TOPK}
    """


@register(
    "text_textrank_doc_keywords",
    oracle=_textrank_doc_oracle(),
    doc=f"Per-document TextRank keywords: top-{_TRD_TOPK} words per doc "
    f"from a weighted fixed-point PageRank ({_TRD_ITERS} iterations) "
    "over EACH document's own co-occurrence graph (distance <= "
    f"{_TR_WIN}, per-doc pair support >= {_TRD_MIN_CO}) — the "
    "doc-tagging form of TextRank (the corpus variant ranks globally "
    "salient vocabulary). Composite (doc|word) node ids let "
    "operators/graph.pagerank_fp run verbatim; every walk step keys "
    "on the composite node so the iteration is doc-partitioned end "
    "to end, and the final top-3 is a doc-keyed window. Docs whose "
    "word pairs never repeat have no graph and emit no rows — the "
    "support floor is the noise gate.",
    tags=("text", "graph", "iterative"),
)
def text_textrank_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.graph import pagerank_fp

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    tok = docs.select("doc_id", F.posexplode(w).alias("p0", "word")).select(
        "doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "word"
    )
    a, b = tok.alias("a"), tok.alias("b")
    prs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") - F.col("a.pos")).isin(1, _TR_WIN)
            & (F.col("a.word") != F.col("b.word")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id"),
            F.least(F.col("a.word"), F.col("b.word")).alias("wa"),
            F.greatest(F.col("a.word"), F.col("b.word")).alias("wb"),
        )
        .agg(F.count("*").cast("bigint").alias("w"))
        .filter(F.col("w") >= _TRD_MIN_CO)
        # per-doc support-pruned pair relation: same checkpoint-once
        # rationale as the corpus variant above
        .localCheckpoint()
    )

    def leg(src_w, dst_w):
        return prs.select(
            F.concat_ws("|", F.col("doc_id"), F.col(src_w)).alias("src"),
            F.concat_ws("|", F.col("doc_id"), F.col(dst_w)).alias("dst"),
            "w",
        )

    edges = leg("wa", "wb").unionAll(leg("wb", "wa"))
    ranked = pagerank_fp(edges, iterations=_TRD_ITERS, scale=_TR_SCALE, weight_col="w")
    split = ranked.select(
        F.split(F.col("part"), r"\|").getItem(0).cast("bigint").alias("doc_id"),
        F.split(F.col("part"), r"\|").getItem(1).alias("word"),
        "pr",
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("pr"), F.asc("word"))
    return (
        split.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= _TRD_TOPK)
        .select(
            "doc_id",
            "word",
            F.col("rn").cast("bigint").alias("kw_rank"),
            (F.col("pr").cast("double") / F.lit(float(_TR_SCALE))).alias("textrank"),
        )
    )


# --- multimodal scene-change detection -----------------------------------------


def _scene_intensity_duck(off_expr: str, fl: str = "fl", n: str = "n") -> str:
    return (
        f"COALESCE(list_sum(list_transform("
        f"range({off_expr} + 1, least({off_expr} + {fl}, {n}) + 1), "
        f"bi -> ord(substr(text, CAST(bi AS INTEGER), 1)))), 0)"
    )


@register(
    "multimodal_scene_changes",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text,
             CAST(octet_length(encode(text)) AS BIGINT) AS n,
             CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS n_frames
      FROM documents
    ),
    g AS (
      SELECT doc_id, text, n, n_frames,
             greatest(n // n_frames, 1) AS fl
      FROM d
    ),
    fr AS (
      SELECT doc_id, CAST(fx.f AS BIGINT) AS frame_no,
             CAST({_scene_intensity_duck('(fx.f * fl)')} AS BIGINT) AS intensity,
             CAST({_scene_intensity_duck('((fx.f - 1) * fl)')} AS BIGINT) AS prev_intensity
      FROM g, LATERAL (SELECT unnest(range(1, n_frames)) AS f) fx
    )
    SELECT doc_id, frame_no, intensity, prev_intensity,
           CAST(intensity - prev_intensity AS BIGINT) AS delta,
           20 * abs(intensity - prev_intensity) > intensity + prev_intensity AS is_cut
    FROM fr
    """,
    doc="Multimodal scene-change detection: frame intensity (exact "
    "integer byte sum over the stubbed frame windows) compared across "
    "adjacent frames, cut when the delta exceeds 10% of the pair's "
    "combined intensity — the shot-boundary stage of a video curation "
    "pipeline, with the real detector's dataflow (decode -> per-frame "
    "feature -> adjacent compare) and a deterministic stand-in "
    "feature. The pairwise compare runs INSIDE the Arrow-batched "
    "mapInPandas stage (no explode + self-join on (doc, frame)); the "
    "oracle recomputes the identical integer arithmetic from the text "
    "bytes, so the full output value-hash-matches (the pHash/audio "
    "precedent: Spark-side plumbing real, codec stubbed).",
    tags=("multimodal",),
)
def multimodal_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import scene_change_stub

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return scene_change_stub(with_binary_payload(docs))
