r"""Feature-engineering / governance catalog tail (round 7, late
session): the encoder and audit primitives between raw columns and a
training table — weight-of-evidence (WOE) categorical encoding with its
information-value (IV) read-out, the hashing-trick bucketizer, the
l-diversity companion to ``audit_k_anonymity``, and a corpus-level
distinct-n-gram diversity monitor (the collapse/repetition screen a
synthetic-data pipeline runs on its own output).

Scale notes (100 TB posture):
- WOE/IV collapses the fact to one hash aggregate on the category (the
  target indicator folds into SUM(CASE)); everything after runs on the
  category-sized relation joined against two single-row totals
  (broadcast). The log-odds ratio is a single fp64 ``ln`` of a ratio of
  exact half-integer products (Laplace +0.5 smoothing keeps zero cells
  finite), landed on the 1e-6 grid — the Benford/PMI fixed-point move —
  so the encoding is bit-identical across engines and re-runs.
- the hashing trick is stateless per row (keyed md5 → bucket and sign),
  so it needs NO vocabulary build, no broadcast, and no shuffle beyond
  the final per-bucket aggregate — the property that makes it the
  encoder of choice when the category domain itself doesn't fit memory.
- l-diversity is one aggregate on the quasi-identifier tuple with a
  COUNT(DISTINCT sensitive) inside; only violating classes (bounded by
  the QI domain) return.
- n-gram diversity explodes tokens/bigrams once and aggregates per
  lang; distinct counts shuffle the (lang, gram) pairs — the same shape
  (and cost envelope) as the TF-IDF vocabulary build already in the
  catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import load_table, register_views, tables_in_sql
from .oracle_dialect import duck_hex13_to_long
from .registry import register
from .stats_queries import _spark_hex13


def _sql_query(name: str, sql: str, doc: str = "", oracle: str | None = None,
               tags=("analytics",)):
    @register(name, oracle=oracle or sql, doc=doc, tags=tags)
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, tables_in_sql(_sql))
        return spark.sql(_sql)

    return fn


# --- weight-of-evidence encoding + information value ---------------------------
#
# Feature = source, binary target = (lang = 'en').  Per category:
#   WOE = ln( ((pos+.5)/P) / ((neg+.5)/N) )
# computed as ONE ln of ((pos+.5)*N) / ((neg+.5)*P) — numerator and
# denominator are exact half-integer fp64 products (counts < 2^31), so
# the only inexact step is the final ln, which both engines land on the
# 1e-6 grid.  IV contribution = (pos/P - neg/N) * WOE uses the gridded
# WOE and a fixed fp64 evaluation order; it is reported on the grid too.

_sql_query(
    "feature_woe_iv",
    """
    WITH c AS (
      SELECT source,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
      FROM documents GROUP BY source
    ),
    t AS (SELECT SUM(pos) AS p_tot, SUM(neg) AS n_tot FROM c),
    w AS (
      SELECT c.source, c.pos, c.neg,
             CAST(round(1000000.0 * ln(
               ((CAST(c.pos AS DOUBLE) + 0.5) * CAST(t.n_tot AS DOUBLE))
               / ((CAST(c.neg AS DOUBLE) + 0.5) * CAST(t.p_tot AS DOUBLE))
             )) AS BIGINT) AS woe_micro,
             (CAST(c.pos AS DOUBLE) / CAST(t.p_tot AS DOUBLE))
               - (CAST(c.neg AS DOUBLE) / CAST(t.n_tot AS DOUBLE)) AS delta
      FROM c CROSS JOIN t
    )
    SELECT source, pos, neg, woe_micro,
           CAST(round(delta * CAST(woe_micro AS DOUBLE)) AS BIGINT) AS iv_micro
    FROM w ORDER BY source ASC
    """,
    doc="Weight-of-evidence encoding of `source` against the binary "
    "target (lang = 'en'), with the per-category information-value "
    "contribution — the credit-scoring-lineage encoder that, unlike "
    "feature_target_encode_loo's posterior mean, yields a symmetric "
    "log-odds scale and an additive feature-strength score (IV = sum "
    "of iv_micro/1e6). One hash aggregate on the category; totals "
    "broadcast back; ln landed on the 1e-6 grid so the encoding is "
    "bit-stable cross-engine (Laplace +0.5 keeps empty cells finite).",
    tags=("analytics", "feature"),
)


# --- hashing-trick bucketizer ---------------------------------------------------
#
# Each document emits two categorical features ('lang=<v>', 'source=<v>');
# each feature hashes to bucket = h % 16 with sign = ±1 from the next
# hash bit (the signed hashing trick — unbiased inner products).  The
# query returns the corpus-level signed mass per bucket: what a trainer
# materializes per row, aggregated so the whole mapping is value-checked.

_FH_BUCKETS = 16


def _fh_sql(hexfn) -> str:
    feats = " UNION ALL ".join(
        f"SELECT concat('{c}=', {c}) AS feat FROM documents" for c in ("lang", "source")
    )
    h = hexfn("md5(concat('fh42|', feat))")
    return f"""
    WITH f AS ({feats}),
    hb AS (
      SELECT feat, ({h}) % {_FH_BUCKETS} AS bucket,
             CASE WHEN (({h}) // {_FH_BUCKETS}) % 2 = 0 THEN 1 ELSE -1 END AS sign
      FROM f
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(sign) AS BIGINT) AS signed_count,
           CAST(COUNT(*) AS BIGINT) AS feat_count,
           CAST(COUNT(DISTINCT feat) AS BIGINT) AS distinct_feats
    FROM hb GROUP BY bucket ORDER BY bucket ASC
    """


@register(
    "feature_hash_buckets",
    oracle=None,  # assembled below (dialect-split hash fold)
    doc=f"Signed hashing-trick encoder: every (column=value) categorical "
    f"feature maps statelessly to one of {_FH_BUCKETS} buckets with a "
    "±1 sign drawn from the next hash bit (Weinberger et al.'s "
    "feature hashing — signs make collision noise zero-mean). "
    "Stateless per row: no vocabulary build, no broadcast, no "
    "shuffle until the final per-bucket aggregate — the encoder that "
    "survives category domains too large for any dictionary. The "
    "keyed-md5 bucket/sign derivation is the same reproducibility "
    "move as the bootstrap/DP machinery (same key → same mapping; "
    "rotate the key to re-randomize). Output is the corpus-level "
    "signed mass per bucket so the full mapping is value-checked.",
    tags=("analytics", "feature"),
)
def feature_hash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("documents",))
    # Spark's integer division is `div` (// is DuckDB); share everything else.
    return spark.sql(_fh_sql(_spark_hex13).replace("//", "div"))


from .registry import QUERIES as _QUERIES  # noqa: E402

_QUERIES["feature_hash_buckets"].oracle = _fh_sql(duck_hex13_to_long)


# --- l-diversity audit ----------------------------------------------------------

_sql_query(
    "audit_l_diversity",
    """
    WITH q AS (
      SELECT lang,
             CAST(floor(CAST(n_chars AS DOUBLE) / 100.0) AS BIGINT) AS len_bucket,
             source
      FROM documents
    ),
    g AS (
      SELECT lang, len_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS l_distinct
      FROM q GROUP BY lang, len_bucket
    )
    SELECT lang, len_bucket, group_size, l_distinct
    FROM g WHERE l_distinct < 3
    ORDER BY l_distinct ASC, lang ASC, len_bucket ASC
    """,
    doc="l-diversity audit: for every (lang, length-bucket) "
    "quasi-identifier class, how many DISTINCT sensitive values "
    "(source) it contains — the companion screen to audit_k_anonymity "
    "(a class can be large yet still leak if every member shares one "
    "sensitive value; k-anonymity alone misses that homogeneity "
    "attack). Classes with l < 3 return. One aggregate on the QI "
    "tuple with a distinct-count inside; result bounded by the QI "
    "domain, not the fact.",
    tags=("analytics", "audit", "privacy"),
)


# --- corpus n-gram diversity (distinct-n) ---------------------------------------

_DIV_ORACLE = r"""
WITH t AS (
  SELECT lang, regexp_split_to_array(trim(text), '\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
uni AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS tokens,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS distinct_tokens
  FROM (SELECT lang, unnest(w) AS word FROM t) GROUP BY lang
),
bg AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS bigrams,
         CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_bigrams
  FROM (
    SELECT lang, concat(w[CAST(i AS INTEGER)], ' ', w[CAST(i AS INTEGER) + 1]) AS gram
    FROM t, LATERAL (SELECT unnest(range(1, len(w)))) u(i)
  ) GROUP BY lang
)
SELECT uni.lang, tokens, distinct_tokens, bigrams, distinct_bigrams,
       CAST(distinct_tokens AS DOUBLE) / CAST(tokens AS DOUBLE) AS ttr,
       CAST(distinct_bigrams AS DOUBLE) / CAST(bigrams AS DOUBLE) AS distinct_2
FROM uni JOIN bg ON uni.lang = bg.lang
ORDER BY uni.lang ASC
"""


@register(
    "text_distinct_ngram_ratio",
    oracle=_DIV_ORACLE,
    doc="Corpus-level lexical diversity per language: type-token ratio "
    "and distinct-bigram ratio (distinct-n, the standard mode-collapse "
    "screen for generated/synthetic training data — a corpus whose "
    "distinct-2 falls while volume grows is repeating itself; "
    "text_repetition_stats is the PER-DOCUMENT sibling, this is the "
    "cross-document aggregate view). Tokens and bigrams explode once; "
    "the distinct counts shuffle (lang, gram) pairs — the TF-IDF "
    "vocabulary-build shape. Ratios are single fp64 divisions of "
    "exact BIGINTs.",
    tags=("text", "analytics"),
)
def text_distinct_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    w = F.split(F.trim(F.col("text")), r"\s+")
    toks = docs.select("lang", F.explode(w).alias("word"))
    uni = toks.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("tokens"),
        F.count_distinct("word").cast("bigint").alias("distinct_tokens"),
    )
    grams = (
        docs.select(
            "lang",
            F.explode(
                F.when(
                    F.size(w) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.concat_ws(
                            " ", F.element_at(w, i), F.element_at(w, i + 1)
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
    )
    bg = grams.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("bigrams"),
        F.count_distinct("gram").cast("bigint").alias("distinct_bigrams"),
    )
    return (
        uni.join(bg, "lang")
        .select(
            "lang",
            "tokens",
            "distinct_tokens",
            "bigrams",
            "distinct_bigrams",
            (F.col("distinct_tokens").cast("double") / F.col("tokens").cast("double")).alias("ttr"),
            (F.col("distinct_bigrams").cast("double") / F.col("bigrams").cast("double")).alias("distinct_2"),
        )
        .orderBy("lang")
    )
