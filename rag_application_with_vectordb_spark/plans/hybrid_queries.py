r"""Hybrid retrieval: BM25 lexical scoring + reciprocal-rank fusion
with the vector path.

The reference retrieves by cosine alone (``vectorDb.ts:11-24``);
production RAG systems pair that with a lexical ranker and fuse the two
lists — BM25 handles exact-term queries the embedding misses, the
embedding handles paraphrases BM25 misses. Both stages here are pure
relational algebra with exact DuckDB twins.

Determinism notes:

- BM25's ``ln`` is the one transcendental in the catalog; the two
  engines' libm results can differ in the last ulp, so the score is
  rounded to 6 decimals on BOTH sides and the ranking key is the
  ROUNDED score (+ doc_id tiebreak) — order and values then agree
  bitwise.
- ``avgdl`` is computed as exact-integer ``SUM(dl)`` divided once, not
  ``AVG`` (a cross-partition fp64 AVG is summation-order-dependent).
- RRF adds two correctly-rounded divisions of small integers in fixed
  order — deterministic without rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..embedder import hash_embedding_expr
from ..functions.text import tokens
from ..functions.vector import cosine_sim
from ..session import tune
from ..sources.catalog import load_table, register_views
from .oracle_dialect import duck_cosine, duck_hash_embedding
from .registry import register

#: Fixed lexical query terms (all in the fixture vocabulary).
_TERMS = ("table", "join", "vector")
_K1 = 1.2
_B = 0.75
#: Vector-side query text for the fusion demo.
_QTEXT = "table join vector fast"
_DIM = 8  # matches embed_hash_components' checked dimension
_RRF_K = 60
_CAND = 20  # candidates taken from each retriever before fusion


def _bm25_base_sql() -> str:
    tf_cols = ",\n        ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS BIGINT) AS tf_{t}" for t in _TERMS
    )
    return rf"""
    base AS (
      SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
        {tf_cols}
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl,
        {", ".join(f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}" for t in _TERMS)}
      FROM base
    ),
    scored AS (
      SELECT doc_id, dl, {", ".join(f"tf_{t}" for t in _TERMS)},
        round({" + ".join(
            f"ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5) / (CAST(df_{t} AS DOUBLE) + 0.5))"
            f" * (CAST(tf_{t} AS DOUBLE) * {_K1 + 1.0}) / (CAST(tf_{t} AS DOUBLE) + {_K1} * ({1.0 - _B} + {_B} * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
            for t in _TERMS
        )}, 6) AS bm25
      FROM base, stats
    )
"""


def _bm25_scores(docs: DataFrame) -> DataFrame:
    """Spark twin of ``_bm25_base_sql``'s ``scored`` CTE — identical
    expression shape so fp64 results match DuckDB bitwise."""
    w = tokens(F.col("text"))

    def tf(term: str):
        # closure, NOT a defaulted second lambda arg: a 2-arg HOF lambda
        # would be called as (element, index)
        return F.size(F.filter(w, lambda x: x == term)).cast("bigint")

    base = docs.select(
        "doc_id",
        F.size(w).cast("bigint").alias("dl"),
        *[tf(t).alias(f"tf_{t}") for t in _TERMS],
    )
    stats = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).cast("bigint").alias(f"df_{t}")
            for t in _TERMS
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score = None
    for t in _TERMS:
        tf = F.col(f"tf_{t}").cast("double")
        df = F.col(f"df_{t}").cast("double")
        idf = F.log(
            1.0 + (F.col("n_docs").cast("double") - df + 0.5) / (df + 0.5)
        )
        term = (idf * (tf * (_K1 + 1.0))) / (
            tf + _K1 * ((1.0 - _B) + _B * F.col("dl").cast("double") / avgdl)
        )
        score = term if score is None else score + term
    return joined.select(
        "doc_id", "dl", *[f"tf_{t}" for t in _TERMS], F.round(score, 6).alias("bm25")
    )


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH {_bm25_base_sql()}
    SELECT doc_id, dl, {", ".join(f"tf_{t}" for t in _TERMS)}, bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 10
    """,
    doc="BM25 lexical top-10 (Robertson/Sparck Jones k1=1.2 b=0.75) for a "
    "fixed term query. Corpus stats (N, Σdl, per-term df) are one "
    "aggregate broadcast back to the scan — per-row scoring then fuses "
    "with the scan and top-k is TakeOrderedAndProject; nothing shuffles "
    "the corpus. Scores rounded to 6 decimals on both engines so the "
    "lone transcendental (ln) can't flap the value hash.",
    tags=("text", "retrieval"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        _bm25_scores(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "hybrid_rrf_topk",
    oracle=f"""
    WITH {_bm25_base_sql()},
    bm AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_bm25
      FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT {_CAND}
    ),
    vec AS (
      SELECT doc_id,
             {duck_cosine(duck_hash_embedding("text", _DIM), duck_hash_embedding(f"'{_QTEXT}'", _DIM))} AS cos
      FROM documents
    ),
    vr AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS r_vec
      FROM vec ORDER BY cos DESC, doc_id ASC LIMIT {_CAND}
    ),
    fused AS (
      SELECT COALESCE(bm.doc_id, vr.doc_id) AS doc_id,
        CAST(COALESCE(vr.r_vec, 0) AS BIGINT) AS vec_rank,
        CAST(COALESCE(bm.r_bm25, 0) AS BIGINT) AS bm25_rank,
        COALESCE(1.0 / ({_RRF_K} + vr.r_vec), 0.0)
          + COALESCE(1.0 / ({_RRF_K} + bm.r_bm25), 0.0) AS rrf_score
      FROM bm FULL OUTER JOIN vr ON bm.doc_id = vr.doc_id
    )
    SELECT doc_id, vec_rank, bm25_rank, rrf_score
    FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
    """,
    doc="Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009, "
    "k=60) of the BM25 top-20 and the hash-embedding cosine top-20 — "
    "the lexical+vector pairing production RAG runs on top of the "
    "reference's cosine-only search (vectorDb.ts:11-24). Each retriever "
    "reduces to its own top-20 (TakeOrderedAndProject — the corpus is "
    "never globally ranked); fusion joins two 20-row lists, so the "
    "single-partition rank windows touch 20 rows, not the corpus. "
    "Rank 0 in the output = 'not in that retriever's candidates'.",
    tags=("text", "retrieval", "flagship"),
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    bm = (
        _bm25_scores(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_CAND)
        .withColumn(
            "r_bm25",
            F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))),
        )
        .select("doc_id", "r_bm25")
    )
    vec = docs.select(
        "doc_id",
        cosine_sim(
            hash_embedding_expr(F.col("text"), dim=_DIM),
            hash_embedding_expr(F.lit(_QTEXT), dim=_DIM),
        ).alias("cos"),
    )
    vr = (
        vec.orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(_CAND)
        .withColumn(
            "r_vec", F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("doc_id")))
        )
        .select("doc_id", "r_vec")
    )
    fused = bm.join(vr, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce(F.col("r_vec"), F.lit(0)).cast("bigint").alias("vec_rank"),
        F.coalesce(F.col("r_bm25"), F.lit(0)).cast("bigint").alias("bm25_rank"),
        (
            F.coalesce(1.0 / (_RRF_K + F.col("r_vec")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("r_bm25")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(10)

# --- MMR diversified retrieval -------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_CAND = 20
_MMR_K = 5


def _mmr_oracle_sql() -> str:
    """Unrolled greedy MMR in DuckDB CTEs — the graph_beam pattern:
    one CTE pair (remaining, pick) per selection step."""
    emb = duck_hash_embedding("text", _DIM)
    q = duck_hash_embedding(f"'{_QTEXT}'", _DIM)
    parts = [
        f"""
    cand AS MATERIALIZED (
      SELECT doc_id, round({duck_cosine(emb, q)}, 6) AS rel, {emb} AS emb
      FROM documents
      ORDER BY {duck_cosine(emb, q)} DESC, doc_id ASC LIMIT {_MMR_CAND}
    ),
    s1 AS MATERIALIZED (
      SELECT doc_id, rel, emb, 0.0 AS max_sim, {_MMR_LAMBDA} * rel AS mmr_score,
             CAST(1 AS BIGINT) AS mmr_rank
      FROM cand ORDER BY rel DESC, doc_id ASC LIMIT 1
    )"""
    ]
    for k in range(2, _MMR_K + 1):
        sel = " UNION ALL ".join(
            f"SELECT doc_id, emb FROM s{i}" for i in range(1, k)
        )
        parts.append(
            f"""
    m{k} AS MATERIALIZED (
      SELECT c.doc_id, c.rel, c.emb,
        MAX(round({duck_cosine('c.emb', 's.emb')}, 6)) AS max_sim
      FROM cand c, ({sel}) s
      WHERE c.doc_id NOT IN (SELECT doc_id FROM ({sel}))
      GROUP BY c.doc_id, c.rel, c.emb
    ),
    s{k} AS MATERIALIZED (
      SELECT doc_id, rel, emb, max_sim,
        {_MMR_LAMBDA} * rel - {round(1.0 - _MMR_LAMBDA, 10)} * max_sim AS mmr_score,
        CAST({k} AS BIGINT) AS mmr_rank
      FROM m{k}
      ORDER BY {_MMR_LAMBDA} * rel - {round(1.0 - _MMR_LAMBDA, 10)} * max_sim DESC,
               doc_id ASC
      LIMIT 1
    )"""
        )
    union = " UNION ALL ".join(
        f"SELECT mmr_rank, doc_id, rel, max_sim, mmr_score FROM s{i}"
        for i in range(1, _MMR_K + 1)
    )
    return "WITH " + ",".join(parts) + f" {union}"


@register(
    "retrieval_mmr_topk",
    oracle=_mmr_oracle_sql(),
    doc="Maximal-marginal-relevance diversification (Carbonell & "
    "Goldstein 1998): greedily pick k=5 of the cosine top-20 "
    "candidates, each step maximizing lambda*relevance - "
    "(1-lambda)*max-similarity-to-already-picked — the de-duplicating "
    "re-rank RAG context assembly needs when the store holds "
    "near-identical chunks (the reference returns the raw top-k, "
    "vectorDb.ts:11-24, so duplicate chunks waste its context window). "
    "The greedy loop is unrolled to 5 dataflow steps over the CACHED "
    "20-row candidate set — the corpus is scanned once "
    "(TakeOrderedAndProject into the cache), and every subsequent step "
    "touches <= 20 rows, so the unroll costs nothing at any scale. "
    "Relevance and pair similarities round to 6 decimals before the "
    "fixed-order score arithmetic, making the selection bit-identical "
    "across engines.",
    tags=("retrieval", "flagship"),
)
def retrieval_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The distributed work is (1) the corpus scan reduced to the top-20
    # candidates (TakeOrderedAndProject) and (2) the 20x20 pair-sim
    # relation — both Spark jobs with the tested cosine primitive. The
    # greedy selection itself runs driver-side over those <= 20+400
    # collected rows: MMR is a serving-time rerank of the final context
    # window, bounded by the _MMR_CAND constant (the same bounded-collect
    # rule as the k<=64 centroid literals in operators/kmeans.py). A
    # fully-unrolled dataflow variant was measured at ~18 s of per-step
    # codegen/checkpoint overhead for the identical 5-row answer.
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    emb = hash_embedding_expr(F.col("text"), dim=_DIM)
    qv = hash_embedding_expr(F.lit(_QTEXT), dim=_DIM)
    cos = cosine_sim(emb, qv)
    cand = (
        docs.select(
            "doc_id",
            F.round(cos, 6).alias("rel"),
            emb.alias("emb"),
            cos.alias("__ord"),
        )
        .orderBy(F.desc("__ord"), F.asc("doc_id"))
        .limit(_MMR_CAND)
        .drop("__ord")
        .cache()
    )
    a = cand.select(F.col("doc_id").alias("da"), F.col("emb").alias("ea"))
    b = cand.select(F.col("doc_id").alias("db"), F.col("emb").alias("eb"))
    sims = {
        (r.da, r.db): r.s
        for r in a.join(F.broadcast(b), F.col("da") != F.col("db"))
        .select("da", "db", F.round(cosine_sim(F.col("ea"), F.col("eb")), 6).alias("s"))
        .collect()
    }
    rels = {r.doc_id: r.rel for r in cand.select("doc_id", "rel").collect()}
    lam, mu = _MMR_LAMBDA, round(1.0 - _MMR_LAMBDA, 10)
    picked: list[tuple] = []  # (rank, doc_id, rel, max_sim, score)
    chosen: list[int] = []
    while len(picked) < min(_MMR_K, len(rels)):
        best = None
        for d, rel in rels.items():
            if d in chosen:
                continue
            ms = max((sims[(d, p)] for p in chosen), default=0.0)
            score = lam * rel - mu * ms
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, rel, ms, score)
        picked.append((len(picked) + 1, best[1], best[2], best[3], best[4]))
        chosen.append(best[1])
    return spark.createDataFrame(
        picked, "mmr_rank bigint, doc_id bigint, rel double, max_sim double, mmr_score double"
    )


# --- multi-vector late-interaction retrieval (ColBERT-style maxsim) -----------

_MAXSIM_DIM = 16
_MAXSIM_QUERIES = (
    (0, ("spark", "join", "table")),
    (1, ("vector", "scan", "fast")),
)
_MAXSIM_DOC_TOKENS = 8


def _maxsim_values_sql() -> str:
    rows = ", ".join(
        f"({qid}, {pos}, '{w}')"
        for qid, ws in _MAXSIM_QUERIES
        for pos, w in enumerate(ws)
    )
    return f"(VALUES {rows}) t(query_id, qpos, w)"


@register(
    "hybrid_maxsim_topk",
    oracle=f"""
    WITH dtok AS (
      SELECT DISTINCT doc_id, t.w
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
           LATERAL (SELECT unnest(ws[1:{_MAXSIM_DOC_TOKENS}]) AS w) t
      WHERE t.w <> ''
    ),
    demb AS MATERIALIZED (
      SELECT doc_id, {duck_hash_embedding('w', _MAXSIM_DIM, 'tok42')} AS dvec FROM dtok
    ),
    qemb AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, qpos,
             {duck_hash_embedding('w', _MAXSIM_DIM, 'tok42')} AS qvec
      FROM {_maxsim_values_sql()}
    ),
    mx AS (
      SELECT q.query_id, q.qpos, d.doc_id,
             MAX({duck_cosine('d.dvec', 'q.qvec')}) AS m
      FROM demb d CROSS JOIN qemb q
      GROUP BY q.query_id, q.qpos, d.doc_id
    ),
    sc AS (
      SELECT query_id, doc_id,
             MAX(CASE WHEN qpos = 0 THEN m END)
             + MAX(CASE WHEN qpos = 1 THEN m END)
             + MAX(CASE WHEN qpos = 2 THEN m END) AS maxsim_score
      FROM mx GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, maxsim_score FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY maxsim_score DESC, doc_id) AS rn
      FROM sc
    ) WHERE rn <= 5
    """,
    doc="Multi-vector late-interaction retrieval (ColBERT's maxsim, "
    "Khattab & Zaharia 2020): every doc token and query token gets its "
    "own embedding; score(q,d) = sum over query tokens of the MAX "
    "cosine against d's token embeddings — token-level matching that "
    "single-vector cosine blurs away. Exact form here: doc-token table "
    "(first 8 tokens, deduped) x broadcast 6-row query-token side, one "
    "(query, qpos, doc) max-aggregate, then a fixed-order 3-term sum "
    "(per-term maxes are order-independent; the sum is written out "
    "left-to-right so both engines add in the same order). At 100 TB "
    "the doc-token side becomes a token-keyed posting/ANN index per "
    "query token (the ColBERT serving design) — the aggregation shape "
    "here is already that plan's verify stage.",
    tags=("hybrid", "ann", "text"),
)
def hybrid_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    dtok = (
        docs.select("doc_id", F.explode(F.slice(w, 1, _MAXSIM_DOC_TOKENS)).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    demb = dtok.select(
        "doc_id", hash_embedding_expr(F.col("w"), _MAXSIM_DIM, "tok42").alias("dvec")
    )
    qrows = [
        (qid, pos, w)
        for qid, ws in _MAXSIM_QUERIES
        for pos, w in enumerate(ws)
    ]
    qtok = spark.createDataFrame(qrows, "query_id bigint, qpos int, w string")
    qemb = qtok.select(
        "query_id", "qpos", hash_embedding_expr(F.col("w"), _MAXSIM_DIM, "tok42").alias("qvec")
    )
    mx = (
        demb.join(F.broadcast(qemb))
        .groupBy("query_id", "qpos", "doc_id")
        .agg(F.max(cosine_sim(F.col("dvec"), F.col("qvec"))).alias("m"))
    )
    sc = mx.groupBy("query_id", "doc_id").agg(
        (
            F.max(F.when(F.col("qpos") == 0, F.col("m")))
            + F.max(F.when(F.col("qpos") == 1, F.col("m")))
            + F.max(F.when(F.col("qpos") == 2, F.col("m")))
        ).alias("maxsim_score")
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("maxsim_score"), F.asc("doc_id"))
    return (
        sc.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 5)
        .select("query_id", "doc_id", "maxsim_score")
    )


# --- pseudo-relevance feedback (RM-style query expansion) ----------------------
#
# Stage 1 scores the corpus for the original terms, takes the top-10
# pseudo-relevant set R; stage 2 picks 3 expansion terms from R by an
# integer-only selection key (R-doc coverage desc, corpus df asc, term
# asc — rarer terms win coverage ties, i.e. a Robertson-selection-value
# shape without fp); stage 3 rescores with originals at weight 1.0 and
# expansions at 0.5. Both stages share ONE generic scorer: per-(doc,
# term) BM25 contributions rounded to 1e-6 micro-integers FIRST, then
# summed as exact BIGINTs — an unordered fp SUM over the term set would
# be summation-order-dependent across engines; the integer sum is not.
#
# Scale shape: the corpus tokenizes/explodes ONCE into a
# localCheckpoint'ed (doc, term, tf, dl) relation — Spark inlines CTEs
# per reference, so the pure-SQL form re-exploded the corpus for every
# reference (20 parquet scans in the stage-3 plan; the ACF/corr-matrix
# gotcha). The index relation plus vocab-sized df and 1-row stats
# frames back three probe rounds; every join build side downstream is
# <= 10 rows. This mirrors what a real two-round retrieval does: build
# the inverted index once, probe it per round.

_PRF_MIN_DF = 5
_PRF_EXPANSION_K = 3
_PRF_EXP_WEIGHT = 0.5

#: Oracle-side base CTEs: build tfx/dfs/stats from the raw corpus.
_PRF_BASE_DUCK = rf"""
    t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    ),
    dls AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
    tok AS (SELECT doc_id, unnest(w) AS word FROM t),
    tfr AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY 1, 2),
    tfx AS (SELECT tfr.doc_id, tfr.word, tfr.tf, dls.dl
            FROM tfr JOIN dls ON tfr.doc_id = dls.doc_id),
    dfs AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tfr GROUP BY 1),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dls)
"""

#: Spark-side base CTEs: the same three relations, but served from the
#: localCheckpoint'ed temp views built in _prf_views.
_PRF_BASE_SPARK = """
    tfx AS (SELECT doc_id, word, tf, dl FROM prf_tf),
    dfs AS (SELECT word, df FROM prf_dfs),
    stats AS (SELECT n_docs, sum_dl FROM prf_stats)
"""


def _prf_contrib(weight_expr: str) -> str:
    """One (doc, term) BM25 contribution on the 1e-6 grid, weighted."""
    return f"""CAST(round(1000000.0 * {weight_expr} *
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                         / (CAST(d.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * {_K1 + 1.0})
               / (CAST(tf.tf AS DOUBLE) + {_K1} * ({1.0 - _B} + {_B}
                  * CAST(tf.dl AS DOUBLE)
                  / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))
             ) AS BIGINT)"""


def _prf_sql(base: str) -> str:
    orig = ", ".join(f"('{t}')" for t in _TERMS)
    return f"""
    WITH {base},
    q1 (word) AS (VALUES {orig}),
    s1 AS (
      SELECT tf.doc_id, CAST(SUM({_prf_contrib("1.0")}) AS BIGINT) AS score_micro
      FROM tfx tf
      JOIN q1 ON tf.word = q1.word
      JOIN dfs d ON tf.word = d.word
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    ),
    r AS (SELECT doc_id FROM s1 ORDER BY score_micro DESC, doc_id ASC LIMIT 10),
    exp AS (
      SELECT tf.word,
             CAST(COUNT(*) AS BIGINT) AS r_docs,
             CAST(MIN(d.df) AS BIGINT) AS df
      FROM tfx tf JOIN r ON tf.doc_id = r.doc_id
      JOIN dfs d ON tf.word = d.word
      WHERE tf.word NOT IN ({", ".join(f"'{t}'" for t in _TERMS)})
        AND d.df >= {_PRF_MIN_DF}
      GROUP BY tf.word
    ),
    picked AS (
      SELECT word, r_docs, df,
             ROW_NUMBER() OVER (ORDER BY r_docs DESC, df ASC, word ASC) AS rn
      FROM exp
    )
"""


_PRF_TERMS_TAIL = f"""
    SELECT word, r_docs, df FROM picked WHERE rn <= {_PRF_EXPANSION_K}
    ORDER BY rn ASC
"""

_PRF_RESCORE_TAIL = f"""
    , q2 AS (
      SELECT word, 1.0 AS wt FROM q1
      UNION ALL
      SELECT word, {_PRF_EXP_WEIGHT} AS wt FROM picked WHERE rn <= {_PRF_EXPANSION_K}
    ),
    s2 AS (
      SELECT tf.doc_id, CAST(SUM({_prf_contrib("q2.wt")}) AS BIGINT) AS score_micro
      FROM tfx tf
      JOIN q2 ON tf.word = q2.word
      JOIN dfs d ON tf.word = d.word
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score_micro FROM s2
    ORDER BY score_micro DESC, doc_id ASC LIMIT 10
"""


def _prf_views(spark: SparkSession, sf_dir: str) -> None:
    """Build the inverted-index relations once: (doc, term, tf, dl)
    localCheckpoint'ed (one corpus scan + explode), plus the vocab-sized
    df table and the 1-row corpus stats, each as a temp view."""
    docs = load_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    tok = docs.select(
        "doc_id", F.size(w).cast("bigint").alias("dl"), F.explode(w).alias("word")
    )
    tf = (
        tok.groupBy("doc_id", "word")
        .agg(F.count("*").cast("bigint").alias("tf"), F.min("dl").alias("dl"))
        .localCheckpoint()
    )
    tf.createOrReplaceTempView("prf_tf")
    dfs = (
        tf.groupBy("word").agg(F.count("*").cast("bigint").alias("df")).localCheckpoint()
    )
    dfs.createOrReplaceTempView("prf_dfs")
    stats = (
        tf.groupBy("doc_id")
        .agg(F.min("dl").alias("dl"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("sum_dl"),
        )
        .localCheckpoint()
    )
    stats.createOrReplaceTempView("prf_stats")


@register(
    "retrieval_prf_terms",
    oracle=_prf_sql(_PRF_BASE_DUCK) + _PRF_TERMS_TAIL,
    doc=f"Pseudo-relevance-feedback term selection: the {_PRF_EXPANSION_K} "
    "expansion terms chosen from the BM25 top-10 pseudo-relevant set by "
    "an integer-only key (R-doc coverage desc, corpus df asc, term asc "
    f"— rarer terms win ties; df >= {_PRF_MIN_DF} floors out noise). "
    "Exposes the selection itself so the expansion policy is "
    "value-checked separately from the rescoring. The corpus explodes "
    "once into a checkpointed inverted-index relation (see module "
    "comment); stage joins build from <= 10-row sides.",
    tags=("text", "retrieval"),
)
def retrieval_prf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    _prf_views(spark, sf_dir)
    return spark.sql(_prf_sql(_PRF_BASE_SPARK) + _PRF_TERMS_TAIL)


@register(
    "retrieval_prf_expanded_topk",
    oracle=_prf_sql(_PRF_BASE_DUCK) + _PRF_RESCORE_TAIL,
    doc="Pseudo-relevance-feedback retrieval (RM/Rocchio shape): rescore "
    "the corpus with the original terms at weight 1.0 plus "
    f"retrieval_prf_terms' expansions at {_PRF_EXP_WEIGHT} — the "
    "classic two-round lexical recall recovery (docs sharing the "
    "pseudo-relevant set's vocabulary surface even when they miss the "
    "original terms). Per-(doc,term) BM25 contributions land on the "
    "1e-6 grid BEFORE the per-doc sum, so the score is an exact BIGINT "
    "(an unordered fp sum over the term set would be summation-order-"
    "dependent); ranking key is (score_micro, doc_id). The corpus "
    "explodes ONCE into a checkpointed inverted-index relation probed "
    "by all three rounds; every join build side is <= 10 rows.",
    tags=("text", "retrieval"),
)
def retrieval_prf_expanded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    _prf_views(spark, sf_dir)
    return spark.sql(_prf_sql(_PRF_BASE_SPARK) + _PRF_RESCORE_TAIL)


# --- WAND / max-score top-k pruning ---------------------------------------------
#
# The candidates list called for WAND-style top-k pruning (Broder et al.
# 2003 "Efficient query evaluation using a two-level retrieval process";
# the relational form here is the max-score variant, Turtle & Flood
# 1995): compute a per-term UPPER BOUND on its BM25 contribution from
# the postings, exactly score only the documents containing the
# highest-bound ("essential") term, and use the k-th best of those as a
# threshold theta that prunes every remaining document whose SUMMED
# term bounds cannot reach it. Sound by construction: a pruned doc's
# true score <= its bound < theta <= the current k-th score, so the
# pruned set cannot intersect the true top-k (ties at theta are KEPT —
# the prune predicate is strict <). tests/test_hybrid.py proves the
# output row-identical to the unpruned full scoring, and the fixture's
# skewed vocabulary ('dup' df~5% vs ~79% for everything else) makes the
# pruning real: ~95% of candidate docs are never exactly scored.
#
# Scale shape: this is the serving plan for lexical top-k at 100 TB —
# the corpus tokenizes once into the checkpointed inverted index
# (shared with the PRF queries), the per-query postings for the 3 query
# terms are one probe of that index (checkpointed too, so the WAND
# dataflow's 6 references to it do not re-probe), and everything after
# the postings probe is bounded by |postings|, never |corpus|. theta is
# a 1-row broadcast; the essential-docs semi-join keys on doc_id.

_WAND_TERMS = ("dup", "join", "vector")
_WAND_K = 10


def _wand_tail(post_cte: str, mat: str = "") -> str:
    """Shared WAND dataflow from the per-query postings relation on.

    ``post_cte`` supplies ``post(doc_id, word, c)`` — per-(doc, term)
    BM25 contributions on the 1e-6 grid (exact BIGINT, the PRF rule:
    round each contribution BEFORE any sum so no fp sum order exists).
    ``mat`` is ``" MATERIALIZED"`` for DuckDB (which inlines CTEs per
    reference — the MMR/ACF gotcha); Spark side reads checkpointed
    temp views so re-derivation is already cheap.
    """
    return f"""
    {post_cte},
    ub AS{mat} (SELECT word, CAST(MAX(c) AS BIGINT) AS ub FROM post GROUP BY word),
    ess AS{mat} (SELECT word FROM ub ORDER BY ub DESC, word ASC LIMIT 1),
    essdocs AS{mat} (SELECT DISTINCT p.doc_id FROM post p JOIN ess e ON p.word = e.word),
    d1 AS{mat} (
      SELECT p.doc_id, CAST(SUM(p.c) AS BIGINT) AS score_micro
      FROM post p JOIN essdocs ed ON p.doc_id = ed.doc_id
      GROUP BY p.doc_id
    ),
    theta AS{mat} (
      SELECT CASE WHEN (SELECT COUNT(*) FROM d1) >= {_WAND_K}
                  THEN (SELECT CAST(MIN(tk.score_micro) AS BIGINT)
                        FROM (SELECT d1.score_micro FROM d1
                              ORDER BY d1.score_micro DESC, d1.doc_id ASC
                              LIMIT {_WAND_K}) tk)
                  ELSE CAST(0 AS BIGINT) END AS th
    ),
    d2ub AS{mat} (
      SELECT p.doc_id, CAST(SUM(u.ub) AS BIGINT) AS ubd
      FROM post p JOIN ub u ON p.word = u.word
      LEFT JOIN essdocs ed ON p.doc_id = ed.doc_id
      WHERE ed.doc_id IS NULL
      GROUP BY p.doc_id
    ),
    surv AS{mat} (SELECT d2ub.doc_id FROM d2ub CROSS JOIN theta WHERE d2ub.ubd >= theta.th),
    d2 AS{mat} (
      SELECT p.doc_id, CAST(SUM(p.c) AS BIGINT) AS score_micro
      FROM post p JOIN surv ON p.doc_id = surv.doc_id
      GROUP BY p.doc_id
    ),
    allsc AS{mat} (SELECT d1.doc_id, d1.score_micro FROM d1
                   UNION ALL SELECT d2.doc_id, d2.score_micro FROM d2),
    prune AS{mat} (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM allsc) AS scored_docs,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM d2ub CROSS JOIN theta
              WHERE d2ub.ubd < theta.th) AS pruned_docs
    )
    SELECT t.doc_id, t.score_micro, prune.scored_docs, prune.pruned_docs
    FROM (SELECT allsc.doc_id, allsc.score_micro FROM allsc
          ORDER BY allsc.score_micro DESC, allsc.doc_id ASC LIMIT {_WAND_K}) t
    CROSS JOIN prune
    """


def _wand_post_sql() -> str:
    """The per-query postings probe: (doc, term) -> micro contribution."""
    q = ", ".join(f"('{t}')" for t in _WAND_TERMS)
    return f"""
    q (word) AS (VALUES {q}),
    post AS MATERIALIZED (
      SELECT tf.doc_id, tf.word, {_prf_contrib("1.0")} AS c
      FROM tfx tf JOIN q ON tf.word = q.word
      JOIN dfs d ON tf.word = d.word
      CROSS JOIN stats s
    )"""


@register(
    "retrieval_wand_topk",
    oracle=f"WITH {_PRF_BASE_DUCK},{_wand_tail(_wand_post_sql(), ' MATERIALIZED')}",
    doc="WAND / max-score top-k pruning for BM25 (Broder et al. 2003; "
    "Turtle & Flood 1995): per-term contribution upper bounds from the "
    "postings, exact scoring only for docs containing the top-bound "
    "essential term, theta = their k-th score, and every other doc "
    "whose SUMMED bounds fall below theta is pruned without scoring — "
    "sound (true score <= bound; strict-< prune keeps theta ties), "
    "proven row-identical to unpruned scoring in pytest. Contributions "
    "land on the 1e-6 grid before every sum (exact BIGINT — no fp "
    "summation order), so scores, theta, and the pruned/scored counts "
    "in the output all hash-match cross-engine. On the fixture's "
    "skewed vocabulary ('dup' df ~5%) ~95% of candidate docs are "
    "pruned; when fewer than k docs contain the essential term, theta "
    "collapses to 0 and the query degrades gracefully to full scoring.",
    tags=("text", "retrieval"),
)
def retrieval_wand_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    _prf_views(spark, sf_dir)
    qrows = [(t,) for t in _WAND_TERMS]
    spark.createDataFrame(qrows, "word string").createOrReplaceTempView("wand_q")
    post = spark.sql(
        f"""
        SELECT tf.doc_id, tf.word, {_prf_contrib("1.0")} AS c
        FROM prf_tf tf JOIN wand_q q ON tf.word = q.word
        JOIN prf_dfs d ON tf.word = d.word
        CROSS JOIN prf_stats s
        """
    ).localCheckpoint()
    post.createOrReplaceTempView("wand_post")
    return spark.sql(
        "WITH" + _wand_tail("post AS (SELECT doc_id, word, c FROM wand_post)")
    )


# --- query-likelihood LM retrieval with Dirichlet smoothing ----------------------

_MU = 2000


def _lm_dirichlet_sql(splitarr: str, lenfn: str, filterfn: str) -> str:
    """Dialect split: Spark size/filter/split vs DuckDB
    len/list_filter/regexp_split_to_array (passed as format strings)."""
    tf_cols = ",\n        ".join(
        f"CAST({lenfn}({filterfn}(w, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in _TERMS
    )
    # a term absent from the whole collection (ctf = 0) has zero
    # probability mass for every document — the standard convention
    # drops it from the query rather than sending all scores to -inf
    score = " + ".join(
        f"CASE WHEN ctf_{t} = 0 THEN 0 ELSE "
        f"CAST(round(ln((CAST(tf_{t} AS DOUBLE) * CAST(tt AS DOUBLE)"
        f" + {_MU}.0 * CAST(ctf_{t} AS DOUBLE))"
        f" / (CAST(tt AS DOUBLE) * (CAST(dl AS DOUBLE) + {_MU}.0)))"
        f" * 1000000) AS BIGINT) END"
        for t in _TERMS
    )
    return f"""
    WITH base AS (
      SELECT doc_id, CAST({lenfn}(w) AS BIGINT) AS dl,
        {tf_cols}
      FROM (SELECT doc_id, {splitarr} AS w FROM documents)
    ),
    coll AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS tt,
        {", ".join(f"CAST(SUM(tf_{t}) AS BIGINT) AS ctf_{t}" for t in _TERMS)}
      FROM base
    )
    SELECT doc_id, dl, {", ".join(f"tf_{t}" for t in _TERMS)},
           CAST({score} AS BIGINT) AS ql_micro
    FROM base CROSS JOIN coll
    ORDER BY ql_micro DESC, doc_id ASC
    LIMIT 10
    """


_SPARK_SPLIT = r"filter(split(trim(text), '\\s+'), x -> x <> '')"
_DUCK_SPLIT = r"list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')"


def _register_lm_dirichlet():
    @register(
        "retrieval_lm_dirichlet_topk",
        oracle=_lm_dirichlet_sql(_DUCK_SPLIT, "len", "list_filter"),
        doc=f"Query-likelihood language-model retrieval with Dirichlet "
        f"smoothing (Zhai & Lafferty 2001, mu={_MU}): score(q,d) = "
        "sum_t ln((tf*T + mu*ctf) / (T*(dl + mu))) over the fixed "
        f"3-term query {_TERMS} — the probabilistic ranking family "
        "next to BM25 (text_bm25_topk) and its WAND-pruned variant; "
        "LM-Dirichlet is what PRF/RM expansion formally assumes. "
        "Per-term log-likelihoods land on the 1e-6 grid (the ln "
        "argument is a ratio of exact BIGINT cross-products) so the "
        "per-doc score is an exact integer sum — rank and hash "
        "bit-stable cross-engine; collection stats are ONE 1-row "
        "aggregate broadcast back (never a per-doc rescan); top-10 "
        "via TakeOrderedAndProject.",
        tags=("text", "retrieval"),
    )
    def retrieval_lm_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, ("documents",))
        return spark.sql(_lm_dirichlet_sql(_SPARK_SPLIT, "size", "filter"))

    return retrieval_lm_dirichlet_topk


_register_lm_dirichlet()
