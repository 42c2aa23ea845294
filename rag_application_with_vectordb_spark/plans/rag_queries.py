"""RAG-core query catalog: the reference's entire query surface
(SURVEY.md §2.2-2.3) as driver-checkable (spark, sf_dir) → DataFrame
callables with DuckDB oracle twins.

Every query here exercises a cited reference behavior:
- knn_topk / knn_batch          → vectorDb.ts:11-24 (K1-K4)
- knn_zero_query                → vectorDb.ts:47-49 (zero-norm → 0.0)
- knn_dim_mismatch              → vectorDb.ts:27-32 (mismatch → -1.0)
- chunk_sliding_window          → App.tsx:57-61 (P2+P3)
- chunk_global_ids              → App.tsx:72-76 (P4)
- embed_hash_components         → geminiService.ts:27-77 (U1/U2, test mode)
- context_assembly              → App.tsx:192 (P6)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..embedder import hash_embedding_expr, hash_embedding_oracle_sql
from ..functions.vector import cosine_sim, vec_lit
from ..operators.chunker import chunk_documents, global_chunk_index
from ..operators.knn import knn, knn_join
from ..session import tune
from ..sources.catalog import load_table
from .oracle_dialect import duck_cosine
from .registry import register

K = 5  # reference call-site top-k, App.tsx:191


@register(
    "knn_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, {duck_cosine('e.embedding', 'q.qvec')} AS similarity
    FROM embeddings e, q
    ORDER BY similarity DESC, e.vec_id ASC
    LIMIT {K}
    """,
    doc="Flagship: exact brute-force cosine top-5 (vectorDb.ts:11-24).",
    tags=("rag", "flagship"),
)
def knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    # r12 optimization round: examined and deliberately LEFT on the HOF
    # cosine. The unrolled fixed-dim form (cosine_sim_sql) was measured
    # here and reverted: at the embeddings-fixture scale (2k rows at
    # sf0.1) the per-row HOF cost is negligible while the wide unrolled
    # expression adds parse/compile latency (exec 0.30 s HOF vs 0.40 s
    # unrolled+WSCG, 0.74 s unrolled+no-WSCG). The unrolled kernel is
    # reserved for the compute-bound full-corpus scoring paths
    # (eval_knn_label_accuracy, the recall monitors' exact sides).
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id", cosine_sim(F.col("embedding"), F.col("qvec")).alias("similarity")
    )
    # sort+limit → TakeOrderedAndProject: per-partition top-k heap, one merge.
    return scored.orderBy(F.desc("similarity"), F.asc("vec_id")).limit(K)


@register(
    "knn_batch",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id, {duck_cosine('e.embedding', 'q.qvec')} AS similarity
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, similarity FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY similarity DESC, vec_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    doc="Batched KNN: broadcast nested-loop join + per-query top-k window.",
    tags=("rag",),
)
def knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    # r12: left on the HOF cosine for the same reason as knn_topk.
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return knn_join(emb, queries, k=3)


@register(
    "knn_zero_query",
    oracle=f"""
    WITH q AS (SELECT list_transform(range(0, 64), x -> 0.0) AS qvec)
    SELECT e.vec_id, {duck_cosine('e.embedding', 'q.qvec')} AS similarity
    FROM embeddings e, q
    ORDER BY similarity DESC, e.vec_id ASC
    LIMIT {K}
    """,
    doc="Zero-magnitude query → similarity 0.0 for all rows (vectorDb.ts:47-49); "
    "top-k then resolves purely by the id-asc tiebreak.",
    tags=("rag", "edge"),
)
def knn_zero_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return knn(emb, vec_lit([0.0] * 64), k=K)


@register(
    "knn_dim_mismatch",
    oracle=f"""
    WITH q AS (SELECT (embedding::DOUBLE[])[1:32] AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, {duck_cosine('e.embedding', 'q.qvec')} AS similarity
    FROM embeddings e, q
    ORDER BY similarity DESC, e.vec_id ASC
    LIMIT {K}
    """,
    doc="Dimension-mismatched query → similarity -1.0 for all rows "
    "(vectorDb.ts:27-32 returns -1, not an error).",
    tags=("rag", "edge"),
)
def knn_dim_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.slice(F.col("embedding").cast("array<double>"), 1, 32).alias("qvec")
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id", cosine_sim(F.col("embedding"), F.col("qvec")).alias("similarity")
    )
    return scored.orderBy(F.desc("similarity"), F.asc("vec_id")).limit(K)


# Fixture docs are ≤ ~600 chars, so the catalog chunker uses a scaled-down
# window (200/40) to exercise multi-window overlap semantics; unit tests
# also cover the reference's exact 1000/200 (constants.ts:9-10).
_CHUNK, _OVERLAP = 200, 40
_STRIDE = _CHUNK - _OVERLAP

_CHUNK_ORACLE_BODY = f"""
      SELECT d.doc_id,
             CAST(s.pos // {_STRIDE} AS BIGINT) AS chunk_id,
             CAST(s.pos AS BIGINT) AS chunk_pos,
             substr(d.text, CAST(s.pos AS INTEGER) + 1, {_CHUNK}) AS chunk_text
      FROM documents d,
           LATERAL (SELECT unnest(generate_series(0, greatest(length(d.text) - 1, 0), {_STRIDE}))) AS s(pos)
"""


@register(
    "chunk_sliding_window",
    oracle=f"""
    SELECT * FROM ({_CHUNK_ORACLE_BODY})
    WHERE length(trim(chunk_text)) > 0
    """,
    doc="Sliding-window chunker (App.tsx:57-59) + empty filter (App.tsx:61): "
    "posexplode(sequence) + 1-based substring.",
    tags=("rag", "chunker"),
)
def chunk_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=_CHUNK, overlap=_OVERLAP)


@register(
    "chunk_global_ids",
    oracle=f"""
    SELECT doc_id, chunk_id, CAST(row_number() OVER (ORDER BY doc_id, chunk_id) - 1 AS BIGINT) AS global_id
    FROM ({_CHUNK_ORACLE_BODY})
    WHERE length(trim(chunk_text)) > 0
    """,
    doc="Reference-parity globally-dense chunk ids (App.tsx:72-76); "
    "single-partition window — small-scale parity mode only.",
    tags=("rag", "chunker"),
)
def chunk_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_size=_CHUNK, overlap=_OVERLAP)
    return global_chunk_index(chunks).select("doc_id", "chunk_id", "global_id")


_EMB_DIM = 8


@register(
    "embed_hash_components",
    oracle=f"""
    SELECT d.doc_id, CAST(t.j AS INTEGER) AS component,
           list_sum(list_transform(range(1, 14), i ->
             (strpos('0123456789abcdef',
                     substr(md5('s42|' || t.j || '|' || d.text), CAST(i AS INTEGER), 1)) - 1)
             * 2.0 ** (4 * (13 - i))
           )) / 4503599627370496.0 * 2.0 - 1.0 AS value
    FROM documents d, LATERAL (SELECT unnest(range(0, {_EMB_DIM}))) AS t(j)
    """,
    doc="Deterministic HashEmbedder (test-mode U1/U2, geminiService.ts:27-77) "
    "exploded to scalar components so the value hash covers every element.",
    tags=("rag", "embed"),
)
def embed_hash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    emb = docs.select(
        "doc_id", hash_embedding_expr(F.col("text"), dim=_EMB_DIM).alias("embedding")
    )
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("component", "value")
    )


@register(
    "context_assembly",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    top AS (
      SELECT e.vec_id, d.text, {duck_cosine('e.embedding', 'q.qvec')} AS similarity
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id, q
      ORDER BY similarity DESC, e.vec_id ASC
      LIMIT {K}
    )
    SELECT string_agg(text, E'\\n---\\n' ORDER BY similarity DESC, vec_id ASC) AS context
    FROM top
    """,
    doc="P6 context assembly (App.tsx:192): top-k texts joined with the "
    "reference separator; order made explicit (Spark collect order is not "
    "guaranteed after a shuffle — SURVEY.md §7.3.2).",
    tags=("rag",),
)
def context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    corpus = emb.join(docs, emb.vec_id == docs.doc_id).select("vec_id", "text", "embedding")
    top = (
        corpus.crossJoin(F.broadcast(q))
        .select("vec_id", "text", cosine_sim(F.col("embedding"), F.col("qvec")).alias("similarity"))
        .orderBy(F.desc("similarity"), F.asc("vec_id"))
        .limit(K)
    )
    packed = top.select(
        F.struct((F.col("similarity") * -1).alias("neg"), F.col("vec_id"), F.col("text")).alias("s")
    )
    return packed.agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s.getField("text")),
            "\n---\n",
        ).alias("context")
    )


@register(
    "knn_filtered_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
      {duck_cosine('e.embedding', 'q.qvec')} AS similarity
    FROM embeddings e, q
    WHERE e.label IN (2, 3) AND e.vec_id % 2 = 0
    ORDER BY similarity DESC, e.vec_id ASC
    LIMIT {K}
    """,
    doc="Filtered vector search — the metadata-predicate + top-k query "
    "every production vector store serves (filter by tenant / source / "
    "label, THEN retrieve) and the reference cannot express "
    "(vectorDb.ts:11-24 scans everything). Pre-filtering is the "
    "correct semantics (post-filtering a top-k can return fewer than k "
    "survivors); in the plan the predicate reaches the parquet scan as "
    "PushedFilters, so the cosine never evaluates on filtered-out rows "
    "and TakeOrderedAndProject sees only survivors — with a partitioned "
    "or z-ordered layout the filter prunes whole files before any "
    "vector math. The IVF/ANN path composes the same way: the predicate "
    "applies inside each probed inverted list.",
    tags=("rag", "ann"),
)
def knn_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    survivors = emb.filter(F.col("label").isin(2, 3) & (F.col("vec_id") % 2 == 0))
    scored = survivors.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        cosine_sim(F.col("embedding"), F.col("qvec")).alias("similarity"),
    )
    return scored.orderBy(F.desc("similarity"), F.asc("vec_id")).limit(K)


_RADIUS_TAU = 0.15


@register(
    "knn_radius",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, {duck_cosine('e.embedding', 'q.qvec')} AS similarity
    FROM embeddings e, q
    WHERE {duck_cosine('e.embedding', 'q.qvec')} >= {_RADIUS_TAU}
    ORDER BY similarity DESC, e.vec_id ASC
    """,
    doc=f"Range (radius) vector search: every vector with cosine >= "
    f"{_RADIUS_TAU} to the query — the similarity-threshold companion "
    "to top-k (top-k answers 'the best k whatever they are'; radius "
    "answers 'everything at least this similar', the form dedup and "
    "recall-oriented retrieval want). Same broadcast-query scan as "
    "knn_topk but the predicate replaces the limit, so the filter "
    "evaluates inside whole-stage codegen and the result size is "
    "data-dependent. The fixture's near-uniform vectors put most "
    "similarities in (-0.3, 0.3), so the threshold returns a real "
    "tail, not the whole corpus.",
    tags=("rag",),
)
def knn_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id", cosine_sim(F.col("embedding"), F.col("qvec")).alias("similarity")
    )
    return scored.filter(F.col("similarity") >= _RADIUS_TAU).orderBy(
        F.desc("similarity"), F.asc("vec_id")
    )


_HN_QUERIES = 5
_HN_K = 3


@register(
    "mine_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, label AS qlabel, embedding AS qvec
               FROM embeddings WHERE vec_id < {_HN_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id, CAST(e.label AS BIGINT) AS label,
             round({duck_cosine('e.embedding', 'q.qvec')}, 6) AS similarity
      FROM embeddings e CROSS JOIN q
      WHERE e.label <> q.qlabel
    )
    SELECT query_id, vec_id, label, similarity,
           CAST(rn AS BIGINT) AS neg_rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY similarity DESC, vec_id ASC) AS rn
      FROM scored
    ) r WHERE rn <= {_HN_K}
    """,
    doc=f"Hard-negative mining for embedding-model training: for each of "
    f"{_HN_QUERIES} anchor vectors, the top-{_HN_K} most-similar "
    "vectors with a DIFFERENT label — the negatives that sit closest "
    "to the decision boundary, which is what contrastive training "
    "needs (random negatives are trivially separable and teach "
    "nothing). The label predicate filters inside the scan, the "
    "anchor side broadcasts (knn_batch's plan), and the per-anchor "
    "top-k window touches only scored candidate rows. Similarities "
    "round to 6 decimals before ranking (vec_id tiebreak) so the "
    "selected negatives are bit-stable cross-engine. At 100 TB the "
    "candidate generation runs against the IVF index (partition-"
    "pruned probes) with this exact plan as the per-probe verify.",
    tags=("rag", "ann", "pipeline"),
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _HN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qvec"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "query_id",
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            F.round(cosine_sim(F.col("embedding"), F.col("qvec")), 6).alias("similarity"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= _HN_K)
        .select("query_id", "vec_id", "label", "similarity", F.col("rn").cast("bigint").alias("neg_rank"))
    )


@register(
    "knn_analogy",
    oracle=f"""
    WITH a AS (SELECT embedding AS va FROM embeddings WHERE vec_id = 1),
    b AS (SELECT embedding AS vb FROM embeddings WHERE vec_id = 2),
    c AS (SELECT embedding AS vc FROM embeddings WHERE vec_id = 3),
    t AS (
      SELECT list_transform(range(1, len(va) + 1),
                            i -> va[i] - vb[i] + vc[i]) AS tv
      FROM a, b, c
    )
    SELECT e.vec_id, round({duck_cosine('e.embedding', 't.tv')}, 6) AS similarity
    FROM embeddings e, t
    WHERE e.vec_id NOT IN (1, 2, 3)
    ORDER BY round({duck_cosine('e.embedding', 't.tv')}, 6) DESC, e.vec_id ASC
    LIMIT {K}
    """,
    doc="Vector-arithmetic analogy query (the word2vec 'king - man + "
    "woman' shape): target = v1 - v2 + v3 assembled element-wise with "
    "a fixed-order HOF (both engines evaluate a - b + c left-to-right "
    "per component, so the target vector is bit-identical), then "
    "exact cosine top-5 over the store EXCLUDING the three source "
    "vectors — the anchor-exclusion every analogy eval applies. Same "
    "broadcast-scan plan as knn_topk; similarities round to 6 "
    "decimals before ranking.",
    tags=("rag", "ann"),
)
def knn_analogy(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")

    def vec(vid):
        return emb.filter(F.col("vec_id") == vid).select(
            F.col("embedding").alias(f"v{vid}")
        )

    # explicit broadcast hints: each side is one row by construction,
    # but a bounded side must be DECLARED bounded — without the hints
    # these crossJoins fall back to CartesianProduct whenever auto-
    # broadcast is off (the no-broadcast plan lint pins this)
    t = (
        vec(1)
        .crossJoin(F.broadcast(vec(2)))
        .crossJoin(F.broadcast(vec(3)))
        .select(
            F.expr(
                "transform(sequence(1, size(v1)), i -> "
                "element_at(v1, i) - element_at(v2, i) + element_at(v3, i))"
            ).alias("tv")
        )
    )
    scored = (
        emb.filter(~F.col("vec_id").isin(1, 2, 3))
        .crossJoin(F.broadcast(t))
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("tv")), 6).alias("similarity"),
        )
    )
    return scored.orderBy(F.desc("similarity"), F.asc("vec_id")).limit(K)
