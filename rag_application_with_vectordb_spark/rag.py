"""The RAG surface: vector store + ingest/ask pipelines.

Maps the reference one-to-one (SURVEY.md §3):

- :class:`VectorStore` ≙ ``InMemoryVectorDB`` (``services/vectorDb.ts``):
  ``add`` (S3) / ``reset`` (S4) / ``is_ready`` (S5) / ``search`` (K1-K5),
  but backed by parquet-on-disk DataFrames instead of a JS array, so the
  store survives the session and scales past one machine's heap.
- :func:`ingest` ≙ ``handleFileChange`` (``App.tsx:26-101``):
  documents → sliding-window chunks → filter → embed → append.
- :meth:`RagPipeline.ask` ≙ ``handleSendMessage`` (``App.tsx:180-224``):
  embed question → top-k search → context assembly (P6) → prompt (P7) →
  pluggable answerer (U5; deterministic stub by default — the LLM call is
  outside the deterministic correctness surface).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .embedder import HashEmbedder
from .functions.vector import l2_norm, vec_lit
from .operators.chunker import CHUNK_OVERLAP, CHUNK_SIZE, chunk_documents
from .operators.knn import knn

__all__ = ["VectorStore", "RagPipeline", "ingest_documents", "CONTEXT_SEPARATOR"]

#: Reference joins top-k chunk texts with this separator (``App.tsx:192``).
CONTEXT_SEPARATOR = "\n---\n"

#: Reference prompt template (``geminiService.ts:80-88``), content-equivalent.
PROMPT_TEMPLATE = (
    "Based on the following context, answer the question.\n\n"
    "CONTEXT:\n{context}\n\nQUESTION:\n{question}"
)

_STORE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        # Engine addition over the reference schema (types.ts:2-6):
        # ingest-time norm so queries skip recomputing it (SURVEY.md §4.2).
        T.StructField("norm", T.DoubleType(), True),
    ]
)


class VectorStore:
    """Chunk store with the reference's API over a parquet table.

    The reference's store is a mutable in-memory array
    (``vectorDb.ts:5``) — volatile, single-process. Here ``add`` is an
    append-mode parquet write and ``search`` is the distributed KNN scan;
    at cluster scale the table is just a directory on object storage,
    partitioned by ingest batch.
    """

    def __init__(self, spark: SparkSession, path: str | None = None, normalize: bool = False):
        """``normalize=True`` unit-normalizes vectors at ingest (SURVEY
        §4.2's cosine→dot rewrite): cosine similarity against unit vectors
        needs only the dot product and the query's own norm, so every
        query saves the corpus-norm math. Search results are identical
        (cosine is scale-invariant; zero vectors stay zero)."""
        self.spark = spark
        self.path = path  # None → session-local (union of in-memory frames)
        self.normalize = normalize
        self._mem: DataFrame | None = None

    # S3 — add(newChunks), vectorDb.ts:7-9
    def add(self, chunks: DataFrame) -> None:
        vec = F.col("embedding").cast("array<double>")
        norm = l2_norm(vec)
        if self.normalize:
            vec = F.when(norm == 0.0, vec).otherwise(
                F.transform(vec, lambda x: x / norm)
            )
            norm = F.when(norm == 0.0, F.lit(0.0)).otherwise(F.lit(1.0))
        prepped = chunks.select(
            F.col("id").cast("long"),
            F.col("text"),
            vec.alias("embedding"),
            norm.alias("norm"),
        )
        if self.path is not None:
            prepped.write.mode("append").parquet(self.path)
        else:
            self._mem = prepped if self._mem is None else self._mem.unionByName(prepped)

    def merge_add(self, chunks: DataFrame) -> None:
        """Idempotent :meth:`add`: MERGE-on-id semantics without a Delta/
        Iceberg runtime — rows whose ``id`` already exists in the store
        are dropped before the append, so replaying a batch (stream
        restart after a lost checkpoint commit, a retried job) cannot
        duplicate chunks. The engine's hash chunk ids
        (``xxhash64(doc_id, chunk_id)``) make the key stable across
        retries, which is exactly what makes this merge well-defined.

        Cost: one column-pruned read of the store's ``id`` column + a
        hash anti-join per batch. At 100 TB you'd keep the id set in a
        bloom filter or use a real MERGE-capable table format; the
        semantics here are identical, and the append-only fast path
        (:meth:`add`) remains for sources that guarantee uniqueness.
        """
        # Intra-batch duplicates would both survive a store-only anti-join
        # (a single replayed batch can carry the same id twice), so dedup
        # the batch itself first — the MERGE invariant is "unique ids in
        # the store", unconditionally.
        chunks = chunks.dropDuplicates(["id"])
        if self.is_ready():
            existing = self.df().select("id")
            chunks = chunks.join(
                existing, chunks["id"] == existing["id"], "left_anti"
            )
        self.add(chunks)

    # S4 — reset(), vectorDb.ts:54-56
    def reset(self) -> None:
        self._mem = None
        if self.path is not None and os.path.isdir(self.path):
            import shutil

            shutil.rmtree(self.path)

    def compact(self, target_partitions: int = 1) -> None:
        """Compact the store's many small append files (each incremental
        ``add`` writes its own parquet files — the streaming-ingest path
        produces one batch's worth per trigger). At scale this is the
        routine maintenance job that keeps scan task counts sane:
        rewrite to ``target_partitions`` files and swap atomically-ish.
        """
        if self.path is None or not os.path.isdir(self.path):
            return
        import shutil

        tmp = self.path + "__compacting"
        self.df().coalesce(int(target_partitions)).write.mode("overwrite").parquet(tmp)
        old = self.path + "__old"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)

    def df(self) -> DataFrame:
        if self.path is not None and os.path.isdir(self.path):
            return self.spark.read.schema(_STORE_SCHEMA).parquet(self.path)
        if self._mem is not None:
            return self._mem
        return self.spark.createDataFrame([], _STORE_SCHEMA)

    # S5 — isReady(), vectorDb.ts:58-60 (limit(1), never a full count)
    def is_ready(self) -> bool:
        return len(self.df().limit(1).take(1)) > 0

    # K1-K5 — search(queryEmbedding, topK), vectorDb.ts:11-24
    def search(self, query_vec: list[float], k: int = 5) -> DataFrame:
        return knn(
            self.df(), query_vec, k=k, id_col="id", vec_col="embedding", keep_cols=("text",)
        )


def ingest_documents(
    store: VectorStore,
    docs: DataFrame,
    embedder: HashEmbedder | None = None,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> None:
    """Reference ingest pipeline (``App.tsx:43-95``) over a documents table.

    parse → chunk (P2) → empty-filter (P3) → id (P4) → embed (U2) → add (S3).
    Ids are ``xxhash64(doc_id, chunk_id)`` — stable and computed without
    a global window (a globally-dense id is a single-partition bottleneck
    at scale, SURVEY.md §7.3.3; ``operators.chunker.global_chunk_index``
    provides reference-parity dense ids for small corpora).
    """
    embedder = embedder or HashEmbedder()
    chunks = chunk_documents(docs, chunk_size=chunk_size, overlap=overlap)
    with_id = chunks.select(
        F.xxhash64(F.col("doc_id"), F.col("chunk_id")).alias("id"),
        F.col("chunk_text").alias("text"),
    )
    store.add(embedder.embed_df(with_id, text_col="text"))


def _echo_answerer(context: str, question: str) -> str:
    """Deterministic U5 stub: the reference's LLM call
    (``geminiService.ts:79-103``) is non-deterministic and external, so
    the default answerer just renders the prompt."""
    return PROMPT_TEMPLATE.format(context=context, question=question)


def _echo_stream_answerer(context: str, question: str, chunk_chars: int = 16):
    """Deterministic token-stream twin of :func:`_echo_answerer` — the
    shape of ``generateAnswerStream`` (``geminiService.ts:91-97``): an
    iterator of text chunks whose concatenation is the full answer."""
    full = _echo_answerer(context, question)
    for i in range(0, len(full), chunk_chars):
        yield full[i : i + chunk_chars]


class RagPipeline:
    """End-to-end ask() loop (``App.tsx:180-224``)."""

    def __init__(
        self,
        store: VectorStore,
        embedder: HashEmbedder | None = None,
        answerer: Callable[[str, str], str] = _echo_answerer,
    ):
        self.store = store
        self.embedder = embedder or HashEmbedder()
        self.answerer = answerer

    def retrieve(self, question: str, k: int = 5) -> DataFrame:
        qvec = self.embedder.embed_one(question)  # U1, RETRIEVAL_QUERY
        return self.store.search(qvec, k=k)

    def ask(self, question: str, k: int = 5) -> str:
        # The collect() here is the executors→driver boundary of the
        # reference's 3.2 flow — it moves exactly k rows, never the corpus.
        rows = self.retrieve(question, k=k).collect()
        context = CONTEXT_SEPARATOR.join(r["text"] for r in rows)  # P6
        return self.answerer(context, question)  # P7 + U5

    def ask_stream(self, question: str, k: int = 5, stream_answerer=None):
        """S6 — the token-stream consumption loop (``App.tsx:199-206``):
        yields answer chunks as the (pluggable) streaming answerer emits
        them, so a caller can render incrementally exactly like the
        reference UI. ``"".join(ask_stream(q))`` equals ``ask(q)`` for
        the paired default answerers (asserted in tests)."""
        rows = self.retrieve(question, k=k).collect()
        context = CONTEXT_SEPARATOR.join(r["text"] for r in rows)  # P6
        answer = (stream_answerer or _echo_stream_answerer)(context, question)
        yield from answer


def context_for_query(corpus: DataFrame, query_vec: list[float], k: int = 5) -> DataFrame:
    """Set-oriented context assembly (P6) as a single DataFrame op:
    order-stable via sort inside the aggregate, not after the shuffle
    (SURVEY.md §7.3.2)."""
    top = knn(corpus, vec_lit(query_vec), k=k, keep_cols=("text",))
    packed = top.select(
        F.struct((F.col("similarity") * -1).alias("neg"), F.col("vec_id"), F.col("text")).alias("s")
    )
    return packed.agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s.getField("text")),
            CONTEXT_SEPARATOR,
        ).alias("context")
    )
