"""Streaming index construction: documents arriving as files → chunk →
embed → append to the vector store, continuously.

This is the engine's answer to the north-star note that a RAG vector
database "could use Spark for batch embedding generation and index
construction": the same chunk/embed/append pipeline as
:func:`rag.ingest_documents`, but driven by a file-watching stream with
``foreachBatch`` appends — new documents become searchable one
micro-batch after they land (the distributed version of the reference's
incremental ``add`` per batch, ``App.tsx:79``).

Exactly-once: ``foreachBatch`` + append-mode parquet is idempotent per
batch only if the sink dedups; production would MERGE on chunk id. The
store's hash chunk ids (xxhash64(doc_id, chunk_id)) make that MERGE key
stable across retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..embedder import HashEmbedder
from ..operators.chunker import CHUNK_OVERLAP, CHUNK_SIZE, chunk_documents
from ..rag import VectorStore

__all__ = ["stream_ingest_documents"]


def stream_ingest_documents(
    spark: SparkSession,
    path: str,
    store: VectorStore,
    embedder: HashEmbedder | None = None,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    text_glob: str = "*.txt",
    checkpoint: str | None = None,
    index_centroids: DataFrame | None = None,
    index_path: str | None = None,
    idempotent: bool = False,
):
    """Watch ``path`` for text files; chunk+embed+append each micro-batch.

    ``index_centroids`` + ``index_path``: also maintain a persisted IVF
    index incrementally — each micro-batch's chunk vectors are assigned
    to their nearest (frozen) centroid and appended to that inverted
    list's partition (:func:`..operators.ann.ivf_append`), so new
    documents become searchable through the partition-pruned ANN path
    one micro-batch after they land, with zero index rebuild. This
    composes the reference's entire ingest loop (``App.tsx:43-95``:
    parse → chunk → embed → add, incrementally searchable) as one
    streaming dataflow; ``plans.streaming_twins.stream_ingest_index_twin``
    is the oracle-checked batch twin of the chunk→embed→assign stages.

    ``idempotent=True`` routes store appends through
    :meth:`..rag.VectorStore.merge_add` (anti-join on the stable hash
    chunk id before the append), so a replayed micro-batch — restart
    after a lost checkpoint commit, a retried job — cannot duplicate
    chunks: exactly-once store contents from an at-least-once source,
    without a MERGE-capable table format. The SAME guarantee covers the
    IVF index path: the batch is anti-joined against the index's
    existing ``vec_id``s (a column-pruned read of the id column) before
    :func:`..operators.ann.ivf_append`, so a replay cannot leave the
    index with duplicate entries that a probe would return twice.

    Returns the started StreamingQuery (caller stops it / awaits). Uses
    the text file source (one row per file via ``wholetext``) so the
    pipeline stays JVM-side until the embed stage.

    ``checkpoint`` is where the source records which files it has
    processed — WITHOUT it, every (re)start reprocesses the whole
    directory and duplicates chunks. Defaults to ``<store.path>/_checkpoint``
    when the store is file-backed; required otherwise.
    """
    if checkpoint is None:
        if store.path is None:
            raise ValueError(
                "checkpoint= is required for in-memory stores; a restarted "
                "stream would otherwise re-ingest every file"
            )
        import os

        checkpoint = os.path.join(store.path + "_checkpoint")
    embedder = embedder or HashEmbedder()
    from pyspark.sql import functions as F

    docs = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", text_glob)
        .load(path)
        .select(
            F.xxhash64(F.input_file_name()).alias("doc_id"),
            F.col("value").alias("text"),
        )
    )

    if index_centroids is not None and index_path is None:
        raise ValueError("index_path= is required when index_centroids is given")

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        chunks = chunk_documents(batch_df, chunk_size=chunk_size, overlap=overlap)
        with_id = chunks.select(
            F.xxhash64(F.col("doc_id"), F.col("chunk_id")).alias("id"),
            F.col("chunk_text").alias("text"),
        )
        embedded = embedder.embed_df(with_id, text_col="text")
        if index_centroids is not None:
            embedded = embedded.persist()  # one embed pass feeds both sinks
        (store.merge_add if idempotent else store.add)(embedded)
        if index_centroids is not None:
            import os

            from ..operators.ann import ivf_append

            to_index = embedded.select(
                F.col("id").alias("vec_id"),
                F.col("embedding").cast("array<double>").alias("embedding"),
            )
            if idempotent:
                # Mirror merge_add for the index: a replayed batch must
                # not re-append vectors the index already holds, or the
                # index diverges from the store and a probe can return
                # the same chunk twice in top-k.
                to_index = to_index.dropDuplicates(["vec_id"])
                if os.path.isdir(index_path):
                    existing = batch_df.sparkSession.read.parquet(index_path).select(
                        "vec_id"
                    )
                    to_index = to_index.join(existing, "vec_id", "left_anti")
            ivf_append(to_index, index_centroids, index_path)
            embedded.unpersist()

    return (
        docs.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
