"""Streaming ingest → incremental IVF index (VERDICT r5 item 6).

stream_ingest_documents can maintain a persisted IVF index per
micro-batch (chunk → embed → nearest-frozen-centroid ivf_append). These
tests prove, on real streamed files:

1. the stream-built index equals the batch chunk→embed→assign path
   row-for-row (the oracle-checked ``stream_ingest_index_twin`` runs the
   same stages over the fixture);
2. a later micro-batch APPENDS — prior rows untouched, only new chunks
   added, and the appended rows are immediately servable through the
   partition-pruned probe path with no rebuild.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.embedder import HashEmbedder
from rag_application_with_vectordb_spark.operators.ann import ann_ivf_topk, ivf_assign
from rag_application_with_vectordb_spark.operators.chunker import chunk_documents
from rag_application_with_vectordb_spark.plans.streaming_twins import (
    _ING_DIM,
    ingest_index_centroids,
)
from rag_application_with_vectordb_spark.rag import VectorStore
from rag_application_with_vectordb_spark.streaming.ingest import stream_ingest_documents


def _batch_index_rows(spark, incoming, embedder, cents):
    """The batch twin of the stream's chunk→embed→assign dataflow over
    the same files (identical ids: xxhash64 of file URI + chunk id)."""
    docs = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.txt")
        .load(str(incoming))
        .select(
            F.xxhash64(F.input_file_name()).alias("doc_id"),
            F.col("value").alias("text"),
        )
    )
    chunks = chunk_documents(docs, chunk_size=200, overlap=40)
    with_id = chunks.select(
        F.xxhash64(F.col("doc_id"), F.col("chunk_id")).alias("vec_id"),
        F.col("chunk_text").alias("text"),
    )
    emb = embedder.embed_df(with_id, text_col="text").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return ivf_assign(emb, cents)


def test_stream_ingest_maintains_ivf_index(spark, tmp_path):
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    (incoming / "a.txt").write_text("spark engines scan parquet tables quickly " * 30)
    (incoming / "b.txt").write_text("vector similarity search with cosine distance " * 30)

    cents = ingest_index_centroids(spark)
    embedder = HashEmbedder(dim=_ING_DIM)
    index_path = str(tmp_path / "ivf_index")
    store = VectorStore(spark, str(tmp_path / "store"))

    q = stream_ingest_documents(
        spark,
        str(incoming),
        store,
        embedder=embedder,
        chunk_size=200,
        overlap=40,
        index_centroids=cents,
        index_path=index_path,
    )
    q.awaitTermination()

    got = {
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(index_path).collect()
    }
    want = {
        (r["vec_id"], r["centroid_id"])
        for r in _batch_index_rows(spark, incoming, embedder, cents).collect()
    }
    assert got == want
    assert len(got) > 0
    # the store and the index saw the same chunk population
    assert store.df().count() == len(got)

    # --- a late file lands: restart (checkpointed) → APPEND, no rebuild ---
    (incoming / "late.txt").write_text(
        "late arriving document about streaming ingest and indexes " * 30
    )
    q2 = stream_ingest_documents(
        spark,
        str(incoming),
        store,
        embedder=embedder,
        chunk_size=200,
        overlap=40,
        index_centroids=cents,
        index_path=index_path,
    )
    q2.awaitTermination()

    idx2 = spark.read.parquet(index_path)
    got2 = {(r["vec_id"], r["centroid_id"]) for r in idx2.collect()}
    # strictly grew, prior rows byte-identical (append-only), no dup ids
    assert got.issubset(got2)
    assert len(got2) > len(got)
    assert idx2.select("vec_id").distinct().count() == len(got2)

    # appended rows are SERVABLE through the partition-pruned probe path
    # with zero rebuild: query with a late chunk's own vector → itself
    late_ids = {v for v, _ in got2 - got}
    probe_row = idx2.filter(F.col("vec_id").isin(list(late_ids))).limit(1).collect()[0]
    queries = spark.createDataFrame(
        [(probe_row["vec_id"], [float(x) for x in probe_row["embedding"]])],
        "query_id long, qvec array<double>",
    )
    top1 = ann_ivf_topk(
        idx2, cents, queries, k=1, nprobe=1, inverted=idx2
    ).collect()
    assert top1[0]["vec_id"] == probe_row["vec_id"]
    assert abs(top1[0]["similarity"] - 1.0) < 1e-12


def test_ivf_compact_collapses_files_and_preserves_serving(spark, tmp_path):
    # Many small appends -> many files per inverted list; compaction must
    # collapse each list to one file with byte-identical contents and an
    # unchanged serve result.
    import glob

    from pyspark.sql import functions as F

    from rag_application_with_vectordb_spark.operators.ann import (
        ivf_append,
        ivf_compact,
        ivf_assign,
    )

    cents = ingest_index_centroids(spark)
    embedder = HashEmbedder(dim=_ING_DIM)
    idx = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 3} with extra words") for i in range(40)],
        "vec_id long, text string",
    )
    vecs = embedder.embed_df(base, text_col="text").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    ivf_assign(vecs, cents).write.mode("overwrite").partitionBy("centroid_id").parquet(idx)
    for lo in (40, 60, 80):  # three small append batches
        batch = spark.createDataFrame(
            [(i, f"late batch doc {i} arriving afterwards") for i in range(lo, lo + 20)],
            "vec_id long, text string",
        )
        bvecs = embedder.embed_df(batch, text_col="text").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        ivf_append(bvecs, cents, idx)

    def files_per_list():
        parts = glob.glob(idx + "/centroid_id=*")
        return {p.rsplit("=", 1)[1]: len(glob.glob(p + "/*.parquet")) for p in parts}

    before_rows = {(r["vec_id"], r["centroid_id"]) for r in spark.read.parquet(idx).collect()}
    assert max(files_per_list().values()) >= 2  # appends really fragmented it

    ivf_compact(spark, idx)

    assert max(files_per_list().values()) == 1  # one file per inverted list
    after_rows = {(r["vec_id"], r["centroid_id"]) for r in spark.read.parquet(idx).collect()}
    assert after_rows == before_rows
    assert len(after_rows) == 100


def test_ivf_recover_restores_crashed_swap(spark, tmp_path):
    # r6 ADVICE: a hard crash between ivf_compact's two renames strands
    # the live index under a pid-suffixed '.old' name. ivf_recover must
    # restore it and clear debris; a live index must never be clobbered.
    import os

    from rag_application_with_vectordb_spark.operators.ann import (
        ivf_compact,
        ivf_recover,
    )

    cents = ingest_index_centroids(spark)
    idx = str(tmp_path / "ivf_index")
    emb = HashEmbedder(dim=_ING_DIM)
    rows = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.concat(F.lit("doc number "), F.col("id").cast("string")).alias("text"),
    )
    vecs = emb.embed_df(rows, text_col="text").select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("embedding")
    )
    from rag_application_with_vectordb_spark.operators.ann import ivf_append

    ivf_append(vecs, cents, idx)
    before = sorted(
        (r["vec_id"], r["centroid_id"]) for r in spark.read.parquet(idx).collect()
    )

    # simulate the crash window: live dir stranded as .old, half-written tmp left
    os.rename(idx, idx + ".old99999")
    os.makedirs(idx + ".compact99999")
    assert ivf_recover(idx) is True
    assert os.path.isdir(idx)
    assert not os.path.exists(idx + ".old99999")
    assert not os.path.exists(idx + ".compact99999")
    after = sorted(
        (r["vec_id"], r["centroid_id"]) for r in spark.read.parquet(idx).collect()
    )
    assert after == before

    # debris next to a LIVE index is cleared without touching the index;
    # ivf_compact self-heals through the same path
    os.makedirs(idx + ".old11111")
    ivf_compact(spark, idx)
    assert not os.path.exists(idx + ".old11111")
    assert sorted(
        (r["vec_id"], r["centroid_id"]) for r in spark.read.parquet(idx).collect()
    ) == before
    assert ivf_recover(idx) is False  # nothing to do on a healthy index


def test_idempotent_ingest_survives_checkpoint_loss(spark, tmp_path):
    # The at-least-once failure mode: the checkpoint is lost, the stream
    # restarts, and every file is redelivered. merge_add's anti-join on
    # the stable hash chunk id must keep the store byte-identical;
    # the plain append path duplicates (shown as the contrast).
    import shutil

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    (incoming / "a.txt").write_text("replayed document about exactly once sinks " * 30)
    (incoming / "b.txt").write_text("second document with different content words " * 30)

    def run(store, checkpoint, idempotent):
        q = stream_ingest_documents(
            spark,
            str(incoming),
            store,
            embedder=HashEmbedder(dim=_ING_DIM),
            chunk_size=200,
            overlap=40,
            checkpoint=str(checkpoint),
            idempotent=idempotent,
        )
        q.awaitTermination()

    # idempotent path: replay-after-checkpoint-loss changes nothing
    store = VectorStore(spark, str(tmp_path / "store"))
    ck = tmp_path / "ck"
    run(store, ck, idempotent=True)
    first = sorted(r["id"] for r in store.df().select("id").collect())
    assert len(first) == len(set(first)) > 0
    shutil.rmtree(ck)  # lose the source's processed-files log
    run(store, ck, idempotent=True)  # full redelivery
    replay = sorted(r["id"] for r in store.df().select("id").collect())
    assert replay == first

    # contrast: the append-only fast path duplicates on the same replay
    store2 = VectorStore(spark, str(tmp_path / "store2"))
    ck2 = tmp_path / "ck2"
    run(store2, ck2, idempotent=False)
    n1 = store2.df().count()
    shutil.rmtree(ck2)
    run(store2, ck2, idempotent=False)
    assert store2.df().count() == 2 * n1


def test_idempotent_ingest_covers_the_ivf_index(spark, tmp_path):
    # r6 ADVICE (medium): with idempotent=True AND index_centroids set, a
    # replayed micro-batch must not re-append vectors into the IVF index
    # either — otherwise the index diverges from the store and a probe
    # returns the same chunk twice in top-k.
    import shutil

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    (incoming / "a.txt").write_text("replayed document about exactly once sinks " * 30)
    (incoming / "b.txt").write_text("second document with different content words " * 30)

    cents = ingest_index_centroids(spark)
    index_path = str(tmp_path / "ivf_index")
    store = VectorStore(spark, str(tmp_path / "store"))
    ck = tmp_path / "ck"

    def run():
        q = stream_ingest_documents(
            spark,
            str(incoming),
            store,
            embedder=HashEmbedder(dim=_ING_DIM),
            chunk_size=200,
            overlap=40,
            checkpoint=str(ck),
            index_centroids=cents,
            index_path=index_path,
            idempotent=True,
        )
        q.awaitTermination()

    run()
    first = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(index_path).collect()
    )
    assert len(first) == len({v for v, _ in first}) > 0
    shutil.rmtree(ck)  # lose the processed-files log → full redelivery
    run()
    replay = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(index_path).collect()
    )
    assert replay == first  # index byte-identical, no duplicate vec_ids
    # store and index agree on the chunk population
    assert store.df().count() == len(replay)
