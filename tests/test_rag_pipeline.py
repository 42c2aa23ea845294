"""End-to-end RAG pipeline tests: VectorStore add/reset/search lifecycle
(vectorDb.ts:5-60) and ingest→ask (App.tsx:26-224) with the
deterministic HashEmbedder."""

from __future__ import annotations

import pytest

from rag_application_with_vectordb_spark.embedder import ApiEmbedder, HashEmbedder, QuotaExhausted
from rag_application_with_vectordb_spark.rag import (
    CONTEXT_SEPARATOR,
    RagPipeline,
    VectorStore,
    ingest_documents,
)
from rag_application_with_vectordb_spark.sources.catalog import load_table


@pytest.fixture()
def store(spark, tmp_path):
    return VectorStore(spark, str(tmp_path / "store"))


def test_store_lifecycle(spark, store):
    assert not store.is_ready()  # S5: empty store
    df = spark.createDataFrame(
        [(0, "hello", [1.0, 0.0]), (1, "world", [0.0, 1.0])],
        "id long, text string, embedding array<double>",
    )
    store.add(df)  # S3
    assert store.is_ready()
    got = store.search([1.0, 0.1], k=1).collect()
    assert got[0]["id"] == 0 and got[0]["text"] == "hello"
    store.reset()  # S4
    assert not store.is_ready()
    assert store.search([1.0, 0.0], k=5).count() == 0  # K5 empty-store


def test_incremental_adds_visible(spark, store):
    # App.tsx:79 — chunks become searchable batch-by-batch.
    df1 = spark.createDataFrame([(0, "a", [1.0, 0.0])], "id long, text string, embedding array<double>")
    df2 = spark.createDataFrame([(1, "b", [0.9, 0.1])], "id long, text string, embedding array<double>")
    store.add(df1)
    assert store.search([1.0, 0.0], k=5).count() == 1
    store.add(df2)
    assert store.search([1.0, 0.0], k=5).count() == 2


def test_ingest_and_ask_deterministic(spark, sf_dir, store):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    ingest_documents(store, docs)
    assert store.is_ready()
    pipe = RagPipeline(store)
    answer1 = pipe.ask("what is a spark table scan?", k=3)
    answer2 = pipe.ask("what is a spark table scan?", k=3)
    assert answer1 == answer2  # deterministic end-to-end
    assert "CONTEXT:" in answer1 and "QUESTION:" in answer1  # prompt template P7
    retrieved = pipe.retrieve("what is a spark table scan?", k=3).collect()
    assert len(retrieved) == 3
    sims = [r["similarity"] for r in retrieved]
    assert sims == sorted(sims, reverse=True)
    # context assembly joins exactly the retrieved texts in order (P6)
    ctx = CONTEXT_SEPARATOR.join(r["text"] for r in retrieved)
    assert ctx in answer1


def test_ask_stream_accumulates_to_full_answer(spark, sf_dir, store):
    # S6 — the reference's token consumption loop (App.tsx:199-206):
    # incremental accumulation over the stream must reproduce the full
    # answer, chunk by chunk, exactly like the UI's partial renders.
    docs = load_table(spark, sf_dir, "documents").limit(50)
    ingest_documents(store, docs)
    pipe = RagPipeline(store)
    q = "what is a spark table scan?"
    full = pipe.ask(q, k=3)
    acc, partials = "", []
    for token in pipe.ask_stream(q, k=3):
        acc += token
        partials.append(acc)
    assert acc == full  # stream == non-stream answer
    assert len(partials) > 1  # genuinely incremental
    assert all(full.startswith(p) for p in partials)  # monotone prefix growth
    # pluggable streaming answerer (U5 surface): word-at-a-time fake API
    def word_stream(context, question):
        for w in ("streamed", " ", "answer"):
            yield w

    assert "".join(pipe.ask_stream(q, k=3, stream_answerer=word_stream)) == "streamed answer"


def test_normalized_store_same_results(spark, sf_dir, tmp_path):
    # normalize-at-ingest (SURVEY §4.2): identical retrieval, cheaper query
    from rag_application_with_vectordb_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id AS id", "CAST(vec_id AS STRING) AS text", "embedding"
    )
    plain = VectorStore(spark, str(tmp_path / "plain"))
    unit = VectorStore(spark, str(tmp_path / "unit"), normalize=True)
    plain.add(emb)
    unit.add(emb)
    q = [float(x) for x in emb.first()["embedding"]]
    a = plain.search(q, k=10).collect()
    b = unit.search(q, k=10).collect()
    assert [r["id"] for r in a] == [r["id"] for r in b]
    for ra, rb in zip(a, b):
        assert rb["similarity"] == pytest.approx(ra["similarity"], abs=1e-9)
    # unit store really holds unit vectors
    norms = {r["norm"] for r in unit.df().select("norm").collect()}
    assert norms == {1.0}


def test_hash_embedder_expr_matches_python(spark):
    emb = HashEmbedder(dim=16)
    df = spark.createDataFrame([("some text",), ("other",)], "text string")
    rows = emb.embed_df(df).collect()
    for r in rows:
        assert r["embedding"] == pytest.approx(emb.embed_one(r["text"]), abs=1e-12)


def test_hash_embedding_unrolled_bitwise(spark):
    """r12 optimization: the unrolled one-parse SQL embedder
    (hash_embedding_sql) and the driver-side embed_one must be
    BIT-IDENTICAL (== on floats, no tolerance) to the HOF Catalyst form
    they replace in hot paths — rag_e2e_retrieval inlines embed_one's
    doubles as literals, so 1-ulp drift would flip its oracle hash."""
    from pyspark.sql import functions as F

    from rag_application_with_vectordb_spark.embedder import (
        hash_embedding_expr,
        hash_embedding_sql,
    )

    emb = HashEmbedder(dim=8)
    texts = ["how does a spark table scan work", "some text", "", "x" * 200]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text",
        hash_embedding_expr(F.col("text"), 8).alias("hof"),
        F.expr(hash_embedding_sql("text", 8)).alias("unrolled"),
    ).collect()
    for r in rows:
        assert [float(x) for x in r["unrolled"]] == [float(x) for x in r["hof"]]
        assert emb.embed_one(r["text"]) == [float(x) for x in r["hof"]]


def test_api_embedder_batching_and_validation(spark):
    # The transport runs inside executor workers, so record the observed
    # API-call batch size in the returned vector itself.
    def fake_transport(texts):
        return [[float(len(t)), float(len(texts))] for t in texts]

    emb = ApiEmbedder(transport=fake_transport, dim=2, api_batch_size=3)
    df = spark.createDataFrame([(f"t{i}" * (i + 1),) for i in range(8)], "text string").coalesce(1)
    out = emb.embed_df(df).collect()
    assert len(out) == 8
    assert all(len(r["embedding"]) == 2 for r in out)
    # client-side micro-batching (App.tsx:17): no API call saw > 3 texts
    assert all(r["embedding"][1] <= 3 for r in out)


def test_api_embedder_quota_classification():
    def quota_transport(texts):
        raise RuntimeError("429 RESOURCE_EXHAUSTED: quota")

    emb = ApiEmbedder(transport=quota_transport)
    with pytest.raises(QuotaExhausted):
        emb._call(["x"])


def test_api_embedder_length_validation():
    emb = ApiEmbedder(transport=lambda texts: [[1.0]] * (len(texts) + 1), max_retries=1)
    with pytest.raises(ValueError):
        emb._call(["x"])


def test_api_embedder_no_transport_raises():
    with pytest.raises(NotImplementedError):
        ApiEmbedder()._call(["x"])
