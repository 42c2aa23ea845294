"""Source/sink format roundtrips + streaming index construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.rag import RagPipeline, VectorStore
from rag_application_with_vectordb_spark.sources.catalog import load_table
from rag_application_with_vectordb_spark.streaming.ingest import stream_ingest_documents


def test_multi_format_roundtrip(spark, sf_dir, tmp_path):
    # The engine reads/writes every mainstream batch format; timestamps,
    # doubles and strings survive each roundtrip.
    events = load_table(spark, sf_dir, "events").limit(200)
    want = {tuple(r) for r in events.collect()}

    events.write.mode("overwrite").parquet(str(tmp_path / "p"))
    assert {tuple(r) for r in spark.read.parquet(str(tmp_path / "p")).collect()} == want

    events.write.mode("overwrite").orc(str(tmp_path / "o"))
    assert {tuple(r) for r in spark.read.orc(str(tmp_path / "o")).collect()} == want

    # JSON and CSV need explicit timestamp formatting to survive
    # microseconds (their defaults serialize milliseconds only)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    events.write.mode("overwrite").option("timestampFormat", fmt).json(str(tmp_path / "j"))
    got_json = (
        spark.read.schema(events.schema)
        .option("timestampFormat", fmt)
        .json(str(tmp_path / "j"))
    )
    assert {tuple(r) for r in got_json.collect()} == want

    events.write.mode("overwrite").option("header", True).option(
        "timestampFormat", fmt
    ).csv(str(tmp_path / "c"))
    got_csv = (
        spark.read.schema(events.schema)
        .option("header", True)
        .option("timestampFormat", fmt)
        .csv(str(tmp_path / "c"))
    )
    assert {tuple(r) for r in got_csv.collect()} == want


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_part")
    orders.withColumn("status", F.col("o_orderstatus")).write.mode(
        "overwrite"
    ).partitionBy("status").parquet(out)
    pruned = spark.read.parquet(out).filter(F.col("status") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the filter appears as PartitionFilters, not a scan filter
    assert "PartitionFilters: [isnotnull(status" in plan
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_streaming_ingest_builds_searchable_index(spark, tmp_path):
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    (incoming / "a.txt").write_text("spark engines scan parquet tables quickly " * 30)
    (incoming / "b.txt").write_text("vector similarity search with cosine distance " * 30)

    store = VectorStore(spark, str(tmp_path / "store"))
    q = stream_ingest_documents(
        spark, str(incoming), store, chunk_size=200, overlap=40
    )
    q.awaitTermination()
    assert store.is_ready()
    n_first = store.df().count()
    assert n_first > 0

    # a new file lands → the restarted query ingests ONLY the new file
    # (checkpointed source state), and it becomes searchable — the
    # distributed version of App.tsx:79 incremental visibility.
    (incoming / "c.txt").write_text("late arriving document about streaming ingest " * 30)
    q2 = stream_ingest_documents(
        spark, str(incoming), store, chunk_size=200, overlap=40
    )
    q2.awaitTermination()
    n_second = store.df().count()
    assert n_second > n_first
    # no duplicate chunk ids: old files were NOT reprocessed
    assert store.df().select("id").distinct().count() == n_second
    answer = RagPipeline(store).ask("streaming ingest", k=3)
    assert "QUESTION:\nstreaming ingest" in answer
