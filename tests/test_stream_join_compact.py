"""Stream-stream range join vs its batch twin; store compaction."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.operators.rangejoin import range_join_within
from rag_application_with_vectordb_spark.rag import VectorStore
from rag_application_with_vectordb_spark.sources.catalog import load_table
from rag_application_with_vectordb_spark.streaming.windows import (
    read_events_stream,
    run_to_completion,
    stream_stream_range_join,
)


def test_stream_stream_join_matches_batch_range_join(spark, sf_dir):
    # purchase→view within 30 min: dense enough at sf0.001 to be non-trivial
    p_stream = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    e_stream = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "view")
    joined = stream_stream_range_join(p_stream, e_stream, window_seconds=1800)
    got = run_to_completion(joined, "ss_join_out", mode="append")

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = events.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    want = range_join_within(purchases, views, on="ts", key="user_id", window_seconds=1800)

    g = {(r["a_event_id"], r["b_event_id"]) for r in got.collect()}
    w = {(r["a_event_id"], r["b_event_id"]) for r in want.collect()}
    assert g == w
    assert g  # non-trivial on the fixture


def test_store_compaction_preserves_data(spark, tmp_path):
    store = VectorStore(spark, str(tmp_path / "store"))
    for i in range(5):  # five appends → five file groups
        df = spark.createDataFrame(
            [(i * 10 + j, f"t{i}-{j}", [float(i), float(j)]) for j in range(4)],
            "id long, text string, embedding array<double>",
        )
        store.add(df)
    def rowset(df):
        return {(r["id"], r["text"], tuple(r["embedding"]), r["norm"]) for r in df.collect()}

    before_rows = rowset(store.df())
    before_files = len(glob.glob(str(tmp_path / "store" / "*.parquet")))
    store.compact(target_partitions=1)
    after_rows = rowset(store.df())
    after_files = len(glob.glob(str(tmp_path / "store" / "*.parquet")))
    assert after_rows == before_rows
    assert after_files < before_files
    assert after_files == 1
    # store still serves searches after the swap
    assert store.search([1.0, 1.0], k=3).count() == 3
