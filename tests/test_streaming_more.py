"""Streaming dedup and stream-static enrichment tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.sources.catalog import load_table
from rag_application_with_vectordb_spark.streaming.windows import (
    dedup_stream,
    enrich_with_static,
    read_events_stream,
    run_to_completion,
)


def test_streaming_dedup_removes_replayed_rows(spark, sf_dir):
    # Two readers of the same file → every event arrives twice.
    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir)
    )
    got = run_to_completion(dedup_stream(doubled), "dedup_out", mode="append")
    n_events = load_table(spark, sf_dir, "events").count()
    assert got.count() == n_events
    assert got.select("event_id").distinct().count() == n_events


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    events_batch = load_table(spark, sf_dir, "events")
    dim = events_batch.groupBy("user_id").agg(F.count("*").alias("user_total"))
    enriched = enrich_with_static(
        read_events_stream(spark, sf_dir).select("event_id", "user_id"), dim
    )
    got = run_to_completion(enriched, "enrich_out", mode="append")
    want = events_batch.select("event_id", "user_id").join(dim, "user_id")
    assert {tuple(r) for r in got.select(*want.columns).collect()} == {
        tuple(r) for r in want.collect()
    }
