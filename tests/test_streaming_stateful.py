"""Stateful streaming operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.sources.catalog import load_table
from rag_application_with_vectordb_spark.streaming.stateful import (
    foreach_batch_collector,
    running_user_totals,
)
from rag_application_with_vectordb_spark.streaming.windows import (
    read_events_stream,
    run_to_completion,
)


def test_running_totals_match_batch_aggregate(spark, sf_dir):
    stream = running_user_totals(read_events_stream(spark, sf_dir))
    got = run_to_completion(stream, "user_totals", mode="update")
    # last emission per user = final cumulative state
    final = {r["user_id"]: (r["n_events"], r["total_value"]) for r in got.collect()}
    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(final) == set(want)
    for u, (n, t) in want.items():
        assert final[u][0] == n
        assert final[u][1] == pytest.approx(t, rel=1e-9)


def test_foreach_batch_sink_sees_all_rows(spark, sf_dir):
    sink: list = []
    stream = read_events_stream(spark, sf_dir).select("event_id")
    foreach_batch_collector(stream, sink)
    assert sink  # at least one batch
    total = sum(len(rows) for _, rows in sink)
    assert total == load_table(spark, sf_dir, "events").count()
    batch_ids = [bid for bid, _ in sink]
    assert batch_ids == sorted(set(batch_ids))  # monotone, no replays
