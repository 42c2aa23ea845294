"""Structured Streaming tests: replay the events fixture through the
streaming window operators and assert equality with their batch twins
(which the driver oracle-checks against DuckDB — transitively anchoring
the streaming semantics)."""

from __future__ import annotations

import pytest

from rag_application_with_vectordb_spark.plans.registry import load_all
from rag_application_with_vectordb_spark.streaming.windows import (
    read_events_stream,
    run_to_completion,
    session_counts_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)


def as_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def specs():
    return load_all()


def test_tumbling_stream_equals_batch_twin(spark, sf_dir, specs):
    stream = tumbling_counts_stream(read_events_stream(spark, sf_dir))
    got = run_to_completion(stream, "tumbling_out")
    want = specs["events_tumbling_hourly"].fn(spark, sf_dir)
    assert sorted(got.columns) == sorted(want.columns)
    assert as_set(got.select(*want.columns)) == as_set(want)


def test_sliding_stream_equals_batch_twin(spark, sf_dir, specs):
    stream = sliding_counts_stream(read_events_stream(spark, sf_dir))
    got = run_to_completion(stream, "sliding_out")
    want = specs["events_sliding_halfhour"].fn(spark, sf_dir)
    assert as_set(got.select(*want.columns)) == as_set(want)


def test_session_stream_matches_batch_sessionization(spark, sf_dir, specs):
    stream = session_counts_stream(read_events_stream(spark, sf_dir))
    got = run_to_completion(stream, "session_out")
    want = specs["events_sessionized"].fn(spark, sf_dir)
    # Same session structure: compare (user, start, end, n, value) sets —
    # the twin's session_id is an ordinal, session_window's bound is
    # [start, last_ts + gap), so compare counts and starts.
    got_keys = {
        (r["user_id"], r["session_start"], r["n_events"], r["session_value"])
        for r in got.collect()
    }
    want_keys = {
        (r["user_id"], r["session_start"], r["n_events"], r["session_value"])
        for r in want.collect()
    }
    assert got_keys == want_keys


def test_watermark_append_mode_emits_closed_windows(spark, sf_dir):
    # Append mode + watermark: the file source replays everything in one
    # availableNow batch, so windows older than (max_ts - watermark) close
    # and emit; the trailing window is withheld. We assert the emitted set
    # is a subset of the complete-mode result and non-empty.
    stream = tumbling_counts_stream(read_events_stream(spark, sf_dir), watermark="1 hour")
    appended = run_to_completion(stream, "tumbling_append", mode="append")
    complete = run_to_completion(
        tumbling_counts_stream(read_events_stream(spark, sf_dir)), "tumbling_complete"
    )
    a, c = as_set(appended), as_set(complete)
    assert a and a.issubset(c)
