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


def _batch_new_maxima(spark, sf_dir):
    # Batch twin: value > running max of all PRIOR values in (ts, id) order.
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .withColumn("prior_max", F.max("value").over(w))
        .filter(F.col("prior_max").isNull() | (F.col("value") > F.col("prior_max")))
    )
    return {(r["user_id"], r["event_id"]) for r in batch.collect()}


def test_high_water_marks_match_batch_prefix_max(spark, sf_dir):
    # applyInPandasWithState state machine: the stream's emitted "new
    # per-user maximum" rows must equal the batch window twin.
    from rag_application_with_vectordb_spark.streaming.stateful import high_water_marks

    stream = high_water_marks(read_events_stream(spark, sf_dir))
    got = {
        (r["user_id"], r["event_id"])
        for r in run_to_completion(stream, "hwm", mode="append").collect()
    }
    want = _batch_new_maxima(spark, sf_dir)
    assert got == want
    assert got  # non-vacuous


def test_high_water_marks_typed_state_api(spark, sf_dir):
    # Same operator on Spark 4's transformWithStateInPandas; its state
    # server speaks protobuf (satisfied here by the repo-vendored
    # pure-Python runtime when no real install exists — protobuf_compat)
    # and its typed state handles need the multi-column-family RocksDB
    # state store, which ships inside Spark 4.
    from rag_application_with_vectordb_spark.streaming import tws

    if not tws.tws_available():
        pytest.skip("google.protobuf not installed; typed-state API cannot run")
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = tws.high_water_marks(read_events_stream(spark, sf_dir))
        got = {
            (r["user_id"], r["event_id"])
            for r in run_to_completion(stream, "hwm_tws", mode="append").collect()
        }
    finally:
        spark.conf.set(provider_key, prev)
    assert got == _batch_new_maxima(spark, sf_dir)


def _batch_cusum(spark, sf_dir, tgt_cents: int, h_cents: int):
    # Batch twin with pinned constants: prefix sum minus running min
    # (the closed form the catalog query events_cusum_changepoint uses).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ev = load_table(spark, sf_dir, "events").withColumn(
        "y", F.round(F.col("value") * 100).cast("long") - tgt_cents
    )
    p = ev.withColumn("psum", F.sum("y").over(w))
    s = p.withColumn(
        "cusum_cents", F.col("psum") - F.least(F.min("psum").over(w), F.lit(0))
    )
    return {
        (r["user_id"], r["event_id"], r["cusum_cents"])
        for r in s.filter(F.col("cusum_cents") > h_cents).collect()
    }


def test_cusum_monitor_matches_batch_closed_form(spark, sf_dir):
    import math

    from rag_application_with_vectordb_spark.streaming.stateful import cusum_monitor

    # calibration constants computed ONCE (the production pattern: a
    # batch pass calibrates, the stream applies fixed constants)
    stats = (
        load_table(spark, sf_dir, "events")
        .select(F.round(F.col("value") * 100).cast("long").alias("c"))
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("sq"),
        )
        .collect()[0]
    )
    sigma = math.sqrt((stats.sq - stats.s * stats.s / stats.n) / (stats.n - 1))
    tgt = int(math.floor(stats.s / stats.n + 0.5 * sigma))
    h = int(math.floor(5.0 * sigma))

    stream = cusum_monitor(read_events_stream(spark, sf_dir), tgt, h)
    got = {
        (r["user_id"], r["event_id"], r["cusum_cents"])
        for r in run_to_completion(stream, "cusum", mode="append").collect()
    }
    want = _batch_cusum(spark, sf_dir, tgt, h)
    assert got == want
    assert got  # non-vacuous at sf0.001


def _batch_drawdown(spark, sf_dir, alert_cents: int):
    # prefix-sum + running-max closed form (the events_max_drawdown
    # shape at per-user grain)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "event_id",
            "ts",
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            )
            .otherwise(-F.round(F.col("value") * 100).cast("long"))
            .alias("c"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = ev.withColumn("bal", F.sum("c").over(w)).withColumn(
        "peak", F.max(F.sum("c").over(w)).over(w)
    )
    s = s.withColumn("draw", F.col("peak") - F.col("bal"))
    return {
        (r["user_id"], r["event_id"], r["draw"], r["peak"])
        for r in s.filter(F.col("draw") > alert_cents).collect()
    }


def test_drawdown_monitor_matches_batch_closed_form(spark, sf_dir):
    from rag_application_with_vectordb_spark.streaming.stateful import drawdown_monitor

    alert = 5000  # $50 underwater triggers
    stream = drawdown_monitor(read_events_stream(spark, sf_dir), alert)
    got = {
        (r["user_id"], r["event_id"], r["drawdown_cents"], r["peak_cents"])
        for r in run_to_completion(stream, "drawdown", mode="append").collect()
    }
    want = _batch_drawdown(spark, sf_dir, alert)
    assert got == want
    assert got  # non-vacuous at sf0.001


def test_rate_limit_monitor_matches_batch_fold(spark, sf_dir):
    from rag_application_with_vectordb_spark.plans.registry import load_all
    from rag_application_with_vectordb_spark.streaming.stateful import (
        rate_limit_monitor,
    )

    cap, cost = 2 * 21600, 21600  # the batch query's constants
    stream = rate_limit_monitor(read_events_stream(spark, sf_dir), cap, cost)
    rows = run_to_completion(stream, "ratelimit", mode="append").collect()
    got_rejected = {}
    for r in rows:
        got_rejected[r["user_id"]] = got_rejected.get(r["user_id"], 0) + 1
    batch = load_all()["events_rate_limit_audit"].fn(spark, sf_dir).collect()
    want_rejected = {r.user_id: r.rejected for r in batch if r.rejected > 0}
    assert got_rejected == want_rejected
    assert got_rejected  # throttle actually bites at sf0.001 (104 rejects)
    # each rejection row carries sub-cost credit by definition
    assert all(r["credit_sec"] < cost for r in rows)
