"""Batch twins of the streaming window operators (SURVEY.md §7.2 phase 6).

Structured Streaming results can't be DuckDB-oracle-checked directly, so
each streaming operator in ``streaming.windows`` has a batch twin here
computing the *same* window semantics over the ``events`` table with
``F.window`` / ``F.session_window`` — the driver hash-checks these, and
the pytest streaming suite asserts streaming output == batch twin.

Determinism: counts are exact; ``value`` sums go through DECIMAL (the
fixture values are 2-decimal), window bounds are epoch-aligned UTC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import load_table
from .registry import register

_D = "DECIMAL(18,2)"


@register(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {_D})) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Tumbling 1-hour event-time window (F.window) — batch twin of the "
    "streaming aggregate; epoch-aligned, UTC.",
    tags=("streaming",),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_D)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_sliding_halfhour",
    oracle="""
    WITH cand AS (
      SELECT e.event_id, e.value, make_timestamp(CAST(t.s AS BIGINT)) AS window_start
      FROM events e,
           LATERAL (SELECT unnest([
             (epoch_us(e.ts) // 1800000000) * 1800000000,
             (epoch_us(e.ts) // 1800000000) * 1800000000 - 1800000000
           ])) t(s)
      WHERE epoch_us(e.ts) - t.s < 3600000000 AND epoch_us(e.ts) >= t.s
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n_events
    FROM cand GROUP BY 1, 2
    """,
    doc="Sliding window (1 h length / 30 min hop): every event lands in "
    "two windows; the oracle enumerates both candidate starts explicitly.",
    tags=("streaming",),
)
def events_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


@register(
    "events_sessionized",
    oracle=f"""
    WITH x AS (
      SELECT user_id, ts, event_id, value,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 4 HOUR
             THEN 1 ELSE 0 END AS is_new
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, value,
        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM x
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(SUM(CAST(value AS {_D})) AS DOUBLE) AS session_value
    FROM s GROUP BY user_id, session_id
    """,
    doc="Sessionization (4-hour inactivity gap) via lag + cumulative-sum — "
    "the batch twin of streaming session_window; partitioned by user, so "
    "the window shuffle is keyed and scalable.",
    tags=("streaming",),
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap comparison (a double epoch would round near the
    # 4-hour boundary differently than the oracle's interval arithmetic).
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(order)
    is_new = F.when(gap_us > 4 * 3600 * 1_000_000, F.lit(1)).otherwise(F.lit(0))
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_sess = events.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(cum)
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast(_D)).cast("double").alias("session_value"),
    )


@register(
    "events_high_water_marks",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id, ts, value,
             MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior_max
      FROM events
    )
    SELECT user_id, event_id, ts, value
    FROM x
    WHERE prior_max IS NULL OR value > prior_max
    """,
    doc="Per-user new-maximum detector — batch twin of the stateful "
    "streaming state machine (streaming.stateful.high_water_marks / "
    "streaming.tws): emit rows whose value exceeds every prior value in "
    "(ts, event_id) order. The pytest suite asserts stream == this twin.",
    tags=("streaming",),
)
def events_high_water_marks(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        events.withColumn("prior_max", F.max("value").over(w))
        .filter(F.col("prior_max").isNull() | (F.col("value") > F.col("prior_max")))
        .select("user_id", "event_id", "ts", "value")
    )
