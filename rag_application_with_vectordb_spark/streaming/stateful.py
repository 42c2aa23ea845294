"""Custom stateful streaming operators via ``applyInPandasWithState``.

These are the operators Structured Streaming's built-in window
aggregates can't express: arbitrary per-key state machines. State lives
in the state store (checkpointed, partitioned by key) — at scale,
cardinality of the key domain bounds memory, and timeouts reap idle
keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = ["running_user_totals", "high_water_marks", "cusum_monitor", "drawdown_monitor", "rate_limit_monitor", "foreach_batch_collector"]


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event_count, value_total) across micro-batches.

    Emits one row per user per batch with the cumulative totals — the
    streaming analog of a running-total window, but with explicit state
    so it survives across triggers and restarts (checkpointed).
    """
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def high_water_marks(events: DataFrame) -> DataFrame:
    """Per-user "new maximum" detector: emit a row whenever an event's
    ``value`` exceeds every prior value in that user's stream, processing
    rows in (ts, event_id) order within each micro-batch.

    This is the order-sensitive state-machine class that built-in window
    aggregates can't express in streaming. Batch twin (asserted in
    tests): ``value > max(value) OVER (PARTITION BY user_id ORDER BY ts,
    event_id ROWS UNBOUNDED PRECEDING EXCLUDING CURRENT)``.

    State: one double per user — bounded by user cardinality, not stream
    length; hash-partitioned across the state store. See
    :mod:`.tws` for the same operator on Spark 4's typed-state API
    (``transformWithStateInPandas``), used when protobuf is available.
    """
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("hwm", T.DoubleType())])

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (hwm,) = state.get if state.exists else (None,)
        out: list[dict] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        for row in batch.sort_values(["ts", "event_id"]).itertuples(index=False):
            v = float(row.value)
            if hwm is None or v > hwm:
                hwm = v
                out.append(
                    {"user_id": key[0], "event_id": row.event_id, "ts": row.ts, "value": v}
                )
        state.update((hwm,))
        if out:
            yield pd.DataFrame(out)

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def cusum_monitor(events: DataFrame, tgt_cents: int, h_cents: int) -> DataFrame:
    """Streaming CUSUM changepoint monitor: emit an alert row whenever a
    user's one-sided CUSUM statistic S_t = max(0, S_{t-1} + (cents_t -
    tgt_cents)) exceeds ``h_cents``, processing rows in (ts, event_id)
    order within each micro-batch.

    The streaming twin of the batch catalog query
    ``events_cusum_changepoint`` (plans/analytics.py), which computes the
    same statistic via the closed form P_t - min(0, min P_j) in two
    window passes; with identical calibration constants the emitted
    (user_id, event_id, cusum_cents) rows are equal — asserted in
    tests under arbitrary micro-batch splits. In production the
    constants come from the batch calibration pass (mean + 0.5*sigma /
    5*sigma over a reference period); recomputing them inside the
    stream would make the statistic non-stationary.

    State per user: two integers (prefix sum and its running minimum) —
    bounded by user cardinality, exact (no fp drift over an unbounded
    stream), checkpointed in the state store.
    """
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("cusum_cents", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("psum", T.LongType()), T.StructField("minp", T.LongType())]
    )

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        psum, minp = state.get if state.exists else (0, 0)
        out: list[dict] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        for row in batch.sort_values(["ts", "event_id"]).itertuples(index=False):
            psum += int(round(float(row.value) * 100)) - tgt_cents
            minp = min(minp, psum)
            cusum = psum - min(minp, 0)
            if cusum > h_cents:
                out.append(
                    {
                        "user_id": key[0],
                        "event_id": row.event_id,
                        "ts": row.ts,
                        "cusum_cents": cusum,
                    }
                )
        state.update((psum, minp))
        if out:
            yield pd.DataFrame(out)

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def drawdown_monitor(events: DataFrame, alert_cents: int) -> DataFrame:
    """Streaming drawdown monitor: per user, track the running balance
    (purchases add, errors subtract, integer cents) and its running
    peak; emit an alert row whenever the drawdown ``peak - balance``
    exceeds ``alert_cents``, processing rows in (ts, event_id) order
    within each micro-batch.

    The streaming twin of the batch catalog query
    ``events_max_drawdown`` (plans/analytics.py) at per-user grain: the
    batch form computes prefix-sum + running-max in two window passes;
    this state machine carries the same two exact integers per user
    (balance, peak), so stream == batch under ANY micro-batch split —
    asserted in tests/test_streaming_stateful.py. No fp drift is
    possible over an unbounded stream: state is integer cents.
    """
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("drawdown_cents", T.LongType()),
            T.StructField("peak_cents", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("bal", T.LongType()), T.StructField("peak", T.LongType())]
    )

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # peak starts at the first OBSERVED balance (sentinel, not 0):
        # the batch closed form takes MAX over observed prefix balances
        # only, and a 0-peak would invent a drawdown for users whose
        # stream opens with losses.
        bal, peak = state.get if state.exists else (0, -(1 << 62))
        out: list[dict] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        for row in batch.sort_values(["ts", "event_id"]).itertuples(index=False):
            cents = int(round(float(row.value) * 100))
            bal += cents if row.event_type == "purchase" else -cents
            peak = max(peak, bal)
            draw = peak - bal
            if draw > alert_cents:
                out.append(
                    {
                        "user_id": key[0],
                        "event_id": row.event_id,
                        "ts": row.ts,
                        "drawdown_cents": draw,
                        "peak_cents": peak,
                    }
                )
        state.update((bal, peak))
        if out:
            yield pd.DataFrame(out)

    return (
        events.filter(events["event_type"].isin("purchase", "error"))
        .select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def foreach_batch_collector(stream_df: DataFrame, sink: list) -> Any:
    """Drive a stream through a ``foreachBatch`` sink that appends
    (batch_id, rows) to ``sink`` — the exactly-once upsert pattern's test
    double (production would MERGE into a table keyed by batch id)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sink.append((batch_id, batch_df.collect()))

    q = stream_df.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination()
    return q


def rate_limit_monitor(events: DataFrame, cap_sec: int, cost_sec: int) -> DataFrame:
    """Streaming token-bucket throttle: per user, carry credit in whole
    SECONDS (capacity ``cap_sec``, one admission costs ``cost_sec``;
    elapsed wall-clock seconds refill 1:1, clamped at the cap) and emit
    a row for every REJECTED event, processing rows in (ts, event_id)
    order within each micro-batch.

    The streaming twin of the batch catalog query
    ``events_rate_limit_audit`` (plans/mining_queries.py), whose ordered
    integer fold replays the same recursion per user — with identical
    (cap, cost) the per-user rejected counts are equal under ANY
    micro-batch split (asserted in tests/test_streaming_stateful.py).
    The two-sided clamp (min at the cap, floor at the cost) is exactly
    the recursion prefix-sum windows cannot express, which is why both
    forms are state machines. State: three exact integers per user —
    no fp drift over an unbounded stream; key-domain-bounded memory.
    """
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("credit_sec", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("credit", T.LongType()),
            T.StructField("prev_epoch", T.LongType()),
        ]
    )

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        credit, prev = state.get if state.exists else (cap_sec, -1)
        out: list[dict] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        for row in batch.sort_values(["ts", "event_id"]).itertuples(index=False):
            ep = int(row.ts.timestamp())
            credit = cap_sec if prev < 0 else min(cap_sec, credit + (ep - prev))
            if credit >= cost_sec:
                credit -= cost_sec
            else:
                out.append(
                    {
                        "user_id": key[0],
                        "event_id": row.event_id,
                        "ts": row.ts,
                        "credit_sec": credit,
                    }
                )
            prev = ep
        state.update((credit, prev))
        if out:
            yield pd.DataFrame(out)

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
