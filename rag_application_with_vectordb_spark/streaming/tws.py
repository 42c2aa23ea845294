"""Custom stateful streaming via Spark 4's ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (stateful.py): typed
state handles (value/list/map state), timers, and TTL, with state
checkpointed per key group. Used here for the operator class the
built-in window aggregates can't express: ORDER-SENSITIVE per-key state
machines.

:func:`high_water_marks` — per-user "new maximum" detector: emits a row
whenever a user's event ``value`` exceeds every prior value in their
stream (ties and lower values are absorbed silently). The batch twin is
``value > max(value) OVER (PARTITION BY user ORDER BY ts, id ROWS
UNBOUNDED PRECEDING EXCLUDE CURRENT ROW)`` — asserted equal in tests,
which is what makes the custom operator's semantics checkable.

Scale posture: state is one double per user (bounded by user
cardinality, not stream length); keys hash-partition across the state
store; no shuffle beyond the groupBy.

Runtime requirements: ``transformWithStateInPandas`` speaks protobuf to
the JVM state server — a real ``protobuf`` install or the repo-vendored
pure-Python runtime (``protobuf_compat.ensure_protobuf``) satisfies it;
check :func:`tws_available` first. Its typed state handles also need
the multi-column-family RocksDB state store
(``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``,
bundled with Spark 4 — the default HDFS-backed provider raises
UNSUPPORTED_FEATURE). :func:`.stateful.high_water_marks` is the same
operator on ``applyInPandasWithState`` with neither dependency.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle

__all__ = ["high_water_marks", "HighWaterMarkProcessor", "tws_available"]


def tws_available() -> bool:
    """True iff the typed-state API can actually run in this Python env
    (its state-server protocol needs google.protobuf — a real install,
    or the repo-vendored pure-Python runtime, see protobuf_compat)."""
    from ..protobuf_compat import ensure_protobuf

    if not ensure_protobuf():
        return False
    return importlib.util.find_spec("google.protobuf") is not None

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("hwm", T.DoubleType())])


class HighWaterMarkProcessor(StatefulProcessor):
    """Emit (user, event, ts, value) whenever value sets a new per-user
    maximum. Rows inside each micro-batch are processed in (ts, event_id)
    order so output is deterministic for a given batch composition."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._hwm = handle.getValueState("hwm", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        hwm = self._hwm.get()[0] if self._hwm.exists() else None
        out: list[dict] = []
        batch = pd.concat(list(rows), ignore_index=True)
        for row in batch.sort_values(["ts", "event_id"]).itertuples(index=False):
            v = float(row.value)
            if hwm is None or v > hwm:
                hwm = v
                out.append(
                    {"user_id": key[0], "event_id": row.event_id, "ts": row.ts, "value": v}
                )
        self._hwm.update((hwm,))
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def high_water_marks(events: DataFrame) -> DataFrame:
    """Attach the high-water-mark state machine to a (possibly streaming)
    events DataFrame with columns (user_id, event_id, ts, value)."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            HighWaterMarkProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
