"""Streaming state maintenance: CDC apply and incremental aggregate
refresh driven by ``foreachBatch``.

Both maintain a parquet "state" directory the way the incremental IVF
index is maintained (``operators/ann.ivf_append`` / ``ivf_compact``):
each micro-batch reads the current state, merges the batch in with the
batch operators (``operators/cdc.apply_changes`` / partial-agg merge),
and swaps the new state in atomically. No Delta/Iceberg needed; the
swap + crash recovery mirror ``ivf_compact``/``ivf_recover``.

Scale posture: the per-batch cost is O(state + batch) for the CDC
apply (one anti-join + union, co-partitioned on the key) and
O(|groups| + batch) for the aggregate refresh (the state IS the
aggregate — merging partials never rescans history). A 100 TB
deployment would hash-partition the state directory by key so each
micro-batch rewrites only the buckets it touches.

Equivalence proofs (tests/test_streaming_maintenance.py):
- applying a change stream in ANY micro-batch split reproduces
  ``apply_changes`` over the whole change set == snapshot v2;
- streaming aggregate refresh over file-split orders ends bit-equal to
  the oracle-checked ``incremental_agg_merge`` catalog query.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import apply_changes

__all__ = [
    "state_recover",
    "stream_apply_cdc",
    "stream_incremental_agg",
    "merge_agg_partials",
]


def state_recover(state_path: str) -> bool:
    """Heal a crashed state swap (same contract as ``ann.ivf_recover``):
    if the live directory is missing but a ``.old*`` backup exists,
    restore it; clear debris. Returns True if a restore happened."""
    restored = False
    backups = sorted(glob.glob(state_path + ".old*"))
    if not os.path.exists(state_path) and backups:
        os.rename(backups[0], state_path)
        backups = backups[1:]
        restored = True
    for p in backups + sorted(glob.glob(state_path + ".next*")):
        shutil.rmtree(p, ignore_errors=True)
    return restored


def _swap_state(new_state: DataFrame, state_path: str) -> None:
    """Materialize ``new_state`` and atomically swap it into
    ``state_path`` (write-new → rename-old-away → rename-new-in)."""
    tmp = state_path + f".next{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    new_state.write.mode("overwrite").parquet(tmp)
    bak = None
    if os.path.exists(state_path):
        bak = state_path + f".old{os.getpid()}"
        os.rename(state_path, bak)
    try:
        os.rename(tmp, state_path)
    except OSError:
        if bak:
            os.rename(bak, state_path)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    if bak:
        shutil.rmtree(bak, ignore_errors=True)


def stream_apply_cdc(
    changes_stream: DataFrame,
    state_path: str,
    key: str,
    payload: list[str],
    checkpoint: str | None = None,
):
    """Maintain a snapshot at ``state_path`` from a stream of
    ``snapshot_diff``-shaped change rows (I/D/U + new payload).

    Each micro-batch applies ``operators.cdc.apply_changes`` to the
    current state. An at-least-once feed replaying a batch is
    harmless: applying the same I/D/U rows twice is idempotent (the
    anti-join removes the key either way; the upsert re-inserts the
    same payload). Duplicate keys WITHIN one batch are malformed input
    (a snapshot diff never produces them) and are deduped on the key
    so the apply stays well-defined.
    """
    spark = changes_stream.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        state_recover(state_path)
        batch = batch_df.dropDuplicates([key])
        if os.path.exists(state_path):
            base = spark.read.parquet(state_path).select(key, *payload)
        else:
            base = spark.createDataFrame(
                [], batch_df.select(key, *payload).schema
            )
        nxt = apply_changes(base, batch, key, payload)
        _swap_state(nxt, state_path)

    writer = changes_stream.writeStream.foreachBatch(apply_batch).trigger(
        availableNow=True
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def merge_agg_partials(state: DataFrame, delta: DataFrame, group: str, measures: list[str]) -> DataFrame:
    """Merge two partial-aggregate relations (same ``group`` key and
    additive BIGINT ``measures``) — the mergeability that makes
    incremental view maintenance equal the full recompute."""
    zero = F.lit(0).cast("bigint")
    s = state.select(group, *[F.col(m).alias(f"s_{m}") for m in measures])
    d = delta.select(group, *[F.col(m).alias(f"d_{m}") for m in measures])
    return s.join(d, group, "full_outer").select(
        group,
        *[
            (F.coalesce(F.col(f"s_{m}"), zero) + F.coalesce(F.col(f"d_{m}"), zero)).alias(m)
            for m in measures
        ],
    )


def stream_incremental_agg(
    orders_stream: DataFrame,
    state_path: str,
    checkpoint: str | None = None,
):
    """Maintain the monthly revenue rollup (the state of the
    oracle-checked ``incremental_agg_merge`` query) from an orders
    stream: each micro-batch computes its partial aggregate and merges
    it into the state — O(batch), never a history rescan."""
    spark = orders_stream.sparkSession

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        state_recover(state_path)
        delta = batch_df.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
        ).agg(
            F.count("*").cast("bigint").alias("order_cnt"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        if os.path.exists(state_path):
            state = spark.read.parquet(state_path)
        else:
            state = spark.createDataFrame([], delta.schema)
        _swap_state(
            merge_agg_partials(state, delta, "month", ["order_cnt", "revenue_cents"]),
            state_path,
        )

    writer = orders_stream.writeStream.foreachBatch(refresh).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
