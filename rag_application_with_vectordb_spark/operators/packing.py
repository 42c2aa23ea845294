"""Sequence packing + deterministic shuffle for LLM training pipelines.

Training jobs consume documents as fixed-length token sequences: the
corpus is (deterministically) shuffled, concatenated, and sliced every
``budget`` tokens. The engine's job is to assign each document its
**start offset** in that concatenation — the slicer downstream is then
trivial arithmetic. Extends the reference's ingest surface
(``App.tsx:101-160`` chunks one PDF serially); here the same
order-then-offset idea is re-expressed for a sharded corpus.

Scale design: a single global running sum would funnel the corpus
through one window partition. Instead the corpus is split into
``shards`` deterministic hash shards (shard count ∝ cluster size; each
shard is an independent training stream, which is exactly how
multi-host data loaders consume data). The running token sum is a
window partitioned by shard — ``shards``-way parallel, one shuffle,
no driver state. Within a shard, order is a keyed md5 of the doc id:
a reproducible shuffle (stable under re-runs and repartitioning,
unlike ``rand()``), which doubles as the "deterministic shuffle"
stage of the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hex13_to_long

__all__ = ["shuffle_key", "pack_sequences"]

#: Sequences per shard are namespaced in blocks of 1M so ``seq_id`` is
#: globally unique without a second pass.
_SEQ_BLOCK = 1_000_000


def shuffle_key(key: Column, seed: str = "ord42") -> Column:
    """Deterministic shuffle order: md5 of the seeded key. Hex strings
    compare identically in Spark and DuckDB (ASCII), so the order is
    oracle-checkable; distinct keys give distinct digests."""
    return F.md5(F.concat(F.lit(seed + "|"), key.cast("string")))


def pack_sequences(
    docs: DataFrame,
    budget: int,
    shards: int = 32,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    seed: str = "pack42",
) -> DataFrame:
    """Assign every document a shard, a deterministic position, and a
    start offset in its shard's token concatenation; derive the training
    sequence id (``budget``-token slices) and the offset within it.

    Documents straddling a slice boundary are split by the downstream
    slicer (standard concat-then-slice packing); the assignment here is
    exact and reproducible, so any worker can slice its shard
    independently.
    """
    shard = (
        hex13_to_long(F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))))
        % shards
    ).alias("shard")
    okey = shuffle_key(F.col(id_col)).alias("okey")
    t = docs.select(F.col(id_col), F.col(token_col), shard, okey)
    w = (
        Window.partitionBy("shard")
        .orderBy("okey", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return (
        t.withColumn("start_offset", start)
        .select(
            id_col,
            F.col("shard").cast("long").alias("shard"),
            F.col(token_col).cast("long").alias(token_col),
            "start_offset",
            (F.col("shard") * _SEQ_BLOCK + F.floor(F.col("start_offset") / budget))
            .cast("long")
            .alias("seq_id"),
            (F.col("start_offset") % budget).cast("long").alias("seq_offset"),
        )
    )
