"""Sharded training-data export — the artifact a trainer actually reads.

The catalog already has every stage of the pre-training data pipeline
(curation → tokenization → packing) as oracle-checked queries; this
module adds the FINAL stage: materialize the packed corpus as N
deterministic shards plus a manifest (per-shard rows, sequences,
tokens, content checksum) that a multi-host data loader consumes — each
training host reads exactly ``its`` shard files and verifies them
against the manifest before the first step. Extends the reference's
ingest surface (``App.tsx:101-160`` chunks one PDF into an in-memory
array) to a durable, resumable, verifiable corpus artifact.

Scale design:
- Shard assignment is the packer's deterministic hash shard
  (``operators.packing.pack_sequences``) — stateless, reproducible,
  no global coordination; shard count ∝ training-host count.
- The write is ``repartition(shard) → partitionBy(shard)``: one
  shuffle, one file per shard directory (trainers want few big files),
  no driver-side data movement.
- The manifest is a per-shard aggregate of exact-integer per-row
  checksums — order-insensitive (a SUM), so it is invariant to task
  scheduling and file order, and cheap to re-verify after any
  re-materialization. All integer arithmetic, hence bit-reproducible in
  DuckDB (``plans.pipeline_ops.export_manifest`` is the oracle-checked
  twin of :func:`shard_manifest` over the composed pipeline).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, token_count, tokens
from .packing import pack_sequences

__all__ = [
    "curate_tokenize_pack",
    "shard_manifest",
    "export_training_shards",
    "read_training_shards",
]

#: Per-row checksum modulus — prime, small enough that a per-shard SUM
#: stays exact in int64 up to ~9e9 rows per shard.
_CKSUM_MOD = 1_000_000_007


def curate_tokenize_pack(
    docs: DataFrame,
    budget: int = 512,
    shards: int = 32,
    vocab_size: int = 256,
    min_tokens: int = 8,
) -> DataFrame:
    """The composed export pipeline: quality gate → exact-dedup
    keep-canonical → token-id encoding (deterministic top-``vocab_size``
    frequency vocab, OOV=0) → deterministic shuffle + ``budget``-token
    sequence packing. One row per surviving document:

    ``doc_id, shard, n_tokens, start_offset, seq_id, seq_offset,
    token_ids, doc_checksum``

    ``doc_checksum = sum(token_id[pos] * pos) mod 1e9+7`` — an exact
    integer digest of the doc's token CONTENT AND ORDER, used by the
    manifest. Every stage is the same relation the standalone catalog
    queries check (``curation_funnel`` stages 1-2, ``text_tokenize_ids``,
    ``pack_sequences_512``).
    """
    tok = docs.select(
        "doc_id", "text", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    s1 = tok.filter(F.col("n_tokens") >= min_tokens)
    fp = s1.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))
    canon = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    s2 = s1.join(canon.select("doc_id"), "doc_id")

    posting = s2.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    freq = posting.groupBy("word").agg(F.count("*").alias("n"))
    top = freq.orderBy(F.desc("n"), F.asc("word")).limit(int(vocab_size))
    vocab = top.select(
        "word",
        F.row_number()
        .over(Window.orderBy(F.desc("n"), F.asc("word")))
        .cast("int")
        .alias("id"),
    )
    enc = posting.join(F.broadcast(vocab), "word", "left").select(
        "doc_id", "pos", F.coalesce(F.col("id"), F.lit(0)).alias("tid")
    )
    perdoc = enc.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s.getField("tid"),
        ).alias("token_ids"),
        F.pmod(
            F.sum(F.col("tid").cast("bigint") * F.col("pos").cast("bigint")),
            F.lit(_CKSUM_MOD),
        )
        .cast("bigint")
        .alias("doc_checksum"),
    )
    packed = pack_sequences(
        perdoc.select("doc_id", "n_tokens"), budget=budget, shards=shards
    )
    return packed.join(
        perdoc.select("doc_id", "token_ids", "doc_checksum"), "doc_id"
    ).select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_offset",
        "seq_id",
        "seq_offset",
        "token_ids",
        "doc_checksum",
    )


def shard_manifest(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Per-shard manifest over :func:`curate_tokenize_pack` output:

    ``shard, n_docs, n_seqs, n_tokens, checksum``

    - ``n_seqs``: ``ceil(shard tokens / budget)`` — the number of
      ``budget``-token training sequences the shard slices into.
    - ``checksum``: order-insensitive SUM over docs of
      ``(doc_checksum*31 + start_offset*7 + n_tokens) mod 1e9+7`` —
      covers token content, token order, in-shard placement, and doc
      length, so ANY corruption or reordering of a re-materialized
      shard changes it. Exact integers end to end (DuckDB-reproduced).
    """
    line = F.pmod(
        F.col("doc_checksum") * 31 + F.col("start_offset") * 7 + F.col("n_tokens"),
        F.lit(_CKSUM_MOD),
    )
    return (
        packed.groupBy(F.col("shard"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum(line).cast("bigint").alias("checksum"),
        )
        # integer ceil-div (never float: stays exact past 2^52 tokens)
        .withColumn(
            "n_seqs", F.expr(f"(n_tokens + {int(budget) - 1}) div {int(budget)}")
        )
        .select("shard", "n_docs", "n_seqs", "n_tokens", "checksum")
    )


def export_training_shards(
    packed: DataFrame, out_dir: str, budget: int = 512
) -> DataFrame:
    """Materialize the packed corpus: ``out_dir/data/shard=N/`` (one
    parquet file per shard) + ``out_dir/manifest.parquet``. Returns the
    manifest DataFrame (read back from the written artifact, so what
    you get is what a trainer will see)."""
    spark = packed.sparkSession
    data_dir = os.path.join(out_dir, "data")
    (
        packed.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(data_dir)
    )
    # Manifest is computed FROM THE WRITTEN FILES — it certifies the
    # artifact on disk, not the plan that produced it.
    written = spark.read.parquet(data_dir)
    shard_manifest(written, budget=budget).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "manifest.parquet")
    )
    return spark.read.parquet(os.path.join(out_dir, "manifest.parquet"))


def read_training_shards(
    spark: SparkSession, out_dir: str, verify: bool = True, budget: int = 512
) -> DataFrame:
    """Load an exported corpus; with ``verify=True`` recompute the
    manifest from the data files and raise if ANY shard's row differs —
    the pre-flight a training job runs before step 0."""
    data = spark.read.parquet(os.path.join(out_dir, "data"))
    if verify:
        want = {
            r["shard"]: (r["n_docs"], r["n_seqs"], r["n_tokens"], r["checksum"])
            for r in spark.read.parquet(os.path.join(out_dir, "manifest.parquet")).collect()
        }
        got = {
            r["shard"]: (r["n_docs"], r["n_seqs"], r["n_tokens"], r["checksum"])
            for r in shard_manifest(data, budget=budget).collect()
        }
        if got != want:
            bad = sorted(
                set(want) ^ set(got)
                | {s for s in set(want) & set(got) if want[s] != got[s]}
            )
            raise ValueError(f"manifest mismatch for shards {bad}")
    return data
