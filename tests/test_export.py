"""Sharded training-data export (VERDICT r6 gap #4): the packed corpus
materializes to N shard files + a manifest, re-reads byte-identically,
and the manifest verification catches corruption/reordering."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.operators.export import (
    curate_tokenize_pack,
    export_training_shards,
    read_training_shards,
    shard_manifest,
)
from rag_application_with_vectordb_spark.sources.catalog import load_table

SHARDS = 8


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return curate_tokenize_pack(docs, budget=512, shards=SHARDS).persist()


def rowset(df):
    return {
        (
            r["doc_id"], r["shard"], r["n_tokens"], r["start_offset"],
            r["seq_id"], r["seq_offset"], tuple(r["token_ids"]), r["doc_checksum"],
        )
        for r in df.collect()
    }


def test_export_roundtrip_exact(spark, packed, tmp_path):
    out = str(tmp_path / "corpus")
    manifest = export_training_shards(packed, out)
    m = {r["shard"]: r for r in manifest.collect()}
    assert set(m) == set(range(SHARDS))  # every shard non-empty on the fixture

    # one data file per shard — trainers want few big files
    for s in range(SHARDS):
        files = [
            f
            for f in os.listdir(os.path.join(out, "data", f"shard={s}"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (s, files)

    # re-reading the shards reproduces the packed rows EXACTLY
    back = read_training_shards(spark, out)  # verify=True recomputes manifest
    assert rowset(back) == rowset(packed)

    # manifest totals agree with the source relation
    totals = packed.agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("toks")
    ).first()
    assert sum(r["n_docs"] for r in m.values()) == totals["docs"]
    assert sum(r["n_tokens"] for r in m.values()) == totals["toks"]
    for r in m.values():  # n_seqs = ceil(tokens/512), per shard
        assert r["n_seqs"] == (r["n_tokens"] + 511) // 512

    # independently recomputed manifest matches the written one
    want = {r["shard"]: (r["n_docs"], r["n_seqs"], r["n_tokens"], r["checksum"])
            for r in shard_manifest(back).collect()}
    got = {s: (r["n_docs"], r["n_seqs"], r["n_tokens"], r["checksum"])
           for s, r in m.items()}
    assert got == want


def test_export_verification_catches_corruption(spark, packed, tmp_path):
    out = str(tmp_path / "corpus")
    export_training_shards(packed, out)
    # corrupt one shard: drop its newest data file
    victim = os.path.join(out, "data", "shard=3")
    fname = next(f for f in os.listdir(victim) if f.endswith(".parquet"))
    os.remove(os.path.join(victim, fname))
    with pytest.raises(ValueError, match=r"manifest mismatch.*3"):
        read_training_shards(spark, out)
    # unverified read still loads what's left (operator choice, explicit)
    assert read_training_shards(spark, out, verify=False).count() > 0


def test_checksum_covers_placement_not_just_content(spark, packed):
    # Swapping two docs' start offsets (same docs, same tokens) must
    # change the manifest checksum: placement is part of the artifact.
    perturbed = packed.withColumn(
        "start_offset",
        F.when(F.col("start_offset") == 0, F.lit(1)).otherwise(F.col("start_offset")),
    )
    base = {r["shard"]: r["checksum"] for r in shard_manifest(packed).collect()}
    pert = {r["shard"]: r["checksum"] for r in shard_manifest(perturbed).collect()}
    assert base != pert
