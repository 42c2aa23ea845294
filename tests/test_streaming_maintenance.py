"""Streaming CDC apply + incremental aggregate maintenance
(streaming/maintenance.py, operators/cdc.py): stream == batch, any
micro-batch split, plus crash recovery of the state swap."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.operators.cdc import (
    apply_changes,
    snapshot_diff,
)
from rag_application_with_vectordb_spark.plans.registry import load_all
from rag_application_with_vectordb_spark.sources.catalog import load_table
from rag_application_with_vectordb_spark.streaming.maintenance import (
    state_recover,
    stream_apply_cdc,
    stream_incremental_agg,
)

PAYLOAD = ["o_orderstatus", "o_orderpriority", "price_cents"]


def _snapshots(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    v1 = orders.filter(
        F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", cents.alias("price_cents"))
    bump = F.when(F.col("o_orderkey") % 13 == 0, F.lit(500)).otherwise(F.lit(0))
    v2 = (
        orders.filter(
            F.col("o_orderdate") < F.lit("2001-01-01 00:00:00").cast("timestamp")
        )
        .filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            (cents + bump).alias("price_cents"),
        )
    )
    return v1, v2


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cdc_roundtrip_law(spark, sf_dir):
    v1, v2 = _snapshots(spark, sf_dir)
    changes = snapshot_diff(v1, v2, "o_orderkey", PAYLOAD)
    assert _rows(apply_changes(v1, changes, "o_orderkey", PAYLOAD)) == _rows(v2)


def test_cdc_diff_detects_null_transitions(spark):
    v1 = spark.createDataFrame([(1, None), (2, "a"), (3, "x")], "k int, p string")
    v2 = spark.createDataFrame([(1, "b"), (2, None), (3, "x")], "k int, p string")
    ch = {r.k: r.change_type for r in snapshot_diff(v1, v2, "k", ["p"]).collect()}
    assert ch == {1: "U", 2: "U"}  # null->value and value->null both count; 3 unchanged


def test_stream_apply_cdc_any_split_converges(spark, sf_dir, tmp_path):
    v1, v2 = _snapshots(spark, sf_dir)
    changes = snapshot_diff(v1, v2, "o_orderkey", PAYLOAD)
    # split the change feed into 3 files -> 3 micro-batches
    feed = str(tmp_path / "feed")
    changes.withColumn("__b", F.col("o_orderkey") % 3).repartition(3, "__b").drop(
        "__b"
    ).write.parquet(feed)
    state = str(tmp_path / "state")
    v1.write.parquet(state)  # state starts at v1
    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = stream_apply_cdc(
        stream, state, "o_orderkey", PAYLOAD, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert _rows(spark.read.parquet(state)) == _rows(v2)


def test_stream_incremental_agg_matches_batch_query(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    feed = str(tmp_path / "orders_feed")
    orders.withColumn("__b", F.col("o_orderkey") % 4).repartition(4, "__b").drop(
        "__b"
    ).write.parquet(feed)
    state = str(tmp_path / "aggstate")
    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = stream_incremental_agg(stream, state, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()
    expect = load_all()["incremental_agg_merge"].fn(spark, sf_dir)
    assert _rows(spark.read.parquet(state)) == _rows(expect)


def test_state_recover_restores_stranded_state(spark, tmp_path):
    state = str(tmp_path / "st")
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    df.write.parquet(state)
    # simulate a crash mid-swap: live dir renamed away, .next debris left
    os.rename(state, state + ".old123")
    spark.createDataFrame([(9, 9)], "a int, b int").write.parquet(state + ".next123")
    assert state_recover(state) is True
    assert os.path.exists(state)
    assert not os.path.exists(state + ".old123")
    assert not os.path.exists(state + ".next123")
    assert _rows(spark.read.parquet(state)) == [(1, 2)]
