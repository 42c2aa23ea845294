"""Bucketed-join tests: the written claim is "no Exchange on either
side" — asserted on the physical plan, plus result equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.sources.bucketing import read_bucketed, write_bucketed
from rag_application_with_vectordb_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=4, sort_by="o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        n_buckets=4,
        sort_by="o_orderkey",
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # Force the shuffle-join regime (at fixture scale Catalyst would just
    # broadcast the 1.5k-row table, which hides what bucketing elides —
    # at 100 TB neither side is broadcastable).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, ot).join(read_bucketed(spark, lt), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed scan on both sides → no shuffle Exchange anywhere
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_results_match_plain(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = (
        read_bucketed(spark, ot)
        .join(read_bucketed(spark, lt), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert {tuple(r) for r in bucketed.collect()} == {tuple(r) for r in plain.collect()}
