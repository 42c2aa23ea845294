"""Unit tests for the plan-shape detectors behind the catalog lints.

``single_partition_fact_exposures`` is itself load-bearing (the
catalog gate in test_registry_contract.py trusts it), so pin its
semantics on purpose-built plans over a REAL fact scan:

- a global ``Window.orderBy`` over fact rows IS an exposure;
- limit-to-k before the global window is NOT (the documented fix);
- a zero-grouping-key (scalar) aggregate bounds its subtree;
- a GROUPED aggregate does NOT bound (group count can be fact-scale);
- dimension-table funnels are out of scope (fact tables only).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.plans.plan_introspect import (
    effective_fact_scans,
    single_partition_fact_exposures,
)
from rag_application_with_vectordb_spark.sources.catalog import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_global_window_over_fact_is_exposed(spark, sf_dir):
    df = _docs(spark, sf_dir).withColumn(
        "rk", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert single_partition_fact_exposures(df) == 1


def test_limit_before_global_window_is_bounded(spark, sf_dir):
    df = (
        _docs(spark, sf_dir)
        .orderBy("doc_id")
        .limit(10)
        .withColumn("rk", F.row_number().over(Window.orderBy("doc_id")))
    )
    assert single_partition_fact_exposures(df) == 0


def test_scalar_aggregate_bounds_subtree(spark, sf_dir):
    # total := one row; a global window over a scalar agg is safe.
    total = _docs(spark, sf_dir).agg(F.count("*").alias("n"))
    df = total.withColumn("rk", F.row_number().over(Window.orderBy("n")))
    assert single_partition_fact_exposures(df) == 0


def test_grouped_aggregate_does_not_bound(spark, sf_dir):
    # group by doc_id keeps fact cardinality — the global window after
    # it is exactly the shape the lint exists for.
    per_doc = _docs(spark, sf_dir).groupBy("doc_id").agg(F.count("*").alias("n"))
    df = per_doc.withColumn("rk", F.row_number().over(Window.orderBy("n", "doc_id")))
    assert single_partition_fact_exposures(df) == 1


def test_dimension_funnel_out_of_scope(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    df = nation.withColumn("rk", F.row_number().over(Window.orderBy("n_nationkey")))
    assert single_partition_fact_exposures(df) == 0


def test_keyed_window_not_flagged(spark, sf_dir):
    w = Window.partitionBy("lang").orderBy("doc_id")
    df = _docs(spark, sf_dir).withColumn("rk", F.row_number().over(w))
    assert single_partition_fact_exposures(df) == 0


def test_effective_fact_scans_counts_cached_once(spark, sf_dir):
    base = _docs(spark, sf_dir).persist()
    try:
        base.count()
        df = base.select("doc_id").union(base.select("doc_id"))
        assert effective_fact_scans(df).get("documents", 0) == 1
    finally:
        base.unpersist()
