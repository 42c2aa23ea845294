"""The distributed two-level prefix sum (operators/prefix.py) must be
bit-identical to the global-window running sum it replaces — for any
bucket count, order direction, and tie structure — and must plan with
zero single-partition stages over the input relation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.operators.prefix import bucketed_running_sum
from rag_application_with_vectordb_spark.plans.plan_introspect import (
    single_partition_fact_exposures,
)
from rag_application_with_vectordb_spark.sources.catalog import load_table


def _rel(spark, n=10_000, tie_card=50):
    """(k, lead DECIMAL, v DECIMAL) with heavy ties on the leading key."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(tie_card))
            .cast("decimal(18,2)")
            .alias("lead"),
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000))
            .cast("decimal(18,2)")
            .alias("v"),
        )
    )


def _ref(df, desc):
    order = [F.desc("lead") if desc else F.asc("lead"), F.asc("k")]
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("cum_ref", F.sum("v").over(w))


@pytest.mark.parametrize("desc", [False, True])
@pytest.mark.parametrize("n_buckets", [1, 4, 64])
def test_matches_global_window(spark, desc, n_buckets):
    df = _rel(spark)
    got = bucketed_running_sum(
        df,
        value_col="v",
        lead_col="lead",
        tiebreak=[F.asc("k")],
        lead_desc=desc,
        n_buckets=n_buckets,
        out_col="cum",
        total_col="total",
    )
    j = got.join(_ref(df, desc).select("k", "cum_ref"), "k")
    assert j.filter(F.col("cum") != F.col("cum_ref")).count() == 0
    assert j.select(F.max("total")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_all_ties_single_bucket_degenerate(spark):
    df = _rel(spark, n=2_000).withColumn("lead", F.lit(5).cast("decimal(18,2)"))
    got = bucketed_running_sum(
        df, value_col="v", lead_col="lead", tiebreak=[F.asc("k")], n_buckets=8
    )
    j = got.join(_ref(df, desc=False).select("k", "cum_ref"), "k")
    assert j.filter(F.col("cum") != F.col("cum_ref")).count() == 0


def test_bigint_values_exact(spark):
    df = _rel(spark, n=5_000).withColumn("v", F.pmod(F.xxhash64("k"), F.lit(10**9)))
    got = bucketed_running_sum(
        df, value_col="v", lead_col="lead", tiebreak=[F.asc("k")], n_buckets=16
    )
    j = got.join(_ref(df, desc=False).select("k", "cum_ref"), "k")
    assert j.filter(F.col("cum") != F.col("cum_ref")).count() == 0


def test_scalable_global_chunk_index_matches_parity_mode(spark, sf_dir):
    # The chunker's reference-parity dense id (single-partition window,
    # row-ceiling guarded) and the prefix-count mode must agree row for
    # row — same ids, no ceiling, no single-partition stage.
    from rag_application_with_vectordb_spark.operators.chunker import (
        chunk_documents,
        global_chunk_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs)
    parity = global_chunk_index(chunks)
    scalable = global_chunk_index(chunks, scalable=True)
    # Dtype contract (ADVICE r9): scalable mode is BIGINT — an int cast
    # would silently wrap past 2^31-1 rows under non-ANSI Spark, exactly
    # the no-row-ceiling regime the mode exists for. Parity mode keeps
    # the reference-shaped INT (safe under its max_rows ceiling).
    from pyspark.sql.types import IntegerType, LongType

    assert isinstance(scalable.schema["global_id"].dataType, LongType)
    assert isinstance(parity.schema["global_id"].dataType, IntegerType)
    j = parity.select("doc_id", "chunk_id", F.col("global_id").alias("g1")).join(
        scalable.select("doc_id", "chunk_id", F.col("global_id").alias("g2")),
        ["doc_id", "chunk_id"],
    )
    assert j.filter(F.col("g1") != F.col("g2")).count() == 0
    assert single_partition_fact_exposures(scalable) == 0


def test_no_single_partition_stage_over_fact(spark, sf_dir):
    # The operator's reason to exist: on a fact-derived entity relation
    # the catalog's single-partition detector must see ZERO exposures
    # (the ≤ n_buckets offsets relation is checkpointed — bounded by
    # construction).
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.groupBy("doc_id").agg(
        F.sum(F.length("text")).cast("bigint").alias("v")
    )
    got = bucketed_running_sum(
        per_doc, value_col="v", lead_col="v", tiebreak=[F.asc("doc_id")], n_buckets=8
    )
    assert single_partition_fact_exposures(got) == 0
