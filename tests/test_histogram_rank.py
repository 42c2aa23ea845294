"""Histogram rank-select equivalence (the r10 rewrite family).

percentile_exact / winsorize / MAD / the percentile sketch select order
statistics from a DISTINCT-VALUE histogram cumulative instead of a
fact-scale rank window. The subtle part is duplicates: a value x with
count c owns the 1-based rank range [cum-c+1, cum], so "x at rank k" =
MIN x with inclusive cum >= k (0-based: cum >= k+1). Pin that
equivalence against the literal window form on data built to stress
ties — every boundary landing inside, at the start of, and at the end
of a duplicate run — so a future edit to the helpers can't silently
shift a rank by one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.plans.analytics import (
    _interp_median_from_hist,
)


def _tied(spark):
    # values engineered so medians/bounds fall on and around tie runs:
    # flag A: 1,1,1,2,2,3 (n=6, h=2.5 -> xlo=x@2=1, xhi=x@3=2, med=1.5)
    # flag B: 5,5,5,5 (n=4, h=1.5 -> both ranks inside the tie run -> 5.0)
    # flag C: 7 (n=1, h=0 -> med=7)
    rows = (
        [("A", 1.0)] * 3 + [("A", 2.0)] * 2 + [("A", 3.0)]
        + [("B", 5.0)] * 4
        + [("C", 7.0)]
    )
    return spark.createDataFrame(rows, "l_returnflag string, x double")


def test_interp_median_matches_window_form(spark):
    v = _tied(spark)
    ng = v.groupBy("l_returnflag").agg(F.count("*").cast("bigint").alias("n"))
    got = {
        r["l_returnflag"]: r["med"]
        for r in _interp_median_from_hist(v, ng, "med").collect()
    }
    # literal window rank-select (the oracle form)
    w = Window.partitionBy("l_returnflag").orderBy(F.asc("x"))
    r = v.select(
        "l_returnflag",
        "x",
        (F.row_number().over(w) - 1).alias("rn"),
        F.count("*").over(Window.partitionBy("l_returnflag")).alias("n"),
    ).withColumn("h", F.expr("0.5 * (n - 1)"))
    sel = (
        r.filter(
            (F.col("rn") >= F.expr("CAST(FLOOR(h) AS BIGINT)"))
            & (F.col("rn") <= F.expr("CAST(CEILING(h) AS BIGINT)"))
        )
        .groupBy("l_returnflag", "h")
        .agg(
            F.max(F.when(F.col("rn") == F.expr("CAST(FLOOR(h) AS BIGINT)"), F.col("x"))).alias("xlo"),
            F.max(F.when(F.col("rn") == F.expr("CAST(CEILING(h) AS BIGINT)"), F.col("x"))).alias("xhi"),
        )
        .select("l_returnflag", F.expr("xlo + (h - FLOOR(h)) * (xhi - xlo)").alias("med"))
    )
    want = {r["l_returnflag"]: r["med"] for r in sel.collect()}
    assert got == want == {"A": 1.5, "B": 5.0, "C": 7.0}


@pytest.mark.parametrize("k,expect", [(1, 1.0), (3, 1.0), (4, 2.0), (5, 2.0), (6, 3.0)])
def test_nearest_rank_min_cum_rule_on_ties(spark, k, expect):
    # x at 1-based rank k == MIN x with inclusive cum >= k, for every
    # position relative to the 1,1,1,2,2,3 tie runs
    v = _tied(spark).filter(F.col("l_returnflag") == "A")
    hist = v.groupBy("x").agg(F.count("*").cast("bigint").alias("c"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy(F.asc("x")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    got = cum.filter(F.col("cum") >= k).agg(F.min("x")).first()[0]
    assert got == expect


def test_median_helper_is_partition_count_invariant(spark):
    v = _tied(spark)
    ng = v.groupBy("l_returnflag").agg(F.count("*").cast("bigint").alias("n"))
    one = _interp_median_from_hist(v.repartition(1), ng, "med").collect()
    many = _interp_median_from_hist(v.repartition(7, "x"), ng, "med").collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
