"""Broadcast-variable + pandas-UDF pattern: a driver-side lookup table
shipped once per executor instead of re-pickled per task (the closure
pitfall called out in the PySpark guide)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rag_application_with_vectordb_spark.sources.catalog import load_table


def test_broadcast_lookup_in_pandas_udf(spark, sf_dir):
    nation_map = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    bc = spark.sparkContext.broadcast(nation_map)

    @F.pandas_udf(T.StringType())
    def nation_name(keys: pd.Series) -> pd.Series:
        lookup = bc.value  # one deserialization per executor, not per task
        return keys.map(lambda k: lookup.get(k, "UNKNOWN"))

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "nation_name", nation_name(F.col("c_nationkey"))
    )
    got = {r["c_custkey"]: r["nation_name"] for r in cust.limit(50).collect()}
    want = {
        r["c_custkey"]: nation_map[r["c_nationkey"]]
        for r in load_table(spark, sf_dir, "customer").limit(50).collect()
    }
    assert got == want
    bc.unpersist()
