"""Table catalog over the driver-generated parquet fixtures.

The reference's only "catalog" is one in-memory array
(``services/vectorDb.ts:5``). Here the engine reads a star schema of
parquet tables (TESTDATA.md): columnar scans give Catalyst predicate
pushdown + column pruning for free — check ``PushedFilters`` /
``ReadSchema`` in ``df.explain("formatted")``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain parquet scan — no caching here;
    callers decide lifetime (a 100 TB table must never be blanket-cached).

    ``events.ts`` is physically TIMESTAMP(NANOS) parquet, which Spark's
    reader rejects; we read it as a long (``nanosAsLong``) and floor-divide
    to microseconds — integer division, since a double round-trip loses
    precision at 1.7e18, and *floor* to match DuckDB's ns→µs truncation.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so SQL-form queries can run.

    View names intentionally match the DuckDB oracle's pre-registered view
    names, keeping Spark SQL and oracle SQL textually comparable.
    """
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
