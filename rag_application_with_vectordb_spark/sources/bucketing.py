"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
on the join key. Bucketing pays that shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions rows into a fixed number of files
per partition, and Catalyst then plans joins/aggregations on the bucket
key without an Exchange on either side (verified by the test suite via
plan inspection).

Deployment rules of thumb encoded here:
- bucket count is a *table property*; both join sides must use the same
  count (or a multiple) for the shuffle to be elided;
- pick n_buckets ≈ table_size / target_file_size, and keep it a power
  of two so downstream tables can use multiples;
- bucketed writes need a metastore table (``saveAsTable``), not a bare
  parquet path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally sort-within-bucket) managed
    table. Sorting within buckets additionally enables shuffle-AND-sort-
    free sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(int(n_buckets), key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
