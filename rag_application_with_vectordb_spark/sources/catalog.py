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

    ``events.ts`` has shipped under two physical encodings across fixture
    generations: TIMESTAMP(NANOS) (which Spark's reader rejects unless
    ``nanosAsLong`` maps it to BIGINT) and plain ``timestamp[us]``. We
    branch on the dtype the reader actually observes rather than
    hard-coding one generation's encoding — a loader that assumes a single
    physical layout of one column is a fleet-wide outage at 100 TB the
    day an upstream writer changes it. For the nanos path: integer
    floor-division (a double round-trip loses precision at 1.7e18), and
    *floor* to match DuckDB's ns→µs truncation.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type != "timestamp":
            # timestamp_ntz etc. — downstream operators (unix_micros, window
            # ranges) and the DuckDB oracle both assume plain TIMESTAMP;
            # with the session TZ pinned to UTC (session.py) the cast is
            # value-identical.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so SQL-form queries can run.

    View names intentionally match the DuckDB oracle's pre-registered view
    names, keeping Spark SQL and oracle SQL textually comparable.

    Failure isolation: when registering the default full set, a table whose
    physical file is unreadable is skipped — a query that never touches it
    must not die on its load (round 3 lost 25 unrelated queries to one
    table's encoding change). When the caller passes an explicit ``tables=``
    list it has declared a dependency, so failure propagates.
    """
    explicit = tables is not None
    for name in tables if explicit else TABLES:
        try:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        except Exception as exc:
            if explicit:
                raise
            # Surface the root cause now: a later TABLE_OR_VIEW_NOT_FOUND
            # on this view would otherwise hide the real decode/IO error.
            import logging

            logging.getLogger(__name__).warning(
                "skipping view %r (unreadable at %s): %s", name, sf_dir, exc
            )


def tables_in_sql(sql: str) -> list[str]:
    """Catalog tables referenced by a SQL text, by word-token scan.

    The fixture catalog is a closed set of ten names, none of which
    collides with a SQL keyword or column name, so a token match is exact.
    Lets SQL-form queries register only the views they read instead of
    eagerly loading all ten tables (both an isolation and a latency win —
    at 100 TB, touching a table you don't read is never free).
    """
    import re

    words = set(re.findall(r"[a-z_]+", sql.lower()))
    return [t for t in TABLES if t in words]
