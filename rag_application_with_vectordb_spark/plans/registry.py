"""Query registry: name → (Spark callable, DuckDB oracle SQL | None).

This is the contract surface the driver checks (``__spark_entry__.py``):
every registered query runs as ``fn(spark, sf_dir) -> DataFrame`` and,
when an oracle is present, must hash-match the oracle SQL run by DuckDB
over the same parquet tables. Column names are part of the contract —
alias identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(name, fn, oracle, doc, tags)
        return fn

    return deco


_loaded = False


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module exactly once; return the full catalog."""
    global _loaded
    if not _loaded:
        from . import rag_queries  # noqa: F401
        from . import relational  # noqa: F401
        from . import textops  # noqa: F401
        from . import dedup_queries  # noqa: F401
        from . import streaming_twins  # noqa: F401
        from . import ann_queries  # noqa: F401
        from . import relational2  # noqa: F401
        from . import relational3  # noqa: F401
        from . import analytics  # noqa: F401

        _loaded = True
    return QUERIES
