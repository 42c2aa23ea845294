"""Catalog failure-isolation: one table's physical-format surprise must
never take down queries that don't read it (the round-3 outage mode:
``events.parquet``'s encoding changed and 25 non-events queries died
inside ``register_views``).
"""

from __future__ import annotations

import os
import shutil

import pytest

from rag_application_with_vectordb_spark.plans.registry import load_all
from rag_application_with_vectordb_spark.sources.catalog import (
    TABLES,
    load_table,
    tables_in_sql,
)


@pytest.fixture(scope="module")
def broken_events_dir(sf_dir, tmp_path_factory):
    """A fixture dir identical to sf0.001 except events.parquet is garbage."""
    d = tmp_path_factory.mktemp("broken_events")
    for name in TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        if name == "events":
            (d / "events.parquet").write_bytes(b"this is not parquet")
        else:
            shutil.copy(src, d / f"{name}.parquet")
    return str(d)


def test_q1_survives_corrupted_events(spark, broken_events_dir):
    specs = load_all()
    rows = specs["q1_pricing_summary"].fn(spark, broken_events_dir).collect()
    assert len(rows) > 0


def test_events_query_still_fails_loudly(spark, broken_events_dir):
    specs = load_all()
    with pytest.raises(Exception):
        specs["scalar_json_events"].fn(spark, broken_events_dir).collect()


def test_tables_in_sql_scopes_correctly():
    assert tables_in_sql("SELECT * FROM lineitem JOIN orders ON 1=1") == [
        "orders",
        "lineitem",
    ]
    # column tokens must not false-positive table names
    assert tables_in_sql(
        "SELECT o_orderdate, l_partkey FROM lineitem PARTITION BY x"
    ) == ["lineitem"]
    assert "events" not in tables_in_sql("SELECT 1 FROM documents")


def test_load_table_normalizes_events_ts(spark, sf_dir):
    assert dict(load_table(spark, sf_dir, "events").dtypes)["ts"] == "timestamp"
