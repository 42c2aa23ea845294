"""Registry/driver-contract hygiene — no Spark session needed.

Two guards born from the round-1 postmortem:

1. The driver's correctness gate checks only the FIRST 50 registry
   entries, so the window ordering IS contract surface — pin it.
2. The only driver-red rows in round 1 were uncast integer SUMs whose
   DuckDB result type (HUGEINT) coerces to float64 through pandas while
   Spark emits int64. DESCRIBE-ing every oracle against DuckDB catches
   that whole bug class in milliseconds, before any driver run.
"""

from __future__ import annotations

import duckdb
import pytest

from rag_application_with_vectordb_spark.plans.registry import (
    DRIVER_WINDOW_PRIORITY,
    load_all,
)
from rag_application_with_vectordb_spark.sources.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"


def test_driver_window_is_exactly_the_priority_list():
    specs = load_all()
    assert len(DRIVER_WINDOW_PRIORITY) == 50
    assert len(set(DRIVER_WINDOW_PRIORITY)) == 50
    missing = [n for n in DRIVER_WINDOW_PRIORITY if n not in specs]
    assert not missing, f"priority names not registered: {missing}"
    assert list(specs)[:50] == list(DRIVER_WINDOW_PRIORITY)


def test_no_oracle_outputs_pandas_lossy_types():
    # HUGEINT/UHUGEINT/DECIMAL outputs become float64 through the
    # driver's pandas comparator while Spark emits exact types — any
    # such column is a latent value-hash mismatch. Every oracle must
    # cast its output columns (BIGINT / DOUBLE) explicitly.
    specs = load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    offenders: list[str] = []
    for name, spec in specs.items():
        if not spec.oracle:
            continue
        try:
            desc = con.execute(f"DESCRIBE ({spec.oracle})").fetchall()
        except Exception as exc:  # pragma: no cover - oracle must at least parse
            pytest.fail(f"{name}: DESCRIBE failed: {exc}")
        bad = [
            (r[0], r[1])
            for r in desc
            if r[1] in ("HUGEINT", "UHUGEINT") or r[1].startswith("DECIMAL")
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, "uncast lossy-typed oracle outputs:\n" + "\n".join(offenders)


def test_no_oracle_outputs_nested_types():
    # The driver's canonicalizer lexsorts every output column through
    # pandas sort_values; list/struct/map cells are unhashable there and
    # crash the comparison (the r07 text_tokenize_ids red row). Ban
    # nested types at the oracle output surface.
    specs = load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    offenders: list[str] = []
    for name, spec in specs.items():
        if not spec.oracle:
            continue
        desc = con.execute(f"DESCRIBE ({spec.oracle})").fetchall()
        bad = [
            (r[0], r[1])
            for r in desc
            if "[]" in r[1] or r[1].startswith(("STRUCT", "MAP", "LIST", "UNION"))
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, "nested-typed oracle outputs:\n" + "\n".join(offenders)


def test_no_spark_outputs_nested_types(spark, sf_dir):
    # The Spark twin of the lint above: build EVERY registered plan at
    # sf0.001 and assert its output schema carries no top-level
    # array/map/struct column. This catches the half the DuckDB DESCRIBE
    # can't see — a Spark array column whose oracle already projects a
    # scalar would pass the oracle lint yet still crash the driver.
    from pyspark.sql.types import ArrayType, MapType, StructType

    specs = load_all()
    offenders: list[str] = []
    for name, spec in specs.items():
        df = spec.fn(spark, sf_dir)
        bad = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, "nested-typed Spark outputs:\n" + "\n".join(offenders)


def test_driver_window_queries_nonempty(spark, sf_dir):
    # A green driver row with 0 rows on both sides is vacuous — it stays
    # green when the operator breaks (the r7 audit_duplicate_payments
    # finding; that query now plants its positives in-query). Every
    # window slot must PROVE something: nonempty output at the smallest
    # fixture. limit(1) keeps the probe cheap — existence, not counts.
    specs = load_all()
    empty = [
        n
        for n in DRIVER_WINDOW_PRIORITY
        if specs[n].fn(spark, sf_dir).limit(1).count() == 0
    ]
    assert not empty, f"vacuous window queries (0 rows at sf0.001): {empty}"


def test_no_cartesian_product_in_any_plan(spark, sf_dir):
    # A query can be value-correct with a quadratic physical plan: the
    # r8 geo_radius_pairs finding — its VALUES-offset cell join let
    # Catalyst's join reorder connect the two point relations through
    # the distance predicate and plan a CartesianProduct over all pairs
    # (invisible at sf0.01, ~2 h at sf10). No value gate can see this
    # class, so pin it mechanically: no registered query's physical plan
    # may contain a CartesianProduct. (BroadcastNestedLoopJoin stays
    # allowed — the catalog uses it deliberately for 1-row stat
    # relations and bounded query sides, which are O(n).)
    specs = load_all()
    offenders = []
    for name, spec in specs.items():
        plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian-product plans: {offenders}"
