"""Property-based cross-engine parity: hypothesis draws query
PARAMETERS (cutoffs, bands, frame sizes, k) and the same dialect-shared
SQL must produce identical results in Spark and DuckDB on the fixture.

The fixed catalog oracles pin one point per query shape; these fuzz the
neighborhood around those points — filter selectivity from 0% to 100%,
degenerate frames, k beyond group size — where off-by-one and
boundary-semantics bugs live. All arithmetic is exact-integer so
equality is exact, not approximate."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import SF_DIR

TABLES = ("lineitem", "part", "orders")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _spark_rows(spark, sql):
    for t in TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)
    return sorted(tuple(r) for r in spark.sql(sql).collect())


def _duck_rows(duck, sql):
    return sorted(tuple(r) for r in duck.execute(sql).fetchall())


FUZZ = settings(max_examples=8, deadline=None)


@given(
    year=st.integers(1993, 1999),
    dlo=st.integers(0, 8),
    dwidth=st.integers(0, 4),
    qcap=st.integers(0, 55),
)
@FUZZ
def test_filtered_revenue_agg_parity(spark, duck, year, dlo, dwidth, qcap):
    # q6-shaped filter+agg with fuzzed predicate box; revenue in exact
    # integer micro-units (cents * discount-hundredths)
    sql = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS rev_micro
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{year}-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '{year + 1}-01-01 00:00:00'
      AND l_discount >= {dlo / 100.0} AND l_discount <= {(dlo + dwidth) / 100.0}
      AND l_quantity < {qcap}
    """
    assert _spark_rows(spark, sql) == _duck_rows(duck, sql)


@given(k=st.integers(1, 8), mod=st.integers(2, 7))
@FUZZ
def test_topk_per_group_parity(spark, duck, k, mod):
    # top-k per brand by retail price with full tiebreaks, over a fuzzed
    # subset of parts (p_partkey % mod = 0) — k may exceed group size
    sql = f"""
    SELECT p_brand, p_partkey,
           CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part WHERE p_partkey % {mod} = 0
    ) t WHERE rn <= {k}
    """
    assert _spark_rows(spark, sql) == _duck_rows(duck, sql)


@given(frame=st.integers(0, 30), mod=st.integers(2, 9))
@FUZZ
def test_running_window_frame_parity(spark, duck, frame, mod):
    # trailing-N running spend per customer on a fuzzed order subset;
    # frame=0 degenerates to the current row alone
    sql = f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN {frame} PRECEDING AND CURRENT ROW) AS BIGINT)
             AS run_cents
    FROM orders WHERE o_orderkey % {mod} = 0
    """
    assert _spark_rows(spark, sql) == _duck_rows(duck, sql)


_LANGS = ("de", "en", "es", "fr", "zh")


@given(langs=st.sets(st.sampled_from(_LANGS), min_size=1, max_size=4))
@FUZZ
def test_ks_statistic_parity(spark, duck, langs):
    # exact two-sample KS with a fuzzed group split: any lang subset vs
    # the rest. The sup-difference and its argmax are exact
    # cross-multiplied integers, so equality is exact even though the
    # final statistic is a double.
    from rag_application_with_vectordb_spark.plans.stats_queries import _ks_sql

    inlist = ", ".join(f"'{l}'" for l in sorted(langs))
    sql = _ks_sql(f"lang IN ({inlist})")
    duck.execute(f"CREATE OR REPLACE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView("documents")
    assert sorted(tuple(r) for r in spark.sql(sql).collect()) == sorted(
        tuple(r) for r in duck.execute(sql).fetchall()
    )


@given(min_price=st.integers(0, 400000).map(lambda c: c / 100.0))
@FUZZ
def test_benford_cutoff_parity(spark, duck, min_price):
    # Benford digit histogram under a fuzzed price floor — exercises the
    # integer-to-string leading digit and the 1e-6 frequency grid at
    # every selectivity, including digits with zero observations (the
    # LEFT JOIN against the expected-mass table must keep all 9 rows)
    from rag_application_with_vectordb_spark.plans.stats_queries import _benford_sql

    duck.execute(f"CREATE OR REPLACE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView("orders")
    srows = spark.sql(_benford_sql("STRING", min_price)).collect()
    orows = duck.execute(_benford_sql("VARCHAR", min_price)).fetchall()
    assert sorted(tuple(r) for r in srows) == sorted(tuple(r) for r in orows)
    assert len(srows) == 9  # all digits present even at 100% selectivity loss


@given(
    alpha_pct=st.integers(1, 50),
    train_permille=st.integers(100, 900),
)
@FUZZ
def test_conformal_quantile_boundary_parity(spark, duck, alpha_pct, train_permille):
    # split-conformal order-statistic boundary: ceil((n+1)(1-alpha)) must
    # pick the same calibration residual in both engines for any alpha
    # and split ratio — the ceil/rank edge is where off-by-one bugs live.
    # (The catalog's Spark side is the checkpointed-API form; this fuzzes
    # the shared SQL template both dialects render from.)
    from rag_application_with_vectordb_spark.plans.stats_queries import (
        _conformal_sql,
        _spark_hex13,
    )
    from rag_application_with_vectordb_spark.plans.oracle_dialect import (
        duck_hex13_to_long,
    )

    alpha = alpha_pct / 100.0
    duck.execute(f"CREATE OR REPLACE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView("orders")
    ssql = _conformal_sql(_spark_hex13, "STRING", alpha, train_permille, mat="")
    dsql = _conformal_sql(duck_hex13_to_long, "VARCHAR", alpha, train_permille)
    assert sorted(tuple(r) for r in spark.sql(ssql).collect()) == sorted(
        tuple(r) for r in duck.execute(dsql).fetchall()
    )
