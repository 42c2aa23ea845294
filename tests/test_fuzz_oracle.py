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
