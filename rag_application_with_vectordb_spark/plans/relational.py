"""Relational extension surface (SURVEY.md §2.6): joins, aggregates,
rollup/cube, windows + frames, set ops, subqueries, scalar functions.

The reference has none of these (its only join is the implicit KNN
nested loop) — this module is the engine's §2.6 extension catalog, every
entry driver-checkable against DuckDB.

Cross-engine determinism: every SUM over a double money column goes
through DECIMAL (exact, associative — immune to partitioning order);
see ``oracle_dialect``. Integer aggregates are exact everywhere.

Scale notes baked into the plans:
- dimension tables (region/nation/supplier) joined via ``broadcast()``
  — no shuffle of the fact table;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  AQE coalesces/skew-splits at runtime;
- windows partition by a real key (custkey/brand/nation), never a
  global ORDER BY window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import load_table, register_views, tables_in_sql
from .registry import register

_D = "DECIMAL(18,2)"


def _sql_query(name: str, sql: str, doc: str = "", oracle: str | None = None, tags=("relational",)):
    """Register a query whose Spark form and DuckDB oracle share one SQL
    text (dialect-neutral ANSI) — Catalyst and DuckDB must agree on it."""

    @register(name, oracle=oracle or sql, doc=doc, tags=tags)
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, tables_in_sql(_sql))
        return spark.sql(_sql)

    return fn


# --- TPC-H-style aggregation -------------------------------------------------

# CAST(DECIMAL AS DOUBLE) is NOT ulp-reproducible across engines once
# the unscaled value exceeds 2^53 (~9e15): Spark correctly-rounds the
# exact BigDecimal, DuckDB double-rounds through the scaled int128 —
# found r11 when q1's sum_charge (scale 6, unscaled 2.7e16 at sf1.0)
# drifted one ulp while the DECIMAL sums themselves were bit-identical.
# The portable conversion: land the exact decimal on integer
# micro-units (integral-valued, so the BIGINT cast is exact in both
# engines regardless of their rounding modes), then rebuild the double
# as int_part + frac_part/10^s — every step is a correctly-rounded op
# on identical exact inputs, hence bit-identical. ALL FIVE decimal
# sums go through the split (r11 converted only sdp/sc; the r11 ADVICE
# flagged sbp's own ~sf800 threshold at scale 2 — closed here by
# converting the class, and the avg_* numerators reuse the split
# doubles so no direct decimal→double cast remains). Bounds: the
# scaled integers fit BIGINT to ~9.2e18 (sf ~3e4 for sc_e6, the
# tightest; ~2e7 for the e2 columns), int part exact in double to
# 2^53 (sf ~3e5). Spark spells integer division DIV, DuckDB // — the
# ONLY divergence between the two texts below.
def _q1_sql(idiv: str) -> str:
    def split(col: str, e: int) -> str:
        p = 10**e
        return f"CAST({col} {idiv} {p} AS DOUBLE) + CAST({col} % {p} AS DOUBLE) / {p}.0"

    return f"""
    WITH agg AS (
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS {_D})) * 100 AS BIGINT) AS sq_e2,
        CAST(SUM(CAST(l_extendedprice AS {_D})) * 100 AS BIGINT) AS sbp_e2,
        CAST(SUM(CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D}))) * 10000 AS BIGINT) AS sdp_e4,
        CAST(SUM(CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D})) * (1 + CAST(l_tax AS {_D}))) * 1000000 AS BIGINT) AS sc_e6,
        CAST(SUM(CAST(l_discount AS {_D})) * 100 AS BIGINT) AS sd_e2,
        COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate <= DATE '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
    ),
    conv AS (
      SELECT l_returnflag, l_linestatus, n,
        {split('sq_e2', 2)} AS sum_qty,
        {split('sbp_e2', 2)} AS sum_base_price,
        {split('sdp_e4', 4)} AS sum_disc_price,
        {split('sc_e6', 6)} AS sum_charge,
        {split('sd_e2', 2)} AS sum_disc
      FROM agg
    )
    SELECT l_returnflag, l_linestatus,
      sum_qty, sum_base_price, sum_disc_price, sum_charge,
      CAST(sum_qty / n AS DOUBLE) AS avg_qty,
      CAST(sum_base_price / n AS DOUBLE) AS avg_price,
      CAST(sum_disc / n AS DOUBLE) AS avg_disc,
      n AS count_order
    FROM conv
    """


_sql_query(
    "q1_pricing_summary",
    _q1_sql("DIV"),
    oracle=_q1_sql("//"),
    doc="TPC-H Q1 shape: scan + hash aggregate with map-side partial agg; "
    "decimal-exact money sums, converted to DOUBLE via the integer "
    "micro-unit split (see the comment above: the naive decimal→double "
    "cast diverges cross-engine past 2^53 unscaled).",
)

_sql_query(
    "q5_regional_revenue",
    f"""
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D}))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-table join chain; Catalyst broadcasts the dim "
    "tables (region/nation/supplier under the 10MB threshold), the "
    "orders⋈lineitem shuffle is the only big exchange.",
)

_sql_query(
    "agg_distinct_orders",
    """
    SELECT o_orderstatus,
      COUNT(DISTINCT o_custkey) AS n_customers,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Exact distinct aggregation (expand + two-phase agg in Spark).",
)

_sql_query(
    "agg_part_stats",
    f"""
    SELECT p_brand, COUNT(*) AS n_parts,
      MIN(p_retailprice) AS min_price,
      MAX(p_retailprice) AS max_price,
      CAST(CAST(SUM(CAST(p_retailprice AS {_D})) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price
    FROM part
    GROUP BY p_brand
    """,
    doc="Per-group min/max/avg with decimal-exact mean.",
)

_sql_query(
    "rollup_supplier_balance",
    f"""
    SELECT r_name, n_name, COUNT(*) AS n_suppliers,
      CAST(SUM(CAST(s_acctbal AS {_D})) AS DOUBLE) AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP grouping sets (Expand operator in Spark).",
)

_sql_query(
    "cube_order_counts",
    f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS {_D})) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets.",
)

# --- joins -------------------------------------------------------------------


@register(
    "q3_top_orders",
    oracle=f"""
    SELECT o_orderkey, o_orderdate,
      CAST(SUM(CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D}))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-01-01'
      AND l_shipdate  > DATE '1997-06-30'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape via the DataFrame API: filter pushdown on both scan "
    "sides, broadcast of the filtered customer dim, top-10 via "
    "TakeOrderedAndProject.",
    tags=("relational", "join"),
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-30")
    dec = lambda c: F.col(c).cast(_D)  # noqa: E731
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "join_semi_customers_with_urgent",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Left-semi join (EXISTS): customers with at least one urgent order.",
    tags=("relational", "join"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Left-anti join (NOT EXISTS): customers with no URGENT orders — "
    "the right side is filtered before the anti join (every fixture "
    "customer has SOME order, so the unfiltered form would be vacuous).",
    tags=("relational", "join"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- windows -----------------------------------------------------------------

_sql_query(
    "window_balance_rank",
    """
    SELECT c_custkey, c_nationkey, c_acctbal,
      rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
      dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_dense_rank
    FROM customer
    """,
    doc="Ranking windows partitioned by nation (shuffle on the partition "
    "key only; deterministic tiebreak in the frame order).",
    tags=("relational", "window"),
)

_sql_query(
    "window_running_spend",
    f"""
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS {_D})) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
      lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
    FROM orders
    """,
    doc="Analytic windows with explicit ROWS frame + lag/lead; running sum "
    "is decimal-exact so the frame accumulation order can't flap the hash.",
    tags=("relational", "window"),
)


@register(
    "topk_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    ) t WHERE rn <= 3
    """,
    doc="Top-k per group — the scalable idiom (partial top-k per partition "
    "under AQE) vs a global sort.",
    tags=("relational", "window"),
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


# --- set operations ----------------------------------------------------------

_sql_query(
    "set_nations_customers_and_suppliers",
    """
    SELECT n_nationkey FROM nation JOIN customer ON c_nationkey = n_nationkey
    INTERSECT
    SELECT n_nationkey FROM nation JOIN supplier ON s_nationkey = n_nationkey
    """,
    doc="INTERSECT (distinct set semantics).",
    tags=("relational", "setop"),
)

_sql_query(
    "set_nations_customers_only",
    """
    SELECT n_nationkey FROM nation JOIN customer ON c_nationkey = n_nationkey
    EXCEPT
    SELECT n_nationkey FROM nation JOIN supplier ON s_nationkey = n_nationkey
                       WHERE s_acctbal < 0
    """,
    doc="EXCEPT (distinct set semantics): nations with customers minus "
    "nations harboring a negative-balance supplier (every nation has both "
    "customers and suppliers, so the subtrahend must be filtered for the "
    "result to be non-empty and the subtraction non-trivial).",
    tags=("relational", "setop"),
)

_sql_query(
    "set_union_all_keys",
    """
    SELECT c_custkey AS entity_key, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, 'supplier' AS kind FROM supplier
    """,
    doc="UNION ALL with aligned schema.",
    tags=("relational", "setop"),
)

# --- subqueries --------------------------------------------------------------

_sql_query(
    "subquery_above_avg_balance",
    f"""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS {_D})) AS DOUBLE) / COUNT(*) FROM customer
    )
    """,
    doc="Scalar subquery (decimal-exact global mean so the threshold is "
    "identical in both engines).",
    tags=("relational", "subquery"),
)

# --- scalar function surface ---------------------------------------------------


@register(
    "scalar_datetime_orders",
    oracle="""
    SELECT o_orderkey,
      CAST(year(o_orderdate) AS BIGINT) AS order_year,
      CAST(month(o_orderdate) AS BIGINT) AS order_month,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
    FROM orders
    """,
    doc="Datetime scalar functions; session timezone pinned to UTC so "
    "timestamp semantics match the oracle's naive timestamps.",
    tags=("relational", "scalar"),
)
def scalar_datetime_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey,
          CAST(year(o_orderdate) AS BIGINT) AS order_year,
          CAST(month(o_orderdate) AS BIGINT) AS order_month,
          CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
          CAST(datediff(o_orderdate, TIMESTAMP '1995-01-01') AS BIGINT) AS days_since_epoch_start
        FROM orders
        """
    )


@register(
    "scalar_json_events",
    oracle="""
    SELECT event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON extraction over events.props (get_json_object ↔ "
    "json_extract_string) + integer aggregates (exact).",
    tags=("relational", "scalar"),
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot via the DataFrame pivot() operator (conditional aggregation "
    "under the hood — the oracle spells out the CASE form).",
    tags=("relational", "pivot"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    pv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )
