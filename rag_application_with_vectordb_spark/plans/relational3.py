"""Relational extension surface, part 3: the remaining classic TPC-H
query *shapes*, adapted to the fixture's slimmed schema (TESTDATA.md —
no partsupp, no l_commitdate/l_receiptdate/l_shipmode, no c_phone).

Where the original predicate needs a missing column, the adaptation
keeps the PLAN SHAPE (the thing that matters for engine coverage and
100 TB posture) and swaps in an available column:

- "late line"   := l_shipdate > o_orderdate + 60/90 days
                   (for l_receiptdate > l_commitdate)
- country code  := substring(c_name, 17, 2)  (for substring(c_phone,1,2))
- supply cost   := p_retailprice             (for ps_supplycost)
- "complaint" suppliers := s_acctbal < 0     (for comment LIKE ...)

Cross-engine determinism: every money SUM goes through DECIMAL(18,2)
(exact, associative) and is rendered back to DOUBLE — see
``oracle_dialect``. All SQL texts here are dialect-shared (valid in
both Spark SQL and DuckDB) unless a DataFrame-API form is the point.

Scale notes baked into the plans:
- EXISTS / NOT EXISTS / IN / NOT IN become (null-aware) semi/anti
  hash joins in Spark — one shuffle on the correlation key, never a
  per-row subquery re-execution;
- dims broadcast; the only big exchanges are fact⋈fact on the join key;
- global scalar subqueries (q14's denominator, q22's avg balance)
  evaluate once and broadcast as literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import load_table, register_views, tables_in_sql
from .registry import register

_D = "DECIMAL(18,2)"


def _sql_query(name: str, sql: str, doc: str = "", oracle: str | None = None, tags=("relational",)):
    @register(name, oracle=oracle or sql, doc=doc, tags=tags)
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, tables_in_sql(_sql))
        return spark.sql(_sql)

    return fn


# --- Q4: priority count over EXISTS (correlated → left-semi join) ------------


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS with a predicate over BOTH "
    "sides, via the DataFrame API's left-semi join on a compound "
    "condition — one shuffle on orderkey, no subquery re-execution.",
    tags=("relational", "join", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        orders.join(lineitem, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- Q6: forecasting revenue change (pure scan + filter + agg) ----------------

_sql_query(
    "q6_forecast_revenue",
    f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS {_D}) * CAST(l_discount AS {_D})) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: tight scan + conjunctive filter + single agg — "
    "the pure predicate-pushdown showcase (all three predicates reach "
    "the parquet reader; only 4 columns scanned).",
)

# --- Q8: market share (two-level agg with conditional numerator) --------------

_sql_query(
    "q8_market_share",
    f"""
    SELECT o_year,
      CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END) AS DOUBLE) AS nation_volume,
      CAST(SUM(volume) AS DOUBLE) AS total_volume,
      CAST(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT extract(year FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D})) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
    ) shipping
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: 8-table join (nation aliased twice) + conditional "
    "market-share aggregation; all dims broadcast, decimal-exact volumes.",
)

# --- Q9: product-type profit (supply cost proxied by retail price) ------------

_sql_query(
    "q9_product_profit",
    f"""
    SELECT nation, o_year,
      CAST(SUM(CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D}))
               - CAST(p_retailprice AS {_D}) * CAST(l_quantity AS {_D})) AS DOUBLE) AS profit
    FROM (
      SELECT n_name AS nation,
             extract(year FROM o_orderdate) AS o_year,
             l_extendedprice, l_discount, p_retailprice, l_quantity
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%red%'
    ) profit_base
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: LIKE-filtered part dim, profit expression over "
    "price/discount/cost (retailprice proxies the missing ps_supplycost), "
    "grouped by nation × year.",
)


# --- Q10: returned-item reporting (top 20 customers by lost revenue) -----------


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
      CAST(SUM(CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D}))) AS DOUBLE) AS revenue,
      c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape via the DataFrame API: date-filtered orders join "
    "returned lineitems, broadcast nation dim, top-20 via "
    "TakeOrderedAndProject (never a global sort).",
    tags=("relational", "join"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    dec = lambda c: F.col(c).cast(_D)  # noqa: E731
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- Q12: shipping-priority buckets (lateness proxies ship mode) ---------------

_sql_query(
    "q12_late_priority",
    """
    SELECT ship_bucket,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
        CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 'late' ELSE 'ontime' END AS ship_bucket
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    ) flagged
    GROUP BY ship_bucket
    """,
    doc="TPC-H Q12 shape: computed grouping key (lateness bucket proxies "
    "the missing l_shipmode) + conditional counts.",
)

# --- Q14: promotion effect (conditional share of revenue) ----------------------

_sql_query(
    "q14_promo_revenue",
    f"""
    SELECT CAST(
      100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D}))
                    ELSE 0 END) AS DOUBLE)
      / CAST(SUM(CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D}))) AS DOUBLE)
      AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'
    """,
    doc="TPC-H Q14 shape: single-row conditional-share aggregate; the "
    "month filter prunes the fact scan before the part join.",
)


# --- Q16: supplier counts with NOT IN (null-aware anti join) -------------------


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: NOT IN subquery (null-aware anti join — "
    "s_suppkey is non-null so it degenerates to a plain anti hash join) "
    "+ COUNT(DISTINCT) per brand/type/size; negative-balance suppliers "
    "proxy the missing comment-LIKE complaint filter.",
    tags=("relational", "join", "subquery"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    excluded = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q18: large-volume customers (IN over a HAVING subquery) -------------------

@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS {_D})) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    """,
    doc="TPC-H Q18 shape: IN over an aggregated HAVING subquery. The "
    "naive SQL plan scans lineitem THREE times (the semi-join list "
    "twice under AQE plus the fact) and re-aggregates after the join; "
    "since the final group (customer, order) is 1:1 with the order, the "
    "per-order sum already computed for the HAVING IS total_qty — so "
    "the DataFrame plan aggregates lineitem once, filters > 300, and "
    "joins the survivors to orders (AQE broadcasts the small filtered "
    "side at runtime) and the broadcast customer dim. One fact scan, "
    "one shuffle.",
    tags=("relational", "subquery"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_D)).alias("total_qty_dec"))
        .filter(F.col("total_qty_dec") > 300)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big_orders.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("total_qty_dec").cast("double").alias("total_qty"),
        )
    )

# --- Q21: suppliers who alone shipped late (EXISTS + NOT EXISTS) ---------------

@register(
    "q21_sole_late_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape: EXISTS + correlated NOT EXISTS over the same "
    "fact (late := shipped >60 days after order date, standing in for "
    "the missing receipt/commit dates). The correlated pair collapses "
    "into ONE per-order aggregate: a late line qualifies iff its order "
    "has >=2 distinct suppliers (the EXISTS) and exactly 1 distinct LATE "
    "supplier (the NOT EXISTS, given the line itself is late) — so scan "
    "lineitem once, aggregate per order, and sum the late-line counts "
    "per surviving supplier. One fact scan and one orderkey shuffle "
    "replace two semi/anti self-joins.",
    tags=("relational", "join", "subquery"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    per_order = (
        lineitem.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("is_late", late)
        .groupBy("l_orderkey")
        .agg(
            # collect_set, not countDistinct: two distinct-aggregates would
            # Expand the fact 3x pre-shuffle; supplier sets per order are
            # tiny and bounded, so set-union partial aggregation is cheaper.
            F.size(F.collect_set("l_suppkey")).alias("n_supp"),
            F.size(
                F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey")))
            ).alias("n_late_supp"),
            F.max(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("late_supp"),
            F.count(F.when(F.col("is_late"), F.lit(1))).alias("n_late_lines"),
        )
    )
    waiters = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiters.join(F.broadcast(supplier), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
    )

# --- Q22: idle high-balance customers (scalar subquery + NOT EXISTS) -----------

_sql_query(
    "q22_idle_customers",
    f"""
    WITH aug AS (
      SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      UNION ALL
      SELECT CASE CAST(c_custkey % 7 AS INTEGER)
               WHEN 0 THEN '01' WHEN 1 THEN '12' WHEN 2 THEN '23'
               WHEN 3 THEN '34' WHEN 4 THEN '45' WHEN 5 THEN '56'
               ELSE '67' END,
             c_acctbal + 10000.0, c_custkey + 100000000
      FROM customer WHERE c_custkey % 50 = 0
    )
    SELECT cntrycode, COUNT(*) AS numcust,
      CAST(SUM(CAST(c_acctbal AS {_D})) AS DOUBLE) AS totacctbal
    FROM (
      SELECT cntrycode, c_acctbal, c_custkey
      FROM aug
      WHERE cntrycode IN ('01', '12', '23', '34', '45', '56', '67')
        AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS {_D})) AS DOUBLE) / COUNT(*)
          FROM aug WHERE c_acctbal > 0
        )
    ) hot
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = hot.c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape: scalar subquery threshold (evaluated once, "
    "broadcast) + NOT EXISTS anti join; country code proxied by the "
    "customer-name digits (no c_phone), and 'has never ordered' by "
    "'has never ordered URGENT' (every fixture customer has orders). "
    "The smallest fixture carries no organic idle-high-balance case, so "
    "the query PLANTS one per 50th custkey (re-keyed +1e8, balance "
    "+10000 — above the augmented positive mean by construction, and "
    "orderless by re-keying): the green row proves DETECTION at every "
    "SF, not absence.",
)

# --- Q11: important stock (HAVING > fraction of a global scalar subquery) ------
# No partsupp table: "stock value" per part := SUM(l_extendedprice ·
# l_quantity) over the lines shipped by suppliers of one nation, which
# preserves the shape — join + group + HAVING over a global scalar
# subquery of the SAME aggregate, computed once and broadcast.

@register(
    "q11_important_stock",
    oracle=f"""
    WITH s_aug AS (
      SELECT s_suppkey, s_nationkey FROM supplier
      UNION ALL
      SELECT s_suppkey + 100000000,
             (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_2')
      FROM supplier
    ),
    l_aug AS (
      SELECT l_partkey, l_suppkey, l_extendedprice, l_quantity FROM lineitem
      UNION ALL
      SELECT l_partkey, l_suppkey + 100000000, l_extendedprice, l_quantity
      FROM lineitem WHERE l_orderkey % 20 = 0 AND l_linenumber = 1
    )
    , pp AS (
      SELECT l_partkey,
        SUM(CAST(l_extendedprice AS {_D}) * CAST(l_quantity AS {_D})) AS sv
      FROM l_aug
      JOIN s_aug ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(sv AS DOUBLE) AS stock_value
    FROM pp
    WHERE CAST(sv AS DOUBLE) > 0.5 * (SELECT CAST(MAX(sv) AS DOUBLE) FROM pp)
    """,
    doc="TPC-H Q11 shape: per-part value vs a global scalar-subquery "
    "threshold. Q11's official fraction shrinks with SF (0.0001/SF) — "
    "unknowable in-query — so a fixed fraction goes 0-rows once parts "
    "multiply (organic 0.1% was empty by sf0.1); the scale-free "
    "analogue used here is HALF THE MAX per-part value: nonempty at "
    "every SF by construction (the max part always qualifies), "
    "selective (11/52/307/564/2489 rows at sf0.001/0.01/0.1/1/10), and "
    "0.5x is a power of two so the threshold double is exact in both "
    "engines. The oracle spells the two-pass scalar-subquery form; the "
    "Spark plan joins and aggregates ONCE, persists the small per-part "
    "aggregate (#NATION_2-parts rows, released via track_persist), and "
    "derives the threshold from it with a broadcast 1-row cross join — "
    "2 effective fact scans (organic + planted branch), the plan you'd "
    "want at 100 TB. Decimal-exact sums until the final display cast. "
    "The smallest fixture has zero NATION_2 suppliers (organically "
    "empty), so the query PLANTS a NATION_2-re-keyed clone of every "
    "supplier (+1e8) plus one lineitem per 20th order remapped onto the "
    "clones: the green row proves the join+threshold shape at every SF, "
    "not absence.",
    tags=("relational", "subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import track_persist

    tune(spark)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber",
    )
    n2 = nation.filter(F.col("n_name") == "NATION_2").select("n_nationkey")
    s_aug = supplier.unionByName(
        supplier.crossJoin(F.broadcast(n2)).select(
            (F.col("s_suppkey") + F.lit(100000000)).alias("s_suppkey"),
            F.col("n_nationkey").alias("s_nationkey"),
        )
    )
    l_aug = lineitem.unionByName(
        lineitem.filter(
            (F.col("l_orderkey") % 20 == 0) & (F.col("l_linenumber") == 1)
        ).withColumn("l_suppkey", F.col("l_suppkey") + F.lit(100000000))
    ).select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    n2_suppliers = s_aug.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_2")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    value = F.col("l_extendedprice").cast(_D) * F.col("l_quantity").cast(_D)
    per_part = (
        l_aug.join(F.broadcast(n2_suppliers), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("sv"))
    )
    per_part = track_persist(per_part.persist())
    total = per_part.agg((F.lit(0.5) * F.max("sv").cast("double")).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("sv").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("sv").cast("double").alias("stock_value"))
    )


# --- Q13: customer order-count distribution (outer join + double agg) ----------


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left outer join with an extra predicate INSIDE "
    "the join condition (priority filter proxies the missing o_comment "
    "NOT LIKE), COUNT of the nullable side, then a histogram re-aggregate. "
    "The right side is filtered before the shuffle; customers with no "
    "qualifying orders survive with c_count = 0.",
    tags=("relational", "join"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count() skips NULLs
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# --- Q15: top supplier by quarterly revenue (CTE reuse + MAX scalar subquery) --

_sql_query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
        CAST(SUM(CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D}))) AS DOUBLE)
          AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: the revenue CTE is referenced twice (join input "
    "+ MAX scalar subquery) — Spark evaluates the ~|suppliers|-row "
    "aggregate twice but both passes share the pruned, predicate-pushed "
    "scan; fp64 equality is safe because both engines derive the value "
    "from the same exact DECIMAL sum.",
    tags=("relational", "subquery"),
)


# --- Q17: small-quantity-order revenue (correlated AVG → pre-agg + join) -------


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS {_D})) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2' AND p_size < 15
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS {_D})) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 shape: correlated per-part AVG threshold. The DataFrame "
    "plan de-correlates explicitly: one per-part aggregate over the "
    "filtered parts' lines (decimal-exact sum / count, never fp64 AVG), "
    "broadcast back onto the fact — one shuffle, no per-row subquery.",
    tags=("relational", "subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") < 15)
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # Only the qualifying parts' lines feed BOTH the threshold aggregate and
    # the final sum, so filter once up front (the correlation key is p_partkey).
    lines = lineitem.join(
        F.broadcast(part.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey")
    )
    thresholds = lines.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast(_D)).cast("double") / F.count("*"))
        ).alias("qty_threshold")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        lines.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_D)).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# --- Q20: suppliers of heavily-shipped promo parts (nested IN + HAVING) --------

_sql_query(
    "q20_promotion_suppliers",
    f"""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS {_D})) > 50
    )
    """,
    doc="TPC-H Q20 shape: two nested IN subqueries (part-name LIKE prefix "
    "filter, then a (supplier, part)-grained HAVING over shipped "
    "quantity) — Spark collapses them into broadcast-semi-join → "
    "aggregate → semi-join; the shipped-quantity threshold proxies the "
    "missing partsupp availability rule.",
    tags=("relational", "join", "subquery"),
)
