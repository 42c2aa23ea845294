"""Relational extension surface, part 2: as-of / range joins, grouping
sets, unpivot, HAVING subqueries, string/date/array scalar functions,
and approximate sketches (rows-only checked — sketch algorithms differ
across engines by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join_prior
from ..operators.rangejoin import range_join_within
from ..session import tune
from ..sources.catalog import load_table, register_views, tables_in_sql
from .oracle_dialect import duck_hex13_to_long
from .registry import register

_D = "DECIMAL(18,2)"


def _sql_query(name: str, sql: str, doc: str = "", oracle: str | None = None, tags=("relational",)):
    @register(name, oracle=oracle or sql, doc=doc, tags=tags)
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, tables_in_sql(_sql))
        return spark.sql(_sql)

    return fn


@register(
    "asof_purchase_to_click",
    oracle="""
    WITH stream AS (
      SELECT user_id, ts, event_id, event_type,
        max(CASE WHEN event_type = 'click' THEN ts END) OVER (
          PARTITION BY user_id ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id, user_id, ts, asof_ts
    FROM stream WHERE event_type = 'purchase'
    """,
    doc="As-of join: each purchase matched to the user's latest "
    "strictly-prior click via the union+window formulation — one shuffle "
    "on the key, no join, no candidate-pair blowup.",
    tags=("relational", "asof"),
)
def asof_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join_prior(clicks, purchases, on="ts", key="user_id")
    return out.select("event_id", "user_id", "ts", "asof_ts")


@register(
    "range_join_error_after_purchase",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    e AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT event_id + 1000000000, user_id, ts + INTERVAL 2 MINUTE
      FROM p WHERE event_id % 50 = 0
    )
    SELECT p.event_id AS a_event_id, e.event_id AS b_event_id, p.user_id,
           p.ts AS a_ts, e.ts AS b_ts
    FROM p JOIN e
      ON p.user_id = e.user_id
     AND e.ts > p.ts
     AND epoch_us(e.ts) - epoch_us(p.ts) <= 600 * 1000000
    """,
    doc="Interval join (errors within 10 min after a purchase, same user) "
    "via time-bucket blocking: equi-join on (key, floor(ts/W)) with a "
    "two-bucket probe — candidates bounded by local density, never a "
    "per-key cartesian product. The smallest fixture carries no organic "
    "error-within-10-min-of-purchase case, so the query PLANTS one error "
    "2 min after every 50th-id purchase (re-keyed +1e9 — the "
    "audit_duplicate_payments move): the green row proves DETECTION at "
    "every SF, not absence.",
    tags=("relational", "rangejoin"),
)
def range_join_error_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    organic_errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    planted_errors = purchases.filter(F.col("event_id") % 50 == 0).select(
        (F.col("event_id") + F.lit(1000000000)).alias("event_id"),
        "user_id",
        F.expr("timestampadd(MINUTE, 2, ts)").alias("ts"),
    )
    errors = organic_errors.unionByName(planted_errors)
    out = range_join_within(purchases, errors, on="ts", key="user_id", window_seconds=600)
    return out.select(
        F.col("a_event_id"), F.col("b_event_id"), F.col("user_id"), F.col("a_ts"), F.col("b_ts")
    )


_sql_query(
    "grouping_sets_order_stats",
    f"""
    SELECT o_orderstatus, o_orderpriority,
      CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS {_D})) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    doc="Explicit GROUPING SETS with grouping() markers (Expand operator).",
    tags=("relational", "rollup"),
)


@register(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
    """,
    doc="Unpivot via stack() (the oracle spells the UNION ALL form).",
    tags=("relational", "pivot"),
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    part = load_table(spark, sf_dir, "part")
    return part.selectExpr(
        "p_partkey",
        "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (measure, value)",
    )


_sql_query(
    "having_big_orders",
    f"""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS {_D})) > 150
    )
    """,
    doc="IN-subquery with HAVING over an exact decimal sum (TPC-H Q18 shape).",
    tags=("relational", "subquery"),
)

@register(
    "calendar_dim_order_counts",
    oracle="""
    WITH cal AS (
      SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS day
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n FROM orders GROUP BY 1
    )
    SELECT cal.day, COALESCE(daily.n, 0) AS n_orders
    FROM cal LEFT JOIN daily USING (day)
    """,
    doc="Generated calendar dimension (sequence + explode) LEFT-joined to "
    "order counts with zero-fill — the gap-free reporting pattern no raw "
    "GROUP BY gives you.",
    tags=("relational", "calendar"),
)
def calendar_dim_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH cal AS (
          SELECT explode(sequence(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS day
        ),
        daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n FROM orders GROUP BY 1
        )
        SELECT cal.day, COALESCE(daily.n, 0) AS n_orders
        FROM cal LEFT JOIN daily USING (day)
        """
    )


_sql_query(
    "q2_cheapest_part_per_brand",
    """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part p
    WHERE p_retailprice = (
      SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
    doc="TPC-H Q2 shape: correlated scalar subquery (Catalyst rewrites it "
    "to an aggregate + join under RewriteCorrelatedScalarSubquery); exact "
    "double MIN, so no decimal dance needed.",
    tags=("relational", "subquery"),
)

_sql_query(
    "scalar_string_parts",
    """
    SELECT p_partkey,
      upper(p_brand) AS brand_upper,
      length(p_name) AS name_len,
      substr(p_name, 1, 8) AS name_head,
      replace(p_type, ' ', '_') AS type_snake,
      concat_ws('/', p_brand, p_type) AS brand_type,
      regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
    FROM part
    """,
    doc="String scalar surface: upper/length/substr/replace/concat_ws/"
    "regexp_extract — identical semantics in both engines.",
    tags=("relational", "scalar"),
)


@register(
    "scalar_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
      o_orderdate + INTERVAL 3 MONTH AS due_ts,
      CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
      CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday,
      CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS year_month
    FROM orders
    """,
    doc="Date arithmetic: interval add, last_day, ISO weekday (Spark "
    "weekday()+1 == DuckDB isodow), year-month formatting.",
    tags=("relational", "scalar"),
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey,
          o_orderdate + INTERVAL 3 MONTH AS due_ts,
          last_day(CAST(o_orderdate AS DATE)) AS month_end,
          CAST(weekday(o_orderdate) + 1 AS BIGINT) AS iso_weekday,
          date_format(o_orderdate, 'yyyy-MM') AS year_month
        FROM orders
        """
    )


@register(
    "scalar_array_ops",
    oracle="""
    SELECT vec_id,
      CAST(len(embedding) AS INTEGER) AS dim,
      CAST(embedding[1] AS DOUBLE) AS first_comp,
      CAST(embedding[64] AS DOUBLE) AS last_comp,
      CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
        + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head4_sum,
      CAST(list_max(embedding) AS DOUBLE) AS max_comp
    FROM embeddings
    """,
    doc="Array scalar surface over the embedding column: size, element_at "
    "(1-based both engines), explicit head sum (fixed fold order → fp64 "
    "deterministic), array_max.",
    tags=("relational", "scalar"),
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    d = lambda i: F.element_at(e, i).cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        d(1).alias("first_comp"),
        d(64).alias("last_comp"),
        (d(1) + d(2) + d(3) + d(4)).alias("head4_sum"),
        F.array_max(e).cast("double").alias("max_comp"),
    )


@register(
    "q7_nation_pair_revenue",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
      CAST(year(o_orderdate) AS BIGINT) AS order_year,
      CAST(SUM(CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D}))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_regionkey <> n2.n_regionkey
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: cross-nation trade volume — two aliases of the "
    "same dim table, 6-way chain, decimal-exact revenue. Plan is built "
    "fact-out: customer/supplier/nation broadcast-enrich both facts, "
    "lineitem streams as the probe side of every join (the naive SQL "
    "join order made 600k-row lineitem the broadcast BUILD side probed "
    "by a 1-partition orders scan — single-core). lineitem is "
    "pre-partitioned on l_orderkey so at real scale the same plan "
    "degrades gracefully to a co-partitioned shuffle join when orders "
    "outgrows the broadcast threshold.",
    tags=("relational", "join"),
)
def q7_nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            F.col("n_name").alias("cust_nation"),
            F.col("n_regionkey").alias("cust_region"),
        )
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            F.col("n_name").alias("supp_nation"),
            F.col("n_regionkey").alias("supp_region"),
        )
    )
    orders_enriched = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "cust_nation", "cust_region")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    # Single-file fixture scan → 1 partition; key the spread by the join key.
    parallelism = spark.sparkContext.defaultParallelism
    lineitem = lineitem.repartition(parallelism, "l_orderkey")
    dec = lambda c: F.col(c).cast(_D)  # noqa: E731
    return (
        lineitem.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders_enriched, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("cust_region") != F.col("supp_region"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )

_sql_query(
    "q19_disjunctive_predicate",
    f"""
    SELECT COUNT(*) AS n_matches,
      CAST(SUM(CAST(l_extendedprice AS {_D}) * (1 - CAST(l_discount AS {_D}))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 5 AND 30)
       OR (p_brand = 'Brand#2' AND p_type LIKE 'SMALL%' AND l_quantity >= 10)
       OR (p_size >= 40 AND l_discount BETWEEN 0.02 AND 0.04)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-column predicates spanning "
    "both join sides (exercises predicate normalization/pushdown limits).",
    tags=("relational", "join"),
)


@register(
    "window_range_frame_spend",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderdate,
      CAST(SUM(CAST(o_totalprice AS {_D})) OVER (
        PARTITION BY o_custkey ORDER BY CAST(epoch_us(o_orderdate) // 1000000 AS BIGINT)
        RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
    FROM orders
    """,
    doc="RANGE frame (value-based window): per-customer trailing-30-day "
    "spend; ordered on epoch seconds so the numeric range bound is "
    "dialect-identical, summed in decimal so peer-group accumulation "
    "order can't flap the hash.",
    tags=("relational", "window"),
)
def window_range_frame_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_orderdate,
          CAST(SUM(CAST(o_totalprice AS {_D})) OVER (
            PARTITION BY o_custkey
            ORDER BY CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 1000000 AS BIGINT)
            RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
        FROM orders
        """
    )


@register(
    "scalar_map_ops",
    oracle="""
    SELECT event_id,
      CAST(1 AS INTEGER) AS n_keys,
      'k' AS first_key,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
      CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL AS has_k
    FROM events
    """,
    doc="MapType surface: props parsed via from_json to map<string,bigint>, "
    "then map_keys / element_at / containment — the oracle reproduces the "
    "same scalars through DuckDB's JSON functions.",
    tags=("relational", "scalar"),
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return events.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_value"),
        F.element_at(m, "k").isNotNull().alias("has_k"),
    )


_sql_query(
    "window_distribution_funcs",
    """
    SELECT c_custkey, c_nationkey,
      ntile(4)       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS bal_quartile,
      CAST(percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS bal_pct_rank,
      CAST(cume_dist()    OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS bal_cume_dist,
      first_value(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_custkey
    FROM customer
    """,
    doc="Distribution window functions (ntile / percent_rank / cume_dist / "
    "first_value over a full frame) with fully deterministic tiebreaks.",
    tags=("relational", "window"),
)


# HLL++ accuracy band for the sketch monitor below. Default rsd is 0.05;
# observed per-status relative error on the fixtures is ≤ 0.057
# (sf0.001: ≤0.021, sf0.01: ≤0.057, sf0.1: ≤0.053 — measured r11), so
# 0.15 = ~3× rsd gives honest headroom without vacuity: a broken sketch
# (wrong merge, truncated register set) lands far outside it.
_HLL_BAND = 0.15


@register(
    "approx_distinct_sketch",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS hll_within_band
    FROM orders GROUP BY o_orderstatus
    """,
    doc="approx_count_distinct (HyperLogLog++) per order status — the "
    "sketch path for 100 TB distinct counts. The raw HLL estimate is "
    "engine-specific (DuckDB's sketch differs), so — the ANN-recall-"
    "monitor move — the ORACLE-CHECKED surface is the exact distinct "
    "count (value-checked cross-engine) plus a deterministic boolean "
    "pinning the HLL estimate inside a 15% band of it (~3x the default "
    "rsd=0.05; oracle asserts TRUE). HLL register merge is max() per "
    "register — commutative and associative — so the boolean is "
    "partition-count- and AQE-invariant; a regression in the sketch "
    "path flips it and the driver hash catches it. The KMV twin "
    "(approx_distinct_kmv) remains the value-exact sketch.",
    tags=("relational", "approx"),
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("est"),
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.count("*").alias("n_orders"),
    )
    return agg.select(
        "o_orderstatus",
        "n_orders",
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers"))
            <= F.lit(_HLL_BAND) * F.col("exact_customers")
        ).alias("hll_within_band"),
    )


_BLOOM_BITS, _BLOOM_H = 8192, 3


@register(
    "bloom_semijoin_customers",
    oracle=f"""
    WITH bits AS (
      SELECT DISTINCT
             CAST({duck_hex13_to_long("md5(CAST(h.h AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR))")} % {_BLOOM_BITS} AS BIGINT) AS pos
      FROM orders, (SELECT unnest(range(0, {_BLOOM_H}))) h(h)
    ),
    probe AS (
      SELECT c.c_custkey, h.h AS h,
             CAST({duck_hex13_to_long("md5(CAST(h.h AS VARCHAR) || '|' || CAST(c.c_custkey AS VARCHAR))")} % {_BLOOM_BITS} AS BIGINT) AS pos
      FROM customer c, (SELECT unnest(range(0, {_BLOOM_H}))) h(h)
    ),
    member AS (
      SELECT c_custkey, COUNT(bits.pos) = {_BLOOM_H} AS bloom_member
      FROM probe LEFT JOIN bits USING (pos)
      GROUP BY c_custkey
    )
    SELECT m.c_custkey, m.bloom_member,
           EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = m.c_custkey) AS exact_member
    FROM member m
    """,
    doc="Bloom-filter semijoin pruning — the runtime-filter technique "
    "that cuts shuffle bytes at scale: a 8192-bit/3-hash bloom built "
    "from orders' customer keys (md5 bit positions → deterministic, so "
    "even the false-positive SET value-checks cross-engine), probed by "
    "every customer; output flags bloom membership beside exact EXISTS "
    "membership, making the one-sided error visible (bloom ⊇ exact, "
    "never misses). At 100 TB the bloom side is ≤ nbits distinct "
    "positions — broadcastable — and pre-filters the probe BEFORE the "
    "expensive join shuffle (Spark's own runtime bloom filter, "
    "spark.sql.optimizer.runtime.bloomFilter.enabled, automates the "
    "same pattern; this query makes its mechanics explicit and "
    "checkable).",
    tags=("relational", "approx", "join"),
)
def bloom_semijoin_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import hex13_to_long

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def pos(h_col, key_col):
        return (
            hex13_to_long(
                F.md5(F.concat(h_col.cast("string"), F.lit("|"), key_col.cast("string")))
            )
            % _BLOOM_BITS
        ).cast("bigint")

    hs = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_H - 1))).alias("h")
    bits = (
        orders.select("o_custkey", hs)
        .select(pos(F.col("h"), F.col("o_custkey")).alias("pos"))
        .distinct()
    )
    probe = cust.select("c_custkey", hs).select(
        "c_custkey", pos(F.col("h"), F.col("c_custkey")).alias("pos")
    )
    member = (
        probe.join(F.broadcast(bits.withColumn("__hit", F.lit(1))), "pos", "left")
        .groupBy("c_custkey")
        .agg((F.count("__hit") == _BLOOM_H).alias("bloom_member"))
    )
    exact = orders.select(F.col("o_custkey").alias("c_custkey")).distinct().withColumn(
        "__ex", F.lit(True)
    )
    return member.join(exact, "c_custkey", "left").select(
        "c_custkey",
        "bloom_member",
        F.coalesce(F.col("__ex"), F.lit(False)).alias("exact_member"),
    )


_CMS_D, _CMS_W = 4, 1024


@register(
    "approx_freq_countmin",
    oracle=f"""
    WITH cms AS (
      SELECT r.r AS r,
             CAST({duck_hex13_to_long("md5(CAST(r.r AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR))")} % {_CMS_W} AS BIGINT) AS b,
             COUNT(*) AS c
      FROM lineitem, (SELECT unnest(range(0, {_CMS_D}))) r(r)
      GROUP BY 1, 2
    ),
    probe AS (SELECT p_partkey FROM part WHERE p_partkey % 211 = 0),
    est AS (
      SELECT p.p_partkey,
             MIN(COALESCE(cms.c, 0)) AS cms_count
      FROM probe p
      CROSS JOIN (SELECT unnest(range(0, {_CMS_D}))) r(r)
      LEFT JOIN cms ON cms.r = r.r
        AND cms.b = CAST({duck_hex13_to_long("md5(CAST(r.r AS VARCHAR) || '|' || CAST(p.p_partkey AS VARCHAR))")} % {_CMS_W} AS BIGINT)
      GROUP BY 1
    ),
    exact AS (SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
    SELECT est.p_partkey AS partkey,
           CAST(est.cms_count AS BIGINT) AS cms_count,
           CAST(COALESCE(exact.n, 0) AS BIGINT) AS exact_count
    FROM est LEFT JOIN exact ON exact.l_partkey = est.p_partkey
    """,
    doc="Count-min sketch (Cormode & Muthukrishnan 2005) frequency "
    "estimates for a probe set of part keys, against exact counts: "
    "4 md5-derived hash rows × 1024 buckets, estimate = min over rows "
    "of the landed bucket's count (one-sided error: cms ≥ exact "
    "always). The md5 hashing makes the whole sketch deterministic, so "
    "the ESTIMATES value-check cross-engine — the third sketch beside "
    "HLL (rows-only) and KMV (value-checked). Scale: the sketch is "
    "d×w = 4096 cells; map-side partial aggregation collapses the "
    "groupBy to those cells before any shuffle, so building it over "
    "100 TB moves ~constant bytes.",
    tags=("relational", "approx"),
)
def approx_freq_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import hex13_to_long

    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def bucket(r_col, key_col):
        return (
            hex13_to_long(
                F.md5(F.concat(r_col.cast("string"), F.lit("|"), key_col.cast("string")))
            )
            % _CMS_W
        ).cast("bigint")

    expanded = li.select(
        "l_partkey", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("r")
    )
    cms = (
        expanded.select("r", bucket(F.col("r"), F.col("l_partkey")).alias("b"))
        .groupBy("r", "b")
        .agg(F.count("*").alias("c"))
    )
    probe = part.filter(F.col("p_partkey") % 211 == 0).select("p_partkey")
    probe_r = probe.select(
        "p_partkey", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("r")
    ).select("p_partkey", "r", bucket(F.col("r"), F.col("p_partkey")).alias("b"))
    est = (
        probe_r.join(cms, ["r", "b"], "left")
        .groupBy("p_partkey")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_count"))
    )
    exact = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    return (
        est.join(exact, est.p_partkey == exact.l_partkey, "left")
        .select(
            est.p_partkey.alias("partkey"),
            F.col("cms_count").cast("bigint").alias("cms_count"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("exact_count"),
        )
    )


_KMV_K = 64


@register(
    "approx_distinct_kmv",
    oracle=f"""
    WITH d AS (SELECT DISTINCT o_orderstatus, o_custkey FROM orders),
    u AS (
      SELECT o_orderstatus,
             {duck_hex13_to_long("md5(CAST(o_custkey AS VARCHAR))")} / 4503599627370496.0 AS u
      FROM d
    ),
    r AS (
      SELECT o_orderstatus, u,
             row_number() OVER (PARTITION BY o_orderstatus ORDER BY u) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n_d
      FROM u
    )
    SELECT o_orderstatus,
      CAST(CASE WHEN MAX(n_d) < {_KMV_K} THEN CAST(MAX(n_d) AS DOUBLE)
           ELSE {_KMV_K - 1}.0 / MAX(CASE WHEN rn = {_KMV_K} THEN u END) END AS DOUBLE)
        AS approx_customers_kmv,
      CAST(MAX(n_d) AS BIGINT) AS exact_customers
    FROM r GROUP BY o_orderstatus
    """,
    doc="K-minimum-values distinct sketch (Bar-Yossef et al. 2002): "
    "estimate = (k-1)/u_k where u_k is the k-th smallest md5-derived "
    "unit hash of the distinct keys. Unlike HLL (approx_distinct_sketch, "
    "band-checked — DuckDB's sketch differs), KMV is pure deterministic "
    "hashing, so the ESTIMATE itself is value-checked cross-engine, "
    "alongside the exact count for error inspection. At 100 TB the "
    "k-smallest-per-group selection is a bounded-heap aggregate "
    "(k·8 bytes of state per group, mergeable map-side) — the Spark "
    "side realizes exactly that (r10): the rank window is filtered to "
    "rn <= K, which Catalyst rewrites to a WindowGroupLimit (each map "
    "task keeps only K rows per group BEFORE the shuffle), and the "
    "per-group distinct count comes from a keyed aggregate instead of "
    "an unordered window that would buffer each status's whole "
    "partition in one task. The oracle keeps the textbook window SQL; "
    "values are identical (u_k is u at rn == K either way).",
    tags=("relational", "approx"),
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import hex13_to_long

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select("o_orderstatus", "o_custkey").distinct()
    u = d.select(
        "o_orderstatus",
        (hex13_to_long(F.md5(F.col("o_custkey").cast("string"))) / F.lit(4503599627370496.0)).alias("u"),
    )
    w = Window.partitionBy("o_orderstatus").orderBy("u")
    topk = u.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _KMV_K)
    nd = d.groupBy("o_orderstatus").agg(F.count("*").alias("n_d"))
    uk = topk.groupBy("o_orderstatus").agg(
        F.max(F.when(F.col("rn") == _KMV_K, F.col("u"))).alias("u_k")
    )
    return (
        nd.join(uk, "o_orderstatus")
        .select(
            "o_orderstatus",
            F.when(F.col("n_d") < _KMV_K, F.col("n_d").cast("double"))
            .otherwise(F.lit(float(_KMV_K - 1)) / F.col("u_k"))
            .cast("double")
            .alias("approx_customers_kmv"),
            F.col("n_d").cast("bigint").alias("exact_customers"),
        )
    )


def _pct_sketch_sql(unit_u: str) -> str:
    """Deterministic sampling quantile sketch, rendered per dialect:
    ``unit_u`` is the engine's md5-fold→[0,1) unit hash of the lineitem
    row key. The percentile over the SAMPLE is computed with the same
    rank-select + interpolation arithmetic as ``percentile_exact``, so
    the estimate itself is value-checkable cross-engine — the same move
    that made ``approx_distinct_kmv`` checkable where HLL was not."""
    return f"""
    WITH v AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x,
             {unit_u} AS u
      FROM lineitem
    ),
    tot AS (SELECT l_returnflag, COUNT(*) AS n_total FROM v GROUP BY l_returnflag),
    s AS (SELECT l_returnflag, x FROM v WHERE u < 0.25),
    r AS (
      SELECT l_returnflag, x,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY x) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM s
    ),
    ng AS (SELECT l_returnflag, MAX(n) AS n FROM r GROUP BY l_returnflag),
    t AS (
      SELECT l_returnflag, 'p50' AS tag, 0.5 * (n - 1) AS h, n FROM ng
      UNION ALL
      SELECT l_returnflag, 'p95' AS tag, 0.95 * (n - 1) AS h, n FROM ng
    ),
    sel AS (
      SELECT t.l_returnflag, t.tag, t.h, MAX(t.n) AS n_sample,
             MAX(CASE WHEN r.rn = CAST(FLOOR(t.h) AS BIGINT) THEN r.x END) AS xlo,
             MAX(CASE WHEN r.rn = CAST(CEILING(t.h) AS BIGINT) THEN r.x END) AS xhi
      FROM t JOIN r ON r.l_returnflag = t.l_returnflag
                   AND r.rn >= CAST(FLOOR(t.h) AS BIGINT)
                   AND r.rn <= CAST(CEILING(t.h) AS BIGINT)
      GROUP BY t.l_returnflag, t.tag, t.h
    ),
    f AS (
      SELECT l_returnflag, tag, n_sample,
             xlo + (h - FLOOR(h)) * (xhi - xlo) AS val
      FROM sel
    )
    SELECT f.l_returnflag,
           MAX(CASE WHEN tag = 'p50' THEN val END) AS price_p50,
           MAX(CASE WHEN tag = 'p95' THEN val END) AS price_p95,
           CAST(MAX(n_sample) AS BIGINT) AS n_sample,
           CAST(MAX(n_total) AS BIGINT) AS n_total
    FROM f JOIN tot ON f.l_returnflag = tot.l_returnflag
    GROUP BY f.l_returnflag
    """


_PCT_ROWKEY = "'pct42|' || CAST(l_orderkey AS {V}) || '|' || CAST(l_linenumber AS {V})"


@register(
    "approx_percentile_sketch",
    oracle=_pct_sketch_sql(
        duck_hex13_to_long(f"md5({_PCT_ROWKEY.format(V='VARCHAR')})")
        + " / 4503599627370496.0"
    ),
    doc="Quantile sketch via DETERMINISTIC uniform sampling: rows whose "
    "md5-unit hash of (orderkey, linenumber) falls under 0.25 form the "
    "sample; the interpolated percentile of the sample estimates the "
    "population percentile (standard sampling-quantile bound: error "
    "O(1/sqrt(sample))). Unlike t-digest/GK (engine-specific merge "
    "states, never cross-engine comparable — this query was rows-only "
    "through round 4), the hash-sampled estimate is bit-reproducible, "
    "so the ESTIMATE itself is value-checked against DuckDB, with "
    "percentile_exact as the accuracy yardstick. At 100 TB the sample "
    "is map-side filtered at the scan (hash predicate pushes past the "
    "shuffle) — and since r10 the sample's percentiles come from the "
    "distinct-value HISTOGRAM cumulative (the percentile_exact "
    "recipe), not a per-flag rank window: a 25% sample of a 100 TB "
    "fact is still fact-scale, and PARTITION BY the 3 return flags "
    "would sort a third of it per task. The oracle keeps the textbook "
    "window SQL; values are identical.",
    tags=("relational", "approx"),
)
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    u = (
        f"conv(substring(md5({_PCT_ROWKEY.format(V='STRING')}), 1, 13), 16, 10)"
        " / 4503599627370496.0"
    )
    v = li.select(
        "l_returnflag",
        F.expr("CAST(l_extendedprice AS DOUBLE)").alias("x"),
        F.expr(u).alias("u"),
    )
    tot = v.groupBy("l_returnflag").agg(F.count("*").alias("n_total")).localCheckpoint()
    s = v.filter(F.col("u") < 0.25).select("l_returnflag", "x")
    hist = s.groupBy("l_returnflag", "x").agg(F.count("*").cast("bigint").alias("c"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.asc("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wcum)).persist()
    ng = (
        s.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()  # bounded: one row per return flag
    )
    t = ng.select(
        "l_returnflag", F.lit("p50").alias("tag"), F.expr("0.5 * (n - 1)").alias("h"), "n"
    ).unionByName(
        ng.select(
            "l_returnflag", F.lit("p95").alias("tag"), F.expr("0.95 * (n - 1)").alias("h"), "n"
        )
    )

    def x_at(kexpr: str, col: str) -> DataFrame:
        return (
            F.broadcast(t)
            .join(cum, "l_returnflag")
            .filter(F.col("cum") >= F.expr(kexpr) + 1)
            .groupBy("l_returnflag", "tag", "h", "n")
            .agg(F.min("x").alias(col))
        )

    lo = x_at("CAST(FLOOR(h) AS BIGINT)", "xlo")
    hi = x_at("CAST(CEILING(h) AS BIGINT)", "xhi")
    f = lo.join(hi, ["l_returnflag", "tag", "h", "n"]).select(
        "l_returnflag",
        "tag",
        F.col("n").alias("n_sample"),
        F.expr("xlo + (h - FLOOR(h)) * (xhi - xlo)").alias("val"),
    )
    return (
        f.groupBy("l_returnflag")
        .agg(
            F.max(F.when(F.col("tag") == "p50", F.col("val"))).alias("price_p50"),
            F.max(F.when(F.col("tag") == "p95", F.col("val"))).alias("price_p95"),
            F.expr("CAST(MAX(n_sample) AS BIGINT)").alias("n_sample"),
        )
        .join(F.broadcast(tot), "l_returnflag")
        .select(
            "l_returnflag",
            "price_p50",
            "price_p95",
            "n_sample",
            F.expr("CAST(n_total AS BIGINT)").alias("n_total"),
        )
    )


@register(
    "approx_distinct_kmv_merged",
    oracle=f"""
    WITH d AS (SELECT DISTINCT o_orderstatus, o_custkey FROM orders),
    u AS (
      SELECT o_orderstatus, o_custkey % 8 AS shard,
             {duck_hex13_to_long("md5(CAST(o_custkey AS VARCHAR))")} / 4503599627370496.0 AS u
      FROM d
    ),
    shard_k AS (
      SELECT o_orderstatus, shard, u FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderstatus, shard ORDER BY u) AS rn
        FROM u
      ) WHERE rn <= {_KMV_K}
    ),
    merged AS (
      SELECT o_orderstatus, u,
             row_number() OVER (PARTITION BY o_orderstatus ORDER BY u) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n_m
      FROM shard_k
    ),
    direct AS (
      SELECT o_orderstatus, u,
             row_number() OVER (PARTITION BY o_orderstatus ORDER BY u) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n_d
      FROM u
    ),
    em AS (
      SELECT o_orderstatus,
        CAST(CASE WHEN MAX(n_m) < {_KMV_K} THEN CAST(MAX(n_m) AS DOUBLE)
             ELSE {_KMV_K - 1}.0 / MAX(CASE WHEN rn = {_KMV_K} THEN u END) END AS DOUBLE) AS est_merged
      FROM merged GROUP BY o_orderstatus
    ),
    ed AS (
      SELECT o_orderstatus,
        CAST(CASE WHEN MAX(n_d) < {_KMV_K} THEN CAST(MAX(n_d) AS DOUBLE)
             ELSE {_KMV_K - 1}.0 / MAX(CASE WHEN rn = {_KMV_K} THEN u END) END AS DOUBLE) AS est_direct,
        CAST(MAX(n_d) AS BIGINT) AS exact_customers
      FROM direct GROUP BY o_orderstatus
    )
    SELECT em.o_orderstatus, est_merged, est_direct,
           CAST(CASE WHEN est_merged = est_direct THEN 1 ELSE 0 END AS BIGINT)
             AS merge_is_lossless,
           exact_customers
    FROM em JOIN ed USING (o_orderstatus)
    """,
    doc="KMV sketch MERGEABILITY — the property that makes sketches "
    "work on a cluster: keys are sharded 8 ways (simulating executors), "
    "each shard keeps only its k smallest unit hashes (k*8 bytes of "
    "state), and the merged sketch (k smallest of the union) yields an "
    "estimate IDENTICAL to the single-pass sketch over all keys — the "
    "global k-minimum values are necessarily inside the union of "
    "per-shard k-minima. merge_is_lossless is computed in-query and "
    "must be 1 for every group; the whole demonstration hash-matches "
    "DuckDB. This is the map-side-combine contract a 100 TB distinct "
    "count rides on.",
    tags=("relational", "approx"),
)
def approx_distinct_kmv_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import hex13_to_long

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select("o_orderstatus", "o_custkey").distinct()
    u = d.select(
        "o_orderstatus",
        (F.col("o_custkey") % 8).alias("shard"),
        (
            hex13_to_long(F.md5(F.col("o_custkey").cast("string")))
            / F.lit(4503599627370496.0)
        ).alias("u"),
    )
    ws = Window.partitionBy("o_orderstatus", "shard").orderBy("u")
    shard_k = (
        u.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= _KMV_K)
        .drop("rn")
    )

    def estimate(src: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("o_orderstatus").orderBy("u")
        wc = Window.partitionBy("o_orderstatus")
        r = src.select(
            "o_orderstatus",
            "u",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n"),
        )
        return r.groupBy("o_orderstatus").agg(
            F.when(F.max("n") < _KMV_K, F.max("n").cast("double"))
            .otherwise(
                F.lit(float(_KMV_K - 1))
                / F.max(F.when(F.col("rn") == _KMV_K, F.col("u")))
            )
            .cast("double")
            .alias(out),
            F.max("n").cast("bigint").alias(f"__n_{out}"),
        )

    em = estimate(shard_k, "est_merged")
    ed = estimate(u, "est_direct")
    return (
        em.join(ed, "o_orderstatus")
        .select(
            "o_orderstatus",
            "est_merged",
            "est_direct",
            (F.col("est_merged") == F.col("est_direct"))
            .cast("bigint")
            .alias("merge_is_lossless"),
            F.col("__n_est_direct").alias("exact_customers"),
        )
    )


# --- winsorization via the sampled bounds (sort-free scale path) --------------


def _winsorize_sketch_sql(unit_u: str) -> str:
    """Winsorization whose p05/p95 clip bounds come from the SAME
    deterministic 25 % hash sample as ``approx_percentile_sketch`` — the
    sort-free pairing for ``feature_winsorize_prices`` (the exact
    nearest-rank anchor whose per-group full sort is the 100 TB cost).
    Only the sample pays the rank window; the clip + aggregate over the
    full fact is map-side. Nearest-rank bounds are actual sample values,
    so clipped prices stay on the 2-decimal grid and the mean's DECIMAL
    sum is exact — the whole estimate hash-matches cross-engine."""
    return f"""
    WITH v AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x,
             {unit_u} AS u0
      FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, x,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY x) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM v WHERE u0 < 0.25
    ),
    b AS (
      SELECT l_returnflag,
             MAX(CASE WHEN rn = GREATEST(CAST(CEILING(0.05 * n) AS BIGINT), 1) THEN x END) AS lo,
             MAX(CASE WHEN rn = GREATEST(CAST(CEILING(0.95 * n) AS BIGINT), 1) THEN x END) AS hi
      FROM r GROUP BY l_returnflag
    ),
    w AS (
      SELECT v.l_returnflag,
             LEAST(GREATEST(v.x, b.lo), b.hi) AS xw,
             CASE WHEN v.x < b.lo THEN 1 ELSE 0 END AS clip_lo,
             CASE WHEN v.x > b.hi THEN 1 ELSE 0 END AS clip_hi
      FROM v JOIN b ON v.l_returnflag = b.l_returnflag
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(clip_lo) AS BIGINT) AS n_clipped_lo,
           CAST(SUM(clip_hi) AS BIGINT) AS n_clipped_hi,
           MIN(xw) AS lo_bound,
           MAX(xw) AS hi_bound,
           CAST(CAST(SUM(CAST(xw AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS mean_winsorized
    FROM w GROUP BY l_returnflag
    """


@register(
    "feature_winsorize_prices_approx",
    oracle=_winsorize_sketch_sql(
        duck_hex13_to_long(f"md5({_PCT_ROWKEY.format(V='VARCHAR')})")
        + " / 4503599627370496.0"
    ),
    doc="feature_winsorize_prices with SAMPLED clip bounds: p05/p95 come "
    "from the deterministic 25% md5-hash sample (the "
    "approx_percentile_sketch machinery), so only the sample pays the "
    "per-group rank sort and the full-fact pass is clip + aggregate "
    "only — the winsorization a 100 TB pipeline actually runs, paired "
    "with the exact variant as its accuracy anchor (same output "
    "schema, directly diffable). Nearest-rank sample bounds are real "
    "data values, keeping the DECIMAL mean exact; the estimate itself "
    "hash-matches DuckDB. Since r10 the sample's bounds come from the "
    "distinct-value histogram cumulative (x@1-based rank k = MIN x "
    "with cum >= k) — a 25% sample of a 100 TB fact is still "
    "fact-scale, and the per-flag rank window sorted a third of it "
    "per task; the oracle keeps the window SQL.",
    tags=("analytics", "pipeline", "approx"),
)
def feature_winsorize_prices_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    u = (
        f"conv(substring(md5({_PCT_ROWKEY.format(V='STRING')}), 1, 13), 16, 10)"
        " / 4503599627370496.0"
    )
    v = li.select(
        "l_returnflag",
        F.expr("CAST(l_extendedprice AS DOUBLE)").alias("x"),
        F.expr(u).alias("u0"),
    )
    s = v.filter(F.col("u0") < 0.25).select("l_returnflag", "x")
    hist = s.groupBy("l_returnflag", "x").agg(F.count("*").cast("bigint").alias("c"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.asc("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wcum)).persist()
    ns = (
        s.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()  # bounded: one row per return flag
    )

    def bound(kexpr: str, out: str) -> DataFrame:
        return (
            F.broadcast(ns)
            .join(cum, "l_returnflag")
            .filter(F.col("cum") >= F.expr(kexpr))
            .groupBy("l_returnflag")
            .agg(F.min("x").alias(out))
        )

    b = bound("GREATEST(CAST(CEILING(0.05 * n) AS BIGINT), 1)", "lo").join(
        bound("GREATEST(CAST(CEILING(0.95 * n) AS BIGINT), 1)", "hi"), "l_returnflag"
    )
    w = v.join(F.broadcast(b), "l_returnflag").select(
        "l_returnflag",
        F.expr("LEAST(GREATEST(x, lo), hi)").alias("xw"),
        F.expr("CASE WHEN x < lo THEN 1 ELSE 0 END").alias("clip_lo"),
        F.expr("CASE WHEN x > hi THEN 1 ELSE 0 END").alias("clip_hi"),
    )
    return w.groupBy("l_returnflag").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(clip_lo) AS BIGINT)").alias("n_clipped_lo"),
        F.expr("CAST(SUM(clip_hi) AS BIGINT)").alias("n_clipped_hi"),
        F.min("xw").alias("lo_bound"),
        F.max("xw").alias("hi_bound"),
        F.expr(
            "CAST(CAST(SUM(CAST(xw AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE)"
        ).alias("mean_winsorized"),
    )


# --- deterministic HyperLogLog (value-checkable, unlike the native sketch) ------

_HLL_M = 64          # buckets (6 index bits); 46 rank bits remain of the 52
_HLL_ALPHA = 0.709   # Flajolet et al. 2007 bias constant for m=64


@register(
    "approx_distinct_hll_det",
    oracle=f"""
    WITH v AS (
      SELECT DISTINCT {duck_hex13_to_long("md5('hll42|' || CAST(o_custkey AS VARCHAR))")} AS h
      FROM orders
    ),
    reg AS (
      SELECT h % {_HLL_M} AS bucket,
        MAX(CASE WHEN h // {_HLL_M} = 0 THEN 47
                 ELSE 47 - length(bin(h // {_HLL_M})) END) AS r
      FROM v GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_present,
        CAST(SUM(CAST(2 AS BIGINT) ** (47 - r)) AS BIGINT) AS s_present
      FROM reg
    ),
    agg AS (
      SELECT CAST({_HLL_M} - n_present AS BIGINT) AS n_zero_buckets,
        CAST(s_present + ({_HLL_M} - n_present)
             * CAST(CAST(2 AS BIGINT) ** 47 AS BIGINT) AS BIGINT) AS s_fixed
      FROM s
    ),
    est AS (
      SELECT n_zero_buckets, s_fixed,
        {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} * (CAST(2 AS BIGINT) ** 47)
          / CAST(s_fixed AS DOUBLE) AS raw
      FROM agg
    ),
    ex AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct FROM orders)
    SELECT CAST({_HLL_M} AS BIGINT) AS m, n_zero_buckets, s_fixed,
      round(CASE WHEN raw <= 2.5 * {_HLL_M} AND n_zero_buckets > 0
                 THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / n_zero_buckets)
                 ELSE raw END, 6) AS est_hll,
      exact_distinct
    FROM est CROSS JOIN ex
    """,
    doc="HyperLogLog with a value-checkable ESTIMATE — the upgrade of "
    "approx_distinct_sketch (whose native-HLL estimate is band-checked, "
    "not value-checked: Spark's and DuckDB's sketches differ) to the "
    "engine's deterministic-hash discipline. "
    "md5-fold gives 52 hash bits: 6 index a register, the max "
    "leading-zero rank of the remaining 46 is the register value, and "
    "the harmonic mean is computed EXACTLY as the integer "
    "sum(2^(47-rank)) over registers (empty registers contribute 2^47) "
    "before ONE fp division — so the estimate, including the "
    "small-range linear-counting branch, is bit-identical across "
    "engines. Registers are 64 bytes of mergeable state: map-side "
    "partial MAX per bucket, one 64-row shuffle — the same merge "
    "algebra real HLL uses, with none of the implementation variance.",
    tags=("relational", "approx"),
)
def approx_distinct_hll_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import hex13_to_long

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    h = hex13_to_long(
        F.md5(F.concat(F.lit("hll42|"), F.col("o_custkey").cast("string")))
    )
    v = orders.select(h.alias("h")).distinct()
    w = (F.col("h") / _HLL_M).cast("bigint")  # h >= 0: floor == truncate
    rank = F.when(w == 0, F.lit(47)).otherwise(
        47 - F.length(F.expr(f"bin(CAST(h / {_HLL_M} AS BIGINT))"))
    )
    reg = v.select((F.col("h") % _HLL_M).alias("bucket"), rank.alias("r")).groupBy(
        "bucket"
    ).agg(F.max("r").alias("r"))
    s = reg.agg(
        F.count("*").cast("bigint").alias("n_present"),
        F.sum(F.expr("CAST(pow(2, 47 - r) AS BIGINT)")).cast("bigint").alias("s_present"),
    )
    agg = s.select(
        (F.lit(_HLL_M) - F.col("n_present")).cast("bigint").alias("n_zero_buckets"),
        (
            F.col("s_present")
            + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(2**47).cast("bigint")
        ).alias("s_fixed"),
    )
    est = agg.select(
        "n_zero_buckets",
        "s_fixed",
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * (2**47))
            / F.col("s_fixed").cast("double")
        ).alias("raw"),
    )
    ex = orders.agg(F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(ex)).select(
        F.lit(_HLL_M).cast("bigint").alias("m"),
        "n_zero_buckets",
        "s_fixed",
        F.round(
            F.when(
                (F.col("raw") <= 2.5 * _HLL_M) & (F.col("n_zero_buckets") > 0),
                _HLL_M
                * F.log(F.lit(float(_HLL_M)) / F.col("n_zero_buckets").cast("double")),
            ).otherwise(F.col("raw")),
            6,
        ).alias("est_hll"),
        "exact_distinct",
    )


# --- frequent items: Misra-Gries propose + exact verify ------------------------

_MG_CAP = 8  # sketch capacity -> guaranteed recall above n/(cap+1)


@register(
    "heavy_hitters_verified",
    oracle=f"""
    WITH keyed AS (
      SELECT CASE WHEN event_id % 3 = 0 THEN 'hot'
                  ELSE CAST(user_id AS VARCHAR) END AS item
      FROM events
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM keyed)
    SELECT item, CAST(COUNT(*) AS BIGINT) AS exact_count,
      MAX(n.n_rows) AS n_rows
    FROM keyed CROSS JOIN n
    GROUP BY item
    HAVING COUNT(*) * {_MG_CAP + 1} > MAX(n.n_rows)
    """,
    doc="Guaranteed frequent items at constant memory: a per-partition "
    "Misra-Gries sketch (capacity 8, Arrow-batched mapInPandas) "
    "PROPOSES candidates, then one exact count over the candidate "
    "semi-join VERIFIES them against the n/(cap+1) threshold. The "
    "sketch stage is partition-dependent, but MG guarantees every true "
    "heavy hitter survives some partition's counters, so the verified "
    "output is partition-INDEPENDENT — which is why this query can "
    "value-hash against an oracle that just does the exact GROUP BY. "
    "At 100 TB the sketch is 8 counters per task and the exact pass "
    "touches only proposed items (a semi-join, never the full "
    "distinct-key aggregation); the skewed key here is synthesized "
    "('hot' = every 3rd event) the same way skew_salted_user_spend "
    "plants its hot key.",
    tags=("relational", "approx", "sketch"),
)
def heavy_hitters_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import misra_gries_candidates

    tune(spark)
    events = load_table(spark, sf_dir, "events")
    keyed = events.select(
        F.when(F.col("event_id") % 3 == 0, F.lit("hot"))
        .otherwise(F.col("user_id").cast("string"))
        .alias("item")
    )
    cand = misra_gries_candidates(keyed, "item", capacity=_MG_CAP).select(
        F.col("candidate").alias("item")
    ).distinct()
    n = keyed.agg(F.count("*").cast("bigint").alias("n_rows"))
    return (
        keyed.join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").cast("bigint").alias("exact_count"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("exact_count") * (_MG_CAP + 1) > F.col("n_rows"))
        .select("item", "exact_count", "n_rows")
    )


# --- KMV theta-sketch set intersection (round-7 tail) -------------------------


def _kmv_intersect_sql(unit_u: str, varchar: str) -> str:
    """Theta-sketch intersection over two KMV sketches (Dasgupta et al.,
    the DataSketches theta estimator): theta = min of the two k-th
    minimum unit hashes, estimate = |{common sketch hashes < theta}| /
    theta. ``unit_u`` is the engine's md5-fold -> [0,1) unit hash of
    ``ck`` (the custkey); ``varchar`` is the dialect's string type."""
    return f"""
    WITH a AS (SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'),
    b AS (SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'),
    ua AS (SELECT ck, {unit_u} AS u FROM a),
    ub AS (SELECT ck, {unit_u} AS u FROM b),
    ra AS (SELECT u, row_number() OVER (ORDER BY u) AS rn, COUNT(*) OVER () AS n FROM ua),
    rb AS (SELECT u, row_number() OVER (ORDER BY u) AS rn, COUNT(*) OVER () AS n FROM ub),
    tha AS (SELECT CASE WHEN MAX(n) < {_KMV_K} THEN 1.0
                        ELSE MAX(CASE WHEN rn = {_KMV_K} THEN u END) END AS theta FROM ra),
    thb AS (SELECT CASE WHEN MAX(n) < {_KMV_K} THEN 1.0
                        ELSE MAX(CASE WHEN rn = {_KMV_K} THEN u END) END AS theta FROM rb),
    th AS (SELECT LEAST(tha.theta, thb.theta) AS theta FROM tha CROSS JOIN thb),
    common AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM ra JOIN rb ON ra.u = rb.u
      CROSS JOIN th
      WHERE ra.rn <= {_KMV_K} AND rb.rn <= {_KMV_K} AND ra.u < th.theta
    ),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection
           FROM a JOIN b ON a.ck = b.ck)
    SELECT common.c AS common_below_theta,
           CAST(th.theta AS DOUBLE) AS theta,
           CAST(common.c / th.theta AS DOUBLE) AS est_intersection,
           ex.exact_intersection
    FROM common CROSS JOIN th CROSS JOIN ex
    """


@register(
    "approx_distinct_intersect_kmv",
    oracle=_kmv_intersect_sql(
        duck_hex13_to_long("md5(CAST(ck AS VARCHAR))") + " / 4503599627370496.0",
        "VARCHAR",
    ),
    doc="Theta-sketch SET INTERSECTION between two KMV distinct sketches "
    "(customers with finished vs open orders): each side keeps only its "
    f"k={_KMV_K} minimum md5-unit hashes, theta = min of the two k-th "
    "minima, and |A∩B| is estimated as (common sketch hashes below "
    "theta) / theta — the DataSketches theta estimator, completing the "
    "sketch set-algebra next to approx_distinct_kmv (cardinality) and "
    "approx_distinct_kmv_merged (union mergeability). Pure "
    "deterministic hashing, so the ESTIMATE itself hash-matches DuckDB; "
    "the exact intersection rides along as the accuracy yardstick. At "
    "100 TB each sketch is a bounded-heap aggregate (k*8 bytes, "
    "map-side mergeable) and the intersection touches only the two "
    "k-row sketches — never the raw key sets.",
    tags=("relational", "approx", "sketch"),
)
def approx_distinct_intersect_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ["orders"])
    u = "conv(substring(md5(CAST(ck AS STRING)), 1, 13), 16, 10) / 4503599627370496.0"
    return spark.sql(_kmv_intersect_sql(u, "STRING"))


def _kmv_diff_sql(unit_u: str) -> str:
    """Theta-sketch A-NOT-B over two KMV sketches: count sketch-A hashes
    below theta that are absent from sketch B (every B hash < theta is
    necessarily IN sketch B, since theta <= theta_B — the absence test
    is exact below theta), estimate = count / theta."""
    return f"""
    WITH a AS (SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'),
    b AS (SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'),
    ua AS (SELECT ck, {unit_u} AS u FROM a),
    ub AS (SELECT ck, {unit_u} AS u FROM b),
    ra AS (SELECT u, row_number() OVER (ORDER BY u) AS rn, COUNT(*) OVER () AS n FROM ua),
    rb AS (SELECT u, row_number() OVER (ORDER BY u) AS rn, COUNT(*) OVER () AS n FROM ub),
    tha AS (SELECT CASE WHEN MAX(n) < {_KMV_K} THEN 1.0
                        ELSE MAX(CASE WHEN rn = {_KMV_K} THEN u END) END AS theta FROM ra),
    thb AS (SELECT CASE WHEN MAX(n) < {_KMV_K} THEN 1.0
                        ELSE MAX(CASE WHEN rn = {_KMV_K} THEN u END) END AS theta FROM rb),
    th AS (SELECT LEAST(tha.theta, thb.theta) AS theta FROM tha CROSS JOIN thb),
    d AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c
      FROM ra CROSS JOIN th
      WHERE ra.rn <= {_KMV_K} AND ra.u < th.theta
        AND NOT EXISTS (SELECT 1 FROM rb WHERE rb.u = ra.u AND rb.rn <= {_KMV_K})
    ),
    ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_diff
      FROM a WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.ck = a.ck)
    )
    SELECT d.c AS only_a_below_theta,
           CAST(th.theta AS DOUBLE) AS theta,
           CAST(d.c / th.theta AS DOUBLE) AS est_diff,
           ex.exact_diff
    FROM d CROSS JOIN th CROSS JOIN ex
    """


@register(
    "approx_distinct_diff_kmv",
    oracle=_kmv_diff_sql(
        duck_hex13_to_long("md5(CAST(ck AS VARCHAR))") + " / 4503599627370496.0"
    ),
    doc="Theta-sketch SET DIFFERENCE |A \\ B| (customers with finished "
    "but not open orders), completing the sketch set algebra next to "
    "cardinality (approx_distinct_kmv), union mergeability "
    "(_kmv_merged) and intersection (_intersect_kmv): below theta = "
    "min(theta_A, theta_B) the sketches are EXACT membership oracles "
    "(every hash of a set below its own theta is necessarily among its "
    "k minima), so A-not-B counts sketch-A hashes below theta absent "
    "from sketch B, scaled by 1/theta — the DataSketches a-not-b "
    "estimator. The anti-membership probe is a NOT EXISTS on the k-row "
    "sketch relations (anti join), never on the raw key sets; exact "
    "difference rides along as the yardstick. Deterministic md5 "
    "hashing makes the estimate itself hash-checkable.",
    tags=("relational", "approx", "sketch"),
)
def approx_distinct_diff_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ["orders"])
    u = "conv(substring(md5(CAST(ck AS STRING)), 1, 13), 16, 10) / 4503599627370496.0"
    return spark.sql(_kmv_diff_sql(u))


def _kmv_cube_sql(unit_u: str) -> str:
    """Sketch-cube range query: per-month KMV sketches of the active
    customer set, merged at query time over a month range; the merged
    estimate must equal the direct sketch over the range (the global
    k-minima are inside the union of per-month k-minima)."""
    return f"""
    WITH d AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             o_custkey AS ck
      FROM orders
      GROUP BY 1, 2
    ),
    u AS (SELECT month, ck, {unit_u} AS u FROM d),
    per_month AS (
      SELECT month, u FROM (
        SELECT month, u,
               row_number() OVER (PARTITION BY month ORDER BY u) AS rn
        FROM u
      ) WHERE rn <= {_KMV_K}
    ),
    rng AS (
      SELECT DISTINCT u FROM per_month
      WHERE month >= TIMESTAMP '1996-01-01 00:00:00'
        AND month <  TIMESTAMP '1997-01-01 00:00:00'
    ),
    merged AS (
      SELECT u, row_number() OVER (ORDER BY u) AS rn, COUNT(*) OVER () AS n
      FROM rng
    ),
    direct_keys AS (
      SELECT ck, MIN(u) AS u FROM u
      WHERE month >= TIMESTAMP '1996-01-01 00:00:00'
        AND month <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY ck
    ),
    direct AS (
      SELECT u, row_number() OVER (ORDER BY u) AS rn, COUNT(*) OVER () AS n
      FROM direct_keys
    ),
    em AS (
      SELECT CAST(CASE WHEN MAX(n) < {_KMV_K} THEN CAST(MAX(n) AS DOUBLE)
                  ELSE {_KMV_K - 1}.0 / MAX(CASE WHEN rn = {_KMV_K} THEN u END) END
             AS DOUBLE) AS est_merged
      FROM merged
    ),
    ed AS (
      SELECT CAST(CASE WHEN MAX(n) < {_KMV_K} THEN CAST(MAX(n) AS DOUBLE)
                  ELSE {_KMV_K - 1}.0 / MAX(CASE WHEN rn = {_KMV_K} THEN u END) END
             AS DOUBLE) AS est_direct,
             CAST(MAX(n) AS BIGINT) AS exact_customers
      FROM direct
    )
    SELECT est_merged, est_direct,
           CAST(CASE WHEN est_merged = est_direct THEN 1 ELSE 0 END AS BIGINT)
             AS merge_is_lossless,
           exact_customers
    FROM em CROSS JOIN ed
    """


@register(
    "approx_distinct_kmv_cube",
    oracle=_kmv_cube_sql(
        duck_hex13_to_long("md5(CAST(ck AS VARCHAR))") + " / 4503599627370496.0"
    ),
    doc="Sketch CUBE: pre-aggregated per-month KMV sketches answer an "
    "arbitrary month-range distinct-customer query by query-time merge "
    "— the warehouse pattern that turns a 100 TB COUNT(DISTINCT) over "
    "any date range into a union of 12 k-row sketches (the global "
    "k-minima over a range are necessarily inside the union of its "
    "months' k-minima, so the merge is exactly lossless — the "
    "in-query merge_is_lossless flag must be 1 and the whole "
    "demonstration hash-matches DuckDB). Extends "
    "approx_distinct_kmv_merged's executor-shard proof to CALENDAR "
    "partitions, which is what a real sketch rollup table is keyed "
    "by. The direct side dedups keys (MIN(u) per key) exactly as the "
    "sketch union dedups hashes; exact count rides along.",
    tags=("relational", "approx", "sketch"),
)
def approx_distinct_kmv_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ["orders"])
    u = "conv(substring(md5(CAST(ck AS STRING)), 1, 13), 16, 10) / 4503599627370496.0"
    return spark.sql(_kmv_cube_sql(u))


# --- join-size estimation via count-min inner product --------------------------


def _cms_join_sql(hexfn, str_t: str, mat: str = "") -> str:
    """Shared SQL text modulo the hex fold. Estimates |H1 join H2 on
    l_suppkey| (two ship-date halves of lineitem) as the count-min
    inner product min_r sum_b cmsA[r][b]*cmsB[r][b]."""

    def bkt(key: str) -> str:
        h = hexfn(f"md5(CAST(q.r AS {str_t}) || '|' || CAST({key} AS {str_t}))")
        return f"CAST({h} % {_CMS_W} AS BIGINT)"

    # The sketches are built FROM the per-key count relations, not from
    # the raw halves: a CMS cell is Sum(n_k) over keys hashing into it,
    # so fanning the KEY-GRAIN relation x4 is identical to fanning the
    # fact — but the x4 expansion then touches ~|suppliers| rows instead
    # of the fact (at sf10 the fact-side fan-out put 240M rows through
    # the sketch aggregate: ~44 s; this form is ~13 s). The key-grain
    # relations are MATERIALIZED on the DuckDB side (CTE-inlining rule);
    # Spark re-inlines them per reference, but each is now a plain
    # column-pruned aggregate scan — cheap, and AQE reuses the exchange.
    return f"""
    WITH q (r) AS (VALUES (0), (1), (2), (3)),
    ca AS{mat} (
      SELECT l_suppkey AS k, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
      WHERE l_shipdate < DATE '1995-06-01' GROUP BY 1
    ),
    cb AS{mat} (
      SELECT l_suppkey AS k, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
      WHERE l_shipdate >= DATE '1995-06-01' GROUP BY 1
    ),
    cmsa AS (
      SELECT q.r, {bkt('k')} AS b, CAST(SUM(n) AS BIGINT) AS c
      FROM ca CROSS JOIN q GROUP BY q.r, {bkt('k')}
    ),
    cmsb AS (
      SELECT q.r, {bkt('k')} AS b, CAST(SUM(n) AS BIGINT) AS c
      FROM cb CROSS JOIN q GROUP BY q.r, {bkt('k')}
    ),
    ip AS (
      SELECT a.r, CAST(SUM(a.c * b.c) AS BIGINT) AS dot
      FROM cmsa a JOIN cmsb b ON a.r = b.r AND a.b = b.b
      GROUP BY a.r
    ),
    est AS (SELECT CAST(MIN(dot) AS BIGINT) AS est_rows FROM ip),
    exact AS (
      SELECT CAST(COALESCE(SUM(ca.n * cb.n), 0) AS BIGINT) AS exact_rows
      FROM ca JOIN cb ON ca.k = cb.k
    )
    SELECT est.est_rows, exact.exact_rows,
           CAST(est.est_rows AS DOUBLE) / exact.exact_rows AS overestimate_ratio
    FROM est CROSS JOIN exact
    """


def _register_cms_join():
    from ..functions.text import hex13_to_long  # noqa: F401  (spark twin below)
    from .oracle_dialect import duck_hex13_to_long

    def spark_hex(expr: str) -> str:
        return f"CAST(conv(substring({expr}, 1, 13), 16, 10) AS BIGINT)"

    @register(
        "sketch_cms_join_size",
        oracle=_cms_join_sql(duck_hex13_to_long, "VARCHAR", mat=" MATERIALIZED"),
        doc="Join-size estimation via the count-min inner product "
        "(Cormode & Muthukrishnan 2005, sec. 4.2): |A join B on k| = "
        "sum_k a_k*b_k, estimated as min over the 4 hash rows of the "
        "bucket-wise product sum of A's and B's sketches — the "
        "cardinality-estimation primitive a query planner uses to "
        "choose join strategies WITHOUT scanning the join (one-sided: "
        "estimate >= exact, reported as the overestimate ratio "
        "against the exact per-key product sum). A and B are the two "
        "ship-date halves of lineitem on the supplier key. Both "
        "sketches collapse map-side to d*w = 4096 cells before any "
        "shuffle — building them over 100 TB moves ~constant bytes, "
        "while the exact answer needs the full per-key count join. "
        "md5 bucket hashing keeps every cell, and therefore the "
        "estimate itself, bit-identical cross-engine.",
        tags=("relational", "approx"),
    )
    def sketch_cms_join_size(spark, sf_dir):
        tune(spark)
        register_views(spark, sf_dir, ("lineitem",))
        return spark.sql(_cms_join_sql(spark_hex, "STRING"))

    return sketch_cms_join_size


_register_cms_join()
