"""Warehouse-maintenance operators: CDC snapshot diff, SCD Type-2
history, and incremental (delta-merge) aggregate view maintenance.

The reference's store is rebuild-from-scratch (`App.tsx` re-ingests the
whole PDF; `services/vectorDb.ts` has no update path). A production
pipeline over the same data maintains derived state incrementally:
detect what changed between snapshots (CDC), keep attribute history
(SCD2), and refresh aggregates from deltas instead of recomputing
(incremental view maintenance). All three are pure relational algebra
here, with exact DuckDB twins.

Cross-engine determinism:

- Money is exact-integer cents (``CAST(round(price*100) AS BIGINT)``);
  sums are then associative, so base+delta merge equals full recompute
  bitwise regardless of partitioning.
- Row content hashes are ``md5`` over a fixed ``'|'``-joined canonical
  string of integer-rendered fields (identical text in both engines).
- ``date_trunc('month', ts)`` returns DATE in DuckDB but TIMESTAMP in
  Spark — the oracles cast back to TIMESTAMP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import load_table, register_views
from .registry import register

#: CDC snapshot cut points (orders span 1995-01 .. 2001-08).
_CUT1 = "2000-01-01 00:00:00"
_CUT2 = "2001-01-01 00:00:00"
#: Deterministic mutation rules that derive snapshot v2 from v1.
_DEL_MOD = 97  # o_orderkey % 97 == 0 → deleted in v2
_UPD_MOD = 13  # o_orderkey % 13 == 0 → price bumped +500 cents in v2
_UPD_CENTS = 500

_CENTS_SQL = "CAST(round(o_totalprice * 100) AS BIGINT)"


def _cents_col():
    return F.round(F.col("o_totalprice") * 100, 0).cast("bigint")


def _row_hash_sql(cents_expr: str) -> str:
    return (
        "md5(o_orderstatus || '|' || o_orderpriority || '|' || "
        f"CAST({cents_expr} AS VARCHAR))"
    )


def _row_hash_col(cents):
    return F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            cents.cast("string"),
        )
    )


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH v1 AS (
      SELECT o_orderkey, {_row_hash_sql(_CENTS_SQL)} AS row_hash
      FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT1}'
    ),
    v2 AS (
      SELECT o_orderkey,
        {_row_hash_sql(
            f"{_CENTS_SQL} + CASE WHEN o_orderkey % {_UPD_MOD} = 0 THEN {_UPD_CENTS} ELSE 0 END"
        )} AS row_hash
      FROM orders
      WHERE o_orderdate < TIMESTAMP '{_CUT2}' AND o_orderkey % {_DEL_MOD} <> 0
    )
    SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
      CASE WHEN v1.o_orderkey IS NULL THEN 'I'
           WHEN v2.o_orderkey IS NULL THEN 'D'
           ELSE 'U' END AS change_type,
      v1.row_hash AS old_hash, v2.row_hash AS new_hash
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.row_hash <> v2.row_hash
    """,
    doc="Change-data-capture between two table snapshots: full outer "
    "join on the key, compare md5 row-content hashes, emit I/D/U rows "
    "only (unchanged rows drop out). Snapshot v2 is derived from v1 by "
    "deterministic rules (rows after the cut inserted, keys %97 "
    "deleted, keys %13 price-bumped) so the diff is exactly known. At "
    "100 TB both snapshots hash-partition on the key — the join is "
    "co-partitioned, each task diffs its own key range, and the hash "
    "comparison means wide rows never travel twice (ship key+hash, "
    "fetch full rows only for the changed keys).",
    tags=("maintenance", "cdc"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderdate") < F.lit(_CUT1).cast("timestamp")).select(
        "o_orderkey", _row_hash_col(_cents_col()).alias("row_hash")
    )
    bump = F.when(F.col("o_orderkey") % _UPD_MOD == 0, F.lit(_UPD_CENTS)).otherwise(
        F.lit(0)
    )
    v2 = (
        orders.filter(F.col("o_orderdate") < F.lit(_CUT2).cast("timestamp"))
        .filter(F.col("o_orderkey") % _DEL_MOD != 0)
        .select("o_orderkey", _row_hash_col(_cents_col() + bump).alias("row_hash"))
    )
    j = v1.withColumnRenamed("row_hash", "old_hash").join(
        v2.withColumnRenamed("row_hash", "new_hash"),
        "o_orderkey",
        "full_outer",
    )
    return j.filter(
        F.col("old_hash").isNull()
        | F.col("new_hash").isNull()
        | (F.col("old_hash") != F.col("new_hash"))
    ).select(
        "o_orderkey",
        F.when(F.col("old_hash").isNull(), "I")
        .when(F.col("new_hash").isNull(), "D")
        .otherwise("U")
        .alias("change_type"),
        "old_hash",
        "new_hash",
    )


@register(
    "cdc_apply_roundtrip",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
      {_CENTS_SQL} + CASE WHEN o_orderkey % {_UPD_MOD} = 0
                          THEN {_UPD_CENTS} ELSE 0 END AS price_cents
    FROM orders
    WHERE o_orderdate < TIMESTAMP '{_CUT2}' AND o_orderkey % {_DEL_MOD} <> 0
    """,
    doc="The CDC round-trip law as a hash-checked query: "
    "apply_changes(v1, snapshot_diff(v1, v2)) must equal v2 exactly — "
    "the oracle IS v2, computed directly, while the Spark side runs "
    "the diff (full-outer key join, null-safe payload compare) and "
    "then the apply (anti-join touched keys, union I/U payloads) from "
    "operators/cdc.py. streaming/maintenance.stream_apply_cdc drives "
    "the same apply_changes per micro-batch, and "
    "tests/test_streaming_maintenance.py proves any batch split of "
    "the change feed converges to this same state.",
    tags=("maintenance", "cdc"),
)
def cdc_apply_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import apply_changes, snapshot_diff

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    payload = ["o_orderstatus", "o_orderpriority", "price_cents"]
    v1 = orders.filter(F.col("o_orderdate") < F.lit(_CUT1).cast("timestamp")).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        _cents_col().alias("price_cents"),
    )
    bump = F.when(F.col("o_orderkey") % _UPD_MOD == 0, F.lit(_UPD_CENTS)).otherwise(
        F.lit(0)
    )
    v2 = (
        orders.filter(F.col("o_orderdate") < F.lit(_CUT2).cast("timestamp"))
        .filter(F.col("o_orderkey") % _DEL_MOD != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            (_cents_col() + bump).alias("price_cents"),
        )
    )
    changes = snapshot_diff(v1, v2, "o_orderkey", payload)
    return apply_changes(v1, changes, "o_orderkey", payload)


@register(
    "scd2_customer_status_history",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey)
        - row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                             ORDER BY o_orderdate, o_orderkey) AS island
      FROM orders
    ),
    runs AS (
      SELECT o_custkey, o_orderstatus AS status,
        MIN(o_orderdate) AS valid_from,
        MIN(rn) AS seq,
        CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS rn
            FROM seq) s
      GROUP BY o_custkey, o_orderstatus, island
    )
    SELECT o_custkey, status, valid_from,
      lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY seq)
        AS valid_to,
      lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY seq)
        IS NULL AS is_current,
      n_orders
    FROM runs
    """,
    doc="Slowly-changing-dimension Type 2: collapse each customer's "
    "order-status stream into validity intervals (gaps-and-islands via "
    "the two-row_number difference), then valid_to = next interval's "
    "valid_from (lead window) and is_current = last interval. All "
    "windows partition by o_custkey, so at 100 TB this is one shuffle "
    "on the customer key and every window stays inside its partition — "
    "no global sort anywhere. Ties inside a day break on o_orderkey so "
    "the island assignment is deterministic under any partitioning.",
    tags=("maintenance", "scd"),
)
def scd2_customer_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    order_cols = [F.asc("o_orderdate"), F.asc("o_orderkey")]
    w_all = Window.partitionBy("o_custkey").orderBy(*order_cols)
    w_status = Window.partitionBy("o_custkey", "o_orderstatus").orderBy(*order_cols)
    seq = orders.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        F.row_number().over(w_all).alias("rn"),
        (F.row_number().over(w_all) - F.row_number().over(w_status)).alias("island"),
    )
    runs = seq.groupBy("o_custkey", "o_orderstatus", "island").agg(
        F.min("o_orderdate").alias("valid_from"),
        F.min("rn").alias("seq"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    # runs are ordered by their first occurrence (min rn), which is
    # tie-free even when several runs of one customer start on the same
    # date (the fixture has day-granularity timestamps)
    w_run = Window.partitionBy("o_custkey").orderBy("seq")
    nxt = F.lead("valid_from").over(w_run)
    return runs.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "n_orders",
    )


@register(
    "incremental_agg_merge",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      CAST(COUNT(*) AS BIGINT) AS order_cnt,
      CAST(SUM({_CENTS_SQL}) AS BIGINT) AS revenue_cents
    FROM orders GROUP BY 1
    """,
    doc="Incremental materialized-view maintenance: the monthly revenue "
    "rollup is kept as mergeable partials — the standing view covers "
    "orders before the cut, the delta covers new arrivals — and the "
    "refresh is a full-outer merge that coalesce-adds counts and "
    "exact-integer cent sums. The oracle is the FULL recompute over "
    "all orders: hash equality is the proof that merge(base, delta) == "
    "recompute, which only holds because the measures are associative "
    "(counts, integer sums — never fp64 sums). At 100 TB the delta is "
    "one partition's scan and the merge touches |months| rows, so a "
    "refresh costs O(delta), not O(history).",
    tags=("maintenance", "incremental"),
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).alias("month")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count("*").cast("bigint").alias("order_cnt"),
            F.sum(_cents_col()).cast("bigint").alias("revenue_cents"),
        )

    cut = F.lit(_CUT2).cast("timestamp")
    base = partial(orders.filter(F.col("o_orderdate") < cut))
    delta = partial(orders.filter(F.col("o_orderdate") >= cut))
    merged = base.select(
        "month",
        F.col("order_cnt").alias("b_cnt"),
        F.col("revenue_cents").alias("b_cents"),
    ).join(
        delta.select(
            "month",
            F.col("order_cnt").alias("d_cnt"),
            F.col("revenue_cents").alias("d_cents"),
        ),
        "month",
        "full_outer",
    )
    zero = F.lit(0).cast("bigint")
    return merged.select(
        "month",
        (F.coalesce(F.col("b_cnt"), zero) + F.coalesce(F.col("d_cnt"), zero)).alias(
            "order_cnt"
        ),
        (
            F.coalesce(F.col("b_cents"), zero) + F.coalesce(F.col("d_cents"), zero)
        ).alias("revenue_cents"),
    )


#: Dimension-mutation rule for the join-view maintenance demo:
#: customers with c_custkey % 31 == 0 move to this segment in v2.
_SEG_MOD = 31
_SEG_NEW = "SEG_MOVED"


@register(
    "incremental_join_merge",
    oracle=f"""
    WITH cnew AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % {_SEG_MOD} = 0 THEN '{_SEG_NEW}'
                  ELSE c_mktsegment END AS segment
      FROM customer
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           CAST(SUM({_CENTS_SQL}) AS BIGINT) AS revenue_cents
    FROM orders o JOIN cnew c ON o.o_custkey = c.c_custkey
    GROUP BY segment
    """,
    doc="Incremental maintenance of a JOIN view under TWO-SIDED change — "
    "the delta-rule sibling of incremental_agg_merge: the per-segment "
    "revenue rollup over orders JOIN customer is refreshed from (a) new "
    "fact rows joined against the NEW dimension, and (b) dimension "
    "attribute changes replayed as counting-IVM retractions (the moved "
    "customer's historical orders enter the delta twice: negative "
    "counts/cents against the old segment, positive against the new — "
    "Z-relation / counting multiset maintenance). The merge "
    "coalesce-adds signed partials per segment; hash equality against "
    "the oracle (a FULL recompute of orders ⋈ mutated-customer) proves "
    "merge(base, fact-delta, dim-delta) == recompute, which holds "
    "because the measures are associative integers and retractions "
    "cancel exactly. At 100 TB the refresh touches |new orders| + "
    "|orders of changed customers| (semi-join on the changed keys) + "
    "|segments| rows — never the join history.",
    tags=("maintenance", "incremental"),
)
def incremental_join_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cut = F.lit(_CUT2).cast("timestamp")

    c_old = customer.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    c_new = customer.select(
        "c_custkey",
        F.when(F.col("c_custkey") % _SEG_MOD == 0, F.lit(_SEG_NEW))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    )
    o_old = orders.filter(F.col("o_orderdate") < cut)
    o_new = orders.filter(F.col("o_orderdate") >= cut)

    def partial(o: DataFrame, c: DataFrame, sign: int) -> DataFrame:
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("segment")
            .agg(
                (F.lit(sign) * F.count("*")).cast("bigint").alias("order_cnt"),
                (F.lit(sign) * F.sum(_cents_col())).cast("bigint").alias("revenue_cents"),
            )
        )

    # standing view state: old facts against the old dimension
    base = partial(o_old, c_old, 1)
    # fact delta: new orders join the NEW dimension version
    d_fact = partial(o_new, c_new, 1)
    # dimension delta: changed customers' historical orders retract from
    # the old segment and re-insert into the new one
    changed_keys = customer.filter(F.col("c_custkey") % _SEG_MOD == 0).select("c_custkey")
    o_changed = o_old.join(
        F.broadcast(changed_keys), o_old.o_custkey == changed_keys.c_custkey, "left_semi"
    )
    d_retract = partial(o_changed, c_old, -1)
    d_insert = partial(o_changed, c_new, 1)

    merged = base.unionByName(d_fact).unionByName(d_retract).unionByName(d_insert)
    return (
        merged.groupBy("segment")
        .agg(
            F.sum("order_cnt").cast("bigint").alias("order_cnt"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
        .filter(F.col("order_cnt") > 0)
    )


# --- dataset fingerprint (order-free per-partition row hashes) -------------------


def _fingerprint_sql(hexfn, str_t: str) -> str:
    row = (
        f"md5(concat(CAST(o_orderkey AS {str_t}), '|', CAST(o_custkey AS {str_t}),"
        f" '|', CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS {str_t}),"
        f" '|', CAST({{daydiff}} AS {str_t})))"
    )
    return f"""
    WITH h AS (
      SELECT CAST({{month}} AS BIGINT) AS month_idx,
             {hexfn(row)} AS rh
      FROM orders
    )
    SELECT month_idx, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(rh) AS BIGINT) AS xor_fingerprint
    FROM h GROUP BY month_idx
    """


def _register_fingerprint():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    spark_sql = _fingerprint_sql(_spark_hex13, "STRING").format(
        daydiff="datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')",
        month="year(o_orderdate) * 12 + month(o_orderdate)",
    )
    duck_sql = _fingerprint_sql(duck_hex13_to_long, "VARCHAR").format(
        daydiff="date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))",
        month="year(o_orderdate) * 12 + month(o_orderdate)",
    )

    @register(
        "audit_partition_fingerprints",
        oracle=duck_sql,
        doc="Order-free per-partition dataset fingerprints: each order "
        "row hashes (key columns + exact integer renderings of money "
        "and date — never raw float/timestamp strings, whose text "
        "forms differ across engines) to a 52-bit integer, and each "
        "month partition reports row count + the BIT_XOR of its row "
        "hashes — XOR is commutative/associative/self-inverse, so the "
        "fingerprint is partitioning- and order-independent and two "
        "tables can be compared partition-by-partition without moving "
        "data (the replication/migration equality check; a mismatched "
        "month pinpoints WHERE to diff). Map-side hash + one "
        "month-keyed aggregate; no overflow at any scale (XOR, not "
        "SUM). Companion to audit_expectations (schema/contract) and "
        "the export manifest's per-shard checksums.",
        tags=("audit", "maintenance"),
    )
    def audit_partition_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, ("orders",))
        return spark.sql(spark_sql)

    return audit_partition_fingerprints


_register_fingerprint()
