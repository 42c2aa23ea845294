"""Deterministic local fixture generator for scale-up evidence.

``/root/testdata`` tops out at sf0.1 (read-only, driver-owned). The
VERDICT r6 gap #2 asks for ≥sf1.0 evidence: proof that the catalog's
plan SHAPES survive when the fact tables outgrow broadcast thresholds,
and that wall-time grows sub-linearly per core. This script generates a
schema-compatible fixture set at any scale factor — same ten tables,
same column names/types/value domains as TESTDATA.md / FIXTURES.md,
derived entirely from hash functions of the row id (seeded, so every
run is bit-identical) — fully distributed: ``spark.range`` → column
expressions, zero driver-side data.

This set is for PLAN-SHAPE and THROUGHPUT measurement, not oracle
parity (the driver's sf0.01 oracle gate already proves value
correctness; identical relational plans at 10x rows don't change
values' correctness, they change exchange/broadcast decisions — the
thing measured here).

Usage: python tools/gen_sf.py [sf] [out_dir]
  default sf=1.0 → out_dir=testdata_local/sf1.0  (git-ignored)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

# sf0.1 row counts x10 per unit sf (events/documents/embeddings follow the
# driver's observed sf0.1 ratios).
COUNTS = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

VOCAB = (
    "batch part spark line column order small sort fast value scan a hash slow "
    "group agg filter query join shuffle stage task core node disk read write "
    "plan tree cost push prune stream state window late event time key skew"
).split()


def h(col, salt: str) -> F.Column:
    """Deterministic uniform int64 from (row id, salt, SEED)."""
    return F.xxhash64(col, F.lit(salt), F.lit(SEED))


def u(col, salt: str) -> F.Column:
    """Deterministic uniform double in [0, 1)."""
    return (F.pmod(h(col, salt), F.lit(1_000_000_007)) / F.lit(1_000_000_007.0))


def gen_tables(spark: SparkSession, sf: float) -> dict[str, DataFrame]:
    n = {t: max(1, int(c * sf)) for t, c in COUNTS.items()}
    n_cust, n_supp, n_part = n["customer"], n["supplier"], n["part"]
    n_ord = n["orders"]

    # Value domains MUST match the driver fixtures exactly — r12 found
    # that lowercase nation_/region_ names made every n_name/r_name
    # literal filter vacuously empty in local scale-up runs (the
    # sweep/audit evidence for those queries was weaker than recorded).
    region_names = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    region = spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.element_at(
            F.array(*[F.lit(r) for r in region_names]), (F.col("id") + 1).cast("int")
        ).alias("r_name"),
    )
    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        F.pmod(F.col("id"), F.lit(5)).cast("int").alias("n_regionkey"),
    )
    customer = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("c_name"),
        F.pmod(h(F.col("id"), "cnat"), F.lit(25)).cast("int").alias("c_nationkey"),
        F.round(u(F.col("id"), "cbal") * 10999.65 - 999.85, 2).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(s) for s in ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")]),
            (F.pmod(h(F.col("id"), "cseg"), F.lit(5)) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    supplier = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("s_name"),
        F.pmod(h(F.col("id"), "snat"), F.lit(25)).cast("int").alias("s_nationkey"),
        F.round(u(F.col("id"), "sbal") * 10999.65 - 999.85, 2).alias("s_acctbal"),
    )
    sizes = ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
    nouns = ("ring", "bolt", "washer", "spring", "gear", "pin", "cap", "rod")
    adjs = ("large", "hot", "cold", "small", "shiny", "dull", "round", "flat")
    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.element_at(F.array(*[F.lit(a) for a in adjs]), (F.pmod(h(F.col("id"), "padj"), F.lit(8)) + 1).cast("int")),
            F.lit(" "),
            F.element_at(F.array(*[F.lit(x) for x in nouns]), (F.pmod(h(F.col("id"), "pnoun"), F.lit(8)) + 1).cast("int")),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), F.pmod(h(F.col("id"), "pbrand"), F.lit(25)) + 1).alias("p_brand"),
        F.element_at(F.array(*[F.lit(s) for s in sizes]), (F.pmod(h(F.col("id"), "ptype"), F.lit(6)) + 1).cast("int")).alias("p_type"),
        (F.pmod(h(F.col("id"), "psize"), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + F.pmod(F.col("id"), F.lit(1000)) / 10.0, 2).alias("p_retailprice"),
    )
    base_ts = F.lit("1995-01-01 00:00:00").cast("timestamp")
    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(h(F.col("id"), "ocust"), F.lit(n_cust)).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O"), F.lit("P")),
            (F.pmod(h(F.col("id"), "ostat"), F.lit(3)) + 1).cast("int"),
        ).alias("o_orderstatus"),
        F.round(u(F.col("id"), "oprice") * 498991.27 + 1001.91, 2).alias("o_totalprice"),
        F.timestamp_add("DAY", F.pmod(h(F.col("id"), "odate"), F.lit(2404)).cast("int"), base_ts).alias("o_orderdate"),
        F.element_at(
            F.array(*[F.lit(p) for p in ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")]),
            (F.pmod(h(F.col("id"), "oprio"), F.lit(5)) + 1).cast("int"),
        ).alias("o_orderpriority"),
    )
    lineitem = spark.range(n["lineitem"]).select(
        F.pmod(h(F.col("id"), "lord"), F.lit(n_ord)).alias("l_orderkey"),
        F.pmod(h(F.col("id"), "lpart"), F.lit(n_part)).alias("l_partkey"),
        F.pmod(h(F.col("id"), "lsupp"), F.lit(n_supp)).alias("l_suppkey"),
        (F.pmod(h(F.col("id"), "lline"), F.lit(7)) + 1).cast("int").alias("l_linenumber"),
        (F.pmod(h(F.col("id"), "lqty"), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        F.round(u(F.col("id"), "lext") * 99000.0 + 1000.0, 2).alias("l_extendedprice"),
        (F.pmod(h(F.col("id"), "ldisc"), F.lit(11)) / 100.0).alias("l_discount"),
        (F.pmod(h(F.col("id"), "ltax"), F.lit(9)) / 100.0).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (F.pmod(h(F.col("id"), "lflag"), F.lit(3)) + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O")),
            (F.pmod(h(F.col("id"), "lstat"), F.lit(2)) + 1).cast("int"),
        ).alias("l_linestatus"),
        F.timestamp_add("DAY", F.pmod(h(F.col("id"), "lship"), F.lit(2499)).cast("int") + 1, base_ts).alias("l_shipdate"),
    )
    ev_base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    n_users = max(1, int(1500 * (sf * 10)))  # sf0.1 had 1500 users
    events = spark.range(n["events"]).select(
        F.col("id").alias("event_id"),
        F.timestamp_add(
            "SECOND", (F.col("id") * 6) + F.pmod(h(F.col("id"), "ejit"), F.lit(6)).cast("int"), ev_base
        ).alias("ts"),
        F.pmod(h(F.col("id"), "euser"), F.lit(n_users)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(e) for e in ("click", "view", "purchase", "signup", "error")]),
            (F.pmod(h(F.col("id"), "etype"), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        F.round(u(F.col("id"), "eval") * 560.21, 2).alias("value"),
        F.concat(F.lit('{"k": '), F.pmod(h(F.col("id"), "ek"), F.lit(100)), F.lit("}")).alias("props"),
    )
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    n_words = F.pmod(h(F.col("id"), "dlen"), F.lit(80)) + 8
    words = F.transform(
        F.sequence(F.lit(1), n_words.cast("int")),
        lambda i: F.element_at(vocab_arr, (F.pmod(F.xxhash64(F.col("id"), i, F.lit(SEED)), F.lit(len(VOCAB))) + 1).cast("int")),
    )
    documents = (
        spark.range(n["documents"])
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
            F.element_at(
                F.array(*[F.lit(lg) for lg in ("en", "es", "fr", "de", "zh")]),
                (F.pmod(h(F.col("id"), "dlang"), F.lit(5)) + 1).cast("int"),
            ).alias("lang"),
            F.concat(F.lit("src"), F.pmod(h(F.col("id"), "dsrc"), F.lit(20))).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    # 10 planted cluster centers, unit-ish noise — same shape as fixtures
    dim, n_lab = 64, 10
    label = F.pmod(h(F.col("id"), "elab"), F.lit(n_lab)).cast("int")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.xxhash64(label, j, F.lit("center"), F.lit(SEED)), F.lit(1000)) / 500.0
            - 1.0
            + (F.pmod(F.xxhash64(F.col("id"), j, F.lit("noise"), F.lit(SEED)), F.lit(1000)) / 1000.0 - 0.5)
        ).cast("float"),
    )
    embeddings = spark.range(n["embeddings"]).select(
        F.col("id").alias("vec_id"), emb.alias("embedding"), label.alias("label")
    )
    return {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
        "events": events,
        "documents": documents,
        "embeddings": embeddings,
    }


#: Categorical columns whose VALUE DOMAIN is contract surface: a
#: literal-filter query (n_name = 'NATION_2', r_name = 'ASIA',
#: lang = 'zh') against a wrong-domain fixture is vacuously empty in
#: both engines — green, proving nothing (the r12 find: lowercase
#: nation_/region_ names silently voided every such query's local
#: scale-up evidence for three rounds). After writing, gen_sf checks
#: each domain against the driver's smallest fixture and FAILS loudly
#: on drift. Keys whose domains legitimately grow with sf (p_brand at
#: tiny sf) use subset direction driver ⊆ generated ∪ generated ⊆
#: driver as appropriate: these are all FIXED-cardinality domains, so
#: exact equality is required.
DOMAIN_COLS = (
    ("region", "r_name"),
    ("nation", "n_name"),
    ("customer", "c_mktsegment"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("events", "event_type"),
    ("part", "p_type"),
    ("documents", "lang"),
)


def check_domains(spark: SparkSession, out: str, driver_dir: str = "/root/testdata/sf0.001") -> list[str]:
    """Compare fixed-cardinality categorical domains against the driver
    fixture; return a list of human-readable mismatches (empty = ok)."""
    from pyspark.sql import functions as F  # local: keep module import light

    problems: list[str] = []
    for table, col in DOMAIN_COLS:
        drv_path = os.path.join(driver_dir, f"{table}.parquet")
        gen_path = os.path.join(out, f"{table}.parquet")
        if not os.path.exists(drv_path) or not os.path.exists(gen_path):
            continue
        drv = {
            r[0]
            for r in spark.read.parquet(drv_path).select(col).distinct().collect()
        }
        gen = {
            r[0]
            for r in spark.read.parquet(gen_path).select(col).distinct().collect()
        }
        if drv != gen:
            problems.append(
                f"{table}.{col}: driver={sorted(drv)[:8]} generated={sorted(gen)[:8]}"
            )
    return problems


def main() -> None:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--tables" in argv:
        # regenerate a subset in place (e.g. after a value-domain fix)
        i = argv.index("--tables")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf = float(argv[0]) if argv else 1.0
    out = (
        argv[1]
        if len(argv) > 1
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), f"testdata_local/sf{sf}")
    )
    from rag_application_with_vectordb_spark.session import get_spark

    spark = get_spark("gen-sf")
    os.makedirs(out, exist_ok=True)
    for name, df in gen_tables(spark, sf).items():
        if only is not None and name not in only:
            continue
        # one .parquet path per table, like the driver fixtures (a
        # directory named <table>.parquet is read identically)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print("wrote", name)
    problems = check_domains(spark, out)
    spark.stop()
    if problems:
        print("DOMAIN DRIFT vs driver fixture (literal-filter queries would be vacuous):")
        for p in problems:
            print("  " + p)
        raise SystemExit(1)
    print("domain parity vs driver fixture: ok")


if __name__ == "__main__":
    main()
