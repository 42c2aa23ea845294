r"""Statistics / recommendation / graph-traversal catalog tail: the
classic analytics shapes that were still missing after round 7 —
item-item co-occurrence similarity (the collaborative-filtering
building block), an exact two-sample Kolmogorov–Smirnov statistic,
k-hop BFS reachability over a derived item graph, and PMI collocation
ranking (the lexical-association sibling of seq_ngram_lm_counts'
conditional probabilities).

Scale notes (100 TB posture):
- item co-occurrence self-joins the distinct (user, item) relation on
  user_id — the canonical item-CF shuffle. Its cost is bounded by the
  per-user item-set size, not the event count (DISTINCT first); in a
  production deployment heavy users are capped (top-N items per user)
  before the pairing, which this plan's shape accommodates by
  construction (the DISTINCT aggregate is where the cap would slot in).
- the KS statistic groups by value first (one shuffle on the measure),
  then windows over the DISTINCT values — cardinality-bounded, never a
  sort of the raw rows. The max |ECDF_a − ECDF_b| comparison is done in
  EXACT integer arithmetic (cross-multiplied counts over the common
  denominator n_a·n_b) so the argmax and the hash are order-free.
- BFS rounds iterate over the derived item graph (per-item top-3
  partners), which is tiny relative to the fact; the expensive pairs
  aggregate is localCheckpoint'ed once so the 3 unrolled rounds do NOT
  rescan events per round (the CTE-inlining lesson from NEXT.md).
- PMI lands each ln() on the 1e-6 integer grid (text_token_entropy's
  fixed-point move) and keeps the lift ratio itself as a fixed
  evaluation-order chain of correctly-rounded fp64 ops, so the hash is
  stable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import load_table, register_views, tables_in_sql
from .oracle_dialect import duck_hex13_to_long
from .registry import register


def _spark_hex13(hex_expr: str) -> str:
    """Spark-SQL twin of functions.text.hex13_to_long (13 md5 hex chars
    → integer < 2^52, fp64-exact so DuckDB reproduces it)."""
    return f"CAST(conv(substring({hex_expr}, 1, 13), 16, 10) AS BIGINT)"

# Distinct (user, item) interactions: item ids live in events.props as
# JSON (get_json_object on Spark, json_extract_string on DuckDB — the
# relational.py:363 dialect split).
_UI_SPARK = """
  SELECT DISTINCT user_id, CAST(get_json_object(props, '$.k') AS BIGINT) AS item
  FROM events WHERE event_type IN ('click', 'purchase')
"""
_UI_DUCK = """
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events WHERE event_type IN ('click', 'purchase')
"""


def _reco_sql(ui: str) -> str:
    return f"""
    WITH ui AS ({ui}),
    cnt AS (SELECT item, COUNT(*) AS n FROM ui GROUP BY item),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item <> b.item
      GROUP BY a.item, b.item
    ),
    scored AS (
      SELECT p.item_a, p.item_b, p.co,
             CAST(p.co AS DOUBLE) / sqrt(CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE))
               AS cosine
      FROM pairs p
      JOIN cnt ca ON p.item_a = ca.item
      JOIN cnt cb ON p.item_b = cb.item
    ),
    ranked AS (
      SELECT item_a, item_b, co, cosine,
             row_number() OVER (PARTITION BY item_a ORDER BY cosine DESC, item_b ASC)
               AS rnk
      FROM scored
    )
    SELECT item_a, item_b, CAST(co AS BIGINT) AS co, cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY item_a ASC, rnk ASC
    """


@register(
    "reco_item_item_topk",
    oracle=_reco_sql(_UI_DUCK),
    doc="Item-item collaborative filtering: top-3 most-similar items per "
    "item by co-occurrence cosine co(a,b)/sqrt(n(a)·n(b)) over distinct "
    "(user, item) click/purchase interactions. The 'users who engaged "
    "with A also engaged with B' primitive. DISTINCT bounds the pairing "
    "by per-user item-set size (the cap point for heavy users at scale); "
    "one shuffle on user_id for the pairing, one on the item pair for "
    "the count; the item-count side joins are broadcast-sized. Cosine is "
    "a fixed chain of correctly-rounded fp64 ops (÷, sqrt, ×) so the "
    "hash is cross-engine stable; rank ties break on item_b ASC.",
    tags=("reco", "analytics"),
)
def reco_item_item_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_reco_sql(_UI_SPARK))


# --- exact two-sample Kolmogorov–Smirnov: doc length, en vs non-en ------------

def _ks_sql(group_pred: str = "lang = 'en'") -> str:
    return f"""
WITH s AS (
  SELECT n_chars AS v, CASE WHEN {group_pred} THEN 1 ELSE 0 END AS g FROM documents
),
tot AS (SELECT SUM(g) AS na, SUM(1 - g) AS nb FROM s),
byv AS (SELECT v, SUM(g) AS ca, SUM(1 - g) AS cb FROM s GROUP BY v),
cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ASC) AS cuma,
         SUM(cb) OVER (ORDER BY v ASC) AS cumb
  FROM byv
),
d AS (
  SELECT c.v, abs(c.cuma * t.nb - c.cumb * t.na) AS num, t.na, t.nb
  FROM cum c CROSS JOIN tot t
)
SELECT CAST(MAX(num) AS DOUBLE) / (MAX(na) * MAX(nb)) AS ks_stat,
       CAST(MIN(CASE WHEN num = (SELECT MAX(num) FROM d) THEN v END) AS BIGINT)
         AS ks_at_v,
       CAST(MAX(na) AS BIGINT) AS n_en, CAST(MAX(nb) AS BIGINT) AS n_other
FROM d
"""


@register(
    "stats_ks_lang_length",
    oracle=_ks_sql(),
    doc="Exact two-sample Kolmogorov–Smirnov statistic comparing the "
    "document-length distribution of lang='en' vs the rest — the "
    "distribution-shift test a curation pipeline runs when a filter or "
    "source change might have skewed the corpus (complements PSI, which "
    "needs binning; KS is binning-free). ECDFs are built by grouping on "
    "the DISTINCT length values (one shuffle, cardinality-bounded) and "
    "the sup-difference is maximized in exact integer cross-multiplied "
    "form |cuma·nb − cumb·na| — the single division to a double happens "
    "once, after the max, so the statistic and its argmax location are "
    "order-free and hash-stable. Dialect-shared SQL.",
    tags=("stats", "analytics"),
)
def stats_ks_lang_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_ks_sql())


# --- k-hop BFS reachability over the item co-occurrence graph -----------------

_KHOP_ROUNDS = 3
_KHOP_SOURCE = 0
_KHOP_TOP_PARTNERS = 3

_EDGES_SPARK = f"""
WITH ui AS ({_UI_SPARK}),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item <> b.item
  GROUP BY a.item, b.item
),
ranked AS (
  SELECT item_a, item_b,
         row_number() OVER (PARTITION BY item_a ORDER BY co DESC, item_b ASC) AS rnk
  FROM pairs
)
SELECT item_a AS src, item_b AS dst FROM ranked WHERE rnk <= {_KHOP_TOP_PARTNERS}
UNION
SELECT item_b AS src, item_a AS dst FROM ranked WHERE rnk <= {_KHOP_TOP_PARTNERS}
"""


def _khop_oracle() -> str:
    rounds = []
    prev = "d0"
    for i in range(1, _KHOP_ROUNDS + 1):
        rounds.append(
            f"""r{i} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT e.dst AS node, d.dist + 1 AS dist
        FROM {prev} d JOIN edges e ON e.src = d.node
      ) u GROUP BY node
    )"""
        )
        prev = f"r{i}"
    joined = ",\n    ".join(rounds)
    return f"""
    WITH ui AS ({_UI_DUCK}),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item <> b.item
      GROUP BY a.item, b.item
    ),
    ranked AS (
      SELECT item_a, item_b,
             row_number() OVER (PARTITION BY item_a ORDER BY co DESC, item_b ASC)
               AS rnk
      FROM pairs
    ),
    edges AS MATERIALIZED (
      SELECT item_a AS src, item_b AS dst FROM ranked WHERE rnk <= {_KHOP_TOP_PARTNERS}
      UNION
      SELECT item_b AS src, item_a AS dst FROM ranked WHERE rnk <= {_KHOP_TOP_PARTNERS}
    ),
    d0 AS (SELECT CAST({_KHOP_SOURCE} AS BIGINT) AS node, 0 AS dist),
    {joined}
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS INT) AS dist
    FROM {prev} ORDER BY node ASC
    """


@register(
    "graph_khop_items",
    oracle=_khop_oracle(),
    doc=f"Unweighted shortest-path distances (BFS, {_KHOP_ROUNDS} hops) from "
    f"item {_KHOP_SOURCE} over the item-affinity graph: each item keeps "
    f"edges to its top-{_KHOP_TOP_PARTNERS} strongest co-occurrence "
    "partners (scale-free sparsification — the graph stays ~3·|items| "
    "edges at any SF), symmetrized. Each round is frontier ∪ "
    "(frontier ⋈ edges)+1 folded by MIN(dist) — one shuffle on node per "
    "round. The expensive part (the pairs aggregate over events) is "
    "localCheckpoint'ed ONCE so the unrolled rounds reuse the "
    "materialized edge list instead of rescanning the fact per round; "
    "each round's frontier is also checkpointed (the iterative-lineage "
    "rule from operators/cc.py). Oracle is the same recursion unrolled "
    "as MATERIALIZED DuckDB CTEs.",
    tags=("graph", "analytics"),
)
def graph_khop_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    edges = spark.sql(_EDGES_SPARK).localCheckpoint()
    front = spark.range(1).select(
        F.lit(_KHOP_SOURCE).cast("bigint").alias("node"),
        F.lit(0).cast("int").alias("dist"),
    )
    for _ in range(_KHOP_ROUNDS):
        step = (
            front.join(edges, front["node"] == edges["src"])
            .select(edges["dst"].alias("node"), (front["dist"] + F.lit(1)).alias("dist"))
        )
        front = (
            front.unionByName(step)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return front.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("dist").cast("int").alias("dist"),
    ).orderBy("node")


# --- PMI collocations: lexical association over corpus bigrams ----------------

_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


@register(
    "text_pmi_collocations",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    uni AS (
      SELECT word, COUNT(*) AS c
      FROM (SELECT unnest(w) AS word FROM t) GROUP BY word
    ),
    nu AS (SELECT SUM(c) AS nu FROM uni),
    bg AS (
      SELECT w[CAST(i AS INTEGER)] AS w1, w[CAST(i AS INTEGER) + 1] AS w2
      FROM t, LATERAL (SELECT unnest(range(1, len(w)))) u(i)
    ),
    bgc AS (SELECT w1, w2, COUNT(*) AS cxy FROM bg GROUP BY w1, w2),
    nb AS (SELECT SUM(cxy) AS nb FROM bgc),
    scored AS (
      SELECT b.w1, b.w2, b.cxy,
             (CAST(b.cxy AS DOUBLE) / nb.nb)
               / ((CAST(u1.c AS DOUBLE) / nu.nu) * (CAST(u2.c AS DOUBLE) / nu.nu))
               AS lift
      FROM bgc b
      JOIN uni u1 ON b.w1 = u1.word
      JOIN uni u2 ON b.w2 = u2.word
      CROSS JOIN nu CROSS JOIN nb
      WHERE b.cxy >= {_PMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(cxy AS BIGINT) AS cxy, lift,
           CAST(round(ln(lift) * 1000000.0) AS BIGINT) AS pmi_micro
    FROM scored
    ORDER BY lift DESC, w1 ASC, w2 ASC
    LIMIT {_PMI_TOPK}
    """,
    doc=f"Pointwise-mutual-information collocation ranking: top-{_PMI_TOPK} "
    f"adjacent bigrams (count ≥ {_PMI_MIN_COUNT}) by association lift "
    "p(w1,w2)/(p(w1)·p(w2)) — the phrase-mining / stop-phrase-detection "
    "primitive next to seq_ngram_lm_counts' conditional probabilities "
    "(PMI normalizes by BOTH marginals, so frequent-but-independent "
    "pairs rank low). Tokens explode once; bigrams are a per-row array "
    "transform (no self-join); the unigram/bigram totals are single-row "
    "aggregates broadcast back. The lift ratio is a fixed "
    "evaluation-order fp64 chain, and the PMI itself is reported on the "
    "1e-6 grid (text_token_entropy's fixed-point move), so the top-k "
    "boundary and the hash are cross-engine stable.",
    tags=("text", "stats"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    w = F.split(F.trim(F.col("text")), r"\s+")
    toks = docs.select(F.explode(w).alias("word"))
    uni = toks.groupBy("word").agg(F.count("*").alias("c"))
    nu = uni.agg(F.sum("c").alias("nu"))
    bigrams = (
        docs.select(
            F.explode(
                F.when(
                    F.size(w) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.struct(
                            F.element_at(w, i).alias("w1"),
                            F.element_at(w, i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    bgc = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("cxy"))
    nb = bgc.agg(F.sum("cxy").alias("nb"))
    u1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    lift = (F.col("cxy").cast("double") / F.col("nb")) / (
        (F.col("c1").cast("double") / F.col("nu"))
        * (F.col("c2").cast("double") / F.col("nu"))
    )
    return (
        bgc.filter(F.col("cxy") >= _PMI_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("cxy").cast("bigint").alias("cxy"),
            lift.alias("lift"),
            F.round(F.ln(lift) * F.lit(1000000.0)).cast("bigint").alias("pmi_micro"),
        )
        .orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
        .limit(_PMI_TOPK)
    )


# --- deterministic Poisson bootstrap: CI for the mean order value -------------

#: Poisson(1) inverse CDF on the permille grid (cum.: .368 .736 .920
#: .981 .996) — each (replicate, row) draws its resample multiplicity
#: from a keyed hash, so the bootstrap is a pure function of the data.
_POISSON_W = (
    "CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1 WHEN u < 920 THEN 2 "
    "WHEN u < 981 THEN 3 WHEN u < 996 THEN 4 ELSE 5 END"
)
_BOOT_B = 100


def _bootstrap_sql(hexfn, fanout: str, str_t: str) -> str:
    key = f"md5(concat('boot42|', CAST(b AS {str_t}), '|', CAST(o_orderkey AS {str_t})))"
    return f"""
    WITH base AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders
    ),
    fan AS (
      SELECT b, o_orderkey, cents, {hexfn(key)} % 1000 AS u
      FROM base {fanout}
    ),
    w AS (SELECT b, cents, {_POISSON_W} AS w FROM fan),
    reps AS (
      SELECT b, CAST(SUM(w * cents) AS DOUBLE) / (100.0 * CAST(SUM(w) AS DOUBLE))
               AS mean_b
      FROM w GROUP BY b
    ),
    ranked AS (
      SELECT mean_b, row_number() OVER (ORDER BY mean_b ASC, b ASC) AS rnk FROM reps
    ),
    pt AS (SELECT CAST(SUM(cents) AS DOUBLE) / (100.0 * COUNT(*)) AS point FROM base)
    SELECT pt.point AS point_mean,
           MAX(CASE WHEN rnk = 3 THEN mean_b END) AS ci_lo,
           MAX(CASE WHEN rnk = {_BOOT_B - 2} THEN mean_b END) AS ci_hi,
           CAST({_BOOT_B} AS BIGINT) AS n_replicates
    FROM ranked CROSS JOIN pt GROUP BY pt.point
    """


@register(
    "stats_bootstrap_mean_ci",
    oracle=_bootstrap_sql(
        duck_hex13_to_long,
        f"CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) r",
        "VARCHAR",
    ),
    doc=f"Percentile-bootstrap 95% CI for the mean order value via the "
    f"DETERMINISTIC Poisson bootstrap: each of {_BOOT_B} replicates "
    "draws every row's multiplicity from Poisson(1) inverted on a "
    "keyed-md5 permille (no RNG state, no resample shuffle — the "
    "resampling is a pure row-local function, so it is reproducible, "
    "partitioning-stable, AND single-pass: one scan fans out ×B "
    "map-side, partial-aggregates per partition, and shuffles only B "
    "partial rows per task). This is how a bootstrap actually runs at "
    "100 TB — never B independent passes. Money stays exact-integer "
    "cents until the final per-replicate division (one fixed fp64 op), "
    "and the CI bounds are order statistics of the B replicate means "
    "(rank 3 / rank 98 of 100), so everything hash-matches DuckDB.",
    tags=("stats", "analytics"),
)
def stats_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        _bootstrap_sql(
            _spark_hex13,
            f"LATERAL VIEW explode(sequence(0, {_BOOT_B - 1})) r AS b",
            "STRING",
        )
    )


# --- jackknife standard error: delete-one-month means -------------------------

_JACKKNIFE_SQL = """
WITH base AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
),
per AS (SELECT m, SUM(cents) AS s, COUNT(*) AS n FROM base GROUP BY m),
loo AS (
  -- totals come from windows over the per-month table (M rows), so the
  -- fact is scanned ONCE — a tot-CTE referenced here would be inlined
  -- into a second/third scan by Spark
  SELECT m,
         CAST(round(10.0 * CAST(SUM(s) OVER () - s AS DOUBLE)
                    / CAST(SUM(n) OVER () - n AS DOUBLE)) AS BIGINT) AS mu_milli,
         COUNT(*) OVER () AS mm
  FROM per
),
dev AS (
  SELECT mu_milli
           - CAST(round(CAST(SUM(mu_milli) OVER () AS DOUBLE) / mm) AS BIGINT) AS d,
         mm
  FROM loo
)
SELECT CAST(MAX(mm) AS BIGINT) AS n_groups,
       sqrt(CAST(MAX(mm) - 1 AS DOUBLE) * CAST(SUM(d * d) AS DOUBLE) / MAX(mm))
         / (MAX(mm) * 1000.0) AS jackknife_se_dollars
FROM dev
"""


@register(
    "stats_jackknife_se",
    oracle=_JACKKNIFE_SQL,
    doc="Delete-one-group jackknife standard error of the mean order "
    "value, groups = order months — the grouped-data uncertainty "
    "estimate that respects within-month correlation (the block/cluster "
    "jackknife a pipeline uses when rows aren't i.i.d.). One aggregate "
    "pass to per-month (sum, count); every leave-one-out mean is then "
    "derived from the totals by subtraction — M groups never rescan the "
    "fact. Each LOO mean and their grand mean land on the milli-dollar "
    "integer grid (one fp op each from exact integers — coarse enough "
    "that d² sums stay far inside BIGINT range at any SF), deviations "
    "and the squared-deviation sum are then exact BIGINT — only the "
    "final sqrt chain is fp64, so the hash is order-free. "
    "Dialect-shared SQL.",
    tags=("stats", "analytics"),
)
def stats_jackknife_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, tables_in_sql(_JACKKNIFE_SQL))
    return spark.sql(_JACKKNIFE_SQL)


# --- split-conformal prediction intervals -------------------------------------

_CONFORMAL_ALPHA = 0.1  # 90% marginal coverage
_CONFORMAL_TRAIN_PERMILLE = 700


def _conformal_sql(
    hexfn,
    str_t: str,
    alpha: float = _CONFORMAL_ALPHA,
    train_permille: int = _CONFORMAL_TRAIN_PERMILLE,
    mat: str = "MATERIALIZED ",
) -> str:
    """``mat`` is DuckDB's CTE-materialization hint (DuckDB inlines CTEs
    referenced more than once — the NEXT.md lesson); pass "" to render
    Spark-parseable SQL."""
    key = f"md5(concat('split42|', CAST(o_orderkey AS {str_t})))"
    return f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority AS prio,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents,
             CASE WHEN {hexfn(key)} % 1000 < {train_permille}
                  THEN 'train' ELSE 'cal' END AS part
      FROM orders
    ),
    model AS {mat}(
      SELECT prio,
             CAST(round(10000.0 * CAST(SUM(cents) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS pred_micro
      FROM base WHERE part = 'train' GROUP BY prio
    ),
    cal AS {mat}(
      SELECT abs(b.cents * 10000 - m.pred_micro) AS r
      FROM base b JOIN model m ON b.prio = m.prio
      WHERE b.part = 'cal'
    ),
    nn AS (SELECT COUNT(*) AS n FROM cal),
    q AS (
      SELECT r AS qv FROM (
        SELECT r, row_number() OVER (ORDER BY r ASC) AS rnk FROM cal
      ) x CROSS JOIN nn
      WHERE rnk = CAST(ceil((nn.n + 1) * {1.0 - alpha}) AS BIGINT)
    )
    SELECT m.prio,
           CAST(m.pred_micro AS DOUBLE) / 1000000.0 AS pred_dollars,
           CAST(m.pred_micro - q.qv AS DOUBLE) / 1000000.0 AS lo_dollars,
           CAST(m.pred_micro + q.qv AS DOUBLE) / 1000000.0 AS hi_dollars,
           (SELECT CAST(n AS BIGINT) FROM nn) AS n_cal
    FROM model m CROSS JOIN q
    ORDER BY m.prio ASC
    """


@register(
    "stats_conformal_interval",
    oracle=_conformal_sql(duck_hex13_to_long, "VARCHAR"),
    doc=f"Split-conformal {int((1 - _CONFORMAL_ALPHA) * 100)}% prediction "
    "intervals for order value: a per-priority mean 'model' is fit on a "
    f"keyed-md5 {_CONFORMAL_TRAIN_PERMILLE}‰ train split, absolute "
    "residuals on the calibration split give the nonconformity scores, "
    "and the interval half-width is the ⌈(n+1)(1−α)⌉-th order statistic "
    "— the distribution-free coverage guarantee a model-eval pipeline "
    "attaches to ANY point predictor. The split is the reproducible "
    "hash_split primitive (partitioning-stable, no RNG); the model and "
    "residuals are exact micro-dollar integers; the quantile is an "
    "order statistic over the calibration residuals (its VALUE is "
    "tie-insensitive), so the whole thing hash-matches DuckDB. Scale: "
    "the 5-row model is localCheckpoint'ed so its train aggregate runs "
    "once and broadcasts (CTE inlining would rescan orders per "
    "consumer); two fact scans total (train agg + calibration pass "
    "into the checkpointed residual histogram). The rank itself is a "
    "TWO-LEVEL HISTOGRAM RANK-SELECT (the length_buckets_approx "
    "pattern), not a global row sort: exact-integer residual histogram "
    "→ cumulative counts over coarse 2^20-micro buckets (domain-"
    "bounded) → a second cumulative pass confined to the single bucket "
    "holding rank k. No window ever sees an unbounded relation — the "
    "r07 single-reducer hazard is gone, value unchanged.",
    tags=("stats", "analytics"),
)
def stats_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    key = "md5(concat('split42|', CAST(o_orderkey AS STRING)))"
    base = orders.select(
        F.col("o_orderpriority").alias("prio"),
        F.expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").alias("cents"),
        (F.expr(_spark_hex13(key)) % 1000 < _CONFORMAL_TRAIN_PERMILLE).alias(
            "is_train"
        ),
    )
    model = (
        base.filter(F.col("is_train"))
        .groupBy("prio")
        .agg(
            F.expr(
                "CAST(round(10000.0 * CAST(SUM(cents) AS DOUBLE) / COUNT(*)) AS BIGINT)"
            ).alias("pred_micro")
        )
        .localCheckpoint()
    )
    cal = (
        base.filter(~F.col("is_train"))
        .join(F.broadcast(model), "prio")
        .select(F.abs(F.col("cents") * 10000 - F.col("pred_micro")).alias("r"))
    )
    # k-th order statistic WITHOUT a global row sort (the r07 verdict's
    # single-reducer hazard — row_number over the full calibration split
    # grows with the fact table). Two-level histogram rank-select, the
    # length_buckets_approx pattern: (1) histogram the exact integer
    # residuals (one shuffle on r); (2) a cumulative window over COARSE
    # 2^20-micro buckets — bounded by the residual DOMAIN (max |error| /
    # 2^20 ≈ thousands of rows at any corpus size), never by row count —
    # locates the bucket containing rank k = ceil((n+1)(1−α)); (3) a
    # second cumulative window confined to that ONE bucket (≤ 2^20
    # distinct values, corpus-size-independent) picks the exact residual.
    # Same value as the full sort, so the oracle hash is unchanged.
    # The histogram is the standalone residual relation the old doc
    # promised — checkpoint it once so its two consumers (coarse bucket
    # pass + fine pass) don't each re-run the calibration scan. It holds
    # one row per DISTINCT residual value: far smaller than the fact and
    # fully distributed.
    hist = cal.groupBy("r").agg(F.count("*").alias("c")).localCheckpoint()
    bcum = (
        hist.groupBy((F.col("r") - F.col("r") % 1048576).alias("b"))
        .agg(F.sum("c").alias("bc"))
        .withColumn("cum", F.sum("bc").over(Window.orderBy("b")))
    )
    totk = bcum.agg(F.max("cum").alias("n")).select(
        "n",
        F.ceil((F.col("n") + 1) * F.lit(1.0 - _CONFORMAL_ALPHA))
        .cast("bigint")
        .alias("k"),
    )
    tb = (
        bcum.crossJoin(F.broadcast(totk))
        .filter((F.col("cum") >= F.col("k")) & (F.col("cum") - F.col("bc") < F.col("k")))
        .select("b", (F.col("cum") - F.col("bc")).alias("below"), "k", "n")
    )
    fine = hist.join(
        F.broadcast(tb), (F.col("r") - F.col("r") % 1048576) == F.col("b")
    ).withColumn("cumw", F.sum("c").over(Window.orderBy("r")))
    q = fine.filter(
        (F.col("below") + F.col("cumw") >= F.col("k"))
        & (F.col("below") + F.col("cumw") - F.col("c") < F.col("k"))
    ).select(F.col("r").alias("qv"), F.col("n").alias("n_cal"))
    return (
        model.crossJoin(F.broadcast(q))
        .select(
            "prio",
            (F.col("pred_micro").cast("double") / F.lit(1000000.0)).alias(
                "pred_dollars"
            ),
            (
                (F.col("pred_micro") - F.col("qv")).cast("double") / F.lit(1000000.0)
            ).alias("lo_dollars"),
            (
                (F.col("pred_micro") + F.col("qv")).cast("double") / F.lit(1000000.0)
            ).alias("hi_dollars"),
            F.col("n_cal").cast("bigint").alias("n_cal"),
        )
        .orderBy(F.asc("prio"))
    )


# --- Kaplan–Meier survival: signup → first purchase ----------------------------


def _km_sql(epochsec) -> str:
    """``epochsec(expr)`` renders the engine's timestamp→whole-seconds
    form (unix_timestamp vs floor(epoch(...))) — the only dialect split."""
    days = (
        f"CAST(floor(({epochsec('COALESCE(p_ts, (SELECT MAX(ts) FROM events))')}"
        f" - {epochsec('s_ts')}) / 86400.0) AS BIGINT)"
    )
    return f"""
    WITH w AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS s_ts
      FROM events
    ),
    per AS (
      SELECT user_id, MIN(s_ts) AS s_ts,
             MIN(CASE WHEN event_type = 'purchase' AND ts > s_ts THEN ts END) AS p_ts
      FROM w WHERE s_ts IS NOT NULL GROUP BY user_id
    ),
    dur AS (
      SELECT user_id,
             CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END AS evt,
             {days} AS t
      FROM per
    ),
    grp AS (SELECT t, SUM(evt) AS d, SUM(1 - evt) AS c FROM dur GROUP BY t),
    km AS (
      SELECT t, d, c,
             SUM(d + c) OVER ()
               - COALESCE(SUM(d + c) OVER (ORDER BY t ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM grp
    ),
    terms AS (
      SELECT t, d, c, n_risk,
             CASE WHEN d = 0 THEN 0
                  WHEN d < n_risk THEN
                    CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1000000.0)
                         AS BIGINT)
                  ELSE NULL END AS term_micro,
             CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS dies_out
      FROM km
    ),
    outp AS (
      SELECT t, n_risk, d, c,
             CAST(SUM(term_micro) OVER (ORDER BY t ASC) AS BIGINT) AS logs_micro,
             SUM(dies_out) OVER (ORDER BY t ASC) AS dead
      FROM terms
    )
    SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events, CAST(c AS BIGINT) AS c_censored,
           CASE WHEN dead > 0 THEN NULL ELSE logs_micro END AS log_surv_micro,
           CASE WHEN dead > 0 THEN 0.0
                ELSE CAST(CAST(round(exp(CAST(logs_micro AS DOUBLE) / 1000000.0)
                                     * 1000000.0) AS BIGINT) AS DOUBLE)
                     / 1000000.0 END AS survival
    FROM outp ORDER BY t_days ASC
    """


@register(
    "survival_km_signup_purchase",
    oracle=_km_sql(lambda e: f"CAST(floor(epoch({e})) AS BIGINT)"),
    doc="Kaplan–Meier survival curve for signup → first purchase, users "
    "without a conversion right-censored at the study end (max event "
    "ts) — the time-to-event estimator (retention/conversion analysis) "
    "that handles censoring correctly where a naive conversion-rate "
    "cut-off biases down. One keyed window pass pins each user's signup "
    "(shuffle on user_id), the study end is a scalar-subquery map-side "
    "MAX (never a global window over raw events), and everything after "
    "the per-user aggregate operates on the distinct-duration table. "
    "The survival product ∏(1−d/n) is order-free: each factor's ln "
    "lands on the 1e-6 grid, the cumulative sum is exact BIGINT "
    "(reported as log_surv_micro), the display survival re-lands exp() "
    "on the 1e-6 grid (raw exp differs in the last ulp across engines "
    "— observed at sf0.01), and the curve's zero-crossing (d=n "
    "exhausts the risk set) is flagged exactly rather than via "
    "ln(0).",
    tags=("stats", "analytics"),
)
def survival_km_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_km_sql(lambda e: f"unix_timestamp({e})"))


# --- forecast evaluation: seasonal-naive MASE / sMAPE --------------------------

_MASE_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END) AS cents
  FROM events GROUP BY day
),
lagged AS (
  SELECT day, cents,
         lag(cents, 7) OVER (ORDER BY day ASC) AS f_snaive,
         lag(cents, 1) OVER (ORDER BY day ASC) AS y_prev
  FROM daily
),
err AS (
  SELECT abs(cents - f_snaive) AS e_f, abs(cents - y_prev) AS e_n,
         CASE WHEN abs(cents) + abs(f_snaive) = 0 THEN 0
              ELSE CAST(round(2000000.0 * abs(cents - f_snaive)
                              / (abs(cents) + abs(f_snaive))) AS BIGINT)
         END AS smape_micro
  FROM lagged WHERE f_snaive IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       (CAST(SUM(e_f) AS DOUBLE) / COUNT(*))
         / (CAST(SUM(e_n) AS DOUBLE) / COUNT(*)) AS mase,
       CAST(SUM(smape_micro) AS DOUBLE) / (COUNT(*) * 1000000.0) AS smape
FROM err
"""


@register(
    "forecast_snaive_mase",
    oracle=_MASE_SQL,
    doc="Forecast-evaluation primitives over the daily purchase-revenue "
    "series: MASE and sMAPE of the weekly seasonal-naive forecast "
    "y[d−7] against the one-step naive scale y[d−1] — the "
    "scale-invariant accuracy pair a forecasting pipeline reports "
    "(MASE < 1 beats the naive baseline). Revenue is per-row exact "
    "cents BEFORE the daily sum (summing raw doubles would be "
    "accumulation-order-dependent), absolute errors are exact BIGINT "
    "from lag windows over the tiny daily series, and each sMAPE term "
    "lands on the 1e-6 grid before its exact-integer sum — hash-stable "
    "by construction. One scan, one shuffle on day. Dialect-shared SQL.",
    tags=("stats", "analytics"),
)
def forecast_snaive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, tables_in_sql(_MASE_SQL))
    return spark.sql(_MASE_SQL)


# --- Benford first-digit audit ------------------------------------------------

#: round(log10(1 + 1/d) * 1e6) for d = 1..9, emitted as exact literals
#: into BOTH dialects so no engine evaluates log10 at all.
_BENFORD_EXP_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _benford_sql(str_t: str, min_price: float = 0.0) -> str:
    vals = ", ".join(f"({d}, {m})" for d, m in _BENFORD_EXP_MICRO.items())
    return f"""
    WITH base AS (
      SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents FROM orders
      WHERE o_totalprice > {min_price}
    ),
    digs AS (
      SELECT CAST(substr(CAST(cents AS {str_t}), 1, 1) AS BIGINT) AS d, COUNT(*) AS c
      FROM base GROUP BY d
    ),
    expd AS (SELECT * FROM (VALUES {vals}) AS t(d, exp_micro)),
    joined AS (
      SELECT e.d, COALESCE(g.c, 0) AS c, e.exp_micro,
             SUM(COALESCE(g.c, 0)) OVER () AS n
      FROM expd e LEFT JOIN digs g ON e.d = g.d
    )
    SELECT CAST(d AS BIGINT) AS digit, CAST(c AS BIGINT) AS n_obs,
           CAST(round(1000000.0 * c / n) AS BIGINT) AS obs_micro,
           CAST(exp_micro AS BIGINT) AS exp_micro,
           CAST(abs(CAST(round(1000000.0 * c / n) AS BIGINT) - exp_micro) AS BIGINT)
             AS absdev_micro
    FROM joined ORDER BY digit ASC
    """


@register(
    "audit_benford_prices",
    oracle=_benford_sql("VARCHAR"),
    doc="Benford's-law first-digit audit over order prices — the "
    "fabricated-data / unit-mixing screen a data-quality pipeline runs "
    "on any money or measurement column (synthetic uniform prices fail "
    "it loudly, which is itself the point of an audit statistic). The "
    "leading digit comes from exact integer-to-string conversion of "
    "cents (LOG10 on a double would be last-ulp-unstable at power-of-10 "
    "boundaries), the expected Benford mass is emitted as shared "
    "1e-6-grid literals so neither engine evaluates log10 at all, and "
    "observed frequencies land on the same grid. One scan, one "
    "9-bucket aggregate; the digit histogram is all that shuffles.",
    tags=("stats", "analytics"),
)
def audit_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_benford_sql("STRING"))


# --- A/B test: Welch t over per-user spend ------------------------------------


def _ab_welch_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('ab42|', CAST(user_id AS {str_t})))"
    return f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN {hexfn(key)} % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END) AS cents
      FROM events GROUP BY user_id
    ),
    agg AS (
      SELECT SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb,
             SUM(CASE WHEN arm = 'A' THEN cents ELSE 0 END) AS sa,
             SUM(CASE WHEN arm = 'B' THEN cents ELSE 0 END) AS sb,
             SUM(CASE WHEN arm = 'A' THEN cents * cents ELSE 0 END) AS qa,
             SUM(CASE WHEN arm = 'B' THEN cents * cents ELSE 0 END) AS qb
      FROM per_user
    ),
    stats AS (
      SELECT na, nb,
             CAST(sa AS DOUBLE) / (100.0 * na) AS mean_a,
             CAST(sb AS DOUBLE) / (100.0 * nb) AS mean_b,
             (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1) AS va,
             (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) AS vb
      FROM agg
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           mean_a AS mean_spend_a, mean_b AS mean_spend_b,
           mean_a - mean_b AS uplift_dollars,
           (mean_a - mean_b) / (sqrt(va / na + vb / nb) / 100.0) AS t_welch,
           (va / na + vb / nb) * (va / na + vb / nb)
             / ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1))
             AS df_welch
    FROM stats
    """


@register(
    "ab_test_spend_welch",
    oracle=_ab_welch_sql(duck_hex13_to_long, "VARCHAR"),
    doc="A/B experiment read-out: users assigned to arms by keyed md5 "
    "(the reproducible randomization unit — assignment is recomputable "
    "from the user id alone, the property a real experiment platform "
    "needs for exposure logging), compared on mean per-user purchase "
    "spend with Welch's unequal-variance t and Welch–Satterthwaite df. "
    "Sums, counts, and sums-of-squares are exact BIGINT cents per arm "
    "(one user-keyed aggregate + one 6-number roll-up — nothing else "
    "shuffles at any SF), and every downstream statistic is a fixed "
    "fp64 chain from those exact integers, so it hash-matches DuckDB.",
    tags=("stats", "analytics"),
)
def ab_test_spend_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ab_welch_sql(_spark_hex13, "STRING"))


# --- weighted shortest paths (bounded Bellman-Ford) over the item graph --------
#
# The min-plus sibling of graph_khop_items' BFS: edges carry an integer
# COST inversely proportional to co-occurrence strength (micro-units,
# floor(1e6/co) — strong affinities are cheap to traverse), and each
# round relaxes dist' = MIN(dist, dist(u) + w(u,v)). Three rounds =
# cheapest path using <= 3 edges; costs stay exact BIGINT throughout so
# the min-fold is order-free.

_WSP_ROUNDS = 3
_WSP_SOURCE = 0

_WSP_EDGES_SPARK = f"""
WITH ui AS ({_UI_SPARK}),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item <> b.item
  GROUP BY a.item, b.item
),
ranked AS (
  SELECT item_a, item_b, co,
         row_number() OVER (PARTITION BY item_a ORDER BY co DESC, item_b ASC) AS rnk
  FROM pairs
),
kept AS (SELECT item_a, item_b, co FROM ranked WHERE rnk <= {_KHOP_TOP_PARTNERS})
SELECT src, dst, CAST(floor(1000000.0 / co) AS BIGINT) AS w_micro FROM (
  SELECT item_a AS src, item_b AS dst, co FROM kept
  UNION
  SELECT item_b AS src, item_a AS dst, co FROM kept
) e
"""


def _wsp_oracle() -> str:
    rounds = []
    prev = "d0"
    for i in range(1, _WSP_ROUNDS + 1):
        rounds.append(
            f"""r{i} AS (
      SELECT node, MIN(dist_micro) AS dist_micro FROM (
        SELECT node, dist_micro FROM {prev}
        UNION ALL
        SELECT e.dst AS node, d.dist_micro + e.w_micro AS dist_micro
        FROM {prev} d JOIN edges e ON e.src = d.node
      ) u GROUP BY node
    )"""
        )
        prev = f"r{i}"
    joined = ",\n    ".join(rounds)
    return f"""
    WITH ui AS ({_UI_DUCK}),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item <> b.item
      GROUP BY a.item, b.item
    ),
    ranked AS (
      SELECT item_a, item_b, co,
             row_number() OVER (PARTITION BY item_a ORDER BY co DESC, item_b ASC)
               AS rnk
      FROM pairs
    ),
    kept AS (SELECT item_a, item_b, co FROM ranked WHERE rnk <= {_KHOP_TOP_PARTNERS}),
    edges AS MATERIALIZED (
      SELECT src, dst, CAST(floor(1000000.0 / co) AS BIGINT) AS w_micro FROM (
        SELECT item_a AS src, item_b AS dst, co FROM kept
        UNION
        SELECT item_b AS src, item_a AS dst, co FROM kept
      ) e
    ),
    d0 AS (SELECT CAST({_WSP_SOURCE} AS BIGINT) AS node,
                  CAST(0 AS BIGINT) AS dist_micro),
    {joined}
    SELECT CAST(node AS BIGINT) AS node, CAST(dist_micro AS BIGINT) AS dist_micro,
           CAST(dist_micro AS DOUBLE) / 1000000.0 AS dist_cost
    FROM {prev} ORDER BY node ASC
    """


@register(
    "graph_shortest_path_weighted",
    oracle=_wsp_oracle(),
    doc=f"Weighted shortest-path costs (bounded Bellman-Ford, "
    f"{_WSP_ROUNDS} relaxation rounds) from item {_WSP_SOURCE} over the "
    "item-affinity graph — graph_khop_items' BFS generalized to the "
    "min-plus semiring: edge cost = floor(1e6/co) micro-units (strong "
    "co-occurrence = cheap hop), dist' = MIN(dist, dist(u)+w) per "
    "round, so a 2-hop path through strong partners can beat a weak "
    "direct edge — which hop counts cannot express. Costs are exact "
    "BIGINT micro-units end to end (the min-fold is order-free; no fp "
    "accumulates), the sparsified edge list (top-3 partners per item) "
    "is localCheckpoint'ed once, and every round is one shuffle on "
    "node over the frontier — the standard iterative-relaxation shape "
    "that scales to any graph that fits its own edge list. Oracle: "
    "identical recursion unrolled as MATERIALIZED DuckDB CTEs.",
    tags=("graph", "analytics"),
)
def graph_shortest_path_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    edges = spark.sql(_WSP_EDGES_SPARK).localCheckpoint()
    front = spark.range(1).select(
        F.lit(_WSP_SOURCE).cast("bigint").alias("node"),
        F.lit(0).cast("bigint").alias("dist_micro"),
    )
    for _ in range(_WSP_ROUNDS):
        step = front.join(edges, front["node"] == edges["src"]).select(
            edges["dst"].alias("node"),
            (front["dist_micro"] + edges["w_micro"]).alias("dist_micro"),
        )
        front = (
            front.unionByName(step)
            .groupBy("node")
            .agg(F.min("dist_micro").alias("dist_micro"))
            .localCheckpoint()
        )
    return front.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("dist_micro").cast("bigint").alias("dist_micro"),
        (F.col("dist_micro").cast("double") / F.lit(1000000.0)).alias("dist_cost"),
    ).orderBy("node")


# --- Theil-Sen robust trend: median of pairwise slopes -------------------------
#
# Daily 1995 revenue (365 calendar points) against the day index: slope =
# median over all C(365,2) ~= 66k day pairs of (y_j - y_i)/(x_j - x_i),
# intercept = median of y - slope*x. The pair count is CALENDAR-bounded
# (366 rows after the first aggregate no matter the fact size), so the
# O(n^2) lives on a fixed-size relation — the fact itself scans once
# into exact DECIMAL day sums. Slopes are fp64 divisions of exact cent/
# day integers (bit-identical cross-engine), and the median is a rank
# select (lower median, floor((n+1)/2)) — no averaging, no fp drift at
# the boundary. The global ROW_NUMBER sorts 66k 8-byte values: bounded,
# documented SinglePartition.

_THEIL_SEN_DAILY = """
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT) AS y_cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
      GROUP BY 1
"""


def _theil_sen_sql(d_sql: str) -> str:
    return f"""
    WITH d AS ({d_sql}),
    pairs AS (
      SELECT CAST(b.y_cents - a.y_cents AS DOUBLE)
               / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM d a JOIN d b ON b.x > a.x
    ),
    ranked AS (
      SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
             COUNT(*) OVER () AS np
      FROM pairs
    ),
    med AS (
      SELECT slope AS m FROM ranked
      WHERE rn = CAST(floor((CAST(np AS DOUBLE) + 1.0) / 2.0) AS BIGINT)
    ),
    resid AS (
      SELECT CAST(d.y_cents AS DOUBLE) - med.m * CAST(d.x AS DOUBLE) AS r,
             med.m AS m
      FROM d CROSS JOIN med
    ),
    rr AS (
      SELECT r, m, ROW_NUMBER() OVER (ORDER BY r) AS rn,
             COUNT(*) OVER () AS nd
      FROM resid
    )
    SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_days,
           m AS slope_cents_per_day,
           r AS intercept_cents
    FROM rr
    WHERE rn = CAST(floor((CAST(nd AS DOUBLE) + 1.0) / 2.0) AS BIGINT)
    """


@register(
    "regress_theil_sen",
    oracle=_theil_sen_sql(_THEIL_SEN_DAILY),
    doc="Theil-Sen robust trend of daily 1995 order revenue: the median "
    "of all pairwise day-pair slopes (and the median-residual "
    "intercept) — the estimator with a 29% breakdown point that "
    "regress_spend_on_activity's OLS lacks (one corrupted day drags "
    "OLS; Theil-Sen shrugs). The fact collapses to 365 calendar rows "
    "first, so the O(n^2) pair join (~66k rows) is CONSTANT-size at "
    "any sf; slopes are fp64 ratios of exact cents/day integers and "
    "both medians are rank selects (no interpolation) — hash-stable "
    "cross-engine. The global rank over 66k slopes is a documented, "
    "bounded SinglePartition.",
    tags=("stats", "analytics"),
)
def regress_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    # Materialize the 365-row daily relation ONCE: Spark inlines CTEs
    # per reference, so the SQL form's five references to `d` re-scan
    # the fact five times (8 parquet scans total in the physical plan —
    # the ACF/corr-matrix gotcha). One scan + a localCheckpoint'ed
    # calendar-sized frame instead; everything downstream runs on it.
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("x")
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(14,2)")) * 100)
            .cast("bigint")
            .alias("y_cents")
        )
        .localCheckpoint()
    )
    daily.createOrReplaceTempView("theil_sen_daily")
    return spark.sql(_theil_sen_sql("SELECT x, y_cents FROM theil_sen_daily"))


# --- label-propagation community detection over the item graph -----------------
#
# Synchronous LPA (Raghavan et al. 2007) on the same sparsified
# item-affinity graph as graph_khop_items, but WEIGHTED: each node
# starts as its own community and per round adopts the label with the
# largest summed edge weight among its neighbors (tie-break: weight
# DESC then label ASC — the deterministic rule that makes synchronous
# LPA reproducible; a fixed round count sidesteps LPA's classic
# bipartite oscillation non-termination). Every round is one keyed
# shuffle: edges ⋈ labels on dst, (src, label) weight-vote aggregate,
# per-src argmax window. The vote relation is bounded by |edges| (the
# graph is top-3-sparsified, so ~6·|items| rows at any SF) and each
# round's label table is localCheckpoint'ed (the iterative-lineage
# rule). Oracle = same rounds unrolled as MATERIALIZED DuckDB CTEs.

_LPA_ROUNDS = 4
_LPA_TOP = 3


def _lpa_edges(ui: str) -> str:
    return f"""
    ui AS ({ui}),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS co
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item <> b.item
      GROUP BY a.item, b.item
    ),
    ranked AS (
      SELECT item_a, item_b, co,
             row_number() OVER (PARTITION BY item_a ORDER BY co DESC, item_b ASC)
               AS rnk
      FROM pairs
    ),
    edges AS (
      SELECT item_a AS src, item_b AS dst, co FROM ranked WHERE rnk <= {_LPA_TOP}
      UNION
      SELECT item_b AS src, item_a AS dst, co FROM ranked WHERE rnk <= {_LPA_TOP}
    )"""


def _lpa_oracle() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(
            f"""l{i} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT e.src AS node, p.label, SUM(e.co) AS wsum,
               row_number() OVER (PARTITION BY e.src
                                  ORDER BY SUM(e.co) DESC, p.label ASC) AS rn
        FROM edges e JOIN {prev} p ON p.node = e.dst
        GROUP BY e.src, p.label
      ) t WHERE rn = 1
    )"""
        )
        prev = f"l{i}"
    joined = ",\n    ".join(rounds)
    return f"""
    WITH {_lpa_edges(_UI_DUCK)},
    l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM edges),
    {joined}
    SELECT CAST(l.node AS BIGINT) AS node, CAST(l.label AS BIGINT) AS community,
           s.csize
    FROM {prev} l
    JOIN (SELECT label, CAST(COUNT(*) AS BIGINT) AS csize
          FROM {prev} GROUP BY label) s ON s.label = l.label
    """


@register(
    "graph_lpa_communities",
    oracle=_lpa_oracle(),
    doc=f"Weighted label-propagation community detection ({_LPA_ROUNDS} "
    "synchronous rounds, Raghavan et al. 2007) over the "
    f"top-{_LPA_TOP}-sparsified item co-occurrence graph: each item "
    "adopts the neighbor label with the largest summed co-occurrence "
    "weight (weight DESC, label ASC tie-break — fully deterministic). "
    "Complements the min-label connected components in operators/cc.py: "
    "CC finds reachability islands, LPA finds DENSITY communities "
    "inside one connected island. Each round is one keyed shuffle over "
    "the ~6·|items| edge relation; the fact is scanned once into the "
    "checkpointed edge list.",
    tags=("graph", "analytics"),
)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    edges, labels = _lpa_run(spark, sf_dir)
    sizes = labels.groupBy("label").agg(F.count("*").cast("bigint").alias("csize"))
    return labels.join(sizes, "label").select(
        F.col("node").cast("bigint").alias("node"),
        F.col("label").cast("bigint").alias("community"),
        "csize",
    )


def _lpa_run(spark: SparkSession, sf_dir: str):
    """Shared LPA engine: returns (checkpointed edge list, final labels)
    after ``_LPA_ROUNDS`` synchronous rounds — used by both the
    community listing and the modularity score so the two queries see
    the identical partition."""
    from pyspark.sql import Window

    tune(spark)
    register_views(spark, sf_dir, ("events",))
    edges = spark.sql("WITH " + _lpa_edges(_UI_SPARK) + " SELECT src, dst, co FROM edges").localCheckpoint()
    labels = (
        edges.select(F.col("src").cast("bigint").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    w = Window.partitionBy("node").orderBy(F.desc("wsum"), F.asc("label"))
    for _ in range(_LPA_ROUNDS):
        votes = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy(edges["src"].alias("node"), labels["label"])
            .agg(F.sum("co").alias("wsum"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return edges, labels


# --- modularity of the LPA partition --------------------------------------------


def _modularity_oracle() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(
            f"""l{i} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT e.src AS node, p.label, SUM(e.co) AS wsum,
               row_number() OVER (PARTITION BY e.src
                                  ORDER BY SUM(e.co) DESC, p.label ASC) AS rn
        FROM edges e JOIN {prev} p ON p.node = e.dst
        GROUP BY e.src, p.label
      ) t WHERE rn = 1
    )"""
        )
        prev = f"l{i}"
    joined = ",\n    ".join(rounds)
    return f"""
    WITH {_lpa_edges(_UI_DUCK)},
    l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM edges),
    {joined},
    lab AS MATERIALIZED (SELECT node, label FROM {prev}),
    tw AS (SELECT CAST(SUM(co) AS BIGINT) AS m2 FROM edges),
    degs AS (
      SELECT la.label AS community, CAST(SUM(e.co) AS BIGINT) AS deg_w
      FROM edges e JOIN lab la ON la.node = e.src GROUP BY 1
    ),
    intra AS (
      SELECT la.label AS community, CAST(SUM(e.co) AS BIGINT) AS intra_w
      FROM edges e
      JOIN lab la ON la.node = e.src
      JOIN lab lb ON lb.node = e.dst AND lb.label = la.label
      GROUP BY 1
    )
    SELECT CAST(d.community AS BIGINT) AS community,
           CAST(COALESCE(i.intra_w, 0) AS BIGINT) AS intra_w,
           d.deg_w,
           CAST(COALESCE(i.intra_w, 0) * tw.m2 - d.deg_w * d.deg_w AS DOUBLE)
             / CAST(tw.m2 * tw.m2 AS DOUBLE) AS q_contrib
    FROM degs d LEFT JOIN intra i ON i.community = d.community
    CROSS JOIN tw
    """


@register(
    "graph_modularity",
    oracle=_modularity_oracle(),
    doc="Newman modularity of the LPA community partition, per "
    "community: Q_c = intra_c/(2m) - (deg_c/(2m))^2 over the weighted "
    "symmetrized item graph (intra_w counts both directions, 2m = "
    "total directed weight) — the quality score that tells you whether "
    "the communities LPA found beat a degree-preserving random graph "
    "(sum(q_contrib) > 0) BEFORE anyone acts on them. Reuses "
    "graph_lpa_communities' exact rounds (shared _lpa_run); the "
    "contribution is ONE fp64 division of exact BIGINT cross-products "
    "(intra*2m - deg^2) / (2m)^2 per community — bit-stable while "
    "2m < 3e9 (the sparsified item graph's total weight is ~6*|items|*"
    "max_co, far below that; past it the weights pre-scale). Cost on "
    "top of LPA: two keyed joins of the edge list against the final "
    "label relation.",
    tags=("graph", "analytics"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    edges, labels = _lpa_run(spark, sf_dir)
    la = labels.select(F.col("node").alias("na"), F.col("label").alias("ca"))
    lb = labels.select(F.col("node").alias("nb"), F.col("label").alias("cb"))
    tagged = (
        edges.join(la, edges["src"] == la["na"])
        .join(lb, edges["dst"] == lb["nb"])
        .localCheckpoint()
    )
    m2 = tagged.agg(F.sum("co").cast("bigint").alias("m2"))
    degs = tagged.groupBy(F.col("ca").alias("community")).agg(
        F.sum("co").cast("bigint").alias("deg_w")
    )
    intra = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.sum("co").cast("bigint").alias("intra_w"))
    )
    return (
        degs.join(intra, "community", "left")
        .crossJoin(F.broadcast(m2))
        .select(
            F.col("community").cast("bigint").alias("community"),
            F.coalesce(F.col("intra_w"), F.lit(0)).cast("bigint").alias("intra_w"),
            "deg_w",
            (
                (F.coalesce(F.col("intra_w"), F.lit(0)) * F.col("m2")
                 - F.col("deg_w") * F.col("deg_w")).cast("double")
                / (F.col("m2") * F.col("m2")).cast("double")
            ).alias("q_contrib"),
        )
    )


# --- k-core decomposition (iterative peeling) over the co-purchase graph -------
#
# The density-peel companion to LPA: repeatedly delete nodes whose
# degree within the SURVIVING subgraph is < k until a fixpoint — what
# remains is the k-core, the standard "dense nucleus" screen run on
# interaction graphs before community/recommendation work (parts with
# thin co-purchase support drop out; the core is where co-occurrence
# signal is trustworthy). Substrate: graph_pagerank's co-purchase part
# graph (pairs sharing >= 2 orders) — its long-tailed degrees give a
# real core/periphery split (the near-regular top-T item graph peels
# trivially). Peeling is monotone (survivor sets only shrink), so a
# FIXED round count R is sound whenever the peel converges within R
# rounds — tests/test_round7_ops.py asserts the fixpoint (one more
# peel changes nothing) on the fixtures; each round is one keyed
# aggregate over the checkpointed edge relation.

_KCORE_K = 3
_KCORE_ROUNDS = 12

#: ``{mat}`` becomes `` MATERIALIZED`` in the DuckDB oracle — without it
#: DuckDB inlines ``edges`` (and the basket self-join under it) into
#: every unrolled peel round (the MMR/ACF CTE-inlining gotcha; measured
#: 410 s -> ~5 s at sf1.0). Spark side passes ``mat=""`` and
#: localCheckpoints instead.
_COPURCHASE_EDGES = """
    op AS{mat} (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    prs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    edges AS{mat} (SELECT pa AS src, pb AS dst FROM prs
              UNION ALL SELECT pb AS src, pa AS dst FROM prs)"""


def _kcore_oracle() -> str:
    rounds = []
    prev = "c0"
    for i in range(1, _KCORE_ROUNDS + 1):
        rounds.append(
            f"""c{i} AS MATERIALIZED (
      SELECT e.src AS node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM edges e
      JOIN {prev} a ON a.node = e.src
      JOIN {prev} b ON b.node = e.dst
      GROUP BY e.src
      HAVING COUNT(*) >= {_KCORE_K}
    )"""
        )
        prev = f"c{i}"
    joined = ",\n    ".join(rounds)
    return f"""
    WITH {_COPURCHASE_EDGES.format(mat=" MATERIALIZED")},
    c0 AS MATERIALIZED (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS deg FROM edges),
    {joined}
    SELECT CAST(node AS BIGINT) AS node, deg AS core_degree
    FROM {prev} ORDER BY node ASC
    """


@register(
    "graph_kcore",
    oracle=_kcore_oracle(),
    doc=f"{_KCORE_K}-core decomposition of the co-purchase part graph "
    f"(pairs sharing >= 2 orders, symmetrized) by iterative peeling "
    f"({_KCORE_ROUNDS} rounds, fixpoint pytest-asserted): each round "
    f"keeps nodes with >= {_KCORE_K} surviving neighbors, recomputing "
    "degrees within the surviving subgraph only — at sf0.01 the peel "
    "runs 10 rounds and keeps ~half the parts, a real core/periphery "
    "split. Each round is one keyed aggregate over the checkpointed "
    "edge list semi-joined against the (shrinking) survivor set — the "
    "Pregel peel shape; the fact is scanned once.",
    tags=("graph", "analytics"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("lineitem",))
    edges = spark.sql(
        "WITH " + _COPURCHASE_EDGES.format(mat="") + " SELECT src, dst FROM edges"
    ).localCheckpoint()
    surv = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    deg = None
    for _ in range(_KCORE_ROUNDS):
        a = surv.select(F.col("node").alias("sa"))
        b = surv.select(F.col("node").alias("sb"))
        deg = (
            edges.join(a, edges["src"] == a["sa"])
            .join(b, edges["dst"] == b["sb"])
            .groupBy(edges["src"].alias("node"))
            .agg(F.count("*").cast("bigint").alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .localCheckpoint()
        )
        surv = deg.select("node")
    return deg.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("deg").alias("core_degree"),
    ).orderBy("node")


# --- two-sample log-rank test between the md5 arms -----------------------------


def _logrank_sql(epochsec, hexfn, str_t: str) -> str:
    days = (
        f"CAST(floor(({epochsec('COALESCE(p_ts, (SELECT MAX(ts) FROM events))')}"
        f" - {epochsec('s_ts')}) / 86400.0) AS BIGINT)"
    )
    key = f"md5(concat('ab42|', CAST(user_id AS {str_t})))"
    return f"""
    WITH w AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS s_ts
      FROM events
    ),
    per AS (
      SELECT user_id, MIN(s_ts) AS s_ts,
             MIN(CASE WHEN event_type = 'purchase' AND ts > s_ts THEN ts END) AS p_ts
      FROM w WHERE s_ts IS NOT NULL GROUP BY user_id
    ),
    dur AS (
      SELECT user_id,
             CASE WHEN {hexfn(key)} % 2 = 0 THEN 1 ELSE 0 END AS is_a,
             CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END AS evt,
             {days} AS t
      FROM per
    ),
    g AS (
      SELECT t,
             CAST(SUM(is_a * evt) AS BIGINT) AS da,
             CAST(SUM(is_a * (1 - evt)) AS BIGINT) AS ca,
             CAST(SUM((1 - is_a) * evt) AS BIGINT) AS db,
             CAST(SUM((1 - is_a) * (1 - evt)) AS BIGINT) AS cb
      FROM dur GROUP BY t
    ),
    risk AS (
      SELECT t, da, db,
             SUM(da + ca) OVER ()
               - COALESCE(SUM(da + ca) OVER (ORDER BY t ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS na,
             SUM(db + cb) OVER ()
               - COALESCE(SUM(db + cb) OVER (ORDER BY t ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS nb
      FROM g
    ),
    terms AS (
      SELECT da, db, na, nb, na + nb AS nt, da + db AS dt,
             CAST(round(1000000.0 * (da + db) * na / (na + nb)) AS BIGINT)
               AS e1_micro,
             CASE WHEN na + nb > 1 THEN
               CAST(round(1000000.0 * (da + db)
                          * (CAST(na AS DOUBLE) / (na + nb))
                          * (1.0 - CAST(na AS DOUBLE) / (na + nb))
                          * (na + nb - (da + db)) / (na + nb - 1)) AS BIGINT)
             ELSE 0 END AS v_micro
      FROM risk WHERE da + db > 0
    ),
    s AS (
      SELECT CAST(SUM(da) AS BIGINT) AS o1,
             CAST(SUM(e1_micro) AS BIGINT) AS e1m,
             CAST(SUM(v_micro) AS BIGINT) AS vm
      FROM terms
    ),
    tot AS (
      SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
             CAST(SUM(1 - is_a) AS BIGINT) AS n_b
      FROM dur
    )
    SELECT tot.n_a, tot.n_b, s.o1 AS observed_a,
           CAST(s.e1m AS DOUBLE) / 1000000.0 AS expected_a,
           CAST(s.vm AS DOUBLE) / 1000000.0 AS var_logrank,
           (CAST(s.o1 AS DOUBLE) - CAST(s.e1m AS DOUBLE) / 1000000.0)
             * (CAST(s.o1 AS DOUBLE) - CAST(s.e1m AS DOUBLE) / 1000000.0)
             / (CAST(s.vm AS DOUBLE) / 1000000.0) AS chi2_logrank
    FROM s CROSS JOIN tot
    """


@register(
    "survival_logrank_arms",
    oracle=_logrank_sql(
        lambda e: f"CAST(floor(epoch({e})) AS BIGINT)",
        __import__(
            "rag_application_with_vectordb_spark.plans.oracle_dialect",
            fromlist=["duck_hex13_to_long"],
        ).duck_hex13_to_long,
        "VARCHAR",
    ),
    doc="Two-sample log-rank test comparing signup -> first-purchase "
    "survival between the md5-keyed A/B arms — the censoring-correct "
    "'did the treatment change time-to-conversion' test that pairs "
    "with survival_km_signup_purchase the way Welch pairs with the "
    "mean read-out (comparing conversion fractions at a fixed horizon "
    "throws censored users away; the log-rank uses every risk set). "
    "Per-event-time hypergeometric terms E1_t = d_t*n1_t/n_t and "
    "V_t land on the 1e-6 grid BEFORE their sums (exact BIGINT — an "
    "unordered fp sum over event times would be order-dependent; the "
    "PRF rule), O1 is an exact integer, and the chi-square assembles "
    "in one fixed fp chain. Risk sets come from two prefix sums over "
    "the duration DOMAIN (study-day-bounded, the KM discipline); the "
    "fact shuffles once to user grain.",
    tags=("stats", "analytics"),
)
def survival_logrank_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _logrank_sql(lambda e: f"unix_timestamp({e})", _spark_hex13, "STRING")
    )


# --- coarsened exact matching (CEM) ATT estimate -------------------------------


def _cem_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('ab42|', CAST(user_id AS {str_t})))"
    return f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN {hexfn(key)} % 2 = 0 THEN 1 ELSE 0 END AS is_a,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           AND ts < CAST('2024-01-16 00:00:00' AS TIMESTAMP)
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS pre_cents,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           AND ts >= CAST('2024-01-16 00:00:00' AS TIMESTAMP)
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS post_cents
      FROM events GROUP BY user_id
    ),
    bucketed AS (
      SELECT is_a,
             (pre_cents - (pre_cents % 25000)) AS bkt,
             post_cents
      FROM per_user
    ),
    cells AS (
      SELECT bkt,
             CAST(SUM(is_a) AS BIGINT) AS na,
             CAST(SUM(1 - is_a) AS BIGINT) AS nb,
             CAST(SUM(is_a * post_cents) AS BIGINT) AS sa,
             CAST(SUM((1 - is_a) * post_cents) AS BIGINT) AS sb
      FROM bucketed GROUP BY bkt
    ),
    matched AS (
      SELECT bkt, na, nb, sa, sb,
             CAST(round(1000000.0 * na * (CAST(sa AS DOUBLE) / na
                                          - CAST(sb AS DOUBLE) / nb)) AS BIGINT)
               AS term_micro
      FROM cells WHERE na > 0 AND nb > 0
    ),
    agg AS (
      SELECT CAST(COALESCE(SUM(na), 0) AS BIGINT) AS n_matched_a,
             CAST(COALESCE(SUM(nb), 0) AS BIGINT) AS n_matched_b,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(COALESCE(SUM(term_micro), 0) AS BIGINT) AS att_micro
      FROM matched
    ),
    dropped AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN nb = 0 THEN na ELSE 0 END), 0) AS BIGINT)
               AS n_dropped_a
      FROM cells
    )
    SELECT agg.n_matched_a, agg.n_matched_b, agg.n_cells, dropped.n_dropped_a,
           CASE WHEN agg.n_matched_a > 0 THEN
             CAST(agg.att_micro AS DOUBLE) / (1000000.0 * agg.n_matched_a) / 100.0
           ELSE NULL END AS att_dollars
    FROM agg CROSS JOIN dropped
    """


@register(
    "causal_cem_att",
    oracle=_cem_sql(
        __import__(
            "rag_application_with_vectordb_spark.plans.oracle_dialect",
            fromlist=["duck_hex13_to_long"],
        ).duck_hex13_to_long,
        "VARCHAR",
    ),
    doc="Coarsened exact matching (Iacus/King/Porro 2012) ATT estimate: "
    "users are matched on their pre-period spend coarsened to $250 "
    "buckets (exact integer flooring via pre - pre%25000), cells "
    "missing either arm are DROPPED (reported), and the treated-arm "
    "effect is the treated-count-weighted mean of per-cell outcome "
    "differences — the covariate-balance-by-construction alternative "
    "to model-based adjustment (CUPED assumes linearity; CEM does "
    "not). Per-cell terms land on the 1e-6 grid before the cross-cell "
    "sum (exact BIGINT — the PRF rule); the match itself is one hash "
    "aggregate on the bucket key, bounded by the bucket domain, never "
    "a per-user nearest-neighbor sort. The guardrail-to-estimate "
    "experiment ladder: srm -> welch -> cuped -> diff-in-diff -> cem.",
    tags=("stats", "analytics"),
)
def causal_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_cem_sql(_spark_hex13, "STRING"))


# --- recommender evaluation: leave-one-out hit-rate@3, CF vs popularity --------


def _reco_eval_sql(hexfn, str_t: str) -> str:
    """Shared SQL modulo the hex fold: deterministic leave-one-out split
    (per user, hold out the item with the largest keyed-md5 draw),
    item-item CF scoring from the TRAIN relation only, and a
    popularity baseline — both evaluated as hit-rate@3 on the same
    held-out items."""
    hk = hexfn(
        f"md5('loo42|' || CAST(ui.user_id AS {str_t}) || '|' || CAST(ui.item AS {str_t}))"
    )
    return f"""
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST({{jx}} AS BIGINT) AS item
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    multi AS (
      SELECT user_id FROM ui GROUP BY user_id HAVING COUNT(*) >= 2
    ),
    keyed AS (
      SELECT ui.user_id, ui.item,
             ROW_NUMBER() OVER (PARTITION BY ui.user_id
                                ORDER BY {hk} DESC, ui.item ASC) AS rn
      FROM ui JOIN multi ON multi.user_id = ui.user_id
    ),
    {_reco_eval_tail("keyed")}"""


def _reco_eval_tail(keyed: str) -> str:
    """Eval CTEs downstream of the leave-one-out ``keyed`` relation —
    shared verbatim between the DuckDB oracle (as more CTEs over the
    in-query ``keyed``) and the Spark side (over the localCheckpoint'ed
    ``keyed`` view, so events is scanned once, not once per CTE
    reference — Spark re-inlines CTEs). ``multi`` re-derives as the
    distinct users of ``keyed`` (identical by construction: keyed is
    ui restricted to multi-item users)."""
    return f"""
    hold AS (SELECT user_id, item AS held_item FROM {keyed} WHERE rn = 1),
    train AS (SELECT user_id, item FROM {keyed} WHERE rn > 1),
    co AS (
      SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS c
      FROM train a JOIN train b ON a.user_id = b.user_id AND a.item <> b.item
      GROUP BY a.item, b.item
    ),
    scores AS (
      SELECT t.user_id, co.item_b AS item, CAST(SUM(co.c) AS BIGINT) AS score
      FROM train t JOIN co ON co.item_a = t.item
      GROUP BY t.user_id, co.item_b
    ),
    cand AS (
      SELECT s.user_id, s.item, s.score
      FROM scores s LEFT JOIN train t
        ON t.user_id = s.user_id AND t.item = s.item
      WHERE t.item IS NULL
    ),
    cf3 AS (
      SELECT user_id, item FROM (
        SELECT user_id, item,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY score DESC, item ASC) AS rn
        FROM cand
      ) r WHERE r.rn <= 3
    ),
    pop AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM train GROUP BY item
    ),
    popu AS (
      SELECT m.user_id, p.item
      FROM (SELECT DISTINCT user_id FROM {keyed}) m CROSS JOIN pop p
      LEFT JOIN train t ON t.user_id = m.user_id AND t.item = p.item
      WHERE t.item IS NULL
    ),
    pop3 AS (
      SELECT user_id, item FROM (
        SELECT pu.user_id, pu.item,
               ROW_NUMBER() OVER (PARTITION BY pu.user_id
                                  ORDER BY p.n DESC, pu.item ASC) AS rn
        FROM popu pu JOIN pop p ON p.item = pu.item
      ) r WHERE r.rn <= 3
    ),
    agg AS (
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM hold) AS n_eval_users,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cf3 JOIN hold
           ON hold.user_id = cf3.user_id AND hold.held_item = cf3.item) AS cf_hits,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM pop3 JOIN hold
           ON hold.user_id = pop3.user_id AND hold.held_item = pop3.item) AS pop_hits
    )
    SELECT n_eval_users, cf_hits, pop_hits,
           CAST(cf_hits AS DOUBLE) / n_eval_users AS cf_hitrate3,
           CAST(pop_hits AS DOUBLE) / n_eval_users AS pop_hitrate3
    FROM agg
    """


def _register_reco_eval():
    from .oracle_dialect import duck_hex13_to_long

    duck = _reco_eval_sql(duck_hex13_to_long, "VARCHAR").replace(
        "{jx}", "json_extract_string(props, '$.k')"
    )

    @register(
        "eval_reco_hitrate",
        oracle=duck,
        doc="Recommender evaluation: deterministic leave-one-out split "
        "(per multi-item user, hold out the item with the largest "
        "keyed-md5 draw), then hit-rate@3 of item-item co-occurrence "
        "CF scoring vs the popularity baseline on the SAME held-out "
        "items — the offline eval loop behind reco_item_item_topk, "
        "with the baseline every reco eval must beat printed beside "
        "it. All relational: the co-occurrence matrix and candidate "
        "scoring are keyed joins bounded by the item domain, per-user "
        "top-3 are keyed windows, and the only global numbers are the "
        "three COUNT roll-ups. The md5 holdout makes the split (and "
        "so both hit-rates) bit-identical cross-engine. Spark "
        "localCheckpoints the bounded keyed split relation once, so "
        "the 8 downstream CTE references re-read the checkpoint, not "
        "the events fact (CTE re-inlining was 21 events scans).",
        tags=("analytics", "eval"),
    )
    def eval_reco_hitrate(spark, sf_dir):
        from .stats_queries import _spark_hex13

        tune(spark)
        register_views(spark, sf_dir, ("events",))
        hk = _spark_hex13(
            "md5('loo42|' || CAST(ui.user_id AS STRING) || '|' || CAST(ui.item AS STRING))"
        )
        keyed = spark.sql(
            f"""
            WITH ui AS (
              SELECT DISTINCT user_id,
                     CAST(get_json_object(props, '$.k') AS BIGINT) AS item
              FROM events WHERE event_type IN ('click', 'purchase')
            ),
            multi AS (
              SELECT user_id FROM ui GROUP BY user_id HAVING COUNT(*) >= 2
            )
            SELECT ui.user_id, ui.item,
                   ROW_NUMBER() OVER (PARTITION BY ui.user_id
                                      ORDER BY {hk} DESC, ui.item ASC) AS rn
            FROM ui JOIN multi ON multi.user_id = ui.user_id
            """
        ).localCheckpoint()
        keyed.createOrReplaceTempView("reco_eval_keyed")
        return spark.sql("WITH " + _reco_eval_tail("reco_eval_keyed"))

    return eval_reco_hitrate


_register_reco_eval()


# --- k-fold cross-validation of the spend~activity OLS by moment subtraction ---


def _kfold_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('cv42|', CAST(user_id AS {str_t})))"
    return f"""
    WITH per_user AS (
      SELECT user_id, {hexfn(key)} % 5 AS fold,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS y
      FROM events GROUP BY user_id
    ),
    fm AS (
      SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM per_user GROUP BY fold
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
             CAST(SUM(sy) AS BIGINT) AS sy, CAST(SUM(sxx) AS BIGINT) AS sxx,
             CAST(SUM(sxy) AS BIGINT) AS sxy, CAST(SUM(syy) AS BIGINT) AS syy
      FROM fm
    ),
    tr AS (
      SELECT fm.fold,
             tot.n - fm.n AS n_tr, tot.sx - fm.sx AS sx, tot.sy - fm.sy AS sy,
             tot.sxx - fm.sxx AS sxx, tot.sxy - fm.sxy AS sxy,
             fm.n AS n_te, fm.sx AS tsx, fm.sy AS tsy,
             fm.sxx AS tsxx, fm.sxy AS tsxy, fm.syy AS tsyy
      FROM fm CROSS JOIN tot
    ),
    fit AS (
      SELECT fold, n_tr, n_te, tsx, tsy, tsxx, tsxy, tsyy,
             (CAST(n_tr AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n_tr AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b1,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             CAST(n_tr AS DOUBLE) AS ntr
      FROM tr
    ),
    ev AS (
      SELECT fold, n_tr, n_te, b1,
             (syd - b1 * sxd) / ntr AS b0,
             CAST(tsyy AS DOUBLE)
               - 2.0 * ((syd - b1 * sxd) / ntr) * CAST(tsy AS DOUBLE)
               - 2.0 * b1 * CAST(tsxy AS DOUBLE)
               + 2.0 * ((syd - b1 * sxd) / ntr) * b1 * CAST(tsx AS DOUBLE)
               + CAST(n_te AS DOUBLE) * ((syd - b1 * sxd) / ntr)
                 * ((syd - b1 * sxd) / ntr)
               + b1 * b1 * CAST(tsxx AS DOUBLE) AS sse
      FROM fit
    )
    SELECT CAST(fold AS BIGINT) AS fold, CAST(n_tr AS BIGINT) AS n_train,
           CAST(n_te AS BIGINT) AS n_test, b1 AS beta1,
           SQRT(sse / n_te) / 100.0 AS rmse_test_dollars
    FROM ev ORDER BY fold ASC
    """


def _register_kfold():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    @register(
        "regress_kfold_cv",
        oracle=_kfold_sql(duck_hex13_to_long, "VARCHAR"),
        doc="5-fold cross-validation of the spend ~ activity OLS with NO "
        "second data pass: fold assignment is keyed md5, each fold's "
        "training moments are TOTAL minus FOLD (exact BIGINT "
        "subtraction — the jackknife-by-subtraction trick at fold "
        "granularity), and the held-out SSE expands algebraically "
        "from the fold's own raw moments and the train coefficients, "
        "so the entire CV is ONE user-keyed aggregate plus 5-row "
        "arithmetic. Per-fold test RMSE quantifies the fit stability "
        "regress_spend_on_activity's single R^2 cannot (one "
        "influential fold shows up as an RMSE outlier — see "
        "regress_influence_cooks for who causes it).",
        tags=("analytics", "stats"),
    )
    def regress_kfold_cv(spark, sf_dir):
        tune(spark)
        register_views(spark, sf_dir, ("events",))
        return spark.sql(_kfold_sql(_spark_hex13, "STRING"))

    return regress_kfold_cv


_register_kfold()


# --- betweenness centrality (Brandes, 4 fixed sources) --------------------------
#
# Brandes 2001 from k deterministic sources over the LPA item graph:
# forward BFS rounds accumulate shortest-path counts (sigma), the
# backward sweep accumulates dependencies delta(v) = sum over DAG
# successors w of sigma_v/sigma_w * (1 + delta(w)), processed by
# DESCENDING distance. Sampled-source betweenness is the standard
# at-scale estimator (exact all-sources Brandes is O(nm)); k=4 smallest
# node ids keep it deterministic. delta lives on the 1e-9 integer grid
# with exact floor division per term, so every bit reproduces in the
# unrolled-CTE oracle. All rounds operate on (source x node) relations
# bounded by 4x the node count — the fact is scanned once into the
# checkpointed edge list.

_BC_SOURCES = 4
_BC_ROUNDS = 8
_BC_GRID = 1_000_000_000


def _bc_oracle() -> str:
    g = _BC_GRID
    fwd = []
    for r in range(1, _BC_ROUNDS + 1):
        fwd.append(f"""f{r} AS MATERIALIZED (
      SELECT f.s, e.dst AS v, CAST(SUM(f.sigma) AS BIGINT) AS sigma
      FROM f{r-1} f JOIN edges e ON e.src = f.v
      WHERE NOT EXISTS (SELECT 1 FROM vis{r-1} x WHERE x.s = f.s AND x.v = e.dst)
      GROUP BY f.s, e.dst
    ),
    vis{r} AS MATERIALIZED (
      SELECT * FROM vis{r-1}
      UNION ALL SELECT s, v, CAST({r} AS BIGINT) AS dist, sigma FROM f{r}
    )""")
    bwd = []
    for lev in range(_BC_ROUNDS, 0, -1):
        bwd.append(f"""dl{lev-1} AS MATERIALIZED (
      SELECT * FROM dl{lev}
      UNION ALL
      SELECT b1.s, b1.v,
        CAST(SUM((b1.sigma * ({g} + COALESCE(d.delta, 0))
                  - (b1.sigma * ({g} + COALESCE(d.delta, 0))) % b2.sigma)
                 / b2.sigma) AS BIGINT) AS delta
      FROM vis{_BC_ROUNDS} b1
      JOIN edges e ON e.src = b1.v
      JOIN vis{_BC_ROUNDS} b2 ON b2.s = b1.s AND b2.v = e.dst
                             AND b2.dist = b1.dist + 1
      LEFT JOIN dl{lev} d ON d.s = b2.s AND d.v = b2.v
      WHERE b1.dist = {lev} - 1
      GROUP BY b1.s, b1.v
    )""")
    chain = ",\n    ".join(fwd + bwd)
    return f"""
    WITH {_lpa_edges(_UI_DUCK)},
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
    seeds AS MATERIALIZED (
      SELECT node AS s FROM nodes ORDER BY node ASC LIMIT {_BC_SOURCES}
    ),
    vis0 AS MATERIALIZED (
      SELECT s, s AS v, CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sigma
      FROM seeds
    ),
    f0 AS MATERIALIZED (SELECT s, v, sigma FROM vis0),
    {chain},
    dl{_BC_ROUNDS} AS MATERIALIZED (
      SELECT s, v, CAST(0 AS BIGINT) AS delta
      FROM vis{_BC_ROUNDS} WHERE dist = {_BC_ROUNDS}
    )
    SELECT CAST(v AS BIGINT) AS node, CAST(SUM(delta) AS BIGINT) AS bc_nano,
           CAST(SUM(delta) AS DOUBLE) / {g}.0 AS betweenness
    FROM (
      SELECT s, v, delta FROM dl0
      UNION ALL
      SELECT s, v, CAST(0 AS BIGINT) FROM vis{_BC_ROUNDS} WHERE dist > 0
    ) all_rows
    WHERE v <> s
    GROUP BY v
    """


@register(
    "graph_betweenness_4src",
    oracle=_bc_oracle(),
    doc=f"Brandes betweenness centrality from {_BC_SOURCES} fixed "
    "sources (smallest item ids) over the top-3 item co-occurrence "
    f"graph: {_BC_ROUNDS} forward BFS rounds accumulate shortest-path "
    "counts (sigma) per (source, node); the backward dependency sweep "
    "walks distances descending, each node's delta = sum over DAG "
    "successors of floor(sigma_v * (1e9 + delta_w) / sigma_w) — exact "
    "integer floor division on the 1e-9 grid, so the sampled "
    "betweenness (sum of per-source dependencies, sources excluded) "
    "is bit-reproducible against the unrolled MATERIALIZED-CTE "
    "oracle. Sampling sources is THE way betweenness scales (exact "
    "Brandes is O(nm)); every round is a keyed join over (source x "
    "node) relations — 4x the node table, never fact-sized — and the "
    "forward fixpoint (round 8 adds nothing) is pytest-asserted.",
    tags=("graph", "analytics"),
)
def graph_betweenness_4src(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _BC_GRID
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    edges = spark.sql(
        "WITH " + _lpa_edges(_UI_SPARK) + " SELECT src, dst FROM edges"
    ).localCheckpoint()
    seeds = (
        edges.select(F.col("src").alias("node")).distinct()
        .orderBy("node").limit(_BC_SOURCES)
        .select(F.col("node").alias("s"))
    )
    vis = seeds.select(
        "s", F.col("s").alias("v"),
        F.lit(0).cast("bigint").alias("dist"),
        F.lit(1).cast("bigint").alias("sigma"),
    ).localCheckpoint()
    frontier = vis.select("s", "v", "sigma")
    for r in range(1, _BC_ROUNDS + 1):
        cand = (
            frontier.join(edges, frontier["v"] == edges["src"])
            .select("s", F.col("dst").alias("nv"), "sigma")
            .join(
                vis.select("s", F.col("v").alias("nv")),
                ["s", "nv"],
                "left_anti",
            )
            .groupBy("s", "nv")
            .agg(F.sum("sigma").cast("bigint").alias("sigma"))
        )
        frontier = cand.select(
            "s", F.col("nv").alias("v"), "sigma"
        ).localCheckpoint()
        vis = vis.unionByName(
            frontier.withColumn("dist", F.lit(r).cast("bigint")).select(
                "s", "v", "dist", "sigma"
            )
        ).localCheckpoint()
    delta = (
        vis.filter(F.col("dist") == _BC_ROUNDS)
        .select("s", "v", F.lit(0).cast("bigint").alias("delta"))
        .localCheckpoint()
    )
    for lev in range(_BC_ROUNDS, 0, -1):
        b1 = vis.filter(F.col("dist") == lev - 1).select(
            F.col("s").alias("s1"), F.col("v").alias("v1"), F.col("sigma").alias("sg1")
        )
        b2 = vis.filter(F.col("dist") == lev).select(
            F.col("s").alias("s2"), F.col("v").alias("v2"), F.col("sigma").alias("sg2")
        )
        d = delta.select(
            F.col("s").alias("sd"), F.col("v").alias("vd"), F.col("delta").alias("dd")
        )
        num = F.col("sg1") * (F.lit(g) + F.coalesce(F.col("dd"), F.lit(0)))
        term = ((num - num % F.col("sg2")) / F.col("sg2")).cast("bigint")
        contrib = (
            b1.join(edges, F.col("v1") == edges["src"])
            .join(
                b2,
                (F.col("s2") == F.col("s1")) & (F.col("v2") == edges["dst"]),
            )
            .join(
                d,
                (F.col("sd") == F.col("s2")) & (F.col("vd") == F.col("v2")),
                "left",
            )
            .groupBy(F.col("s1").alias("s"), F.col("v1").alias("v"))
            .agg(F.sum(term).cast("bigint").alias("delta"))
        )
        delta = delta.unionByName(contrib).localCheckpoint()
    zeros = vis.filter(F.col("dist") > 0).select(
        "s", "v", F.lit(0).cast("bigint").alias("delta")
    )
    return (
        delta.unionByName(zeros)
        .filter(F.col("v") != F.col("s"))
        .groupBy(F.col("v").cast("bigint").alias("node"))
        .agg(
            F.sum("delta").cast("bigint").alias("bc_nano"),
            (F.sum("delta").cast("double") / F.lit(float(g))).alias("betweenness"),
        )
    )


# --- deterministic random walks over the item graph (node2vec data prep) ---------

_WALK_LEN = 8


def _walk_oracle() -> str:
    steps = []
    for t in range(1, _WALK_LEN + 1):
        h = duck_hex13_to_long(
            f"md5('walk|' || CAST(w.start AS VARCHAR) || '|' || CAST({t} AS VARCHAR))"
        )
        steps.append(f"""w{t} AS MATERIALIZED (
      SELECT w.start, nbr.dst AS node
      FROM w{t-1} w
      JOIN deg d ON d.src = w.node
      JOIN nbr ON nbr.src = w.node AND nbr.idx = ({h}) % d.outdeg + 1
    )""")
    chain = ",\n    ".join(steps)
    union = "\n      UNION ALL\n      ".join(
        f"SELECT start, CAST({t} AS BIGINT) AS step, node FROM w{t}"
        for t in range(0, _WALK_LEN + 1)
    )
    return f"""
    WITH {_lpa_edges(_UI_DUCK)},
    nbr AS MATERIALIZED (
      SELECT src, dst,
             CAST(row_number() OVER (PARTITION BY src ORDER BY dst ASC) AS BIGINT)
               AS idx
      FROM edges
    ),
    deg AS MATERIALIZED (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
    ),
    w0 AS MATERIALIZED (
      SELECT src AS start, src AS node FROM deg
    ),
    {chain}
    SELECT CAST(start AS BIGINT) AS start, step, CAST(node AS BIGINT) AS node
    FROM ({union}) allsteps
    """


@register(
    "graph_random_walks",
    oracle=_walk_oracle(),
    doc=f"Deterministic random walks of length {_WALK_LEN} from EVERY "
    "node of the top-3 item graph — the node2vec/DeepWalk data-prep "
    "stage (the walk corpus is what a skip-gram embedder consumes): "
    "at step t the walk at v hops to the keyed-md5-chosen neighbor "
    "index (md5('walk'|start|t) % outdeg), so the 'randomness' is a "
    "reproducible, auditable function of (start, step) — the same "
    "determinism device as every sampler in the catalog. Neighbor "
    "lists are indexed once (row_number per src keyed window); each "
    "step is ONE keyed join of the walk frontier against the indexed "
    "edge relation — |nodes| rows per step, never fact-sized; the "
    "oracle unrolls all steps as MATERIALIZED CTEs and matches "
    "bit-for-bit.",
    tags=("graph", "analytics", "sampling"),
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    from pyspark.sql import Window as W

    edges = spark.sql(
        "WITH " + _lpa_edges(_UI_SPARK) + " SELECT src, dst FROM edges"
    ).localCheckpoint()
    nbr = edges.withColumn(
        "idx",
        F.row_number().over(W.partitionBy("src").orderBy(F.asc("dst"))).cast("bigint"),
    ).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("outdeg"))
    w = deg.select(F.col("src").alias("start"), F.col("src").alias("node"))
    out = [w.select("start", F.lit(0).cast("bigint").alias("step"), "node")]
    for t in range(1, _WALK_LEN + 1):
        h = _spark_hex13(
            f"md5(concat('walk|', CAST(start AS STRING), '|', CAST({t} AS STRING)))"
        )
        w = (
            w.join(deg.withColumnRenamed("src", "node"), "node")
            .withColumn("pick", F.expr(f"({h}) % outdeg + 1"))
            .join(
                nbr.select(
                    F.col("src").alias("node"),
                    F.col("dst"),
                    F.col("idx").alias("pick"),
                ),
                ["node", "pick"],
            )
            .select("start", F.col("dst").alias("node"))
            .localCheckpoint()
        )
        out.append(w.select("start", F.lit(t).cast("bigint").alias("step"), "node"))
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.select(
        F.col("start").cast("bigint").alias("start"), "step",
        F.col("node").cast("bigint").alias("node"),
    )


# --- Nelson-Aalen cumulative hazard (completes the survival ladder) ---------------


def _na_sql(epochsec) -> str:
    days = (
        f"CAST(floor(({epochsec('COALESCE(p_ts, (SELECT MAX(ts) FROM events))')}"
        f" - {epochsec('s_ts')}) / 86400.0) AS BIGINT)"
    )
    return f"""
    WITH w AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS s_ts
      FROM events
    ),
    per AS (
      SELECT user_id, MIN(s_ts) AS s_ts,
             MIN(CASE WHEN event_type = 'purchase' AND ts > s_ts THEN ts END) AS p_ts
      FROM w WHERE s_ts IS NOT NULL GROUP BY user_id
    ),
    dur AS (
      SELECT user_id,
             CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END AS evt,
             {days} AS t
      FROM per
    ),
    grp AS (SELECT t, SUM(evt) AS d, SUM(1 - evt) AS c FROM dur GROUP BY t),
    risk AS (
      SELECT t, d, c,
             SUM(d + c) OVER ()
               - COALESCE(SUM(d + c) OVER (ORDER BY t ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM grp
    ),
    terms AS (
      SELECT t, d, c, n_risk,
             CASE WHEN d = 0 THEN 0
                  ELSE CAST(round(1000000.0 * CAST(d AS DOUBLE) / n_risk) AS BIGINT)
             END AS term_micro
      FROM risk
    )
    SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events, CAST(c AS BIGINT) AS c_censored,
           CAST(SUM(term_micro) OVER (ORDER BY t ASC) AS BIGINT)
             AS cum_hazard_micro,
           CAST(CAST(SUM(term_micro) OVER (ORDER BY t ASC) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS cum_hazard
    FROM terms ORDER BY t_days ASC
    """


def _register_na():
    @register(
        "survival_nelson_aalen",
        oracle=_na_sql(lambda e: f"CAST(floor(epoch({e})) AS BIGINT)"),
        doc="Nelson-Aalen cumulative hazard of signup -> first purchase "
        "(right-censored at the horizon, the same risk-set machinery as "
        "survival_km_signup_purchase): H(t) = sum of d_i/n_i over event "
        "times <= t — the additive-hazard companion to KM's product "
        "(H ~ -ln S; near-equal when increments are small, a relation "
        "the pytest checks), and the estimator of choice when hazard "
        "RATES rather than survival fractions drive the decision. "
        "Per-time terms land on the 1e-6 grid before the running sum "
        "(order-free), duration domain from prefix sums — no per-user "
        "re-scan.",
        tags=("stats", "analytics"),
    )
    def survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, ("events",))
        return spark.sql(_na_sql(lambda e: f"unix_timestamp({e})"))

    return survival_nelson_aalen


_register_na()


# --- rich-club coefficient of the item graph --------------------------------------


def _rich_club_sql(ui: str) -> str:
    return f"""
    WITH {_lpa_edges(ui)},
    {_rich_club_tail("edges")}"""


def _rich_club_tail(edges: str) -> str:
    """Threshold sweep downstream of the symmetrized edge list — shared
    verbatim between the DuckDB oracle (over the in-query ``edges``
    CTE) and the Spark side (over a localCheckpoint'ed edges view, so
    the 6-threshold hub semi-joins re-read the bounded checkpoint
    instead of re-deriving the co-occurrence graph from events 16x)."""
    ks = ", ".join(f"({k})" for k in (1, 2, 3, 4, 5, 6))
    return f"""
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM {edges} GROUP BY src),
    ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES {ks}) AS v(k)),
    hubs AS (
      SELECT ks.k, deg.node FROM ks JOIN deg ON deg.d > ks.k
    ),
    hn AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_hubs FROM hubs GROUP BY k),
    ew AS (
      SELECT h1.k, CAST(COUNT(*) AS BIGINT) AS e_directed
      FROM {edges} e
      JOIN hubs h1 ON h1.node = e.src
      JOIN hubs h2 ON h2.k = h1.k AND h2.node = e.dst
      GROUP BY h1.k
    )
    SELECT hn.k, hn.n_hubs,
           CAST(COALESCE(ew.e_directed, 0) / 2 AS BIGINT) AS edges_within,
           CASE WHEN hn.n_hubs < 2 THEN NULL
                ELSE CAST(COALESCE(ew.e_directed, 0) AS DOUBLE)
                     / (CAST(hn.n_hubs AS DOUBLE)
                        * CAST(hn.n_hubs - 1 AS DOUBLE))
           END AS rich_club_phi
    FROM hn LEFT JOIN ew ON ew.k = hn.k
    """


@register(
    "graph_rich_club",
    oracle=_rich_club_sql(_UI_DUCK),
    doc="Rich-club coefficient of the item graph (Zhou & Mondragon "
    "2004): for each degree threshold k, the edge density among "
    "nodes of degree > k — phi(k) = E_{>k} / (N_{>k}(N_{>k}-1)) on "
    "the symmetrized directed edge list (hence no /2: directed "
    "count over ordered pairs). A rising phi(k) says the hubs form "
    "a club that trades among itself — the assortativity-adjacent "
    "structure screen (graph_assortativity gives the correlation; "
    "this gives the density curve). Degree table once, one "
    "(k x hubs) semi-join per threshold over the bounded node "
    "relation; exact integer counts to one final division. Spark "
    "localCheckpoints the bounded top-capped edge list once (the "
    "graph_lpa_communities pattern) so the threshold sweep re-reads "
    "the checkpoint, not the events fact.",
    tags=("graph", "analytics"),
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    edges = spark.sql(
        "WITH " + _lpa_edges(_UI_SPARK) + " SELECT src, dst, co FROM edges"
    ).localCheckpoint()
    edges.createOrReplaceTempView("rich_club_edges")
    return spark.sql("WITH " + _rich_club_tail("rich_club_edges"))
