"""Classic data-mining catalog: frequent-itemset mining (Apriori),
decision-stump split search, and Yule-Walker autoregressive fitting —
the "teach the engine to train tiny models" tail that complements the
in-engine Naive Bayes (classify_queries) and the OLS family
(stats_queries / feature_queries).

Scale notes (100 TB posture):
- **freq_itemsets_3** generates candidate triples ONLY from frequent
  pairs (the Apriori closure property: every subset of a frequent set
  is frequent), then verifies support by joining basket pair
  occurrences against the broadcast candidate list. The fact is
  scanned once into the distinct (order, part) basket relation; the
  pair aggregate is the same single shuffle the co-purchase graph
  already runs; everything after operates on support-thresholded
  relations that SHRINK as data grows sparser — never an all-triples
  enumeration on the engine side (the brute-force form exists only as
  the DuckDB oracle).
- **tree_split_gini** is the distributed decision-tree split search
  (PLANET / Chaudhuri-style): histogram the bounded feature domain
  first (one groupBy on the feature value), then scan thresholds with
  a prefix-sum window over the HISTOGRAM, not the rows. The window is
  single-partition but its input is domain-bounded (<= |distinct
  n_chars| <= ~500 rows at any corpus size). Impurity ordering is
  exact: the weighted-Gini quotient is assembled from exact BIGINT
  counts with ONE correctly-rounded fp64 division per threshold
  (identical cross-engine), tie-broken by threshold ASC. Exact up to
  n^3 < 2^63 (~2e6 rows per class histogram); beyond that the counts
  are pre-scaled.
- **stats_ar2_yule_walker** collapses the fact to the calendar-bounded
  day grain first (exact integer daily revenue), so the lag self-join
  and every moment touch only ~365 rows/year regardless of fact size.
  Autocovariances are exact BIGINT via the (n*x - S) centering trick;
  daily revenue is floored to WHOLE DOLLARS by the exact-multiple
  division rule ((c - c%100)/100) because cents-grain squared
  deviations would overflow int64 near ~1e5-dollar days x 10-year
  spans; the Yule-Walker solve is a fixed fp64 chain over three exact
  integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import load_table, register_views, tables_in_sql
from .registry import register

# --- frequent 3-itemsets over order baskets (Apriori) --------------------------

_FI_MINSUP = 2


@register(
    "freq_itemsets_3",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS item_a, b2.l_partkey AS item_b,
           c.l_partkey AS item_c, CAST(COUNT(*) AS BIGINT) AS support
    FROM b a
    JOIN b b2 ON b2.l_orderkey = a.l_orderkey AND a.l_partkey < b2.l_partkey
    JOIN b c  ON c.l_orderkey = a.l_orderkey AND b2.l_partkey < c.l_partkey
    GROUP BY 1, 2, 3
    HAVING COUNT(*) >= {_FI_MINSUP}
    """,
    doc=f"Frequent 3-itemsets (support >= {_FI_MINSUP} orders) over the "
    "order->parts baskets, mined Apriori-style (Agrawal & Srikant "
    "1994): frequent pairs first (the co-purchase aggregate), "
    "candidate triples generated ONLY by joining frequent pairs on a "
    "shared prefix (item_a, item_b<item_c) and closure-pruned against "
    "the (item_b, item_c) pair, then support counted by joining the "
    "frequent-pair occurrence relation against the broadcast "
    "candidates — the engine never enumerates all-triples-per-basket "
    "(that brute form is the DuckDB oracle, results proven equal). "
    "One fact scan, one pair shuffle, broadcast-sized candidate "
    "relations: the shape survives 100 TB because support thresholds "
    "shrink the candidate set as baskets grow sparser.",
    tags=("mining", "analytics"),
)
def freq_itemsets_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    # NOT localCheckpoint'ed: b is the fact-sized basket relation — at
    # sf10 (60M lineitem) pinning it in executor storage memory OOM'd an
    # 8g heap, and at 100 TB it can never be materialized. Every reuse
    # below ends in ONE returned plan, so Spark's ReusedExchange dedups
    # the distinct's shuffle — same compute-once guarantee, zero pinned
    # storage. Only the THRESHOLDED (bounded) relations are checkpointed.
    b = li.select("l_orderkey", "l_partkey").distinct()

    a, c = b.alias("a"), b.alias("c")
    pair_occ = a.join(
        c,
        (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("c.l_partkey")),
    ).select(
        F.col("a.l_orderkey").alias("okey"),
        F.col("a.l_partkey").alias("x"),
        F.col("c.l_partkey").alias("y"),
    )
    fp = (
        pair_occ.groupBy("x", "y")
        .agg(F.count("*").cast("bigint").alias("sup"))
        .filter(F.col("sup") >= _FI_MINSUP)
        .localCheckpoint()  # feeds candidate gen, the prune, and verification
    )

    # Candidate generation: join frequent pairs sharing the first item,
    # then Apriori-prune (the (y, z) subset must itself be frequent).
    f1 = fp.select(F.col("x"), F.col("y"))
    f2 = fp.select(F.col("x").alias("x2"), F.col("y").alias("z"))
    cand = (
        f1.join(f2, (F.col("x") == F.col("x2")) & (F.col("y") < F.col("z")))
        .select("x", "y", "z")
        .join(
            fp.select(F.col("x").alias("y"), F.col("y").alias("z")),
            ["y", "z"],
            "left_semi",
        )
    )

    # Verification: frequent-pair occurrences (okey, x, y) extended by the
    # candidate's third item via the basket relation — each surviving row
    # is one basket containing the whole triple.
    tri = (
        pair_occ.join(F.broadcast(fp.select("x", "y")), ["x", "y"], "left_semi")
        .join(F.broadcast(cand), ["x", "y"])
        .join(
            b,
            (F.col("okey") == b["l_orderkey"]) & (F.col("z") == b["l_partkey"]),
            "left_semi",
        )
    )
    return (
        tri.groupBy("x", "y", "z")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= _FI_MINSUP)
        .select(
            F.col("x").alias("item_a"),
            F.col("y").alias("item_b"),
            F.col("z").alias("item_c"),
            "support",
        )
    )


# --- decision-stump split search (weighted Gini) --------------------------------


def _sql_query(name: str, sql: str, doc: str = "", oracle: str | None = None,
               tags=("mining",)):
    @register(name, oracle=oracle or sql, doc=doc, tags=tags)
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, tables_in_sql(_sql))
        return spark.sql(_sql)

    return fn


_sql_query(
    "tree_split_gini",
    """
    WITH h AS (
      SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p
      FROM documents GROUP BY n_chars
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(p) AS BIGINT) AS pp FROM h),
    c AS (
      SELECT v,
        CAST(SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS nl,
        CAST(SUM(p) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS pl
      FROM h
    ),
    s AS (
      SELECT c.v AS threshold,
             c.nl AS n_left, t.nn - c.nl AS n_right,
             c.pl AS pos_left, t.pp - c.pl AS pos_right,
             ((t.nn - c.nl) * (c.nl * c.nl - c.pl * c.pl
                               - (c.nl - c.pl) * (c.nl - c.pl))
              + c.nl * ((t.nn - c.nl) * (t.nn - c.nl)
                        - (t.pp - c.pl) * (t.pp - c.pl)
                        - ((t.nn - c.nl) - (t.pp - c.pl))
                          * ((t.nn - c.nl) - (t.pp - c.pl)))) AS gnum,
             t.nn * c.nl * (t.nn - c.nl) AS gden
      FROM c CROSS JOIN t
      WHERE c.nl < t.nn
    )
    SELECT CAST(threshold AS BIGINT) AS threshold,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(pos_left AS BIGINT) AS pos_left,
           CAST(pos_right AS BIGINT) AS pos_right,
           CAST(gnum AS DOUBLE) / CAST(gden AS DOUBLE) AS gini
    FROM s
    ORDER BY gini ASC, threshold ASC
    LIMIT 10
    """,
    doc="Decision-stump split search: the 10 best 'n_chars <= t' splits "
    "for predicting lang = 'en', ranked by weighted Gini impurity — "
    "the inner loop of every distributed decision-tree trainer "
    "(PLANET, XGBoost hist mode): histogram the bounded feature "
    "domain FIRST (one groupBy), prefix-sum the histogram to get "
    "every threshold's child counts in one window pass, never sort "
    "or re-scan the rows. Impurity is the exact integer quotient "
    "[nR(nL^2-posL^2-negL^2) + nL(nR^2-posR^2-negR^2)] / (n*nL*nR) "
    "evaluated with ONE correctly-rounded fp64 division per "
    "threshold, so the ranking is bit-stable cross-engine (tie: "
    "threshold ASC). Exact while n^3 < 2^63; beyond ~2e6 rows the "
    "histogram counts are pre-scaled, same as the ECDF queries.",
    tags=("mining", "ml"),
)


# --- Yule-Walker AR(2) fit of the daily revenue series --------------------------


def _ar2_sql(mat: str) -> str:
    return f"""
    WITH d0 AS{mat} (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    d AS{mat} (
      SELECT day, CAST((cents - cents % 100) / 100 AS BIGINT) AS x FROM d0
    ),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s FROM d),
    p AS (
      SELECT CAST(l.lag AS BIGINT) AS lag, a.x AS xa, b.x AS xb
      FROM d a
      CROSS JOIN (VALUES (0), (1), (2)) AS l(lag)
      JOIN d b ON b.day = a.day + INTERVAL 1 DAY * l.lag
    ),
    c AS (
      SELECT p.lag,
             CAST(SUM((g.n * p.xa - g.s) * (g.n * p.xb - g.s)) AS BIGINT) AS gam,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM p CROSS JOIN g GROUP BY p.lag
    ),
    w AS (
      SELECT
        MAX(CASE WHEN lag = 0 THEN gam END) AS g0,
        MAX(CASE WHEN lag = 1 THEN gam END) AS g1,
        MAX(CASE WHEN lag = 2 THEN gam END) AS g2,
        MAX(CASE WHEN lag = 1 THEN n_pairs END) AS n1,
        MAX(CASE WHEN lag = 2 THEN n_pairs END) AS n2
      FROM c
    )
    SELECT g.n AS n_days, w.n1 AS n_pairs_lag1, w.n2 AS n_pairs_lag2,
      CAST(w.g1 AS DOUBLE) / CAST(w.g0 AS DOUBLE) AS r1,
      CAST(w.g2 AS DOUBLE) / CAST(w.g0 AS DOUBLE) AS r2,
      (CAST(w.g1 AS DOUBLE) / CAST(w.g0 AS DOUBLE))
        * (1 - CAST(w.g2 AS DOUBLE) / CAST(w.g0 AS DOUBLE))
        / (1 - (CAST(w.g1 AS DOUBLE) / CAST(w.g0 AS DOUBLE))
               * (CAST(w.g1 AS DOUBLE) / CAST(w.g0 AS DOUBLE))) AS phi1,
      (CAST(w.g2 AS DOUBLE) / CAST(w.g0 AS DOUBLE)
        - (CAST(w.g1 AS DOUBLE) / CAST(w.g0 AS DOUBLE))
          * (CAST(w.g1 AS DOUBLE) / CAST(w.g0 AS DOUBLE)))
        / (1 - (CAST(w.g1 AS DOUBLE) / CAST(w.g0 AS DOUBLE))
               * (CAST(w.g1 AS DOUBLE) / CAST(w.g0 AS DOUBLE))) AS phi2
    FROM w CROSS JOIN g
    """


_sql_query(
    "stats_ar2_yule_walker",
    _ar2_sql(""),
    oracle=_ar2_sql(" MATERIALIZED"),
    doc="AR(2) fit of the daily purchase-revenue series by the "
    "Yule-Walker equations: phi1 = r1(1-r2)/(1-r1^2), phi2 = "
    "(r2-r1^2)/(1-r1^2) from the lag-0/1/2 autocovariances — the "
    "model-identification step that follows events_acf_daily's "
    "seasonality probe. The fact collapses to the calendar-bounded "
    "day grain first (one shuffle; ~365 rows/year at ANY fact size); "
    "daily revenue floors to whole dollars by the exact-multiple "
    "division rule ((c - c%100)/100 — cents-grain squared deviations "
    "would overflow int64), autocovariances are exact BIGINTs via "
    "the (n*x - S) centering identity, calendar-aligned by day "
    "arithmetic so date gaps never mis-pair lags, and the YW solve "
    "is one fixed fp64 chain — bit-stable cross-engine. The day "
    "relation is MATERIALIZED on the DuckDB side only (the "
    "CTE-inlining rule; Spark's three references re-scan a "
    "day-grain aggregate, which AQE reuses from the shuffle).",
    tags=("mining", "timeseries", "stats"),
)


# --- association rules from the frequent triples ---------------------------------


@register(
    "assoc_rules_conf",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM b),
    s1 AS MATERIALIZED (
      SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) AS sup FROM b GROUP BY 1
    ),
    s2 AS MATERIALIZED (
      SELECT a.l_partkey AS x, b2.l_partkey AS y, CAST(COUNT(*) AS BIGINT) AS sup
      FROM b a JOIN b b2 ON b2.l_orderkey = a.l_orderkey
                        AND a.l_partkey < b2.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_FI_MINSUP}
    ),
    s3 AS MATERIALIZED (
      SELECT a.l_partkey AS x, b2.l_partkey AS y, c.l_partkey AS z,
             CAST(COUNT(*) AS BIGINT) AS sup
      FROM b a
      JOIN b b2 ON b2.l_orderkey = a.l_orderkey AND a.l_partkey < b2.l_partkey
      JOIN b c  ON c.l_orderkey = a.l_orderkey AND b2.l_partkey < c.l_partkey
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= {_FI_MINSUP}
    ),
    rules AS (
      SELECT s3.x AS ante_a, s3.y AS ante_b, s3.z AS consequent,
             s3.sup, s2.sup AS ante_sup, s1.sup AS cons_sup
      FROM s3 JOIN s2 ON s2.x = s3.x AND s2.y = s3.y
              JOIN s1 ON s1.item = s3.z
      UNION ALL
      SELECT s3.x, s3.z, s3.y, s3.sup, s2.sup, s1.sup
      FROM s3 JOIN s2 ON s2.x = s3.x AND s2.y = s3.z
              JOIN s1 ON s1.item = s3.y
      UNION ALL
      SELECT s3.y, s3.z, s3.x, s3.sup, s2.sup, s1.sup
      FROM s3 JOIN s2 ON s2.x = s3.y AND s2.y = s3.z
              JOIN s1 ON s1.item = s3.x
    )
    SELECT CAST(ante_a AS BIGINT) AS ante_a, CAST(ante_b AS BIGINT) AS ante_b,
           CAST(consequent AS BIGINT) AS consequent,
           CAST(sup AS BIGINT) AS support,
           CAST(sup AS DOUBLE) / CAST(ante_sup AS DOUBLE) AS confidence,
           CAST(sup * nb.n AS DOUBLE) / CAST(ante_sup * cons_sup AS DOUBLE) AS lift
    FROM rules CROSS JOIN nb
    """,
    doc="Association rules {a,b} -> c from every frequent 3-itemset "
    "(all 3 consequent rotations): confidence = sup(abc)/sup(ab), "
    "lift = conf / P(c) = sup(abc)*N / (sup(ab)*sup(c)) — the "
    "market-basket read-out layered on freq_itemsets_3's Apriori "
    "output. The Spark side reuses the Apriori-pruned triple plan and "
    "joins the (already thresholded, broadcast-sized) pair relation; "
    "the UNthresholded single-item support aggregate is the probe side "
    "of a broadcast join (the bounded rule set broadcasts, never the "
    "item relation — it spans every part key). Antecedent pairs are "
    "frequent BY CLOSURE, so the joins never miss (the oracle "
    "recomputes everything brute-force). Confidence and lift are "
    "single fp64 divisions of exact BIGINT cross-products.",
    tags=("mining", "analytics"),
)
def assoc_rules_conf(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    # Unchecked-pointed for the same reason as freq_itemsets_3's b: the
    # basket relation is fact-sized (sf10 OOM proof), and ReusedExchange
    # already shares the distinct shuffle across nb/s1/s2.
    b = li.select("l_orderkey", "l_partkey").distinct()
    nb = b.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n"))
    s1 = b.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count("*").cast("bigint").alias("isup")
    )
    tri = freq_itemsets_3(spark, sf_dir).localCheckpoint()
    a, c = b.alias("a"), b.alias("c")
    s2 = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("px"), F.col("c.l_partkey").alias("py")
        )
        .agg(F.count("*").cast("bigint").alias("psup"))
        .filter(F.col("psup") >= _FI_MINSUP)
        .localCheckpoint()
    )
    rots = []
    for ante, cons in ((("item_a", "item_b"), "item_c"),
                       (("item_a", "item_c"), "item_b"),
                       (("item_b", "item_c"), "item_a")):
        rots.append(
            tri.select(
                F.col(ante[0]).alias("ante_a"),
                F.col(ante[1]).alias("ante_b"),
                F.col(cons).alias("consequent"),
                F.col("support"),
            )
        )
    rules = rots[0].unionAll(rots[1]).unionAll(rots[2])
    # Broadcast the RULES side into the item-support join, not s1: s1 is
    # the unthresholded per-item support over every part key (multi-GB at
    # 100 TB), while rules is bounded by the checkpointed frequent-triple
    # relation. s1 stays the streamed probe side of a broadcast-hash join.
    enriched = F.broadcast(
        rules.join(
            F.broadcast(s2),
            (F.col("ante_a") == F.col("px")) & (F.col("ante_b") == F.col("py")),
        )
    )
    return (
        enriched.join(s1, F.col("consequent") == F.col("item"))
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("ante_a").cast("bigint").alias("ante_a"),
            F.col("ante_b").cast("bigint").alias("ante_b"),
            F.col("consequent").cast("bigint").alias("consequent"),
            F.col("support"),
            (F.col("support").cast("double") / F.col("psup").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("support") * F.col("n")).cast("double")
                / (F.col("psup") * F.col("isup")).cast("double")
            ).alias("lift"),
        )
    )


# --- Hill tail-index estimator ----------------------------------------------------

_HILL_K = 50


_sql_query(
    "stats_hill_tail_index",
    f"""
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    h AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY cents
    ),
    c AS (
      SELECT cents, n,
        CAST(SUM(n) OVER (ORDER BY cents DESC ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS cum
      FROM h
    ),
    thr AS (
      -- the (K+1)-th order statistic from the top: the LARGEST value
      -- whose cumulative-from-the-top count reaches K+1 (MIN here would
      -- be the global minimum — every value at or below the threshold
      -- satisfies cum >= K+1)
      SELECT MAX(cents) AS xk1 FROM c WHERE cum >= {_HILL_K} + 1
    ),
    top AS (
      SELECT c.cents,
             CASE WHEN c.cum <= {_HILL_K} THEN c.n
                  ELSE c.n - (c.cum - {_HILL_K}) END AS w
      FROM c CROSS JOIN thr
      WHERE c.cents > thr.xk1 OR (c.cum - c.n) < {_HILL_K}
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN top.cents > thr.xk1 THEN top.w ELSE 0 END)
                  AS BIGINT) AS k_used,
             CAST(SUM(CASE WHEN top.cents > thr.xk1
                           THEN top.w * CAST(round(ln(CAST(top.cents AS DOUBLE)
                                / CAST(thr.xk1 AS DOUBLE)) * 1000000) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS lnsum_micro
      FROM top CROSS JOIN thr
    )
    SELECT s.k_used, thr.xk1 AS threshold_cents,
           CAST(s.lnsum_micro AS DOUBLE) / CAST(s.k_used AS DOUBLE) / 1000000.0
             AS mean_log_excess,
           CAST(s.k_used AS DOUBLE) * 1000000.0 / CAST(s.lnsum_micro AS DOUBLE)
             AS hill_alpha
    FROM s CROSS JOIN thr
    """,
    doc=f"Hill tail-index estimator over the top-{_HILL_K} purchase "
    "values: alpha_hat = k / sum ln(x_i / x_(k+1)) — the standard "
    "heavy-tail exponent probe (alpha < 2 means infinite variance: "
    "means and A/B tests on the metric are unstable; the "
    "transaction-value companion to text_zipf_fit's rank-frequency "
    "exponent). Order statistics come from the bounded distinct-value "
    "histogram (cumulative counts from the top — never a row sort); "
    "ties AT the threshold are excluded per the strict-excess "
    "convention (k_used counts strictly-above-threshold mass, so the "
    "estimator is well-defined under ties); per-value ln terms land "
    "on the 1e-6 grid weighted by exact counts BEFORE the sum. One "
    "scan, one histogram aggregate, windows over the value domain.",
    tags=("mining", "stats"),
)


# --- token-bucket rate-limit audit (ordered integer fold per user) ----------------
#
# Token bucket (capacity 2 tokens, 1 token / 6 h): credit is carried
# in SECONDS (cap 43200 s, cost 21600 s/event) so the whole recursion is
# integer min/subtract — no fp anywhere. The recursion clamps on BOTH
# sides (min at the cap, reject below cost), which no prefix-sum
# rewrite expresses (unlike CUSUM's one-sided max) — so this is the
# catalog's canonical ORDERED-FOLD state machine: one groupBy collects
# each user's encoded event list, one fold replays it. Events encode as
# epochsec*1e7 + event_id%1e7 (one sortable BIGINT; ids collide only
# past 1e7 events/user/second). Spark's aggregate() takes an explicit
# init; DuckDB's list_reduce() does not, so the oracle prepends a
# sentinel that TRANSFORMS into the init state (the Holt-linear
# list-accumulator trick, extended).

_RL_CAP = 2 * 21600  # seconds of credit
_RL_COST = 21600


def _rl_spark_sql() -> str:
    ep = "CAST((x - x % 10000000) / 10000000 AS BIGINT)"
    s0 = (
        f"CASE WHEN acc[3] < 0 THEN CAST({_RL_CAP} AS BIGINT) "
        f"ELSE least(CAST({_RL_CAP} AS BIGINT), acc[0] + ({ep} - acc[3])) END"
    )
    return f"""
    WITH e AS (
      SELECT user_id,
             unix_timestamp(ts) * 10000000 + event_id % 10000000 AS enc
      FROM events
    ),
    g AS (
      SELECT user_id, sort_array(collect_list(enc)) AS arr
      FROM e GROUP BY user_id
    ),
    f AS (
      SELECT user_id, CAST(size(arr) AS BIGINT) AS n_events,
        aggregate(arr,
          array(CAST({_RL_CAP} AS BIGINT), CAST(0 AS BIGINT),
                CAST(0 AS BIGINT), CAST(-1 AS BIGINT)),
          (acc, x) -> CASE WHEN {s0} >= {_RL_COST}
            THEN array({s0} - {_RL_COST}, acc[1] + 1, acc[2], {ep})
            ELSE array({s0}, acc[1], acc[2] + 1, {ep}) END) AS st
      FROM g
    )
    SELECT user_id, n_events,
           element_at(st, 2) AS accepted, element_at(st, 3) AS rejected,
           element_at(st, 1) AS credit_sec_left
    FROM f
    """


def _rl_duck_sql() -> str:
    ep = "CAST((x[1] - x[1] % 10000000) / 10000000 AS BIGINT)"
    # sentinel (-1) transforms into the init state [CAP, 0, 0, -1]; real
    # events transform into [enc, 0, 0, 0] and are decoded by the step.
    # acc[4] < 0 happens only for the init state, where credit is the
    # full cap regardless of acc[1].
    s0 = (
        f"CASE WHEN acc[4] < 0 THEN CAST({_RL_CAP} AS BIGINT) "
        f"ELSE least(CAST({_RL_CAP} AS BIGINT), acc[1] + ({ep} - acc[4])) END"
    )
    return f"""
    WITH e AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) * 10000000
               + event_id % 10000000 AS enc
      FROM events
    ),
    g AS (
      SELECT user_id, list_sort(list(enc)) AS arr
      FROM e GROUP BY user_id
    ),
    f AS (
      SELECT user_id, CAST(len(arr) AS BIGINT) AS n_events,
        list_reduce(
          list_transform(list_prepend(CAST(-1 AS BIGINT), arr),
            v -> CASE WHEN v = -1
                 THEN [CAST({_RL_CAP} AS BIGINT), CAST(0 AS BIGINT),
                       CAST(0 AS BIGINT), CAST(-1 AS BIGINT)]
                 ELSE [v, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                       CAST(0 AS BIGINT)] END),
          (acc, x) -> CASE WHEN {s0} >= {_RL_COST}
            THEN [{s0} - {_RL_COST}, acc[2] + 1, acc[3], {ep}]
            ELSE [{s0}, acc[2], acc[3] + 1, {ep}] END) AS st
      FROM g
    )
    SELECT user_id, n_events,
           st[2] AS accepted, st[3] AS rejected, st[1] AS credit_sec_left
    FROM f
    """


@register(
    "events_rate_limit_audit",
    oracle=_rl_duck_sql(),
    doc="Token-bucket rate-limit audit per user (capacity 2 requests, "
    "refill 1 per 6 hours): replay each user's event stream through the "
    "bucket and report accepted/rejected counts plus remaining credit "
    "— the throttling-policy what-if an API platform runs before "
    "changing limits. The two-sided clamp recursion (min at the cap, "
    "floor at the cost) has NO prefix-sum closed form — this is the "
    "catalog's canonical ordered integer FOLD: one shuffle to collect "
    "each user's sorted encoded events, one aggregate() fold in "
    "codegen, all-integer state so every bit reproduces in the "
    "list_reduce twin (sentinel-init trick). O(events) work, O(1) "
    "state per user; the streaming twin is applyInPandasWithState "
    "with the same 4-integer state.",
    tags=("mining", "analytics", "stateful"),
)
def events_rate_limit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_rl_spark_sql())


# --- price/volume decomposition of revenue change ---------------------------------

_sql_query(
    "sales_price_volume_decomp",
    """
    WITH y AS (
      SELECT l.l_partkey AS part, year(o.o_orderdate) AS yr,
             CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE year(o.o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    ),
    p AS (
      SELECT COALESCE(a.part, b.part) AS part,
             a.qty AS q0, a.cents AS r0, b.qty AS q1, b.cents AS r1
      FROM (SELECT * FROM y WHERE yr = 1996) a
      FULL OUTER JOIN (SELECT * FROM y WHERE yr = 1997) b ON b.part = a.part
    ),
    terms AS (
      SELECT
        CAST(SUM(COALESCE(r1, 0)) - SUM(COALESCE(r0, 0)) AS BIGINT)
          AS total_change_cents,
        CAST(SUM(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
             THEN CAST(round((CAST(r1 AS DOUBLE) * CAST(q0 AS DOUBLE)
                              / CAST(q1 AS DOUBLE) - CAST(r0 AS DOUBLE))
                             * 1000) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS price_effect_milli,
        CAST(SUM(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
             THEN CAST(round(CAST(q1 - q0 AS DOUBLE)
                             * CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
                             * 1000) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS volume_effect_milli,
        CAST(SUM(CASE WHEN q0 IS NULL THEN r1 ELSE 0 END) AS BIGINT)
          AS new_parts_cents,
        CAST(SUM(CASE WHEN q1 IS NULL THEN -r0 ELSE 0 END) AS BIGINT)
          AS discontinued_cents
      FROM p
    )
    SELECT total_change_cents,
           CAST(price_effect_milli AS DOUBLE) / 100000.0 AS price_effect_dollars,
           CAST(volume_effect_milli AS DOUBLE) / 100000.0 AS volume_effect_dollars,
           CAST(new_parts_cents AS DOUBLE) / 100.0 AS new_parts_dollars,
           CAST(discontinued_cents AS DOUBLE) / 100.0 AS discontinued_dollars,
           CAST(total_change_cents AS DOUBLE) / 100.0
             - (CAST(price_effect_milli AS DOUBLE) / 100000.0
                + CAST(volume_effect_milli AS DOUBLE) / 100000.0
                + CAST(new_parts_cents AS DOUBLE) / 100.0
                + CAST(discontinued_cents AS DOUBLE) / 100.0)
             AS residual_dollars
    FROM terms
    """,
    doc="Price/volume decomposition of 1996->1997 revenue change per "
    "the exact Laspeyres-price + Paasche-volume identity: for parts "
    "sold in both years, (p1-p0)q0 + (q1-q0)p1 == p1q1 - p0q0 "
    "term-by-term, with new/discontinued parts in their own buckets — "
    "the finance-bridge answer to 'how much of growth was pricing vs "
    "units?' (the cross-sectional sibling of revenue_bridge_weekly's "
    "user-level bridge). Unit prices are rationals r/q, so each "
    "part's effect lands on the milli-cent grid BEFORE the cross-part "
    "sum (order-free BIGINTs); the residual column measures exactly "
    "the grid rounding (pytest-bounded by parts*0.5 milli-cents) — "
    "the identity itself is exact. One fact scan into the (part, "
    "year) aggregate; the year pivot is a self-full-outer-join of "
    "the BOUNDED part-year relation.",
    tags=("mining", "analytics"),
)


# --- Neyman allocation for stratified sampling -------------------------------------

_NEYMAN_BUDGET = 1000

_sql_query(
    "sample_neyman_allocation",
    f"""
    WITH g AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(n_chars) AS BIGINT) AS s_h,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS q_h
      FROM documents GROUP BY lang
    ),
    w AS (
      -- N_h*S_h up to a shared factor; landed on the micro grid BEFORE
      -- the cross-strata sum (a raw double SUM is accumulation-order-
      -- dependent — the ANOVA between-term rule)
      SELECT lang, n_h,
             CAST(round(SQRT((CAST(q_h AS DOUBLE) * CAST(n_h AS DOUBLE)
                   - CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE))) * 1000000)
                  AS BIGINT) AS wgt_micro
      FROM g
    ),
    t AS (SELECT CAST(SUM(wgt_micro) AS BIGINT) AS wtot FROM w),
    q AS (
      SELECT w.lang, w.n_h,
             {_NEYMAN_BUDGET}.0 * CAST(w.wgt_micro AS DOUBLE)
               / CAST(t.wtot AS DOUBLE) AS quota
      FROM w CROSS JOIN t
    ),
    base AS (
      SELECT lang, n_h, quota,
             CAST(floor(quota) AS BIGINT) AS n_floor,
             quota - floor(quota) AS frac
      FROM q
    ),
    r AS (
      SELECT lang, n_h, quota, n_floor,
             row_number() OVER (ORDER BY frac DESC, lang ASC) AS rnk,
             CAST({_NEYMAN_BUDGET} - SUM(n_floor) OVER () AS BIGINT) AS leftover
      FROM base
    )
    SELECT lang, n_h AS stratum_size, quota AS exact_quota,
           CAST(n_floor + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_n
    FROM r
    """,
    doc=f"Neyman allocation of a {_NEYMAN_BUDGET}-row sampling budget "
    "across language strata: n_h proportional to N_h * S_h (the "
    "variance-optimal stratified design; S_h from exact BIGINT "
    "moments — sqrt(n*q - s^2) is N_h*S_h up to the shared 1/N_h "
    "factor, one sqrt per stratum). Fractional quotas round by the "
    "LARGEST-REMAINDER method (floor + distribute the leftover to "
    "the largest fractional parts, lang tiebreak) so the allocations "
    "sum to the budget EXACTLY — pytest-asserted, the property naive "
    "rounding breaks. All windows run over the |strata| relation. "
    "Feeds sample_stratified_k's executor: this query decides the "
    "per-stratum k.",
    tags=("mining", "analytics", "sampling"),
)


# --- driver analysis: which dimension explains revenue variance -------------------


def _eta2_branch(dim_name: str, dim_expr: str, src: str) -> str:
    return f"""
    SELECT '{dim_name}' AS dimension, k, n,
           ssb / (ssb + ssw) AS eta_squared,
           (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)) AS f_stat
    FROM (
      -- between-terms land on the WHOLE-UNIT grid (s_g^2/n_g reaches
      -- ~1e16 at dollar grain — a 1e-6 grid would overflow int64; SS
      -- magnitudes are >=1e13 so unit resolution loses nothing), then
      -- ssb/ssw are exact-int subtractions with one division at the end
      SELECT k, n,
             CAST(sum_term - CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                        / CAST(n AS DOUBLE)) AS BIGINT)
                  AS DOUBLE) AS ssb,
             CAST(q - sum_term AS DOUBLE) AS ssw
      FROM (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(s_g) AS BIGINT) AS s,
               CAST(SUM(q_g) AS BIGINT) AS q,
               CAST(SUM(CAST(round(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                                   / CAST(n_g AS DOUBLE))
                        AS BIGINT)) AS BIGINT) AS sum_term
        FROM (
          SELECT {dim_expr} AS grp, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(x) AS BIGINT) AS s_g,
                 CAST(SUM(x * x) AS BIGINT) AS q_g
          FROM {src} GROUP BY 1
        ) g
      ) t
    ) ss
    """


_DRIVER_SRC = """(
      SELECT l.l_partkey, l.l_returnflag, l.l_linestatus,
             CAST(round(l.l_discount * 100) AS BIGINT) AS discount_pct,
             year(l.l_shipdate) AS ship_year, month(l.l_shipdate) AS ship_month,
             p.p_brand,
             CAST(floor(l.l_extendedprice) AS BIGINT) AS x
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ) f"""

_sql_query(
    "driver_analysis_eta2",
    "\nUNION ALL\n".join(
        _eta2_branch(name, expr, _DRIVER_SRC)
        for name, expr in (
            ("brand", "p_brand"),
            ("return_flag", "l_returnflag"),
            ("line_status", "l_linestatus"),
            ("discount_pct", "discount_pct"),
            ("ship_year", "ship_year"),
            ("ship_month", "ship_month"),
        )
    ),
    doc="Driver analysis: one-way eta-squared (+ F) of line revenue "
    "against each candidate dimension (brand, return flag, line "
    "status, discount band, ship year, ship month) — the 'which dimension "
    "explains the metric' screen a BI team runs before segmenting "
    "dashboards (the multi-dimension generalization of "
    "stats_anova_lang_length, same 1e-6-grid between-term rule so "
    "cross-group sums are order-free BIGINTs). Revenue is floored to "
    "whole dollars (squared-cents moments would overflow int64 near "
    "sf1 — exact to ~sf100 at dollar grain). Each branch is one "
    "column-pruned scan into a |groups|-row aggregate; near-zero "
    "eta^2 everywhere is the fixture's expected answer — the harness "
    "is the deliverable.",
    tags=("mining", "analytics", "stats"),
)


# --- empirical-Bayes supplier reliability ranking ----------------------------------

_EB_TAU = 20  # prior strength (pseudo-observations)

_sql_query(
    "supplier_return_eb_shrunk",
    f"""
    WITH s AS (
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM lineitem GROUP BY l_suppkey
    ),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(k) AS BIGINT) AS kk FROM s)
    SELECT s.l_suppkey AS supp_key, s.n AS n_lines, s.k AS n_returned,
           CAST(s.k AS DOUBLE) / CAST(s.n AS DOUBLE) AS raw_rate,
           (CAST(s.k AS DOUBLE)
            + {_EB_TAU}.0 * CAST(g.kk AS DOUBLE) / CAST(g.nn AS DOUBLE))
             / (CAST(s.n AS DOUBLE) + {_EB_TAU}.0) AS shrunk_rate
    FROM s CROSS JOIN g
    ORDER BY (CAST(s.k AS DOUBLE)
              + {_EB_TAU}.0 * CAST(g.kk AS DOUBLE) / CAST(g.nn AS DOUBLE))
             / (CAST(s.n AS DOUBLE) + {_EB_TAU}.0) ASC,
             s.l_suppkey ASC
    LIMIT 10
    """,
    doc=f"Empirical-Bayes supplier reliability ranking: line-RETURN "
    f"rate shrunk toward the global rate with prior strength "
    f"tau={_EB_TAU} pseudo-observations — (k + tau*m)/(n + tau), the "
    "Beta-Binomial posterior-mean form that stops a 2-shipment "
    "supplier with 0 returns from outranking a 500-line one at 20% "
    "(the small-sample leaderboard pathology raw ranking has; the "
    "fixtures' suppliers are uniformly large, so pytest asserts the "
    "CONTRACTION property — every shrunk rate sits strictly between "
    "the raw rate and the global mean). One supplier aggregate + a broadcast "
    "1-row global; the ranking key is a fixed fp chain of exact "
    "integers, supp_key tiebreak.",
    tags=("mining", "analytics", "stats"),
)


# --- Wilcoxon signed-rank test on paired pre/post spend -----------------------------

_sql_query(
    "stats_wilcoxon_signed_rank",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           AND ts < CAST('2024-01-16 00:00:00' AS TIMESTAMP)
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           AND ts >= CAST('2024-01-16 00:00:00' AS TIMESTAMP)
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    d AS (SELECT y - x AS d FROM per_user WHERE y <> x),
    h AS (
      SELECT abs(d) AS ad, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS npos
      FROM d GROUP BY abs(d)
    ),
    c AS (
      SELECT ad, n, npos,
        CAST(SUM(n) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS cum
      FROM h
    ),
    w AS (
      SELECT CAST(SUM(npos * (2 * (cum - n) + n + 1)) AS BIGINT) AS w2,
             CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(n * n * n - n) AS BIGINT) AS tie3
      FROM c
    )
    SELECT nn AS n_pairs, w2 AS w_plus_doubled,
           CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
           (CAST(w2 AS DOUBLE) - CAST(nn * (nn + 1) AS DOUBLE) / 2.0)
             / SQRT((CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE)
                     * CAST(2 * nn + 1 AS DOUBLE)
                     - CAST(tie3 AS DOUBLE) / 2.0) / 6.0) AS z
    FROM w
    """,
    doc="Wilcoxon signed-rank test of the per-user post-minus-pre "
    "spend delta (the CUPED period split): the nonparametric paired "
    "test that stays valid when heavy-tailed spend breaks the paired "
    "t-test's normality (the within-subject companion to the "
    "Mann-Whitney identity inside eval_auc_doclang). Zero deltas drop "
    "per convention; |delta| ranks are AVERAGE ranks computed in "
    "histogram form over the distinct-|delta| domain (the Spearman "
    "doubled-rank trick: 2*avgrank = 2*cum_before + t + 1 stays an "
    "exact integer under ties), W+ and the tie-corrected variance "
    "n(n+1)(2n+1)/24 - sum(t^3-t)/48 are exact BIGINTs, and z is one "
    "fixed fp chain. One user aggregate + windows over the bounded "
    "delta domain — nothing sorts raw rows.",
    tags=("mining", "stats"),
)


# --- tokenizer vocabulary coverage curve ---------------------------------------------

_sql_query(
    "text_vocab_coverage",
    r"""
    WITH tok AS (
      SELECT w FROM (
        SELECT {unnest} AS w FROM (
          SELECT {split} AS ws FROM documents
        ) s
      ) t WHERE w <> ''
    ),
    wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY w),
    r AS (
      SELECT w, n,
             CAST(row_number() OVER (ORDER BY n DESC, w ASC) AS BIGINT) AS rnk,
             CAST(SUM(n) OVER (ORDER BY n DESC, w ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM wc
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS vocab FROM wc),
    k AS (
      SELECT CAST(v AS BIGINT) AS vocab_size
      FROM (VALUES (1), (2), (4), (8), (16), (32)) AS c(v)
    )
    SELECT k.vocab_size,
           CAST(MAX(CASE WHEN r.rnk <= k.vocab_size THEN r.cum ELSE 0 END)
                AS BIGINT) AS covered_tokens,
           t.total AS total_tokens,
           CAST(MAX(CASE WHEN r.rnk <= k.vocab_size THEN r.cum ELSE 0 END)
                AS DOUBLE) / CAST(t.total AS DOUBLE) AS coverage,
           1.0 - CAST(MAX(CASE WHEN r.rnk <= k.vocab_size THEN r.cum ELSE 0 END)
                      AS DOUBLE) / CAST(t.total AS DOUBLE) AS oov_rate
    FROM k CROSS JOIN r CROSS JOIN t
    GROUP BY k.vocab_size, t.total
    """.replace("{unnest}", "explode(ws)").replace(
        "{split}", r"split(trim(text), '\\s+')"
    ),
    oracle=r"""
    WITH tok AS (
      SELECT w FROM (
        SELECT unnest(ws) AS w FROM (
          SELECT regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
        ) s
      ) t WHERE w <> ''
    ),
    wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY w),
    r AS (
      SELECT w, n,
             CAST(row_number() OVER (ORDER BY n DESC, w ASC) AS BIGINT) AS rnk,
             CAST(SUM(n) OVER (ORDER BY n DESC, w ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM wc
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS vocab FROM wc),
    k AS (
      SELECT CAST(v AS BIGINT) AS vocab_size
      FROM (VALUES (1), (2), (4), (8), (16), (32)) AS c(v)
    )
    SELECT k.vocab_size,
           CAST(MAX(CASE WHEN r.rnk <= k.vocab_size THEN r.cum ELSE 0 END)
                AS BIGINT) AS covered_tokens,
           t.total AS total_tokens,
           CAST(MAX(CASE WHEN r.rnk <= k.vocab_size THEN r.cum ELSE 0 END)
                AS DOUBLE) / CAST(t.total AS DOUBLE) AS coverage,
           1.0 - CAST(MAX(CASE WHEN r.rnk <= k.vocab_size THEN r.cum ELSE 0 END)
                      AS DOUBLE) / CAST(t.total AS DOUBLE) AS oov_rate
    FROM k CROSS JOIN r CROSS JOIN t
    GROUP BY k.vocab_size, t.total
    """,
    doc="Tokenizer vocabulary coverage curve: token-mass coverage and "
    "OOV rate at vocabulary cutoffs 1..32 (top-k words by frequency, "
    "word-ASC tiebreak) — the sizing curve read before fixing a "
    "tokenizer's vocab (the Zipf-fit's engineering consequence: how "
    "much mass the head actually buys). Prefix sums over the "
    "frequency-ranked VOCABULARY relation (corpus-bounded, the "
    "TF-IDF shuffle class — never a scan of raw tokens per cutoff); "
    "coverage is one fp division of exact BIGINTs per cutoff row.",
    tags=("mining", "text"),
)


# --- functional-dependency audit ------------------------------------------------------


def _fd_branch(label: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{label}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(MAX(nd) AS BIGINT) AS max_distinct_rhs
    FROM (
      SELECT {lhs}, CAST(COUNT(DISTINCT {rhs}) AS BIGINT) AS nd
      FROM {table} GROUP BY {lhs}
    ) g
    """


_sql_query(
    "audit_functional_deps",
    "\nUNION ALL\n".join(
        _fd_branch(label, t, lhs, rhs)
        for label, t, lhs, rhs in (
            ("orders.o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
            ("orders.o_custkey->o_orderstatus", "orders", "o_custkey",
             "o_orderstatus"),
            ("lineitem.(l_orderkey,l_linenumber)->l_partkey", "lineitem",
             "l_orderkey, l_linenumber", "l_partkey"),
            ("lineitem.l_orderkey->l_suppkey", "lineitem", "l_orderkey",
             "l_suppkey"),
            ("part.p_name->p_brand", "part", "p_name", "p_brand"),
            ("documents.doc_id->lang", "documents", "doc_id", "lang"),
        )
    ),
    doc="Functional-dependency audit over six candidate FDs (the two "
    "true key constraints HOLD; the would-be composite key "
    "(l_orderkey, l_linenumber) turns out VIOLATED on this data — "
    "linenumbers repeat within an order — exactly the discovery the "
    "audit exists to make): per candidate, the number of "
    "LHS groups, how many witness a violation (>1 distinct RHS), and "
    "the worst multiplicity — the schema-inference / data-contract "
    "profiling pass (the intra-table sibling of "
    "audit_referential_integrity's cross-table FK checks). Each "
    "branch is one column-pruned groupBy + distinct-count; violation "
    "counts are exact integers, no fp anywhere.",
    tags=("mining", "audit"),
)


# --- newsvendor stocking level + expected cost ---------------------------------------
#
# cu = 5 (underage: lost margin/unit), co = 2 (overage: holding/unit);
# critical ratio 5/7. Optimal stock = the smallest level whose demand
# CDF reaches the ratio (the classic fractile solution); both the CDF
# comparison (cum*7 >= 5*n_days, exact integers) and the expected-cost
# curve are computed from the bounded daily-demand histogram, zero-
# demand days included via the calendar count.

_NV_CU, _NV_CO = 5, 2
_NV_TOP = 5


_NV_ORACLE = f"""
    WITH cal AS MATERIALIZED (
      SELECT CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days
      FROM orders
    ),
    dd AS MATERIALIZED (
      SELECT l.l_partkey AS part, CAST(o.o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS d
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    topp AS (
      SELECT part FROM (
        SELECT part, SUM(d) AS tot,
               row_number() OVER (ORDER BY SUM(d) DESC, part ASC) AS rn
        FROM dd GROUP BY part
      ) r WHERE rn <= {_NV_TOP}
    ),
    h AS (
      SELECT dd.part, dd.d, CAST(COUNT(*) AS BIGINT) AS nd
      FROM dd JOIN topp ON topp.part = dd.part
      GROUP BY dd.part, dd.d
      UNION ALL
      SELECT topp.part, CAST(0 AS BIGINT) AS d,
             cal.n_days - agg.present AS nd
      FROM topp CROSS JOIN cal
      JOIN (SELECT part, CAST(COUNT(*) AS BIGINT) AS present
            FROM dd GROUP BY part) agg ON agg.part = topp.part
    ),
    c AS (
      SELECT part, d, nd,
        CAST(SUM(nd) OVER (PARTITION BY part ORDER BY d
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum
      FROM h
    ),
    opt AS (
      SELECT c.part, MIN(c.d) AS stock_opt
      FROM c CROSS JOIN cal
      WHERE c.cum * {_NV_CU + _NV_CO} >= {_NV_CU} * cal.n_days
      GROUP BY c.part
    ),
    cost AS (
      SELECT h.part,
        CAST(SUM(h.nd * ({_NV_CO} * greatest(opt.stock_opt - h.d, 0)
                         + {_NV_CU} * greatest(h.d - opt.stock_opt, 0)))
             AS BIGINT) AS total_cost_units
      FROM h JOIN opt ON opt.part = h.part
      GROUP BY h.part
    )
    SELECT opt.part AS part_key, cal.n_days, opt.stock_opt,
           cost.total_cost_units,
           CAST(cost.total_cost_units AS DOUBLE) / CAST(cal.n_days AS DOUBLE)
             AS expected_daily_cost_units
    FROM opt JOIN cost ON cost.part = opt.part CROSS JOIN cal
    """


@register(
    "inventory_newsvendor",
    oracle=_NV_ORACLE,
    doc=f"Newsvendor stocking optimization for the top-{_NV_TOP} parts "
    f"by demand: optimal stock = the cu/(cu+co) = {_NV_CU}/{_NV_CU + _NV_CO} "
    "fractile of the DAILY demand distribution (zero-demand days "
    "included via the calendar count — omitting them overstates "
    "demand, the classic intermittent-demand mistake), found by the "
    "exact integer CDF comparison cum*(cu+co) >= cu*n_days over the "
    "bounded demand histogram; expected over/under cost at the chosen "
    "level is an exact integer sum over the same histogram (pytest "
    "asserts it is the MINIMUM over all candidate levels — the "
    "newsvendor optimality property). Spark plan: rank parts from a "
    "plain per-part aggregate (pass 1), THEN build the (part, day) "
    "histogram only for the broadcast top-5-restricted fact (pass 2) "
    "— the all-parts day-grain aggregate never materializes, and the "
    "bounded 5-part histogram is checkpointed once. The former "
    "dialect-shared CTE form re-derived the fact-grain dd per "
    "reference (12 lineitem + 18 orders scans, ~58 s at sf10 vs ~37 s "
    "after — the residual cost is the two inherent fact joins); the "
    "DuckDB oracle keeps that form with MATERIALIZED dd.",
    tags=("mining", "analytics"),
)
def inventory_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cal = orders.agg(
        F.countDistinct(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("n_days")
    ).localCheckpoint()
    fact = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("l_partkey").alias("part"),
        F.col("o_orderdate").cast("date").alias("day"),
        F.floor(F.col("l_quantity")).cast("bigint").alias("q"),
    )
    topp = (
        fact.groupBy("part")
        .agg(F.sum("q").cast("bigint").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("part"))
        .limit(_NV_TOP)
        .select("part")
        .localCheckpoint()
    )
    dd = (
        fact.join(F.broadcast(topp), "part")
        .groupBy("part", "day")
        .agg(F.sum("q").cast("bigint").alias("d"))
        .localCheckpoint()  # bounded: _NV_TOP parts x calendar days
    )
    present = dd.groupBy("part").agg(F.count("*").cast("bigint").alias("present"))
    h = (
        dd.groupBy("part", "d")
        .agg(F.count("*").cast("bigint").alias("nd"))
        .unionByName(
            topp.join(present, "part")
            .crossJoin(F.broadcast(cal))
            .select(
                "part",
                F.lit(0).cast("bigint").alias("d"),
                (F.col("n_days") - F.col("present")).alias("nd"),
            )
        )
    )
    w = Window.partitionBy("part").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.withColumn("cum", F.sum("nd").over(w).cast("bigint"))
    opt = (
        c.crossJoin(F.broadcast(cal))
        .filter(
            F.col("cum") * F.lit(_NV_CU + _NV_CO) >= F.lit(_NV_CU) * F.col("n_days")
        )
        .groupBy("part")
        .agg(F.min("d").alias("stock_opt"))
    )
    cost = (
        h.join(opt, "part")
        .groupBy("part")
        .agg(
            F.sum(
                F.col("nd")
                * (
                    F.lit(_NV_CO) * F.greatest(F.col("stock_opt") - F.col("d"), F.lit(0))
                    + F.lit(_NV_CU) * F.greatest(F.col("d") - F.col("stock_opt"), F.lit(0))
                )
            )
            .cast("bigint")
            .alias("total_cost_units")
        )
    )
    return (
        opt.join(cost, "part")
        .crossJoin(F.broadcast(cal))
        .select(
            F.col("part").alias("part_key"),
            "n_days",
            "stock_opt",
            "total_cost_units",
            (
                F.col("total_cost_units").cast("double")
                / F.col("n_days").cast("double")
            ).alias("expected_daily_cost_units"),
        )
    )


# --- off-policy evaluation: IPS / SNIPS ----------------------------------------------

_OPE_K = 60  # target policy: treat iff activity >= K events


def _ope_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('ab42|', CAST(user_id AS {str_t})))"
    return f"""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS activity,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ),
    logged AS (
      SELECT activity, cents,
             CASE WHEN {hexfn(key)} % 2 = 0 THEN 1 ELSE 0 END AS b_arm,
             CASE WHEN activity >= {_OPE_K} THEN 1 ELSE 0 END AS pi_arm
      FROM per_user
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN b_arm = pi_arm THEN 1 ELSE 0 END) AS BIGINT)
               AS n_match,
             CAST(SUM(CASE WHEN b_arm = pi_arm THEN cents ELSE 0 END) AS BIGINT)
               AS r_match,
             CAST(SUM(cents) AS BIGINT) AS r_all
      FROM logged
    )
    SELECT n, n_match, r_match,
           2.0 * CAST(r_match AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
             AS v_ips_dollars,
           CAST(r_match AS DOUBLE) / CAST(n_match AS DOUBLE) / 100.0
             AS v_snips_dollars,
           CAST(r_all AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
             AS v_onpolicy_dollars
    FROM agg
    """


def _register_ope():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    @register(
        "eval_offpolicy_ips",
        oracle=_ope_sql(duck_hex13_to_long, "VARCHAR"),
        doc=f"Off-policy evaluation of the deterministic target policy "
        f"'treat iff activity >= {_OPE_K}' from logs whose behavior "
        "policy is the known uniform keyed-md5 arm (propensity exactly "
        "1/2): V_IPS = mean(2 * r * match), V_SNIPS = the self-"
        "normalized variant (sum r*w / sum w — biased but far lower "
        "variance), with the on-policy mean alongside — the "
        "counterfactual 'what would this targeting rule have earned' "
        "read-out that powers policy iteration without a new "
        "experiment. The uniform logger makes the weights constants, "
        "so everything is exact BIGINT sums until three final "
        "divisions; under the fixture's policy-independent rewards "
        "IPS ~ SNIPS ~ on-policy (the A/A sanity the estimator must "
        "pass, pytest-asserted within noise).",
        tags=("mining", "eval", "stats"),
    )
    def eval_offpolicy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .stats_queries import _spark_hex13 as hx

        tune(spark)
        register_views(spark, sf_dir, ("events",))
        return spark.sql(_ope_sql(hx, "STRING"))

    return eval_offpolicy_ips


_register_ope()


# --- Croston intermittent-demand forecast -------------------------------------------
#
# Croston (1972): on each DEMAND day, smooth the demand size z and the
# inter-demand interval p separately (alpha = 0.2); the demand-rate
# forecast is z/p per day. The fold runs over each top-part's encoded
# (size, interval) pairs — the Holt-Winters array-fold idiom, state
# [z, p] — with init [q1, i1] (first interval = days since the series
# start). Encoding: q*10000 + i (q bounded by daily part demand, i by
# the calendar span).


def _croston_spark_parts() -> tuple[str, str, str]:
    """(collect, lst, fold_open) in the Spark dialect — shared by the
    full shared-SQL form and the hybrid plan's tail."""
    collect, lst = "sort_array(collect_list(enc))", "size"
    q0 = ("CAST(CAST((element_at(arr, 1) - element_at(arr, 1) % 10000) / 10000 "
          "AS BIGINT) % 10000 AS DOUBLE)")
    i0 = "CAST(element_at(arr, 1) % 10000 AS DOUBLE)"
    qx = "CAST(CAST((x - x % 10000) / 10000 AS BIGINT) % 10000 AS DOUBLE)"
    ix = "CAST(x % 10000 AS DOUBLE)"
    fold_open = (
        f"aggregate(slice(arr, 2, size(arr) - 1), "
        f"array({q0}, {i0}), "
        f"(acc, x) -> array("
        f"CAST(0.2 AS DOUBLE) * {qx} + CAST(0.8 AS DOUBLE) * acc[0], "
        f"CAST(0.2 AS DOUBLE) * {ix} + CAST(0.8 AS DOUBLE) * acc[1]))"
    )
    return collect, lst, fold_open


def _croston_sql(spark_side: bool, mat: str = "") -> str:
    if spark_side:
        collect, lst, fold_open = _croston_spark_parts()
        daydiff = "datediff(CAST(o.o_orderdate AS DATE), DATE '1970-01-01')"
    else:
        fold_open = (
            "list_reduce(list_transform(arr, v -> "
            "[CAST(CAST((v - v % 10000) / 10000 AS BIGINT) % 10000 AS DOUBLE), "
            "CAST(v % 10000 AS DOUBLE)]), "
            "(acc, x) -> ["
            "0.2::DOUBLE * x[1] + 0.8::DOUBLE * acc[1], "
            "0.2::DOUBLE * x[2] + 0.8::DOUBLE * acc[2]])"
        )
        collect, lst = "list_sort(list(enc))", "len"
        daydiff = "date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))"
    st = fold_open
    sel_z = "element_at(st, 1)" if spark_side else "st[1]"
    sel_p = "element_at(st, 2)" if spark_side else "st[2]"
    return f"""
    WITH dd AS{mat} (
      SELECT l.l_partkey AS part, CAST({daydiff} AS BIGINT) AS didx,
             CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    topp AS (
      SELECT part FROM (
        SELECT part, SUM(q) AS tot,
               row_number() OVER (ORDER BY SUM(q) DESC, part ASC) AS rn
        FROM dd GROUP BY part
      ) r WHERE rn <= 5
    ),
    base AS (SELECT CAST(MIN(didx) AS BIGINT) AS d0 FROM dd),
    seq AS (
      SELECT dd.part, dd.didx, dd.q,
             dd.didx - COALESCE(lag(dd.didx) OVER (PARTITION BY dd.part
                                                   ORDER BY dd.didx),
                                base.d0 - 1) AS gap
      FROM dd JOIN topp ON topp.part = dd.part CROSS JOIN base
    ),
    enc AS (
      -- didx leads the encoding so list_sort/sort_array IS day order
      SELECT part, didx, didx * 100000000 + q * 10000 + gap AS enc FROM seq
    ),
    g AS (
      SELECT part, {collect} AS arr FROM enc GROUP BY part
    ),
    f AS (
      SELECT part, CAST({lst}(arr) AS BIGINT) AS n_demand_days,
             {st} AS st
      FROM g
    )
    SELECT CAST(part AS BIGINT) AS part_key, n_demand_days,
           {sel_z} AS z_size, {sel_p} AS p_interval,
           {sel_z} / {sel_p} AS demand_rate_per_day
    FROM f
    """


@register(
    "forecast_croston",
    oracle=_croston_sql(False, mat=" MATERIALIZED"),
    doc="Croston intermittent-demand forecast for the top-5 parts: "
    "demand SIZE and inter-demand INTERVAL smoothed separately "
    "(alpha=0.2) over the part's demand days, rate forecast = z/p — "
    "the standard method when a plain EWMA of daily demand is biased "
    "by the zero days (newsvendor's stocking question needs exactly "
    "this rate for slow movers). Each part's (day, size, gap) triple "
    "encodes as one BIGINT with the DAY INDEX leading, so the sorted "
    "fold replays chronologically (q/gap assumed < 1e4 — true for "
    "daily part demand and calendar spans at any tested SF); the fold is the Holt-Winters array idiom "
    "with [z, p] state and [q1, i1] init, bit-identical in "
    "aggregate()/list_reduce. Spark plan (the newsvendor rule): rank "
    "parts from a per-part aggregate first, build the (part, day) "
    "grain only for the broadcast top-5-restricted fact, checkpoint "
    "the bounded result, and run the gap window + fold tail over it — "
    "the shared-SQL form re-inlined the fact-grain dd per CTE "
    "reference (3 lineitem + 3 orders scans, ~42 s at sf10 vs ~26 s). "
    "The oracle keeps the CTE form with MATERIALIZED dd. Folds run "
    "over demand days only.",
    tags=("mining", "timeseries"),
)
def forecast_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    fact = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("l_partkey").alias("part"),
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"
        ).alias("didx"),
        F.floor(F.col("l_quantity")).cast("bigint").alias("qq"),
    )
    topp = (
        fact.groupBy("part")
        .agg(F.sum("qq").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("part"))
        .limit(5)
        .select("part")
        .localCheckpoint()
    )
    base = fact.agg(F.min("didx").cast("bigint").alias("d0")).localCheckpoint()
    dd = (
        fact.join(F.broadcast(topp), "part")
        .groupBy("part", "didx")
        .agg(F.sum("qq").cast("bigint").alias("q"))
        .localCheckpoint()  # bounded: 5 parts x calendar days
    )
    dd.createOrReplaceTempView("croston_dd")
    base.createOrReplaceTempView("croston_base")
    _, lst, fold_open = _croston_spark_parts()
    collect = "sort_array(collect_list(enc))"
    return spark.sql(f"""
    WITH seq AS (
      SELECT dd.part, dd.didx, dd.q,
             dd.didx - COALESCE(lag(dd.didx) OVER (PARTITION BY dd.part
                                                   ORDER BY dd.didx),
                                b.d0 - 1) AS gap
      FROM croston_dd dd CROSS JOIN croston_base b
    ),
    enc AS (
      SELECT part, didx, didx * 100000000 + q * 10000 + gap AS enc FROM seq
    ),
    g AS (
      SELECT part, {collect} AS arr FROM enc GROUP BY part
    ),
    f AS (
      SELECT part, CAST({lst}(arr) AS BIGINT) AS n_demand_days,
             {fold_open} AS st
      FROM g
    )
    SELECT CAST(part AS BIGINT) AS part_key, n_demand_days,
           element_at(st, 1) AS z_size, element_at(st, 2) AS p_interval,
           element_at(st, 1) / element_at(st, 2) AS demand_rate_per_day
    FROM f
    """)


# --- ABC-XYZ inventory classification -------------------------------------------------

@register(
    "inventory_abc_xyz",
    oracle="""
    WITH dd AS (
      SELECT l.l_partkey AS part, CAST(o.o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    cal AS (
      SELECT CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days
      FROM orders
    ),
    m AS (
      -- per-part exact moments of daily demand INCLUDING zero days:
      -- with nd calendar days, sum/sumsq over demand days extend to the
      -- full series for free (zeros add nothing)
      SELECT part, CAST(SUM(q) AS BIGINT) AS s, CAST(SUM(q * q) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS present
      FROM dd GROUP BY part
    ),
    r AS (
      SELECT m.part, m.s, m.sq, cal.n_days,
        CAST(SUM(m.s) OVER (ORDER BY m.s DESC, m.part ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_s,
        CAST(SUM(m.s) OVER () AS BIGINT) AS tot_s
      FROM m CROSS JOIN cal
    ),
    k AS (
      SELECT part, s AS total_qty, n_days,
        CASE WHEN cum_s * 10 <= tot_s * 8 THEN 'A'
             WHEN cum_s * 100 <= tot_s * 95 THEN 'B'
             ELSE 'C' END AS abc_class,
        -- CV^2 of daily demand in exact cross-multiplied form:
        -- cv2 = n*sq/s^2 - 1; X: cv2 < 0.25, Y: < 1.0, else Z
        CASE WHEN n_days * sq * 4 < s * s * 5 THEN 'X'
             WHEN n_days * sq < s * s * 2 THEN 'Y'
             ELSE 'Z' END AS xyz_class
      FROM r
    )
    SELECT abc_class, xyz_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(total_qty) AS BIGINT) AS total_qty
    FROM k GROUP BY abc_class, xyz_class
    """,
    doc="ABC-XYZ inventory classification cross-tab: ABC by cumulative "
    "share of total quantity (A = first 80%, B = to 95% — exact "
    "integer cross-multiplied thresholds over the ranked part "
    "relation, the parts_pareto_abc rule), XYZ by demand variability "
    "(CV^2 of the DAILY series including zero days, in the exact "
    "cross-multiplied form n*sq*k < s^2*m so no fp threshold can "
    "flap; X < 0.5 CV, Y < 1, else Z) — the 2-d segmentation that "
    "routes parts to forecasting methods (AX: EWMA; AZ/CZ "
    "intermittent: forecast_croston; the companion query). One fact "
    "scan to (part, day), one part aggregate; the oracle ranks the "
    "part relation with a global cumulative window, the Spark side "
    "uses the distributed two-level prefix sum "
    "(operators/prefix.py, exact BIGINT regrouped addition) so no "
    "single-partition stage touches the part domain.",
    tags=("mining", "analytics"),
)
def inventory_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import bucketed_running_sum

    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    dd = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    cal = o.agg(
        F.countDistinct(F.col("o_orderdate").cast("date")).cast("bigint").alias("n_days")
    )
    m = dd.groupBy("part").agg(
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sq"),
    )
    ranked = bucketed_running_sum(
        m,
        value_col="s",
        lead_col="s",
        tiebreak=[F.asc("part")],
        lead_desc=True,
        out_col="cum_s",
        total_col="tot_s",
    )
    r = ranked.crossJoin(F.broadcast(cal)).select(
        "part",
        "s",
        "sq",
        "n_days",
        F.col("cum_s").cast("bigint").alias("cum_s"),
        F.col("tot_s").cast("bigint").alias("tot_s"),
    )
    k = r.select(
        F.col("part"),
        F.col("s").alias("total_qty"),
        F.col("n_days"),
        F.when(F.col("cum_s") * 10 <= F.col("tot_s") * 8, "A")
        .when(F.col("cum_s") * 100 <= F.col("tot_s") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        F.when(F.col("n_days") * F.col("sq") * 4 < F.col("s") * F.col("s") * 5, "X")
        .when(F.col("n_days") * F.col("sq") < F.col("s") * F.col("s") * 2, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return k.groupBy("abc_class", "xyz_class").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.sum("total_qty").cast("bigint").alias("total_qty"),
    )


# --- financial reconciliation: order headers vs line sums ---------------------------

_sql_query(
    "audit_order_reconciliation",
    """
    WITH ls AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS line_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
             ls.line_cents
      FROM orders o LEFT JOIN ls ON ls.l_orderkey = o.o_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN line_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_without_lines,
           CAST(SUM(CASE WHEN line_cents IS NOT NULL
                         AND header_cents <> line_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatched,
           CAST(SUM(CASE WHEN line_cents IS NOT NULL
                         THEN abs(header_cents - line_cents) ELSE 0 END)
                AS BIGINT) AS total_abs_drift_cents,
           CAST(MAX(CASE WHEN line_cents IS NOT NULL
                         THEN abs(header_cents - line_cents) ELSE 0 END)
                AS BIGINT) AS max_abs_drift_cents
    FROM j
    """,
    doc="Financial reconciliation audit: order-header totals against "
    "the sum of their line extended prices — the double-entry "
    "consistency check every billing pipeline runs nightly (header "
    "written by one service, lines by another; drift means a bug or "
    "an unapplied adjustment). Reports orphan headers, mismatch "
    "count, and total/max absolute drift in exact integer cents. On "
    "this synthetic fixture header and lines are generated "
    "INDEPENDENTLY, so 100% mismatch with large drift is the expected "
    "finding — the audit's job is to say so with exact numbers, not "
    "to pass. One line aggregate + one key join; no fp anywhere.",
    tags=("mining", "audit"),
)


# --- simplified silhouette of the label clustering ----------------------------------

_sql_query(
    "eval_cluster_silhouette",
    """
    WITH q AS (
      SELECT vec_id, label,
             {transform} AS xm
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id, label, j, x FROM ({explode}) e
    ),
    cent AS (
      SELECT label AS c, j,
             CAST(round(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                  AS BIGINT) AS cm
      FROM ex GROUP BY label, j
    ),
    dist AS (
      SELECT ex.vec_id, ex.label, cent.c,
             CAST(SUM((ex.x - cent.cm) * (ex.x - cent.cm)) AS BIGINT) AS d2
      FROM ex JOIN cent ON cent.j = ex.j
      GROUP BY ex.vec_id, ex.label, cent.c
    ),
    ab AS (
      SELECT vec_id, label,
             CAST(MAX(CASE WHEN c = label THEN d2 END) AS BIGINT) AS a2,
             CAST(MIN(CASE WHEN c <> label THEN d2 END) AS BIGINT) AS b2
      FROM dist GROUP BY vec_id, label
    ),
    s AS (
      SELECT label,
             CAST(round(1000000.0 * (SQRT(CAST(b2 AS DOUBLE))
                                     - SQRT(CAST(a2 AS DOUBLE)))
                        / SQRT(CAST(greatest(a2, b2) AS DOUBLE))) AS BIGINT)
               AS s_micro
      FROM ab
    )
    SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(s_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0
             AS mean_silhouette
    FROM s GROUP BY label
    """.replace(
        "{transform}",
        "transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT))",
    ).replace(
        "{explode}",
        "SELECT vec_id, label, pos + 1 AS j, col AS x "
        "FROM (SELECT vec_id, label, posexplode(xm) AS (pos, col) FROM q)",
    ),
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            e -> CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT)) AS xm
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id, label, t.j, xm[t.j] AS x
      FROM q, LATERAL (SELECT unnest(range(1, len(xm) + 1)) AS j) t
    ),
    cent AS (
      SELECT label AS c, j,
             CAST(round(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                  AS BIGINT) AS cm
      FROM ex GROUP BY label, j
    ),
    dist AS (
      SELECT ex.vec_id, ex.label, cent.c,
             CAST(SUM((ex.x - cent.cm) * (ex.x - cent.cm)) AS BIGINT) AS d2
      FROM ex JOIN cent ON cent.j = ex.j
      GROUP BY ex.vec_id, ex.label, cent.c
    ),
    ab AS (
      SELECT vec_id, label,
             CAST(MAX(CASE WHEN c = label THEN d2 END) AS BIGINT) AS a2,
             CAST(MIN(CASE WHEN c <> label THEN d2 END) AS BIGINT) AS b2
      FROM dist GROUP BY vec_id, label
    ),
    s AS (
      SELECT label,
             CAST(round(1000000.0 * (SQRT(CAST(b2 AS DOUBLE))
                                     - SQRT(CAST(a2 AS DOUBLE)))
                        / SQRT(CAST(greatest(a2, b2) AS DOUBLE))) AS BIGINT)
               AS s_micro
      FROM ab
    )
    SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(s_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0
             AS mean_silhouette
    FROM s GROUP BY label
    """,
    doc="Simplified silhouette (centroid form, Hruschka et al.) of the "
    "label partition over the embedding space: per point, a = distance "
    "to own centroid, b = nearest OTHER centroid, s = (b-a)/max(a,b) — "
    "the clustering-quality read-out that needs |labels| centroid "
    "distances per point instead of the full silhouette's O(n^2) "
    "pairs (THE standard rewrite that makes silhouette computable at "
    "scale). Components quantize to the 1e-6 grid so distances are "
    "exact BIGINTs; per-point s lands on the grid BEFORE the per-label "
    "mean (order-free sums); centroids are one rounded division per "
    "(label, dim). Near-zero silhouettes on the noise-dominated small "
    "fixtures and strongly positive at sf1.0 — the same SNR story as "
    "classify_nearest_centroid, pytest-asserted.",
    tags=("mining", "eval", "ann"),
)


# --- expected calibration error -------------------------------------------------------

_sql_query(
    "eval_ece",
    """
    WITH s AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    b AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM s),
    f AS (
      SELECT CAST(floor(CAST((s.score - b.lo) * 10 AS DOUBLE)
                        / CAST(b.hi - b.lo + 1 AS DOUBLE)) AS BIGINT) AS bin,
             CAST(s.score - b.lo AS DOUBLE) / CAST(b.hi - b.lo AS DOUBLE) AS p,
             s.pos
      FROM s CROSS JOIN b
    ),
    k AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS nk, CAST(SUM(pos) AS BIGINT) AS pk,
             SUM(p) AS psum
      FROM f GROUP BY bin
    ),
    t AS (SELECT CAST(SUM(nk) AS BIGINT) AS n FROM k),
    e AS (
      SELECT
        CAST(SUM(CAST(round(CAST(nk AS DOUBLE)
             * abs(psum / CAST(nk AS DOUBLE) - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE))
             * 1000000000) AS BIGINT)) AS BIGINT) AS ece_nano_sum,
        CAST(MAX(CAST(round(
             abs(psum / CAST(nk AS DOUBLE) - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE))
             * 1000000000) AS BIGINT)) AS BIGINT) AS mce_nano
      FROM k
    )
    SELECT t.n AS n_docs,
           CAST(e.ece_nano_sum AS DOUBLE) / CAST(t.n AS DOUBLE) / 1000000000.0
             AS ece,
           CAST(e.mce_nano AS DOUBLE) / 1000000000.0 AS mce
    FROM t CROSS JOIN e
    """,
    doc="Expected + maximum calibration error of the normalized "
    "is-English score over the calibration deciles: ECE = "
    "sum_k n_k |mean_p_k - obs_k| / N, MCE = max_k |...| — the "
    "one-number calibration summaries that sit next to "
    "eval_brier_decomposition (Brier's reliability term is the "
    "SQUARED sibling; ECE is what model cards quote). Per-bin terms "
    "land on the 1e-9 grid before the sum/max (order-free), two fp "
    "divisions at the end. Same scan/bin shape as "
    "eval_calibration_bins.",
    tags=("mining", "eval"),
)


# --- frequent-pattern outlier factor over order baskets ------------------------------

_FPOF_ORACLE = f"""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    po AS MATERIALIZED (
      SELECT a.l_orderkey AS okey, a.l_partkey AS x, c.l_partkey AS y
      FROM b a JOIN b c ON c.l_orderkey = a.l_orderkey
                       AND a.l_partkey < c.l_partkey
    ),
    fp AS (
      SELECT x, y FROM po GROUP BY x, y HAVING COUNT(*) >= {_FI_MINSUP}
    ),
    per_order AS (
      SELECT po.okey,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN fp.x IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_frequent
      FROM po LEFT JOIN fp ON fp.x = po.x AND fp.y = po.y
      GROUP BY po.okey
    )
    SELECT CAST(okey AS BIGINT) AS order_key, n_pairs, n_frequent,
           CAST(n_frequent AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS fpof
    FROM per_order
    ORDER BY CAST(n_frequent AS DOUBLE) / CAST(n_pairs AS DOUBLE) ASC,
             okey ASC
    LIMIT 10
    """


@register(
    "anomaly_fpof_baskets",
    oracle=_FPOF_ORACLE,
    doc="Frequent-pattern outlier factor (He et al. 2005): score each "
    "multi-item order by the fraction of its item PAIRS that are "
    "corpus-frequent — baskets made of never-co-bought combinations "
    "score near 0 and surface as anomalies (fraud screens and data-"
    "entry-error triage use exactly this; it reuses the Apriori "
    "frequent-pair relation, making outlier detection a BYPRODUCT of "
    "the mining pass). Bottom-10 by (fpof ASC, key ASC); the score is "
    "one fp division of exact pair counts. The pair fan-out is "
    "per-order basket-size-squared (the co-purchase shuffle class) and "
    "is NEVER shuffled: the thresholded frequent-pair relation is "
    "checkpointed and broadcast into the fan-out, so the per-order "
    "score is one map-side flag + partial aggregate on the order key "
    "(the shared-SQL form shuffled the whole fan-out by (x, y) for the "
    "left join and enumerated pairs twice: ~98 s at sf10 vs ~55 s).",
    tags=("mining", "analytics"),
)
def anomaly_fpof_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    b = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, c = b.alias("a"), b.alias("c")
    po = a.join(
        c,
        (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("c.l_partkey")),
    ).select(
        F.col("a.l_orderkey").alias("okey"),
        F.col("a.l_partkey").alias("x"),
        F.col("c.l_partkey").alias("y"),
    )
    fp = (
        po.groupBy("x", "y")
        .agg(F.count("*").alias("nco"))
        .filter(F.col("nco") >= _FI_MINSUP)
        .select("x", "y", F.lit(1).alias("is_freq"))
        .localCheckpoint()  # thresholded — bounded
    )
    per_order = (
        po.join(F.broadcast(fp), ["x", "y"], "left")
        .groupBy("okey")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(
                F.when(F.col("is_freq").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_frequent"),
        )
    )
    fpof = F.col("n_frequent").cast("double") / F.col("n_pairs").cast("double")
    return (
        per_order.select(
            F.col("okey").cast("bigint").alias("order_key"),
            "n_pairs",
            "n_frequent",
            fpof.alias("fpof"),
        )
        .orderBy(F.asc("fpof"), F.asc("order_key"))
        .limit(10)
    )


# --- Haar multiresolution energy of the daily revenue series -------------------------
#
# Unnormalized integer Haar over the LAST 16 days: level-k details
# d = a_{2i-1} - a_{2i} of the level-(k-1) approximations (integers all
# the way down); orthonormal-equivalent energy divides Sum(d^2) by 2^k.
# Which level carries the variance tells you the dominant timescale
# (day-to-day noise vs weekly structure) before fitting any seasonal
# model — the multiresolution companion to events_acf_daily.


def _haar_sql(daydiff: str) -> str:
    lvls = []
    prev = "l0"
    for k in range(1, 5):
        lvls.append(f"""l{k} AS (
      SELECT CAST((i + 1 - (i + 1) % 2) / 2 AS BIGINT) AS i,
             CAST(SUM(CASE WHEN i % 2 = 1 THEN x ELSE 0 END)
                  + SUM(CASE WHEN i % 2 = 0 THEN x ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN i % 2 = 1 THEN x ELSE 0 END)
                  - SUM(CASE WHEN i % 2 = 0 THEN x ELSE 0 END) AS BIGINT) AS d
      FROM {prev}
      GROUP BY CAST((i + 1 - (i + 1) % 2) / 2 AS BIGINT)
    )""")
        prev = f"l{k}"
    chain = ",\n    ".join(lvls)
    union = "\n      UNION ALL\n      ".join(
        f"SELECT CAST({k} AS BIGINT) AS level, CAST(COUNT(*) AS BIGINT) AS n_coeffs, "
        f"CAST(SUM(d * d) AS BIGINT) AS sum_detail_sq FROM l{k}"
        for k in range(1, 5)
    )
    return f"""
    WITH d0 AS (
      SELECT {daydiff} AS didx,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    win AS (
      SELECT didx, CAST((cents - cents % 100) / 100 AS BIGINT) AS x,
             row_number() OVER (ORDER BY didx DESC) AS rev
      FROM d0
    ),
    l0 AS (
      SELECT CAST(17 - rev AS BIGINT) AS i, x FROM win WHERE rev <= 16
    ),
    {chain}
    SELECT level, n_coeffs, sum_detail_sq,
           CAST(sum_detail_sq AS DOUBLE) / CAST(POWER(2, level) AS DOUBLE)
             AS energy
    FROM ({union}) lv
    """


_sql_query(
    "events_haar_energy",
    _haar_sql("datediff(CAST(ts AS DATE), DATE '1970-01-01')"),
    oracle=_haar_sql("date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"),
    doc="Haar wavelet multiresolution energy of the last 16 days of "
    "purchase revenue: per decomposition level (1=2-day, 2=4-day, "
    "3=8-day, 4=16-day scale), the detail-coefficient energy "
    "Sum(d^2)/2^level — which timescale carries the variance, read "
    "BEFORE choosing a smoothing window or seasonal period (the "
    "multiresolution companion to events_acf_daily / "
    "forecast_seasonal_decompose). The transform is UNNORMALIZED "
    "integer Haar (pairwise sums/differences of exact whole-dollar "
    "values — no sqrt(2) anywhere), so every coefficient is an exact "
    "BIGINT and the orthonormal energy appears only as one final "
    "division by 2^level. Each level is one 2-to-1 keyed aggregate "
    "over the (at most 16-row) window relation.",
    tags=("mining", "timeseries"),
)


# --- k-anonymity generalization search ------------------------------------------------


def _kanon_branch(width: int) -> str:
    return f"""
    SELECT CAST({width} AS BIGINT) AS bucket_width,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(n_c) AS BIGINT) AS min_class_size,
           CAST(SUM(CASE WHEN n_c < 5 THEN n_c ELSE 0 END) AS BIGINT)
             AS n_suppressed_rows,
           CASE WHEN MIN(n_c) >= 5 THEN TRUE ELSE FALSE END AS k5_satisfied
    FROM (
      SELECT lang,
             CAST(floor(CAST(n_chars AS DOUBLE) / {width}.0) AS BIGINT) AS bkt,
             CAST(COUNT(*) AS BIGINT) AS n_c
      FROM documents GROUP BY 1, 2
    ) c
    """


_sql_query(
    "audit_k_anon_generalization",
    "\nUNION ALL\n".join(_kanon_branch(w) for w in (25, 50, 100, 200, 400)),
    doc="k-anonymity generalization search: for each candidate length-"
    "bucket width (25..400 chars), the minimum (lang, bucket) class "
    "size, the rows a suppress-small-classes policy would drop, and "
    "whether k=5 holds — the utility/privacy dial an anonymization "
    "pipeline turns (audit_k_anonymity checks ONE generalization; "
    "this picks the coarsest-grained release that satisfies k with "
    "the least suppression). One groupBy per candidate width over "
    "the pruned 2-column scan; all counts exact.",
    tags=("mining", "audit", "privacy"),
)


# --- Theta-method forecast (SES + drift) ------------------------------------------------

_sql_query(
    "forecast_theta",
    """
    WITH d0 AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    d AS (
      SELECT day, CAST((cents - cents % 100) / 100 AS BIGINT) AS x,
             row_number() OVER (ORDER BY day) AS i
      FROM d0
    ),
    arr AS (
      SELECT sort_array(collect_list(struct(i, CAST(x AS DOUBLE) AS xv))) AS a,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(i) AS BIGINT) AS si, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(i * i) AS BIGINT) AS sii, CAST(SUM(i * x) AS BIGINT) AS six
      FROM d
    ),
    f AS (
      SELECT n,
        aggregate(slice(a, 2, size(a) - 1),
                  CAST(element_at(a, 1).xv AS DOUBLE),
                  (acc, e) -> CAST(0.3 AS DOUBLE) * e.xv
                              + CAST(0.7 AS DOUBLE) * acc) AS ses,
        (CAST(n AS DOUBLE) * CAST(six AS DOUBLE)
         - CAST(si AS DOUBLE) * CAST(sx AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sii AS DOUBLE)
             - CAST(si AS DOUBLE) * CAST(si AS DOUBLE)) AS slope,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS meanx,
        CAST(si AS DOUBLE) / CAST(n AS DOUBLE) AS meani
      FROM arr
    )
    SELECT n AS n_days, ses AS ses_level, slope AS drift_per_day,
           ses + 0.5 * slope * (CAST(n AS DOUBLE) + 1.0 - meani) AS theta_forecast
    FROM f
    """,
    oracle="""
    WITH d0 AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    d AS (
      SELECT day, CAST((cents - cents % 100) / 100 AS BIGINT) AS x,
             row_number() OVER (ORDER BY day) AS i
      FROM d0
    ),
    arr AS (
      SELECT list_sort(list([CAST(i AS DOUBLE), CAST(x AS DOUBLE)])) AS a,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(i) AS BIGINT) AS si, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(i * i) AS BIGINT) AS sii, CAST(SUM(i * x) AS BIGINT) AS six
      FROM d
    ),
    f AS (
      SELECT n,
        list_reduce(list_transform(a, e -> e[2]),
                    (acc, xv) -> 0.3::DOUBLE * xv + 0.7::DOUBLE * acc) AS ses,
        (CAST(n AS DOUBLE) * CAST(six AS DOUBLE)
         - CAST(si AS DOUBLE) * CAST(sx AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sii AS DOUBLE)
             - CAST(si AS DOUBLE) * CAST(si AS DOUBLE)) AS slope,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS meanx,
        CAST(si AS DOUBLE) / CAST(n AS DOUBLE) AS meani
      FROM arr
    )
    SELECT n AS n_days, ses AS ses_level, slope AS drift_per_day,
           ses + 0.5 * slope * (CAST(n AS DOUBLE) + 1.0 - meani) AS theta_forecast
    FROM f
    """,
    doc="Theta-method one-step forecast of daily revenue (the M3 "
    "competition's simple champion, in its SES+drift decomposition): "
    "forecast = SES level (alpha=0.3, chronological fold) + half the "
    "OLS drift projected to the next step — averaging the theta=0 "
    "line's slope with the theta=2 SES line. Whole-dollar integer "
    "series (the AR(2) grid rule); the SES fold is bit-identical in "
    "aggregate()/list_reduce (struct-sorted on Spark, [i, x] "
    "list-sorted in DuckDB — day order either way); OLS drift from "
    "exact BIGINT co-moments of (index, value). Day-grain collapse "
    "is the only fact-sized work.",
    tags=("mining", "timeseries"),
)


# --- duplicate-payment detector ----------------------------------------------------------

def _dup_payments_sql(datediff2, dateadd3) -> str:
    """``datediff2(a, b)`` renders days-between (argument order is the
    2-arg/3-arg dialect split); ``dateadd3(d)`` renders d+3 days."""
    return f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS day
      FROM orders
    ),
    o AS (
      SELECT * FROM base
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, cents, {dateadd3('day')}
      FROM base WHERE o_orderkey % 500 = 0
    )
    SELECT CAST(a.o_custkey AS BIGINT) AS cust_key,
           CAST(a.cents AS BIGINT) AS amount_cents,
           CAST(a.o_orderkey AS BIGINT) AS order_a,
           CAST(b.o_orderkey AS BIGINT) AS order_b,
           CAST({datediff2('a.day', 'b.day')} AS BIGINT) AS days_apart
    FROM o a JOIN o b
      ON b.o_custkey = a.o_custkey AND b.cents = a.cents
     AND a.o_orderkey < b.o_orderkey
     AND b.day >= a.day AND {datediff2('a.day', 'b.day')} <= 7
    """


_sql_query(
    "audit_duplicate_payments",
    _dup_payments_sql(
        lambda a, b: f"datediff({b}, {a})", lambda d: f"date_add({d}, 3)"
    ),
    oracle=_dup_payments_sql(
        lambda a, b: f"date_diff('day', {a}, {b})", lambda d: f"{d} + 3"
    ),
    doc="Duplicate-payment detector: same customer, same exact amount, "
    "within 7 days — the classic accounts-payable fraud/ops audit "
    "(double-submitted invoices dominate AP recovery). The join is "
    "EQUI on (custkey, exact integer cents) — the amount match does "
    "the heavy pruning map-side, so the inequality window runs only "
    "on same-amount pairs (never a custkey-only self-join explosion). "
    "The fixture's independently-drawn amounts yield a clean audit "
    "(0 organic hits), so the query PLANTS resubmitted invoices "
    "in-query (every 500th order re-keyed +1e8, 3 days later — the "
    "multimodal_phash_neardup_pairs augmentation pattern): the green "
    "row now proves DETECTION (one planted pair per seed order), not "
    "absence. (datediff argument order is the 2-arg/3-arg dialect "
    "split; date+3 is date_add vs DuckDB date+int.)",
    tags=("mining", "audit"),
)


# --- next-event prediction eval (Markov argmax baseline) -----------------------------


def _markov_eval_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('mk42|', CAST(user_id AS {str_t})))"
    return f"""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             CASE WHEN {hexfn(key)} % 1000 < 800 THEN 1 ELSE 0 END AS is_train
      FROM events
    ),
    tr AS (
      SELECT user_id, is_train, event_type AS s,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS t
      FROM r
    ),
    cnt AS (
      SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM tr WHERE t IS NOT NULL AND is_train = 1 GROUP BY s, t
    ),
    pred AS (
      SELECT s, t AS t_pred FROM (
        SELECT s, t, row_number() OVER (PARTITION BY s
                                        ORDER BY c DESC, t ASC) AS rk
        FROM cnt
      ) x WHERE rk = 1
    ),
    test AS (
      SELECT tr.s, tr.t, pred.t_pred
      FROM tr JOIN pred ON pred.s = tr.s
      WHERE tr.t IS NOT NULL AND tr.is_train = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(CASE WHEN t = t_pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN t = t_pred THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM test
    """


def _register_markov_eval():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    @register(
        "eval_markov_next_event",
        oracle=_markov_eval_sql(duck_hex13_to_long, "VARCHAR"),
        doc="Next-event prediction eval: train a first-order Markov "
        "argmax predictor (most frequent successor per state, count "
        "DESC / type ASC tie-break) on an 80% keyed-md5 USER split and "
        "score held-out users' transitions — the sequence-model "
        "baseline every session-prediction system must beat, trained "
        "and evaluated entirely in the engine (events_markov_transitions "
        "gives the matrix; this closes the loop with leakage-safe "
        "evaluation — the split is BY USER so no test user leaks "
        "transitions into training). Two keyed windows + two "
        "aggregates; accuracy near 1/|types| on the fixture's uniform "
        "chains is the expected read-out.",
        tags=("mining", "eval", "ml"),
    )
    def eval_markov_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .stats_queries import _spark_hex13 as hx

        tune(spark)
        register_views(spark, sf_dir, ("events",))
        return spark.sql(_markov_eval_sql(hx, "STRING"))

    return eval_markov_next_event


_register_markov_eval()


# --- negative-binomial method-of-moments fit ------------------------------------------

_sql_query(
    "stats_negbin_mom",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM events GROUP BY 1, 2
    ),
    cal AS (
      SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
      FROM events
    ),
    m AS (
      -- zero days enter via the N-normalizer identity (the
      -- stats_overdispersion_daily move): sums over present days extend
      -- to the calendar for free
      SELECT event_type,
             CAST(SUM(k) AS BIGINT) AS s, CAST(SUM(k * k) AS BIGINT) AS sq
      FROM daily GROUP BY event_type
    )
    SELECT m.event_type, cal.n_days, m.s AS n_events,
           CAST(m.s AS DOUBLE) / CAST(cal.n_days AS DOUBLE) AS mean_daily,
           (CAST(m.sq AS DOUBLE)
            - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE) / CAST(cal.n_days AS DOUBLE))
             / (CAST(cal.n_days AS DOUBLE) - 1.0) AS var_daily,
           CASE WHEN (CAST(m.sq AS DOUBLE)
                      - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)
                        / CAST(cal.n_days AS DOUBLE))
                     / (CAST(cal.n_days AS DOUBLE) - 1.0)
                     <= CAST(m.s AS DOUBLE) / CAST(cal.n_days AS DOUBLE)
                THEN NULL
                ELSE (CAST(m.s AS DOUBLE) / CAST(cal.n_days AS DOUBLE))
                     * (CAST(m.s AS DOUBLE) / CAST(cal.n_days AS DOUBLE))
                     / ((CAST(m.sq AS DOUBLE)
                         - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)
                           / CAST(cal.n_days AS DOUBLE))
                        / (CAST(cal.n_days AS DOUBLE) - 1.0)
                        - CAST(m.s AS DOUBLE) / CAST(cal.n_days AS DOUBLE))
           END AS negbin_r,
           CASE WHEN (CAST(m.sq AS DOUBLE)
                      - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)
                        / CAST(cal.n_days AS DOUBLE))
                     / (CAST(cal.n_days AS DOUBLE) - 1.0)
                     <= CAST(m.s AS DOUBLE) / CAST(cal.n_days AS DOUBLE)
                THEN NULL
                ELSE (CAST(m.s AS DOUBLE) / CAST(cal.n_days AS DOUBLE))
                     / ((CAST(m.sq AS DOUBLE)
                         - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)
                           / CAST(cal.n_days AS DOUBLE))
                        / (CAST(cal.n_days AS DOUBLE) - 1.0))
           END AS negbin_p
    FROM m CROSS JOIN cal
    """,
    doc="Negative-binomial method-of-moments fit of the daily count "
    "per event type: r = m^2/(v - m), p = m/v — the distribution a "
    "capacity planner actually samples from once "
    "stats_overdispersion_daily has rejected Poisson (v > m). "
    "Under-dispersed types yield NULL (NB undefined there) rather "
    "than a garbage negative r. Exact BIGINT moments to the final "
    "fixed fp chains; zero days via the calendar normalizer, never "
    "materialized.",
    tags=("mining", "stats"),
)


# --- Jensen-Shannon divergence of each source's unigram distribution -------------------

_sql_query(
    "text_js_divergence_sources",
    r"""
    WITH tok AS (
      SELECT source, w FROM (
        SELECT source, {unnest} AS w FROM (
          SELECT source, {split} AS ws FROM documents
        ) s
      ) t WHERE w <> ''
    ),
    sw AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, w
    ),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS st FROM sw GROUP BY source),
    gw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS g FROM sw GROUP BY w),
    gtot AS (SELECT CAST(SUM(g) AS BIGINT) AS gt FROM gw),
    terms AS (
      -- JS(P_src, Q_corpus) with M = (P+Q)/2; the sum needs only words
      -- with p > 0 or q > 0, and q > 0 for every corpus word, so the
      -- per-(source, word) LEFT join from the corpus vocabulary is the
      -- complete support; each klterm lands on the 1e-9 grid
      SELECT st.source,
        CAST(SUM(CASE WHEN sw.c IS NULL OR sw.c = 0 THEN 0
          ELSE CAST(round((CAST(sw.c AS DOUBLE) / CAST(st.st AS DOUBLE))
               * ln((CAST(sw.c AS DOUBLE) / CAST(st.st AS DOUBLE))
                    / ((CAST(sw.c AS DOUBLE) / CAST(st.st AS DOUBLE)
                        + CAST(gw.g AS DOUBLE) / CAST(gtot.gt AS DOUBLE)) / 2.0))
               * 1000000000) AS BIGINT) END) AS BIGINT) AS kl_p_m_nano,
        CAST(SUM(
          CAST(round((CAST(gw.g AS DOUBLE) / CAST(gtot.gt AS DOUBLE))
               * ln((CAST(gw.g AS DOUBLE) / CAST(gtot.gt AS DOUBLE))
                    / ((COALESCE(CAST(sw.c AS DOUBLE), 0.0) / CAST(st.st AS DOUBLE)
                        + CAST(gw.g AS DOUBLE) / CAST(gtot.gt AS DOUBLE)) / 2.0))
               * 1000000000) AS BIGINT)) AS BIGINT) AS kl_q_m_nano
      FROM stot st
      CROSS JOIN gw
      CROSS JOIN gtot
      LEFT JOIN sw ON sw.source = st.source AND sw.w = gw.w
      GROUP BY st.source
    )
    SELECT source, 
           (CAST(kl_p_m_nano AS DOUBLE) + CAST(kl_q_m_nano AS DOUBLE))
             / 2.0 / 1000000000.0 AS js_divergence
    FROM terms
    """.replace("{unnest}", "explode(ws)").replace(
        "{split}", r"split(trim(text), '\\s+')"
    ),
    oracle=r"""
    WITH tok AS (
      SELECT source, w FROM (
        SELECT source, unnest(ws) AS w FROM (
          SELECT source, regexp_split_to_array(trim(text), '\s+') AS ws
          FROM documents
        ) s
      ) t WHERE w <> ''
    ),
    sw AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, w
    ),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS st FROM sw GROUP BY source),
    gw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS g FROM sw GROUP BY w),
    gtot AS (SELECT CAST(SUM(g) AS BIGINT) AS gt FROM gw),
    terms AS (
      SELECT st.source,
        CAST(SUM(CASE WHEN sw.c IS NULL OR sw.c = 0 THEN 0
          ELSE CAST(round((CAST(sw.c AS DOUBLE) / CAST(st.st AS DOUBLE))
               * ln((CAST(sw.c AS DOUBLE) / CAST(st.st AS DOUBLE))
                    / ((CAST(sw.c AS DOUBLE) / CAST(st.st AS DOUBLE)
                        + CAST(gw.g AS DOUBLE) / CAST(gtot.gt AS DOUBLE)) / 2.0))
               * 1000000000) AS BIGINT) END) AS BIGINT) AS kl_p_m_nano,
        CAST(SUM(
          CAST(round((CAST(gw.g AS DOUBLE) / CAST(gtot.gt AS DOUBLE))
               * ln((CAST(gw.g AS DOUBLE) / CAST(gtot.gt AS DOUBLE))
                    / ((COALESCE(CAST(sw.c AS DOUBLE), 0.0) / CAST(st.st AS DOUBLE)
                        + CAST(gw.g AS DOUBLE) / CAST(gtot.gt AS DOUBLE)) / 2.0))
               * 1000000000) AS BIGINT)) AS BIGINT) AS kl_q_m_nano
      FROM stot st
      CROSS JOIN gw
      CROSS JOIN gtot
      LEFT JOIN sw ON sw.source = st.source AND sw.w = gw.w
      GROUP BY st.source
    )
    SELECT source,
           (CAST(kl_p_m_nano AS DOUBLE) + CAST(kl_q_m_nano AS DOUBLE))
             / 2.0 / 1000000000.0 AS js_divergence
    FROM terms
    """,
    doc="Jensen-Shannon divergence of each source's unigram word "
    "distribution from the corpus-wide one — the per-source text-"
    "drift monitor (the lexical sibling of monitor_psi_price_drift "
    "and embedding_drift_monitor; JS is symmetric, bounded by ln 2, "
    "and defined even for source-absent words, which is exactly why "
    "it beats raw KL for monitoring). Support = source x corpus-"
    "vocabulary (bounded; the corpus M-distribution has full "
    "support so no term is undefined); per-(source, word) "
    "contributions land on the 1e-9 grid BEFORE the per-source sum. "
    "A source drifting toward one topic lights up without any "
    "labeling.",
    tags=("mining", "text", "monitor"),
)


# --- time-decayed item popularity ------------------------------------------------------

_sql_query(
    "reco_decayed_popularity",
    """
    WITH horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events),
    ui AS (
      SELECT CAST(get_json_object(props, '$.k') AS BIGINT) AS item,
             datediff(horizon.h, CAST(ts AS DATE)) AS age_days
      FROM events CROSS JOIN horizon
      WHERE event_type IN ('click', 'purchase')
    ),
    w AS (
      SELECT item,
             CAST(round(exp(-0.1 * CAST(age_days AS DOUBLE)) * 1000000)
                  AS BIGINT) AS w_micro
      FROM ui
    )
    SELECT item, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(w_micro) AS BIGINT) AS decayed_micro,
           CAST(SUM(w_micro) AS DOUBLE) / 1000000.0 AS decayed_score
    FROM w GROUP BY item
    ORDER BY SUM(w_micro) DESC, item ASC
    LIMIT 10
    """,
    oracle="""
    WITH horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events),
    ui AS (
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
             date_diff('day', CAST(ts AS DATE), horizon.h) AS age_days
      FROM events CROSS JOIN horizon
      WHERE event_type IN ('click', 'purchase')
    ),
    w AS (
      SELECT item,
             CAST(round(exp(-0.1 * CAST(age_days AS DOUBLE)) * 1000000)
                  AS BIGINT) AS w_micro
      FROM ui
    )
    SELECT item, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(w_micro) AS BIGINT) AS decayed_micro,
           CAST(SUM(w_micro) AS DOUBLE) / 1000000.0 AS decayed_score
    FROM w GROUP BY item
    ORDER BY SUM(w_micro) DESC, item ASC
    LIMIT 10
    """,
    doc="Time-decayed item popularity (half-life ~7 days via "
    "exp(-0.1*age)): top-10 items by exponentially-weighted "
    "interaction mass — the trending-items serving primitive that "
    "raw counts can't give (yesterday's spike outweighs last "
    "month's grind). Per-event weights land on the 1e-6 grid "
    "(round-after-libm, the KM exp rule) so the ranking sum is an "
    "order-free BIGINT; ages are whole days from the data horizon "
    "(deterministic, no wall-clock). One map-side weight projection "
    "+ one item aggregate + TakeOrdered.",
    tags=("mining", "analytics"),
)


# --- per-column entropy profile --------------------------------------------------------


def _entropy_branch(col: str) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           -- both components grid-landed (a bare ln(N) is raw libm output
           -- and drifts a ulp cross-engine at sf1.0)
           CAST(CAST(round(ln(CAST(SUM(c) AS DOUBLE)) * 1000000000)
                     AS BIGINT) AS DOUBLE) / 1000000000.0
             - CAST(SUM(ent_nano) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
               / 1000000000.0 AS entropy_nats
    FROM (
      SELECT c, CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                           * 1000000000) AS BIGINT) AS ent_nano
      FROM (SELECT {col} AS v, CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY {col}) g
    ) t
    """


_sql_query(
    "audit_column_entropy",
    "\nUNION ALL\n".join(
        _entropy_branch(c)
        for c in ("o_orderkey", "o_custkey", "o_orderstatus",
                  "o_orderdate", "o_totalprice")
    ),
    doc="Per-column Shannon entropy profile of the orders table — the "
    "information-content companion to audit_column_profile's "
    "null/distinct counts (near-max entropy + distinct==rows flags a "
    "key; near-zero entropy flags a constant; mid-range grades "
    "categorical informativeness for feature triage). Uses the "
    "identity H = ln N - (1/N) sum c*ln(c), so each group's c*ln(c) "
    "lands on the 1e-9 grid BEFORE the cross-group sum (order-free) "
    "and only one global ln happens at the end. One column-pruned "
    "groupBy per branch.",
    tags=("mining", "audit"),
)


# --- distribution-free median CI --------------------------------------------------------

_sql_query(
    "stats_median_ci",
    """
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    h AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY cents),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    k AS (
      -- order-statistic indices for a ~95% distribution-free median CI:
      -- lo = floor(n/2 - 0.98*sqrt(n)), hi = ceil(n/2 + 1 + 0.98*sqrt(n))
      SELECT n,
        CAST(floor(CAST(n AS DOUBLE) / 2.0
                   - 0.98 * SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS klo,
        CAST(ceil(CAST(n AS DOUBLE) / 2.0 + 1.0
                  + 0.98 * SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS khi
      FROM t
    ),
    c AS (
      SELECT cents,
        CAST(SUM(c) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS cum
      FROM h
    ),
    sel AS (
      SELECT k.n, k.klo, k.khi,
        MIN(CASE WHEN c.cum >= k.klo THEN c.cents END) AS ci_lo_cents,
        MIN(CASE WHEN c.cum * 2 >= k.n THEN c.cents END) AS median_cents,
        MIN(CASE WHEN c.cum >= k.khi THEN c.cents END) AS ci_hi_cents
      FROM c CROSS JOIN k
      GROUP BY k.n, k.klo, k.khi
    )
    SELECT n AS n_obs, klo AS rank_lo, khi AS rank_hi,
           CAST(median_cents AS BIGINT) AS median_cents,
           CAST(ci_lo_cents AS BIGINT) AS ci_lo_cents,
           CAST(ci_hi_cents AS BIGINT) AS ci_hi_cents
    FROM sel
    """,
    doc="Distribution-free ~95% confidence interval for the median "
    "purchase value via binomial order statistics (rank n/2 +- "
    "z/2*sqrt(n), the sign-test inversion — valid for ANY continuous "
    "distribution, which matters because spend is heavy-tailed and "
    "bootstrap-t intervals misbehave there; the rank-select companion "
    "to stats_bootstrap_mean_ci). All three order statistics come "
    "from ONE prefix-sum pass over the bounded value histogram — "
    "exact rank selection, never a row sort; index arithmetic is a "
    "fixed fp chain off the exact count.",
    tags=("mining", "stats"),
)


# --- market concentration (Herfindahl-Hirschman index) --------------------------------

_sql_query(
    "market_concentration_hhi",
    """
    WITH r AS (
      SELECT year(o.o_orderdate) AS yr, c.c_custkey,
             CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    t AS (SELECT yr, CAST(SUM(cents) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS n_cust
          FROM r GROUP BY yr),
    s AS (
      -- share^2 terms on the 1e-9 grid before the cross-customer sum
      SELECT r.yr,
        CAST(SUM(CAST(round(1000000000.0
             * (CAST(r.cents AS DOUBLE) / CAST(t.tot AS DOUBLE))
             * (CAST(r.cents AS DOUBLE) / CAST(t.tot AS DOUBLE)))
             AS BIGINT)) AS BIGINT) AS hhi_nano
      FROM r JOIN t ON t.yr = r.yr
      GROUP BY r.yr
    )
    SELECT CAST(s.yr AS BIGINT) AS yr, t.n_cust,
           CAST(s.hhi_nano AS DOUBLE) / 1000000000.0 AS hhi,
           CAST(s.hhi_nano AS DOUBLE) / 1000000000.0
             * CAST(t.n_cust AS DOUBLE) AS hhi_normalized_x_n
    FROM s JOIN t ON t.yr = s.yr
    """,
    doc="Herfindahl-Hirschman concentration of yearly revenue across "
    "customers: HHI = sum of squared revenue shares (1/n for a "
    "perfectly even book, 1.0 for a single-customer business) — the "
    "concentration-risk metric finance reviews quarterly (the "
    "squared-share sibling of spend_gini's inequality measure). "
    "Share^2 terms land on the 1e-9 grid BEFORE the cross-customer "
    "sum; hhi*n rides along as the scale-free read-out (~1 means "
    "even). One (year, customer) aggregate + one year roll-up.",
    tags=("mining", "analytics"),
)


# --- entropy rate of the event-type sequence --------------------------------------------

_sql_query(
    "events_entropy_rate",
    """
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    tr AS (
      SELECT event_type AS s,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS t
      FROM r
    ),
    cnt AS (
      SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM tr WHERE t IS NOT NULL GROUP BY s, t
    ),
    marg AS (SELECT s, CAST(SUM(c) AS BIGINT) AS cs FROM cnt GROUP BY s),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt),
    terms AS (
      -- plug-in H(next|cur) = -sum p(s,t) ln p(t|s); each cell lands on
      -- the 1e-9 grid before the sum
      SELECT CAST(SUM(CAST(round(-1000000000.0
               * (CAST(cnt.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
               * ln(CAST(cnt.c AS DOUBLE) / CAST(marg.cs AS DOUBLE)))
               AS BIGINT)) AS BIGINT) AS h_nano
      FROM cnt JOIN marg ON marg.s = cnt.s CROSS JOIN tot
    ),
    hm AS (
      SELECT CAST(SUM(CAST(round(-1000000000.0
               * (CAST(marg.cs AS DOUBLE) / CAST(tot.n AS DOUBLE))
               * ln(CAST(marg.cs AS DOUBLE) / CAST(tot.n AS DOUBLE)))
               AS BIGINT)) AS BIGINT) AS hm_nano
      FROM marg CROSS JOIN tot
    )
    SELECT CAST(tot.n AS BIGINT) AS n_transitions,
           CAST(terms.h_nano AS DOUBLE) / 1000000000.0 AS entropy_rate_nats,
           CAST(hm.hm_nano AS DOUBLE) / 1000000000.0 AS marginal_entropy_nats
    FROM terms CROSS JOIN hm CROSS JOIN tot
    """,
    doc="Plug-in entropy rate of the pooled event-type sequence: "
    "H(next|current) = -sum p(s,t) ln p(t|s) over the transition "
    "matrix, reported against the marginal state entropy — the gap "
    "measures how much sequential structure the chain carries (zero "
    "gap = memoryless stream, the expected fixture answer; a big gap "
    "says session order is predictable and a sequence model will pay "
    "off — the information-theoretic summary of what "
    "eval_markov_next_event measures operationally). Per-cell terms "
    "grid-land before the sums; the cell and marginal relations are "
    "both |types|-bounded.",
    tags=("mining", "stats", "analytics"),
)


# --- greedy knapsack selection with LP bound ---------------------------------------------

_KNAP_CAP = 200  # total size capacity

_sql_query(
    "optimize_knapsack_greedy",
    f"""
    WITH items AS (
      SELECT p_partkey AS item,
             CAST(p_size AS BIGINT) AS cost,
             CAST(round(p_retailprice * 100) AS BIGINT) AS value_cents
      FROM part WHERE p_size > 0
    ),
    r AS (
      -- greedy order: value/cost ratio DESC via exact cross-multiplied
      -- comparison encoded in the sort key (value*1e6/cost is a single
      -- correctly-rounded division — identical cross-engine), item ASC
      SELECT item, cost, value_cents,
        CAST(SUM(cost) OVER (ORDER BY CAST(value_cents AS DOUBLE)
                                        / CAST(cost AS DOUBLE) DESC, item ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_cost,
        CAST(SUM(value_cents) OVER (ORDER BY CAST(value_cents AS DOUBLE)
                                        / CAST(cost AS DOUBLE) DESC, item ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_value
      FROM items
    ),
    taken AS (
      SELECT * FROM r WHERE cum_cost <= {_KNAP_CAP}
    ),
    greedy AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(MAX(cum_cost) AS BIGINT) AS used_capacity,
             CAST(MAX(cum_value) AS BIGINT) AS total_value_cents
      FROM taken
    ),
    frontier AS (
      -- the first item the prefix greedy rejects; its fractional fit
      -- gives the LP-relaxation bound
      SELECT cost, value_cents, cum_cost, cum_value
      FROM r WHERE cum_cost > {_KNAP_CAP}
      ORDER BY cum_cost ASC LIMIT 1
    )
    SELECT g.n_items, g.used_capacity, g.total_value_cents,
           CAST(g.total_value_cents AS DOUBLE) / 100.0 AS total_value_dollars,
           CASE WHEN f.cost IS NULL
                THEN CAST(g.total_value_cents AS DOUBLE) / 100.0
                ELSE (CAST(f.cum_value - f.value_cents AS DOUBLE)
                      + CAST({_KNAP_CAP} - (f.cum_cost - f.cost) AS DOUBLE)
                        * CAST(f.value_cents AS DOUBLE) / CAST(f.cost AS DOUBLE))
                     / 100.0
           END AS lp_bound_dollars
    FROM greedy g LEFT JOIN frontier f ON TRUE
    """,
    doc=f"Greedy knapsack selection of parts under a size capacity of "
    f"{_KNAP_CAP}: take items by value/size ratio (ratio DESC, item "
    "ASC — the single-division sort key is bit-stable) while the "
    "prefix fits, and report the LP-relaxation bound (prefix value + "
    "fractional slice of the first rejected item — Dantzig's bound, "
    "which certifies the greedy answer within the bound gap, "
    "pytest-asserted). Budgeted selection under a capacity is the "
    "assortment/campaign-planning shape; prefix sums over the "
    "ratio-ranked item relation do all the work — no iteration, no "
    "driver logic. NOTE the greedy here is PREFIX greedy (stops at "
    "the first misfit), the variant prefix sums express exactly; "
    "skip-and-continue greedy needs the fold idiom instead.",
    tags=("mining", "analytics"),
)


# --- trimmed and winsorized means -----------------------------------------------------

_sql_query(
    "stats_trimmed_mean",
    """
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    h AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY cents),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    k AS (
      SELECT n, CAST((n - n % 10) / 10 AS BIGINT) AS cut FROM t
    ),
    c AS (
      SELECT cents, c,
        CAST(SUM(c) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS cum
      FROM h
    ),
    -- per-value kept mass for the 10% symmetric trim: overlap of
    -- [cum-c, cum) with [cut, n-cut) in exact integers
    trim AS (
      SELECT k.n, k.cut,
        CAST(SUM(greatest(least(c.cum, k.n - k.cut)
                          - greatest(c.cum - c.c, k.cut), 0)) AS BIGINT)
          AS n_kept,
        CAST(SUM(c.cents * greatest(least(c.cum, k.n - k.cut)
                          - greatest(c.cum - c.c, k.cut), 0)) AS BIGINT)
          AS kept_cents
      FROM c CROSS JOIN k
      GROUP BY k.n, k.cut
    ),
    bounds AS (
      SELECT
        MIN(CASE WHEN c.cum > k.cut THEN c.cents END) AS lo,
        MIN(CASE WHEN c.cum >= k.n - k.cut THEN c.cents END) AS hi
      FROM c CROSS JOIN k
    ),
    wins AS (
      SELECT CAST(SUM(c.c * least(greatest(c.cents, b.lo), b.hi)) AS BIGINT)
               AS w_cents
      FROM c CROSS JOIN bounds b
    )
    SELECT trim.n AS n_obs, trim.cut AS n_trimmed_each_side, trim.n_kept,
           CAST(trim.kept_cents AS DOUBLE) / CAST(trim.n_kept AS DOUBLE) / 100.0
             AS trimmed_mean_dollars,
           CAST(wins.w_cents AS DOUBLE) / CAST(trim.n AS DOUBLE) / 100.0
             AS winsorized_mean_dollars
    FROM trim CROSS JOIN wins
    """,
    doc="10% symmetric trimmed AND winsorized means of purchase value "
    "— the robust-location pair (trim drops each tail's n/10 "
    "observations; winsorize clamps them to the cut values) that "
    "complements stats_median_ci for heavy-tailed spend. Both come "
    "from ONE prefix-sum pass over the bounded value histogram: the "
    "trim keeps each value's exact overlap with the central rank "
    "interval (integer interval intersection — handles ties "
    "straddling the cut correctly), winsorize clamps via the two "
    "rank-selected bounds; exact integer cents to the final "
    "divisions. Never a row sort.",
    tags=("mining", "stats"),
)


# --- Heaps' law fit: vocabulary growth ---------------------------------------------------

_sql_query(
    "text_heaps_law_fit",
    r"""
    WITH tok AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, {unnest} AS w FROM (
          SELECT doc_id, {split} AS ws FROM documents
        ) s
      ) t WHERE w <> ''
    ),
    dt AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY doc_id
    ),
    fo AS (
      -- each word's FIRST document (doc-id order): vocabulary growth is
      -- the prefix count of first occurrences — no corpus-wide token
      -- ranking needed, the doc grain carries the curve
      SELECT w, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM tok GROUP BY w
    ),
    vg AS (
      SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_words
      FROM fo GROUP BY first_doc
    ),
    curve AS (
      SELECT dt.doc_id,
        CAST(SUM(dt.n_tok) OVER (ORDER BY dt.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n,
        CAST(SUM(COALESCE(vg.new_words, 0)) OVER (ORDER BY dt.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS v
      FROM dt LEFT JOIN vg ON vg.doc_id = dt.doc_id
    ),
    lg AS (
      -- 1e-3 ln grid (the price-elasticity rule: squared 1e-6-grid
      -- logs overflow int64 past ~2e4 curve points)
      SELECT CAST(round(ln(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS lx,
             CAST(round(ln(CAST(v AS DOUBLE)) * 1000) AS BIGINT) AS ly
      FROM curve WHERE n > 0 AND v > 0
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
             CAST(SUM(lx * ly) AS BIGINT) AS sxy,
             CAST(SUM(lx * lx) AS BIGINT) AS sxx
      FROM lg
    )
    SELECT k AS n_points,
           (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS heaps_beta,
           CAST(CAST(round(exp((CAST(sy AS DOUBLE)
                - CAST(sx AS DOUBLE)
                  * ((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
               / CAST(k AS DOUBLE) / 1000.0) * 1000000.0) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS heaps_k
    FROM m
    """.replace("{unnest}", "explode(ws)").replace(
        "{split}", r"split(trim(text), '\\s+')"
    ),
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(ws) AS w FROM (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
          FROM documents
        ) s
      ) t WHERE w <> ''
    ),
    dt AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY doc_id
    ),
    fo AS (
      SELECT w, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM tok GROUP BY w
    ),
    vg AS (
      SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_words
      FROM fo GROUP BY first_doc
    ),
    curve AS (
      SELECT dt.doc_id,
        CAST(SUM(dt.n_tok) OVER (ORDER BY dt.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n,
        CAST(SUM(COALESCE(vg.new_words, 0)) OVER (ORDER BY dt.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS v
      FROM dt LEFT JOIN vg ON vg.doc_id = dt.doc_id
    ),
    lg AS (
      -- 1e-3 ln grid (the price-elasticity rule: squared 1e-6-grid
      -- logs overflow int64 past ~2e4 curve points)
      SELECT CAST(round(ln(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS lx,
             CAST(round(ln(CAST(v AS DOUBLE)) * 1000) AS BIGINT) AS ly
      FROM curve WHERE n > 0 AND v > 0
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
             CAST(SUM(lx * ly) AS BIGINT) AS sxy,
             CAST(SUM(lx * lx) AS BIGINT) AS sxx
      FROM lg
    )
    SELECT k AS n_points,
           (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS heaps_beta,
           CAST(CAST(round(exp((CAST(sy AS DOUBLE)
                - CAST(sx AS DOUBLE)
                  * ((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
               / CAST(k AS DOUBLE) / 1000.0) * 1000000.0) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS heaps_k
    FROM m
    """,
    doc="Heaps'-law fit of vocabulary growth V(n) ~ K n^beta over the "
    "corpus in doc-id order: each word's FIRST document gives the "
    "growth curve as a prefix count (never a corpus-wide token "
    "ranking — the doc grain carries the curve, the same trick as "
    "events_active_users' boundary sweep), then ln-ln OLS on the "
    "1e-6 grid with exact BIGINT co-moments. Beta near 1 on this "
    "tiny closed vocabulary (saturation makes the early curve "
    "linear-ish then flat); real corpora sit at 0.4-0.6 — together "
    "with text_zipf_fit and text_vocab_coverage this completes the "
    "corpus-statistics trio tokenizer sizing reads. Logs land on the "
    "1e-3 grid (the price-elasticity overflow rule: squared "
    "1e-6-grid logs overflow int64 past ~2e4 curve points; the "
    "curve has one point per document).",
    tags=("mining", "text"),
)
