r"""Evaluation / experimentation / profiling catalog tail (round 7,
continuation session): the measurement primitives a retrieval or
training-data pipeline runs AFTER the operators earlier in the catalog
have produced something — ranked-retrieval quality (NDCG/MRR/recall@k),
classifier calibration, OLS regression read-outs, a nonparametric
permutation test (the distribution-free sibling of
``ab_test_spend_welch``), classical seasonal decomposition, the AMS F2
sketch (the second-moment sibling of the KMV/count-min family), and a
per-column data-profiling audit.

Scale notes (100 TB posture):
- ranked-retrieval eval broadcasts the (tiny, fixed) probe set against
  ONE corpus scan — identical shape to ``eval_knn_label_accuracy``; the
  per-query window runs over scored (probe x corpus) rows partitioned by
  query, never a global sort. NDCG's log2 discounts are shared
  1e-6-grid literals (the Benford move) so neither engine evaluates a
  transcendental; DCG/IDCG are exact BIGINT until the final division.
- the permutation test fans the per-USER aggregate (not the fact) x200
  map-side — the same one-scan-fan-out trick as
  ``stats_bootstrap_mean_ci``; re-randomized arms are keyed md5, so the
  null distribution is reproducible from ids alone.
- seasonal decomposition and OLS collapse the fact to day/user grain
  first (exact integer cents), then all window/moment math runs on the
  calendar/user-sized relation.
- the AMS sketch is one fact scan fanned x16 (sign per seed is a
  stateless md5 projection) + a 16-row square-and-average; the exact-F2
  comparison side groups by user once. Counter magnitudes stay within
  BIGINT to ~sf100; beyond that the x^2 terms need DECIMAL (documented,
  not silently wrong: overflow raises in both engines).
- the column profile UNION branches each scan ONE column (parquet
  column pruning makes 5 single-column scans cheaper than one 5-column
  expand for COUNT DISTINCT at scale; each branch's distinct-aggregate
  shuffles only its own column's values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import cosine_sim
from ..session import tune
from ..sources.catalog import load_table, register_views, tables_in_sql
from .oracle_dialect import duck_cosine, duck_hex13_to_long
from .registry import register
from .stats_queries import _spark_hex13


def _sql_query(name: str, sql: str, doc: str = "", oracle: str | None = None,
               tags=("analytics",)):
    @register(name, oracle=oracle or sql, doc=doc, tags=tags)
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, tables_in_sql(_sql))
        return spark.sql(_sql)

    return fn


# --- ranked-retrieval quality: NDCG@10 / MRR@10 / recall@10 --------------------
#
# Binary relevance = (corpus label == probe label), leave-one-out. The
# log2 position discounts round(1e6/log2(i+1)) and their prefix sums are
# emitted as exact literals into BOTH dialects (like the Benford
# expected-mass table), so DCG and IDCG are exact BIGINT micro-units and
# the only fp ops are the final three divisions — hash-stable.

_NDCG_W = [1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465,
           301030, 289065]
_NDCG_CUM = [0, 1000000, 1630930, 2130930, 2561607, 2948460, 3304667, 3638000,
             3953465, 4254495, 4543560]

#: CASE picking the positional discount for rank rn in 1..10.
_W_CASE = ("CASE " + " ".join(f"WHEN rn = {i + 1} THEN {w}"
                              for i, w in enumerate(_NDCG_W)) + " ELSE 0 END")

#: CASE picking IDCG = cumulative discount of the first least(n_rel,10)
#: ideal hits.
_IDCG_CASE = ("CASE " + " ".join(f"WHEN k = {k} THEN {c}"
                                 for k, c in enumerate(_NDCG_CUM)) + " END")

_RANKEVAL_N_PROBES = 50
_RANKEVAL_K = 10


def _rankeval_oracle() -> str:
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel
      FROM embeddings WHERE vec_id < {_RANKEVAL_N_PROBES}
    ),
    lc AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
    top AS (
      SELECT query_id, qlabel, rn, rel FROM (
        SELECT q.query_id, q.qlabel,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {duck_cosine('e.embedding', 'q.qvec')} DESC,
                                           e.vec_id ASC) AS rn,
               CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
      ) WHERE rn <= {_RANKEVAL_K}
    ),
    per_q AS (
      SELECT query_id, qlabel,
             CAST(SUM(rel) AS BIGINT) AS hits_at_10,
             CAST(SUM(rel * ({_W_CASE})) AS BIGINT) AS dcg_micro,
             CAST(COALESCE(MIN(CASE WHEN rel = 1 THEN rn END), 0) AS BIGINT) AS rr_rank
      FROM top GROUP BY query_id, qlabel
    ),
    withrel AS (
      SELECT p.*, CAST(lc.n - 1 AS BIGINT) AS n_rel,
             CASE WHEN lc.n - 1 < {_RANKEVAL_K} THEN lc.n - 1
                  ELSE {_RANKEVAL_K} END AS k
      FROM per_q p JOIN lc ON p.qlabel = lc.label
    )
    SELECT query_id, qlabel AS label, n_rel, hits_at_10, dcg_micro,
           CAST({_IDCG_CASE} AS BIGINT) AS idcg_micro,
           CASE WHEN k = 0 THEN 0.0
                ELSE CAST(dcg_micro AS DOUBLE) / CAST({_IDCG_CASE} AS DOUBLE)
           END AS ndcg_at_10,
           rr_rank,
           CASE WHEN rr_rank = 0 THEN 0.0
                ELSE 1.0 / CAST(rr_rank AS DOUBLE) END AS mrr_at_10,
           CASE WHEN n_rel = 0 THEN 0.0
                ELSE CAST(hits_at_10 AS DOUBLE) / CAST(n_rel AS DOUBLE)
           END AS recall_at_10
    FROM withrel
    """


@register(
    "eval_retrieval_ranking",
    oracle=_rankeval_oracle(),
    doc="Ranked-retrieval quality metrics — NDCG@10, MRR@10, recall@10, "
    "hit count — for 50 leave-one-out probes over the embeddings "
    "corpus with binary relevance = label match: the eval harness a "
    "retrieval pipeline gates index/model changes on. The log2 "
    "position discounts and their prefix sums are shared 1e-6-grid "
    "literals (neither engine evaluates log2), DCG/IDCG/rank/hits are "
    "exact BIGINT, and only the final three divisions are fp64 — "
    "hash-stable cross-engine. Plan: broadcast the 50 probes against "
    "ONE corpus scan (the eval_knn shape), per-query window over "
    "scored rows, label-count dimension joined at the 50-row grain. "
    "On the near-uniform fixture vectors NDCG sits at the chance "
    "floor, which is the correct reading (no label signal).",
    tags=("ann", "eval"),
)
def eval_retrieval_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _RANKEVAL_N_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    lc = emb.groupBy("label").agg(F.count("*").alias("n"))
    scored = (
        emb.select("vec_id", "embedding", "label")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            cosine_sim(F.col("embedding"), F.col("qvec")).alias("sim"),
            "vec_id",
            (F.col("label") == F.col("qlabel")).cast("int").alias("rel"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    top = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _RANKEVAL_K
    )
    per_q = top.groupBy("query_id", "qlabel").agg(
        F.sum("rel").cast("bigint").alias("hits_at_10"),
        F.sum(F.col("rel") * F.expr(_W_CASE)).cast("bigint").alias("dcg_micro"),
        F.coalesce(
            F.min(F.when(F.col("rel") == 1, F.col("rn"))), F.lit(0)
        ).cast("bigint").alias("rr_rank"),
    )
    withrel = per_q.join(
        F.broadcast(lc), per_q["qlabel"] == lc["label"]
    ).select(
        per_q["query_id"],
        per_q["qlabel"],
        (lc["n"] - 1).cast("bigint").alias("n_rel"),
        F.least(lc["n"] - 1, F.lit(_RANKEVAL_K)).alias("k"),
        "hits_at_10",
        "dcg_micro",
        "rr_rank",
    )
    idcg = F.expr(_IDCG_CASE)
    return withrel.select(
        "query_id",
        F.col("qlabel").alias("label"),
        "n_rel",
        "hits_at_10",
        "dcg_micro",
        idcg.cast("bigint").alias("idcg_micro"),
        F.when(F.col("k") == 0, F.lit(0.0))
        .otherwise(F.col("dcg_micro").cast("double") / idcg.cast("double"))
        .alias("ndcg_at_10"),
        "rr_rank",
        F.when(F.col("rr_rank") == 0, F.lit(0.0))
        .otherwise(F.lit(1.0) / F.col("rr_rank").cast("double"))
        .alias("mrr_at_10"),
        F.when(F.col("n_rel") == 0, F.lit(0.0))
        .otherwise(F.col("hits_at_10").cast("double") / F.col("n_rel").cast("double"))
        .alias("recall_at_10"),
    )


# --- classifier calibration: reliability bins ----------------------------------

_sql_query(
    "eval_calibration_bins",
    """
    WITH s AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    b AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM s),
    binned AS (
      SELECT CAST(floor(CAST((s.score - b.lo) * 10 AS DOUBLE)
                        / CAST(b.hi - b.lo + 1 AS DOUBLE)) AS BIGINT) AS bin,
             s.score, s.pos
      FROM s CROSS JOIN b
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(score) AS DOUBLE) / COUNT(*) AS mean_score,
           CAST(SUM(pos) AS DOUBLE) / COUNT(*) AS pos_rate
    FROM binned GROUP BY bin ORDER BY bin ASC
    """,
    doc="Calibration / reliability curve: equal-width decile bins of a "
    "classifier score (document length as the is-English score, the "
    "same score eval_auc_doclang ranks) with per-bin observed positive "
    "rate vs mean score — the diagram that says whether a quality/"
    "langid model's scores can be thresholded as probabilities. "
    "Equal-WIDTH bins keep it one pass (equal-frequency would need the "
    "quantile machinery; length_buckets_approx covers that): min/max "
    "from a scalar-subquery aggregate, bin arithmetic exact on small "
    "integers, per-bin sums exact BIGINT, two final fp divisions. "
    "One scan + a 10-row aggregate; nothing else shuffles.",
    tags=("analytics", "eval"),
)


# --- OLS regression: per-user spend on activity --------------------------------

_sql_query(
    "regress_spend_on_activity",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100.0) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM per_user
    )
    SELECT n AS n_users,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0
             AS slope_dollars_per_event,
           (CAST(sy AS DOUBLE)
            - CAST(sx AS DOUBLE)
              * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
           / CAST(n AS DOUBLE) / 100.0 AS intercept_dollars,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
           / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r_squared
    FROM m
    """,
    doc="OLS regression read-out — does per-user activity (event count) "
    "predict spend? Slope, intercept, and R^2 assembled from exact "
    "BIGINT co-moments (x = events, y = exact cents, both integer at "
    "the user grain) with one fixed fp64 chain at the end — the same "
    "exact-moments discipline as feature_corr_matrix, so it "
    "hash-matches DuckDB regardless of partitioning. One user-keyed "
    "aggregate + a 6-number roll-up; nothing else shuffles at any SF. "
    "The closed-form normal-equation route is THE scalable linear "
    "regression for 1-2 features (no iterative solver, one pass).",
    tags=("stats", "analytics"),
)


# --- nonparametric permutation test over per-user spend ------------------------

_PERM_B = 199  # permutations; p-value resolution 1/(B+1) = 0.005


def _perm_sql(hexfn, str_t: str, series: str) -> str:
    # b = 0 is the OBSERVED assignment (same 'ab42|' key as
    # ab_test_spend_welch, so this tests exactly that experiment);
    # b >= 1 are re-randomized null draws keyed 'perm42|b|user'.
    key = (f"CASE WHEN b = 0 THEN md5(concat('ab42|', CAST(user_id AS {str_t}))) "
           f"ELSE md5(concat('perm42|', CAST(b AS {str_t}), '|', "
           f"CAST(user_id AS {str_t}))) END")
    return f"""
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END) AS cents
      FROM events GROUP BY user_id
    ),
    fanned AS (
      SELECT u.user_id, u.cents, s.b,
             CASE WHEN {hexfn(key)} % 2 = 0 THEN 1 ELSE 0 END AS in_a
      FROM per_user u CROSS JOIN ({series}) s(b)
    ),
    diffs AS (
      SELECT b,
             CAST(SUM(in_a * cents) AS DOUBLE)
               / CAST(SUM(in_a) AS DOUBLE)
             - CAST(SUM((1 - in_a) * cents) AS DOUBLE)
               / CAST(SUM(1 - in_a) AS DOUBLE) AS d
      FROM fanned GROUP BY b
    ),
    tagged AS (
      -- one empty-frame window over the 200-row diffs relation pins
      -- d_obs next to every replicate WITHOUT referencing diffs twice
      -- (Spark inlines CTEs per reference -> a second reference would
      -- rescan the fact)
      SELECT b, d, MAX(CASE WHEN b = 0 THEN d END) OVER () AS d_obs
      FROM diffs
    )
    SELECT CAST({_PERM_B} AS BIGINT) AS n_permutations,
           MAX(d_obs) / 100.0 AS uplift_dollars,
           CAST(SUM(CASE WHEN b > 0 AND abs(d) >= abs(d_obs)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_as_extreme,
           CAST(1 + SUM(CASE WHEN b > 0 AND abs(d) >= abs(d_obs)
                             THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST({_PERM_B} + 1 AS DOUBLE) AS p_value
    FROM tagged
    """


_PERM_DUCK_SERIES = f"SELECT unnest(range(0, {_PERM_B} + 1)) AS b"
_PERM_SPARK_SERIES = f"SELECT explode(sequence(0, {_PERM_B})) AS b"


@register(
    "stats_permutation_test",
    oracle=_perm_sql(duck_hex13_to_long, "VARCHAR", _PERM_DUCK_SERIES),
    doc="Nonparametric permutation test of the ab_test_spend_welch "
    "experiment: the observed A-B mean-spend difference (b=0 uses the "
    "SAME keyed-md5 arm assignment as the Welch query) against 199 "
    "re-randomized null assignments (keyed 'perm42|b|user' — the null "
    "distribution is reproducible from ids alone, no RNG state), "
    "two-sided p = (1 + #{|d_b| >= |d_obs|}) / 200 — the "
    "distribution-free companion to the parametric t read-out, exact "
    "under the randomization model. Plan: the fact collapses to the "
    "per-USER grain once, the x200 fan-out runs map-side over that "
    "user-sized relation (the stats_bootstrap_mean_ci trick), and each "
    "permutation's arm sums are exact BIGINT cents — the d_b doubles "
    "are identical fixed fp chains in both engines, so the extreme "
    "count and the p-value hash-match.",
    tags=("stats", "analytics"),
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_perm_sql(_spark_hex13, "STRING", _PERM_SPARK_SERIES))


# --- classical seasonal decomposition of daily revenue -------------------------

def _seasonal_sql(epoch_days: str) -> str:
    return f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100.0) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT day, cents,
             SUM(cents) OVER (ORDER BY day ASC
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             COUNT(*) OVER (ORDER BY day ASC
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      FROM daily
    ),
    det AS (
      -- detrended value scaled x7 to stay exact BIGINT: 7*y - sum7
      SELECT CAST({epoch_days} AS BIGINT) % 7 AS dow_num,
             7 * cents - s7 AS detr7
      FROM win WHERE c7 = 7
    )
    SELECT dow_num,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(detr7) AS BIGINT) AS sum_detr7_cents,
           CAST(SUM(detr7) AS DOUBLE) / (7.0 * COUNT(*)) / 100.0
             AS seasonal_dollars
    FROM det GROUP BY dow_num ORDER BY dow_num ASC
    """


@register(
    "forecast_seasonal_decompose",
    oracle=_seasonal_sql("datediff('day', DATE '1970-01-01', day)"),
    doc="Classical (moving-average) seasonal decomposition of the daily "
    "purchase-revenue series: trend = centered 7-day moving average, "
    "seasonal component = per-day-of-week mean of the detrended series "
    "— the decomposition behind forecast_snaive_mase's choice of a "
    "weekly seasonal naive. Detrending stays EXACT by scaling x7 "
    "(detr7 = 7*y - sum7, all BIGINT cents; dividing by 7 would leave "
    "the integers), day-of-week comes from exact epoch-day arithmetic "
    "((days since 1970-01-01) % 7, 0 = Thursday) rather than the "
    "engines' divergent dayofweek() conventions, and partial windows "
    "at the series edges are excluded by the window COUNT. The fact "
    "collapses to day grain first; everything after is calendar-sized. "
    "Shared SQL except the epoch-day expression (datediff argument "
    "order differs between engines).",
    tags=("stats", "analytics", "timeseries"),
)
def forecast_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_seasonal_sql("datediff(day, DATE '1970-01-01')"))


# --- AMS F2 sketch vs exact second frequency moment ----------------------------

_AMS_SEEDS = 16


def _ams_sql(hexfn, str_t: str, series: str) -> str:
    key = f"md5(concat('ams42|', CAST(s.s AS {str_t}), '|', CAST(e.user_id AS {str_t})))"
    return f"""
    WITH xs AS (
      SELECT s.s,
             CAST(SUM(CASE WHEN {hexfn(key)} % 2 = 0 THEN 1 ELSE -1 END)
               AS BIGINT) AS x
      FROM events e CROSS JOIN ({series}) s(s)
      GROUP BY s.s
    ),
    est AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(x * x) AS BIGINT) AS sum_sq
      FROM xs
    ),
    exact AS (
      SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS f2
      FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id)
    )
    SELECT est.k AS n_estimators,
           CAST(est.sum_sq AS DOUBLE) / CAST(est.k AS DOUBLE) AS f2_est,
           exact.f2 AS f2_exact,
           CAST(round(1000000.0 * (CAST(est.sum_sq AS DOUBLE) / CAST(est.k AS DOUBLE)
                                   - CAST(exact.f2 AS DOUBLE))
                      / CAST(exact.f2 AS DOUBLE)) AS BIGINT) AS rel_err_micro
    FROM est CROSS JOIN exact
    """


_AMS_DUCK_SERIES = f"SELECT unnest(range(0, {_AMS_SEEDS})) AS s"
_AMS_SPARK_SERIES = f"SELECT explode(sequence(0, {_AMS_SEEDS - 1})) AS s"


@register(
    "sketch_ams_f2",
    oracle=_ams_sql(duck_hex13_to_long, "VARCHAR", _AMS_DUCK_SERIES),
    doc="AMS (Alon-Matias-Szegedy) sketch of the second frequency moment "
    "F2 = sum(count^2) of the user_id stream — the self-join-size / "
    "skew estimator that completes the sketch family (KMV covers F0, "
    "count-min covers point frequencies). 16 independent +/-1 sign "
    "estimators, each a stateless keyed-md5 projection folded in ONE "
    "fact scan fanned x16 map-side (sum of signs per seed is exact "
    "BIGINT and mergeable across partitions — the sketch property); "
    "the estimate is the mean of the 16 squares, reported next to the "
    "exact F2 (one user-keyed aggregate) with the relative error on "
    "the 1e-6 grid. Fixture-scale F2 keeps x^2 within BIGINT to "
    "~sf100; beyond that the squares need DECIMAL (overflow raises, "
    "never silently wrong).",
    tags=("sketch", "analytics"),
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ams_sql(_spark_hex13, "STRING", _AMS_SPARK_SERIES))


# --- per-column data profile ----------------------------------------------------


def _profile_sql(str_t: str) -> str:
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    branches = []
    for c in cols:
        branches.append(f"""
      SELECT '{c}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
             CAST(MIN({c}) AS {str_t}) AS min_value,
             CAST(MAX({c}) AS {str_t}) AS max_value
      FROM documents""")
    return " UNION ALL ".join(branches)


@register(
    "audit_column_profile",
    oracle=_profile_sql("VARCHAR"),
    doc="Per-column data profile of the documents table — row count, "
    "non-null count, exact distinct count, lexicographic/numeric "
    "min and max (rendered VARCHAR for a uniform schema) — the "
    "column-statistics audit a curation pipeline snapshots before and "
    "after every transformation (audit_referential_integrity checks "
    "cross-table contracts; this profiles each column in isolation). "
    "Shape: one UNION branch per column, each scanning ONLY its column "
    "(parquet column pruning) with its own distinct-aggregate shuffle — "
    "at 100 TB this beats a single 5-way COUNT DISTINCT expand because "
    "no row is replicated 5x and each shuffle carries one column's "
    "values. String min/max use binary collation in both engines.",
    tags=("analytics", "audit"),
)
def audit_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_profile_sql("STRING"))


# --- privacy / governance audits -------------------------------------------------

_sql_query(
    "audit_k_anonymity",
    """
    WITH q AS (
      SELECT lang, source,
             CAST(floor(CAST(n_chars AS DOUBLE) / 100.0) AS BIGINT) AS len_bucket
      FROM documents
    ),
    g AS (
      SELECT lang, source, len_bucket, CAST(COUNT(*) AS BIGINT) AS group_size
      FROM q GROUP BY lang, source, len_bucket
    )
    SELECT lang, source, len_bucket, group_size
    FROM g WHERE group_size < 5
    ORDER BY group_size ASC, lang ASC, source ASC, len_bucket ASC
    """,
    doc="k-anonymity audit over the (lang, source, length-bucket) "
    "quasi-identifier tuple: every equivalence class smaller than k=5 "
    "— the re-identification screen a governance pipeline runs before "
    "a dataset leaves the boundary (a group of 1 means those QI values "
    "uniquely fingerprint a document/user). One hash aggregate on the "
    "QI tuple; only the violating classes (bounded by the QI domain, "
    "not the fact) come back. The length bucket coarsens the "
    "continuous column the way a real QI treatment would.",
    tags=("analytics", "audit", "privacy"),
)


_DP_EPS = 1.0


def _dp_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('dp42|', lang))"
    u = f"(CAST(({hexfn(key)}) % 999999 AS DOUBLE) + 1.0) / 1000001.0"
    return f"""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS true_count FROM documents GROUP BY lang
    ),
    n AS (
      SELECT lang, true_count, {u} AS u FROM c
    ),
    noise AS (
      SELECT lang, true_count,
             CAST(round(1000000.0 *
               (CASE WHEN u < 0.5 THEN ln(2.0 * u) ELSE -ln(2.0 * (1.0 - u)) END)
               / {_DP_EPS}) AS BIGINT) AS noise_micro
      FROM n
    )
    SELECT lang, true_count,
           noise_micro,
           CAST(true_count AS DOUBLE) + CAST(noise_micro AS DOUBLE) / 1000000.0
             AS noisy_count
    FROM noise ORDER BY lang ASC
    """


@register(
    "private_counts_laplace",
    oracle=None,  # assembled below
    doc="Differentially-private per-language counts: Laplace(1/eps) "
    "noise (eps=1) added to each group count, with the noise draw "
    "DERIVED from a keyed md5 uniform instead of RNG state — the same "
    "determinism move as the bootstrap/permutation machinery, which "
    "makes a DP release pipeline reproducible and auditable (same key "
    "-> same noise; rotate the key per release). The inverse-CDF "
    "noise lands on the 1e-6 grid so both engines emit identical "
    "values; the group aggregate is the only shuffle. NOTE: the "
    "true_count column is exposed here for the correctness oracle — a "
    "production release projects it away (and a keyed-hash noise "
    "source trades formal DP guarantees for reproducibility unless "
    "the key stays secret; documented tradeoff).",
    tags=("analytics", "privacy"),
)
def private_counts_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_dp_sql(_spark_hex13, "STRING"))


from .registry import QUERIES as _QUERIES  # noqa: E402

_QUERIES["private_counts_laplace"].oracle = _dp_sql(duck_hex13_to_long, "VARCHAR")


# --- isotonic calibration (PAVA via the minimax identity) -----------------------
#
# The pool-adjacent-violators solution has the closed minimax form
#   iso[k] = max_{i<=k} min_{j>=k} pooled_rate(i..j)
# (Ayer et al. 1955; Robertson/Wright/Dykstra §1.2), which turns an
# inherently sequential algorithm into three relational steps over the
# BINNED relation: interval pooled rates from prefix sums, a min over
# j>=k, a max over i<=k. O(B^3) tuples for B bins — B=10, so ~220
# interval rows regardless of corpus size: the fact is touched ONCE (the
# same scan/aggregate as eval_calibration_bins); everything isotonic
# happens on a bin-sized relation. Pooled rates are fp64 divisions of
# exact BIGINT prefix sums, so min/max/hash are cross-engine stable.

_ISO_BINNED_SQL = """
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
      FROM (
        SELECT CAST(floor(CAST((s.score - b.lo) * 10 AS DOUBLE)
                          / CAST(b.hi - b.lo + 1 AS DOUBLE)) AS BIGINT) AS bin,
               s.pos
        FROM (SELECT n_chars AS score,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              FROM documents) s
        CROSS JOIN (SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM documents) b
      ) binned GROUP BY bin
"""


def _iso_sql(g_sql: str) -> str:
    """PAVA minimax over a 10-row binned relation ``g(bin, n, p)``."""
    return f"""
    WITH g AS ({g_sql}),
    pre AS (
      SELECT bin, n, p,
             CAST(SUM(n) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
             CAST(SUM(p) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp
      FROM g
    ),
    iv AS (
      SELECT a.bin AS i, z.bin AS j,
             CAST(z.cp - a.cp + a.p AS DOUBLE)
               / CAST(z.cn - a.cn + a.n AS DOUBLE) AS r
      FROM pre a JOIN pre z ON z.bin >= a.bin
    ),
    mn AS (
      SELECT iv.i, k.bin AS k, MIN(iv.r) AS m
      FROM iv JOIN g k ON iv.j >= k.bin AND iv.i <= k.bin
      GROUP BY iv.i, k.bin
    ),
    fit AS (SELECT k AS bin, MAX(m) AS iso_rate FROM mn GROUP BY k)
    SELECT g.bin, g.n AS n_docs, g.p AS n_pos,
           CAST(g.p AS DOUBLE) / CAST(g.n AS DOUBLE) AS pos_rate,
           fit.iso_rate
    FROM g JOIN fit ON g.bin = fit.bin
    ORDER BY g.bin ASC
    """


@register(
    "eval_calibration_isotonic",
    oracle=_iso_sql(_ISO_BINNED_SQL),
    doc="Isotonic (monotone) calibration of the reliability curve: the "
    "PAVA fit over eval_calibration_bins' decile bins via the minimax "
    "identity iso[k] = max_{i<=k} min_{j>=k} pooled_rate(i..j) — the "
    "post-hoc calibrator (Zadrozny & Elkan's isotonic recalibration) "
    "that turns a monotone-ish score into usable probabilities without "
    "assuming Platt's sigmoid shape. The fact scans ONCE into a "
    "localCheckpoint'ed 10-row binned relation (Spark inlines CTEs per "
    "reference — the SQL form's five references to the bin relation "
    "re-scanned the corpus 16 times); the O(B^3) minimax runs on ~220 "
    "interval tuples, so the operator costs the same at any corpus "
    "size. Weighted by bin counts (pooled rates, not rate-of-rates).",
    tags=("analytics", "eval"),
)
def eval_calibration_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("documents",))
    g = spark.sql(_ISO_BINNED_SQL).localCheckpoint()
    g.createOrReplaceTempView("iso_binned")
    return spark.sql(_iso_sql("SELECT bin, n, p FROM iso_binned"))


# --- seasonality-adjusted anomaly screen ---------------------------------------


def _seasonal_anom_sql(epoch_days: str) -> str:
    return f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100.0) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT day, cents,
             SUM(cents) OVER (ORDER BY day ASC
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             COUNT(*) OVER (ORDER BY day ASC
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      FROM daily
    ),
    det AS (
      SELECT day, CAST({epoch_days} AS BIGINT) % 7 AS dow_num,
             7 * cents - s7 AS detr7
      FROM win WHERE c7 = 7
    ),
    dm AS (
      SELECT dow_num, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(detr7) AS BIGINT) AS s
      FROM det GROUP BY dow_num
    ),
    r AS (
      SELECT d.day, d.dow_num, d.detr7,
             CAST(round(CAST(d.detr7 AS DOUBLE) - CAST(dm.s AS DOUBLE) / dm.n)
               AS BIGINT) AS r_unit
      FROM det d JOIN dm ON dm.dow_num = d.dow_num
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r_unit) AS BIGINT) AS s,
             CAST(SUM(r_unit * r_unit) AS BIGINT) AS sq
      FROM r
    ),
    z AS (
      SELECT r.day, r.dow_num, r.detr7,
             CAST(round(1000000.0
               * (CAST(r.r_unit AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
               / SQRT((CAST(m.sq AS DOUBLE)
                       - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE) / m.n)
                      / (m.n - 1))) AS BIGINT) AS z_micro
      FROM r CROSS JOIN m WHERE m.n > 1
    )
    SELECT day, dow_num, CAST(detr7 AS BIGINT) AS detrended7_cents,
           CAST(z_micro AS DOUBLE) / 1000000.0 AS z
    FROM z WHERE abs(z_micro) > 1900000
    ORDER BY day ASC
    """


@register(
    "events_seasonal_anomaly",
    oracle=_seasonal_anom_sql("datediff('day', DATE '1970-01-01', day)"),
    doc="Seasonality-adjusted anomaly screen: days whose detrended, "
    "day-of-week-adjusted revenue residual sits more than 1.9 sigma "
    "from the residual distribution — the screen that catches "
    "'unusual for a Sunday' where a raw z-score "
    "(events_anomaly_rolling_z) would either miss it or flag every "
    "weekend. Reuses forecast_seasonal_decompose's exact x7 "
    "detrending (BIGINT cents), removes each weekday's own mean, "
    "rounds the residual to whole detrended-cent units (already ~1e6x "
    "finer than sigma, and the squared sums stay inside int64 to "
    "~100x the sf1.0 revenue scale — a finer grid overflowed; beyond "
    "that the quantum drops to whole dollars) so the global moment "
    "sums are exact BIGINT. Standardizing within the tiny per-dow groups "
    "would cap |z| at (n-1)/sqrt(n), provably below any useful "
    "threshold on a 30-day fixture), and THRESHOLDS ON THE GRID "
    "VALUE so flag membership cannot flap on a last ulp. The 1.9 "
    "sigma gate is demo-scaled to the one-month fixtures; a "
    "production deployment over years of history would run 3+. "
    "Calendar-bounded after the one day-grain collapse.",
    tags=("stats", "analytics", "timeseries"),
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_seasonal_anom_sql("datediff(day, DATE '1970-01-01')"))


# --- cumulative gains / lift table -----------------------------------------------

_sql_query(
    "eval_lift_gains",
    """
    WITH s AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
      FROM s GROUP BY score
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(p) AS BIGINT) AS pp FROM h),
    c AS (
      SELECT score,
        CAST(SUM(n) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS cn,
        CAST(SUM(p) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS cp
      FROM h
    ),
    d AS (
      SELECT CAST(k AS BIGINT) AS decile
      FROM (VALUES (1), (2), (3), (4), (5), (6), (7), (8), (9), (10)) AS v(k)
    ),
    sel AS (
      SELECT d.decile, MIN(c.cn) AS cn
      FROM d CROSS JOIN t
      JOIN c ON c.cn * 10 >= d.decile * t.nn
      GROUP BY d.decile
    )
    SELECT sel.decile, CAST(sel.cn AS BIGINT) AS n_targeted,
           c.cp AS pos_captured,
           CAST(sel.cn AS DOUBLE) / CAST(t.nn AS DOUBLE) AS frac_targeted,
           CAST(c.cp AS DOUBLE) / CAST(t.pp AS DOUBLE) AS gain,
           CAST(c.cp * t.nn AS DOUBLE) / CAST(sel.cn * t.pp AS DOUBLE) AS lift
    FROM sel JOIN c ON c.cn = sel.cn CROSS JOIN t
    """,
    doc="Cumulative gains / lift table of the is-English score "
    "(document length — the same score eval_auc_doclang ranks and "
    "eval_calibration_bins bins): at each decile of the population "
    "ranked score-DESC, the fraction of all positives captured (gain) "
    "and the precision multiple over random targeting (lift) — the "
    "campaign-targeting read-out that complements ROC (AUC says the "
    "ranking is good; lift says what acting on the top 10% buys). "
    "Histogram form over the bounded score domain: prefix sums over "
    "the <=|distinct scores| relation, never a row sort; decile cut "
    "points picked by the smallest prefix covering k/10 of the mass "
    "(ties enter whole score-groups together, the standard gains "
    "convention). Lift = (cp*N)/(cn*P) — ONE fp64 division of exact "
    "BIGINT cross-products, bit-stable cross-engine.",
    tags=("analytics", "eval"),
)


# --- Brier score + Murphy decomposition ------------------------------------------

_sql_query(
    "eval_brier_decomposition",
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
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS np,
             CAST(SUM(CAST(round(
               ((p - pos) * (p - pos)) * 1000000000) AS BIGINT)) AS BIGINT)
               AS brier_nano_sum
      FROM f
    ),
    k AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS nk, CAST(SUM(pos) AS BIGINT) AS pk,
             SUM(p) AS psum
      FROM f GROUP BY bin
    ),
    dec AS (
      SELECT
        CAST(SUM(CAST(round(CAST(nk AS DOUBLE)
          * (psum / CAST(nk AS DOUBLE) - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE))
          * (psum / CAST(nk AS DOUBLE) - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE))
          * 1000000000) AS BIGINT)) AS BIGINT) AS rel_nano_sum,
        CAST(SUM(CAST(round(CAST(nk AS DOUBLE)
          * (CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE) - CAST(t.np AS DOUBLE) / CAST(t.n AS DOUBLE))
          * (CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE) - CAST(t.np AS DOUBLE) / CAST(t.n AS DOUBLE))
          * 1000000000) AS BIGINT)) AS BIGINT) AS res_nano_sum
      FROM k CROSS JOIN t
    )
    SELECT t.n AS n_docs,
           CAST(t.brier_nano_sum AS DOUBLE) / CAST(t.n AS DOUBLE) / 1000000000.0
             AS brier,
           CAST(dec.rel_nano_sum AS DOUBLE) / CAST(t.n AS DOUBLE) / 1000000000.0
             AS reliability,
           CAST(dec.res_nano_sum AS DOUBLE) / CAST(t.n AS DOUBLE) / 1000000000.0
             AS resolution,
           (CAST(t.np AS DOUBLE) / CAST(t.n AS DOUBLE))
             * (1.0 - CAST(t.np AS DOUBLE) / CAST(t.n AS DOUBLE)) AS uncertainty
    FROM t CROSS JOIN dec
    """,
    doc="Brier score of the normalized is-English score plus its "
    "Murphy decomposition over the calibration deciles: reliability "
    "(how far bin forecasts sit from bin outcomes — lower is better), "
    "resolution (how much bins separate the base rate — higher is "
    "better), uncertainty (base-rate variance). Forecast p = "
    "(score-lo)/(hi-lo); per-row Brier terms and per-bin REL/RES "
    "terms land on the 1e-9 grid BEFORE their sums (the ANOVA "
    "between-term move — raw fp sums across rows/bins would be "
    "accumulation-order-dependent), so every output is a fixed fp "
    "chain over exact BIGINTs. The decomposition identity brier = "
    "rel - res + unc + (within-bin variance - 2*covariance residual) "
    "is recomputed in pytest. One scan, one 10-bin aggregate, two "
    "1-row roll-ups.",
    tags=("analytics", "eval"),
)


# --- decision-threshold optimization under a cost matrix ---------------------------

_sql_query(
    "eval_threshold_utility",
    """
    WITH s AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
      FROM s GROUP BY score
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(p) AS BIGINT) AS pp FROM h),
    c AS (
      SELECT score,
        CAST(SUM(n) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS cn,
        CAST(SUM(p) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS cp
      FROM h
    ),
    u AS (
      -- utility in integer cents: TP +500, FP -200, FN -300, TN 0
      SELECT c.score AS threshold,
             c.cp AS tp, c.cn - c.cp AS fp, t.pp - c.cp AS fn_,
             t.nn - c.cn - (t.pp - c.cp) AS tn,
             500 * c.cp - 200 * (c.cn - c.cp) - 300 * (t.pp - c.cp)
               AS utility_cents
      FROM c CROSS JOIN t
    )
    SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp, fn_ AS fn, tn,
           utility_cents,
           CAST(utility_cents AS DOUBLE) / CAST(tp + fp + fn_ + tn AS DOUBLE)
             / 100.0 AS utility_per_doc_dollars
    FROM u
    ORDER BY utility_cents DESC, threshold ASC
    LIMIT 5
    """,
    doc="Decision-threshold optimization under an asymmetric cost "
    "matrix (TP +$5, FP -$2, FN -$3, TN 0): the 5 best 'predict "
    "positive when score >= t' operating points by total utility — "
    "what a deployment actually needs from a classifier eval (the PR "
    "curve says what trade-offs EXIST; this picks one given costs). "
    "Same histogram-prefix machinery as eval_pr_curve/eval_lift_gains "
    "— confusion cells at every threshold from prefix sums over the "
    "bounded score domain, utility in exact integer cents (the argmax "
    "cannot flap), one fp division per row for the per-doc rate.",
    tags=("analytics", "eval"),
)
