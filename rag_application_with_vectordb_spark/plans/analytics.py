"""Event- and text-analytics catalog: funnels, retention cohorts,
forward-fill, TF-IDF — the product-analytics surface a training-data /
RAG pipeline team runs next to dedup and retrieval.

All dialect-shared SQL or API+oracle pairs; decimal-exact where money
(none here — counts, timestamps, and parquet-native doubles only, so
value hashes are stable by construction).

Scale notes:
- funnels/cohorts aggregate per user first (shuffle on user_id once),
  then roll the small per-user table up — never a self-join of raw
  events against raw events;
- forward-fill is one window over (user, time) — at 100 TB this is the
  hot sessionization partitioning, which AQE splits on skewed users;
- TF-IDF's doc-frequency side is a broadcast-sized term table joined
  back to the per-doc term counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import track_persist, tune
from ..sources.catalog import load_table, register_views, tables_in_sql
from .registry import register


def _sql_query(name: str, sql: str, doc: str = "", oracle: str | None = None, tags=("analytics",)):
    @register(name, oracle=oracle or sql, doc=doc, tags=tags)
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, tables_in_sql(_sql))
        return spark.sql(_sql)

    return fn


# --- funnel: signup → click → purchase, strictly ordered ----------------------

_sql_query(
    "funnel_signup_click_purchase",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id
    )
    SELECT 'signup' AS step, CAST(1 AS BIGINT) AS step_no, COUNT(*) AS users FROM s
    UNION ALL
    SELECT 'click' AS step, CAST(2 AS BIGINT) AS step_no, COUNT(*) AS users FROM c
    UNION ALL
    SELECT 'purchase' AS step, CAST(3 AS BIGINT) AS step_no, COUNT(*) AS users FROM p
    """,
    doc="Ordered conversion funnel: first-signup → first-later-click → "
    "first-later-purchase per user. Each step is a per-user MIN aggregate "
    "joined to the previous step — shuffles stay keyed on user_id, and "
    "step N's input shrinks monotonically (never events×events).",
)

# --- retention cohorts: first-seen month × month offset -----------------------

def _retention_sql(daydiff: str) -> str:
    """Weekly retention matrix; ``daydiff`` renders each engine's
    days-between(cohort_week, active_week) expression (the fixture's
    events span ~4 weeks, so weeks are the granularity with signal)."""
    return f"""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_trunc('week', e.ts) AS DATE) AS active_week
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week,
      CAST({daydiff} / 7 AS BIGINT) AS week_offset,
      COUNT(*) AS active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """


_sql_query(
    "retention_cohorts",
    _retention_sql("datediff(active_week, cohort_week)"),
    oracle=_retention_sql("datediff('day', cohort_week, active_week)"),
    doc="Retention cohort matrix: users bucketed by first-activity week, "
    "distinct-counted per week offset. Per-user first-activity is one "
    "shuffle on user_id; the matrix itself is tiny. (datediff argument "
    "order is the only dialect split.)",
)

# --- forward-fill (LOCF): last purchase value carried over each user stream ----

_sql_query(
    "events_forward_fill",
    # Spark puts IGNORE NULLS after the call; DuckDB inside the parens.
    """
    SELECT event_id, user_id, ts,
      last_value(CASE WHEN event_type = 'purchase' THEN value END) IGNORE NULLS
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
    FROM events
    """,
    oracle="""
    SELECT event_id, user_id, ts,
      last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
    FROM events
    """,
    doc="Forward-fill / LOCF: every event annotated with the user's most "
    "recent purchase value (IGNORE NULLS window). One shuffle on user_id; "
    "the classic gap-fill primitive for feature pipelines. Values pass "
    "through from parquet untouched, so the hash can't flap.",
)

# --- TF-IDF: top terms per document -------------------------------------------

_TFIDF_SPARK = r"""
    WITH toks AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, explode(split(trim(text), '\\s+')) AS word FROM documents
      ) WHERE word <> ''
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY word),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
    scored AS (
      SELECT tf.doc_id, tf.word,
             round(CAST(tf AS DOUBLE) * ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)), 6) AS tfidf
      FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
    )
    SELECT doc_id, word, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
      FROM scored
    ) WHERE rn <= 3
"""

_TFIDF_DUCK = r"""
    WITH toks AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents
      ) WHERE word <> ''
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY word),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
    scored AS (
      SELECT tf.doc_id, tf.word,
             round(CAST(tf AS DOUBLE) * ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)), 6) AS tfidf
      FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
    )
    SELECT doc_id, word, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
      FROM scored
    ) WHERE rn <= 3
"""

_sql_query(
    "text_tfidf_top_terms",
    _TFIDF_SPARK,
    oracle=_TFIDF_DUCK,
    doc="TF-IDF top-3 terms per document: term counts per doc (one shuffle "
    "on (doc, word)), doc frequencies as a broadcast-sized term table "
    "joined back, smoothed idf = ln((N+1)/(df+1)) rounded to 6 decimals "
    "(engine libm ln() differs by 1 ulp — ranking and hashing use the "
    "rounded score); per-doc top-k via window, never a global sort.",
    tags=("text", "analytics"),
)

# --- session stats: per-user rollup of the 4-hour-gap sessionization ----------

def _session_stats_sql(dur: str) -> str:
    """Per-user session rollup; ``dur`` renders the engine's
    (micros(max ts) − micros(min ts)) expression — the only dialect
    split (Spark ``unix_micros``, DuckDB ``epoch_us``). Microsecond
    INTEGER differences are exact (no fractional-second truncate-vs-
    round divergence) and cancel any session-timezone offset, so the
    values agree cross-engine without pinning a zone."""
    return f"""
    WITH x AS (
      SELECT user_id, ts, event_id,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 4 HOUR
             THEN 1 ELSE 0 END AS is_new
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id,
        SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM x
    ), sess AS (
      SELECT user_id, session_id, COUNT(*) AS n_events, {dur} AS dur_us
      FROM s GROUP BY user_id, session_id
    )
    SELECT user_id,
      CAST(COUNT(*) AS BIGINT) AS n_sessions,
      CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS events_per_session,
      CAST(SUM(dur_us) AS DOUBLE) / (COUNT(*) * 1000000.0) AS avg_session_sec,
      CAST(MAX(dur_us) AS DOUBLE) / 1000000.0 AS max_session_sec,
      CAST(MAX(n_events) AS BIGINT) AS max_session_events
    FROM sess GROUP BY user_id
    """


_sql_query(
    "events_session_stats",
    _session_stats_sql("unix_micros(MAX(ts)) - unix_micros(MIN(ts))"),
    oracle=_session_stats_sql(
        "CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)"
    ),
    doc="Per-user session statistics over the 4-hour-gap sessionization "
    "(same gap rule as events_sessionized): session count, mean events "
    "and duration, longest session. Everything stays keyed on user_id — "
    "one shuffle, then a per-user rollup of a small session table; the "
    "duration ratios divide exact integers, so the hash is stable.",
    tags=("analytics", "sessions"),
)

# --- gap ranking: each user's longest inter-event silences --------------------

def _gap_rank_sql(us: str) -> str:
    """``us`` renders timestamp→exact-microseconds (unix_micros vs
    epoch_us); the gap division back to seconds is exact-int / 1e6 —
    correctly rounded identically in both engines."""
    return f"""
    WITH g AS (
      SELECT user_id, event_id, event_type,
             {us.format(e='ts')}
             - lag({us.format(e='ts')}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id, gap_rank, CAST(gap_us AS DOUBLE) / 1000000.0 AS gap_sec,
           event_id, event_type FROM (
      SELECT user_id, event_id, event_type, gap_us,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY gap_us DESC, event_id) AS BIGINT) AS gap_rank
      FROM g WHERE gap_us IS NOT NULL
    ) r WHERE gap_rank <= 3
    """


_sql_query(
    "window_session_gap_rank",
    _gap_rank_sql("unix_micros({e})"),
    oracle=_gap_rank_sql("epoch_us({e})"),
    doc="Top-3 longest inter-event gaps per user — the diagnostic behind "
    "any session-gap threshold choice (a gap histogram's tail). One lag "
    "window plus one ranking window, both partitioned by user_id: a "
    "single shuffle, skew-safe under AQE, no global sort.",
    tags=("analytics", "window"),
)

# --- co-purchase graph: parts that ship together ------------------------------

_sql_query(
    "graph_copurchase_edges",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= 2
    """,
    doc="Co-purchase edge list: part pairs appearing in >= 2 common orders "
    "— the item-item graph feeding co-occurrence recommenders and graph "
    "dedup. The self-join is keyed on l_orderkey (never all-pairs across "
    "orders): per-order fanout is bounded by basket size squared, the "
    "shuffle key is the order key, and the HAVING prunes the singleton "
    "tail before it leaves the aggregation.",
    tags=("analytics", "graph"),
)

# --- PageRank over the co-purchase graph (iterative, fixed-point) -------------

_PR_ITERS, _PR_SCALE = 3, 1_000_000_000
_PR_BASE = 15 * _PR_SCALE // 100


def _pagerank_oracle() -> str:
    """Unrolled fixed-point PageRank as DuckDB CTEs — the bit-exact twin
    of ``operators.graph.pagerank_fp`` (integer shares + integer damping;
    ``//`` here == Spark's ``div`` for the non-negative values in play)."""
    parts = [
        """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    prs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    edges AS (SELECT pa AS src, pb AS dst FROM prs
              UNION ALL SELECT pb AS src, pa AS dst FROM prs),
    deg AS (SELECT src AS part, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src),"""
        + f"""
    pr0 AS (SELECT part, CAST({_PR_SCALE} AS BIGINT) AS pr FROM deg)"""
    ]
    for t in range(1, _PR_ITERS + 1):
        parts.append(f"""in{t} AS (
      SELECT e.dst AS part, SUM(p.pr // d.outdeg) AS s
      FROM edges e JOIN pr{t - 1} p ON p.part = e.src
                   JOIN deg d ON d.part = e.src
      GROUP BY e.dst
    ),
    pr{t} AS (
      SELECT d.part,
             CAST({_PR_BASE} + (85 * COALESCE(i.s, 0)) // 100 AS BIGINT) AS pr
      FROM deg d LEFT JOIN in{t} i USING (part)
    )""")
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT d.part AS part_id, d.outdeg,
           CAST(p.pr AS DOUBLE) / {_PR_SCALE}.0 AS pagerank
    FROM deg d JOIN pr{_PR_ITERS} p USING (part)
    """


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc="PageRank over the symmetrized co-purchase graph (part pairs "
    "sharing >= 2 orders), 3 iterations at damping 0.85 — the second "
    "iterative graph algorithm next to dedup_components, run as a "
    "bounded Python loop of DataFrame joins (one Pregel superstep per "
    "iteration: edges-join-rank shuffled on src, inflow agg shuffled on "
    "dst; the rank vector never touches the driver). Rank is carried as "
    "fixed-point BIGINT (1e9 units) so the inflow sum is an order-free "
    "integer aggregate — that, plus integer shares and integer damping, "
    "makes an ITERATIVE fp-free algorithm value-checkable bit-for-bit "
    "against DuckDB's unrolled CTE twin.",
    tags=("analytics", "graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_fp
    from ..sources.catalog import load_table

    tune(spark)
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    prs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        # bounded co-purchase pair relation (HAVING-pruned): checkpoint
        # once so the symmetrizing union + the operator's deg/ed cache
        # fills read it instead of re-running the scan + self-join 4x
        .localCheckpoint()
    )
    edges = prs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        prs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    ranked = pagerank_fp(edges, iterations=_PR_ITERS, scale=_PR_SCALE)
    return ranked.select(
        F.col("part").alias("part_id"),
        "outdeg",
        (F.col("pr").cast("double") / F.lit(float(_PR_SCALE))).alias("pagerank"),
    )


# --- dataset card: the corpus summary a training-data pipeline publishes ------

_sql_query(
    "docs_dataset_card",
    """
    SELECT lang, source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_tokens,
      CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
    FROM documents
    GROUP BY GROUPING SETS ((lang, source), (lang), ())
    """,
    doc="Dataset card: corpus composition rolled up by (lang, source), "
    "per-lang, and overall in one pass — doc counts, char/token volume, "
    "length extremes, and exact-dup distinct texts (md5 fingerprints, so "
    "the distinct shuffles 32-byte keys, not documents). GROUPING SETS "
    "shares the single scan across all three granularities; every "
    "output is an exact-integer aggregate or a ratio of exact integers.",
    tags=("analytics", "text"),
)

# --- skew demo: salted join on the hot user_id key ----------------------------

_SKEW_ORACLE = """
    WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
    SELECT e.user_id, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS spend
    FROM events e JOIN f ON e.user_id = f.user_id
    WHERE e.ts < f.first_ts + INTERVAL 7 DAY
    GROUP BY e.user_id, e.event_type
"""


@register(
    "skew_salted_user_spend",
    oracle=_SKEW_ORACLE,
    doc="First-week activity per user x event_type, with the events-to-"
    "profile join run through operators.skew.salted_join: the fixture's "
    "15 user_ids are exactly the hot-key shape that funnels a plain "
    "shuffle join into 15 reducers at scale. The big side's key widens "
    "to (user_id, salt in [0,8)), the small side replicates 8x, and "
    "each hot key spreads over 8 reducers; the salt never reaches the "
    "output, so results hash-match the plain-join oracle. (A 15-row dim "
    "would be broadcast in production; salting is the middle regime "
    "where the dim outgrows broadcast but not replication - this query "
    "pins the pattern's correctness and plan shape, see test_plans.)",
    tags=("analytics", "skew"),
)
def skew_salted_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join
    from ..sources.catalog import load_table

    tune(spark)
    events = load_table(spark, sf_dir, "events")
    dim = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = salted_join(events, dim, "user_id", num_salts=8, join_hint="shuffle_hash")
    return (
        joined.filter(F.col("ts") < F.col("first_ts") + F.expr("INTERVAL 7 DAY"))
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("spend"),
        )
    )

# --- exact interpolated percentiles (the sketch's ground truth) ---------------

_PCTL_ORACLE = """
    WITH v AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, x,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY x) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM v
    ),
    ng AS (SELECT l_returnflag, MAX(n) AS n FROM r GROUP BY l_returnflag),
    t AS (
      SELECT l_returnflag, 'p50' AS tag, 0.5 * (n - 1) AS h FROM ng
      UNION ALL
      SELECT l_returnflag, 'p95' AS tag, 0.95 * (n - 1) AS h FROM ng
    ),
    sel AS (
      SELECT t.l_returnflag, t.tag, t.h,
             MAX(CASE WHEN r.rn = CAST(FLOOR(t.h) AS BIGINT) THEN r.x END) AS xlo,
             MAX(CASE WHEN r.rn = CAST(CEILING(t.h) AS BIGINT) THEN r.x END) AS xhi
      FROM t JOIN r ON r.l_returnflag = t.l_returnflag
                   AND r.rn >= CAST(FLOOR(t.h) AS BIGINT)
                   AND r.rn <= CAST(CEILING(t.h) AS BIGINT)
      GROUP BY t.l_returnflag, t.tag, t.h
    ),
    f AS (
      SELECT l_returnflag, tag, xlo + (h - FLOOR(h)) * (xhi - xlo) AS val FROM sel
    )
    SELECT l_returnflag,
           MAX(CASE WHEN tag = 'p50' THEN val END) AS price_p50,
           MAX(CASE WHEN tag = 'p95' THEN val END) AS price_p95
    FROM f GROUP BY l_returnflag
    """


@register(
    "percentile_exact",
    oracle=_PCTL_ORACLE,
    doc="EXACT linear-interpolated p50/p95 of lineitem prices per return "
    "flag, with the identical fp expression on both engines (h = "
    "p*(n-1); x_lo + frac*(x_hi - x_lo)) — engine-native percentile()/"
    "quantile_cont() interpolate with algebraically-equal-but-fp-"
    "different formulas and can differ in the last ulp. This is the "
    "ground truth the sampling sketch (approx_percentile_sketch) is "
    "judged against. The oracle keeps the textbook rank-select (a "
    "per-flag window rank over every row); the Spark side does NOT — "
    "only 3 return flags exist, so that window sorts ~N/3 fact rows "
    "per task and heap-OOMed the r10 sf10 sweep once session cache "
    "pressure rose (r9: 82 s, memory-marginal). Since r10 it is "
    "HISTOGRAM rank-select: group to the (flag, price) value domain, "
    "one keyed cumulative over the per-flag distinct-price histogram "
    "(value-domain grain — the AUC/KS discipline), then x@rank k = "
    "MIN x with cum >= k+1 via a 6-row broadcast range probe. "
    "Identical values (a rank range [cum_lower, cum-1] contains k iff "
    "x is the minimal value with cum > k), fact touched by ONE "
    "hash aggregate.",
    tags=("analytics", "approx"),
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    v, cum, ng = _price_cum_hist(spark, sf_dir)
    # h via F.expr so the 0.5/0.95 literals type as DECIMAL exactly as
    # they do in the oracle SQL (both engines parse decimal literals as
    # DECIMAL): h and h - FLOOR(h) stay EXACT, where a double 0.95*(n-1)
    # puts frac off by an ulp and flips the last bit of the
    # interpolation (caught at sf1.0: R/p95 95034.83849999998 vs ...8385)
    t = ng.select(
        "l_returnflag", F.lit("p50").alias("tag"), F.expr("0.5 * (n - 1)").alias("h")
    ).unionByName(
        ng.select(
            "l_returnflag", F.lit("p95").alias("tag"), F.expr("0.95 * (n - 1)").alias("h")
        )
    )

    def x_at(k: Column, out: str) -> DataFrame:
        # x at 0-indexed rank k = the minimal value whose inclusive
        # cumulative count exceeds k (duplicates of x own the rank
        # range [cum - c, cum - 1], so cum >= k + 1 <=> k in-or-after
        # that range, and MIN picks the containing value)
        return (
            F.broadcast(t)
            .join(cum, "l_returnflag")
            .filter(F.col("cum") >= k + 1)
            .groupBy("l_returnflag", "tag", "h")
            .agg(F.min("x").alias(out))
        )

    lo = x_at(F.expr("CAST(FLOOR(h) AS BIGINT)"), "xlo")
    hi = x_at(F.expr("CAST(CEILING(h) AS BIGINT)"), "xhi")
    f = lo.join(hi, ["l_returnflag", "tag", "h"]).select(
        "l_returnflag",
        "tag",
        F.expr("xlo + (h - FLOOR(h)) * (xhi - xlo)").alias("val"),
    )
    return f.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("tag") == "p50", F.col("val"))).alias("price_p50"),
        F.max(F.when(F.col("tag") == "p95", F.col("val"))).alias("price_p95"),
    )


# --- triangle counting / clustering coefficient (degree-oriented) -------------

_TRI_ORACLE = """
    WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    prs AS MATERIALIZED (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    und AS (SELECT pa AS a, pb AS b FROM prs),
    deg AS (
      SELECT v, COUNT(*) AS d
      FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) t
      GROUP BY v
    ),
    ori AS (
      SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b) THEN a ELSE b END AS src,
             CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b) THEN b ELSE a END AS dst
      FROM und JOIN deg da ON da.v = a JOIN deg db ON db.v = b
    ),
    tri AS (
      SELECT e1.src AS u,
             LEAST(e1.dst, e2.dst) AS v,
             GREATEST(e1.dst, e2.dst) AS w
      FROM ori e1
      JOIN ori e2 ON e1.src = e2.src AND e1.dst < e2.dst
      JOIN und ON und.a = LEAST(e1.dst, e2.dst)
              AND und.b = GREATEST(e1.dst, e2.dst)
    ),
    tn AS (
      SELECT u AS v FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w AS v FROM tri
    ),
    tc AS (SELECT v, COUNT(*) AS triangles FROM tn GROUP BY v)
    SELECT d.v AS part_id, CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(tc.triangles, 0) AS BIGINT) AS triangles,
           CAST(CASE WHEN d.d >= 2
                     THEN CAST(2 * COALESCE(tc.triangles, 0) AS DOUBLE)
                          / CAST(d.d * (d.d - 1) AS DOUBLE)
                     ELSE 0.0 END AS DOUBLE) AS clustering_coeff
    FROM deg d LEFT JOIN tc ON tc.v = d.v
    """


@register(
    "graph_triangles",
    oracle=_TRI_ORACLE,
    doc="Per-node triangle counts + local clustering coefficient over the "
    "co-purchase graph — the third graph algorithm (after components and "
    "PageRank), in the DEGREE-ORIENTED form every distributed triangle "
    "counter uses: orient each edge from its lower-(degree, id) endpoint, "
    "enumerate wedges only from edge SOURCES (out-degrees are bounded by "
    "~sqrt(edges) under this orientation, so the wedge join cannot blow "
    "up on hub nodes), and close each wedge with one equi-join back to "
    "the sorted undirected edge list — every triangle found exactly "
    "once, no OR-joins, no cross products. Counts are integers and the "
    "coefficient is one fp division of exact integers, so the whole "
    "result hash-matches DuckDB. Spark side localCheckpoints the bounded "
    "graph relations (pairs, degrees, oriented edges) ONCE each — the "
    "former shared-SQL form re-inlined the basket self-join per CTE "
    "reference (70 lineitem scans, ~244 s at sf10 vs ~40 s after); the "
    "oracle keeps the CTE form with MATERIALIZED op/prs.",
    tags=("analytics", "graph"),
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    prs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("nco"))
        .filter(F.col("nco") >= 2)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .localCheckpoint()  # bounded co-purchase graph; pair-gen runs ONCE
    )
    deg = (
        prs.select(F.col("a").alias("v"))
        .unionAll(prs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
        .localCheckpoint()
    )
    da = deg.select(F.col("v").alias("va"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("vb"), F.col("d").alias("db"))
    lower_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    ori = (
        prs.join(da, F.col("va") == F.col("a"))
        .join(db, F.col("vb") == F.col("b"))
        .select(
            F.when(lower_a, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_a, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
        .localCheckpoint()
    )
    e1 = ori.select(F.col("src"), F.col("dst").alias("d1"))
    e2 = ori.select(F.col("src").alias("src2"), F.col("dst").alias("d2"))
    wedge = e1.join(
        e2, (F.col("src") == F.col("src2")) & (F.col("d1") < F.col("d2"))
    ).select(
        F.col("src").alias("u"),
        F.least(F.col("d1"), F.col("d2")).alias("v"),
        F.greatest(F.col("d1"), F.col("d2")).alias("w"),
    )
    tri = wedge.join(
        prs,
        (F.col("a") == F.col("v")) & (F.col("b") == F.col("w")),
        "left_semi",
    )
    tn = (
        tri.select(F.col("u").alias("v"))
        .unionAll(tri.select("v"))
        .unionAll(tri.select(F.col("w").alias("v")))
    )
    tc = tn.groupBy("v").agg(F.count("*").alias("triangles"))
    return (
        deg.join(tc.withColumnRenamed("v", "tv"), F.col("v") == F.col("tv"), "left")
        .select(
            F.col("v").alias("part_id"),
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("bigint").alias("triangles"),
            F.when(
                F.col("d") >= 2,
                (F.lit(2) * F.coalesce(F.col("triangles"), F.lit(0))).cast("double")
                / (F.col("d") * (F.col("d") - 1)).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .cast("double")
            .alias("clustering_coeff"),
        )
    )


# --- regular-grid resample with linear interpolation --------------------------

def _resample_sql(micros: str, gen: str, inl: str) -> str:
    """6-hour-grid resample of each user's purchase-value series with
    linear interpolation. ``micros`` renders timestamp→exact-int
    microseconds; ``gen`` the engine's timestamp range generator;
    ``inl`` the IGNORE NULLS placement (Spark: after the call; DuckDB:
    inside the parens — see events_forward_fill)."""
    last_val = f"last_value(CASE WHEN is_grid = 0 THEN value END{inl[0]}){inl[1]}"
    last_m = f"last_value(CASE WHEN is_grid = 0 THEN m END{inl[0]}){inl[1]}"
    return f"""
    WITH ev AS (
      SELECT user_id, event_id, ts, value, {micros.format(e='ts')} AS m
      FROM events WHERE event_type = 'purchase'
    ),
    bounds AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1
      FROM ev GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, g AS ts, {micros.format(e='g')} AS m
      FROM ({gen}) t
    ),
    u AS (
      SELECT user_id, ts, m, CAST(NULL AS DOUBLE) AS value,
             CAST(1 AS BIGINT) AS is_grid, CAST(-1 AS BIGINT) AS ord_id
      FROM grid
      UNION ALL
      SELECT user_id, ts, m, value, CAST(0 AS BIGINT) AS is_grid,
             event_id AS ord_id
      FROM ev
    ),
    fwd AS (
      SELECT *,
        {last_val} OVER (PARTITION BY user_id ORDER BY m ASC, is_grid ASC, ord_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        {last_m}   OVER (PARTITION BY user_id ORDER BY m ASC, is_grid ASC, ord_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm
      FROM u
    ),
    both_dirs AS (
      SELECT *,
        {last_val} OVER (PARTITION BY user_id ORDER BY m DESC, is_grid ASC, ord_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv,
        {last_m}   OVER (PARTITION BY user_id ORDER BY m DESC, is_grid ASC, ord_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nm
      FROM fwd
    )
    SELECT user_id, ts AS grid_ts,
      CAST(CASE
        WHEN pm IS NULL THEN nv
        WHEN nm IS NULL THEN pv
        WHEN nm = pm THEN pv
        ELSE pv + (nv - pv) * (CAST(m - pm AS DOUBLE) / CAST(nm - pm AS DOUBLE))
      END AS DOUBLE) AS value_interp
    FROM both_dirs WHERE is_grid = 1
    """


_SPARK_GEN = (
    "SELECT user_id, explode(sequence(t0, t1, INTERVAL 6 HOUR)) AS g FROM bounds"
)
_DUCK_GEN = (
    "SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS g FROM bounds"
)

_sql_query(
    "events_resample_linear",
    _resample_sql("unix_micros({e})", _SPARK_GEN, ("", " IGNORE NULLS")),
    oracle=_resample_sql("epoch_us({e})", _DUCK_GEN, (" IGNORE NULLS", "")),
    doc="Regular-grid resampling: each user's purchase-value series "
    "sampled onto a 6-hour grid with LINEAR INTERPOLATION between the "
    "surrounding events (hold at the edges) — the gap-fill primitive "
    "that turns irregular event streams into the fixed-step series "
    "feature stores and forecasting models consume. Grid points and "
    "events union into one relation; one ascending and one descending "
    "IGNORE-NULLS window per user recover the bracketing events "
    "(sort key (micros, is_grid, event_id) is total, so both passes "
    "are deterministic), and the interpolation arithmetic runs on "
    "exact integer microseconds — cross-engine identical. Two windows "
    "per user partition, no joins against the raw stream.",
    tags=("analytics", "window", "timeseries"),
)


# --- association rules over co-purchased parts --------------------------------

_sql_query(
    "assoc_rules_parts",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM op),
    item AS (SELECT l_partkey AS item, COUNT(*) AS n_item FROM op GROUP BY 1),
    pair AS (
      SELECT a.l_partkey AS ante, b.l_partkey AS cons, COUNT(*) AS n_pair
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT p.ante, p.cons,
      CAST(p.n_pair AS BIGINT) AS n_pair,
      CAST(p.n_pair AS DOUBLE) / nb.n_baskets AS support,
      CAST(p.n_pair AS DOUBLE) / ia.n_item AS confidence,
      (CAST(p.n_pair AS DOUBLE) / ia.n_item)
        / (CAST(ic.n_item AS DOUBLE) / nb.n_baskets) AS lift
    FROM pair p
    JOIN item ia ON ia.item = p.ante
    JOIN item ic ON ic.item = p.cons
    CROSS JOIN nb
    """,
    doc="Association rules ante=>cons over order baskets: support, "
    "confidence = P(cons|ante), and lift = confidence / P(cons) for "
    "every DIRECTED part pair co-occurring in >= 2 orders — the rule "
    "mining step on top of graph_copurchase_edges' undirected counts. "
    "The basket self-join is keyed on l_orderkey (per-basket fanout "
    "only); item counts broadcast back onto the pair table; every "
    "measure is a ratio of exact integers, so fp64 results hash-match. "
    "At 100 TB the HAVING prunes the singleton tail inside the "
    "aggregate, and the two item-side joins are broadcast-sized.",
    tags=("analytics", "graph"),
)


def _pagerank_weighted_oracle() -> str:
    """Unrolled WEIGHTED PageRank: shares proportional to co-purchase
    strength, ``(pr * w) // W_u`` — integer arithmetic throughout."""
    parts = [
        """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    prs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    edges AS (SELECT pa AS src, pb AS dst, w FROM prs
              UNION ALL SELECT pb AS src, pa AS dst, w FROM prs),
    deg AS (SELECT src AS part, CAST(COUNT(*) AS BIGINT) AS outdeg,
                   CAST(SUM(w) AS BIGINT) AS outw
            FROM edges GROUP BY src),"""
        + f"""
    pr0 AS (SELECT part, CAST({_PR_SCALE} AS BIGINT) AS pr FROM deg)"""
    ]
    for t in range(1, _PR_ITERS + 1):
        parts.append(f"""in{t} AS (
      SELECT e.dst AS part, SUM((p.pr * e.w) // d.outw) AS s
      FROM edges e JOIN pr{t - 1} p ON p.part = e.src
                   JOIN deg d ON d.part = e.src
      GROUP BY e.dst
    ),
    pr{t} AS (
      SELECT d.part,
             CAST({_PR_BASE} + (85 * COALESCE(i.s, 0)) // 100 AS BIGINT) AS pr
      FROM deg d LEFT JOIN in{t} i USING (part)
    )""")
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT d.part AS part_id, d.outdeg,
           CAST(p.pr AS DOUBLE) / {_PR_SCALE}.0 AS pagerank
    FROM deg d JOIN pr{_PR_ITERS} p USING (part)
    """


@register(
    "graph_pagerank_weighted",
    oracle=_pagerank_weighted_oracle(),
    doc="WEIGHTED PageRank: random-walk transition probabilities "
    "proportional to co-purchase strength (n_orders) instead of "
    "uniform — the variant recommenders actually run, since a pair "
    "co-bought 10x should pull more rank than a pair co-bought twice. "
    "Shares become (pr * w) div W_u, still pure BIGINT arithmetic, so "
    "the iterative weighted walk stays bit-exact against the unrolled "
    "DuckDB twin. Same persisted-graph Pregel plan as graph_pagerank.",
    tags=("analytics", "graph", "iterative"),
)
def graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_fp
    from ..sources.catalog import load_table

    tune(spark)
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    prs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").cast("long").alias("w"))
        .filter(F.col("w") >= 2)
        # same bounded-pair checkpoint as graph_pagerank
        .localCheckpoint()
    )
    edges = prs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"), "w"
    ).unionAll(prs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), "w"))
    ranked = pagerank_fp(
        edges, iterations=_PR_ITERS, scale=_PR_SCALE, weight_col="w"
    )
    return ranked.select(
        F.col("part").alias("part_id"),
        "outdeg",
        (F.col("pr").cast("double") / F.lit(float(_PR_SCALE))).alias("pagerank"),
    )


# --- event-type Markov transition matrix --------------------------------------

_sql_query(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    cnt AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (SELECT from_type, SUM(n) AS n_from FROM cnt GROUP BY 1)
    SELECT c.from_type, c.to_type, c.n,
           CAST(c.n AS DOUBLE) / t.n_from AS p
    FROM cnt c JOIN tot t USING (from_type)
    """,
    doc="First-order Markov transition matrix over each user's "
    "time-ordered event stream: P(next event type | current) — the "
    "behavioral model behind next-action prediction and funnel anomaly "
    "detection. One lead() window per user (total order (ts, event_id) "
    "— deterministic under ties), one count aggregate, probabilities "
    "as ratios of exact integers. At 100 TB the window shuffle on "
    "user_id is the only data movement; the matrix itself is "
    "|event_types|^2 rows.",
    tags=("analytics", "window"),
)

# --- Gini coefficient of customer spend (exact integer arithmetic) ------------

_sql_query(
    "spend_gini",
    """
    WITH s AS (
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS i,
             COUNT(*) OVER () AS n
      FROM s
    ),
    agg AS (
      SELECT MAX(n) AS n,
             SUM(cents) AS total,
             SUM(CAST(2 * i - n - 1 AS DECIMAL(38,0)) * cents) AS wsum
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(total AS DOUBLE) / 100 AS total_spend,
           CAST(wsum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) AS gini
    FROM agg
    """,
    doc="Gini coefficient of per-customer spend — the standard "
    "concentration metric (0 = uniform, →1 = one whale) computed by "
    "the sorted-rank identity G = Σ(2i−n−1)·x_i / (n·Σx): spend goes "
    "through DECIMAL cents (exact BIGINT), ranks come from one global "
    "sort of the per-customer aggregate (small — customers, not "
    "orders), and the weighted sum accumulates in DECIMAL(38,0) — "
    "still exact integer arithmetic, but with 38-digit headroom: the "
    "BIGINT form overflows near n*max_cents ~ 2^63 (hit at the sf10 "
    "sweep's 1.5M customers) while n^2*max_cents stays under 38 "
    "digits past 1e12 customers — so the coefficient hash-matches "
    "DuckDB bit-for-bit. The data-mixture "
    "analogue (token share per source) is the dataset-card metric "
    "curation teams watch.",
    tags=("analytics",),
)


# --- marketing attribution: first/last click before each purchase -------------

_WEEK_US = 7 * 86400 * 1_000_000


def _attribution_sql(micros: str) -> str:
    return f"""
    WITH e AS (
      SELECT event_id, user_id, ts, event_type, {micros.format(e='ts')} AS m
      FROM events
    ),
    w AS (
      SELECT *,
        MIN(CASE WHEN event_type = 'click' THEN m END) OVER (
          PARTITION BY user_id ORDER BY m
          RANGE BETWEEN {_WEEK_US} PRECEDING AND CURRENT ROW) AS first_click_m,
        MAX(CASE WHEN event_type = 'click' THEN m END) OVER (
          PARTITION BY user_id ORDER BY m
          RANGE BETWEEN {_WEEK_US} PRECEDING AND CURRENT ROW) AS last_click_m,
        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
          PARTITION BY user_id ORDER BY m
          RANGE BETWEEN {_WEEK_US} PRECEDING AND CURRENT ROW) AS n_clicks_7d
      FROM e
    ),
    ck AS (
      SELECT user_id, m, MIN(event_id) AS click_id
      FROM e WHERE event_type = 'click' GROUP BY user_id, m
    )
    SELECT w.event_id, w.user_id, w.ts,
           CAST(w.n_clicks_7d AS BIGINT) AS n_clicks_7d,
           f.click_id AS first_touch_id,
           l.click_id AS last_touch_id
    FROM w
    LEFT JOIN ck f ON f.user_id = w.user_id AND f.m = w.first_click_m
    LEFT JOIN ck l ON l.user_id = w.user_id AND l.m = w.last_click_m
    WHERE w.event_type = 'purchase'
    """


_sql_query(
    "events_purchase_attribution",
    _attribution_sql("unix_micros({e})"),
    oracle=_attribution_sql("epoch_us({e})"),
    doc="First-touch / last-touch attribution: every purchase annotated "
    "with the user's earliest and latest click in the preceding 7 days "
    "plus the click count — the two canonical attribution models in "
    "one pass. The 7-day lookback is a value-based RANGE frame over "
    "exact integer microseconds (one keyed window per user, no "
    "self-join against the raw stream); the frame extremes come back "
    "as timestamps and resolve to event ids via a tiny per-(user, "
    "instant) click table with a deterministic min-id tie rule.",
    tags=("analytics", "window"),
)


# --- robust outliers: median absolute deviation (Iglewicz-Hoaglin) ------------

def _median_sql(src: str, val: str, out: str) -> str:
    """Rank-select interpolated median of ``{src}.{val}`` per
    l_returnflag — the dialect-shared fp recipe proven by
    percentile_exact (h = 0.5*(n-1); x_lo + frac*(x_hi - x_lo))."""
    return f"""{out}_r AS (
      SELECT l_returnflag, {val} AS x,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY {val}) - 1 AS rn,
             0.5 * (COUNT(*) OVER (PARTITION BY l_returnflag) - 1) AS h
      FROM {src}
    ),
    {out} AS (
      SELECT l_returnflag,
             MAX(CASE WHEN rn = CAST(FLOOR(h) AS BIGINT) THEN x END)
             + (MAX(h) - FLOOR(MAX(h))) *
               (MAX(CASE WHEN rn = CAST(CEILING(h) AS BIGINT) THEN x END)
                - MAX(CASE WHEN rn = CAST(FLOOR(h) AS BIGINT) THEN x END)) AS med
      FROM {out}_r
      WHERE rn >= CAST(FLOOR(h) AS BIGINT) AND rn <= CAST(CEILING(h) AS BIGINT)
      GROUP BY l_returnflag
    )"""


_MAD_ORACLE = f"""
    WITH v AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
    ),
    {_median_sql('v', 'x', 'med1')},
    dev AS (
      SELECT v.l_returnflag, ABS(v.x - med1.med) AS x, v.x AS orig, med1.med
      FROM v JOIN med1 USING (l_returnflag)
    ),
    {_median_sql('dev', 'x', 'med2')}
    SELECT d.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(d.med) AS median_price,
           MAX(med2.med) AS mad,
           CAST(SUM(CASE WHEN CAST(0.6745 AS DOUBLE) * (d.orig - d.med) / med2.med > 3.5
                          OR CAST(0.6745 AS DOUBLE) * (d.orig - d.med) / med2.med < -3.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN med2 USING (l_returnflag)
    GROUP BY d.l_returnflag
    """


def _interp_median_from_hist(grouped: DataFrame, ng: DataFrame, out: str) -> DataFrame:
    """Interpolated per-flag median from a ``(l_returnflag, x)`` relation
    via the distinct-value histogram cumulative (the percentile_exact
    recipe): h = 0.5*(n-1) as exact DECIMAL, x@0-based-rank k = MIN x
    with inclusive cum >= k+1, median = xlo + (h-FLOOR(h))*(xhi-xlo).
    No task ever sorts more than the per-flag distinct-value domain.
    The cumulative is persisted (the lo and hi probes share one build)
    and the 3-row result is localCheckpoint'ed (its consumers join it
    broadcast — they must not re-derive the whole median pipeline per
    reference)."""
    hist = grouped.groupBy("l_returnflag", "x").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.asc("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = track_persist(hist.withColumn("cum", F.sum("c").over(wcum)).persist())
    t = ng.select("l_returnflag", F.expr("0.5 * (n - 1)").alias("h"))

    def x_at(kexpr: str, col: str) -> DataFrame:
        return (
            F.broadcast(t)
            .join(cum, "l_returnflag")
            .filter(F.col("cum") >= F.expr(kexpr) + 1)
            .groupBy("l_returnflag", "h")
            .agg(F.min("x").alias(col))
        )

    lo = x_at("CAST(FLOOR(h) AS BIGINT)", "xlo")
    hi = x_at("CAST(CEILING(h) AS BIGINT)", "xhi")
    med = lo.join(hi, ["l_returnflag", "h"]).select(
        "l_returnflag",
        F.expr("xlo + (h - FLOOR(h)) * (xhi - xlo)").alias(out),
    )
    return med.localCheckpoint()  # bounded: one row per return flag


@register(
    "robust_outliers_mad",
    oracle=_MAD_ORACLE,
    doc="Robust outlier detection per return flag: modified z-score "
    "0.6745*(x - median)/MAD with the |z| > 3.5 rule (Iglewicz & "
    "Hoaglin) — the data-cleaning screen that, unlike the mean/std "
    "z-score, one fat-tailed value cannot poison. Two interpolated "
    "medians feed a single flagged-count aggregate; every intermediate "
    "is deterministic (identical fp expressions both engines), so even "
    "the outlier COUNTS hash-match. The oracle keeps the textbook "
    "rank-select windows; the Spark side (since r10) takes both "
    "medians from distinct-value HISTOGRAM cumulatives — the price "
    "domain first, then the |x - median| deviation domain — so no "
    "task ever sorts fact rows (the old plan sorted ~N/3 rows per "
    "flag TWICE; same fix class as percentile_exact, which heap-OOMed "
    "the r10 sf10 sweep at 24g).",
    tags=("analytics", "approx"),
)
def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    v, _, ng = _price_cum_hist(spark, sf_dir)
    med1 = _interp_median_from_hist(v, ng, "med")
    dev = v.join(F.broadcast(med1), "l_returnflag").select(
        "l_returnflag",
        F.expr("ABS(x - med)").alias("x"),
        F.col("x").alias("orig"),
        "med",
    )
    med2 = _interp_median_from_hist(
        dev.select("l_returnflag", "x"), ng, "mad"
    )
    return (
        dev.join(F.broadcast(med2), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
            F.max("med").alias("median_price"),
            F.max("mad").alias("mad"),
            F.expr(
                "CAST(SUM(CASE WHEN CAST(0.6745 AS DOUBLE) * (orig - med) / mad > 3.5 "
                "OR CAST(0.6745 AS DOUBLE) * (orig - med) / mad < -3.5 "
                "THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_outliers"),
        )
    )


# --- winsorization: per-group percentile clipping (round-6 breadth) -----------

_WINSOR_ORACLE = """
    WITH v AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, x,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY x) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM v
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


def _price_cum_hist(spark: SparkSession, sf_dir: str):
    """Shared by the histogram rank-select family (percentile_exact,
    feature_winsorize_prices, robust_outliers_mad): lineitem prices as
    the per-flag (x, count, inclusive-cum) DISTINCT-VALUE histogram plus
    the per-flag total. Value-domain grain — the keyed cumulative sorts
    |distinct prices| rows per flag, never the fact. ``cum`` is
    persisted (domain-sized, CacheManager-deduped across the family's
    rank probes — lo and hi each reference it); ``ng`` (3 rows) is
    localCheckpoint'ed so every downstream reference reads 3 local rows
    instead of re-scanning the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select("l_returnflag", F.col("l_extendedprice").cast("double").alias("x"))
    hist = v.groupBy("l_returnflag", "x").agg(F.count("*").cast("bigint").alias("c"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.asc("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = track_persist(hist.withColumn("cum", F.sum("c").over(wcum)).persist())
    ng = (
        v.groupBy("l_returnflag")
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint()  # bounded: one row per return flag
    )
    return v, cum, ng


@register(
    "feature_winsorize_prices",
    oracle=_WINSOR_ORACLE,
    doc="Per-group winsorization (outlier clipping) of lineitem prices at "
    "the NEAREST-RANK p05/p95 — the feature-scaling step a training "
    "pipeline runs on heavy-tailed numerics before normalization. "
    "Nearest-rank (not interpolated) bounds are actual data values, so "
    "the clipped column stays on the fixture's 2-decimal grid and the "
    "mean goes through an exact DECIMAL sum — every output bit "
    "reproduces in DuckDB. Counts of clipped rows per side make the "
    "query double as a tail-mass monitor. The oracle keeps the textbook "
    "per-group window rank; the Spark side (since r10) selects the "
    "bounds from the per-flag distinct-price HISTOGRAM cumulative — "
    "x at 1-based rank k = MIN x with cum >= k — so no task ever sorts "
    "fact rows (the old plan sorted ~N/3 rows per flag; same fix class "
    "as percentile_exact, which heap-OOMed the r10 sf10 sweep).",
    tags=("analytics", "pipeline"),
)
def feature_winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    v, cum, ng = _price_cum_hist(spark, sf_dir)

    def bound(kexpr: str, out: str) -> DataFrame:
        # x at 1-based rank k = minimal value whose inclusive cum >= k
        # (duplicates own the 1-based rank range [cum-c+1, cum])
        k = F.expr(kexpr)
        return (
            F.broadcast(ng)
            .join(cum, "l_returnflag")
            .filter(F.col("cum") >= k)
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


# --- rolling z-score anomaly screen (round 6) ---------------------------------

_sql_query(
    "events_anomaly_rolling_z",
    """
    WITH w AS (
      SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS value,
             COUNT(*) OVER win AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER win AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER win AS DOUBLE) AS sq
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    ),
    z AS (
      SELECT user_id, event_id, ts, value, n,
             s / n AS roll_mean,
             SQRT((sq - s * s / n) / (n - 1)) AS roll_std
      FROM w WHERE n >= 8
    )
    SELECT user_id, event_id, ts, value, roll_mean, roll_std,
           (value - roll_mean) / roll_std AS zscore
    FROM z
    WHERE roll_std > 0 AND ABS((value - roll_mean) / roll_std) > 3.0
    """,
    doc="Rolling z-score anomaly screen over per-user event values: each "
    "event scored against the mean/std of its own PREVIOUS <= 20 events "
    "(trailing ROWS frame excludes the current row, so an outlier never "
    "masks itself), flagged at |z| > 3 with >= 8 priors. The running "
    "moments come from DECIMAL sums of the 2-decimal values (value^2 is "
    "exactly 4-decimal), so the mean/std/z doubles are bit-identical "
    "cross-engine despite the windowed fp arithmetic — the same "
    "exactness trick as feature_zscore_chars, per-row and windowed. One "
    "hash exchange on user_id; the classic streaming-observability "
    "anomaly monitor in batch form.",
    tags=("analytics", "window", "monitor"),
)


# --- EWMA smoothing (trailing-20 exponential moving average) -------------------

_sql_query(
    "events_ewma",
    """
    WITH w AS (
      SELECT event_id, user_id, ts, value,
        collect_list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS win
      FROM events
    )
    SELECT event_id, user_id, ts, value,
      aggregate(slice(win, 2, size(win)-1), element_at(win, 1),
                (acc, x) -> CAST(0.75 AS DOUBLE) * acc + CAST(0.25 AS DOUBLE) * x)
        AS ewma20
    FROM w
    """,
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, value,
        list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS win
      FROM events
    )
    SELECT event_id, user_id, ts, value,
      list_reduce(win, (acc, x) -> 0.75 * acc + 0.25 * x) AS ewma20
    FROM w
    """,
    doc="Exponentially-weighted moving average (alpha=0.25) over each "
    "user's event stream, trailing-20 frame: the smoothing recursion "
    "acc = (1-a)*acc + a*x runs as a fold over the ordered window list "
    "(Spark aggregate HOF / DuckDB list_reduce, first element as "
    "init), so the fp operations happen in one fixed chronological "
    "order — bit-identical across engines AND across partitionings, "
    "which a naive sum-of-weighted-terms formulation cannot "
    "guarantee. One shuffle on user_id; the bounded frame keeps state "
    "O(20) per row. The recursive form also avoids the numeric "
    "blow-up of the closed-form (1-a)^-i prefix trick.",
    tags=("analytics", "timeseries"),
)

# --- PSI drift monitor ---------------------------------------------------------

_sql_query(
    "monitor_psi_price_drift",
    """
    WITH b AS (
      SELECT LEAST(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
        CAST(SUM(CASE WHEN o_orderdate <  TIMESTAMP '1998-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM orders GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS t_a, CAST(SUM(n_b) AS BIGINT) AS t_b,
                 CAST(COUNT(*) AS BIGINT) AS k FROM b)
    SELECT bucket, n_a, n_b,
      CAST(round(
        ((CAST(n_a + 1 AS DOUBLE) / CAST(t_a + k AS DOUBLE))
         - (CAST(n_b + 1 AS DOUBLE) / CAST(t_b + k AS DOUBLE)))
        * ln((CAST(n_a + 1 AS DOUBLE) / CAST(t_a + k AS DOUBLE))
             / (CAST(n_b + 1 AS DOUBLE) / CAST(t_b + k AS DOUBLE)))
        * 1000000000) AS BIGINT) AS psi_contrib_nano
    FROM b CROSS JOIN t
    """,
    doc="Population-stability-index drift monitor between two order "
    "periods over fixed price buckets — the standard 'did the "
    "distribution shift' gate a feature pipeline runs before "
    "retraining. Laplace +1 smoothing keeps empty buckets finite; "
    "each bucket's PSI contribution is quantized to integer "
    "nano-units so the total (sum of BIGINTs) is associative — the "
    "usual fixed-point trick for the one transcendental (ln). One "
    "aggregate over the fact, a 10-row broadcast total; PSI >= 0.2 "
    "on any bucket sum is the conventional re-train trigger.",
    tags=("analytics", "monitor"),
)

# --- RFM customer segmentation --------------------------------------------------

_sql_query(
    "orders_rfm_segments",
    """
    WITH m AS (
      SELECT o_custkey,
        CAST(max(o_orderdate) AS TIMESTAMP) AS last_order,
        CAST(COUNT(*) AS BIGINT) AS frequency,
        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
      CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS BIGINT) AS r_bin,
      CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_bin,
      CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, o_custkey) AS BIGINT) AS m_bin,
      frequency, monetary_cents
    FROM m
    """,
    doc="RFM (recency / frequency / monetary) customer segmentation: "
    "one aggregate collapses the fact to customer grain, then ntile(4) "
    "quartile bins per dimension with full tiebreaks (metric, "
    "custkey) so bin edges are deterministic. The global ntile sorts "
    "only the CUSTOMER-grain relation (dimension-sized, not "
    "fact-sized); at 1e9+ customers the bins would come from "
    "broadcast approximate quantile bounds instead — the "
    "length_buckets_approx pattern, one map-side CASE per row, no "
    "sort. Money is exact integer cents.",
    tags=("analytics",),
)


# --- z-order (Morton) clustering cells -------------------------------------------

def _zval_duck() -> str:
    px = "LEAST(CAST(floor(o_totalprice / 2000) AS BIGINT), 255)"
    dx = "LEAST(CAST(floor(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) / 10) AS BIGINT), 255)"
    bits = " + ".join(
        f"(((({px}) >> {i}) & 1) << {2 * i + 1}) + (((({dx}) >> {i}) & 1) << {2 * i})"
        for i in range(8)
    )
    return f"({bits})"


def _zval_spark() -> str:
    px = "LEAST(CAST(floor(o_totalprice / 2000) AS BIGINT), 255)"
    dx = "LEAST(CAST(floor(datediff(o_orderdate, CAST('1995-01-01 00:00:00' AS TIMESTAMP)) / 10) AS BIGINT), 255)"
    bits = " + ".join(
        f"shiftleft(shiftright({px}, {i}) & 1, {2 * i + 1}) + shiftleft(shiftright({dx}, {i}) & 1, {2 * i})"
        for i in range(8)
    )
    return f"({bits})"


_sql_query(
    "zorder_orders_cells",
    f"""
    WITH z AS (SELECT {_zval_spark()} AS zval,
      LEAST(CAST(floor(o_totalprice / 2000) AS BIGINT), 255) AS px,
      LEAST(CAST(floor(datediff(o_orderdate, CAST('1995-01-01 00:00:00' AS TIMESTAMP)) / 10) AS BIGINT), 255) AS dx
      FROM orders)
    SELECT CAST(zval DIV 4096 AS BIGINT) AS zcell, CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(px) AS BIGINT) AS min_px, CAST(MAX(px) AS BIGINT) AS max_px,
      CAST(MIN(dx) AS BIGINT) AS min_dx, CAST(MAX(dx) AS BIGINT) AS max_dx
    FROM z GROUP BY 1
    """,
    oracle=f"""
    WITH z AS (SELECT {_zval_duck()} AS zval,
      LEAST(CAST(floor(o_totalprice / 2000) AS BIGINT), 255) AS px,
      LEAST(CAST(floor(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) / 10) AS BIGINT), 255) AS dx
      FROM orders)
    SELECT CAST(zval // 4096 AS BIGINT) AS zcell, CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(px) AS BIGINT) AS min_px, CAST(MAX(px) AS BIGINT) AS max_px,
      CAST(MIN(dx) AS BIGINT) AS min_dx, CAST(MAX(dx) AS BIGINT) AS max_dx
    FROM z GROUP BY 1
    """,
    doc="Z-order (Morton) clustering cells over (price, order-date): "
    "interleave 8+8 quantized bits per row (pure map-side integer "
    "shifts), then show per-cell min/max of BOTH dimensions — each "
    "z-cell is a tight rectangle in (price x time), which is exactly "
    "why writing data sorted by zval makes file-level min/max "
    "statistics prune multi-dimensional range predicates (the Delta "
    "OPTIMIZE ZORDER / Iceberg sort-order mechanism). The engine-side "
    "operator is the zval expression — at 100 TB it feeds "
    "repartitionByRange(zval) before the write; this query is its "
    "locality proof, one aggregate over 16 cells.",
    tags=("analytics", "layout"),
)


# --- CUSUM changepoint screen (round-7 tail) -----------------------------------

_sql_query(
    "events_cusum_changepoint",
    """
    WITH v AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS sq
      FROM v
    ),
    k AS (
      SELECT CAST(floor(CAST(s AS DOUBLE) / n
                        + 0.5 * SQRT((CAST(sq AS DOUBLE)
                                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                                     / (n - 1))) AS BIGINT) AS tgt,
             CAST(floor(5.0 * SQRT((CAST(sq AS DOUBLE)
                                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                                   / (n - 1))) AS BIGINT) AS h
      FROM g
    ),
    p AS (
      SELECT v.user_id, v.event_id, v.ts, k.h,
             SUM(v.cents - k.tgt) OVER (PARTITION BY v.user_id ORDER BY v.ts, v.event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS psum
      FROM v CROSS JOIN k
    ),
    s AS (
      SELECT user_id, event_id, ts, h,
             psum - LEAST(MIN(psum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                          0) AS cusum_cents
      FROM p
    )
    SELECT user_id, event_id, ts, CAST(cusum_cents AS BIGINT) AS cusum_cents
    FROM s WHERE cusum_cents > h
    """,
    doc="One-sided CUSUM changepoint screen (Page 1954) over each user's "
    "event-value stream: S_t = max(0, S_{t-1} + (x_t - target)) flags "
    "sustained upward shifts, SELF-CALIBRATED from the data — target = "
    "mean + 0.5*sigma (the classic k = delta/2 allowance), decision "
    "threshold h = 5*sigma, both computed from one exact-BIGINT moment "
    "pass and FLOORED to integer cents so the per-user prefix sums "
    "stay exact integers (the fixed-constant form saturated on a "
    "fixture whose value scale differed 5x). The recursion is "
    "rewritten in closed form S_t = P_t - min(0, min_{j<=t} P_j) — "
    "prefix sum minus running minimum — so the sequential CUSUM "
    "becomes two chained window passes over the SAME (user_id; ts, "
    "event_id) ordering: one data shuffle plus a broadcast of the "
    "2-value calibration row, no fold, no UDF, every output bit "
    "reproducing cross-engine. This is the standard drift-to-windows "
    "rewrite that makes streaming-style changepoint detection scale "
    "on a batch engine (cents^2 moments are exact to ~1e12 rows; "
    "beyond that the calibration quantum drops to whole units).",
    tags=("analytics", "timeseries", "monitor"),
)


# --- autocorrelation of the daily revenue series (round-7 tail) ----------------

_sql_query(
    "events_acf_daily",
    f"""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    p AS (
      SELECT CAST(l.lag AS BIGINT) AS lag, a.rev AS x, b.rev AS y
      FROM d a
      CROSS JOIN (VALUES (1), (2), (3), (7)) AS l(lag)
      JOIN d b ON b.day = a.day - INTERVAL 1 DAY * l.lag
    ),
    c AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
      FROM p GROUP BY lag
    )
    SELECT lag, n AS n_pairs,
           CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS DOUBLE) AS acf
    FROM c
    """,
    doc="Autocorrelation (Pearson, lags 1/2/3/7) of the daily purchase-"
    "revenue series — the seasonality probe run before choosing a "
    "forecast model; the weekly lag-7 coefficient is the one that "
    "matters. The fact collapses to day grain FIRST (exact integer "
    "cents), so the lag self-join touches only the day-sized relation "
    "(calendar-bounded: 365 rows/year no matter the fact size), "
    "aligned by day - INTERVAL*lag so calendar gaps never mis-pair; "
    "the lag inline table cross-joins BEFORE the self-join so the "
    "day relation is referenced exactly twice (Spark inlines CTEs — "
    "a per-lag UNION ALL would rescan the fact 2x per lag). The "
    "correlation is assembled from exact BIGINT co-moments with one "
    "fp expression at the end — deterministic cross-engine (exact "
    "integer sums are safe to ~sf50 in cents^2; beyond that the cents "
    "quantum drops to whole units).",
    tags=("analytics", "timeseries"),
)


# --- ROC-AUC via the Mann-Whitney histogram identity (round-7 tail) ------------

_sql_query(
    "eval_auc_doclang",
    """
    WITH s AS (
      SELECT doc_id, n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS np
      FROM s GROUP BY score
    ),
    c AS (
      SELECT score, n, np,
             COALESCE(SUM(n) OVER (ORDER BY score
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_lower
      FROM h
    ),
    a AS (
      SELECT CAST(SUM(np * (2 * (cum_lower + 1) + n - 1)) AS BIGINT) AS sum_ranks2,
             CAST(SUM(np) AS BIGINT) AS n_pos,
             CAST(SUM(n) - SUM(np) AS BIGINT) AS n_neg
      FROM c
    )
    SELECT n_pos, n_neg,
           CAST((CAST(sum_ranks2 AS DOUBLE)
                 - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0))
                / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
             AS DOUBLE) AS auc
    FROM a
    """,
    doc="ROC-AUC of a score column against a binary label (does document "
    "length separate English docs?) via the Mann-Whitney rank identity, "
    "computed in HISTOGRAM form: rows collapse to per-score (n, "
    "n_positive) counts first, ranks come from a prefix sum over the "
    "score DOMAIN (bounded: distinct lengths), and tie handling is the "
    "exact average-rank correction kept in doubled-integer units "
    "(2*avg_rank is always an integer), so everything up to the final "
    "division is exact BIGINT — bit-stable cross-engine. This is how "
    "AUC scales: the naive global rank() sorts the full fact, the "
    "histogram form sorts only the score domain — the classifier-eval "
    "step a curation pipeline runs on quality/langid model scores.",
    tags=("analytics", "eval"),
)


# --- pairwise feature correlation matrix (round-7 tail) ------------------------

def _corr_unpivot_sql() -> str:
    """Unpivot the single co-moment row into 6 pair rows WITHOUT
    re-referencing ``m`` per pair (Spark inlines CTEs, so a per-pair
    UNION ALL would rescan the fact 6x): one CROSS JOIN against a
    6-row pair-descriptor inline table, sums picked by CASE."""
    names = {"q": "quantity", "p": "price_usd", "d": "discount_pct", "t": "tax_pct"}
    combos = [("q", "p"), ("q", "d"), ("q", "t"), ("p", "d"), ("p", "t"), ("d", "t")]
    vals = ",\n             ".join(
        f"('{names[a]}', '{a}', '{names[b]}', '{b}')" for a, b in combos
    )
    sums = {"q": "sq", "p": "sp", "d": "sd", "t": "st"}
    sqs = {"q": "sqq", "p": "spp", "d": "sdd", "t": "stt"}

    def pick(col: str, mapping: dict[str, str]) -> str:
        return ("CASE " + " ".join(f"WHEN pr.{col} = '{k}' THEN {v}"
                                   for k, v in mapping.items()) + " END")

    sxy = ("CASE " + " ".join(
        f"WHEN pr.cx = '{a}' AND pr.cy = '{b}' THEN s{min(a, b)}{max(a, b)}"
        for a, b in combos) + " END")
    return f"""      SELECT pr.var_x, pr.var_y, m.n,
             {pick('cx', sums)} AS sx,
             {pick('cy', sums)} AS sy,
             {sxy} AS sxy,
             {pick('cx', sqs)} AS sxx,
             {pick('cy', sqs)} AS syy
      FROM m CROSS JOIN (VALUES {vals}) AS pr(var_x, cx, var_y, cy)"""


_sql_query(
    "feature_corr_matrix",
    f"""
    WITH v AS (
      SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
             CAST(floor(l_extendedprice) AS BIGINT) AS p,
             CAST(round(l_discount * 100) AS BIGINT) AS d,
             CAST(round(l_tax * 100) AS BIGINT) AS t
      FROM lineitem
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(p) AS BIGINT) AS sp,
             CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(q * q) AS BIGINT) AS sqq, CAST(SUM(p * p) AS BIGINT) AS spp,
             CAST(SUM(d * d) AS BIGINT) AS sdd, CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(p * q) AS BIGINT) AS spq, CAST(SUM(d * q) AS BIGINT) AS sdq,
             CAST(SUM(q * t) AS BIGINT) AS sqt, CAST(SUM(d * p) AS BIGINT) AS sdp,
             CAST(SUM(p * t) AS BIGINT) AS spt, CAST(SUM(d * t) AS BIGINT) AS sdt
      FROM v
    ),
    pairs AS (
{_corr_unpivot_sql()}
    )
    SELECT var_x, var_y, n AS n_rows,
           CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS DOUBLE) AS corr
    FROM pairs
    """,
    doc="Pairwise Pearson correlation matrix over the four lineitem "
    "numerics (quantity, price, discount, tax) — the feature-EDA pass "
    "before modeling. ALL 14 co-moments come from ONE single-row "
    "aggregate over the fact (map-side partials, no shuffle of rows, "
    "no per-pair rescan — compare F.corr called 6 times = 6 scans); "
    "the 6 pair rows then unpivot from that single row via one CROSS "
    "JOIN against a pair-descriptor inline table (plan-asserted single "
    "fact scan). Values are "
    "quantized to exact integer grids first (whole currency units, "
    "percent points) so every co-moment is an exact BIGINT — "
    "bit-stable cross-engine and safe to ~sf100 before the price "
    "square sum nears the 2^63 bound; the only fp arithmetic is the "
    "final 6 scalar corr expressions.",
    tags=("analytics", "eval"),
)


# --- categorical mutual information (round-7 tail) -----------------------------

_sql_query(
    "feature_mi_lang_source",
    """
    WITH c AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM documents GROUP BY lang, source
    ),
    mx AS (SELECT lang, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM c GROUP BY lang),
    my AS (SELECT source, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM c GROUP BY source),
    t AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM c)
    SELECT c.lang, c.source, c.n_xy,
           CAST(round((CAST(c.n_xy AS DOUBLE) / CAST(t.n AS DOUBLE))
                      * ln((CAST(c.n_xy AS DOUBLE) * CAST(t.n AS DOUBLE))
                           / (CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE)))
                      * 1000000000) AS BIGINT) AS mi_contrib_nano
    FROM c JOIN mx ON c.lang = mx.lang JOIN my ON c.source = my.source
    CROSS JOIN t
    """,
    doc="Mutual information between two categorical columns (lang x "
    "source) — the dependence probe for stratification / leakage "
    "checks: MI = sum of p(x,y)*ln(p(x,y)/(p(x)p(y))) over observed "
    "cells. One groupBy on the pair builds the contingency table; "
    "marginals roll up from the CELL table (never rescan the fact); "
    "each cell's contribution is quantized to integer nano-units so "
    "the total is an associative BIGINT sum — the same fixed-point-ln "
    "trick as monitor_psi_price_drift. MI near 0 here is the expected "
    "answer (fixture lang and source are independent) — the query is "
    "the harness, not the finding.",
    tags=("analytics", "eval"),
)


# --- Holt linear-trend smoothing (round-7 tail) --------------------------------

_sql_query(
    "events_holt_linear",
    """
    WITH w AS (
      SELECT event_id, user_id, ts, value,
        collect_list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS win
      FROM events
    ),
    f AS (
      SELECT event_id, user_id, ts, value,
        aggregate(slice(win, 2, size(win) - 1),
                  array(CAST(element_at(win, 1) AS DOUBLE), CAST(0.0 AS DOUBLE)),
                  (acc, x) -> array(
                    CAST(0.25 AS DOUBLE) * x + CAST(0.75 AS DOUBLE) * (acc[0] + acc[1]),
                    CAST(0.1 AS DOUBLE) * ((CAST(0.25 AS DOUBLE) * x
                                            + CAST(0.75 AS DOUBLE) * (acc[0] + acc[1]))
                                           - acc[0])
                    + CAST(0.9 AS DOUBLE) * acc[1])) AS st
      FROM w
    )
    SELECT event_id, user_id, ts, value,
           element_at(st, 1) AS level20, element_at(st, 2) AS trend20,
           element_at(st, 1) + element_at(st, 2) AS forecast_next
    FROM f
    """,
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, value,
        list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS win
      FROM events
    ),
    f AS (
      SELECT event_id, user_id, ts, value,
        list_reduce(list_transform(win, x -> [x::DOUBLE, 0.0::DOUBLE]),
          (acc, x) -> [0.25::DOUBLE * x[1] + 0.75::DOUBLE * (acc[1] + acc[2]),
                       0.1::DOUBLE * ((0.25::DOUBLE * x[1]
                                       + 0.75::DOUBLE * (acc[1] + acc[2]))
                                      - acc[1])
                       + 0.9::DOUBLE * acc[2]]) AS st
      FROM w
    )
    SELECT event_id, user_id, ts, value,
           st[1] AS level20, st[2] AS trend20, st[1] + st[2] AS forecast_next
    FROM f
    """,
    doc="Holt linear-trend (double exponential) smoothing over each "
    "user's event stream, trailing-20 frame: the coupled recursion "
    "l_t = a*x_t + (1-a)(l+b), b_t = beta*(l_t - l) + (1-beta)*b folds "
    "over the ordered window list with a TWO-COMPONENT array "
    "accumulator [level, trend] (alpha=0.25, beta=0.1, init level = "
    "first value, trend = 0), extending events_ewma's fold idiom to "
    "vector state; forecast_next = level + trend is the one-step-ahead "
    "prediction a monitoring pipeline alerts against. The fixed "
    "chronological fold order makes the fp arithmetic bit-identical "
    "across engines AND partitionings. Engine note baked into the "
    "oracle: DuckDB 1.0's list_reduce mis-evaluates STRUCT-typed "
    "accumulators (second fold step reads stale fields) but is exact "
    "for LIST-typed ones — the [l, b] array encoding is load-bearing, "
    "not style. One shuffle on user_id; O(20) state per row.",
    tags=("analytics", "timeseries"),
)


# --- one-way ANOVA across language groups (round-7 continuation) ---------------

_sql_query(
    "stats_anova_lang_length",
    """
    WITH g AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(n_chars) AS BIGINT) AS s_g,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS q_g
      FROM documents GROUP BY lang
    ),
    t AS (
      -- per-group between-term on the 1e-6 grid BEFORE the cross-group
      -- sum: summing raw doubles across groups would be
      -- accumulation-order-dependent; BIGINT micro-units are order-free
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s,
             CAST(SUM(q_g) AS BIGINT) AS q,
             CAST(SUM(CAST(round(1000000.0 * CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                                 / CAST(n_g AS DOUBLE)) AS BIGINT)) AS BIGINT)
               AS sum_term_micro
      FROM g
    ),
    ss AS (
      SELECT k, n,
             sum_term_micro
               - CAST(round(1000000.0 * CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                            / CAST(n AS DOUBLE)) AS BIGINT) AS ssb_micro,
             1000000 * q - sum_term_micro AS ssw_micro
      FROM t
    )
    SELECT k AS k_groups, n AS n_docs,
           CAST(ssb_micro AS DOUBLE) / 1000000.0 AS ss_between,
           CAST(ssw_micro AS DOUBLE) / 1000000.0 AS ss_within,
           (CAST(ssb_micro AS DOUBLE) / CAST(k - 1 AS DOUBLE))
             / (CAST(ssw_micro AS DOUBLE) / CAST(n - k AS DOUBLE)) AS f_stat,
           CAST(ssb_micro AS DOUBLE)
             / (CAST(ssb_micro AS DOUBLE) + CAST(ssw_micro AS DOUBLE))
             AS eta_squared
    FROM ss
    """,
    doc="One-way ANOVA of document length across language groups — the "
    "k-group generalization of ab_test_spend_welch's two-sample "
    "comparison (and the parametric sibling of stats_ks_lang_length). "
    "Group moments are exact BIGINT; each group's between-term "
    "s_g^2/n_g lands on the 1e-6 grid BEFORE the cross-group sum (a "
    "raw double sum across groups would be accumulation-order-"
    "dependent — the same trick as survival_km's ln-grid cumsum), so "
    "SSB/SSW are exact integers and F / eta^2 are one fixed fp chain. "
    "One scan, one k-row aggregate, one 1-row roll-up.",
    tags=("stats", "analytics"),
)


# --- leakage-safe leave-one-out target encoding ---------------------------------

_LOO_ORACLE = """
    WITH d AS (
      SELECT doc_id, source,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    enc AS (
      SELECT doc_id, source, y,
             SUM(y) OVER (PARTITION BY source) AS s,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM d
    )
    SELECT doc_id, source, CAST(y AS BIGINT) AS y,
           CASE WHEN n = 1 THEN NULL
                ELSE CAST(s - y AS DOUBLE) / CAST(n - 1 AS DOUBLE)
           END AS loo_encoding
    FROM enc
    """


@register(
    "feature_target_encode_loo",
    oracle=_LOO_ORACLE,
    doc="Leakage-safe leave-one-out target encoding of the source "
    "categorical against the is-English target: each row's encoding is "
    "the target mean of its category EXCLUDING the row itself, "
    "(sum_cat - y_i)/(n_cat - 1) — the standard high-cardinality "
    "categorical feature for tree/linear models that a naive "
    "category-mean join would leak. The oracle keeps the category "
    "window form; the Spark side (r10) is a category groupBy joined "
    "back — the unordered PARTITION BY window buffers each category's "
    "whole partition in ONE task, and with a handful of sources that "
    "is N/|sources| fact rows per task (the percentile_exact OOM "
    "class); the aggregate+join form is safe at BOTH cardinality "
    "extremes (tiny → broadcast, huge → keyed shuffle). "
    "NULL for singleton categories rather than a fabricated prior. "
    "Scales as one shuffle on the category key at any corpus size.",
    tags=("analytics", "pipeline"),
)
def feature_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("y"),
    )
    agg = d.groupBy("source").agg(
        F.expr("SUM(y)").alias("s"), F.expr("COUNT(*)").alias("n")
    )
    return d.join(agg, "source").select(
        "doc_id",
        "source",
        F.expr("CAST(y AS BIGINT)").alias("y"),
        F.expr(
            "CASE WHEN n = 1 THEN NULL "
            "ELSE CAST(s - y AS DOUBLE) / CAST(n - 1 AS DOUBLE) END"
        ).alias("loo_encoding"),
    )


# --- Pareto / ABC inventory classification --------------------------------------

@register(
    "parts_pareto_abc",
    oracle="""
    WITH rev AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    w AS (
      SELECT l_partkey, r,
             SUM(r) OVER (ORDER BY r DESC, l_partkey ASC) AS cum,
             SUM(r) OVER () AS total
      FROM rev
    ),
    cls AS (
      SELECT l_partkey, r, total,
             CASE WHEN cum * 100 <= total * 80 THEN 'A'
                  WHEN cum * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM w
    )
    SELECT abc AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(r) AS DOUBLE) AS class_revenue,
           CAST(SUM(r) AS DOUBLE) / CAST(MAX(total) AS DOUBLE) AS revenue_share
    FROM cls GROUP BY abc ORDER BY abc_class ASC
    """,
    doc="Pareto / ABC classification of parts by revenue (A = first 80% "
    "of cumulative revenue, B = next 15%, C = tail) — the inventory-"
    "prioritization cut behind every 'top SKUs' dashboard. Revenue is "
    "exact DECIMAL per part; the running total orders by (revenue "
    "DESC, partkey ASC) so ties are deterministic; class boundaries "
    "compare cum*100 <= total*K in EXACT decimal arithmetic (a "
    "cum/total double ratio would flap at the boundary in the last "
    "ulp). The oracle's global cumulative window (`SUM(r) OVER (ORDER "
    "BY ...)`) would funnel the whole PART domain through one task at "
    "scale; the Spark side instead runs the two-level distributed "
    "prefix sum (operators/prefix.py): sketched equal-frequency "
    "revenue buckets, checkpointed ≤64-row offset relation, running "
    "sum keyed by bucket — identical DECIMAL-exact cums, zero "
    "single-partition stages over the part relation.",
    tags=("analytics",),
)
def parts_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import bucketed_running_sum

    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r")
    )
    ranked = bucketed_running_sum(
        rev,
        value_col="r",
        lead_col="r",
        tiebreak=[F.asc("l_partkey")],
        lead_desc=True,
        out_col="cum",
        total_col="total",
    )
    cls = ranked.withColumn(
        "abc",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C"),
    )
    return (
        cls.groupBy(F.col("abc").alias("abc_class"))
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("r").cast("double").alias("class_revenue"),
            (F.sum("r").cast("double") / F.max("total").cast("double")).alias(
                "revenue_share"
            ),
        )
        .orderBy(F.asc("abc_class"))
    )


# --- per-user rolling median of purchase amounts --------------------------------


def _rollmed_sql(collect: str, sort: str, elem, idiv) -> str:
    over = ("OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC "
            "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)")
    return f"""
    WITH p AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100.0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    w AS (
      SELECT event_id, user_id, ts, cents,
             {sort}({collect}(cents) {over}) AS win
      FROM p
    )
    SELECT event_id, user_id, ts, cents,
           CAST({elem('win', idiv('(n_win + 1)', 2))}
                + {elem('win', idiv('n_win', 2) + ' + 1')} AS BIGINT)
             AS median2_cents,
           CAST(({elem('win', idiv('(n_win + 1)', 2))}
                 + {elem('win', idiv('n_win', 2) + ' + 1')}) AS DOUBLE) / 200.0
             AS rolling_median_dollars
    FROM (SELECT *, CAST({'len' if collect == 'list' else 'size'}(win) AS BIGINT)
                      AS n_win FROM w) t
    """


_sql_query(
    "events_rolling_median",
    _rollmed_sql(
        "collect_list", "array_sort",
        lambda a, i: f"element_at({a}, CAST({i} AS INT))",
        lambda n, d: f"({n} div {d})",
    ),
    oracle=_rollmed_sql(
        "list", "list_sort",
        lambda a, i: f"{a}[CAST({i} AS BIGINT)]",
        lambda n, d: f"({n} // {d})",
    ),
    doc="Per-user trailing-7 rolling MEDIAN of purchase amounts — the "
    "robust companion to events_ewma's mean smoothing (a single "
    "fat-finger purchase moves the mean for 7 rows but the median not "
    "at all; pairs with robust_outliers_mad). The window list is "
    "sorted per row and the median read as exact order statistics "
    "((n+1)/2 and n/2+1, summed in exact cents so even-length windows "
    "never average in fp) — deterministic cross-engine. Keyed by "
    "user_id with a full (ts, event_id) tiebreak: one shuffle, O(7) "
    "state per row, no global sort at any scale. Dialect split is "
    "syntax-only (collect_list/array_sort vs list/list_sort).",
    tags=("analytics", "timeseries"),
)


# --- DAU / WAU / MAU: rolling DISTINCT actives via interval sweep --------------
#
# Rolling COUNT DISTINCT has no window form in either engine, and the
# naive calendar x user-days range join replicates every user-day 7/30x.
# The scalable identity: a user counts toward the W-day active window of
# day d iff their latest active day a <= d satisfies a >= d-W+1 — i.e.
# each ACTIVE day a contributes the interval [a, min(a+W-1, next_a-1)]
# of observation days. Emitting +1/-1 boundary deltas per interval and
# prefix-summing over the calendar turns rolling-distinct into one
# sorted pass over the DAY domain (calendar-bounded at any fact size).


def _active_users_sql(calendar: str, dadd) -> str:
    return f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
    cal AS ({calendar}),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    iv AS (
      SELECT user_id, day AS s,
             lead(day) OVER (PARTITION BY user_id ORDER BY day ASC) AS nxt
      FROM ud
    ),
    deltas AS (
      SELECT w.w, s AS day, 1 AS d
      FROM iv CROSS JOIN (VALUES (7), (30)) AS w(w)
      UNION ALL
      SELECT w.w,
             {dadd(f"least({dadd('s', 'w.w - 1')}, "
                   f"COALESCE({dadd('nxt', '-1')}, {dadd('s', 'w.w - 1')}))", '1')}
               AS day,
             -1 AS d
      FROM iv CROSS JOIN (VALUES (7), (30)) AS w(w)
    ),
    g AS (SELECT w, day, SUM(d) AS d FROM deltas GROUP BY w, day),
    merged AS (
      SELECT wd.w, c.day, COALESCE(g.d, 0) AS d
      FROM cal c CROSS JOIN (VALUES (7), (30)) AS wd(w)
      LEFT JOIN g ON g.w = wd.w AND g.day = c.day
    ),
    cum AS (
      SELECT w, day, SUM(d) OVER (PARTITION BY w ORDER BY day ASC) AS actives
      FROM merged
    )
    SELECT c.day,
           COALESCE(dau.dau, 0) AS dau,
           CAST(MAX(CASE WHEN c2.w = 7 THEN c2.actives END) AS BIGINT) AS wau,
           CAST(MAX(CASE WHEN c2.w = 30 THEN c2.actives END) AS BIGINT) AS mau
    FROM cal c
    JOIN cum c2 ON c2.day = c.day
    LEFT JOIN dau ON dau.day = c.day
    GROUP BY c.day, dau.dau
    ORDER BY c.day ASC
    """


@register(
    "events_active_users",
    oracle=_active_users_sql(
        "SELECT unnest(range(b.lo, b.hi + INTERVAL 1 DAY, INTERVAL 1 DAY))::DATE AS day FROM b",
        lambda d, n: f"({d} + ({n}))",
    ),
    doc="DAU / WAU / MAU per calendar day — the engagement dashboard "
    "triple, with the rolling 7- and 30-day DISTINCT user counts "
    "computed by INTERVAL SWEEP instead of a rolling count-distinct "
    "(which has no window form) or a calendar-range join (which "
    "replicates every user-day 30x): each distinct user-day "
    "contributes a [start, end] presence interval bounded by the "
    "user's next active day, the +1/-1 boundary deltas aggregate per "
    "day, and one prefix sum over the calendar yields the exact "
    "rolling-distinct series. Everything after the (user, day) dedup "
    "is day-domain-sized; the sweep is proven equal to the brute "
    "count-distinct in pytest. Dialect split is calendar generation "
    "and date arithmetic syntax only.",
    tags=("analytics", "timeseries"),
)
def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        _active_users_sql(
            "SELECT explode(sequence(b.lo, b.hi, interval 1 day)) AS day FROM b",
            lambda d, n: f"date_add({d}, {n})",
        )
    )


# --- Zipf's-law fit over the word-frequency head --------------------------------

def _zipf_sql(words: str) -> str:
    return f"""
    WITH freq AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS c
      FROM ({words}) t
      GROUP BY word
    ),
    head AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, word ASC) AS rnk
      FROM freq ORDER BY c DESC, word ASC LIMIT 1000
    ),
    pts AS (
      -- both coordinates land on the 1e-6 ln grid -> exact BIGINT sums
      SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
             CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
      FROM head
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pts
    )
    SELECT n AS n_words,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS zipf_exponent,
           (CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE)
              * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
           / (CAST(n AS DOUBLE) * 1000000.0) AS intercept_ln,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
           / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r_squared
    FROM m
    """


# Spark SQL string literals consume one backslash level ('\s' -> 's'),
# so the regex needs doubling there; DuckDB literals are verbatim.
_ZIPF_WORDS_SPARK = (
    r"SELECT explode(split(trim(text), '\\s+')) AS word "
    "FROM documents WHERE length(trim(text)) > 0"
)
_ZIPF_WORDS_DUCK = (
    r"SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word "
    "FROM documents WHERE length(trim(text)) > 0"
)


@register(
    "text_zipf_fit",
    oracle=_zipf_sql(_ZIPF_WORDS_DUCK),
    doc="Zipf's-law fit over the top-1000 word-frequency head: OLS of "
    "ln(freq) on ln(rank) — the corpus-health diagnostic (natural text "
    "slopes near -1; synthetic or templated corpora flatten, which is "
    "itself the signal). Both log coordinates land on the 1e-6 grid "
    "BEFORE the co-moment sums, so the regression inputs are exact "
    "BIGINT (the 1000-row head bounds the squared-sum magnitude) and "
    "slope/intercept/R^2 are one fixed fp chain — the same exact-"
    "moments discipline as regress_spend_on_activity. The rank window "
    "runs over the LIMITed head only, never the full vocabulary; the "
    "vocabulary aggregate itself is one explode + one shuffle on word. "
    "Dialect split is tokenization syntax only (explode(split()) vs "
    "unnest(regexp_split_to_array())).",
    tags=("text", "stats"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_zipf_sql(_ZIPF_WORDS_SPARK))


# --- A/B experiment power / minimum-detectable-effect read-out -----------------

def _power_sql(hex_arm: str) -> str:
    return f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN {hex_arm} % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
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
    s AS (
      SELECT na, nb,
             (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1) AS va,
             (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) AS vb,
             CAST(sa AS DOUBLE) / (100.0 * na)
               - CAST(sb AS DOUBLE) / (100.0 * nb) AS uplift
      FROM agg
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           uplift AS observed_uplift_dollars,
           -- z_{0.975} + z_{0.80} on the 1e-6 grid, shared literals
           (1.959964 + 0.841621) * sqrt(va / na + vb / nb) / 100.0
             AS mde_dollars,
           CASE WHEN uplift = 0.0 THEN NULL
                ELSE (1.959964 + 0.841621) * (1.959964 + 0.841621)
                     * (va + vb) / ((uplift * 100.0) * (uplift * 100.0))
           END AS n_per_arm_for_observed
    FROM s
    """


def _power_hex(hexfn, str_t: str) -> str:
    return hexfn(f"md5(concat('ab42|', CAST(user_id AS {str_t})))")


@register(
    "ab_test_power_mde",
    oracle=None,  # assembled below (needs the duck hex13 helper)
    doc="Experiment power read-out for the ab_test_spend_welch setup: "
    "the minimum detectable effect at 80% power / 5% two-sided alpha "
    "given the CURRENT arm sizes and variances, and the per-arm sample "
    "size that would make the observed uplift detectable — the two "
    "numbers an experimentation platform prints next to every "
    "non-significant test (was it null, or just underpowered?). The "
    "z-quantiles are shared 1e-6-grid literals (neither engine "
    "evaluates an inverse normal CDF), variances come from the same "
    "exact BIGINT cents moments as the Welch read-out, and everything "
    "downstream is a fixed fp chain. One user-keyed aggregate + one "
    "6-number roll-up. The keyed-md5 arm expression is the only "
    "dialect split (conv() vs the hex13 list fold).",
    tags=("stats", "analytics"),
)
def ab_test_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    spark_hex = "CAST(conv(substring({h}, 1, 13), 16, 10) AS BIGINT)"
    return spark.sql(_power_sql(_power_hex(lambda h: spark_hex.format(h=h), "STRING")))


from .oracle_dialect import duck_hex13_to_long as _duck_hex13  # noqa: E402
from .registry import QUERIES as _QUERIES  # noqa: E402

_QUERIES["ab_test_power_mde"].oracle = _power_sql(
    _power_hex(_duck_hex13, "VARCHAR")
)


# --- clickstream path mining: top session-opening action paths ------------------

_PATH_LEN = 5
_PATH_TOPK = 20

_PATH_ORACLE = f"""
WITH x AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 4 HOUR
         THEN 1 ELSE 0 END AS is_new
  FROM events
),
s AS (
  SELECT user_id, ts, event_id, event_type,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM x
),
r AS (
  SELECT user_id, session_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                       ORDER BY ts, event_id) AS rn
  FROM s
),
p AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {_PATH_LEN}
  GROUP BY user_id, session_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {_PATH_TOPK}
"""


@register(
    "events_top_paths",
    oracle=_PATH_ORACLE,
    doc=f"Clickstream path mining: the top-{_PATH_TOPK} session-opening "
    f"action sequences (first {_PATH_LEN} events per 4-hour-gap session, "
    "'>'-joined) by session count — the navigation-pattern summary next "
    "to events_markov_transitions' one-step view (a path ranks whole "
    "prefixes, so it catches multi-step flows a transition matrix "
    "averages away). Same keyed sessionization as events_sessionized "
    "(lag + cumulative sum, (ts, event_id) total order); the per-session "
    "prefix is a keyed window + filter; the path aggregate shuffles one "
    "short string per session; top-k is TakeOrdered. No driver-side "
    "loops, no global sort of the fact.",
    tags=("analytics", "streaming"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(order)
    is_new = F.when(gap_us > 4 * 3600 * 1_000_000, F.lit(1)).otherwise(F.lit(0))
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = events.withColumn("session_id", F.sum(is_new).over(cum))
    rn = F.row_number().over(
        Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    )
    prefix = sess.withColumn("rn", rn).filter(F.col("rn") <= _PATH_LEN)
    paths = (
        prefix.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rn"), F.col("event_type")))
                    ),
                    lambda e: e.event_type,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(_PATH_TOPK)
    )


# --- period-over-period: monthly revenue MoM / YoY ------------------------------

_YOY_TAIL = """
    SELECT c.yr, c.mo, c.rev_cents,
           p.rev_cents AS prev_month_cents,
           y.rev_cents AS prev_year_cents,
           CASE WHEN p.rev_cents IS NOT NULL AND p.rev_cents <> 0
                THEN CAST(c.rev_cents - p.rev_cents AS DOUBLE)
                     / CAST(p.rev_cents AS DOUBLE) END AS mom_pct,
           CASE WHEN y.rev_cents IS NOT NULL AND y.rev_cents <> 0
                THEN CAST(c.rev_cents - y.rev_cents AS DOUBLE)
                     / CAST(y.rev_cents AS DOUBLE) END AS yoy_pct
    FROM m c
    LEFT JOIN m p ON p.mi = c.mi - 1
    LEFT JOIN m y ON y.mi = c.mi - 12
    ORDER BY c.mi ASC
"""

_YOY_MONTHLY = """
      SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS mi,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS mo,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1, 2, 3
"""


@register(
    "sales_yoy_mom",
    oracle=f"WITH m AS ({_YOY_MONTHLY}) {_YOY_TAIL}",
    doc="Period-over-period revenue: monthly totals with aligned "
    "previous-month (MoM) and same-month-previous-year (YoY) "
    "comparisons — the board-deck view every warehouse serves. "
    "Alignment is by linear month index self-joins (mi-1 / mi-12), "
    "which stays correct across year boundaries and missing months "
    "where a lag(12) over a dense window silently misaligns. The fact "
    "collapses ONCE into a localCheckpoint'ed calendar-sized monthly "
    "relation (Spark inlines CTEs per reference — the SQL form's three "
    "references would triple-scan orders); revenue is exact DECIMAL "
    "cents; percent changes are single fp64 divisions of exact BIGINTs.",
    tags=("analytics",),
)
def sales_yoy_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("orders",))
    m = spark.sql(_YOY_MONTHLY).localCheckpoint()
    m.createOrReplaceTempView("yoy_monthly")
    return spark.sql(
        f"WITH m AS (SELECT mi, yr, mo, rev_cents FROM yoy_monthly) {_YOY_TAIL}"
    )


# --- interval union / coverage (merge overlapping intervals) --------------------

_COV_WINDOW_DAYS = 7


def _coverage_sql(dayx: str) -> str:
    return f"""
    WITH iv AS (
      SELECT l_suppkey AS s, {dayx} AS a, {dayx} + {_COV_WINDOW_DAYS - 1} AS b
      FROM lineitem
    ),
    ord AS (
      SELECT s, a, b,
             MAX(b) OVER (PARTITION BY s ORDER BY a ASC, b ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv
    ),
    isl AS (
      SELECT s, a, b,
             SUM(CASE WHEN prev_max IS NULL OR a > prev_max + 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY s ORDER BY a ASC, b ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM ord
    ),
    g AS (
      SELECT s, island, MIN(a) AS ia, MAX(b) AS ib,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM isl GROUP BY s, island
    )
    SELECT s AS suppkey,
           CAST(SUM(n) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(ib - ia + 1) AS BIGINT) AS covered_days
    FROM g GROUP BY s ORDER BY suppkey ASC
    """


#: Oracle: an INDEPENDENT window-free formulation — explode each
#: interval into its 7 covered days, dedupe, then covered = distinct-day
#: count, islands = covered days whose predecessor day is uncovered
#: (anti join). Deliberately not the Spark plan's shape: (a) a stronger
#: cross-check than same-shape SQL, and (b) DuckDB 1.0's multi-threaded
#: chained-window execution returns WRONG running-max results on this
#: data size (covered_days inflated for ~23 of 10k suppliers at sf1.0;
#: correct with SET threads=1 — reproduced and pinned in
#: tests/test_robust_queries.py::test_coverage_matches_python_replay).
_COVERAGE_ORACLE = f"""
    WITH iv AS (
      SELECT l_suppkey AS s,
             date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS a
      FROM lineitem
    ),
    days AS (
      SELECT DISTINCT s, a + CAST(o AS BIGINT) AS d
      FROM iv, LATERAL (SELECT unnest(range(0, {_COV_WINDOW_DAYS}))) u(o)
    ),
    starts AS (
      SELECT d1.s, CAST(COUNT(*) AS BIGINT) AS n_islands
      FROM days d1 LEFT JOIN days d0 ON d0.s = d1.s AND d0.d = d1.d - 1
      WHERE d0.d IS NULL GROUP BY d1.s
    ),
    cov AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS covered_days FROM days GROUP BY s),
    cnt AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_intervals FROM iv GROUP BY s)
    SELECT cnt.s AS suppkey, cnt.n_intervals, starts.n_islands, cov.covered_days
    FROM cnt JOIN starts ON cnt.s = starts.s JOIN cov ON cnt.s = cov.s
    ORDER BY suppkey ASC
    """


@register(
    "intervals_coverage_supplier",
    oracle=_COVERAGE_ORACLE,
    doc=f"Interval union / coverage: each shipment opens a "
    f"{_COV_WINDOW_DAYS}-day activity window; per supplier, merge the "
    "overlapping windows (classic gaps-and-islands: running-max end "
    "vs next start, island id by cumulative sum) and report interval/"
    "island counts plus total covered days — the merge-overlapping-"
    "intervals operator behind uptime, on-call coverage, and session "
    "stitching. All windows are keyed by supplier (one shuffle, no "
    "global sort); island decisions are order-free under (a, b) ties "
    "because a tied start can never exceed the running max that "
    "includes its twin's end. Day arithmetic is exact integers.",
    tags=("analytics",),
)
def intervals_coverage_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        _coverage_sql("datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01')")
    )


# --- deadline-constrained funnel with step latencies ----------------------------

_FUNNEL_DEADLINE_H = 48


_FD_S_SQL = """
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
"""


def _fd_c_sql(s: str) -> str:
    return f"""
      SELECT e.user_id, s.signup_ts, min(e.ts) AS click_ts
      FROM events e JOIN {s} s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
        AND e.ts <= s.signup_ts + INTERVAL {_FUNNEL_DEADLINE_H} HOUR
      GROUP BY e.user_id, s.signup_ts
"""


def _fd_p_sql(c: str) -> str:
    return f"""
      SELECT e.user_id, c.click_ts, min(e.ts) AS purchase_ts
      FROM events e JOIN {c} c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
        AND e.ts <= c.click_ts + INTERVAL {_FUNNEL_DEADLINE_H} HOUR
      GROUP BY e.user_id, c.click_ts
"""


def _fd_tail_sql(micros, s: str, c: str, p: str) -> str:
    """Latency-median + step-count roll-up downstream of the three step
    relations — shared verbatim between the DuckDB oracle (in-query
    CTEs) and the Spark side (localCheckpoint'ed step views, so each
    monotonically-shrinking step relation computes once instead of once
    per CTE reference — CTE re-inlining was 11 events scans)."""
    return f"""
    lat AS (
      SELECT 2 AS step_no, {micros("click_ts")} - {micros("signup_ts")} AS us FROM {c}
      UNION ALL
      SELECT 3 AS step_no, {micros("purchase_ts")} - {micros("click_ts")} AS us FROM {p}
    ),
    ranked AS (
      SELECT step_no, us,
             ROW_NUMBER() OVER (PARTITION BY step_no ORDER BY us ASC) AS rn,
             COUNT(*) OVER (PARTITION BY step_no) AS n
      FROM lat
    ),
    med AS (
      SELECT step_no, us AS median_latency_us FROM ranked
      WHERE rn = CAST(floor((CAST(n AS DOUBLE) + 1.0) / 2.0) AS BIGINT)
    ),
    steps AS (
      SELECT 1 AS step_no, 'signup' AS step, CAST(COUNT(*) AS BIGINT) AS users FROM {s}
      UNION ALL
      SELECT 2 AS step_no, 'click' AS step, CAST(COUNT(*) AS BIGINT) AS users FROM {c}
      UNION ALL
      SELECT 3 AS step_no, 'purchase' AS step, CAST(COUNT(*) AS BIGINT) AS users FROM {p}
    )
    SELECT CAST(st.step_no AS BIGINT) AS step_no, st.step, st.users,
           CAST(m.median_latency_us AS BIGINT) AS median_latency_us
    FROM steps st LEFT JOIN med m ON st.step_no = m.step_no
    ORDER BY step_no ASC
    """


def _funnel_deadline_sql(micros) -> str:
    return f"""
    WITH s AS ({_FD_S_SQL}),
    c AS ({_fd_c_sql("s")}),
    p AS ({_fd_p_sql("c")}),
    {_fd_tail_sql(micros, "s", "c", "p")}"""


@register(
    "funnel_deadline_48h",
    oracle=None,  # assembled below (dialect-split epoch-micros fn)
    doc=f"Deadline-constrained conversion funnel: signup → click within "
    f"{_FUNNEL_DEADLINE_H} h → purchase within {_FUNNEL_DEADLINE_H} h of "
    "the click, with the MEDIAN step latency per transition — the "
    "attribution-window form of funnel_signup_click_purchase (an "
    "unconstrained funnel credits conversions that happen weeks later; "
    "a deadline makes step rates comparable across cohorts and is what "
    "marketing attribution actually uses). Step joins stay keyed on "
    "user_id with monotonically shrinking inputs; medians are exact "
    "rank selects over the two transition latencies — the oracle keeps "
    "the PARTITION BY step_no rank window (TWO partitions: each task "
    "would sort ~half the converted users — the percentile_exact OOM "
    "class), the Spark side (r10) runs each step's nearest-rank select "
    "on the distributed two-level prefix sum over the latency-value "
    "histogram (operators/prefix.py — no single-partition or "
    "two-partition stage anywhere); latencies are exact microsecond "
    "integers, so the selected value is bit-identical.",
    tags=("analytics",),
)
def funnel_deadline_48h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import bucketed_running_sum

    tune(spark)
    register_views(spark, sf_dir, ("events",))
    s = spark.sql(_FD_S_SQL).localCheckpoint()
    s.createOrReplaceTempView("fd_s")
    c = spark.sql(_fd_c_sql("fd_s")).localCheckpoint()
    c.createOrReplaceTempView("fd_c")
    p = spark.sql(_fd_p_sql("fd_c")).localCheckpoint()
    p.createOrReplaceTempView("fd_p")

    def step_median(rel: DataFrame, a: str, b: str, step_no: int) -> DataFrame:
        # median = us at 1-based rank floor((n+1)/2) = MIN us with
        # inclusive cum >= k; the cum runs on the two-level prefix sum
        # over the DISTINCT-latency histogram (total_col carries n)
        lat = rel.select(
            (F.expr(f"unix_micros({b})") - F.expr(f"unix_micros({a})")).alias("us")
        )
        hist = lat.groupBy("us").agg(F.count("*").cast("bigint").alias("c"))
        cum = bucketed_running_sum(
            hist, value_col="c", lead_col="us", out_col="cum", total_col="n"
        )
        k = F.expr("CAST(floor((CAST(n AS DOUBLE) + 1.0) / 2.0) AS BIGINT)")
        return (
            cum.filter(F.col("cum") >= k)
            .agg(F.min("us").alias("median_latency_us"))
            .select(F.lit(step_no).alias("__sn"), "median_latency_us")
        )

    med = step_median(c, "signup_ts", "click_ts", 2).unionByName(
        step_median(p, "click_ts", "purchase_ts", 3)
    )
    steps = (
        s.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("users")).select(
            F.lit(1).alias("__sn"), F.lit("signup").alias("step"), "users"
        )
        .unionByName(
            c.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("users")).select(
                F.lit(2).alias("__sn"), F.lit("click").alias("step"), "users"
            )
        )
        .unionByName(
            p.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("users")).select(
                F.lit(3).alias("__sn"), F.lit("purchase").alias("step"), "users"
            )
        )
    )
    return (
        steps.join(med, "__sn", "left")
        .select(
            F.expr("CAST(__sn AS BIGINT)").alias("step_no"),
            "step",
            "users",
            F.expr("CAST(median_latency_us AS BIGINT)").alias("median_latency_us"),
        )
        .orderBy(F.asc("step_no"))
    )


from .registry import QUERIES as _Q_FD  # noqa: E402

_Q_FD["funnel_deadline_48h"].oracle = _funnel_deadline_sql(
    lambda col: f"epoch_us({col})"
)


# --- 2-d skyline (Pareto frontier) ---------------------------------------------

_sql_query(
    "skyline_parts_price_size",
    """
    WITH q0 AS (
      SELECT p_retailprice AS qp, p_size AS qs
      FROM part ORDER BY p_retailprice + CAST(p_size AS DOUBLE) ASC, p_partkey ASC
      LIMIT 1
    ),
    surv AS (
      SELECT p.p_partkey, p.p_retailprice AS price, CAST(p.p_size AS BIGINT) AS size
      FROM part p CROSS JOIN q0
      WHERE NOT (p.p_retailprice >= q0.qp AND p.p_size >= q0.qs
                 AND (p.p_retailprice > q0.qp OR p.p_size > q0.qs))
    ),
    g AS (SELECT price, MIN(size) AS gmin FROM surv GROUP BY price),
    r AS (
      SELECT price, gmin,
             MIN(gmin) OVER (ORDER BY price ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS m1
      FROM g
    ),
    sky AS (SELECT price, gmin FROM r WHERE m1 IS NULL OR m1 > gmin)
    SELECT s.p_partkey AS partkey, s.price AS price, s.size AS size
    FROM surv s JOIN sky ON s.price = sky.price AND s.size = sky.gmin
    ORDER BY s.price ASC, s.p_partkey ASC
    """,
    doc="2-d skyline / Pareto frontier: the parts no other part beats on "
    "BOTH price and size (ties: equal points don't dominate each other, "
    "so duplicates of a frontier point all surface) — the "
    "multi-objective shortlist operator (cheapest-and-smallest here; "
    "parts_pareto_abc is the 1-d cumulative-share cousin). Sort-based "
    "algorithm: collapse to one row per distinct price (keyed "
    "aggregate), then a running min of group-min size over "
    "strictly-cheaper prices marks dominance — one bounded-by-distinct-"
    "prices sorted window, no all-pairs join. A sound single-point "
    "prefilter (drop everything strictly dominated by the best "
    "price+size point, one broadcast compare) bounds the sorted set at "
    "scale; for anti-correlated dimensions the frontier itself is the "
    "lower bound of any algorithm.",
    tags=("analytics",),
)


# --- cross-correlation (lead-lag) between two event series ---------------------

_sql_query(
    "events_ccf_click_purchase",
    """
    WITH d AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS xn,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS yn
      FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1
    ),
    p AS (
      SELECT CAST(l.lag AS BIGINT) AS lag, a.xn AS x, b.yn AS y
      FROM d a
      CROSS JOIN (VALUES (-7), (-3), (-1), (0), (1), (3), (7)) AS l(lag)
      JOIN d b ON b.day = a.day + INTERVAL 1 DAY * l.lag
    ),
    c AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
      FROM p GROUP BY lag
    )
    SELECT lag, n AS n_pairs,
           CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS DOUBLE) AS ccf
    FROM c
    """,
    doc="Cross-correlation function between the daily click series (x) "
    "and the daily purchase series (y) at lags -7..+7: ccf(L) = "
    "Pearson corr(x_t, y_{t+L}), so a peak at positive L means clicks "
    "LEAD purchases by L days — the lead-lag probe run before "
    "attributing one series' movements to the other (the two-series "
    "sibling of events_acf_daily). One fact scan collapses both "
    "series to a shared day grid (exact integer counts; a day with "
    "clicks but no purchases is a true zero — only fully silent days "
    "drop out, and the fixture calendar is dense), the lag descriptor "
    "cross-joins BEFORE the calendar-bounded self-join (day-sized "
    "relation referenced exactly twice — Spark inlines CTEs), days "
    "align by day + INTERVAL*lag so calendar gaps never mis-pair, and "
    "each lag's correlation assembles from exact BIGINT co-moments "
    "with one final fp expression — bit-stable cross-engine.",
    tags=("analytics", "timeseries"),
)


# --- precision-recall curve over the score domain ------------------------------

_sql_query(
    "eval_pr_curve",
    """
    WITH s AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    h AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS np
      FROM s GROUP BY score
    ),
    t AS (SELECT CAST(SUM(np) AS BIGINT) AS p FROM h),
    c AS (
      SELECT score,
             SUM(n) OVER (ORDER BY score DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pred_pos,
             SUM(np) OVER (ORDER BY score DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
      FROM h
    )
    SELECT c.score AS threshold,
           CAST(c.tp AS BIGINT) AS tp,
           CAST(c.pred_pos - c.tp AS BIGINT) AS fp,
           CAST(t.p - c.tp AS BIGINT) AS fn,
           CAST(c.tp AS DOUBLE) / CAST(c.pred_pos AS DOUBLE) AS prec,
           CAST(c.tp AS DOUBLE) / CAST(t.p AS DOUBLE) AS rec,
           2.0 * CAST(c.tp AS DOUBLE) / CAST(c.pred_pos + t.p AS DOUBLE) AS f1
    FROM c CROSS JOIN t
    """,
    doc="Precision-recall curve of a score column against a binary label "
    "(document length vs lang='en' — the same probe eval_auc_doclang "
    "ranks): one PR point per distinct score threshold (predict "
    "positive when score >= t), built in HISTOGRAM form like the AUC "
    "query — rows collapse to per-score (n, n_pos) counts first, "
    "TP/FP/FN come from one prefix sum over the bounded score DOMAIN, "
    "and precision/recall/F1 are single divisions of exact BIGINTs "
    "(F1 uses the 2TP/(pred+P) identity — no fp chaining). The "
    "classifier-eval companion a curation pipeline uses to PICK the "
    "quality-score threshold (AUC says whether the score separates; "
    "the PR curve says where to cut).",
    tags=("analytics", "eval"),
)


# --- maximum drawdown of the daily net cash flow -------------------------------

_sql_query(
    "events_max_drawdown",
    """
    WITH d AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE -CAST(round(value * 100) AS BIGINT) END)
               AS BIGINT) AS net
      FROM events WHERE event_type IN ('purchase', 'error') GROUP BY 1
    ),
    c AS (
      SELECT day, SUM(net) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS bal
      FROM d
    ),
    p AS (
      SELECT day, bal, MAX(bal) OVER (ORDER BY day
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM c
    ),
    dd AS (SELECT day, CAST(peak - bal AS BIGINT) AS draw, peak, bal FROM p),
    r AS (
      SELECT day, draw, peak, bal,
             ROW_NUMBER() OVER (ORDER BY draw DESC, day ASC) AS rn
      FROM dd
    )
    SELECT CAST(draw AS BIGINT) AS max_drawdown_cents,
           CAST(day AS DATE) AS trough_day,
           CAST(peak AS BIGINT) AS peak_cents,
           CAST(bal AS BIGINT) AS trough_cents
    FROM r WHERE rn = 1
    """,
    doc="Maximum drawdown of the daily net cash balance (purchase revenue "
    "minus error losses, cumulated): drawdown_t = running_peak_t - "
    "balance_t, reported at its maximum with the trough day (earliest "
    "on ties), peak and trough balances — the risk statistic behind "
    "'how far under water did this stream go'. Two chained windows "
    "(prefix sum, running max) over the calendar-bounded day relation "
    "— the fact collapses to day grain first (exact integer cents), so "
    "the unpartitioned windows touch 365 rows/year regardless of fact "
    "size (the ACF/CUSUM precedent). Deterministic: all integers until "
    "the final casts; the report row is the single rank-1 row under "
    "(draw DESC, day ASC) — earliest trough on ties, with that row's "
    "own peak/balance (one dd reference; the old 3-scalar-subquery "
    "argmax re-derived the day relation 4x).",
    tags=("analytics", "timeseries"),
)


# --- Mann-Kendall trend test over the daily revenue series ---------------------

_sql_query(
    "stats_mann_kendall",
    """
    WITH d AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CAST(sign(b.rev - a.rev) AS BIGINT)) AS BIGINT) AS s_stat
      FROM d a JOIN d b ON b.day > a.day
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    ties AS (
      SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0) AS tie18
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY rev) g
      WHERE t > 1
    ),
    v AS (
      SELECT s.s_stat, n.n,
             CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie18 AS BIGINT) AS var18
      FROM s CROSS JOIN n CROSS JOIN ties
    )
    SELECT s_stat, n AS n_days, var18 AS var_s_x18,
           CAST(s_stat AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)
             AS tau,
           CASE WHEN s_stat > 0
                THEN (CAST(s_stat AS DOUBLE) - 1.0) / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                WHEN s_stat < 0
                THEN (CAST(s_stat AS DOUBLE) + 1.0) / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                ELSE 0.0 END AS z
    FROM v
    """,
    doc="Mann-Kendall nonparametric trend test on the daily purchase-"
    "revenue series: S = sum of sign(x_j - x_i) over all day pairs i<j "
    "(exact BIGINT via the calendar-bounded self-join — the Theil-Sen "
    "shape; Theil-Sen estimates the slope, Mann-Kendall tests its "
    "significance), Kendall's tau-a, and the continuity-corrected "
    "normal z with the exact tie correction (variance kept as the "
    "integer 18*Var(S) = n(n-1)(2n+5) - sum t(t-1)(2t+5); the two "
    "divisions and sqrt happen once at the end). The "
    "monotonic-drift screen a monitoring pipeline runs where "
    "regression slopes would be distorted by outliers.",
    tags=("analytics", "stats", "timeseries"),
)


# --- t-closeness audit (completes the k-anonymity / l-diversity trio) ----------

_sql_query(
    "audit_t_closeness",
    """
    WITH q AS (
      SELECT lang,
             CAST(floor(CAST(n_chars AS DOUBLE) / 100.0) AS BIGINT) AS len_bucket,
             source
      FROM documents
    ),
    cv AS (
      SELECT lang, len_bucket, source, CAST(COUNT(*) AS BIGINT) AS n_cv
      FROM q GROUP BY lang, len_bucket, source
    ),
    c AS (
      SELECT lang, len_bucket, CAST(SUM(n_cv) AS BIGINT) AS n_c
      FROM cv GROUP BY lang, len_bucket
    ),
    v AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_v FROM q GROUP BY source),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
    pairs AS (
      SELECT c.lang, c.len_bucket, c.n_c, v.source, v.n_v,
             COALESCE(cv.n_cv, CAST(0 AS BIGINT)) AS n_cv
      FROM c CROSS JOIN v
      LEFT JOIN cv ON cv.lang = c.lang AND cv.len_bucket = c.len_bucket
                  AND cv.source = v.source
    ),
    e AS (
      SELECT pairs.lang, pairs.len_bucket, pairs.n_c, t.n,
             CAST(SUM(abs(pairs.n_cv * t.n - pairs.n_v * pairs.n_c)) AS BIGINT) AS num
      FROM pairs CROSS JOIN tot t
      GROUP BY pairs.lang, pairs.len_bucket, pairs.n_c, t.n
    )
    SELECT lang, len_bucket, n_c AS class_size,
           CAST(num AS DOUBLE) / (2.0 * CAST(n_c AS DOUBLE) * CAST(n AS DOUBLE))
             AS t_closeness
    FROM e
    ORDER BY t_closeness DESC, lang ASC, len_bucket ASC
    """,
    doc="t-closeness audit (Li et al. 2007) over the same "
    "(lang, length-bucket) quasi-identifier classes as "
    "audit_k_anonymity, with source as the sensitive attribute: per "
    "class, the total-variation distance between the class's source "
    "distribution and the global one — the screen that catches what "
    "k-anonymity and l-diversity both miss (a large, diverse class "
    "whose distribution still skews toward one sensitive value leaks "
    "probabilistic information). TVD = 0.5*sum|p - q| assembled in "
    "exact cross-multiplied BIGINT form |n_cv*N - n_v*n_c| (zero "
    "cells materialized by the class x value cross join, bounded by "
    "the QI x sensitive domain), one division at the end. Completes "
    "the k-anonymity -> l-diversity -> t-closeness governance ladder.",
    tags=("analytics", "audit", "privacy"),
)


# --- CUPED variance reduction read-out -----------------------------------------

_sql_query(
    "ab_test_cuped",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           AND ts < CAST('2024-01-16 00:00:00' AS TIMESTAMP)
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           AND ts >= CAST('2024-01-16 00:00:00' AS TIMESTAMP)
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM per_user
    ),
    d AS (
      SELECT n,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn
      FROM m
    )
    SELECT n AS n_users,
           covn / varxn AS theta,
           varyn / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * 10000.0)
             AS var_y_dollars2,
           (varyn - covn * covn / varxn)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * 10000.0)
             AS var_cuped_dollars2,
           (covn * covn) / (varxn * varyn) AS var_reduction_frac
    FROM d
    """,
    doc="CUPED variance reduction read-out (Deng et al. 2013): per-user "
    "pre-period purchase spend (before Jan 16) as the covariate X, "
    "experiment-period spend as the metric Y; theta = cov(X,Y)/var(X), "
    "adjusted metric variance var(Y - theta*X) = var(Y)*(1 - rho^2), "
    "and the variance-reduction fraction rho^2 — the statistic that "
    "says how much smaller an experiment this metric could run with "
    "pre-period adjustment (the standard lever when per-user spend is "
    "heavy-tailed). One user-keyed aggregate (exact BIGINT cents "
    "co-moments) + one 6-number roll-up; every reported value is a "
    "fixed fp64 chain from exact integers — the Welch-query pattern "
    "extended to covariances.",
    tags=("analytics", "stats"),
)


# --- Spearman rank correlation (histogram-form average ranks) ------------------

_SPEARMAN_ORACLE = """
    WITH per_user AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    hx AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS n FROM per_user GROUP BY x
    ),
    rx AS (
      SELECT x,
             2 * COALESCE(SUM(n) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n + 1 AS r2
      FROM hx
    ),
    hy AS (
      SELECT y, CAST(COUNT(*) AS BIGINT) AS n FROM per_user GROUP BY y
    ),
    ry AS (
      SELECT y,
             2 * COALESCE(SUM(n) OVER (ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n + 1 AS r2
      FROM hy
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per_user),
    j AS (
      SELECT rx.r2 - (nn.n + 1) AS a, ry.r2 - (nn.n + 1) AS b
      FROM per_user u JOIN rx ON rx.x = u.x JOIN ry ON ry.y = u.y CROSS JOIN nn
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a * b) AS BIGINT) AS sab,
             CAST(SUM(a * a) AS BIGINT) AS saa, CAST(SUM(b * b) AS BIGINT) AS sbb
      FROM j
    )
    SELECT n AS n_users,
           CAST(CAST(sab AS DOUBLE)
                / (SQRT(CAST(saa AS DOUBLE)) * SQRT(CAST(sbb AS DOUBLE)))
             AS DOUBLE) AS spearman_rho
    FROM m
    """


@register(
    "stats_spearman_activity_spend",
    oracle=_SPEARMAN_ORACLE,
    doc="Spearman rank correlation between per-user activity (event "
    "count) and per-user purchase spend — the monotone-association "
    "probe that is robust to the heavy right tail Pearson chokes on. "
    "Tie-corrected average ranks are built in HISTOGRAM form (the AUC "
    "trick): group each variable on its DISTINCT values, a prefix sum "
    "over the value DOMAIN gives 2*avg_rank = 2*cum_lower + ties + 1 "
    "(always an integer), and Spearman = Pearson over the doubled "
    "ranks — co-moments stay exact BIGINT to the final division. "
    "The doubled ranks are CENTERED by their exact integer mean n+1 "
    "before the products, so the co-moments are plain sums of "
    "~n^3-magnitude integers (no n*Sxy - Sx*Sy cancellation blowup) — "
    "exact BIGINT to ~2e6 users; beyond that switch ranks to the "
    "1e-3-quantile grid. Nothing sorts the user relation: two rank "
    "maps join back by value (keyed shuffles), the fact shuffles once "
    "to user grain. The SPEND domain is entity-scale (distinct cent "
    "sums approach n_users at 100 TB), so since r10 both domain prefix "
    "sums run on the distributed two-level prefix sum "
    "(operators/prefix.py, exact BIGINT regrouped addition) — zero "
    "single-partition stages; the oracle keeps the global-window SQL.",
    tags=("analytics", "stats"),
)
def stats_spearman_activity_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import bucketed_running_sum

    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        )
        .cast("bigint")
        .alias("y"),
    )

    def rank_map(var: str) -> DataFrame:
        # histogram over the variable's DISTINCT values, then the
        # cumulative count via the distributed prefix sum; doubled
        # average rank r2 = 2*cum_lower + ties + 1 (cum_lower excludes
        # the current value's own bucket: inclusive cum minus n).
        h = per_user.groupBy(var).agg(F.count("*").cast("bigint").alias("n"))
        cum = bucketed_running_sum(h, value_col="n", lead_col=var, out_col="__cc")
        return cum.select(
            var,
            (2 * (F.col("__cc") - F.col("n")) + F.col("n") + 1).alias(f"__r2{var}"),
        )

    nn = per_user.agg(F.count("*").cast("bigint").alias("__n"))
    j = (
        per_user.join(rank_map("x"), "x")
        .join(rank_map("y"), "y")
        .crossJoin(F.broadcast(nn))
        .select(
            (F.col("__r2x") - (F.col("__n") + 1)).alias("a"),
            (F.col("__r2y") - (F.col("__n") + 1)).alias("b"),
        )
    )
    m = j.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("sab"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("bigint").alias("sbb"),
    )
    return m.select(
        F.col("n").alias("n_users"),
        (
            F.col("sab").cast("double")
            / (F.sqrt(F.col("saa").cast("double")) * F.sqrt(F.col("sbb").cast("double")))
        )
        .cast("double")
        .alias("spearman_rho"),
    )


# --- survey raking / iterative proportional fitting ----------------------------
#
# IPF (Deming & Stephan 1940): find per-cell weights over the
# (lang, source) contingency table so the weighted marginals match
# TARGET margins (uniform across langs and across sources here — the
# "rebalance the corpus" variant of survey post-stratification; the
# mix_rebalance queries adjust one dimension, raking fits BOTH
# simultaneously). Weighted counts are carried as integer shares of
# 1e9 (c = round-down share of the total), and each scaling step is
# pure floor arithmetic c * T // S — bit-identical across engines at
# ANY corpus size (shares are scale-free: c*T <= 1e18 regardless of N).
# Three row/column rounds; the cell relation is bounded by the
# |lang| x |source| domain, so every step after the one fact aggregate
# is constant-size. Spark runs the rounds as a checkpointed DataFrame
# loop (a pure-SQL CTE chain would re-derive the fact aggregate
# 2^rounds times — the PCA/duplicate-components lineage rule); the
# oracle unrolls the same arithmetic as MATERIALIZED CTEs.

_IPF_SCALE = 1_000_000_000
_IPF_ROUNDS = 3


def _ipf_oracle() -> str:
    S = _IPF_SCALE
    parts = [
        f"""cells AS MATERIALIZED (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang, source
    ),
    tot AS MATERIALIZED (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS ns
      FROM cells
    ),
    c0 AS MATERIALIZED (
      SELECT lang, source, n_docs,
             CAST((n_docs * {S}) // t.n AS BIGINT) AS c
      FROM cells CROSS JOIN tot t
    )"""
    ]
    prev = "c0"
    for r in range(1, _IPF_ROUNDS + 1):
        parts.append(
            f"""r{r} AS MATERIALIZED (
      SELECT p.lang, p.source, p.n_docs,
             CAST((p.c * ({S} // t.nl)) // sl.s AS BIGINT) AS c
      FROM {prev} p
      JOIN (SELECT lang, CAST(SUM(c) AS BIGINT) AS s FROM {prev} GROUP BY lang) sl
        ON sl.lang = p.lang
      CROSS JOIN tot t
    ),
    s{r} AS MATERIALIZED (
      SELECT p.lang, p.source, p.n_docs,
             CAST((p.c * ({S} // t.ns)) // sc.s AS BIGINT) AS c
      FROM r{r} p
      JOIN (SELECT source, CAST(SUM(c) AS BIGINT) AS s FROM r{r} GROUP BY source) sc
        ON sc.source = p.source
      CROSS JOIN tot t
    )"""
        )
        prev = f"s{r}"
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT f.lang, f.source, f.n_docs,
           CAST(f.c AS DOUBLE) / CAST(c0.c AS DOUBLE) AS raked_weight,
           CAST(f.c AS DOUBLE) / {S}.0 AS raked_share
    FROM {prev} f JOIN c0 ON c0.lang = f.lang AND c0.source = f.source
    ORDER BY f.lang ASC, f.source ASC
    """


@register(
    "weights_raking_ipf",
    oracle=_ipf_oracle(),
    doc=f"Survey raking / iterative proportional fitting "
    f"({_IPF_ROUNDS} row/column rounds) of per-cell weights over the "
    "(lang, source) table toward UNIFORM lang and source margins — the "
    "two-dimensional corpus rebalancing a training-data pipeline runs "
    "when both language and source mix must hit targets at once. "
    "Integer 1e9-share arithmetic throughout (see module comment): "
    "scale-free, overflow-proof, bit-identical across engines; "
    "tests/test_round7_ops.py proves the fitted margins land within "
    "the floor-rounding tolerance of the targets.",
    tags=("analytics", "stats"),
)
def weights_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rag_application_with_vectordb_spark.sources.catalog import load_table

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    S = _IPF_SCALE
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .localCheckpoint()
    )
    tot = cells.agg(
        F.sum("n_docs").cast("bigint").alias("n"),
        F.countDistinct("lang").cast("bigint").alias("nl"),
        F.countDistinct("source").cast("bigint").alias("ns"),
    ).collect()[0]
    n, t_l, t_s = int(tot.n), S // int(tot.nl), S // int(tot.ns)
    c0 = cells.withColumn("c", F.expr(f"(n_docs * {S}) div {n}")).localCheckpoint()
    c = c0
    for _ in range(_IPF_ROUNDS):
        sl = c.groupBy("lang").agg(F.sum("c").cast("bigint").alias("s"))
        c = (
            c.join(sl, "lang")
            .withColumn("c", F.expr(f"(c * {t_l}) div s"))
            .drop("s")
        )
        sc = c.groupBy("source").agg(F.sum("c").cast("bigint").alias("s"))
        c = (
            c.join(sc, "source")
            .withColumn("c", F.expr(f"(c * {t_s}) div s"))
            .drop("s")
            .localCheckpoint()
        )
    return (
        c.select("lang", "source", "n_docs", F.col("c").alias("cf"))
        .join(c0.select("lang", "source", F.col("c").alias("ci")), ["lang", "source"])
        .select(
            "lang",
            "source",
            "n_docs",
            (F.col("cf").cast("double") / F.col("ci").cast("double")).alias("raked_weight"),
            (F.col("cf").cast("double") / F.lit(float(S))).alias("raked_share"),
        )
        .orderBy(F.asc("lang"), F.asc("source"))
    )


# --- sample-ratio-mismatch (SRM) guardrail -------------------------------------


def _srm_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('ab42|', CAST(user_id AS {str_t})))"
    return f"""
    WITH per_user AS (
      SELECT user_id FROM events GROUP BY user_id
    ),
    armed AS (
      SELECT CASE WHEN {hexfn(key)} % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      FROM per_user
    ),
    counts AS (
      SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM armed
    )
    SELECT na AS n_a, nb AS n_b,
           CAST((na - nb) * (na - nb) AS DOUBLE) / CAST(na + nb AS DOUBLE)
             AS chi2_srm,
           CASE WHEN CAST((na - nb) * (na - nb) AS DOUBLE)
                     / CAST(na + nb AS DOUBLE) > 3.841458820694124
                THEN TRUE ELSE FALSE END AS srm_flag
    FROM counts
    """


def _register_srm():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    @register(
        "ab_test_srm",
        oracle=_srm_sql(duck_hex13_to_long, "VARCHAR"),
        doc="Sample-ratio-mismatch guardrail for the ab_test_spend_welch "
        "setup: chi-square goodness-of-fit of the md5-keyed arm counts "
        "against the designed 50/50 split — (na-nb)^2/(na+nb) for two "
        "cells — flagged at the 95% critical value (shared literal; "
        "neither engine evaluates the chi-square quantile). SRM is the "
        "FIRST check an experiment platform runs: a significant imbalance "
        "means assignment or logging is broken and every downstream "
        "read-out is invalid. One user-distinct aggregate and a 2-cell "
        "roll-up; all integers until the final division.",
        tags=("analytics", "stats"),
    )
    def ab_test_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, ("events",))
        return spark.sql(_srm_sql(_spark_hex13, "STRING"))

    return ab_test_srm


_register_srm()


# --- degree assortativity of the co-purchase graph -----------------------------

_ASSORT_ORACLE = """
    WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    prs AS MATERIALIZED (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    edges AS (SELECT pa AS src, pb AS dst FROM prs
              UNION ALL SELECT pb AS src, pa AS dst FROM prs),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY src),
    ed AS (
      SELECT ds.d AS j, dd.d AS k
      FROM edges e JOIN deg ds ON ds.node = e.src
                   JOIN deg dd ON dd.node = e.dst
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(j) AS BIGINT) AS sj, CAST(SUM(k) AS BIGINT) AS sk,
             CAST(SUM(j * k) AS BIGINT) AS sjk,
             CAST(SUM(j * j) AS BIGINT) AS sjj, CAST(SUM(k * k) AS BIGINT) AS skk
      FROM ed
    )
    SELECT m AS n_directed_edges,
           CAST((CAST(m AS DOUBLE) * CAST(sjk AS DOUBLE)
                 - CAST(sj AS DOUBLE) * CAST(sk AS DOUBLE))
                / (SQRT(CAST(m AS DOUBLE) * CAST(sjj AS DOUBLE)
                        - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
                   * SQRT(CAST(m AS DOUBLE) * CAST(skk AS DOUBLE)
                          - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)))
             AS DOUBLE) AS assortativity
    FROM m
    """


@register(
    "graph_assortativity",
    oracle=_ASSORT_ORACLE,
    doc="Degree assortativity coefficient (Newman 2002) of the "
    "co-purchase part graph: Pearson correlation of endpoint degrees "
    "over the symmetrized directed edge list — positive means hubs "
    "link to hubs (social-network-like), negative means hub-periphery "
    "(retail baskets typically skew negative). Degrees join onto the "
    "edge relation from one keyed aggregate; co-moments over edges "
    "are exact BIGINT with the one fp expression at the end — the "
    "same moment discipline as the ACF/CCF family, applied to graph "
    "structure. Complements graph_kcore (which EXTRACTS the core this "
    "statistic detects the existence of). Spark side localCheckpoints "
    "the bounded co-purchase pair relation ONCE (the pagerank/kcore "
    "graph-input rule): as a shared-SQL CTE the basket self-join was "
    "re-inlined per reference — 24 fact scans, 0 reused exchanges, "
    "~105 s at sf10 vs ~35 s after (the oracle keeps the brute CTE "
    "form, MATERIALIZED for the same reason on the DuckDB side).",
    tags=("analytics", "graph"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    prs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("nco"))
        .filter(F.col("nco") >= 2)
        .select("pa", "pb")
        .localCheckpoint()  # bounded co-purchase graph; pair-gen runs ONCE
    )
    edges = prs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        prs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    ds = deg.select(F.col("node").alias("sn"), F.col("d").alias("j"))
    dd = deg.select(F.col("node").alias("dn"), F.col("d").alias("k"))
    ed = (
        edges.join(ds, F.col("src") == F.col("sn"))
        .join(dd, F.col("dst") == F.col("dn"))
        .select("j", "k")
    )
    m = ed.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("j").cast("bigint").alias("sj"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("j") * F.col("k")).cast("bigint").alias("sjk"),
        F.sum(F.col("j") * F.col("j")).cast("bigint").alias("sjj"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
    )
    md, sj, sk = F.col("m").cast("double"), F.col("sj").cast("double"), F.col("sk").cast("double")
    sjk, sjj, skk = F.col("sjk").cast("double"), F.col("sjj").cast("double"), F.col("skk").cast("double")
    return m.select(
        F.col("m").alias("n_directed_edges"),
        (
            (md * sjk - sj * sk)
            / (F.sqrt(md * sjj - sj * sj) * F.sqrt(md * skk - sk * sk))
        )
        .cast("double")
        .alias("assortativity"),
    )


# --- OLS influence diagnostics (leverage + Cook's distance) --------------------

_sql_query(
    "regress_influence_cooks",
    """
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS yc
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yc) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(yc * yc) AS BIGINT) AS syy,
             CAST(SUM(x * yc) AS BIGINT) AS sxy
      FROM per_user
    ),
    b AS (
      SELECT n, sx, sy, sxx,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta1,
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS sxx_c,
             (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE) AS syy_c,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE) AS sxy_c
      FROM m
    ),
    g AS (
      SELECT n, sx, sxx_c, beta1,
             (CAST(sy AS DOUBLE) - beta1 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
               AS beta0,
             (syy_c - beta1 * sxy_c) / (CAST(n AS DOUBLE) - 2.0) AS s2
      FROM b
    ),
    scored AS (
      SELECT u.user_id, u.x, u.yc,
             CAST(u.yc AS DOUBLE) - g.beta0 - g.beta1 * CAST(u.x AS DOUBLE) AS resid,
             1.0 / CAST(g.n AS DOUBLE)
               + (CAST(u.x AS DOUBLE) - CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))
                 * (CAST(u.x AS DOUBLE) - CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))
                 / g.sxx_c AS h,
             g.s2
      FROM per_user u CROSS JOIN g
    ),
    cooks AS (
      SELECT user_id, x, yc, resid, h,
             CAST(round(1000000.0 * (resid * resid / (2.0 * s2))
                        * (h / ((1.0 - h) * (1.0 - h)))) AS BIGINT) AS cooks_micro
      FROM scored
    )
    SELECT user_id, x AS n_events, yc AS spend_cents,
           round(resid / 100.0, 6) AS resid_dollars,
           round(h, 6) AS leverage,
           CAST(cooks_micro AS DOUBLE) / 1000000.0 AS cooks_d
    FROM cooks
    ORDER BY cooks_micro DESC, user_id ASC
    LIMIT 10
    """,
    doc="OLS influence diagnostics for the spend ~ activity regression "
    "(regress_spend_on_activity's model): per-user leverage h_i = 1/n "
    "+ (x-xbar)^2/Sxx and Cook's distance D_i = e_i^2/(2 s^2) * "
    "h_i/(1-h_i)^2, reporting the 10 most influential users — the "
    "'which rows move my model' audit run before trusting any fitted "
    "slope on heavy-tailed data. SSE comes from the algebraic "
    "identity Syy_c - beta1*Sxy_c (exact co-moments; NO per-row fp "
    "residual sum, which would be summation-order-dependent), each "
    "row's D is one fixed fp chain from exact integers, and the "
    "ranking key is D on the 1e-6 grid with user_id tiebreak (the "
    "BM25 rounding rule) so top-10 membership can't flap on a last "
    "ulp. Two fact scans (per-user grain feeds both the moment "
    "roll-up and the scoring pass — the ACF twice-referenced-relation "
    "shape); top-10 via TakeOrdered.",
    tags=("analytics", "stats"),
)


# --- quantile normalization of per-source length distributions -----------------

_QNORM_ORACLE = """
    WITH d AS (
      SELECT doc_id, source, n_chars FROM documents
    ),
    ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM d GROUP BY source),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    r AS (
      SELECT d.doc_id, d.source, d.n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY d.source
                                     ORDER BY d.n_chars ASC, d.doc_id ASC) AS BIGINT)
               AS rnk,
             ns.n_s
      FROM d JOIN ns ON ns.source = d.source
    ),
    h AS (
      SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY n_chars
    ),
    cum AS (
      SELECT v, SUM(c) OVER (ORDER BY v ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM h
    ),
    keyed AS (
      SELECT doc_id, source, n_chars, rnk,
             CAST((((2 * rnk - 1) * nt.n + n_s)
                    - (((2 * rnk - 1) * nt.n + n_s) % (2 * n_s)))
                   / (2 * n_s) AS BIGINT) AS k
      FROM r CROSS JOIN nt
    )
    SELECT k2.doc_id, k2.source, k2.n_chars, k2.rnk AS source_rank,
           CAST(MIN(cum.v) AS BIGINT) AS normalized_chars
    FROM keyed k2 JOIN cum ON cum.cc >= k2.k
    GROUP BY k2.doc_id, k2.source, k2.n_chars, k2.rnk
    """


@register(
    "feature_quantile_normalize",
    oracle=_QNORM_ORACLE,
    doc="Quantile normalization: each document's length is replaced by "
    "the POOLED distribution's value at the same quantile its rank "
    "holds WITHIN its source — the transform that forces every "
    "source's feature distribution onto a common shape (the "
    "bioinformatics/array-normalization classic, used in curation to "
    "neutralize per-source length bias before mixing). Exact integer "
    "construction: within-source ranks DECOMPOSED as per-source "
    "length-histogram base + tie rank keyed by (source, n_chars) — a "
    "window partitioned by the ~handful of sources would sort "
    "N/|sources| fact rows per task (r10; the oracle keeps the coarse "
    "window form), pooled quantile "
    "rank k = round-half-up midpoint scaling (2r-1)n/(2n_s) as an "
    "EXPLICIT floor division (a - a%b)/b — a bare CAST(a/b AS BIGINT) "
    "truncates in Spark but rounds half-even in DuckDB, the classic "
    "cross-engine trap; the exact-multiple quotient is fp64-exact in "
    "both. The rank->value lookup is MIN(v) over "
    "the cumulative histogram of the length DOMAIN (the "
    "AUC/KS histogram discipline) — the fanout is |domain| per doc "
    "at worst and the broadcast side is domain-sized. Fully "
    "deterministic: ranks tiebreak on doc_id, everything is BIGINT. "
    "The length domain is value-bounded but can reach millions of "
    "distinct values on a 100 TB corpus, so since r10 the domain "
    "prefix sum runs on the distributed two-level prefix sum "
    "(operators/prefix.py) — zero single-partition stages; the oracle "
    "keeps the global-window SQL.",
    tags=("analytics", "feature"),
)
def feature_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import bucketed_running_sum

    tune(spark)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    ns = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n_s"))
    nt = d.agg(F.count("*").cast("bigint").alias("__nt"))
    # Within-source rank DECOMPOSED (r10): a row_number window
    # partitioned by the ~handful of sources sorts N/|sources| fact
    # rows per task (the percentile_exact OOM class). Instead:
    # rnk = (# same-source docs with a strictly smaller length)   [base]
    #     + (rank of doc_id among same (source, length) docs)     [fine]
    # base comes from the per-source DISTINCT-length histogram
    # cumulative (value-domain grain); fine is a window keyed by the
    # full (source, n_chars) pair — groups are ties only, never the
    # source's whole corpus. Bit-identical to the coarse window.
    hs = d.groupBy("source", "n_chars").agg(F.count("*").cast("bigint").alias("__c"))
    wcs = (
        Window.partitionBy("source")
        .orderBy(F.asc("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = hs.withColumn("__cum", F.sum("__c").over(wcs)).select(
        "source", "n_chars", (F.col("__cum") - F.col("__c")).alias("__base")
    )
    fine = F.row_number().over(
        Window.partitionBy("source", "n_chars").orderBy(F.asc("doc_id"))
    )
    r = (
        d.join(ns, "source")
        .join(base, ["source", "n_chars"])
        .withColumn("rnk", (F.col("__base") + fine).cast("bigint"))
        .drop("__base")
    )
    h = d.groupBy(F.col("n_chars").alias("v")).agg(F.count("*").cast("bigint").alias("c"))
    cum = bucketed_running_sum(h, value_col="c", lead_col="v", out_col="cc").select(
        "v", "cc"
    )
    a = (2 * F.col("rnk") - 1) * F.col("__nt") + F.col("n_s")
    b = 2 * F.col("n_s")
    keyed = r.crossJoin(F.broadcast(nt)).withColumn(
        "k", ((a - a % b) / b).cast("bigint")
    )
    return (
        keyed.join(cum, F.col("cc") >= F.col("k"))
        .groupBy("doc_id", "source", "n_chars", "rnk")
        .agg(F.min("v").cast("bigint").alias("normalized_chars"))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("rnk").alias("source_rank"),
            "normalized_chars",
        )
    )


# --- difference-in-differences read-out ----------------------------------------


def _did_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('ab42|', CAST(user_id AS {str_t})))"
    return f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN {hexfn(key)} % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
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
    agg AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(post_cents - pre_cents) AS BIGINT) AS sd,
             CAST(SUM((post_cents - pre_cents) * (post_cents - pre_cents)) AS BIGINT)
               AS sdd
      FROM per_user GROUP BY arm
    ),
    w AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN n END) AS na,
        MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
        MAX(CASE WHEN arm = 'A' THEN sd END) AS sda,
        MAX(CASE WHEN arm = 'B' THEN sd END) AS sdb,
        MAX(CASE WHEN arm = 'A' THEN sdd END) AS sdda,
        MAX(CASE WHEN arm = 'B' THEN sdd END) AS sddb
      FROM agg
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(sda AS DOUBLE) / (100.0 * na) AS delta_a_dollars,
           CAST(sdb AS DOUBLE) / (100.0 * nb) AS delta_b_dollars,
           CAST(sda AS DOUBLE) / (100.0 * na)
             - CAST(sdb AS DOUBLE) / (100.0 * nb) AS did_dollars,
           SQRT(((CAST(sdda AS DOUBLE) - CAST(sda AS DOUBLE) * sda / na) / (na - 1)) / na
                + ((CAST(sddb AS DOUBLE) - CAST(sdb AS DOUBLE) * sdb / nb) / (nb - 1)) / nb)
             / 100.0 AS se_dollars
    FROM w
    """


def _register_did():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    @register(
        "ab_test_diff_in_diff",
        oracle=_did_sql(duck_hex13_to_long, "VARCHAR"),
        doc="Difference-in-differences read-out on the md5-keyed arms: "
        "per-user spend delta (post minus pre period, the CUPED split) "
        "averaged per arm, DiD = delta_A - delta_B with its standard "
        "error from exact per-arm delta moments — the quasi-"
        "experimental estimator used when arms differ at baseline "
        "(plain post-period comparison confounds pre-existing level "
        "differences; differencing each user against their own "
        "pre-period removes them). One user-keyed aggregate (exact "
        "BIGINT cents), a 2-row arm roll-up pivoted by MAX(CASE), and "
        "a fixed fp64 chain — the Welch/CUPED moment discipline.",
        tags=("analytics", "stats"),
    )
    def ab_test_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, ("events",))
        return spark.sql(_did_sql(_spark_hex13, "STRING"))

    return ab_test_diff_in_diff


_register_did()


# --- equi-width histogram of purchase values -----------------------------------

_sql_query(
    "events_value_histogram",
    """
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    b AS (
      SELECT CAST(MIN(cents) AS BIGINT) AS lo,
             CAST(MAX(cents) - MIN(cents) + 1 AS BIGINT) AS span
      FROM v
    ),
    binned AS (
      SELECT CAST((((cents - lo) * 20)
                   - (((cents - lo) * 20) % span)) / span AS BIGINT) AS bin
      FROM v CROSS JOIN b
    )
    SELECT bin,
           CAST(b.lo + (bin * b.span - ((bin * b.span) % 20)) / 20 AS BIGINT)
             AS bin_lo_cents,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM binned CROSS JOIN b
    GROUP BY bin, b.lo, b.span
    ORDER BY bin ASC
    """,
    doc="Equi-width 20-bin histogram of purchase values — the basic EDA "
    "profile. Bin index and bin lower bound are EXPLICIT floor "
    "divisions via the exact-multiple identity (a - a%b)/b on exact "
    "integer cents (bare CAST(a/b AS BIGINT) truncates in Spark but "
    "rounds half-even in DuckDB — the quantile-normalize rule); the "
    "[min, max] range comes from one broadcast 2-value roll-up, so "
    "the histogram is one scan + one 20-cell aggregate at any SF. "
    "Only occupied bins emit rows.",
    tags=("analytics",),
)


# --- weekly revenue bridge (growth accounting) ---------------------------------

_sql_query(
    "revenue_bridge_weekly",
    """
    WITH p AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, date_trunc('week', ts)
    ),
    mx AS (SELECT MAX(wk) AS max_wk FROM p),
    j AS (
      SELECT COALESCE(cur.wk, prv.wk + INTERVAL 7 DAY) AS wk,
             COALESCE(cur.cents, 0) AS c_cur,
             COALESCE(prv.cents, 0) AS c_prv
      FROM p cur
      FULL OUTER JOIN p prv
        ON prv.user_id = cur.user_id AND cur.wk = prv.wk + INTERVAL 7 DAY
    )
    SELECT CAST(wk AS DATE) AS week,
           CAST(SUM(CASE WHEN c_prv = 0 THEN c_cur ELSE 0 END) AS BIGINT)
             AS gained_cents,
           CAST(-SUM(CASE WHEN c_cur = 0 THEN c_prv ELSE 0 END) AS BIGINT)
             AS churned_cents,
           CAST(SUM(CASE WHEN c_cur > 0 AND c_prv > 0 AND c_cur > c_prv
                         THEN c_cur - c_prv ELSE 0 END) AS BIGINT)
             AS expansion_cents,
           CAST(SUM(CASE WHEN c_cur > 0 AND c_prv > 0 AND c_cur < c_prv
                         THEN c_cur - c_prv ELSE 0 END) AS BIGINT)
             AS contraction_cents,
           CAST(SUM(c_cur - c_prv) AS BIGINT) AS net_change_cents,
           CAST(SUM(c_cur) AS BIGINT) AS total_cents
    FROM j CROSS JOIN mx
    WHERE wk <= max_wk
    GROUP BY wk
    ORDER BY wk ASC
    """,
    doc="Weekly revenue bridge / growth accounting: each week's revenue "
    "delta decomposed into gained (user paid this week, not last), "
    "churned (paid last week, not this), expansion and contraction of "
    "retained payers — the SaaS growth-accounting identity total_w = "
    "total_{w-1} + gained + churned + expansion + contraction, which "
    "the pytest asserts telescopes exactly. One fact scan to (user, "
    "week) grain (exact cents), one self FULL OUTER JOIN aligned on "
    "user and week+7d (keyed on user_id — never a calendar cross "
    "join), and a week-grain roll-up; the phantom week after the last "
    "observed week is filtered by a broadcast 1-value max. Weeks "
    "truncate Monday-start identically in both engines.",
    tags=("analytics", "timeseries"),
)


# --- cohort LTV curve ----------------------------------------------------------


def _ltv_sql(ddiff) -> str:
    """``ddiff(end, start)`` renders whole-day difference — the only
    dialect split (Spark datediff(end, start) vs DuckDB
    date_diff('day', start, end))."""
    age = ddiff("CAST(date_trunc('week', e.ts) AS DATE)", "f.cohort_wk")
    return f"""
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_wk
      FROM events GROUP BY user_id
    ),
    cs AS (SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS n_users FROM f GROUP BY cohort_wk),
    sp AS (
      SELECT f.cohort_wk,
             CAST({age} / 7 AS BIGINT) AS age_wk,
             CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events e JOIN f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY f.cohort_wk, {age}
    ),
    cum AS (
      SELECT cohort_wk, age_wk,
             SUM(cents) OVER (PARTITION BY cohort_wk ORDER BY age_wk ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cents
      FROM sp
    )
    SELECT cum.cohort_wk AS cohort_week, cum.age_wk AS week_age, cs.n_users,
           CAST(cum.cum_cents AS DOUBLE) / (100.0 * cs.n_users)
             AS cum_spend_per_user
    FROM cum JOIN cs ON cs.cohort_wk = cum.cohort_wk
    ORDER BY cohort_week ASC, week_age ASC
    """


@register(
    "cohort_ltv_curve",
    oracle=_ltv_sql(lambda e, s: f"date_diff('day', {s}, {e})"),
    doc="Cohort LTV curve: average cumulative purchase spend per user by "
    "signup-cohort week and week age — the lifetime-value read-out "
    "layered on retention_cohorts' activity triangle (retention says "
    "who comes back; LTV says what that is worth). The fact joins the "
    "broadcast-sized first-seen map, collapses to (cohort, age) grain "
    "in exact cents, and the cumulative sum is a window over the "
    "calendar-bounded cohort x age triangle — never over users. "
    "week-age via day difference of Monday-truncated weeks (always a "
    "multiple of 7, so the /7 is exact; the 2-arg-vs-3-arg datediff "
    "is the one dialect split, parameterized like the KM epochsec).",
    tags=("analytics", "timeseries"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ltv_sql(lambda e, s: f"datediff({e}, {s})"))


# --- daily order backlog (interval boundary sweep) -----------------------------

_sql_query(
    "orders_backlog_daily",
    """
    WITH ship AS (
      SELECT l_orderkey, MAX(l_shipdate) AS last_ship
      FROM lineitem GROUP BY l_orderkey
    ),
    o AS (
      SELECT ord.o_orderkey, ord.o_orderdate AS od, s.last_ship
      FROM orders ord JOIN ship s ON s.l_orderkey = ord.o_orderkey
    ),
    bounds AS (
      SELECT od AS day, CAST(1 AS BIGINT) AS delta FROM o
      UNION ALL
      SELECT CAST(last_ship + INTERVAL 1 DAY AS DATE) AS day,
             CAST(-1 AS BIGINT) AS delta FROM o
    ),
    g AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS d FROM bounds GROUP BY day),
    c AS (
      SELECT day,
             SUM(d) OVER (ORDER BY day ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS backlog
      FROM g
    )
    SELECT CAST(day AS DATE) AS day, CAST(backlog AS BIGINT) AS open_orders
    FROM c ORDER BY day ASC
    """,
    doc="Daily order backlog: how many orders were placed but not yet "
    "fully shipped on each calendar day — an order is open from its "
    "order date through its LAST line's ship date (inclusive). The "
    "events_active_users interval-sweep discipline applied to the "
    "TPC-H facts: each order contributes one +1 and one -1 boundary, "
    "boundaries collapse to day grain (one keyed aggregate), and the "
    "backlog is a prefix sum over the bounded date DOMAIN — never a "
    "day x order range join (which would replicate every order by "
    "its open duration). The per-order last-ship aggregate is the "
    "only fact-sized shuffle (keyed on l_orderkey).",
    tags=("analytics", "timeseries"),
)


# --- price elasticity per brand (group-wise log-log OLS) -----------------------

_sql_query(
    "price_elasticity_by_brand",
    """
    WITH li AS (
      SELECT p.p_brand,
             CAST(round(ln(CAST(l.l_extendedprice AS DOUBLE)
                           / CAST(l.l_quantity AS DOUBLE)) * 1000.0) AS BIGINT)
               AS lnp,
             CAST(round(ln(CAST(l.l_quantity AS DOUBLE)) * 1000.0) AS BIGINT)
               AS lnq
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    m AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(lnp) AS BIGINT) AS sx, CAST(SUM(lnq) AS BIGINT) AS sy,
             CAST(SUM(lnp * lnp) AS BIGINT) AS sxx,
             CAST(SUM(lnp * lnq) AS BIGINT) AS sxy,
             CAST(SUM(lnq * lnq) AS BIGINT) AS syy
      FROM li GROUP BY p_brand
    )
    SELECT p_brand, n AS n_lines,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS elasticity,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
    FROM m WHERE n >= 30
    ORDER BY p_brand ASC
    """,
    doc="Per-brand price elasticity: GROUP-WISE log-log OLS of quantity "
    "on unit price (slope = %dQ/%dP, with R^2) — the pricing-analytics "
    "staple, and the catalog's first per-group regression (the global "
    "OLS queries roll up to one row; this one fits |brands| models in "
    "the same single aggregate pass). Both log coordinates land on "
    "the 1e-6 grid BEFORE the co-moment sums (the Zipf-fit rule: "
    "exact BIGINT moments, one fp chain per group at the end — on the "
    "1e-3 grid, not 1e-6: squared 1e-6-grid logs overflow int64 near "
    "2e5 rows/group, and 0.1% log precision is far below the slope's "
    "sampling error; the coarse grid is exact to ~1e9 rows/group); groups "
    "under 30 lines are suppressed. One fact scan, dims broadcast, "
    "one shuffle on the brand key.",
    tags=("analytics", "stats"),
)


# --- per-arm conversion rate with Wilson confidence intervals ------------------


def _wilson_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('ab42|', CAST(user_id AS {str_t})))"
    z2 = "3.8414588206941245"  # z^2 at 95% (z = 1.959963984540054), shared literal
    z = "1.959963984540054"
    return f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN {hexfn(key)} % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS k
      FROM per_user GROUP BY arm
    )
    SELECT arm, n AS n_users, k AS n_converted,
           CAST(k AS DOUBLE) / n AS conv_rate,
           (CAST(k AS DOUBLE) / n + {z2} / (2 * n)
            - {z} * SQRT((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n
                         + {z2} / (4.0 * n * n)))
             / (1.0 + {z2} / n) AS wilson_lo,
           (CAST(k AS DOUBLE) / n + {z2} / (2 * n)
            + {z} * SQRT((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n
                         + {z2} / (4.0 * n * n)))
             / (1.0 + {z2} / n) AS wilson_hi
    FROM c ORDER BY arm ASC
    """


def _register_wilson():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    @register(
        "ab_test_wilson_ci",
        oracle=_wilson_sql(duck_hex13_to_long, "VARCHAR"),
        doc="Per-arm conversion rate (any purchase) with Wilson 95% score "
        "intervals — the binomial-CI read-out that stays sane at small "
        "n and extreme rates where the naive Wald interval leaves "
        "[0,1] (the reason experiment UIs quote Wilson). z and z^2 "
        "are shared literals (neither engine evaluates a normal "
        "quantile); the interval is one fixed fp chain from the exact "
        "(n, k) integers per arm. One user-keyed aggregate + 2-row "
        "roll-up, the SRM/Welch plan shape.",
        tags=("analytics", "stats"),
    )
    def ab_test_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, ("events",))
        return spark.sql(_wilson_sql(_spark_hex13, "STRING"))

    return ab_test_wilson_ci


_register_wilson()


# --- per-arm funnel with two-proportion z per step -----------------------------


def _ab_funnel_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('ab42|', CAST(e.user_id AS {str_t})))"
    return f"""
    WITH armed AS (
      SELECT e.user_id, e.ts, e.event_type,
             CASE WHEN {hexfn(key)} % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      FROM events e
    ),
    s AS (
      SELECT user_id, arm, MIN(ts) AS signup_ts
      FROM armed WHERE event_type = 'signup' GROUP BY user_id, arm
    ),
    c AS (
      SELECT e.user_id, e.arm, MIN(e.ts) AS click_ts
      FROM armed e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY e.user_id, e.arm
    ),
    p AS (
      SELECT e.user_id, e.arm, MIN(e.ts) AS purchase_ts
      FROM armed e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id, e.arm
    ),
    counts AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS sa,
        CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS sb,
        (SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) FROM c) AS ca,
        (SELECT CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) FROM c) AS cb,
        (SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) FROM p) AS pa,
        (SELECT CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) FROM p) AS pb
      FROM s
    ),
    steps AS (
      SELECT CAST(2 AS BIGINT) AS step_no, 'signup->click' AS step,
             ca AS ka, sa AS na, cb AS kb, sb AS nb FROM counts
      UNION ALL
      SELECT CAST(3 AS BIGINT) AS step_no, 'click->purchase' AS step,
             pa AS ka, ca AS na, pb AS kb, cb AS nb FROM counts
    )
    SELECT step_no, step, na AS n_a, ka AS k_a, nb AS n_b, kb AS k_b,
           CAST(ka AS DOUBLE) / NULLIF(na, 0) AS conv_a,
           CAST(kb AS DOUBLE) / NULLIF(nb, 0) AS conv_b,
           CASE WHEN na > 0 AND nb > 0 AND ka + kb > 0 AND ka + kb < na + nb THEN
             (CAST(ka AS DOUBLE) / na - CAST(kb AS DOUBLE) / nb)
               / SQRT((CAST(ka + kb AS DOUBLE) / (na + nb))
                      * (1.0 - CAST(ka + kb AS DOUBLE) / (na + nb))
                      * (1.0 / na + 1.0 / nb))
           ELSE NULL END AS z_pooled
    FROM steps ORDER BY step_no ASC
    """


def _register_ab_funnel():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    @register(
        "ab_test_funnel_steps",
        oracle=_ab_funnel_sql(duck_hex13_to_long, "VARCHAR"),
        doc="Per-arm ordered funnel (first signup -> later click -> later "
        "purchase, the funnel_signup_click_purchase chain keyed by the "
        "md5 arms) with a pooled two-proportion z-test per transition "
        "— the 'which step did the treatment move' read-out layered "
        "on the funnel machinery (overall conversion can be flat while "
        "one step improves and another regresses). Step shapes are the "
        "funnel queries' keyed min-joins with monotonically shrinking "
        "inputs; the z assembles from the six exact step counts in one "
        "fixed fp chain. Spark plan: ONE events scan + one shuffle on "
        "user_id — the three step timestamps are sequential MIN windows "
        "over the same user partitioning (each conditioned on the "
        "previous step's time), then one per-user roll-up and a 1-row "
        "checkpointed count relation fanned into the two step rows. "
        "The former shared-SQL chain re-inlined armed->s->c->p per "
        "reference: 16 events scans, ~32 s at sf10 vs ~10 s after. The "
        "DuckDB oracle keeps the join-chain form (CTE semantics differ "
        "there).",
        tags=("analytics", "stats"),
    )
    def ab_test_funnel_steps(spark, sf_dir):
        from pyspark.sql import Window

        tune(spark)
        register_views(spark, sf_dir, ("events",))
        ev = spark.table("events")
        arm_key = _spark_hex13(
            "md5(concat('ab42|', CAST(user_id AS STRING)))"
        )
        armed = ev.select(
            "user_id",
            "ts",
            "event_type",
            F.when(F.expr(arm_key) % 2 == 0, F.lit("A"))
            .otherwise(F.lit("B"))
            .alias("arm"),
        )
        w = Window.partitionBy("user_id")
        staged = (
            armed.withColumn(
                "signup_ts",
                F.min(
                    F.when(F.col("event_type") == "signup", F.col("ts"))
                ).over(w),
            )
            .withColumn(
                "click_ts",
                F.min(
                    F.when(
                        (F.col("event_type") == "click")
                        & (F.col("ts") > F.col("signup_ts")),
                        F.col("ts"),
                    )
                ).over(w),
            )
            .withColumn(
                "purchase_ts",
                F.min(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.col("ts") > F.col("click_ts")),
                        F.col("ts"),
                    )
                ).over(w),
            )
        )
        per_user = staged.groupBy("user_id", "arm").agg(
            F.max("signup_ts").alias("signup_ts"),
            F.max("click_ts").alias("click_ts"),
            F.max("purchase_ts").alias("purchase_ts"),
        )

        def _n(arm: str, col: str):
            return F.sum(
                F.when(
                    (F.col("arm") == arm) & F.col(col).isNotNull(), F.lit(1)
                ).otherwise(F.lit(0))
            ).cast("bigint")

        counts = per_user.agg(
            _n("A", "signup_ts").alias("sa"),
            _n("B", "signup_ts").alias("sb"),
            _n("A", "click_ts").alias("ca"),
            _n("B", "click_ts").alias("cb"),
            _n("A", "purchase_ts").alias("pa"),
            _n("B", "purchase_ts").alias("pb"),
        ).localCheckpoint()  # 1 row; fanned into two step rows below
        steps = counts.select(
            F.lit(2).cast("bigint").alias("step_no"),
            F.lit("signup->click").alias("step"),
            F.col("ca").alias("ka"),
            F.col("sa").alias("na"),
            F.col("cb").alias("kb"),
            F.col("sb").alias("nb"),
        ).unionByName(
            counts.select(
                F.lit(3).cast("bigint").alias("step_no"),
                F.lit("click->purchase").alias("step"),
                F.col("pa").alias("ka"),
                F.col("ca").alias("na"),
                F.col("pb").alias("kb"),
                F.col("cb").alias("nb"),
            )
        )
        ka, na = F.col("ka").cast("double"), F.col("na")
        kb, nb = F.col("kb").cast("double"), F.col("nb")
        pool = (F.col("ka") + F.col("kb")).cast("double") / (
            F.col("na") + F.col("nb")
        )
        z = (ka / na - kb / nb) / F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (F.lit(1.0) / na + F.lit(1.0) / nb)
        )
        guard = (
            (F.col("na") > 0)
            & (F.col("nb") > 0)
            & (F.col("ka") + F.col("kb") > 0)
            & (F.col("ka") + F.col("kb") < F.col("na") + F.col("nb"))
        )
        return steps.select(
            "step_no",
            "step",
            F.col("na").alias("n_a"),
            F.col("ka").alias("k_a"),
            F.col("nb").alias("n_b"),
            F.col("kb").alias("k_b"),
            (ka / F.nullif(na, F.lit(0))).alias("conv_a"),
            (kb / F.nullif(nb, F.lit(0))).alias("conv_b"),
            F.when(guard, z).otherwise(F.lit(None).cast("double")).alias("z_pooled"),
        ).orderBy(F.asc("step_no"))

    return ab_test_funnel_steps


_register_ab_funnel()


# --- inter-arrival time distribution: exponential fit + KS GoF -----------------


def _interarrival_sql(epochsec) -> str:
    return f"""
    WITH pe AS (
      SELECT user_id, ts, {epochsec("ts")} AS es
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT CAST(((es - LAG(es) OVER (PARTITION BY user_id ORDER BY es ASC))
                   - ((es - LAG(es) OVER (PARTITION BY user_id ORDER BY es ASC)) % 60))
                  / 60 AS BIGINT) AS gap_min
      FROM pe
    ),
    g AS (SELECT gap_min FROM gaps WHERE gap_min IS NOT NULL),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(gap_min) AS BIGINT) AS s
      FROM g
    ),
    h AS (
      SELECT gap_min, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY gap_min
    ),
    cum AS (
      SELECT gap_min,
             SUM(c) OVER (ORDER BY gap_min ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM h
    ),
    d AS (
      SELECT cum.gap_min,
             abs(CAST(round(1000000.0 * cum.cc / m.n) AS BIGINT)
                 - (1000000 - CAST(round(1000000.0
                      * exp(-(CAST(m.n AS DOUBLE) / m.s)
                            * (CAST(cum.gap_min AS DOUBLE) + 1.0))) AS BIGINT)))
               AS dev_micro
      FROM cum CROSS JOIN m
    )
    SELECT m.n AS n_gaps,
           CAST(m.s AS DOUBLE) / m.n AS mean_gap_min,
           60.0 * CAST(m.n AS DOUBLE) / m.s AS lambda_per_hour,
           CAST((SELECT MAX(dev_micro) FROM d) AS DOUBLE) / 1000000.0 AS ks_stat
    FROM m
    """


def _register_interarrival():
    @register(
        "events_interarrival_expfit",
        oracle=_interarrival_sql(lambda e: f"CAST(floor(epoch({e})) AS BIGINT)"),
        doc="Inter-purchase-arrival distribution: per-user gaps (keyed "
        "window — never a global event sort) coarsened to whole "
        "minutes, exponential MLE rate lambda = n/sum(gaps), and a "
        "KS goodness-of-fit statistic against Exp(lambda) evaluated "
        "at each minute-bucket's right edge — the queueing-model "
        "sanity check (memoryless arrivals?) behind capacity planning "
        "and the burstiness question CUSUM monitors operationally. "
        "The ECDF comes from the cumulative histogram over the "
        "bounded minute-gap DOMAIN (the AUC discipline), both CDFs "
        "land on the 1e-6 grid before the integer sup-deviation, and "
        "the one transcendental (exp) follows the KM rule: grid-"
        "rounded immediately so a last-ulp libm difference cannot "
        "move the statistic. Epoch seconds parameterized per engine "
        "(the KM epochsec split).",
        tags=("analytics", "stats", "timeseries"),
    )
    def events_interarrival_expfit(spark, sf_dir):
        tune(spark)
        register_views(spark, sf_dir, ("events",))
        return spark.sql(_interarrival_sql(lambda e: f"unix_timestamp({e})"))

    return events_interarrival_expfit


_register_interarrival()


# --- expectation-suite data-contract audit -------------------------------------

_sql_query(
    "audit_expectations",
    """
    WITH e1 AS (
      SELECT 'orders.o_totalprice_positive' AS expectation,
             CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_violations
      FROM orders
    ),
    e2 AS (
      SELECT 'lineitem.l_quantity_in_1_50' AS expectation,
             CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 0 ELSE 1 END)
               AS BIGINT) AS n_violations
      FROM lineitem
    ),
    e3 AS (
      SELECT 'orders.o_orderkey_unique' AS expectation,
             CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
      FROM orders
    ),
    e4 AS (
      SELECT 'events.event_type_in_enum' AS expectation,
             CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN event_type IN
                     ('signup', 'click', 'view', 'purchase', 'error')
                  THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
      FROM events
    ),
    e5 AS (
      SELECT 'documents.text_not_null_or_empty' AS expectation,
             CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN text IS NOT NULL AND length(text) > 0 THEN 0 ELSE 1 END)
               AS BIGINT) AS n_violations
      FROM documents
    ),
    e6 AS (
      SELECT 'documents.n_chars_matches_text' AS expectation,
             CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END) AS BIGINT)
               AS n_violations
      FROM documents
    ),
    u AS (
      SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
      UNION ALL SELECT * FROM e4 UNION ALL SELECT * FROM e5 UNION ALL SELECT * FROM e6
    )
    SELECT expectation, n_checked, n_violations,
           n_violations = 0 AS passed
    FROM u ORDER BY expectation ASC
    """,
    doc="Expectation-suite data-contract audit (the Great-Expectations "
    "surface): six declarative expectations — value range, enum "
    "membership, key uniqueness, non-emptiness, and a derived-column "
    "consistency check — each evaluated as one aggregate over ITS "
    "table only (column-pruned scans; the violation count folds into "
    "SUM(CASE), and uniqueness is COUNT - COUNT DISTINCT, never a "
    "self-join). Complements audit_referential_integrity (cross-table "
    "contracts) and audit_column_profile (per-column stats) with the "
    "third audit style: named, versionable pass/fail expectations a "
    "pipeline gates deployments on.",
    tags=("analytics", "audit"),
)


# --- churn label generation by cohort ------------------------------------------

_sql_query(
    "churn_labels_cohort",
    """
    WITH horizon AS (SELECT MAX(ts) AS h FROM events),
    f AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_wk,
             MAX(ts) AS last_seen
      FROM events GROUP BY user_id
    ),
    lab AS (
      SELECT f.user_id, f.cohort_wk,
             CASE WHEN f.last_seen < horizon.h - INTERVAL 14 DAY
                  THEN 1 ELSE 0 END AS churned
      FROM f CROSS JOIN horizon
    )
    SELECT cohort_wk AS cohort_week,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(churned) AS BIGINT) AS n_churned,
           CAST(SUM(churned) AS DOUBLE) / COUNT(*) AS churn_rate
    FROM lab GROUP BY cohort_wk
    ORDER BY cohort_week ASC
    """,
    doc="Churn label generation + cohort base rates: a user is labeled "
    "churned when their last activity is more than 14 days before the "
    "observation horizon (data max ts — fixed-horizon labeling, so "
    "the label set is reproducible from the snapshot alone), rolled "
    "up per signup-cohort week — the supervised-label stage of a "
    "churn model pipeline plus the base-rate table that sanity-checks "
    "it (later cohorts mechanically churn less under a fixed horizon "
    "— visible in the output, which is the point of publishing base "
    "rates next to labels). One user-keyed aggregate; the horizon is "
    "a broadcast 1-value roll-up.",
    tags=("analytics",),
)


# --- overdispersion (variance-to-mean) test per event type ---------------------

_sql_query(
    "stats_overdispersion_daily",
    """
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    cal AS (SELECT CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS nd
            FROM events),
    m AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS tot,
             CAST(SUM(c * c) AS BIGINT) AS sq
      FROM d GROUP BY event_type
    )
    SELECT m.event_type, cal.nd AS n_days, m.tot AS n_events,
           CAST(m.tot AS DOUBLE) / cal.nd AS mean_per_day,
           (CAST(m.sq AS DOUBLE)
            - CAST(m.tot AS DOUBLE) * CAST(m.tot AS DOUBLE) / cal.nd)
             / (cal.nd - 1)
             / (CAST(m.tot AS DOUBLE) / cal.nd) AS dispersion_index,
           (cal.nd - 1)
             * ((CAST(m.sq AS DOUBLE)
                 - CAST(m.tot AS DOUBLE) * CAST(m.tot AS DOUBLE) / cal.nd)
                / (cal.nd - 1)
                / (CAST(m.tot AS DOUBLE) / cal.nd)) AS chi2_dispersion
    FROM m CROSS JOIN cal
    ORDER BY m.event_type ASC
    """,
    doc="Overdispersion test per event type: variance-to-mean ratio "
    "(dispersion index) of the daily count series and the chi-square "
    "dispersion statistic (n-1)*D — the Poisson-adequacy diagnostic "
    "run before modeling counts (D >> 1 means a negative-binomial or "
    "mixed model, and Poisson-based alert thresholds will false-fire). "
    "Days with zero events of a type enter through the N-day "
    "normalizer (counts collapse to present (type, day) cells only; "
    "the variance identity Var = (sum(c^2) - tot^2/N)/(N-1) needs no "
    "zero-row materialization). Exact BIGINT moments; two fp "
    "divisions per type at the end.",
    tags=("analytics", "stats", "timeseries"),
)


# --- quantile forecast evaluation: pinball loss + coverage ---------------------

_PINBALL_H = 14  # trailing observations per forecast
#: (quantile in tenths, nearest-rank ceil(q*H) for H=14)
_PINBALL_QS = ((1, 2), (5, 7), (9, 13))

_sql_query(
    "forecast_quantile_pinball",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100.0) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    ix AS (
      SELECT day, cents,
             ROW_NUMBER() OVER (ORDER BY day ASC) AS idx
      FROM daily
    ),
    tw AS (
      SELECT a.day, a.cents AS y, b.cents AS h,
             ROW_NUMBER() OVER (PARTITION BY a.day
                                ORDER BY b.cents ASC, b.day ASC) AS rnk
      FROM ix a JOIN ix b ON b.idx BETWEEN a.idx - {_PINBALL_H} AND a.idx - 1
      WHERE a.idx > {_PINBALL_H}
    ),
    f AS (
      SELECT tw.day, tw.y, q.q10, tw.h AS fc
      FROM tw JOIN (VALUES {", ".join(f"({q10}, {rk})" for q10, rk in _PINBALL_QS)})
                AS q (q10, rk)
        ON tw.rnk = q.rk
    ),
    loss AS (
      SELECT q10, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN (y - fc) >= 0 THEN q10 * (y - fc)
                           ELSE (q10 - 10) * (y - fc) END) AS BIGINT)
               AS pinball10_cents,
             CAST(SUM(CASE WHEN y <= fc THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM f GROUP BY q10
    )
    SELECT CAST(q10 AS BIGINT) * 10 AS quantile_pct, n_days,
           CAST(pinball10_cents AS DOUBLE) / (10.0 * n_days) / 100.0
             AS mean_pinball_dollars,
           CAST(n_covered AS DOUBLE) / n_days AS coverage
    FROM loss ORDER BY quantile_pct ASC
    """,
    doc=f"Quantile forecast evaluation: forecast each day's revenue "
    f"p10/p50/p90 as the exact nearest-rank order statistics of the "
    f"trailing {_PINBALL_H} observed days, scored with the pinball "
    "(quantile) loss and empirical coverage — the probabilistic "
    "companion to forecast_snaive_mase's point metrics (a capacity "
    "plan needs the p90, not the median). The trailing windows come "
    "from a bounded self-join on the day-index (the day DOMAIN is "
    "calendar-bounded, so the |days| x H fanout is constant-size at "
    "any fact scale; the ROW_NUMBER rank-select inside each window "
    "partitions by day); pinball terms stay exact BIGINT by carrying "
    "the quantile as integer tenths (10x the loss, divided once at "
    "the end). Coverage ~ q is the calibration check.",
    tags=("analytics", "stats", "timeseries"),
)


# --- Holt-Winters additive seasonal smoothing (round-7 mining batch) -----------
#
# Extends events_holt_linear's [level, trend] array-state fold to the
# full triple-smoothing state [level, trend, s1..s7]: a 9-component
# array accumulator where position 3 (1-based) always holds the season
# of the INCOMING observation and the seasonal ring rotates one slot
# per step. The fold inlines the new-level expression (no let-binding
# in SQL lambdas — the Holt-linear precedent), so the same expression
# tree evaluates identically in Spark's aggregate() and DuckDB's
# list_reduce() (LIST accumulator; STRUCT accumulators are broken in
# DuckDB 1.0 — the documented engine note). Seasonal slots initialize
# to 0 and converge within a few weeks; the rotation indexes OBSERVED
# days, which on a dense daily series equals the calendar weekday ring
# (a gapped series would phase-shift — resample first at scale, which
# events_resample_linear provides).

_HW_SPARK_SL = (
    "(CAST(0.3 AS DOUBLE) * (v - acc[2]) "
    "+ CAST(0.7 AS DOUBLE) * (acc[0] + acc[1]))"
)
_HW_DUCK_SL = (
    "(0.3::DOUBLE * (e[1] - acc[3]) "
    "+ 0.7::DOUBLE * (acc[1] + acc[2]))"
)

_sql_query(
    "forecast_holt_winters",
    f"""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    w AS (
      SELECT day, x,
        collect_list(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS win
      FROM d
    ),
    f AS (
      SELECT day, x,
        aggregate(slice(win, 2, size(win) - 1),
          array(CAST(element_at(win, 1) AS DOUBLE), CAST(0.0 AS DOUBLE),
                CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                CAST(0.0 AS DOUBLE)),
          (acc, v) -> array(
            {_HW_SPARK_SL},
            CAST(0.1 AS DOUBLE) * ({_HW_SPARK_SL} - acc[0])
              + CAST(0.9 AS DOUBLE) * acc[1],
            acc[3], acc[4], acc[5], acc[6], acc[7], acc[8],
            CAST(0.2 AS DOUBLE) * (v - {_HW_SPARK_SL})
              + CAST(0.8 AS DOUBLE) * acc[2])) AS st
      FROM w
    )
    SELECT CAST(day AS DATE) AS day, x,
           element_at(st, 1) AS level, element_at(st, 2) AS trend,
           element_at(st, 3) AS season_next,
           element_at(st, 1) + element_at(st, 2) + element_at(st, 3)
             AS forecast_next
    FROM f
    """,
    oracle=f"""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    w AS (
      SELECT day, x,
        list(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS win
      FROM d
    ),
    f AS (
      SELECT day, x,
        list_reduce(list_transform(win, e -> [e::DOUBLE, 0.0::DOUBLE,
            0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
            0.0::DOUBLE, 0.0::DOUBLE]),
          (acc, e) -> [
            {_HW_DUCK_SL},
            0.1::DOUBLE * ({_HW_DUCK_SL} - acc[1]) + 0.9::DOUBLE * acc[2],
            acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],
            0.2::DOUBLE * (e[1] - {_HW_DUCK_SL}) + 0.8::DOUBLE * acc[3]]) AS st
      FROM w
    )
    SELECT CAST(day AS DATE) AS day, x, st[1] AS level, st[2] AS trend,
           st[3] AS season_next, st[1] + st[2] + st[3] AS forecast_next
    FROM f
    """,
    doc="Holt-Winters additive triple smoothing (level + trend + "
    "weekly seasonality, alpha=0.3 beta=0.1 gamma=0.2) of the daily "
    "purchase-revenue series: l_t = a(x_t - s_{{t-7}}) + (1-a)(l+b), "
    "b_t = beta(l_t - l) + (1-beta)b, s_t = g(x_t - l_t) + (1-g)s_{{t-7}}, "
    "folded over the calendar-bounded day series with a 9-component "
    "rotating array accumulator — the seasonal forecaster that "
    "completes the ladder events_ewma -> events_holt_linear -> here; "
    "forecast_next = level + trend + next-slot season is the "
    "one-step-ahead number a capacity planner alerts on. The fact "
    "collapses to day grain first (ONE shuffle, exact integer cents); "
    "the prefix-list window and fold then run over <= 365 rows/year "
    "whatever the fact size, and the fixed chronological fold order "
    "makes every output bit engine-identical (proven by the "
    "list_reduce twin).",
    tags=("analytics", "timeseries"),
)


# --- Qini uplift curve (round-7 mining batch) ----------------------------------


def _qini_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('ab42|', CAST(user_id AS {str_t})))"
    return f"""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS score,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ),
    armed AS (
      SELECT score, cents,
             CASE WHEN {hexfn(key)} % 2 = 0 THEN 1 ELSE 0 END AS is_t
      FROM per_user
    ),
    h AS (
      SELECT score,
             CAST(SUM(is_t) AS BIGINT) AS nt,
             CAST(SUM(1 - is_t) AS BIGINT) AS nc,
             CAST(SUM(is_t * cents) AS BIGINT) AS st,
             CAST(SUM((1 - is_t) * cents) AS BIGINT) AS sc
      FROM armed GROUP BY score
    ),
    t AS (SELECT CAST(SUM(nt + nc) AS BIGINT) AS nn FROM h),
    c AS (
      SELECT score,
        CAST(SUM(nt + nc) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
        CAST(SUM(nt) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS BIGINT) AS cnt,
        CAST(SUM(nc) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS BIGINT) AS cnc,
        CAST(SUM(st) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS BIGINT) AS cst,
        CAST(SUM(sc) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS BIGINT) AS csc
      FROM h
    ),
    d AS (
      SELECT CAST(k AS BIGINT) AS decile
      FROM (VALUES (1), (2), (3), (4), (5), (6), (7), (8), (9), (10)) AS v(k)
    ),
    sel AS (
      SELECT d.decile, MIN(c.cn) AS cn
      FROM d CROSS JOIN t JOIN c ON c.cn * 10 >= d.decile * t.nn
      GROUP BY d.decile
    )
    SELECT sel.decile, CAST(sel.cn AS BIGINT) AS n_targeted,
           c.cnt AS n_treat, c.cnc AS n_ctrl,
           c.cst AS treat_cents, c.csc AS ctrl_cents,
           CASE WHEN c.cnc = 0 THEN NULL
                ELSE (CAST(c.cst AS DOUBLE)
                      - CAST(c.csc * c.cnt AS DOUBLE) / CAST(c.cnc AS DOUBLE))
                     / 100.0
           END AS qini_dollars
    FROM sel JOIN c ON c.cn = sel.cn
    """


def _register_qini():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    @register(
        "eval_qini_uplift",
        oracle=_qini_sql(duck_hex13_to_long, "VARCHAR"),
        doc="Qini uplift curve by targeting decile: rank users by an "
        "activity score (event count), split them by the SAME "
        "keyed-md5 arm as ab_test_spend_welch, and at each decile "
        "report cumulative treatment spend minus control spend scaled "
        "to the treated count — Qini(k) = St(k) - Sc(k)*Nt(k)/Nc(k), "
        "the incremental value of targeting the top k/10 (the uplift "
        "sibling of eval_lift_gains: gains ranks a response model, "
        "Qini ranks an uplift model against the experiment's own "
        "control). Histogram form over the bounded score domain, "
        "decile cuts by smallest covering prefix, all exact BIGINT "
        "cumulative sums; the Qini value is a fixed two-division fp "
        "chain, NULL-guarded for control-free prefixes. On the "
        "fixture's independent arms the curve should hug 0 — the "
        "query is the harness, the A/A-flatness is the finding.",
        tags=("analytics", "eval"),
    )
    def eval_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .stats_queries import _spark_hex13 as hx

        tune(spark)
        register_views(spark, sf_dir, ("events",))
        return spark.sql(_qini_sql(hx, "STRING"))

    return eval_qini_uplift


_register_qini()


# --- SLO burn-rate alerts (round-7 mining batch) --------------------------------


def _slo_sql(daydiff: str) -> str:
    # budget = 5% error rate; page when the 1-day burn exceeds 2x budget
    # AND the 7-day burn exceeds 1x (the SRE-workbook multiwindow rule,
    # day-grained): both flags compare exact integer cross-products.
    return f"""
    WITH d AS (
      SELECT {daydiff} AS d_idx,
             CAST(COUNT(*) AS BIGINT) AS total,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errors
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT d_idx, total, errors,
        CAST(SUM(total) OVER (ORDER BY d_idx RANGE BETWEEN 6 PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS total_7d,
        CAST(SUM(errors) OVER (ORDER BY d_idx RANGE BETWEEN 6 PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS errors_7d
      FROM d
    )
    SELECT CAST(d_idx AS BIGINT) AS day_idx, total, errors, total_7d, errors_7d,
           CAST(errors AS DOUBLE) / CAST(total AS DOUBLE) / 0.05 AS burn_1d,
           CAST(errors_7d AS DOUBLE) / CAST(total_7d AS DOUBLE) / 0.05 AS burn_7d,
           CASE WHEN 10 * errors > total AND 20 * errors_7d > total_7d
                THEN TRUE ELSE FALSE END AS page
    FROM w
    """


_sql_query(
    "slo_burn_rate_daily",
    _slo_sql("datediff(CAST(ts AS DATE), DATE '1970-01-01')"),
    oracle=_slo_sql("date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"),
    doc="Multiwindow SLO burn-rate alerting (SRE-workbook shape, "
    "day-grained): error-rate burn against a 5% budget over a 1-day "
    "and a rolling 7-day window, paging only when BOTH exceed their "
    "thresholds (2x / 1x) — the standard guard against paging on "
    "blips (short window alone) or stale incidents (long window "
    "alone). The fact collapses to the calendar-bounded day grain "
    "first; the rolling window is RANGE over the integer day index "
    "(calendar gaps stay gaps — a ROWS frame would silently bridge "
    "them); alert flags compare exact integer cross-products "
    "(10*err > tot), so no fp threshold can flap; burn rates are "
    "single fp divisions for display. (datediff argument order is "
    "the parameterized 2-arg/3-arg dialect split.)",
    tags=("analytics", "monitor"),
)


# --- local-DP randomized response (round-7 mining batch) ------------------------


def _rr_sql(hexfn, str_t: str) -> str:
    key = f"md5(concat('rr42|', CAST(doc_id AS {str_t})))"
    return f"""
    WITH r AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth,
             CASE WHEN {hexfn(key)} % 4 < 3 THEN 1 ELSE 0 END AS keep
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(truth) AS BIGINT) AS n_true,
             CAST(SUM(CASE WHEN keep = 1 THEN truth ELSE 1 - truth END)
                  AS BIGINT) AS n_reported
      FROM r
    )
    SELECT n, n_reported,
           CAST(4 * n_reported - n AS DOUBLE) / CAST(2 * n AS DOUBLE)
             AS rr_estimate,
           CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE) AS true_rate
    FROM agg
    """


def _register_rr():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    @register(
        "private_rate_randomized_response",
        oracle=_rr_sql(duck_hex13_to_long, "VARCHAR"),
        doc="Warner randomized response (1965), the local-DP companion "
        "to private_counts_laplace: each record reports its is-English "
        "bit truthfully with p=3/4 and flipped with 1/4 (a keyed-md5 "
        "coin — reproducible, auditable releases; ln(3)-LDP per "
        "record), and the aggregate debiases via p_hat = "
        "(4*obs - n)/(2n), one fp division of exact integers. The "
        "true rate rides along for the calibration read-out (the "
        "estimate converges at 1/sqrt(n) with a 2x variance penalty "
        "— visible across the fixture SFs). One scan, one 3-integer "
        "aggregate.",
        tags=("analytics", "privacy", "audit"),
    )
    def private_rate_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .stats_queries import _spark_hex13 as hx

        tune(spark)
        register_views(spark, sf_dir, ("documents",))
        return spark.sql(_rr_sql(hx, "STRING"))

    return private_rate_randomized_response


_register_rr()


# --- personalized PageRank from a seed part (round-7 mining batch) ---------------

_PPR_ITERS = 6


def _ppr_oracle() -> str:
    s = _PR_SCALE
    parts = [
        """op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    prs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    edges AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM prs
              UNION ALL SELECT pb AS src, pa AS dst FROM prs),
    deg AS MATERIALIZED (SELECT src AS part, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src),
    seed AS MATERIALIZED (SELECT MIN(part) AS sp FROM deg),"""
        + f"""
    pr0 AS MATERIALIZED (
      SELECT part, CAST(CASE WHEN part = seed.sp THEN {s} ELSE 0 END AS BIGINT) AS pr
      FROM deg CROSS JOIN seed
    )"""
    ]
    for t in range(1, _PPR_ITERS + 1):
        parts.append(f"""in{t} AS (
      SELECT e.dst AS part, SUM(p.pr // d.outdeg) AS x
      FROM edges e JOIN pr{t - 1} p ON p.part = e.src
                   JOIN deg d ON d.part = e.src
      GROUP BY e.dst
    ),
    pr{t} AS MATERIALIZED (
      SELECT d.part,
             CAST(CASE WHEN d.part = seed.sp THEN {15 * s // 100} ELSE 0 END
                  + (85 * COALESCE(i.x, 0)) // 100 AS BIGINT) AS pr
      FROM deg d CROSS JOIN seed LEFT JOIN in{t} i USING (part)
    )""")
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT d.part AS part_id, d.outdeg,
           p.pr AS ppr_fixed,
           CAST(p.pr AS DOUBLE) / {s}.0 AS ppr
    FROM deg d JOIN pr{_PPR_ITERS} p USING (part)
    WHERE p.pr > 0
    """


@register(
    "graph_ppr_seed",
    oracle=_ppr_oracle(),
    doc=f"Personalized PageRank from a single seed part ({_PPR_ITERS} "
    "iterations, damping 0.85, restart mass lands ONLY on the seed) "
    "over the co-purchase graph — the random-walk-with-restart "
    "recommender: nodes with high PPR are 'parts a buyer of the seed "
    "part gravitates to', the graph-native alternative to "
    "reco_item_item_topk's co-occurrence cosine. Same fixed-point "
    "integer recurrence as graph_pagerank (integer shares, integer "
    "damping, order-free BIGINT inflow sums — bit-identical to the "
    "unrolled DuckDB twin), seed chosen deterministically (smallest "
    "part in the graph). Per iteration: one shuffle on src, one on "
    "dst; the persisted graph relations are built once. Zero-mass "
    "nodes are filtered so the output is the seed's reachable "
    "neighborhood, which is what a serving layer stores.",
    tags=("analytics", "graph", "iterative"),
)
def graph_ppr_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import load_table

    tune(spark)
    s = _PR_SCALE
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    prs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )
    edges = (
        prs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(prs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .localCheckpoint()
    )
    deg = edges.groupBy(F.col("src").alias("part")).agg(
        F.count("*").cast("bigint").alias("outdeg")
    ).localCheckpoint()
    seed = deg.agg(F.min("part").alias("sp"))
    pr = deg.crossJoin(F.broadcast(seed)).select(
        "part",
        F.when(F.col("part") == F.col("sp"), F.lit(s))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pr"),
    ).localCheckpoint()
    for _ in range(_PPR_ITERS):
        inflow = (
            edges.join(pr.withColumnRenamed("part", "src"), "src")
            .join(deg.select(F.col("part").alias("src"), "outdeg"), "src")
            .select(F.col("dst").alias("part"), F.expr("pr div outdeg").alias("sh"))
            .groupBy("part")
            .agg(F.sum("sh").alias("x"))
        )
        pr = (
            deg.crossJoin(F.broadcast(seed))
            .join(inflow, "part", "left")
            .select(
                "part",
                (
                    F.when(F.col("part") == F.col("sp"), F.lit(15 * s // 100))
                    .otherwise(F.lit(0))
                    + F.expr("(85 * coalesce(x, 0L)) div 100")
                )
                .cast("bigint")
                .alias("pr"),
            )
            .localCheckpoint()
        )
    return (
        deg.join(pr, "part")
        .filter(F.col("pr") > 0)
        .select(
            F.col("part").alias("part_id"),
            "outdeg",
            F.col("pr").alias("ppr_fixed"),
            (F.col("pr").cast("double") / F.lit(float(s))).alias("ppr"),
        )
    )


# --- binary-segmentation changepoint of daily revenue (round-7 mining batch) -----

_sql_query(
    "events_changepoint_binseg",
    """
    WITH d0 AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    d AS (
      SELECT day, CAST((cents - cents % 100) / 100 AS BIGINT) AS x FROM d0
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS q
      FROM d
    ),
    c AS (
      SELECT day,
        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
        CAST(SUM(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS s1,
        CAST(SUM(x * x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS q1
      FROM d
    ),
    sse AS (
      SELECT c.day, c.k, t.n - c.k AS k2,
             (CAST(c.q1 AS DOUBLE)
              - CAST(c.s1 AS DOUBLE) * CAST(c.s1 AS DOUBLE) / CAST(c.k AS DOUBLE))
             + (CAST(t.q - c.q1 AS DOUBLE)
                - CAST(t.s - c.s1 AS DOUBLE) * CAST(t.s - c.s1 AS DOUBLE)
                  / CAST(t.n - c.k AS DOUBLE)) AS split_sse,
             CAST(t.q AS DOUBLE)
               - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)
               AS total_sse,
             CAST(c.s1 AS DOUBLE) / CAST(c.k AS DOUBLE) AS mean_left,
             CAST(t.s - c.s1 AS DOUBLE) / CAST(t.n - c.k AS DOUBLE) AS mean_right
      FROM c CROSS JOIN t
      WHERE c.k < t.n
    )
    SELECT CAST(day AS DATE) AS split_day, k AS n_left, k2 AS n_right,
           mean_left, mean_right, split_sse, total_sse,
           1.0 - split_sse / total_sse AS sse_reduction
    FROM sse
    ORDER BY split_sse ASC, split_day ASC
    LIMIT 1
    """,
    doc="Binary-segmentation changepoint of the daily purchase-revenue "
    "series: the single split minimizing SSE_left + SSE_right — the "
    "batch/global changepoint primitive next to the streaming CUSUM "
    "monitor (binary segmentation recurses on the winner; one level is "
    "the canonical first split). Day-grain collapse first (exact "
    "whole-dollar integers per the AR(2) overflow rule), prefix sums "
    "over the calendar-bounded relation give every split's exact "
    "BIGINT (s, q) moments, and each candidate's SSE is a fixed "
    "4-division fp chain — identical cross-engine, argmin tie-broken "
    "by day. sse_reduction ~ R^2 of the step model: near 0 on a "
    "stationary fixture (the expected finding), near 1 on a level "
    "shift.",
    tags=("analytics", "timeseries"),
)
