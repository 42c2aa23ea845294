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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import register_views, tables_in_sql
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
