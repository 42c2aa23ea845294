"""Batch twins of the streaming window operators (SURVEY.md §7.2 phase 6).

Structured Streaming results can't be DuckDB-oracle-checked directly, so
each streaming operator in ``streaming.windows`` has a batch twin here
computing the *same* window semantics over the ``events`` table with
``F.window`` / ``F.session_window`` — the driver hash-checks these, and
the pytest streaming suite asserts streaming output == batch twin.

Determinism: counts are exact; ``value`` sums go through DECIMAL (the
fixture values are 2-decimal), window bounds are epoch-aligned UTC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import load_table
from .registry import register

_D = "DECIMAL(18,2)"


@register(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {_D})) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Tumbling 1-hour event-time window (F.window) — batch twin of the "
    "streaming aggregate; epoch-aligned, UTC.",
    tags=("streaming",),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_D)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_sliding_halfhour",
    oracle="""
    WITH cand AS (
      SELECT e.event_id, e.value, make_timestamp(CAST(t.s AS BIGINT)) AS window_start
      FROM events e,
           LATERAL (SELECT unnest([
             (epoch_us(e.ts) // 1800000000) * 1800000000,
             (epoch_us(e.ts) // 1800000000) * 1800000000 - 1800000000
           ])) t(s)
      WHERE epoch_us(e.ts) - t.s < 3600000000 AND epoch_us(e.ts) >= t.s
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n_events
    FROM cand GROUP BY 1, 2
    """,
    doc="Sliding window (1 h length / 30 min hop): every event lands in "
    "two windows; the oracle enumerates both candidate starts explicitly.",
    tags=("streaming",),
)
def events_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


@register(
    "events_sessionized",
    oracle=f"""
    WITH x AS (
      SELECT user_id, ts, event_id, value,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 4 HOUR
             THEN 1 ELSE 0 END AS is_new
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, value,
        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM x
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(SUM(CAST(value AS {_D})) AS DOUBLE) AS session_value
    FROM s GROUP BY user_id, session_id
    """,
    doc="Sessionization (4-hour inactivity gap) via lag + cumulative-sum — "
    "the batch twin of streaming session_window; partitioned by user, so "
    "the window shuffle is keyed and scalable.",
    tags=("streaming",),
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap comparison (a double epoch would round near the
    # 4-hour boundary differently than the oracle's interval arithmetic).
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(order)
    is_new = F.when(gap_us > 4 * 3600 * 1_000_000, F.lit(1)).otherwise(F.lit(0))
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_sess = events.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(cum)
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast(_D)).cast("double").alias("session_value"),
    )


@register(
    "events_high_water_marks",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id, ts, value,
             MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior_max
      FROM events
    )
    SELECT user_id, event_id, ts, value
    FROM x
    WHERE prior_max IS NULL OR value > prior_max
    """,
    doc="Per-user new-maximum detector — batch twin of the stateful "
    "streaming state machine (streaming.stateful.high_water_marks / "
    "streaming.tws): emit rows whose value exceeds every prior value in "
    "(ts, event_id) order. The pytest suite asserts stream == this twin.",
    tags=("streaming",),
)
def events_high_water_marks(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        events.withColumn("prior_max", F.max("value").over(w))
        .filter(F.col("prior_max").isNull() | (F.col("value") > F.col("prior_max")))
        .select("user_id", "event_id", "ts", "value")
    )


# --- streaming ingest → incremental IVF index: batch twin ---------------------
#
# streaming.ingest.stream_ingest_documents can now maintain a persisted
# IVF index per micro-batch (chunk → hash-embed → nearest-frozen-centroid
# append; reference App.tsx:43-95 as one streaming dataflow). Streaming
# output itself can't be DuckDB-checked, so this twin runs the identical
# chunk→embed→assign stages over the documents fixture and aggregates
# per inverted list; the pytest streaming suite
# (tests/test_streaming_ingest.py) asserts the stream-built index ==
# the batch-built index row-for-row on the same files.

_ING_DIM, _ING_NLISTS = 8, 4
_ING_SEED = "icent"


def ingest_index_centroids(spark: SparkSession):
    """The frozen ``_ING_NLISTS`` fold-unit centroids the ingest-index
    pipeline assigns against (deterministic, engine-reproducible)."""
    from ..operators.ann import _fold_unit_py

    return spark.createDataFrame(
        [
            (c, [_fold_unit_py(f"{_ING_SEED}|{c}|{j}") for j in range(_ING_DIM)])
            for c in range(_ING_NLISTS)
        ],
        "centroid_id int, cvec array<double>",
    )


def _ingest_twin_oracle() -> str:
    from .oracle_dialect import duck_cosine, duck_fold_unit, duck_hash_embedding
    from .rag_queries import _CHUNK_ORACLE_BODY

    return f"""
    WITH chunks AS (
      SELECT * FROM ({_CHUNK_ORACLE_BODY}) WHERE length(trim(chunk_text)) > 0
    ),
    icent AS (
      SELECT CAST(t.c AS INTEGER) AS centroid_id,
             list_transform(range(0, {_ING_DIM}),
                            j -> {duck_fold_unit(f"'{_ING_SEED}|' || t.c || '|' || j")}) AS cvec
      FROM (SELECT unnest(range(0, {_ING_NLISTS}))) t(c)
    ),
    emb AS (
      SELECT doc_id, chunk_id, {duck_hash_embedding('chunk_text', _ING_DIM)} AS e
      FROM chunks
    ),
    assign AS (
      SELECT doc_id, chunk_id, centroid_id FROM (
        SELECT m.doc_id, m.chunk_id, c.centroid_id,
               row_number() OVER (PARTITION BY m.doc_id, m.chunk_id
                                  ORDER BY {duck_cosine('m.e', 'c.cvec')} DESC, c.centroid_id) AS rn
        FROM emb m CROSS JOIN icent c
      ) WHERE rn = 1
    )
    SELECT centroid_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM assign GROUP BY centroid_id
    """


@register(
    "stream_ingest_index_twin",
    oracle=_ingest_twin_oracle(),
    doc="Batch twin of the streaming ingest→index pipeline (VERDICT r5 "
    "item 6): chunk (200/40) → hash-embed (dim 8) → assign each chunk "
    "to its nearest frozen fold-unit centroid (operators.ann.ivf_assign "
    "— the same assignment streaming ivf_append uses per micro-batch), "
    "aggregated per inverted list. Every stage is bit-reproduced in "
    "DuckDB (chunk substr grid, md5-fold embeddings, cosine argmax), so "
    "this row value-checks the full ingest dataflow; "
    "tests/test_streaming_ingest.py proves the STREAM-built index over "
    "the same texts matches the batch path row-for-row.",
    tags=("streaming", "ann", "incremental"),
)
def stream_ingest_index_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..embedder import hash_embedding_expr
    from ..operators.ann import ivf_assign
    from ..operators.chunker import chunk_documents
    from .rag_queries import _CHUNK, _OVERLAP

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_size=_CHUNK, overlap=_OVERLAP)
    emb = chunks.select(
        F.struct("doc_id", "chunk_id").alias("ck"),
        hash_embedding_expr(F.col("chunk_text"), dim=_ING_DIM).alias("embedding"),
    )
    assigned = ivf_assign(
        emb, ingest_index_centroids(spark), corpus_id="ck", corpus_vec="embedding"
    )
    return assigned.groupBy("centroid_id").agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct(F.col("ck.doc_id")).alias("n_docs"),
    )
