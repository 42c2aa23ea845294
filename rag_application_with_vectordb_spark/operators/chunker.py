"""Sliding-window text chunker.

Reference (``App.tsx:57-61``, constants ``constants.ts:9-10``)::

    for (let i = 0; i < text.length; i += CHUNK_SIZE - CHUNK_OVERLAP)
        chunks.push(text.substring(i, i + CHUNK_SIZE));
    chunks = chunks.filter(c => c.trim().length > 0);

i.e. windows of 1000 chars at stride 800 (overlap 200); the final window
may be short; whitespace-only windows are dropped.

Spark-first: a generator expression — ``posexplode(sequence(0, len-1,
stride))`` + 1-based ``substring`` — one row in, many out, fully
parallel per document, no shuffle. Chunk ids are dense *per document*
(``(doc_id, chunk_id)`` composite), because a globally-dense id
(reference ``App.tsx:72-76``) is a single-partition bottleneck at scale
(SURVEY.md §7.3.3); ``global_chunk_index`` offers reference-parity global
ids for small corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Reference configuration, ``constants.ts:9-10``.
CHUNK_SIZE = 1000
CHUNK_OVERLAP = 200

__all__ = ["chunk_documents", "global_chunk_index", "CHUNK_SIZE", "CHUNK_OVERLAP"]


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    keep_empty: bool = False,
) -> DataFrame:
    """Explode each document into sliding windows.

    Output: ``id_col, chunk_id (0-based dense per doc), chunk_pos
    (0-based char offset), chunk_text``.

    Exactness traps handled:
    - Spark ``substring`` is 1-based → ``pos + 1`` (SURVEY.md §2.2 P2).
    - ``sequence`` is inclusive of the stop bound, so stop is ``len-1``
      (the reference loop runs while ``i < len``).
    - Empty documents: reference produces zero windows; we generate one
      empty window from ``greatest(len-1, 0)`` and the trim-filter drops
      it — same observable output.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    text = F.col(text_col)
    starts = F.sequence(F.lit(0), F.greatest(F.length(text) - 1, F.lit(0)), F.lit(stride))
    out = docs.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_id", "chunk_pos"),
        text.alias("__fulltext"),
    ).select(
        F.col(id_col),
        F.col("chunk_id").cast("long"),
        F.col("chunk_pos").cast("long"),
        F.substring(F.col("__fulltext"), F.col("chunk_pos") + 1, chunk_size).alias("chunk_text"),
    )
    if not keep_empty:
        # Reference filter: c.trim().length > 0  (App.tsx:61)
        out = out.filter(F.length(F.trim(F.col("chunk_text"))) > 0)
    return out


#: ``global_chunk_index`` funnels every row through ONE reducer (a
#: no-partition window). That is the reference's semantics (a single
#: in-memory array) and fine for its corpus sizes, but a silent
#: scale-killer if a caller points it at a real corpus — so the guard
#: counts first and refuses above this ceiling unless explicitly lifted.
GLOBAL_INDEX_MAX_ROWS = 10_000_000


def global_chunk_index(
    chunks: DataFrame,
    id_col: str = "doc_id",
    max_rows: int | None = GLOBAL_INDEX_MAX_ROWS,
    scalable: bool = False,
) -> DataFrame:
    """Reference-parity globally-dense chunk id (``App.tsx:72-76``).

    Default mode is the reference-shaped single-partition window —
    small corpora only, guarded by ``max_rows`` (pass ``max_rows=None``
    to opt out, accepting the single-reducer cost knowingly).

    ``scalable=True`` computes the IDENTICAL dense ids with the
    distributed two-level prefix count (``operators/prefix.py:
    bucketed_row_number`` — sketched ``id_col`` buckets, keyed windows,
    checkpointed ≤64-row offsets): no single-partition stage, no row
    ceiling. Requires a numeric ``id_col`` (the boundary sketch runs
    ``percentile_approx``); at 100 TB this is the mode to use when a
    composite ``(doc_id, chunk_id)`` key won't do.

    Dtype note: scalable mode returns ``global_id`` as BIGINT — its whole
    point is corpora past the parity guard, where an INT id would wrap
    past 2^31−1 rows (silently, under non-ANSI Spark). Parity mode keeps
    the reference-shaped INT, which its ``max_rows`` ceiling makes safe.
    """
    if scalable:
        from .prefix import bucketed_row_number

        out = bucketed_row_number(
            chunks,
            lead_col=id_col,
            tiebreak=[F.asc("chunk_id")],
            out_col="__rn",
        )
        return out.withColumn("global_id", F.col("__rn") - F.lit(1)).drop("__rn")
    if max_rows is not None:
        n = chunks.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"global_chunk_index funnels all rows through one reducer; "
                f"corpus exceeds max_rows={max_rows}. Use the (doc_id, chunk_id) "
                f"composite key at scale, scalable=True for distributed dense "
                f"ids, or pass max_rows=None to force."
            )
    w = Window.orderBy(F.col(id_col), F.col("chunk_id"))
    return chunks.withColumn("global_id", F.row_number().over(w) - 1)
