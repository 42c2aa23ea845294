"""Ingest progress metrics (reference M1, ``App.tsx:53,82-85``).

The reference reports ``15·pages_done/pages`` during parse and
``15 + 85·chunks_done/chunks`` during embedding. The distributed analog
is a pair of Spark accumulators updated from inside the executor-side
stages (parse ``mapInPandas``, embed ``mapInPandas``) — the driver can
poll :meth:`percentage` while actions run, exactly like the reference's
progress bar, without any extra action or shuffle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["IngestProgress"]

#: Reference split: parsing is worth 15%, embedding the remaining 85%
#: (App.tsx:53, App.tsx:82-85).
PARSE_SHARE = 15.0
EMBED_SHARE = 85.0


class IngestProgress:
    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self.parsed = sc.accumulator(0)
        self.embedded = sc.accumulator(0)

    def percentage(self, n_docs: int, n_chunks: int) -> float:
        """Reference formula, clamped to [0, 100]."""
        parse_pct = PARSE_SHARE * min(self.parsed.value / n_docs, 1.0) if n_docs else PARSE_SHARE
        embed_pct = (
            EMBED_SHARE * min(self.embedded.value / n_chunks, 1.0) if n_chunks else 0.0
        )
        return min(parse_pct + embed_pct, 100.0)
