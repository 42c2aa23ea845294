"""Pluggable embedders (reference ``services/geminiService.ts:27-77``).

The reference calls the Gemini ``embedding-001`` API — single text
(``generateEmbedding``, U1) or batches of ``API_BATCH_SIZE=50`` with a
1000 ms inter-batch delay (``generateEmbeddings`` + the ingest loop,
``App.tsx:67-91``, U2/U3) — and classifies quota errors
(``geminiService.ts:11-17``, U4).

The engine keeps that stage behind an interface so the deterministic
correctness surface never touches a network:

- :class:`HashEmbedder` — a seeded pure function text → unit-scale
  vector, expressible BOTH as a Catalyst expression (oracle-checkable in
  DuckDB) and as a vectorized pandas UDF. Used by tests and the driver
  harness.
- :class:`ApiEmbedder` — the production shape: an Arrow-batched
  ``mapInPandas`` stage with explicit client-side micro-batching, retry
  classification, and rate limiting, faithful to U2-U4. The actual HTTP
  call is injectable; the default transport raises — this container has
  no network and no API key (matching the requirement to stub external
  services).

Scale: embedding is the textbook pandas-UDF case — Arrow moves columnar
batches to Python once per ~10k rows, not per row; `mapInPandas`
sub-batches to the API limit inside each partition. Parallelism across a
cluster is just partition count; rate limits are enforced per task.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["hash_embedding_expr", "HashEmbedder", "ApiEmbedder", "QuotaExhausted"]

#: Fixture embedding dimensionality (FIXTURES.md; reference nominal is 768,
#: ``constants.ts:6`` — dimension is a parameter, never hard-coded).
DEFAULT_DIM = 64


def hash_embedding_expr(text: Column, dim: int = DEFAULT_DIM, seed: str = "s42") -> Column:
    """Deterministic pseudo-embedding as a pure Catalyst expression.

    Component j = md5(seed|j|text) folded into [-1, 1). Uses 13 hex chars
    (52 bits) so the integer fits float64 exactly — the identical fold is
    expressible in DuckDB SQL, making embed→score pipelines value-hash
    checkable end-to-end.
    """
    two52 = float(1 << 52)

    def component(j: Column) -> Column:
        h = F.md5(F.concat(F.lit(seed + "|"), j.cast("string"), F.lit("|"), text))
        v = F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(two52)
        return v * 2.0 - 1.0

    return F.transform(F.sequence(F.lit(0), F.lit(int(dim) - 1)), component)


def hash_embedding_sql(text_sql: str, dim: int = DEFAULT_DIM, seed: str = "s42") -> str:
    """Spark-SQL text of :func:`hash_embedding_expr` with the per-dim
    loop UNROLLED — identical md5 inputs, identical fold arithmetic,
    identical doubles (the ``j`` literal renders exactly like
    ``j.cast('string')`` for 0..dim-1).

    WHY (r12 optimization round, guide §4.1): the HOF ``transform``
    form evaluates interpreted AND drops its whole projection out of
    whole-stage codegen; worse, a NON-literal reference inside the
    lambda (e.g. the chunk substring) is re-evaluated per element. The
    unrolled array is plain codegen-able expressions. Built as ONE SQL
    string = one parse (a per-element Column-builder loop costs ~3 ms
    of py4j per call on this host — the lit_doubles lesson). Use for
    SMALL dims (the fused codegen method must stay under HotSpot's
    huge-method JIT limit; dim 8 measured fine, dim 64 callers keep the
    HOF or scope-disable whole-stage codegen)."""
    two52 = "4503599627370496.0D"
    comps = ",".join(
        f"(CAST(CONV(SUBSTRING(MD5(CONCAT('{seed}|', '{j}', '|', {text_sql})), 1, 13),"
        f" 16, 10) AS DOUBLE) / {two52} * 2.0D - 1.0D)"
        for j in range(int(dim))
    )
    return f"array({comps})"


def hash_embedding_oracle_sql(text_expr: str, dim: int = DEFAULT_DIM, seed: str = "s42") -> str:
    """DuckDB twin of :func:`hash_embedding_expr` (same bits, same fold)."""
    return f"""
      list_transform(range(0, {int(dim)}), j ->
        CAST(list_sum(list_transform(range(1, 14), i ->
          (strpos('0123456789abcdef',
                  substr(md5('{seed}|' || j || '|' || {text_expr}), i, 1)) - 1)
          * 2.0 ** (4 * (13 - i))
        )) / 4503599627370496.0 * 2.0 - 1.0)
    """.strip()


class HashEmbedder:
    """Deterministic embedder: the engine's test-mode stand-in for U1/U2."""

    def __init__(self, dim: int = DEFAULT_DIM, seed: str = "s42"):
        self.dim = int(dim)
        self.seed = seed

    # -- Catalyst path (preferred: stays JVM-side, oracle-checkable) ------
    def expr(self, text: Column) -> Column:
        return hash_embedding_expr(text, self.dim, self.seed)

    def embed_df(self, df: DataFrame, text_col: str = "text", out_col: str = "embedding") -> DataFrame:
        return df.withColumn(out_col, self.expr(F.col(text_col)))

    # -- local Python path (for parity tests against the Catalyst path) ---
    def embed_one(self, text: str) -> list[float]:
        out = []
        for j in range(self.dim):
            h = hashlib.md5(f"{self.seed}|{j}|{text}".encode()).hexdigest()
            out.append(int(h[:13], 16) / float(1 << 52) * 2.0 - 1.0)
        return out


class QuotaExhausted(RuntimeError):
    """Reference maps RESOURCE_EXHAUSTED API errors to a dedicated message
    (``geminiService.ts:11-17``); we surface the same classification."""


class ApiEmbedder:
    """Arrow-batched external-API embedder with the reference's batching
    semantics: ``api_batch_size`` texts per call (``App.tsx:17``),
    ``batch_delay_s`` pause between calls (``App.tsx:18``), output-length
    validation (``geminiService.ts:69-73``), quota-error classification
    (``geminiService.ts:11-17``).

    ``transport(texts) -> list[list[float]]`` is injectable; tests inject a
    deterministic fake, production injects a real HTTP client.
    """

    def __init__(
        self,
        transport: Callable[[list[str]], list[list[float]]] | None = None,
        dim: int = DEFAULT_DIM,
        api_batch_size: int = 50,
        batch_delay_s: float = 0.0,
        max_retries: int = 3,
    ):
        self.transport = transport
        self.dim = int(dim)
        self.api_batch_size = int(api_batch_size)
        self.batch_delay_s = float(batch_delay_s)
        self.max_retries = int(max_retries)

    def _call(self, texts: list[str]) -> list[list[float]]:
        if self.transport is None:
            raise NotImplementedError(
                "ApiEmbedder has no transport configured: external embedding "
                "APIs are stubbed in this environment (no network). Inject "
                "transport=... or use HashEmbedder."
            )
        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                out = self.transport(texts)
                if len(out) != len(texts):  # geminiService.ts:69-73
                    raise ValueError(
                        f"embedding API returned {len(out)} vectors for {len(texts)} texts"
                    )
                return out
            except Exception as exc:  # error classification, geminiService.ts:11-17
                if "RESOURCE_EXHAUSTED" in str(exc):
                    raise QuotaExhausted(
                        "API quota exceeded. Please wait and try again."
                    ) from exc
                last = exc
                time.sleep(min(2**attempt * 0.1, 2.0))
        raise last  # type: ignore[misc]

    def embed_df(
        self,
        df: DataFrame,
        text_col: str = "text",
        out_col: str = "embedding",
        progress=None,
    ) -> DataFrame:
        """``mapInPandas`` stage: per-partition Arrow batches, sub-batched
        to the API limit, preserving all input columns. ``progress`` is an
        optional :class:`~..progress.IngestProgress` whose ``embedded``
        accumulator advances per API batch (M1, ``App.tsx:82-85``)."""
        from .session import _ship_package

        _ship_package(df.sparkSession)
        schema = T.StructType(
            df.schema.fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
        )
        call, bs, delay = self._call, self.api_batch_size, self.batch_delay_s
        acc = progress.embedded if progress is not None else None

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            first = True
            for pdf in batches:
                vecs: list[list[float]] = []
                for i in range(0, len(pdf), bs):
                    if not first and delay:
                        time.sleep(delay)  # App.tsx:88-90
                    first = False
                    chunk = list(pdf[text_col].iloc[i : i + bs])
                    vecs.extend(call(chunk))
                    if acc is not None:
                        acc.add(len(chunk))
                pdf = pdf.copy()
                pdf[out_col] = vecs
                yield pdf

        return df.mapInPandas(run, schema=schema)
