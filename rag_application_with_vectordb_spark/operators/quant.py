"""int8 scalar quantization for embedding columns — the storage/bandwidth
scale lever (4× smaller than float32, 8× smaller than the float64 the
scoring math uses).

Not in the reference (its store is a JS array of float64 numbers,
``services/vectorDb.ts:5``; ``types.ts:2-6``), but essential at 100 TB:
a quantized corpus cuts scan bytes 4-8×, and exact re-ranking on the
full-precision vectors can be layered on top (the classic two-phase
retrieval). Design choices mirror the engine's determinism rules:

- **Fixed power-of-two scale** (:data:`QUANT_SCALE` = 64): ``x * 64`` is
  an exact fp64 exponent shift, ``floor`` then yields an exact integer,
  and dequantization ``q / 64.0`` is again exact — every step is
  bit-reproducible in DuckDB, so even the *quantized* search path is
  value-checkable, not just rows-only.
- **Symmetric clamp to [-127, 127]** — keeps the code point -128 unused
  (symmetric range, standard int8 quantization practice) and bounds
  inputs outside [-2, 2) instead of overflowing.
- Quantization error per component is < 1/64 ≈ 0.016 (floor grid), so
  cosine rankings are near-identical on unit-scale embeddings; the
  catalog pairs the quantized top-k with a drift monitor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import as_double

__all__ = ["QUANT_SCALE", "quantize_vec", "dequantize_vec", "quantize_embeddings"]

#: Power of two so quantize/dequantize are exact fp64 operations.
QUANT_SCALE = 64


def quantize_vec(vec: Column, scale: int = QUANT_SCALE) -> Column:
    """``array<double/float>`` → ``array<tinyint>``:
    ``clamp(floor(x * scale), -127, 127)``."""
    return F.transform(
        as_double(vec),
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x * F.lit(float(scale))))
        ).cast("byte"),
    )


def dequantize_vec(qvec: Column, scale: int = QUANT_SCALE) -> Column:
    """``array<tinyint>`` → ``array<double>``: ``q / scale`` (exact)."""
    return F.transform(qvec, lambda q: q.cast("double") / F.lit(float(scale)))


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec", scale: int = QUANT_SCALE
) -> DataFrame:
    """Attach the int8-quantized vector column. Pure per-row projection —
    parallelizes with the scan, never shuffles; at ingest time this is
    the column a 100 TB deployment would store (with the fp32 original
    kept for exact re-ranking)."""
    return df.withColumn(out_col, quantize_vec(F.col(vec_col), scale))


def signbit_mask(vec: Column, start: int, bits: int = 32) -> Column:
    """BIGINT sign-bit mask of ``vec[start : start+bits]`` (0-based
    ``start``): bit ``j`` set iff component ``start+j`` is > 0.

    Unrolled 32-term integer sum (distinct powers of two, so ``+`` is
    ``|``) — stays inside whole-stage codegen, and the identical
    ``list_sum(list_transform(...))`` fold reproduces it in DuckDB. A
    64-dim float vector compresses to two BIGINTs: 8 bytes/vector of
    candidate-generation I/O, 32× below the fp64 scan."""
    v = as_double(vec)
    terms = [
        F.when(F.element_at(v, start + j + 1) > 0, F.lit(1 << j).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for j in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def signbit_masks(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """``(id, lo, hi)``: the vector's sign bits packed into two BIGINTs
    (dims [0,32) → lo, [32,64) → hi). The binary-hashing index build:
    one projection over the scan, no shuffle."""
    if dim != 64:
        raise ValueError("signbit_masks packs exactly 64 dims (lo/hi 32+32)")
    v = F.col(vec_col)
    return df.select(
        F.col(id_col),
        signbit_mask(v, 0).alias("lo"),
        signbit_mask(v, 32).alias("hi"),
    )


def hamming64(lo_a: Column, hi_a: Column, lo_b: Column, hi_b: Column) -> Column:
    """Hamming distance between two 64-bit sign masks:
    ``bit_count(lo⊕lo') + bit_count(hi⊕hi')`` — pure integer codegen."""
    return (
        F.bit_count(lo_a.bitwiseXOR(lo_b)) + F.bit_count(hi_a.bitwiseXOR(hi_b))
    ).cast("long")
