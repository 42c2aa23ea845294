"""Helpers for writing DuckDB oracle SQL that is *value-identical* to the
Spark plans, not merely approximately equal.

Cross-engine determinism rules used throughout the catalog:

- **Vector math**: both engines fold dot products sequentially in fp64
  (``list_dot_product`` on ``::DOUBLE[]`` vs Spark ``aggregate(zip_with)``
  on casted arrays) — verified bitwise-identical on the fixtures.
- **Money aggregates**: a cross-partition fp64 SUM is order-dependent, so
  any query that sums doubles casts to DECIMAL first (exact, associative)
  and casts the final result back to DOUBLE. Both engines convert the
  fixture's 2-decimal doubles to the same DECIMAL, so results match
  bitwise regardless of partitioning.
- **Hashes**: ``md5`` produces identical lowercase hex in both engines;
  for numeric hashes we fold ≤13 hex chars (52 bits) so the value is
  exactly representable in fp64 on the DuckDB side (no ``conv`` there).
"""

from __future__ import annotations

__all__ = ["duck_cosine", "duck_hex13_to_long", "duck_fold_unit", "duck_hash_embedding"]


def duck_cosine(a: str, b: str) -> str:
    """DuckDB expression mirroring ``functions.vector.cosine_sim`` —
    including the reference's -1 (dim mismatch) and 0 (zero norm) edges
    (``services/vectorDb.ts:26-52``)."""
    dot = f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"
    na = f"sqrt(list_dot_product(({a})::DOUBLE[], ({a})::DOUBLE[]))"
    nb = f"sqrt(list_dot_product(({b})::DOUBLE[], ({b})::DOUBLE[]))"
    return (
        f"CASE WHEN len({a}) <> len({b}) THEN -1.0 "
        f"WHEN {na} = 0.0 OR {nb} = 0.0 THEN 0.0 "
        f"ELSE {dot} / ({na} * {nb}) END"
    )


def duck_hex13_to_long(hex_expr: str) -> str:
    """DuckDB twin of Spark ``conv(substring(h,1,13),16,10)::long``:
    fold 13 hex chars into an integer < 2^52 (fp64-exact)."""
    return (
        f"CAST(list_sum(list_transform(range(1, 14), i -> "
        f"(strpos('0123456789abcdef', substr({hex_expr}, i, 1)) - 1) "
        f"* 2.0 ** (4 * (13 - i)))) AS BIGINT)"
    )


def duck_fold_unit(key_expr: str) -> str:
    """DuckDB twin of the engine's md5-fold → [-1, 1) unit value
    (``embedder.hash_embedding_expr`` / ``operators.ann._fold_unit``)."""
    return (
        f"(list_sum(list_transform(range(1, 14), i -> "
        f"(strpos('0123456789abcdef', substr(md5({key_expr}), CAST(i AS INTEGER), 1)) - 1) "
        f"* 2.0 ** (4 * (13 - i)))) / 4503599627370496.0 * 2.0 - 1.0)"
    )


def duck_hash_embedding(text_expr: str, dim: int, seed: str = "s42") -> str:
    """DuckDB twin of ``embedder.hash_embedding_expr`` (array<double>)."""
    key = f"'{seed}|' || j || '|' || {text_expr}"
    return f"list_transform(range(0, {int(dim)}), j -> {duck_fold_unit(key)})"


# (The decimal-SUM pattern itself lives inline in the query modules —
# each spells CAST(SUM(CAST(x AS DECIMAL(18,2))...) AS DOUBLE) in
# dialect-shared SQL text.)
