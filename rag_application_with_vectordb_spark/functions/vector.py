"""Vector math as Catalyst Column expressions.

Re-expresses the reference's scalar-JS vector kernel
(``services/vectorDb.ts:26-52``) as Spark SQL higher-order functions:
``zip_with`` + ``aggregate`` compile into whole-stage-codegen'd JVM
loops — no Python in the scoring hot path, no UDF serialization, and
the expressions are portable to the DuckDB oracle (verified bitwise
fp64-identical for the fixture vectors).

Reference semantics reproduced exactly (they are observable behavior):

- dimension mismatch       → similarity = **-1.0** (``vectorDb.ts:27-32``)
- either vector zero-norm  → similarity = **0.0**  (``vectorDb.ts:47-49``)
- otherwise dot/(|a|·|b|)  (``vectorDb.ts:34-51``)

All math is done in float64 (the reference computes over JS ``number``)
even though fixture embeddings are ``array<float>`` — cast first, or the
oracle value-hash flaps (SURVEY.md §7.3.1).

Scale notes (100 TB posture):
- These are pure expressions: they parallelize with the scan, never
  shuffle, and vectorize under codegen.
- For repeated querying, precompute ``l2_norm`` once at ingest and use
  :func:`cosine_sim_prenormed` — halves per-query FLOPs (the reference
  recomputes every corpus norm on every query, ``vectorDb.ts:40-45``).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "vec_lit",
    "as_double",
    "dot",
    "l2_norm",
    "l2_dist",
    "cosine_sim",
    "cosine_sim_prenormed",
    "lit_doubles",
    "lit_double_matrix",
    "lit_longs",
    "dot_fold_sql",
    "norm_fold_sql",
    "cosine_sim_sql",
]


def lit_doubles(vals: Iterable[float]) -> Column:
    """Constant ``array<double>`` as ONE py4j call.

    ``F.lit(list)`` / ``F.array(*map(F.lit, ...))`` cost one py4j
    round-trip PER ELEMENT — ~0.3-0.5 s of driver time per expression
    build for an 8x64 matrix, paid on EVERY query construction. A single
    ``F.expr`` with repr'd double literals is one call + one parse;
    ``repr`` round-trips every finite double exactly through Java's
    correctly-rounded parser, so values are bit-identical (oracle
    hash-matches across the ANN family prove it). Non-finite values
    (``repr`` would render invalid-SQL ``nanD``/``infD``) are emitted as
    ``CAST('NaN'/'Infinity' AS DOUBLE)``, matching what the old
    per-element ``F.lit`` form produced.
    """
    return F.expr("array(" + ",".join(_dlit(v) for v in vals) + ")")


def _dlit(v: float) -> str:
    v = float(v)
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"{v!r}D"


def lit_double_matrix(mat: Iterable[Iterable[float]]) -> Column:
    """Constant ``array<array<double>>`` as ONE py4j call (see
    :func:`lit_doubles`)."""
    rows = ",".join(
        "array(" + ",".join(_dlit(v) for v in row) + ")" for row in mat
    )
    return F.expr(f"array({rows})")


def lit_longs(vals: Iterable[int]) -> Column:
    """Constant ``array<bigint>`` as ONE py4j call."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")


def vec_lit(values: Iterable[float]) -> Column:
    """A literal query vector as an ``array<double>`` Column.

    Catalyst constant-folds this, so the per-row cost is identical to a
    broadcast scalar. (Reference: one query vector at a time,
    ``App.tsx:190``.)
    """
    return lit_doubles(values)


def as_double(vec: Column | str) -> Column:
    """Cast ``array<float>`` → ``array<double>`` element-wise."""
    return F.transform(F.col(vec) if isinstance(vec, str) else vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — same accumulation order as the
    reference's loop (``vectorDb.ts:38-42``) and DuckDB's
    ``list_dot_product``, so fp64 results agree bitwise."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """``sqrt(Σ aᵢ²)`` (``vectorDb.ts:44-45``)."""
    return F.sqrt(dot(a, a))


def l2_dist(a: Column, b: Column) -> Column:
    """Euclidean distance (not in the reference; used by the ANN layer)."""
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.sqrt(dot(diff, diff))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity with the reference's exact edge semantics.

    ``vectorDb.ts:26-52``: length mismatch → -1.0 (an error *value*, not
    an exception); zero magnitude on either side → 0.0.
    """
    ad, bd = as_double(a), as_double(b)
    na, nb = l2_norm(ad), l2_norm(bd)
    return (
        F.when(F.size(a) != F.size(b), F.lit(-1.0))
        .when((na == 0.0) | (nb == 0.0), F.lit(0.0))
        .otherwise(dot(ad, bd) / (na * nb))
    )


def dot_fold_sql(a: str, b: str, dim: int) -> str:
    """SQL text of the UNROLLED sequential-fold dot product over two
    ``dim``-wide array expressions — bitwise identical to :func:`dot`
    (same ``0.0 + a[0]*b[0] + a[1]*b[1] + ...`` left-fold order; IEEE
    addition chain unchanged), but as plain codegen-able arithmetic
    instead of a ``zip_with``+``aggregate`` higher-order function.

    WHY (r12 optimization round, guide §4.1): HOF lambdas never enter
    whole-stage codegen — every element costs an interpreted expression
    eval, measured ~10× the cost of the multiply-add itself on the 1M
    generated-corpus demos. The unrolled form needs a statically known
    ``dim`` and arrays that really have ``dim`` elements (ANSI mode
    errors on out-of-range ``[]``); callers guarantee both.

    NOTE for the caller's plan, not this expression: a fused
    WholeStageCodegen stage containing hundreds of unrolled terms
    exceeds HotSpot's huge-method JIT limit (the fused ``processNext``
    cannot be split when inputs are codegen locals) and silently runs
    in the bytecode interpreter — SLOWER than the HOF it replaced.
    Plans built around these kernels disable whole-stage codegen for
    their own execution (see ``bench_knn_1m``); the per-operator
    UnsafeProjection path splits methods normally and JIT-compiles.
    """
    terms = "".join(f" + ({a})[{i}] * ({b})[{i}]" for i in range(int(dim)))
    return f"(0.0D{terms})"


def norm_fold_sql(a: str, dim: int) -> str:
    """``SQRT(dot_fold_sql(a, a))`` — the unrolled :func:`l2_norm`."""
    return f"SQRT({dot_fold_sql(a, a, dim)})"


def _hof_dot_sql(a: str, b: str) -> str:
    """SQL text of the original HOF dot over as_double'd arrays — the
    per-row FALLBACK branch of :func:`cosine_sim_sql` (sizes ≠ dim)."""
    return (
        f"aggregate(zip_with(transform({a}, x -> CAST(x AS DOUBLE)),"
        f" transform({b}, x -> CAST(x AS DOUBLE)), (x, y) -> x * y),"
        f" 0.0D, (acc, x) -> acc + x)"
    )


def cosine_sim_sql(a: str, b: str, dim: int) -> str:
    """SQL text of :func:`cosine_sim` with a fixed-``dim`` UNROLLED fast
    path — value-identical for EVERY input, including the reference's
    edge semantics:

    - both arrays exactly ``dim`` long → unrolled fold (same IEEE op
      order as the HOF form, so bitwise-equal doubles);
    - anything else → the original HOF expression per row (lazy CASE
      branch: mismatched sizes still yield -1.0, equal-but-other-dim
      pairs still get the HOF cosine, and the unrolled ``[]`` accesses
      never execute, which ANSI mode requires).

    Pinned bitwise against :func:`cosine_sim` (incl. mismatch and
    zero-vector edges) by ``test_cosine_sim_sql_bitwise``. Callers at
    dim ≳ 32 must scope-disable whole-stage codegen for their plan
    (session.scoped_no_wholestage_codegen) — see :func:`dot_fold_sql`.
    """
    ad = lambda i: f"CAST(({a})[{i}] AS DOUBLE)"  # noqa: E731
    bd = lambda i: f"CAST(({b})[{i}] AS DOUBLE)"  # noqa: E731
    dim = int(dim)
    dot_ab = "(0.0D" + "".join(f" + {ad(i)} * {bd(i)}" for i in range(dim)) + ")"
    na = "SQRT((0.0D" + "".join(f" + {ad(i)} * {ad(i)}" for i in range(dim)) + "))"
    nb = "SQRT((0.0D" + "".join(f" + {bd(i)} * {bd(i)}" for i in range(dim)) + "))"
    fast = (
        f"CASE WHEN {na} = 0.0D OR {nb} = 0.0D THEN 0.0D"
        f" ELSE {dot_ab} / ({na} * {nb}) END"
    )
    hof_na = f"SQRT({_hof_dot_sql(a, a)})"
    hof_nb = f"SQRT({_hof_dot_sql(b, b)})"
    slow = (
        f"CASE WHEN size({a}) != size({b}) THEN -1.0D"
        f" WHEN {hof_na} = 0.0D OR {hof_nb} = 0.0D THEN 0.0D"
        f" ELSE {_hof_dot_sql(a, b)} / ({hof_na} * {hof_nb}) END"
    )
    return (
        f"(CASE WHEN size({a}) = {dim} AND size({b}) = {dim}"
        f" THEN ({fast}) ELSE ({slow}) END)"
    )


def cosine_sim_prenormed(a: Column, a_norm: Column, b: Column, b_norm: Column) -> Column:
    """Cosine with ingest-time precomputed norms (SURVEY.md §4.2).

    Same result as :func:`cosine_sim` for well-formed inputs; callers
    guarantee dims match (the ingest path enforces it), so only the
    zero-norm edge is kept.
    """
    return (
        F.when((a_norm == 0.0) | (b_norm == 0.0), F.lit(0.0))
        .otherwise(dot(as_double(a), as_double(b)) / (a_norm * b_norm))
    )
