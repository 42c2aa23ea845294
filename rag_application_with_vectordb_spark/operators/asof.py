"""As-of (point-in-time) join — an operator Spark lacks natively.

Composed from built-ins per the preference order (SURVEY.md guidance):
the union+window formulation needs ONE shuffle (by key) and no join at
all — for every right-side row, the most recent strictly-prior left-side
row is found by a running aggregate over the interleaved timeline. This
beats the classic "join all candidates then rank" shape (which
materializes every pair) and is exactly as scalable as a window: state
per key, stream once.

An ``applyInPandas`` + ``pd.merge_asof`` variant is provided as the
escape hatch for semantics the window form can't express (nearest in
either direction, tolerances); tests assert both agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join_prior", "asof_join_pandas"]


def asof_join_prior(
    left: DataFrame,
    right: DataFrame,
    on: str,
    key: str,
    left_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each ``right`` row, attach the ``on`` timestamp (and
    ``left_cols`` payload) of the latest *strictly-prior* ``left`` row
    with the same ``key``.

    Mechanics: union both sides into one timeline with a side marker
    (left rows sort before right rows at equal timestamps, making
    "strictly prior" exact), then a running ``max`` / ``max_by`` over
    ``ROWS UNBOUNDED PRECEDING .. 1 PRECEDING`` picks the latest left
    value seen so far. The right-side payload columns ride through the
    union (null on left rows), so the result needs no row-id rejoin —
    one shuffle on ``key``, zero joins, and no dependence on
    ``monotonically_increasing_id`` determinism across recomputation.
    """
    left_cols = left_cols or []
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    rcols = [f.name for f in right.schema.fields]

    # The right-side payload rides THROUGH the union (null on left rows),
    # so no row id and no rejoin are needed.  The previous formulation
    # tagged `right` with monotonically_increasing_id() twice (once in the
    # union leg, once for the rejoin) and relied on both derivations
    # agreeing — which breaks under task retry / AQE re-planning /
    # non-deterministic upstreams.  Carrying the payload is also one
    # whole join cheaper.
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in rcols],
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        *[F.lit(None).cast(ltypes[c]).alias(f"__l_{c}") for c in left_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stream = lt.unionByName(rt)
    out = stream.withColumn(
        f"{prefix}{on}", F.max(F.when(F.col("__side") == 0, F.col("__t"))).over(w)
    )
    for c in left_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            F.max_by(
                F.when(F.col("__side") == 0, F.col(f"__l_{c}")),
                F.when(F.col("__side") == 0, F.col("__t")),
            ).over(w),
        )
    return out.filter(F.col("__side") == 1).select(
        *[F.col(f"__r_{c}").alias(c) for c in rcols],
        f"{prefix}{on}",
        *[f"{prefix}{c}" for c in left_cols],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    key: str,
    left_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """``pd.merge_asof`` per key group via cogrouped ``applyInPandas`` —
    the flexible variant (direction/tolerance knobs live in pandas).
    Shuffles both sides by ``key``; each key group must fit one worker,
    so at scale prefer :func:`asof_join_prior` or a higher-cardinality
    key."""
    import pandas as pd

    left_cols = left_cols or []
    ltypes = dict(left.dtypes)
    right_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in right.schema.fields)
    out_schema = (
        right_fields
        + f", {prefix}{on} timestamp"
        + "".join(f", {prefix}{c} {ltypes[c]}" for c in left_cols)
    )
    lsel = left.select(key, on, *left_cols)
    rcols = [f.name for f in right.schema.fields]

    def merge(rpdf: "pd.DataFrame", lpdf: "pd.DataFrame") -> "pd.DataFrame":
        rpdf = rpdf.sort_values(on, kind="mergesort")
        if lpdf.empty:
            m = rpdf.copy()
            m[f"{prefix}{on}"] = pd.NaT
            for c in left_cols:
                m[f"{prefix}{c}"] = None
            return m[rcols + [f"{prefix}{on}"] + [f"{prefix}{c}" for c in left_cols]]
        lpdf = lpdf.sort_values(on, kind="mergesort").rename(
            columns={on: f"{prefix}{on}", **{c: f"{prefix}{c}" for c in left_cols}}
        )
        m = pd.merge_asof(
            rpdf,
            lpdf.drop(columns=[key]),
            left_on=on,
            right_on=f"{prefix}{on}",
            allow_exact_matches=False,
        )
        return m[rcols + [f"{prefix}{on}"] + [f"{prefix}{c}" for c in left_cols]]

    return (
        right.groupBy(key)
        .cogroup(lsel.groupBy(key))
        .applyInPandas(merge, schema=out_schema)
    )
