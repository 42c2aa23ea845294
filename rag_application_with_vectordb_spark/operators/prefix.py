"""Distributed order-preserving prefix aggregation (scalable running sums).

A global running sum — ``SUM(x) OVER (ORDER BY k)`` — physically plans
as a SinglePartition shuffle: every row of the relation funnels through
ONE task. Fine when the ordered domain is bounded (days, histogram
buckets); a silent scale-killer on entity-grain relations (parts,
users, documents), where the catalog's single-partition lint
(tests/test_registry_contract.py) flags it.

``bucketed_running_sum`` is the textbook two-level prefix sum,
expressed declaratively so Catalyst keeps every stage parallel:

1. Sketch equal-frequency boundaries of the leading order key
   (``percentile_approx`` — exact data values, deterministic), collect
   them once, and assign each row a bucket with a broadcast-literal
   comparison chain. The bucket is a monotone function of the leading
   key ALONE, so ties always share a bucket and bucket order == key
   order — which makes the decomposition exact for ANY boundary
   placement; the sketch only balances work, never affects values.
2. Per-bucket partial sums → a bounded (≤ n_buckets-row) offsets
   relation, localCheckpoint'ed (bounded by construction — the
   documented contract for every checkpoint site in this repo: ONLY
   the ≤ n_buckets-row relation is ever checkpointed, never the
   input) and cumulated with a tiny window.
3. The running sum WITHIN each bucket (a keyed window — parallel
   across buckets) plus the bucket's offset:
   ``cum(row) = offset(bucket(row)) + within_bucket_cum(row)``.

Exactness: the regrouped addition order is only safe on types where
addition is associative-exact — BIGINT and DECIMAL. Do NOT point this
at raw DOUBLE sums (the catalog-wide rule: grid-land or use DECIMAL
before any cross-group reduction).

Skew: buckets are equal-frequency by sketch; the worst case is a
single leading-key value carrying most rows (all tied rows must share
a bucket to keep the decomposition exact) — the same bound any
order-preserving method has without a secondary-key split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

#: sketch accuracy for boundary selection (percentile_approx parameter);
#: boundary QUALITY only affects balance, never values.
_SKETCH_ACCURACY = 10_000


def bucketed_running_sum(
    df: DataFrame,
    value_col: str,
    lead_col: str,
    tiebreak: list[Column] | None = None,
    lead_desc: bool = False,
    n_buckets: int = 64,
    out_col: str = "cum",
    total_col: str | None = None,
) -> DataFrame:
    """``df`` + ``out_col`` = running sum of ``value_col`` over
    ``ORDER BY lead_col [DESC], *tiebreak`` — with no single-partition
    stage over the input relation.

    ``lead_col`` must be non-null and numeric (BIGINT/DECIMAL for exact
    results); ``tiebreak`` columns complete the total order inside the
    keyed window. With ``total_col`` set, the grand total is attached
    as a column too (it falls out of the offsets relation for free).

    The operator makes THREE passes over the input lineage (boundary
    sketch at plan-build time, offsets materialization, the final keyed
    window), so the input is ``persist(MEMORY_AND_DISK)``-ed — NOT
    localCheckpoint'ed (ADVICE r9): a checkpoint would materialize the
    whole input to non-reliable executor-local storage (executor loss
    kills the job at 100 TB) and hide the input plan from the catalog's
    plan-shape lints behind an RDD scan. ``persist`` is fault-tolerant
    (lineage recompute), evictable, and deduped by Spark's CacheManager
    across repeated invocations of the same plan, so repeated builders
    reuse one cache entry instead of minting fresh materializations
    (the r9 checkpoint-memoization lesson). Callers whose input lineage
    is NON-DETERMINISTIC must checkpoint it themselves first — under
    cache eviction a recompute that changes values would make the three
    passes disagree (true of any multi-pass operator).

    The persist is registered with
    :func:`..session.release_tracked_persists` (ADVICE r10): a
    long-running session invoking many different builders should call
    that hook periodically — CacheManager dedup only collapses
    IDENTICAL plans, so distinct builders otherwise accumulate distinct
    cache entries for the life of the session.
    """
    from ..session import track_persist

    src = track_persist(df.persist(StorageLevel.MEMORY_AND_DISK))
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    row = src.select(
        F.percentile_approx(F.col(lead_col), fracs, F.lit(_SKETCH_ACCURACY)).alias("b")
    ).first()
    bounds = sorted(set(row["b"] or [])) if row is not None else []
    lead_t = src.schema[lead_col].dataType.simpleString()
    # bucket = #boundaries strictly below this row's leading key — a
    # monotone (ascending) function of the key; exact string literals
    # re-cast to the column's own type so DECIMAL comparisons stay exact.
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(lead_col) > F.lit(str(b)).cast(lead_t), 1).otherwise(0)
    bucketed = src.withColumn("__pb", bucket)

    border = F.desc("__pb") if lead_desc else F.asc("__pb")
    offsets = (
        bucketed.groupBy("__pb")
        .agg(F.sum(value_col).alias("__bsum"))
        .localCheckpoint(eager=True)  # bounded: ≤ n_buckets rows
    )
    woff = Window.orderBy(border).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    off_cols = [
        F.col("__pb"),
        (F.sum("__bsum").over(woff) - F.col("__bsum")).alias("__off"),
    ]
    if total_col is not None:
        off_cols.append(F.sum("__bsum").over(wtot).alias(total_col))
    off = offsets.select(*off_cols)

    lead_order = F.desc(lead_col) if lead_desc else F.asc(lead_col)
    win = (
        Window.partitionBy("__pb")
        .orderBy(lead_order, *(tiebreak or []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        bucketed.withColumn("__cumin", F.sum(value_col).over(win))
        .join(F.broadcast(off), "__pb")
        .withColumn(out_col, F.col("__off") + F.col("__cumin"))
        .drop("__pb", "__cumin", "__off")
    )
    return out


def bucketed_row_number(
    df: DataFrame,
    lead_col: str,
    tiebreak: list[Column] | None = None,
    lead_desc: bool = False,
    n_buckets: int = 64,
    out_col: str = "rn",
) -> DataFrame:
    """``df`` + ``out_col`` = 1-based ``row_number() OVER (ORDER BY
    lead_col [DESC], *tiebreak)`` with no single-partition stage — the
    running COUNT special case of :func:`bucketed_running_sum`
    (value ≡ 1; counting is exact under any regrouping). The usual
    zipWithIndex escape hatch, kept declarative."""
    out = bucketed_running_sum(
        df.withColumn("__one", F.lit(1).cast("bigint")),
        value_col="__one",
        lead_col=lead_col,
        tiebreak=tiebreak,
        lead_desc=lead_desc,
        n_buckets=n_buckets,
        out_col=out_col,
    )
    return out.drop("__one")
