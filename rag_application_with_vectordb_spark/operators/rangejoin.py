"""Interval / range join with time-bucket blocking.

Spark has no native band-join operator; the naive formulation
(`a JOIN b ON |a.ts - b.ts| <= W`) degenerates to a per-key cartesian
product. The scale path blocks each row into ``W``-sized time buckets
and equi-joins on (key, bucket) with each left row probing its own and
the next bucket — every true pair lands in exactly one of the two
bucket pairs, so candidates are bounded by local density, not corpus
size. The final exact filter keeps semantics identical to the naive
form (tests + oracle assert this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_within"]


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    on: str,
    key: str,
    window_seconds: int,
    left_alias: str = "a",
    right_alias: str = "b",
) -> DataFrame:
    """Pairs (a from left, b from right) with the same ``key`` and
    ``0 < b.ts - a.ts <= window_seconds`` (strictly-later right rows —
    the common "what happened within W after X" shape).

    Returns the pair ids/timestamps with ``a_``/``b_`` prefixes.
    """
    w_us = int(window_seconds) * 1_000_000
    a = left.select(
        F.col(key).alias("__k"),
        F.col(on).alias(f"{left_alias}_{on}"),
        F.unix_micros(F.col(on)).alias("__a_us"),
        *[F.col(c).alias(f"{left_alias}_{c}") for c in left.columns if c not in (key, on)],
    )
    b = right.select(
        F.col(key).alias("__k"),
        F.col(on).alias(f"{right_alias}_{on}"),
        F.unix_micros(F.col(on)).alias("__b_us"),
        *[F.col(c).alias(f"{right_alias}_{c}") for c in right.columns if c not in (key, on)],
    )
    # Block by floor(ts / W): a true pair (a < b <= a+W) has b in a's
    # bucket or the next one — probe exactly those two. Integer division
    # (`div`), not fp: a rounding flip at a bucket boundary would silently
    # drop true pairs.
    a = a.withColumn(
        "__bucket",
        F.explode(F.array(F.expr(f"__a_us div {w_us}"), F.expr(f"__a_us div {w_us}") + 1)),
    )
    b = b.withColumn("__bucket", F.expr(f"__b_us div {w_us}"))
    joined = a.join(b, ["__k", "__bucket"]).filter(
        (F.col("__b_us") > F.col("__a_us"))
        & (F.col("__b_us") - F.col("__a_us") <= w_us)
    )
    # Each true pair matches in exactly one bucket (b is bucketed once),
    # so no dedup pass is needed.
    return joined.drop("__bucket", "__a_us", "__b_us").withColumnRenamed("__k", key)
