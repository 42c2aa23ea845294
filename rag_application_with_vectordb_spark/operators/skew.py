"""Skew mitigation: salted join.

When one join key carries a disproportionate share of rows (the
``events.user_id`` fixture is exactly this shape — 15 users across the
whole table), a plain shuffle join sends the hot key to one reducer.
AQE's skew-join splitting handles the *sort-merge* case at runtime; the
salted join is the explicit, planner-independent form that also covers
aggregate-like patterns and older engines:

- the big side's key is widened to ``(key, salt)`` with a per-row salt
  in ``[0, num_salts)``;
- the small-but-not-broadcastable side is replicated ``num_salts`` times,
  once per salt value;
- the join runs on the widened key, spreading each hot key over
  ``num_salts`` reducers.

Results are identical to the plain join (tests assert it); the salt
value itself is irrelevant to correctness, so ``rand()`` is fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
    join_hint: str | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key``, salted ``num_salts`` ways.

    ``small`` is replicated ``num_salts``× — use only when it is too big
    to broadcast but small enough to replicate (the middle regime where
    salting is the right tool).

    ``join_hint``: optional hint (``"shuffle_hash"`` / ``"merge"``) on
    the small side. In the regime salting targets, the small side exceeds
    ``autoBroadcastJoinThreshold`` and Spark shuffles on the widened key
    naturally; on test-sized dims Spark would broadcast instead (salting
    then changes nothing), so demos/tests pass a hint to pin the shuffled
    plan shape that matters at scale.
    """
    if num_salts < 1:
        raise ValueError("num_salts must be >= 1")
    b = big.withColumn("__salt", (F.rand(seed) * num_salts).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(int(num_salts) - 1)))
    )
    if join_hint:
        s = s.hint(join_hint)
    return b.join(s, [key, "__salt"], how).drop("__salt")
