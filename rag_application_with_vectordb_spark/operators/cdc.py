"""Change-data-capture operators: snapshot diff and change application.

The two halves of a CDC pipeline as pure relational algebra:

- :func:`snapshot_diff` — given two versions of a keyed table, emit
  one row per changed key (``change_type`` I/D/U) carrying the new
  payload (and the old, for audit). A co-partitioned full-outer join
  on the key; wide payloads compare via their columns directly, so at
  100 TB one would pre-hash (the ``cdc_snapshot_diff`` catalog query
  shows that form) and fetch payloads only for changed keys.
- :func:`apply_changes` — given a base snapshot and a change set,
  produce the next snapshot: anti-join the touched keys out, union the
  I/U payloads in. This is MERGE without a MERGE-capable table format
  (same idea as ``rag.VectorStore.merge_add``).

Round-trip law (pytest + the ``cdc_apply_roundtrip`` catalog oracle):
``apply_changes(v1, snapshot_diff(v1, v2)) == v2`` for any keyed v1/v2.

``streaming/maintenance.py`` drives :func:`apply_changes` from a
change STREAM via ``foreachBatch``, maintaining a parquet state the
same way the incremental IVF index is maintained.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "apply_changes"]


def snapshot_diff(
    v1: DataFrame,
    v2: DataFrame,
    key: str,
    payload: Sequence[str],
) -> DataFrame:
    """Diff two snapshot versions on ``key``.

    Returns ``key, change_type ('I'|'D'|'U'), <payload> (new values;
    null for D), <old_payload> (``old_`` prefixed; null for I)``.
    Unchanged keys are absent. Null-safe comparison via ``eqNullSafe``
    so a null→value payload transition counts as a change.
    """
    # presence is decided by a non-null marker tagged BEFORE the join,
    # never by a nullable payload column
    old = v1.select(
        key, *[F.col(c).alias(f"old_{c}") for c in payload]
    ).withColumn("__in_old", F.lit(True))
    new = v2.select(key, *payload).withColumn("__in_new", F.lit(True))
    j = old.join(new, key, "full_outer")
    changed = None
    for c in payload:
        ne = ~F.col(c).eqNullSafe(F.col(f"old_{c}"))
        changed = ne if changed is None else (changed | ne)
    ctype = (
        F.when(F.col("__in_old").isNull(), "I")
        .when(F.col("__in_new").isNull(), "D")
        .otherwise("U")
    )
    return (
        j.withColumn("change_type", ctype)
        .filter(
            F.col("__in_old").isNull() | F.col("__in_new").isNull() | changed
        )
        .select(key, "change_type", *payload, *[f"old_{c}" for c in payload])
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    payload: Sequence[str],
) -> DataFrame:
    """Apply a :func:`snapshot_diff`-shaped change set to ``base``.

    Deletes and updates remove the key from ``base`` (one anti-join);
    inserts and updates contribute their new payload (one union). The
    result is the next snapshot. Duplicate keys WITHIN one change set
    are invalid input (a diff never produces them); callers replaying
    at-least-once change feeds should dedup on key first, like
    ``VectorStore.merge_add`` does.
    """
    touched = changes.select(key)
    upserts = changes.filter(F.col("change_type") != "D").select(key, *payload)
    return base.select(key, *payload).join(touched, key, "left_anti").unionByName(
        upserts
    )
