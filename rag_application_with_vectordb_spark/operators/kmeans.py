"""Deterministic fixed-iteration k-means (Lloyd's) as DataFrame ops —
the IVF coarse quantizer's training step.

Why not MLlib KMeans: its init is randomized and its iteration count is
convergence-driven, so results vary run to run — unusable where the
engine's correctness story is bit-reproducibility. This implementation
is deterministic end to end:

- init: the ``k`` corpus vectors with the smallest ids (same spirit as
  k-means|| seeding by a fixed rule);
- assignment: argmin squared-L2 (cosine-compatible if inputs are
  unit-normalized), centroid-id-asc tiebreak;
- update: element-wise mean via ``posexplode`` + groupBy — exact same
  shape as a SQL aggregation, map-side partial sums;
- stop: a fixed iteration count, not a tolerance.

Scale: each iteration is one broadcast (k×dim centroids — tiny), one
scan, and one (centroid, dim) aggregation; the corpus never shuffles.
The fp64 mean is summed across partitions, so *assignments* are
deterministic given the same centroids, and centroid drift across
partitionings stays below argmin decision boundaries in practice —
bit-exactness of the final *assignment* is what the tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import as_double

__all__ = ["kmeans_fit", "assign_clusters"]


def _sq_dist(a, b):
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x, lambda acc: acc)


def assign_clusters(
    points: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "cvec",
) -> DataFrame:
    """Nearest-centroid assignment (squared L2, centroid-id tiebreak)."""
    scored = points.crossJoin(F.broadcast(centroids)).withColumn(
        "__d", _sq_dist(as_double(F.col(vec_col)), as_double(F.col(centroid_vec)))
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("__d"), F.asc(centroid_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, centroid_id)
    )


def kmeans_fit(
    points: DataFrame,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-iteration Lloyd's; returns ``(centroid_id, cvec)``.

    Empty clusters keep their previous centroid (standard Lloyd's
    fallback, deterministic).
    """
    centroids = (
        points.orderBy(F.asc(id_col))
        .limit(int(k))
        .select(
            F.row_number().over(Window.orderBy(F.asc(id_col))).alias("centroid_id"),
            as_double(F.col(vec_col)).alias("cvec"),
        )
        .withColumn("centroid_id", F.col("centroid_id") - 1)
    )
    for _ in range(int(iterations)):
        assigned = assign_clusters(points, centroids, id_col, vec_col)
        comps = assigned.select(
            "centroid_id", F.posexplode(as_double(F.col(vec_col))).alias("dim", "val")
        )
        means = (
            comps.groupBy("centroid_id", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s.getField("m"),
                ).alias("cvec_new")
            )
        )
        centroids = (
            centroids.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("cvec_new"), F.col("cvec")).alias("cvec"),
            )
        )
    return centroids


def inertia(points: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> float:
    """Σ min-squared-distance — the quantity Lloyd's monotonically
    non-increases (up to fp); used by tests as the convergence check."""
    assigned = assign_clusters(points, centroids, id_col, vec_col)
    joined = assigned.join(F.broadcast(centroids), "centroid_id")
    return joined.select(
        F.sum(_sq_dist(as_double(F.col(vec_col)), as_double(F.col("cvec")))).alias("s")
    ).first()["s"]
