"""Spatial / planar-geometry catalog: grid-cell-blocked distance joins
over md5-derived point coordinates.

The fixtures carry no geographic columns, so points are DERIVED
deterministically (keyed-md5 folds onto an integer micro-coordinate
grid, the same reproducible-randomness device as the A/B arm keys and
the Poisson bootstrap) — the VALUE is the join algorithm, which is the
standard scale shape for proximity joins on any engine:

- never an all-pairs distance evaluation: points land in r-sized grid
  cells (one map-side integer projection), candidate pairs come from a
  9-cell neighborhood equi-join (for an L2 radius r and cell size r,
  any qualifying pair differs by <= 1 cell per axis — candidate
  generation is LOSSLESS by construction, not probabilistically), and
  the exact predicate runs on candidates only.
- all coordinates and squared distances are exact BIGINT micro-units
  (1e-6 grid), so the join predicate and the output hash cannot flap
  cross-engine; there is no trigonometry anywhere (a haversine variant
  would inherit each engine's libm sin/cos — the planar form is the
  one that bit-reproduces).
- the cell equi-join shuffles on the cell key; at 100 TB the 9-offset
  expansion multiplies the probe side 9x BEFORE the shuffle, which is
  the textbook trade against an O(n^2) cross join; skewed cells (urban
  density) are AQE skew-join territory, same as any hot key.
- the 9 offsets are an EXPLODED array of composite neighbor cell keys,
  never a relational CROSS JOIN (VALUES ...): with the offsets as
  relations, the join condition spans three relations and Catalyst's
  join reorder connects the two point relations through the distance
  predicate instead — silently planning the all-pairs CartesianProduct
  the blocking exists to avoid (invisible at sf0.01, ~2 h at sf10).
  tests/test_plans.py pins the cartesian-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import register_views
from .oracle_dialect import duck_hex13_to_long
from .registry import register

_GEO_R = 10_000  # radius in micro-units (0.01 of the unit square)


#: Composite cell key multiplier. Cells per axis = 1e6/_GEO_R, so cy <
#: 1e6/_GEO_R + 1 << 1_000_000 for any radius >= 2 micro-units; the one
#: aliasing encoding (ncy = -1 vs cy = 999_999) is therefore a cell that
#: cannot exist on the b side, and the key is collision-free.
_CELL_K = 1_000_000


def _geo_sql(hexfn, str_t: str, unnestfn) -> str:
    """``unnestfn(items) -> sql``: the dialect's select-list generator —
    Spark ``explode(array(...))``, DuckDB ``unnest([...])``.

    The 9-cell neighborhood MUST be this exploded-array form, never a
    relational ``CROSS JOIN (VALUES ...)`` of the offsets: with the
    offsets as separate relations, the join condition
    ``b.cx = a.cx + dx`` spans three relations, and Catalyst's join
    reorder connects a and b through the distance predicate FIRST —
    planning a CartesianProduct over all customer pairs (2.25e12 at
    sf10; observed, ~2 h) with the cell conditions demoted to
    post-filters. Exploding the neighbor keys into one column makes the
    join a plain attribute equi-join (shuffle on the cell key) that no
    reorder can degrade; tests/test_plans.py pins the absence of
    cartesian/nested-loop operators."""
    xs = hexfn(f"md5('geo|x|' || CAST(c_custkey AS {str_t}))")
    ys = hexfn(f"md5('geo|y|' || CAST(c_custkey AS {str_t}))")
    r = _GEO_R
    k = _CELL_K
    neighbors = unnestfn(
        [
            f"(cx + {dx}) * {k} + (cy + {dy})"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    return f"""
    WITH p AS (
      SELECT c_custkey AS id,
             CAST({xs} % 1000000 AS BIGINT) AS x,
             CAST({ys} % 1000000 AS BIGINT) AS y
      FROM customer
    ),
    c AS (
      SELECT id, x, y,
             CAST((x - x % {r}) / {r} AS BIGINT) AS cx,
             CAST((y - y % {r}) / {r} AS BIGINT) AS cy
      FROM p
    ),
    cells AS (
      SELECT id, x, y, cx * {k} + cy AS cell FROM c
    ),
    probe AS (
      SELECT id, x, y, {neighbors} AS ncell FROM c
    ),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq
      FROM probe a
      JOIN cells b ON b.cell = a.ncell AND a.id < b.id
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(dist_sq AS BIGINT) AS dist_sq
    FROM cand WHERE dist_sq <= {r} * {r}
    """


def _register_geo():
    from .stats_queries import _spark_hex13

    @register(
        "geo_radius_pairs",
        oracle=_geo_sql(
            duck_hex13_to_long,
            "VARCHAR",
            lambda items: "unnest([" + ", ".join(items) + "])",
        ),
        doc=f"Spatial radius self-join: all customer-point pairs within "
        f"L2 distance {_GEO_R} micro-units on the unit square "
        "(coordinates derived by keyed-md5 folds — deterministic, "
        "auditable). Candidates come ONLY from an r-sized grid-cell "
        "9-neighborhood equi-join (cell size == radius makes the "
        "blocking lossless by the triangle of |dx|<=r => cell diff "
        "<=1 — proven equal to brute force in "
        "tests/test_geo_forecast_ops.py); the exact integer "
        "squared-distance predicate runs on candidates, never on the "
        "n^2 cross product. The neighborhood is an EXPLODED composite "
        "cell-key column, not a VALUES cross join — the relational "
        "offset form lets the join reorderer connect the two point "
        "relations through the distance predicate and plan a "
        "CartesianProduct (observed at sf10: 2.25e12 pairs, ~2 h; the "
        "exploded form is a plain cell-key equi-join, plan-asserted "
        "cartesian-free). One shuffle on the cell key; a pair matches "
        "exactly one neighbor offset so no DISTINCT is needed. The "
        "same shape serves geofence screens and contact tracing at "
        "100 TB (cells shard the world; AQE handles dense-city skew).",
        tags=("geo", "analytics"),
    )
    def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, ("customer",))
        return spark.sql(
            _geo_sql(
                _spark_hex13,
                "STRING",
                lambda items: "explode(array(" + ", ".join(items) + "))",
            )
        )

    return geo_radius_pairs


_register_geo()


# --- grid-cell density profile ---------------------------------------------------


def _geo_density_sql(hexfn, str_t: str) -> str:
    xs = hexfn(f"md5('geo|x|' || CAST(c_custkey AS {str_t}))")
    ys = hexfn(f"md5('geo|y|' || CAST(c_custkey AS {str_t}))")
    cell = 100_000  # 10x10 coarse grid
    return f"""
    WITH p AS (
      SELECT c_custkey AS id,
             CAST({xs} % 1000000 AS BIGINT) AS x,
             CAST({ys} % 1000000 AS BIGINT) AS y
      FROM customer
    ),
    g AS (
      SELECT CAST((x - x % {cell}) / {cell} AS BIGINT) AS cx,
             CAST((y - y % {cell}) / {cell} AS BIGINT) AS cy,
             id
      FROM p
    )
    SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(MIN(id) AS BIGINT) AS min_id, CAST(MAX(id) AS BIGINT) AS max_id
    FROM g GROUP BY cx, cy
    """


def _register_geo_density():
    from .stats_queries import _spark_hex13

    @register(
        "geo_cell_density",
        oracle=_geo_density_sql(duck_hex13_to_long, "VARCHAR"),
        doc="Coarse 10x10 grid-cell density profile of the derived "
        "customer points — the partitioning diagnostic run BEFORE a "
        "spatial join to size cells and spot skew (a cell holding 10x "
        "the mean is the AQE-skew-join candidate; at 100 TB this "
        "histogram decides the cell size geo_radius_pairs shuffles "
        "on). One map-side integer projection + one aggregate over "
        "<= 100 cells.",
        tags=("geo", "analytics"),
    )
    def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, ("customer",))
        return spark.sql(_geo_density_sql(_spark_hex13, "STRING"))

    return geo_cell_density


_register_geo_density()
