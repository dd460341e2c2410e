"""Spatial analytics queries (operators/spatial.py driver-visible face).

The reference's bounding-box analytics (`analytic.sql:27-34,32-33`)
treat GPS points as a plane; this module adds the pairwise form those
boxes cannot express — proximity self-joins — over the same (value,
user_id) stand-in coordinates every bus_q* box query uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.spatial import grid_proximity_join
from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table

#: proximity radius in the (value, user_id) plane.  value spans ~0-500,
#: user_id ~0-150 at sf0.01; r=4 keeps per-cell occupancy low and the
#: pair set meaningful.
_RADIUS = 4.0


@query(
    "rel_spatial_proximity_join",
    # DEFINITIONAL oracle: all pairs within r on the day, no binning —
    # the engine's grid join must reproduce exactly this set (the grid
    # is a candidate generator, not an approximation), and dist2 is an
    # exact fixed-order double expression on both engines.
    oracle=f"""
WITH pts AS (
  SELECT event_id, value AS x, CAST(user_id AS DOUBLE) AS y
  FROM events
  WHERE ts::date = DATE '2024-01-01' AND value IS NOT NULL)
SELECT a.event_id AS a_id, b.event_id AS b_id,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM pts a JOIN pts b ON a.event_id < b.event_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_RADIUS!r} * {_RADIUS!r}
""",
)
def rel_spatial_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity self-join: all event pairs of one day within Euclidean
    distance r in the (value, user_id) plane — the pairwise spatial
    operator the reference's hand-drawn bounding boxes cannot express
    (see operators/spatial.py for the bin-and-verify construction and
    its exactness argument).

    The ORACLE is definitional (all pairs, no grid): the grid join must
    reproduce the exact pair set, proving the 3×3 neighborhood probe is
    a complete candidate generator, not an approximation.  At 100 TB
    the day filter prunes partitions at the scan, the only shuffle keys
    on (cell_x, cell_y), and candidates are bounded by physical point
    density per r×r cell — never by corpus size squared."""
    ev = table(spark, sf_dir, "events")
    pts = ev.where(
        (F.to_date("ts") == F.lit("2024-01-01").cast("date"))
        & F.col("value").isNotNull()
    ).select(
        F.col("event_id").alias("id"),
        F.col("value").alias("x"),
        F.col("user_id").cast("double").alias("y"),
    )
    return grid_proximity_join(pts, _RADIUS).select(
        F.col("a_id"), F.col("b_id"), F.col("dist2")
    )
