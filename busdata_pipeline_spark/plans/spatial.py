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


@query(
    "rel_spatial_hotspots",
    # Counts and neighborhood sums are integers; the global moments are
    # exact (Σx, Σx² as BIGINT), so the Getis-Ord statistic is a shared
    # closed-form float over identical integers on both engines.
    oracle="""
WITH pts AS (
  SELECT value AS x, CAST(user_id AS DOUBLE) AS y
  FROM events WHERE value IS NOT NULL),
cells AS (
  SELECT CAST(FLOOR(x / 50.0) AS BIGINT) AS xb,
         CAST(FLOOR(y / 15.0) AS BIGINT) AS yb,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pts GROUP BY xb, yb),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cnt) AS BIGINT) AS sx,
             CAST(SUM(cnt * cnt) AS BIGINT) AS sxx
      FROM cells),
nb AS (
  SELECT a.xb, a.yb, a.cnt,
         CAST(SUM(b.cnt) AS BIGINT) AS nsum,
         CAST(COUNT(*) AS BIGINT) AS wi
  FROM cells a
  JOIN cells b ON b.xb BETWEEN a.xb - 1 AND a.xb + 1
              AND b.yb BETWEEN a.yb - 1 AND a.yb + 1
  GROUP BY a.xb, a.yb, a.cnt)
SELECT xb, yb, cnt, nsum,
  ROUND(
    (nsum - (CAST(sx AS DOUBLE) / n) * wi)
    / (sqrt(CAST(sxx AS DOUBLE) / n
            - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
       * sqrt((CAST(n * wi - wi * wi AS DOUBLE)) / (n - 1))), 6)
    AS gi_z
FROM nb CROSS JOIN g
""",
)
def rel_spatial_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot detection over the (value, user_id) plane:
    bin points into grid cells, take each cell's 3×3 neighborhood sum
    via the bin-and-probe equi-join (9 offset keys — the same trick as
    the proximity join, never a distance cross-join), and score
    Gi* = (S_i − μ·W_i) / (σ·sqrt((n·W_i − W_i²)/(n−1))) from exact
    integer moments.  Cell cardinality is bounded by the grid, not the
    fact count, so the statistic stage is dimension-sized at any scale;
    the fact table contributes one binned aggregate."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cells = (
        ev.select(
            F.floor(F.col("value") / F.lit(50.0)).cast("long").alias("xb"),
            F.floor(F.col("user_id").cast("double") / F.lit(15.0))
            .cast("long").alias("yb"),
        )
        .groupBy("xb", "yb")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    g = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sxx"),
    )
    # 3x3 neighborhood as 9 equi-join probes (explode the offset pairs)
    probes = cells.select(
        "xb", "yb", "cnt",
        F.explode(
            F.expr("transform(sequence(-1, 1), dx -> dx)")
        ).alias("dx"),
    ).select(
        "xb", "yb", "cnt", "dx",
        F.explode(
            F.expr("transform(sequence(-1, 1), dy -> dy)")
        ).alias("dy"),
    ).select(
        "xb", "yb", "cnt",
        (F.col("xb") + F.col("dx")).alias("nxb"),
        (F.col("yb") + F.col("dy")).alias("nyb"),
    )
    nbcells = cells.select(
        F.col("xb").alias("nxb"), F.col("yb").alias("nyb"),
        F.col("cnt").alias("ncnt"),
    )
    nb = (
        probes.join(nbcells, ["nxb", "nyb"])
        .groupBy("xb", "yb", "cnt")
        .agg(
            F.sum("ncnt").cast("long").alias("nsum"),
            F.count(F.lit(1)).cast("long").alias("wi"),
        )
    )
    mu = F.col("sx").cast("double") / F.col("n")
    sd = F.sqrt(
        F.col("sxx").cast("double") / F.col("n") - mu * mu
    )
    return nb.join(F.broadcast(g)).select(
        "xb", "yb", "cnt", "nsum",
        F.round(
            (F.col("nsum") - mu * F.col("wi"))
            / (sd * F.sqrt(
                (F.col("n") * F.col("wi") - F.col("wi") * F.col("wi"))
                .cast("double") / (F.col("n") - 1)
            )),
            6,
        ).alias("gi_z"),
    )
