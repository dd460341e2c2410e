"""Spatial proximity join — 2-D bin-and-verify.

The reference's facts are GPS breadcrumbs (SURVEY.md §1: GPS_LATITUDE /
GPS_LONGITUDE, `/root/reference/transform.py:237-238`), and its analytic
workload slices them with bounding boxes (`analytic.sql:32-33`).  The
natural next operator over such data — which the reference delegates to
hand-drawn boxes — is the PROXIMITY SELF-JOIN: all pairs of points
within distance r.  A naive formulation is a cartesian product; the
scale formulation below is the standard grid trick, the 2-D analog of
the 1-D binned range join in operators/temporal.py:

1. bin each point into an r×r grid cell (two FLOORs — a projection);
2. candidate pairs share a cell after probing the 3×3 neighborhood
   (one explode to 9 probe cells + one EQUI-join on the cell key);
3. verify the exact distance on candidates only.

Any pair within r differs by < r per axis, so it lands in adjacent
cells — the join is exact, not approximate; candidates are bounded by
cell occupancy (wall-clock density), never by a key's global frequency.
On true lat/lon the cell key becomes a geohash and the verify expression
haversine; the join shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_proximity_join(points: DataFrame, radius: float,
                        id_col: str = "id", x_col: str = "x",
                        y_col: str = "y") -> DataFrame:
    """All pairs (a, b) with a.id < b.id and Euclidean distance ≤
    ``radius``.  Returns (a_id, b_id, dist2) with dist2 the exact
    squared distance (products/sums of identical doubles in fixed
    expression order — bit-equal across engines, so a definitional
    all-pairs SQL oracle matches without rounding the PREDICATE)."""
    r = float(radius)
    cx = F.floor(F.col(x_col) / r).cast("long")
    cy = F.floor(F.col(y_col) / r).cast("long")
    binned = points.select(
        F.col(id_col).alias("_id"), F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"), cx.alias("_cx"), cy.alias("_cy"),
    )
    probes = binned.select(
        "_id", "_x", "_y",
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("_cx") + dx).alias("px"),
                    (F.col("_cy") + dy).alias("py"),
                )
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            ])
        ).alias("p"),
    ).select("_id", "_x", "_y", "p.px", "p.py")
    cand = probes.join(
        binned.select(
            F.col("_id").alias("b_id"), F.col("_x").alias("b_x"),
            F.col("_y").alias("b_y"), F.col("_cx").alias("px"),
            F.col("_cy").alias("py"),
        ),
        ["px", "py"],
    ).where(F.col("_id") < F.col("b_id"))
    dist2 = (
        (F.col("_x") - F.col("b_x")) * (F.col("_x") - F.col("b_x"))
        + (F.col("_y") - F.col("b_y")) * (F.col("_y") - F.col("b_y"))
    )
    return (
        cand.select(
            F.col("_id").alias("a_id"),
            F.col("b_id"),
            dist2.alias("dist2"),
        )
        .where(F.col("dist2") <= F.lit(r * r))
    )
