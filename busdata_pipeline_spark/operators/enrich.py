"""The heart of the reference's ETL (/root/reference/transform.py:86-312)
as a single declarative lineage.

The reference sorts a whole day of records in driver memory, groups them
per trip in Python dicts, and walks each trip with index arithmetic to
derive speeds (transform.py:133,137-144,204-259).  That is exactly one
Spark window: hash-partition by trip, sort within partition by time —
the per-trip Python loop disappears into the window exchange, and the
single-node memory ceiling disappears with it (each executor only holds
its partitions; at 100 TB the shuffle is keyed by trip_id, which is
high-cardinality and naturally un-skewed).

Semantics preserved exactly (SURVEY.md §2.5, §7.5.2):

- W1  partition by EVENT_NO_TRIP, order by ACT_TIME
- W2  speed = Δ METERS / Δ ACT_TIME (m/s) via lag, only when Δt > 0
      (transform.py:219-230; the Δt<=0 guard at :225 keeps speed NULL)
- W3  the first row of a multi-row trip takes the SECOND row's computed
      speed — even when that is NULL (transform.py:228-259); a 1-row trip
      keeps NULL.  Expressed as lead() over the computed column, applied
      only at row_number()==1 so NULLs are never resurrected elsewhere.
- A10 the trip dimension comes from each trip's first record
      (transform.py:146-181): vehicle from row 1, service_key from the
      service-day's Python-weekday bucket, direction constant 'Out',
      route_id NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from busdata_pipeline_spark.functions.core import service_key_for
from busdata_pipeline_spark.functions.timestamps import breadcrumb_timestamp, opd_date

def _trip_window():
    """W1 — one window serves the lag, lead and row_number computations,
    so Catalyst plans a single exchange+sort.  (Built lazily: Window specs
    need an active session.)"""
    return Window.partitionBy("EVENT_NO_TRIP").orderBy("ACT_TIME")


def enrich_breadcrumbs(raw: DataFrame) -> DataFrame:
    """raw breadcrumbs -> BreadCrumb fact rows
    ``(tstamp, latitude, longitude, speed, trip_id)``.

    Records whose OPD_DATE fails to parse are dropped, mirroring the
    reference's per-record skip (transform.py:212-215).
    """
    w = _trip_window()
    dt = F.col("ACT_TIME") - F.lag("ACT_TIME").over(w)
    dm = F.col("METERS") - F.lag("METERS").over(w)
    speed = F.when(dt > 0, dm / dt)  # NULL at row 1 (no lag) and when Δt <= 0

    enriched = (
        raw.withColumn("tstamp", breadcrumb_timestamp("OPD_DATE", "ACT_TIME"))
        .where(F.col("tstamp").isNotNull())
        .withColumn("speed_raw", speed)
        .withColumn(
            "speed",
            F.when(
                F.row_number().over(w) == 1, F.lead("speed_raw", 1).over(w)
            ).otherwise(F.col("speed_raw")),
        )
    )
    return enriched.select(
        "tstamp",
        F.col("GPS_LATITUDE").alias("latitude"),
        F.col("GPS_LONGITUDE").alias("longitude"),
        "speed",
        F.col("EVENT_NO_TRIP").alias("trip_id"),
    )


def trip_dimension(raw: DataFrame) -> DataFrame:
    """raw breadcrumbs -> Trip dim
    ``(trip_id, route_id, vehicle_id, service_key, direction)`` from each
    trip's first record (transform.py:146-181)."""
    first = (
        # Same skip-unparseable-date rule as the fact path, so a trip whose
        # records all fail to parse produces no dangling dim row.
        raw.where(opd_date("OPD_DATE").isNotNull())
        .withColumn("_rn", F.row_number().over(_trip_window()))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return first.select(
        F.col("EVENT_NO_TRIP").alias("trip_id"),
        F.lit(None).cast("int").alias("route_id"),  # always NULL (transform.py:177)
        F.col("VEHICLE_ID").alias("vehicle_id"),
        service_key_for(opd_date("OPD_DATE")).alias("service_key"),
        F.lit("Out").alias("direction"),  # constant (transform.py:172-173)
    )
