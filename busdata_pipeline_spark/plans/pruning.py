"""Runtime-pruning query surface: dynamic partition pruning (DPP) over a
date-partitioned fact layout.

The reference's fact table is date-partitioned only implicitly (one load
per service day, `/root/reference/transform.py:62-83` deletes-then-reloads
a day); every analytic then filters on a literal date, so static partition
pruning is enough there.  At 100 TB the harder case is a *join-derived*
date slice — "all weekend days", "days in the dim marked holiday" — where
the set of partitions is only known at runtime.  Spark's dynamic partition
pruning closes that gap: the dim side's filter result is broadcast and
re-used as a partition filter (`dynamicpruningexpression`) on the fact
scan, so only the matching date directories are read.  The plan shape is
pinned in tests/test_pruning.py; this module registers the driver-visible
query with its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table


def write_date_partitioned_events(spark: SparkSession, sf_dir: str,
                                  path: str) -> None:
    """Materialize events as a date-partitioned fact layout (the
    warehouse shape: one directory per service day — S7/S11's layout,
    here as a scratch copy so DPP has partitions to prune)."""
    ev = table(spark, sf_dir, "events")
    (
        ev.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def weekend_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny date dimension derived from the raw events scan: one row per
    distinct service day with its weekday name and a weekend flag.  On a
    real warehouse this is the calendar dim; deriving it from the fact
    keeps the query self-contained for any sf_dir."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(F.to_date("ts").alias("event_date"))
        .distinct()
        # Spark dayofweek(): 1=Sunday … 7=Saturday.
        .withColumn("is_weekend", F.dayofweek("event_date").isin(1, 7))
    )


def dpp_weekend_totals(spark: SparkSession, fact_path: str,
                       dim: DataFrame) -> DataFrame:
    """Partitioned-fact ⨝ filtered-dim on the partition column.  The dim
    is broadcast; Spark reuses the broadcast result as a runtime
    partition filter on the fact scan (dynamicpruningexpression), so the
    scan reads only weekend directories — DPP, not a full scan + join."""
    fact = spark.read.parquet(fact_path)
    dim_f = F.broadcast(dim.where(F.col("is_weekend")).select("event_date"))
    return (
        fact.join(dim_f, "event_date")
        .groupBy("event_date")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("event_date")
    )


@query(
    "etl_dpp_weekend_join",
    # DuckDB has no partitioned layout to prune, so the oracle states the
    # *semantics* (weekend-day totals); the pruning itself is plan-level
    # and pinned in tests/test_pruning.py.  DuckDB dayofweek(): 0=Sunday,
    # 6=Saturday.
    oracle="""
SELECT CAST(ts AS DATE) AS event_date,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM events
WHERE dayofweek(CAST(ts AS DATE)) IN (0, 6)
GROUP BY 1
ORDER BY 1
""",
)
def etl_dpp_weekend_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end-to-end: write the day-partitioned
    warehouse layout (scratch), join it with the weekend slice of the
    calendar dim, and aggregate per day.  Only the weekend partitions are
    read (8 of 30 at sf0.01) — the physical proof lives in
    tests/test_pruning.py; the driver checks the values."""
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix="dpp_q_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        write_date_partitioned_events(spark, sf_dir, path)
        result = dpp_weekend_totals(
            spark, path, weekend_dim(spark, sf_dir)
        )
        # Materialize off the scratch layout so it can be removed now.
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)
