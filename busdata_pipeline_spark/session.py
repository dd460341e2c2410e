"""SparkSession construction + scale-oriented defaults.

The reference delegates all relational execution to PostgreSQL
(`/root/reference/transform.py:16-22`, `analytic.sql`); here the engine IS
Spark, so the session carries the physical-tuning posture for a large
cluster (AQE, skew handling, partition-overwrite semantics) while remaining
correct on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-timezone pin: the reference stores naive timestamps queried
# ``AT TIME ZONE 'UTC'`` (/root/reference/analytic.sql:45).  Storing
# naive-as-UTC and pinning the session to UTC makes that the identity and
# keeps Spark's hour()/to_date() consistent with the DuckDB oracle, which
# treats parquet timestamps as naive UTC wall-clock.
SESSION_TZ = "UTC"

#: Conf applied both when we build a session ourselves and (the safe,
#: session-scoped subset) when the driver hands us an existing session.
TUNING = {
    # correctness-critical
    "spark.sql.session.timeZone": SESSION_TZ,
    # runtime re-planning: join strategy switch, skew-join splitting,
    # partition coalescing — the main line of defense at 100 TB where
    # static estimates are wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # idempotent day re-load (reference transform.py:62-83) is expressed as
    # dynamic partition overwrite, not delete-then-insert.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Arrow for the few pandas-UDF extension operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The test tables carry INT64 TIMESTAMP(NANOS) parquet columns, which
    # Spark's vectorized reader rejects; read them as nano-longs and let
    # sources.tables convert to TimestampType (micros, truncating like
    # DuckDB does when it reads TIMESTAMP_NS).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive (isAdjustedToUTC=false) parquet timestamps must read as
    # session-TZ TIMESTAMP (LTZ), not TIMESTAMP_NTZ: the session is pinned
    # to UTC so values are identical, but NTZ forbids cast-to-double epoch
    # arithmetic and breaks comparisons against timestamp literals.  DuckDB
    # likewise treats naive parquet timestamps as plain TIMESTAMP, so this
    # keeps oracle semantics aligned.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Pin the meaning of the bare "timestamp" type name itself: a session
    # that set spark.sql.timestampType=TIMESTAMP_NTZ turns every
    # cast("timestamp") guard into an NTZ no-op and then epoch arithmetic
    # (cast-to-double) raises DATATYPE_MISMATCH — the round-3 driver
    # failure mode.  All engine code also casts to "timestamp_ltz"
    # explicitly, so this pin is defense-in-depth, not a dependency.
    "spark.sql.timestampType": "TIMESTAMP_LTZ",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "busdata-pipeline-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a session with the engine's tuning applied.

    ``shuffle_partitions`` defaults to the local core count: on a real
    cluster this would instead be ~2-3x total executor cores (and AQE
    coalescing makes over-provisioning cheap).
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # saveAsTable target for bucketed layouts (operators/bucketing.py);
        # kept out of the repo tree.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    for k, v in TUNING.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_session_conf(spark: SparkSession) -> SparkSession:
    """Apply the session-scoped (mutable-at-runtime) conf to a session we
    did not build — e.g. the verification driver's.  Only runtime-settable
    keys; cheap and idempotent, called from every query entry point so
    results don't depend on the caller's timezone or AQE posture."""
    for k, v in TUNING.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static conf on someone else's session — skip
            pass
    return spark
