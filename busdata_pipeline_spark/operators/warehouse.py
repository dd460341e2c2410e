"""Warehouse writes — the reference's PostgreSQL star-schema load
(/root/reference/transform.py:62-83,186-201,263-293) as Parquet with
Spark-native idempotency.

- S11 idempotent day re-load: the reference DELETEs the day's fact rows
  then re-inserts (transform.py:62-83).  Here: date-partitioned Parquet +
  dynamic partition overwrite — re-running a day atomically replaces only
  that day's partitions, no delete pass, safe under retry.
- S12 upsert-ignore: ``ON CONFLICT (trip_id) DO NOTHING``
  (transform.py:193) becomes dropDuplicates + left-ANTI join against the
  existing dim — only genuinely new trip_ids are appended.
- A11 audit count: the post-load ``SELECT COUNT(*) WHERE DATE(tstamp)=d``
  (transform.py:291-293).

At scale: the fact table is partitioned by event_date (partition pruning
for every date-sliced analytic query); within a day, files are written
from the enrichment shuffle's trip-hash partitions, so a day's write is
parallel across the cluster.  The dim anti-join broadcasts the *new*
side when small; the existing dim scan only reads the trip_id column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from busdata_pipeline_spark.schemas import TRIP

FACT = "breadcrumb"
DIM = "trip"


def _fact_path(warehouse: str) -> str:
    return os.path.join(warehouse, FACT)


def _dim_path(warehouse: str) -> str:
    return os.path.join(warehouse, DIM)


def write_fact_idempotent(fact: DataFrame, warehouse: str) -> None:
    """S11 — overwrite exactly the event-date partitions present in
    ``fact`` (requires partitionOverwriteMode=dynamic, set in session)."""
    (
        fact.withColumn("event_date", F.to_date("tstamp"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(_fact_path(warehouse))
    )


def upsert_trip_ignore(trip: DataFrame, warehouse: str) -> None:
    """S12 — append only trip_ids not already in the dim."""
    spark = trip.sparkSession
    path = _dim_path(warehouse)
    new = trip.dropDuplicates(["trip_id"])
    # First-load probe: list the path through Hadoop's FS API (works for
    # any supported filesystem, not just local) instead of catching a
    # broad read failure that could mask real errors.
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        existing = spark.read.schema(TRIP).parquet(path).select("trip_id")
        new = new.join(existing, "trip_id", "left_anti")
    new.write.mode("append").parquet(path)


def write_jdbc(df: DataFrame, url: str, table_name: str,
               batchsize: int = 1000, mode: str = "append",
               **options: str) -> None:
    """S10 — the reference's psycopg2 batched INSERT into Postgres
    (transform.py:190-201,263-288, batch_size=1000 at :271) as Spark's
    JDBC sink: each task opens its own connection and writes its
    partition in ``batchsize`` batches, so the load parallelizes across
    the cluster instead of single-threading through one cursor.

    Untestable in this container (no JDBC endpoint); the Parquet
    warehouse above is the primary sink, this is the relational egress.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table_name)
        .option("batchsize", str(batchsize))
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def compact_day(spark: SparkSession, warehouse: str, day: str,
                target_files: int = 1) -> None:
    """Small-files compaction for one fact partition.

    A streaming sink appends a file per micro-batch per partition; after
    a day closes, thousands of small files tax every later scan (footer
    reads, task scheduling).  Rewrite the closed day into
    ``target_files`` right-sized files — dynamic partition overwrite
    makes the swap atomic and scoped to that day, identical to the S11
    re-load path, so a concurrent reader sees old or new files, never a
    mix.
    """
    fact = read_fact(spark, warehouse)
    day_df = fact.where(F.col("event_date") == F.lit(day).cast("date"))
    # Break lineage from the source files: Spark refuses to overwrite a
    # path its own plan still reads.  localCheckpoint materializes the
    # (single-day) slice to executor-local storage first.
    day_df = day_df.localCheckpoint(eager=True)
    (
        day_df.repartition(target_files)
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(_fact_path(warehouse))
    )


def read_fact(spark: SparkSession, warehouse: str) -> DataFrame:
    return spark.read.parquet(_fact_path(warehouse))


def read_dim(spark: SparkSession, warehouse: str) -> DataFrame:
    return spark.read.parquet(_dim_path(warehouse))


def audit_day_count(spark: SparkSession, warehouse: str, day: str) -> int:
    """A11 — post-load verification count for one service day; the
    event_date filter prunes to a single partition directory."""
    return (
        read_fact(spark, warehouse)
        .where(F.col("event_date") == F.lit(day).cast("date"))
        .count()
    )


def load_day(raw: DataFrame, warehouse: str) -> None:
    """The reference's whole per-day job (transform.py:86-312): enrich,
    upsert dim, overwrite the day's fact partitions."""
    from busdata_pipeline_spark.operators.enrich import (
        enrich_breadcrumbs,
        trip_dimension,
    )

    upsert_trip_ignore(trip_dimension(raw), warehouse)
    write_fact_idempotent(enrich_breadcrumbs(raw), warehouse)
