"""Bucketed co-located joins — the pre-shuffle that amortizes away.

At 100 TB the orders⨝lineitem shuffle on orderkey is the dominant cost
of every order-grain query (SURVEY-mapped rel_q3/q5 shapes).  Bucketing
pays that shuffle ONCE at write time: both tables hash-clustered into
the same number of buckets on the join key, so every later join is a
zero-exchange sort-merge of co-located buckets.  This module owns that
layout: write-side ``bucketBy`` + read-side joins whose physical plans
must contain no Exchange on either side (asserted in
tests/test_plan_shapes.py).

The reference has no analog — PostgreSQL re-sorts/hashes per query; the
closest operational knob is its per-day file partitioning
(/root/reference/data_subscriber.py:49-56), which this generalizes from
time-pruning to join-locality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   buckets: int = 8) -> None:
    """Persist ``df`` hash-clustered into ``buckets`` files on ``key``,
    sorted within buckets so joins skip both exchange AND sort."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def cobucket_tables(spark: SparkSession, sf_dir: str,
                    specs: dict[str, tuple[str, str]],
                    buckets: int = 8) -> None:
    """Bucket several source tables on their join keys.  ``specs`` maps
    output table name -> (source table, key)."""
    from busdata_pipeline_spark.sources import table

    for out_name, (src, key) in specs.items():
        write_bucketed(table(spark, sf_dir, src), out_name, key, buckets)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables on their bucket key.  With matching
    bucket counts Catalyst plans a SortMergeJoin whose children read
    bucket files directly — no Exchange, no Sort."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
