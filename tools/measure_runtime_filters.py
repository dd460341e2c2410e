#!/usr/bin/env python
"""Measure the two runtime-pruning features on a synthetic scale rung:

1. Dynamic partition pruning — 40M-row fact over 200 day-partitions,
   join-derived 28-day slice: DPP on vs off (full scan + join).
2. Runtime Bloom-filter join pruning — 40M-row probe side joined to a
   selectively filtered build side with broadcast disabled: bloom on
   (probe rows dropped pre-shuffle) vs off.

Writes nothing to the repo; prints a small JSON for SCALE.md.
Usage: python tools/measure_runtime_filters.py [workdir=/tmp/rtf]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from busdata_pipeline_spark.session import get_spark  # noqa: E402

N_FACT = 40_000_000
N_DAYS = 200
N_KEYS = 2_000_000


def timed(f):
    t0 = time.perf_counter()
    f()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rtf"
    spark = get_spark("measure-runtime-filters")
    spark.sparkContext.setLogLevel("ERROR")
    fact_dir = os.path.join(work, "fact_partitioned")
    flat_dir = os.path.join(work, "fact_flat")

    if not os.path.isdir(fact_dir):
        fact = spark.range(N_FACT).select(
            F.col("id"),
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                (F.col("id") % N_DAYS).cast("int"),
            ).alias("day"),
            (F.col("id") % N_KEYS).alias("k"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
        fact.write.mode("overwrite").partitionBy("day").parquet(fact_dir)
        fact.write.mode("overwrite").parquet(flat_dir)

    results: dict[str, float] = {}

    # --- DPP: dim selects 28 of 200 days --------------------------------
    dim = spark.range(N_DAYS).select(
        F.date_add(
            F.lit("2024-01-01").cast("date"), F.col("id").cast("int")
        ).alias("day"),
        (F.col("id") % 7 >= 5).alias("is_weekend"),
    ).where("is_weekend").select("day")

    def dpp_query():
        (spark.read.parquet(fact_dir)
         .join(F.broadcast(dim), "day")
         .agg(F.sum("v"))
         .write.format("noop").mode("overwrite").save())

    for flag, label in (("true", "dpp_on_s"), ("false", "dpp_off_s")):
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", flag
        )
        dpp_query()  # warm
        results[label] = min(timed(dpp_query) for _ in range(3))
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
    )

    # --- Bloom: selective build side, broadcast disabled ----------------
    build = spark.range(N_KEYS).select(
        F.col("id").alias("k")
    ).where(F.col("k") % 50 == 0)  # 2% of keys survive

    def bloom_query():
        (spark.read.parquet(flat_dir)
         .join(build, "k")
         .agg(F.sum("v"))
         .write.format("noop").mode("overwrite").save())

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold", "0")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "500MB")
    for flag, label in (("true", "bloom_on_s"), ("false", "bloom_off_s")):
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", flag)
        bloom_query()  # warm
        results[label] = min(timed(bloom_query) for _ in range(3))

    results["fact_rows"] = N_FACT
    results["days_selected"] = int(dim.count())
    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
