"""Runtime Bloom-filter join pruning (Spark's runtime row-level filter).

At 100 TB the classic pain is a big-big shuffle join where one side is
selectively filtered: every surviving probe row still pays the full
shuffle.  Spark's runtime Bloom filter builds a bloom_filter_agg over the
filtered (creation) side's join keys and injects ``might_contain`` into
the big (application) side's scan filter, dropping non-matching rows
BEFORE the shuffle.  It is on by default (session tuning keeps it so)
with 10 MB / 10 GB side thresholds — sized so it fires exactly in the
big-big case on a real cluster; locally we lower the application-side
threshold to exercise the plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

CONFS = {
    # force a non-broadcast join so the runtime filter is the thing
    # saving the shuffle (broadcast joins don't need it)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # local parquet is far under the 10 GB application-side threshold
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@pytest.fixture()
def bloom_conf(spark):
    old = {k: spark.conf.get(k) for k in CONFS}
    for k, v in CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


def _urgent_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    od = spark.read.parquet(f"{SF}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


def test_bloom_filter_injected_on_probe_side(bloom_conf):
    spark = bloom_conf
    plan = _urgent_join(spark)._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan, plan
    assert "might_contain" in plan, plan


def test_bloom_filter_preserves_values(bloom_conf):
    spark = bloom_conf
    with_bloom = _urgent_join(spark).collect()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        without = _urgent_join(spark).collect()
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_bloom == without
    assert len(with_bloom) == 1
