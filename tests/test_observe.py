"""Pipeline observability: Spark's Observation API attached to the
enrichment lineage — load-audit metrics (A11) collected as a side
effect of the real write, no second pass over the data (the reference
re-queries the warehouse to audit counts, transform.py:283-288)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_observation_collects_audit_metrics_in_one_pass(spark):
    df = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 1.5)
         .alias("value"),
    )
    obs = Observation("load_audit")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        # DISTINCT aggregates are disallowed in observed metrics
        # (CollectMetrics is a streaming-safe accumulator); HLL approx
        # is the sanctioned cardinality metric here.
        F.approx_count_distinct("user_id").alias("n_users_approx"),
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == 1000
    assert got["n_null_value"] == 100
    # 7 true users; HLL at default rsd=5% must land within +-1 here
    assert abs(got["n_users_approx"] - 7) <= 1
