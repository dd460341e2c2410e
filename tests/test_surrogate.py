"""Surrogate keys: dense, order-defined, and partition-count invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.warehouse import assign_surrogate_keys
from busdata_pipeline_spark.sources import table
from tests.conftest import SF0001


def _keys(spark, n_parts):
    cust = table(spark, SF0001, "customer").select("c_custkey", "c_name")
    return {
        r.c_custkey: r.sk
        for r in assign_surrogate_keys(
            cust, order_col="c_name", n_parts=n_parts
        ).collect()
    }


def test_keys_are_dense_and_order_defined(spark):
    cust = table(spark, SF0001, "customer").select("c_custkey", "c_name")
    rows = assign_surrogate_keys(cust, "c_name", n_parts=4).collect()
    n = len(rows)
    assert sorted(r.sk for r in rows) == list(range(1, n + 1))
    by_name = sorted(rows, key=lambda r: r.c_name)
    assert [r.sk for r in by_name] == list(range(1, n + 1))


def test_keys_invariant_to_partition_count(spark):
    assert _keys(spark, 2) == _keys(spark, 16)


def test_no_single_partition_global_window(spark):
    cust = table(spark, SF0001, "customer").select("c_custkey", "c_name")
    df = assign_surrogate_keys(cust, "c_name", n_parts=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The data-sized ranking happened before the boundary-pinning
    # checkpoint (its plan: range exchange + per-pid window); the FINAL
    # plan may single-partition only the ~n_parts-row offsets side —
    # never the checkpointed data side, whose rows arrive pre-ranked.
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert windows, plan
    data_side_single = [
        ln for ln in plan.splitlines()
        if "Exchange SinglePartition" in ln and "ExistingRDD" in ln
    ]
    assert not data_side_single
    assert "Scan ExistingRDD" in plan  # the pinned partitioning barrier
