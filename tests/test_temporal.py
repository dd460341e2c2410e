"""Edge semantics of the composed temporal joins (the oracle-parity
driver covers the bulk behavior; these pin the corners)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_count,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01 10:00:00")),   # exact-tie match
            (2, 10, ts("2024-01-01 11:30:00")),   # normal backward match
            (3, 10, ts("2024-01-01 09:00:00")),   # before any right -> null
            (4, 20, ts("2024-01-01 12:00:00")),   # key with no right rows
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, ts("2024-01-01 10:00:00"), 1.0),  # ties with left id=1
            (10, ts("2024-01-01 11:00:00"), 2.0),
        ],
        ["k", "ts", "v"],
    )
    return left, right


def test_asof_backward_inclusive_and_nulls(spark, sides):
    left, right = sides
    out = {
        r.id: (None if r.m_ts is None else str(r.m_ts), r.m_v)
        for r in asof_join(
            left, right, key="k",
            right_cols={"ts": "m_ts", "v": "m_v"},
        ).collect()
    }
    assert out[1] == ("2024-01-01 10:00:00", 1.0)   # inclusive tie
    assert out[2] == ("2024-01-01 11:00:00", 2.0)   # latest <= left
    assert out[3] == (None, None)                   # nothing earlier
    assert out[4] == (None, None)                   # key absent on right


def test_asof_tolerance_voids_stale_matches(spark, sides):
    left, right = sides
    out = {
        r.id: r.m_v
        for r in asof_join(
            left, right, key="k",
            right_cols={"ts": "m_ts", "v": "m_v"},
            tolerance_sec=600,
        ).collect()
    }
    assert out[1] == 1.0     # 0s old
    assert out[2] is None    # 30min old > 10min tolerance


def test_asof_tolerance_requires_ts_carried(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="tolerance_sec"):
        asof_join(left, right, key="k", right_cols={"v": "m_v"},
                  tolerance_sec=60)


def test_range_count_bins_and_zeros(spark, sides):
    left, right = sides
    out = {
        r.id: r.n
        for r in range_join_count(
            left, right, key="k", left_id="id", right_id="v",
            lookback_sec=3600, out_col="n",
        ).collect()
    }
    # id=1: right@10:00 inside (09:00,10:00] -> 1 (inclusive upper edge)
    # id=2: right@11:00 inside (10:30,11:30]; right@10:00 outside -> 1
    # id=3/4: no candidates -> 0, rows still present (left semantics)
    assert out == {1: 1, 2: 1, 3: 0, 4: 0}


def test_resample_30min_step_aligns_grid(spark):
    from busdata_pipeline_spark.operators.temporal import resample_ffill

    events = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:05:00"), 10.0),
            (1, ts("2024-01-01 10:40:00"), 20.0),
            (1, ts("2024-01-01 11:45:00"), 40.0),
        ],
        ["user_id", "ts", "value"],
    )
    rows = {
        r.bucket_ts: (r.n_events, r.avg_value_ffill)
        for r in resample_ffill(events, step="30 minutes").collect()
    }
    # Grid spans 10:00 .. 11:30 on half-hour boundaries; every event
    # lands in its own half-hour bucket (no misaligned drops/zeros).
    assert rows == {
        ts("2024-01-01 10:00:00"): (1, 10.0),
        ts("2024-01-01 10:30:00"): (1, 20.0),
        ts("2024-01-01 11:00:00"): (0, 20.0),   # gap carries forward
        ts("2024-01-01 11:30:00"): (1, 40.0),
    }


def test_resample_rejects_calendar_steps(spark):
    from busdata_pipeline_spark.operators.temporal import resample_ffill

    events = spark.createDataFrame(
        [(1, ts("2024-01-01 10:05:00"), 1.0)], ["user_id", "ts", "value"]
    )
    with pytest.raises(ValueError, match="resample step"):
        resample_ffill(events, step="1 month")


def test_interval_overlap_join_matches_naive_inequality(spark):
    from busdata_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 13:00:00"),
         (2, "2024-01-01 15:00:00", "2024-01-01 16:00:00"),
         (3, "2024-01-01 11:30:00", "2024-01-02 12:30:00")],  # spans days
        "aid long, s_start string, s_end string",
    ).select("aid", F.col("s_start").cast("timestamp").alias("s_start"),
             F.col("s_end").cast("timestamp").alias("s_end"))
    b = spark.createDataFrame(
        [(10, "2024-01-01 12:00:00", "2024-01-01 14:00:00"),
         (11, "2024-01-02 12:00:00", "2024-01-02 14:00:00")],
        "bid long, w_start string, w_end string",
    ).select("bid", F.col("w_start").cast("timestamp").alias("w_start"),
             F.col("w_end").cast("timestamp").alias("w_end"))

    got = sorted(
        (r.aid, r.bid, r.overlap_seconds)
        for r in interval_overlap_join(
            a, b, "s_start", "s_end", "w_start", "w_end", bin_seconds=7200
        ).collect()
    )
    naive = sorted(
        (r.aid, r.bid, r.ov)
        for r in a.join(
            b,
            (F.col("s_start") <= F.col("w_end"))
            & (F.col("w_start") <= F.col("s_end")),
        ).select(
            "aid", "bid",
            F.round(
                F.least(F.col("s_end").cast("double"),
                        F.col("w_end").cast("double"))
                - F.greatest(F.col("s_start").cast("double"),
                             F.col("w_start").cast("double")), 6
            ).alias("ov"),
        ).collect()
    )
    assert got == naive
    # sessions 1 and 3 hit window 10; session 3 also hits window 11
    assert [(x[0], x[1]) for x in got] == [(1, 10), (3, 10), (3, 11)]


def test_interval_overlap_join_plan_is_equi(spark):
    from busdata_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )
    from busdata_pipeline_spark.sources import table
    from tests.conftest import SF0001

    ev = table(spark, SF0001, "events")
    s = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    w = ev.select(F.to_date("ts").alias("w_day")).distinct().select(
        "w_day",
        (F.col("w_day").cast("timestamp") + F.expr("INTERVAL 12 HOURS")
         ).alias("w_start"),
        (F.col("w_day").cast("timestamp") + F.expr("INTERVAL 14 HOURS")
         ).alias("w_end"))
    df = interval_overlap_join(s, w, "s_start", "s_end",
                               "w_start", "w_end", 7200)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
