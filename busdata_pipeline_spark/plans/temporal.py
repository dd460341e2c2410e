"""Temporal-join query surface: as-of join, bounded range join, and the
time-hierarchy (hypertable-style) rollup — operators Spark has no
built-in for, composed per operators/temporal.py and oracle-checked
against DuckDB (which HAS a native ASOF JOIN — the strongest possible
differential test for our union-and-carry-forward formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_count,
)
from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table


@query(
    "rel_asof_attribution",
    oracle="""
SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
       c.ts AS click_ts, c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def rel_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase→latest-click attribution: backward inclusive as-of per
    user.  One window shuffle keyed by user_id — no inequality join —
    checked against DuckDB's native ASOF LEFT JOIN."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click")
    return asof_join(
        purchases, clicks, key="user_id",
        right_cols={"ts": "click_ts", "value": "click_value"},
    )


@query(
    "rel_range_click_burst",
    oracle="""
SELECT e.event_id AS event_id, COUNT(c.event_id) AS n_recent_clicks
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND c.ts > e.ts - INTERVAL 30 MINUTE
 AND c.ts <= e.ts
GROUP BY e.event_id
""",
)
def rel_range_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks in the 30 minutes before each error, per user — the
    bounded range join.  The time axis is binned at the lookback width
    so candidates come from a 2-bucket equi-join, not an inequality
    join; DuckDB's IEJoin over the raw predicate is the oracle."""
    ev = table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    out = range_join_count(
        errors, clicks, key="user_id", left_id="event_id",
        right_id="click_id", lookback_sec=1800,
        out_col="n_recent_clicks",
    )
    return out.select("event_id", "n_recent_clicks")


@query(
    "rel_time_rollup",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY ROLLUP (1, 2)
""",
)
def rel_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: hour rollups,
    day subtotals, and the grand total from ONE Expand+hash-agg pass —
    the materialized-rollup pattern for time-series marts."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "rel_resample_hourly_ffill",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM events),
grid AS (
  SELECT u.user_id, g.h AS bucket_ts
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT unnest(generate_series(
      (SELECT h0 FROM bounds), (SELECT h1 FROM bounds),
      INTERVAL 1 HOUR)) AS h) g),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         COUNT(*) AS n, AVG(value) AS av
  FROM events GROUP BY 1, 2)
SELECT g.user_id, g.bucket_ts,
  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
  ROUND(LAST_VALUE(h.av IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.bucket_ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
    AS avg_value_ffill
FROM grid g
LEFT JOIN hourly h
  ON h.user_id = g.user_id AND h.bucket_ts = g.bucket_ts
""",
)
def rel_resample_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled resample of the events stream per user with
    forward-filled averages — the time-series regularization step feeding
    any downstream rolling computation.  See
    operators/temporal.py:resample_ffill for the no-inequality-join
    formulation."""
    from busdata_pipeline_spark.operators.temporal import resample_ffill

    return resample_ffill(table(spark, sf_dir, "events"))


@query(
    "rel_interval_overlap_join",
    oracle="""
WITH s AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM events GROUP BY 1, 2),
w AS (
  SELECT DISTINCT CAST(ts AS DATE) AS w_day,
         CAST(ts AS DATE)::TIMESTAMP + INTERVAL 12 HOUR AS w_start,
         CAST(ts AS DATE)::TIMESTAMP + INTERVAL 14 HOUR AS w_end
  FROM events)
SELECT s.user_id, s.day, w.w_day,
       ROUND(epoch(LEAST(s.s_end, w.w_end))
             - epoch(GREATEST(s.s_start, w.w_start)), 6) AS overlap_seconds
FROM s JOIN w ON s.s_start <= w.w_end AND w.w_start <= s.s_end
ORDER BY user_id, day, w_day
""",
)
def rel_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided interval overlap join (sessions × daily maintenance
    windows) via shared-grid binning + exact verify — the inequality
    join DuckDB runs directly is never materialized; candidates come
    from the 2-hour-bin equi-join (operators/temporal.
    interval_overlap_join)."""
    from busdata_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    ev = table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    windows = (
        ev.select(F.to_date("ts").alias("w_day")).distinct()
        .select(
            "w_day",
            (F.col("w_day").cast("timestamp")
             + F.expr("INTERVAL 12 HOURS")).alias("w_start"),
            (F.col("w_day").cast("timestamp")
             + F.expr("INTERVAL 14 HOURS")).alias("w_end"),
        )
    )
    return (
        interval_overlap_join(
            sessions, windows,
            "s_start", "s_end", "w_start", "w_end",
            bin_seconds=7200,
        )
        .select("user_id", "day", "w_day", "overlap_seconds")
        .orderBy("user_id", "day", "w_day")
    )


@query(
    "rel_resample_linear_interp",
    # Same grid/bucket construction as the ffill oracle; interior gaps
    # take the straight line between rounded neighbor means, edges stay
    # NULL (limit_area='inside' semantics).  Buckets come from
    # date_trunc (plain TIMESTAMP) — to_timestamp(epoch…) would yield
    # DuckDB TIMESTAMPTZ and fail the driver's schema compare.
    oracle="""
WITH ev AS (SELECT * FROM events WHERE value IS NOT NULL),
b AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM ev),
g AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
           AS bucket_ts
  FROM (SELECT DISTINCT user_id FROM ev), b),
o AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         CAST(SUM(CAST(FLOOR(value * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / (COUNT(*) * 1048576.0) AS obs
  FROM ev GROUP BY 1, 2),
j AS (
  SELECT g.user_id, g.bucket_ts, o.obs
  FROM g LEFT JOIN o USING (user_id, bucket_ts)),
w AS (
  SELECT user_id, bucket_ts, obs,
    last_value(obs IGNORE NULLS) OVER wb AS back,
    last_value(CASE WHEN obs IS NOT NULL THEN bucket_ts END IGNORE NULLS)
      OVER wb AS back_ts,
    first_value(obs IGNORE NULLS) OVER wf AS fwd,
    first_value(CASE WHEN obs IS NOT NULL THEN bucket_ts END IGNORE NULLS)
      OVER wf AS fwd_ts
  FROM j
  WINDOW wb AS (PARTITION BY user_id ORDER BY bucket_ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY bucket_ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, bucket_ts,
  CASE WHEN obs IS NOT NULL THEN ROUND(obs, 6)
       WHEN back IS NOT NULL AND fwd IS NOT NULL THEN
         ROUND(back + (fwd - back)
               * (epoch(bucket_ts) - epoch(back_ts))
               / (epoch(fwd_ts) - epoch(back_ts)), 6)
  END AS value
FROM w
ORDER BY user_id, bucket_ts
""",
)
def rel_resample_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with linear interpolation over interior gaps
    (operators/temporal.resample_linear) — the numeric companion to
    rel_resample_hourly_ffill."""
    from busdata_pipeline_spark.operators.temporal import resample_linear

    return resample_linear(table(spark, sf_dir, "events"))


@query(
    "rel_ewma_value",
    # The oracle replays the recurrence itself as a rule-14 RECURSIVE
    # walk: one double of state per key per level, the same
    # (1-α)·acc + α·x fold in the same (ts, event_id) order on IEEE
    # doubles, so the hash checks every intermediate state.  (The
    # original list_reduce-over-prefix-list form materialized every
    # row's full prefix — O(rows-per-key²) oracle MEMORY — which kept
    # this query on the replica skip list; the recursion is linear and
    # bit-identical, and un-skipped it at 10× and 100×.)
    oracle="""
WITH RECURSIVE p AS MATERIALIZED (
  SELECT user_id, event_id, value,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS i
  FROM events WHERE value IS NOT NULL),
rec AS (
  SELECT user_id, i, value AS acc FROM p WHERE i = 1
  UNION ALL
  SELECT p.user_id, p.i, 0.7 * r.acc + 0.3 * p.value
  FROM rec r JOIN p ON p.user_id = r.user_id AND p.i = r.i + 1)
SELECT p.event_id, p.user_id,
       FLOOR(r.acc * 1000000.0 + 0.5) / 1000000.0 AS ewma
FROM rec r
JOIN p ON p.user_id = r.user_id AND p.i = r.i
""",
)
def rel_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α = 0.3) over the event value series — the
    sequential-recurrence smoother (serial within key, parallel across
    keys) via operators/temporal.ewma_smooth's partition-level
    mapInPandas.  The 6-decimal cut is FLOOR-quantized (x·1e6 + 0.5,
    floor, /1e6) on BOTH engines instead of ROUND: the 2-decimal input
    domain makes the fold land on exact decimal halves (first observed
    at the 10× replica: 133.5310185), where Spark's ROUND (HALF_UP on
    the shortest decimal repr) and DuckDB's (binary) disagree — the
    quantized form is pure double arithmetic, identical in any IEEE
    engine."""
    from busdata_pipeline_spark.operators.temporal import ewma_smooth

    ev = table(spark, sf_dir, "events")
    return ewma_smooth(ev, alpha=0.3).select(
        "event_id", "user_id",
        (F.floor(F.col("ewma") * 1000000.0 + 0.5) / 1000000.0)
        .alias("ewma"),
    )


@query(
    "rel_seasonal_decompose",
    # All state is quantized to 1e-9 integer units the moment it leaves
    # exact arithmetic (daily means from exact cent sums, trend from a
    # 7-bigint frame sum, seasonal from a bigint group mean), so every
    # derived series is bit-identical across engines — the same
    # discipline as PageRank's per-round quantization (plans/graph.py).
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM events WHERE value IS NOT NULL GROUP BY d),
q AS (
  SELECT d,
         CAST(FLOOR(CAST(s AS DOUBLE) * 10000000.0 / n + 0.5) AS BIGINT)
           AS mq
  FROM daily),
t AS (
  SELECT d, mq,
         CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(FLOOR(CAST(SUM(mq) OVER w AS DOUBLE) / 7.0 + 0.5)
                        AS BIGINT) END AS tq
  FROM q
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
det AS (SELECT d, mq, tq, mq - tq AS dq, EXTRACT(dow FROM d) AS dow FROM t),
seas AS (
  SELECT dow,
         CAST(FLOOR(CAST(SUM(dq) AS DOUBLE) / COUNT(dq) + 0.5) AS BIGINT)
           AS sq
  FROM det WHERE dq IS NOT NULL GROUP BY dow)
SELECT det.d AS d,
  ROUND(CAST(mq AS DOUBLE) / 1000000000.0, 6) AS daily_mean,
  ROUND(CAST(tq AS DOUBLE) / 1000000000.0, 6) AS trend,
  ROUND(CAST(seas.sq AS DOUBLE) / 1000000000.0, 6) AS seasonal,
  ROUND(CAST(mq - tq - seas.sq AS DOUBLE) / 1000000000.0, 6) AS residual
FROM det LEFT JOIN seas USING (dow)
""",
)
def rel_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily-mean value
    series: trend = centered 7-day moving average (NULL at the edges
    where the frame is short), seasonal = per-day-of-week mean of the
    detrended series, residual = observed − trend − seasonal.  The
    decomposition runs on the DAILY aggregate — dimension-sized at any
    fact scale, so the ordered window is over thousands of rows even at
    100 TB; the fact scan itself is one map-combinable grouped sum in
    exact cents."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
        ).cast("long").alias("s"),
    )
    q = daily.select(
        "d",
        F.floor(
            F.col("s").cast("double") * F.lit(10000000.0) / F.col("n")
            + F.lit(0.5)
        ).cast("long").alias("mq"),
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    t = q.select(
        "d", "mq",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.floor(
                F.sum("mq").over(w).cast("double") / F.lit(7.0) + F.lit(0.5)
            ).cast("long"),
        ).alias("tq"),
    )
    det = t.select(
        "d", "mq", "tq",
        (F.col("mq") - F.col("tq")).alias("dq"),
        F.dayofweek("d").alias("dow"),
    )
    seas = (
        det.where(F.col("dq").isNotNull())
        .groupBy("dow")
        .agg(
            F.floor(
                F.sum("dq").cast("double") / F.count("dq") + F.lit(0.5)
            ).cast("long").alias("sq")
        )
    )
    return det.join(F.broadcast(seas), "dow", "left").select(
        "d",
        F.round(F.col("mq").cast("double") / F.lit(1e9), 6)
        .alias("daily_mean"),
        F.round(F.col("tq").cast("double") / F.lit(1e9), 6).alias("trend"),
        F.round(F.col("sq").cast("double") / F.lit(1e9), 6).alias("seasonal"),
        F.round(
            (F.col("mq") - F.col("tq") - F.col("sq")).cast("double")
            / F.lit(1e9), 6
        ).alias("residual"),
    )
