"""Event-time window aggregations — tumbling / sliding / session.

Absent from the reference (its analytics are batch-over-warehouse,
SURVEY.md §2.9) but core engine surface.  Each builder takes ANY
DataFrame — batch or streaming — and returns the same lineage: batch
execution gives the oracle-checkable semantics, streaming execution
(with ``with_watermark``) gives incremental state-store evaluation.
One definition, two engines — that's the Spark guarantee being leaned
on, and what the tests assert (stream result == batch result).

Watermarks bound state: a "1 hour" tumbling agg with a "2 hours"
watermark holds at most ~3 window generations per key in the store
regardless of input volume — the 100 TB/day streaming posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, delay: str = "2 hours",
                   ts_col: str = "ts") -> DataFrame:
    """T3 — tolerate late data up to ``delay``; later-than-that rows are
    dropped from windowed aggs (the reference kept old day-files open
    indefinitely — a watermark is the bounded-state version)."""
    return df.withWatermark(ts_col, delay)


def tumbling_counts(df: DataFrame, width: str = "1 hour",
                    ts_col: str = "ts") -> DataFrame:
    w = F.window(ts_col, width)
    return (
        df.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def sliding_counts(df: DataFrame, width: str = "2 hours",
                   slide: str = "1 hour", ts_col: str = "ts") -> DataFrame:
    w = F.window(ts_col, width, slide)
    return (
        df.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_stats(df: DataFrame, gap: str = "5 minutes",
                  key_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Session windows: a session extends while consecutive events arrive
    within ``gap``; identical to the gaps-and-islands SQL the oracle runs."""
    w = F.session_window(ts_col, gap)
    return (
        df.groupBy(key_col, w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def type_counts_windowed(df: DataFrame, width: str = "1 hour",
                         ts_col: str = "ts",
                         key_col: str = "event_type") -> DataFrame:
    """Per-window per-key counts — the streamable HALF of trending
    topics: this aggregation runs incrementally (update/complete mode,
    watermark-bounded state); the rank over it is applied DOWNSTREAM of
    the sink by ``rank_trending`` (ranking needs the window's final
    state, so it belongs to the serving layer, batch and streaming
    alike — same split a real trending dashboard uses)."""
    w = F.window(ts_col, width)
    return (
        df.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), key_col, "n")
    )


def rank_trending(counts: DataFrame, k: int = 3,
                  key_col: str = "event_type") -> DataFrame:
    """Top-k per window over the (window_start, key, n) counts; ties →
    key order so results are engine-stable.  WindowGroupLimit keeps k
    rows per window partition — no global sort."""
    from pyspark.sql import Window as W

    win = W.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc(key_col)
    )
    return (
        counts.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
    )
