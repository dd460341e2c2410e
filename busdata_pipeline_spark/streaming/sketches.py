"""Streaming frequency sketching: CountMin as a streaming aggregate.

A CountMin sketch is just a (row, bucket) -> count grid, and counts are
exactly what Structured Streaming's state store aggregates incrementally
— so the STREAMING form of the sketch is a plain streaming
``groupBy(r, bucket).count()``: bounded state (depth x width rows, no
matter how many distinct items flow past), mergeable across
micro-batches by addition, queryable at any trigger.  This is the shape
a 100 TB event firehose keeps its heavy-hitter state in: the state
store never holds per-item rows, only the constant-size counter grid.

The grid hashes with the portable 60-bit md5 prefix (same as
plans/sketch_filters.py) so a DuckDB oracle replays the exact counters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from busdata_pipeline_spark.functions.hashing import h60

CMS_DEPTH = 4
CMS_WIDTH = 64


_h60 = h60  # shared house hash (functions/hashing.py)


def cms_slots(items: DataFrame, item_col: str,
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(item, r, bucket) — each item row expanded to its depth salted
    probe slots.  Works on batch AND streaming frames (explode + hash
    are stateless projections)."""
    return items.select(
        F.col(item_col).cast("string").alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).select(
        "item",
        "r",
        (
            _h60(
                F.concat(F.col("r").cast("string"), F.lit(":"), F.col("item"))
            )
            % width
        ).alias("bucket"),
    )


def cms_counters(items: DataFrame, item_col: str,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(r, bucket, cnt) — the sketch itself.  On a streaming frame this
    is an incremental stateful aggregate with at most depth*width state
    rows; on a batch frame, one hash aggregate."""
    return (
        cms_slots(items, item_col, depth, width)
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_query(counters: DataFrame, queries: DataFrame,
                    item_col: str,
                    depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """min-over-rows estimate for each query item: (item, cms_est).
    ``queries`` is a bounded frame (top-k candidates), broadcast against
    the constant-size counter grid."""
    probes = cms_slots(queries, item_col, depth, width)
    return (
        F.broadcast(probes)
        .join(counters, ["r", "bucket"])
        .groupBy("item")
        .agg(F.min("cnt").alias("cms_est"))
    )
