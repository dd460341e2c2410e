"""Streaming deduplication — at-least-once in, exactly-once rows out.

The reference's transport redelivers on nack (at-least-once,
/root/reference/data_subscriber.py:95-98) and relies on the day-scoped
re-load to stay idempotent.  A streaming engine can instead drop
duplicates IN FLIGHT: ``dropDuplicatesWithinWatermark`` keeps one state
entry per key only until the watermark passes it, so state is bounded by
the late-data horizon, not the stream's lifetime — the difference
between a dedup that survives a week and one that survives a year of
uptime at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(stream: DataFrame, keys: list[str],
                 ts_col: str = "tstamp",
                 watermark: str = "2 hours") -> DataFrame:
    """Drop redelivered records by ``keys`` within the watermark horizon.

    Records whose key was already seen (while its state lives) are
    dropped; state for a key is evicted once the event-time watermark
    passes its timestamp + horizon.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
