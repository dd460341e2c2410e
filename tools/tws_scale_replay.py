#!/usr/bin/env python
"""Stream==batch differential for the transformWithStateInPandas
stateful tier at replica scale (round-9 task: the TWS queries were
pytest-pinned at fixture scale only).

Derives a breadcrumb stream from the events table of
$SPARK_GRAFT_SF_DIR (default /tmp/sf1_synth, the 10x replica):
trip_id = user_id, ACT_TIME = whole seconds since the corpus base day,
one JSONL file per time slice with increasing mtimes so availableNow
replays the slices in event-time order (maxFilesPerTrigger=1 -> one
micro-batch per slice; in-order slices mean the watermark never drops
data and the per-batch event-time walk equals the global event-time
walk).

The BATCH TWIN runs the identical per-ping episode state machine
(follow-up < gap => completed + reset; >= gap => timed_out + reopen)
via applyInPandas over the whole table, then closes still-open
episodes exactly like the engine's final timer flush: timed_out iff
final watermark (max event ms - watermark delay) >= first_ms + gap —
the same >= boundary the timer path uses
(streaming/stateful.py:TripTimeoutProcessor).

Prints one JSON line: {"rows_in", "stream_rows", "batch_rows",
"only_stream", "only_batch", "match", "stream_sec", "sf_dir"}.
Exit 0 iff match.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from busdata_pipeline_spark.session import get_spark  # noqa: E402
from busdata_pipeline_spark.sources import table  # noqa: E402

GAP_MS = 3_600_000           # 1 h episode gap
WM_DELAY = "10 seconds"
WM_DELAY_MS = 10_000
N_SLICES = 8
BASE_DAY = "2024-01-01"
OPD = "01JAN2024:00:00:00"   # breadcrumb_timestamp parses this to BASE_DAY


def stage_breadcrumbs(spark, sf_dir: str, drop_dir: str) -> int:
    """events -> N_SLICES breadcrumb JSONL files in event-time order."""
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    base = F.lit(BASE_DAY).cast("timestamp")
    crumbs = ev.select(
        F.col("user_id").alias("EVENT_NO_TRIP"),
        F.lit(1).cast("long").alias("EVENT_NO_STOP"),
        F.lit(OPD).alias("OPD_DATE"),
        F.lit(1).cast("long").alias("VEHICLE_ID"),
        F.lit(1.0).alias("METERS"),
        F.floor(F.col("ts").cast("double") - base.cast("double"))
        .cast("long").alias("ACT_TIME"),
        F.lit(45.5).alias("GPS_LATITUDE"),
        F.lit(-122.6).alias("GPS_LONGITUDE"),
        F.ntile(N_SLICES).over(Window.orderBy("ts")).alias("_slice"),
    )
    n = 0
    now = time.time()
    for i in range(1, N_SLICES + 1):
        part = crumbs.where(F.col("_slice") == i).drop("_slice")
        tmp = os.path.join(drop_dir, f"_stage{i}")
        part.coalesce(1).write.mode("overwrite").json(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".json")][0]
        dst = os.path.join(drop_dir, f"slice_{i:02d}.jsonl")
        shutil.move(os.path.join(tmp, src), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - (N_SLICES - i) * 60, now - (N_SLICES - i) * 60))
        with open(dst) as fh:
            n += sum(1 for _ in fh)
    return n


def run_stream(spark, drop_dir: str, out_dir: str) -> float:
    from busdata_pipeline_spark.streaming.ingest import stream_breadcrumbs
    from busdata_pipeline_spark.streaming.stateful import (
        detect_trip_timeouts,
        ensure_protobuf_runtime,
    )

    assert ensure_protobuf_runtime(spark) in ("protobuf", "shim")
    # transformWithState requires the multi-column-family state store
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    t0 = time.perf_counter()
    q = (
        detect_trip_timeouts(
            stream_breadcrumbs(spark, drop_dir, max_files_per_trigger=1),
            gap_ms=GAP_MS, watermark_delay=WM_DELAY,
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(900):
        q.stop()
        raise TimeoutError("TWS replay did not drain in 900s")
    return time.perf_counter() - t0


VERDICT = T.StructType([
    T.StructField("trip_id", T.LongType()),
    T.StructField("first_time", T.LongType()),
    T.StructField("n_pings", T.LongType()),
    T.StructField("outcome", T.StringType()),
])


def batch_twin(spark, sf_dir: str):
    """Same episode state machine, batch-side, per trip — plus the
    final-watermark timer flush for episodes still open at end."""
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    base = F.lit(BASE_DAY).cast("timestamp")
    pings = ev.select(
        F.col("user_id").alias("trip_id"),
        F.floor(F.col("ts").cast("double") - base.cast("double"))
        .cast("long").alias("act"),
    )
    # both sides measure event time in ms offsets from the same base
    # day, so the final-watermark comparison only needs act*1000
    final_max_ms = pings.agg(F.max("act")).collect()[0][0] * 1000
    final_wm = final_max_ms - WM_DELAY_MS
    gap = GAP_MS

    def episodes(pdf):
        import pandas as pd

        pdf = pdf.sort_values("act", kind="mergesort")
        out = []
        trip = int(pdf["trip_id"].iloc[0])
        open_ep = None  # (first_ms, first_act, n)
        for act in pdf["act"]:
            ms = int(act) * 1000
            if open_ep is None:
                open_ep = (ms, int(act), 1)
                continue
            first_ms, f_act, n = open_ep
            if ms - first_ms >= gap:
                out.append((trip, f_act, n, "timed_out"))
                open_ep = (ms, int(act), 1)
            else:
                out.append((trip, f_act, n + 1, "completed"))
                open_ep = None
        if open_ep is not None:
            first_ms, f_act, n = open_ep
            if final_wm >= first_ms + gap:   # the timer's >= boundary
                out.append((trip, f_act, n, "timed_out"))
        return pd.DataFrame(
            out, columns=["trip_id", "first_time", "n_pings", "outcome"]
        )

    return pings.groupBy("trip_id").applyInPandas(episodes, VERDICT)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1_synth")
    spark = get_spark("tws-scale-replay")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="tws_replay_")
    try:
        drop = os.path.join(root, "drop")
        os.makedirs(drop)
        rows_in = stage_breadcrumbs(spark, sf_dir, drop)
        out_dir = os.path.join(root, "verdicts")
        stream_sec = run_stream(spark, drop, out_dir)
        got = spark.read.parquet(out_dir)
        want = batch_twin(spark, sf_dir)
        key = ["trip_id", "first_time", "n_pings", "outcome"]
        gc = got.groupBy(key).count().withColumnRenamed("count", "n_s")
        wc = want.groupBy(key).count().withColumnRenamed("count", "n_b")
        j = gc.join(wc, key, "full_outer").select(
            F.coalesce("n_s", F.lit(0)).alias("n_s"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
        diff = j.where(F.col("n_s") != F.col("n_b"))
        only_s = diff.where(F.col("n_s") > F.col("n_b")).count()
        only_b = diff.where(F.col("n_b") > F.col("n_s")).count()
        res = {
            "rows_in": rows_in,
            "stream_rows": got.count(),
            "batch_rows": want.count(),
            "only_stream": only_s,
            "only_batch": only_b,
            "match": only_s == 0 and only_b == 0,
            "stream_sec": round(stream_sec, 2),
            "sf_dir": sf_dir,
        }
        print(json.dumps(res))
        return 0 if res["match"] else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
