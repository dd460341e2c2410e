"""Incremental aggregate maintenance: a running per-key rollup table
(materialized-view style) updated from day deltas without recomputing
history.

The reference recomputes analytics from the full warehouse every time
(analytic.sql over all loaded days); at 100 TB a running per-user totals
table cannot be rebuilt per day.  Standard maintenance for decomposable
aggregates (sum/count/min/max): combine the existing totals with the
delta's partials, key by key.

Layout makes the update bounded: the rollup is hash-BUCKET-partitioned on
the key (``bucket = pmod(hash(key), n)``, a directory per bucket).  A
delta touches only the buckets its keys hash into, so the merge reads and
dynamically overwrites JUST those directories — cost scales with delta
keys, not table size.  (Same contract as Delta MERGE on a clustered
table, built from vanilla partition-overwrite writes.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_kb"


def _with_bucket(df: DataFrame, key: str, buckets: int) -> DataFrame:
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)))


def user_day_delta(events: DataFrame) -> DataFrame:
    """The day's decomposable partials per user (the merge input)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
    )


def merge_rollup(spark: SparkSession, delta: DataFrame, path: str,
                 key: str = "user_id", buckets: int = 8) -> None:
    """Fold ``delta`` (per-key partials from ``user_day_delta``) into the
    rollup at ``path``, touching only the buckets the delta's keys hash
    into.  Safe to replay a day IF the caller dedups upstream (pair with
    the warehouse's idempotent day staging); the merge itself is
    exactly-once per invocation via dynamic partition overwrite."""
    delta_b = _with_bucket(delta, key, buckets)
    if os.path.isdir(path):
        touched = [r[BUCKET_COL] for r in
                   delta_b.select(BUCKET_COL).distinct().collect()]
        existing = spark.read.parquet(path).where(
            F.col(BUCKET_COL).isin(touched)
        )
        merged = (
            existing.unionByName(delta_b)
            .groupBy(key, BUCKET_COL)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_value").alias("total_value"),
                F.max("max_value").alias("max_value"),
            )
            # Materialize before overwriting the directory being read:
            # reading and dynamic-overwriting the same path in one job is
            # a known self-overwrite hazard on direct-write committers.
            .localCheckpoint(eager=True)
        )
    else:
        merged = delta_b
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(BUCKET_COL)


def merge_join_view(view_prev: DataFrame,
                    a_prev: DataFrame, b_prev: DataFrame,
                    a_delta: DataFrame, b_delta: DataFrame,
                    on: list[str] | str) -> DataFrame:
    """Incremental JOIN view maintenance for append-only sides:

        Δ(A ⋈ B) = ΔA ⋈ B_prev  ∪  A_prev ⋈ ΔB  ∪  ΔA ⋈ ΔB
        view_new = view_prev ∪ Δ

    The aggregate analog lives in ``merge_rollup``; this is the join
    analog — the other half of classic IVM.  Cost at scale: every term
    is delta-sized on at least one side (AQE broadcasts the delta), so
    maintaining the view costs O(Δ ⋈ ·), never O(A ⋈ B); the view itself
    is only appended to, which composes with the bucket-partitioned
    storage discipline used by the rollup.
    """
    delta = (
        a_delta.join(b_prev, on)
        .unionByName(a_prev.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )
    return view_prev.unionByName(delta)


def retract_partials(rows: DataFrame, m: int, key: str = "user_id",
                     value: str = "value") -> DataFrame:
    """Per-key signed partials for the retractable rollup: multiplicity
    ``m`` (+1 insert / −1 retract) applied to COUNT and the exact-cents
    SUM.  Values quantize to integer cents so the maintained sum is
    order-independent and retraction is EXACT — subtracting floats back
    out would drift."""
    c = F.floor(F.col(value) * F.lit(100.0) + F.lit(0.5)).cast("long")
    return rows.groupBy(key).agg(
        F.sum(F.lit(m)).cast("long").alias("dn"),
        F.sum(F.lit(m) * c).cast("long").alias("dc"),
    )


def merge_rollup_retract(spark: SparkSession, delta: DataFrame, path: str,
                         key: str = "user_id", buckets: int = 8) -> None:
    """Retraction-aware rollup maintenance: fold signed partials
    (``retract_partials``) into the bucket-partitioned state at
    ``path``; keys whose count reaches zero are REMOVED.  Same
    bucket-scoped cost contract as ``merge_rollup`` (only the delta's
    buckets are read/overwritten).

    Maintains COUNT and SUM only: they are group-retractable (a delete
    folds in as a signed partial).  MIN/MAX are NOT — a retraction of
    the current extremum forces re-derivation from base data — which is
    exactly why ``merge_rollup`` (insert-only) carries max_value and
    this variant does not; the split mirrors the standard IVM
    retractable/non-retractable aggregate distinction."""
    delta_b = _with_bucket(delta, key, buckets)
    if os.path.isdir(path):
        touched = [r[BUCKET_COL] for r in
                   delta_b.select(BUCKET_COL).distinct().collect()]
        existing = spark.read.parquet(path).where(
            F.col(BUCKET_COL).isin(touched)
        )
        merged = (
            existing.unionByName(delta_b)
            .groupBy(key, BUCKET_COL)
            .agg(
                F.sum("dn").cast("long").alias("dn"),
                F.sum("dc").cast("long").alias("dc"),
            )
            .where(F.col("dn") > 0)
            # materialized BEFORE the bucket delete below (we are about
            # to remove the files this plan reads)
            .localCheckpoint(eager=True)
        )
        # Dynamic partition overwrite only rewrites partitions PRESENT
        # in the output — a bucket whose every key retracted to zero
        # yields no rows, so its stale files would silently survive.
        # Delete every touched bucket explicitly, then append the merged
        # state (exactly the set of touched-bucket rows that remain).
        import shutil as _sh

        for b in touched:
            _sh.rmtree(os.path.join(path, f"{BUCKET_COL}={b}"),
                       ignore_errors=True)
        # Clear any empty-state marker left by a prior full retraction
        # BEFORE appending bucket dirs (root files + partition dirs is a
        # layout parquet partition discovery rejects).
        for f in _root_parquet_files(path):
            os.remove(f)
        merged.write.mode("append").partitionBy(BUCKET_COL).parquet(path)
        _ensure_readable_when_empty(merged, path)
    else:
        first = delta_b.where(F.col("dn") > 0)
        (
            first
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(path)
        )
        _ensure_readable_when_empty(first, path)


def merge_rollup_retract_versioned(spark: SparkSession, delta: DataFrame,
                                   path: str, key: str = "user_id",
                                   buckets: int = 8) -> int:
    """``merge_rollup_retract`` on the manifest-last versioned-table
    layer (operators/versioned.py) instead of in-place mutation: the
    merged touched-bucket state lands as a ``replace`` commit whose
    manifest rename is the only commit point.

    What this buys over the in-place variant:
    - atomic on object stores — no rmtree window where a reader can
      observe deleted-but-not-yet-rewritten buckets;
    - no eager localCheckpoint needed — the merge plan reads prior
      commit directories that are never touched (new data goes to a
      NEW directory), so the self-overwrite hazard doesn't exist;
    - the pre-retraction state stays time-travelable
      (``read_version(path, v)``), and an all-keys-retracted bucket
      needs no empty-marker file games — the replace commit's manifest
      masks it everywhere.

    Same bounded-cost contract: only the delta's buckets are read from
    the snapshot and only their rows are written.  Returns the commit
    version."""
    from busdata_pipeline_spark.operators.versioned import (
        read_version,
        table_history,
        write_replace_partitions,
        write_version,
    )

    delta_b = _with_bucket(delta, key, buckets)
    if not table_history(path):
        return write_version(
            delta_b.where(F.col("dn") > 0), path, "overwrite",
            partition_col=BUCKET_COL,
        )
    touched = [r[BUCKET_COL] for r in
               delta_b.select(BUCKET_COL).distinct().collect()]
    existing = read_version(spark, path).where(
        F.col(BUCKET_COL).isin(touched)
    )
    merged = (
        existing.unionByName(delta_b)
        .groupBy(key, BUCKET_COL)
        .agg(
            F.sum("dn").cast("long").alias("dn"),
            F.sum("dc").cast("long").alias("dc"),
        )
        .where(F.col("dn") > 0)
    )
    return write_replace_partitions(merged, path, BUCKET_COL, touched)


def read_rollup_versioned(spark: SparkSession, path: str,
                          version: int | None = None) -> DataFrame:
    """Snapshot of a versioned rollup (default latest)."""
    from busdata_pipeline_spark.operators.versioned import read_version

    return read_version(spark, path, version).drop(BUCKET_COL)


def _root_parquet_files(path: str) -> list[str]:
    import glob

    return glob.glob(os.path.join(path, "*.parquet"))


def _ensure_readable_when_empty(state: DataFrame, path: str) -> None:
    """A fully-retracted rollup writes zero data files (partitioned
    writers emit nothing for an empty plan), leaving a directory parquet
    schema inference cannot read.  Drop in a zero-row UNPARTITIONED
    marker file carrying the full schema so ``read_rollup`` and the next
    merge still work; the next non-empty merge removes the marker before
    appending partition dirs."""
    import glob

    has_data = glob.glob(os.path.join(path, "**", "*.parquet"),
                         recursive=True)
    if not has_data:
        (
            state.limit(0).repartition(1)
            .write.mode("append").parquet(path)
        )
