"""erase_subject (operators/warehouse.py): partition-scoped GDPR delete —
subject rows gone, everyone else intact, untouched partitions' files not
rewritten."""

from __future__ import annotations

import datetime
import glob
import os

from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.warehouse import (
    _fact_path,
    erase_subject,
)


def _mk_warehouse(spark, tmp_path):
    rows = []
    eid = 0
    for day in (1, 2, 3, 4):
        for user in (10, 20, 30):
            if user == 10 and day > 2:
                continue  # subject 10 has rows on days 1-2 only
            for _ in range(5):
                eid += 1
                rows.append(
                    (eid, datetime.datetime(2024, 1, day, 12, 0, eid % 60),
                     user, float(eid))
                )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).withColumn("event_date", F.to_date("ts"))
    wh = str(tmp_path / "wh")
    df.write.mode("overwrite").partitionBy("event_date").parquet(
        _fact_path(wh)
    )
    return wh, df


def test_erase_subject_scoped_rewrite(spark, tmp_path):
    wh, df = _mk_warehouse(spark, tmp_path)
    root = _fact_path(wh)

    def files(pred):
        return {
            os.path.relpath(f, root): os.path.getsize(f)
            for f in glob.glob(f"{root}/event_date=*/*.parquet")
            if pred(os.path.relpath(f, root))
        }

    untouched_before = files(lambda r: not (
        r.startswith("event_date=2024-01-01") or
        r.startswith("event_date=2024-01-02")))
    audit = erase_subject(spark, wh, "user_id", 10)
    assert audit == {"days_rewritten": 2, "rows_removed": 10}

    post = spark.read.parquet(root)
    assert post.where(F.col("user_id") == 10).count() == 0
    # everyone else fully intact, including on the rewritten days
    assert post.count() == df.where(F.col("user_id") != 10).count()
    assert (
        post.where(F.col("user_id") == 20).count()
        == df.where(F.col("user_id") == 20).count()
    )
    # untouched partitions: identical file sets and sizes
    untouched_after = files(lambda r: not (
        r.startswith("event_date=2024-01-01") or
        r.startswith("event_date=2024-01-02")))
    assert untouched_before == untouched_after


def test_erase_subject_absent_is_noop(spark, tmp_path):
    wh, df = _mk_warehouse(spark, tmp_path)
    root = _fact_path(wh)
    before = {
        os.path.relpath(f, root): os.path.getsize(f)
        for f in glob.glob(f"{root}/event_date=*/*.parquet")
    }
    assert erase_subject(spark, wh, "user_id", 999) == {
        "days_rewritten": 0, "rows_removed": 0,
    }
    after = {
        os.path.relpath(f, root): os.path.getsize(f)
        for f in glob.glob(f"{root}/event_date=*/*.parquet")
    }
    assert before == after


def test_erase_subject_null_subjects_survive(spark, tmp_path):
    """Rows whose subject column is NULL must NOT be deleted: `!=` is
    UNKNOWN against NULL, so the survivor filter has to be
    ~eqNullSafe (the round-5 audit's data-loss finding #2)."""
    wh, df = _mk_warehouse(spark, tmp_path)
    root = _fact_path(wh)
    # add NULL-subject rows on a day that WILL be rewritten (day 1)
    extra = spark.createDataFrame(
        [(9001, datetime.datetime(2024, 1, 1, 6, 0, 0), None, 1.0),
         (9002, datetime.datetime(2024, 1, 1, 7, 0, 0), None, 2.0)],
        "event_id long, ts timestamp, user_id long, value double",
    ).withColumn("event_date", F.to_date("ts"))
    extra.write.mode("append").partitionBy("event_date").parquet(root)

    audit = erase_subject(spark, wh, "user_id", 10)
    assert audit == {"days_rewritten": 2, "rows_removed": 10}
    post = spark.read.parquet(root)
    assert post.where(F.col("user_id").isNull()).count() == 2
    assert post.where(F.col("user_id") == 10).count() == 0


def test_erase_subject_repeated_self_overwrite(spark, tmp_path):
    """Back-to-back erasures read and dynamic-overwrite the SAME fact
    path; the survivors must be materialized before each overwrite or a
    direct-write committer can consume its own half-written output
    (round-5 audit finding #1).  Pin the end state after two passes."""
    wh, df = _mk_warehouse(spark, tmp_path)
    root = _fact_path(wh)
    a1 = erase_subject(spark, wh, "user_id", 10)
    a2 = erase_subject(spark, wh, "user_id", 20)
    assert a1 == {"days_rewritten": 2, "rows_removed": 10}
    assert a2 == {"days_rewritten": 4, "rows_removed": 20}
    post = spark.read.parquet(root)
    assert post.where(F.col("user_id").isin(10, 20)).count() == 0
    assert post.count() == df.where(F.col("user_id") == 30).count()
    # third pass on the last remaining subject leaves rewritten
    # partitions empty but the table still readable
    a3 = erase_subject(spark, wh, "user_id", 30)
    assert a3["rows_removed"] == 20
