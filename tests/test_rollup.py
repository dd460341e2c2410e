"""Incremental rollup maintenance: day-by-day merges must equal the
batch recompute, and a delta must rewrite only its touched buckets."""
from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.rollup import (
    merge_rollup,
    read_rollup,
    user_day_delta,
)
from busdata_pipeline_spark.sources import table
from tests.conftest import SF0001


def _canon(df):
    return sorted(
        (r.user_id, r.n_events, round(r.total_value, 9), round(r.max_value, 9))
        for r in df.collect()
    )


def test_incremental_equals_batch(spark, tmp_path):
    ev = table(spark, SF0001, "events")
    days = [r.d for r in
            ev.select(F.to_date("ts").alias("d")).distinct()
            .orderBy("d").limit(4).collect()]
    path = str(tmp_path / "rollup")
    for d in days:
        day = ev.where(F.to_date("ts") == F.lit(d))
        merge_rollup(spark, user_day_delta(day), path)

    batch = user_day_delta(ev.where(F.to_date("ts").isin(days)))
    assert _canon(read_rollup(spark, path)) == _canon(batch)


def test_merge_touches_only_delta_buckets(spark, tmp_path):
    ev = table(spark, SF0001, "events")
    path = str(tmp_path / "rollup2")
    merge_rollup(spark, user_day_delta(ev), path, buckets=8)

    before = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path) if d.startswith("_kb=")
    }
    # a one-user delta: exactly one bucket directory's files change
    one_user = ev.limit(1).select("user_id").collect()[0].user_id
    delta = user_day_delta(ev.where(F.col("user_id") == one_user))
    merge_rollup(spark, delta, path, buckets=8)

    after = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path) if d.startswith("_kb=")
    }
    changed = [d for d in before if before[d] != after[d]]
    assert len(changed) == 1, changed

    # and the totals for that user doubled exactly (merge added partials)
    row = [r for r in read_rollup(spark, path).collect()
           if r.user_id == one_user][0]
    base = [r for r in user_day_delta(ev).collect()
            if r.user_id == one_user][0]
    assert row.n_events == 2 * base.n_events


def test_join_view_maintenance_equals_full_recompute(spark):
    """Row-for-row: the delta-maintained join view is the full join."""
    from busdata_pipeline_spark.operators.rollup import merge_join_view
    from busdata_pipeline_spark.sources import table
    import pyspark.sql.functions as F

    SF = "/root/testdata/sf0.001"
    orders = table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    li = (table(spark, SF, "lineitem")
          .select("l_orderkey", "l_extendedprice")
          .withColumnRenamed("l_orderkey", "o_orderkey"))
    a1 = orders.where(F.col("o_orderkey") % 2 == 0)
    a2 = orders.where(F.col("o_orderkey") % 2 == 1)
    b1 = li.where(F.col("l_extendedprice") < 30000)
    b2 = li.where(F.col("l_extendedprice") >= 30000)
    v1 = merge_join_view(a1.join(b1, "o_orderkey").limit(0),
                         a1.limit(0), b1.limit(0), a1, b1, "o_orderkey")
    v2 = merge_join_view(v1, a1, b1, a2, b2, "o_orderkey")
    got = sorted(map(tuple, v2.collect()))
    want = sorted(map(tuple, orders.join(li, "o_orderkey").collect()))
    assert got == want and len(got) > 0


def test_retract_rollup_removes_zero_keys_and_is_exact(spark, tmp_path):
    from busdata_pipeline_spark.operators.rollup import (
        merge_rollup_retract,
        retract_partials,
    )

    rows = [(1, 1.10), (1, 2.20), (2, 5.00), (2, None), (3, 7.77)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    path = str(tmp_path / "rr")
    merge_rollup_retract(spark, retract_partials(df, +1), path)

    # retract user 3 entirely + one of user 1's rows
    retract = spark.createDataFrame(
        [(3, 7.77), (1, 2.20)], "user_id long, value double"
    )
    merge_rollup_retract(spark, retract_partials(retract, -1), path)

    got = {
        r["user_id"]: (r["dn"], r["dc"])
        for r in spark.read.parquet(path).collect()
    }
    # user 3 reached count 0 -> removed from state
    assert set(got) == {1, 2}
    assert got[1] == (1, 110)          # exact cents: 1.10 remains
    assert got[2] == (2, 500)          # null value counted, sum unaffected


def test_retract_rollup_float_exactness_vs_naive_subtract(spark, tmp_path):
    # the reason sums are maintained in cents: 0.1+0.2-0.2 != 0.1 in
    # floats, but 10+20-20 == 10 in cents
    from busdata_pipeline_spark.operators.rollup import (
        merge_rollup_retract,
        retract_partials,
    )

    df = spark.createDataFrame(
        [(1, 0.10), (1, 0.20)], "user_id long, value double"
    )
    path = str(tmp_path / "rrf")
    merge_rollup_retract(spark, retract_partials(df, +1), path)
    merge_rollup_retract(
        spark,
        retract_partials(
            spark.createDataFrame([(1, 0.20)], "user_id long, value double"),
            -1,
        ),
        path,
    )
    [(dn, dc)] = [
        (r["dn"], r["dc"]) for r in spark.read.parquet(path).collect()
    ]
    assert (dn, dc) == (1, 10)  # bit-exact, no float residue


def test_retract_rollup_full_retraction_stays_readable(spark, tmp_path):
    """Retract EVERY key to zero: the state dir must remain readable
    (zero-row, right schema) and must accept a subsequent merge
    (round-5 audit finding #5 — an all-empty append used to leave a
    directory parquet schema inference rejects)."""
    from busdata_pipeline_spark.operators.rollup import (
        merge_rollup_retract,
        retract_partials,
    )

    rows = [(1, 1.00), (2, 2.00)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    path = str(tmp_path / "rr_empty")
    merge_rollup_retract(spark, retract_partials(df, +1), path)
    # full retraction: both keys to zero
    merge_rollup_retract(spark, retract_partials(df, -1), path)

    empty = spark.read.parquet(path)
    assert empty.count() == 0
    assert {"user_id", "dn", "dc"} <= set(empty.columns)

    # state must still be mergeable: re-insert and read back
    merge_rollup_retract(spark, retract_partials(df, +1), path)
    got = {r["user_id"]: (r["dn"], r["dc"])
           for r in spark.read.parquet(path).collect()}
    assert got == {1: (1, 100), 2: (1, 200)}
