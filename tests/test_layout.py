"""Range-clustered layout: row-group statistics must become selective,
and a selective filter must actually skip data at scan time."""
from __future__ import annotations

from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.layout import (
    row_group_spans,
    write_clustered,
)
from busdata_pipeline_spark.sources import table
from tests.conftest import SF001


def _overlap_fraction(spans):
    """Fraction of span pairs that overlap — 1.0 for random layout
    (every row group spans everything), near 0 for clustered."""
    n = len(spans)
    if n < 2:
        return 0.0
    hits = total = 0
    for i in range(n):
        for j in range(i + 1, n):
            total += 1
            (alo, ahi), (blo, bhi) = spans[i], spans[j]
            if alo <= bhi and blo <= ahi:
                hits += 1
    return hits / total


def test_clustered_row_groups_are_disjoint(spark, tmp_path):
    ev = table(spark, SF001, "events").select("event_id", "user_id", "value")
    random_path = str(tmp_path / "random")
    ev.repartition(4).write.mode("overwrite").parquet(random_path)
    clustered_path = str(tmp_path / "clustered")
    write_clustered(ev, clustered_path, "event_id", files=4)

    rand = _overlap_fraction(row_group_spans(random_path, "event_id"))
    clus = _overlap_fraction(row_group_spans(clustered_path, "event_id"))
    # random layout: every file spans ~the full id range; clustered:
    # ranges are disjoint by construction
    assert rand > 0.9, rand
    assert clus < 0.1, clus


def test_clustered_scan_skips_row_groups(spark, tmp_path):
    """The reader must actually skip: a 1% id-range filter over the
    clustered layout reads far fewer rows out of the scan node than the
    same filter over the random layout."""
    ev = table(spark, SF001, "events").select("event_id", "user_id", "value")
    total = ev.count()
    random_path = str(tmp_path / "sc_random")
    ev.repartition(4).write.mode("overwrite").parquet(random_path)
    clustered_path = str(tmp_path / "sc_clustered")
    write_clustered(ev, clustered_path, "event_id", files=4)

    def scan_rows(path):
        df = spark.read.parquet(path).where(
            (F.col("event_id") >= 100) & (F.col("event_id") < 100 + total // 100)
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
        # first leaf = the file scan; its numOutputRows metric counts rows
        # surviving row-group pruning + predicate pushdown
        scan = plan
        while scan.children().size() > 0:
            scan = scan.children().apply(0)
        return scan.metrics().apply("numOutputRows").value()

    r, c = scan_rows(random_path), scan_rows(clustered_path)
    # both return the same ANSWER, but the clustered scan materializes
    # a fraction of the rows (only the matching range's row groups)
    assert c < r, (c, r)
    assert c <= total * 0.30, (c, total)


def test_zorder_scan_beats_1d_on_2d_box(spark, tmp_path):
    """A box predicate selective in BOTH dimensions: the Z-order layout
    must skip more than 1-D range clustering on event_id alone (whose
    row groups span all user_ids), and both must beat random."""
    from busdata_pipeline_spark.operators.layout import write_zorder_clustered

    ev = table(spark, SF001, "events").select("event_id", "user_id", "value")
    total = ev.count()
    paths = {
        "random": str(tmp_path / "z_random"),
        "oned": str(tmp_path / "z_oned"),
        "zorder": str(tmp_path / "z_zorder"),
    }
    ev.repartition(4).write.mode("overwrite").parquet(paths["random"])
    write_clustered(ev, paths["oned"], "event_id", files=4,
                    block_bytes=2048)
    write_zorder_clustered(ev, paths["zorder"], "event_id", "user_id",
                           files=4, block_bytes=2048)

    def scan_rows(path):
        df = spark.read.parquet(path).where(
            (F.col("event_id") >= 2000) & (F.col("event_id") < 6000)
            & (F.col("user_id") >= 30) & (F.col("user_id") < 60)
        )
        n_match = df.count()
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
        scan = plan
        while scan.children().size() > 0:
            scan = scan.children().apply(0)
        return n_match, scan.metrics().apply("numOutputRows").value()

    (m_r, r), (m_o, o), (m_z, z) = (
        scan_rows(paths["random"]),
        scan_rows(paths["oned"]),
        scan_rows(paths["zorder"]),
    )
    assert m_r == m_o == m_z  # same answer under every layout
    # 1-D clustering prunes the event_id range; Z-order additionally
    # prunes the user_id range inside it.
    assert o < r, (o, r)
    # the box keeps 40% of event_ids and 20% of user_ids (~8% of rows);
    # 1-D clustering can only prune the event range, Z-order prunes both
    # (measured: z≈2357 vs o≈4024 of 10000 at this granularity)
    assert z < o * 0.7, (z, o)
    assert z <= total * 0.28, (z, total)


def test_mask_ladder_morton_matches_python_model(spark):
    """The 8-bit mask-ladder interleave (zorder_code — the form the
    etl_zorder_skipping oracle replays) must equal bit-level Python."""
    from busdata_pipeline_spark.operators.layout import zorder_code

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(x, y) for x in (0, 1, 5, 127, 128, 200, 255)
           for y in (0, 3, 64, 255)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y",
                              zorder_code(F.col("x"), F.col("y")).alias("z")
                              ).collect()}
    assert got == {(x, y): morton(x, y) for x, y in pts}


def test_row_groups_without_stats_count_as_unskippable(tmp_path):
    """Column statistics are writer-optional; a row group lacking them
    must be counted as scanned (unskippable), not KeyError (round-5
    audit finding #4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from busdata_pipeline_spark.operators.layout import (
        row_groups_intersecting_box,
    )

    t = pa.table({"x": [1, 2, 3], "y": [10, 20, 30]})
    d = tmp_path / "nostats"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"), write_statistics=False)
    # a second file WITH stats, fully outside the probe box -> skippable
    pq.write_table(pa.table({"x": [100, 101], "y": [100, 101]}),
                   str(d / "part-1.parquet"))

    hit, total = row_groups_intersecting_box(
        str(d), "x", 0, 5, "y", 0, 50)
    assert total == 2
    assert hit == 1  # the stats-less group scanned, the out-of-box one skipped


def test_bucketed_join_query_plan_and_result(spark):
    """etl_bucketed_join asserts its own exchange-free plan internally;
    here we pin the semantic contract: the bucketed-layout result equals
    the plain unbucketed join+agg."""
    from busdata_pipeline_spark.plans.pruning import etl_bucketed_join

    got = {
        r["o_orderpriority"]: (r["n_items"], r["n_orders"], r["revenue"])
        for r in etl_bucketed_join(spark, SF001).collect()
    }
    from busdata_pipeline_spark.plans.relational import sum_money4

    o = table(spark, SF001, "orders")
    li = table(spark, SF001, "lineitem")
    want = {
        r["o_orderpriority"]: (r["n_items"], r["n_orders"], r["revenue"])
        for r in (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.countDistinct("o_orderkey").alias("n_orders"),
                # same exact-unit sum the query uses (round-10 money
                # discipline) — the contract is bucketed == unbucketed
                sum_money4(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("revenue"),
            )
            .collect()
        )
    }
    assert got == want and len(got) >= 2
