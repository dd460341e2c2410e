"""Cost-based optimizer statistics: ANALYZE TABLE feeds exact row counts
and column histograms into plan estimation — the cluster-scale lever for
join ordering / broadcast decisions where file-size guesses are wrong."""

from __future__ import annotations

import pytest


@pytest.fixture()
def analyzed(spark):
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
        .write.mode("overwrite").saveAsTable("cbo_orders")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
    yield spark
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.conf.set("spark.sql.cbo.enabled", "false")


def _row_count(df):
    st = df._jdf.queryExecution().optimizedPlan().stats()
    assert st.rowCount().isDefined()
    return int(str(st.rowCount().get()))


def test_analyze_gives_exact_table_rowcount(analyzed):
    spark = analyzed
    assert _row_count(spark.table("cbo_orders")) == \
        spark.table("cbo_orders").count()


def test_column_stats_drive_filter_selectivity(analyzed):
    spark = analyzed
    full = _row_count(spark.table("cbo_orders"))
    est = _row_count(
        spark.table("cbo_orders").where("o_orderpriority = '1-URGENT'")
    )
    actual = spark.table("cbo_orders") \
        .where("o_orderpriority = '1-URGENT'").count()
    assert 0 < est < full
    # distinct-count-based estimate: within 3x of the true selectivity
    assert actual / 3 <= est <= actual * 3
