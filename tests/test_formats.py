"""ORC format parity: lossless round-trip + predicate pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from busdata_pipeline_spark.plans.formats import (
    orc_day_profile,
    write_events_orc,
)
from busdata_pipeline_spark.sources import table

SF = "/root/testdata/sf0.001"


def test_orc_roundtrip_is_lossless(spark, tmp_path):
    path = str(tmp_path / "orc")
    write_events_orc(spark, SF, path)
    back = spark.read.orc(path).drop("event_date")
    orig = table(spark, SF, "events")
    assert back.schema == orig.schema
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, orig.collect()))


def test_orc_scan_pushes_date_filter(spark, tmp_path):
    path = str(tmp_path / "orc")
    write_events_orc(spark, SF, path)
    df = orc_day_profile(spark, path, "2024-01-01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "event_date" in plan.split("PushedFilters:")[1][:200]
    day1 = (
        table(spark, SF, "events")
        .where(F.to_date("ts") == F.lit("2024-01-01").cast("date"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("event_type")
    )
    assert [tuple(r) for r in df.collect()] == \
        [tuple(r) for r in day1.collect()]


def test_schema_evolution_read_null_backfill(spark, sf_dir):
    from busdata_pipeline_spark.plans.registry import QUERIES

    rows = QUERIES["etl_schema_evolution_read"](spark, sf_dir).collect()
    assert [str(r["d"]) for r in rows] == ["2024-01-01", "2024-01-02"]
    d1, d2 = rows
    # v1 files: the evolved column is NULL for every row
    assert d1["n_flag_null"] == d1["n"] > 0
    assert d1["n_flag_set"] == 0
    # v2 files: the column is populated on every row
    assert d2["n_flag_null"] == 0
    assert 0 < d2["n_flag_set"] <= d2["n"]
