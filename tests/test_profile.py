"""quality_report: planted violations are counted per rule, and all
predicate rules fold into one scan / one aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.profile import quality_report


def _frame(spark):
    rows = [
        (1, "a", 10.0),
        (1, "a", 20.0),      # duplicate id
        (2, None, 30.0),     # null name
        (3, "b", None),      # null value
        (4, "", 5.0),        # empty name
        (5, "c", 9999.0),    # out of range
    ]
    return spark.createDataFrame(rows, "id long, name string, value double")


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return [
        ("null_name", F.col("name").isNull()),
        ("empty_name", F.col("name") == ""),
        ("null_value", F.col("value").isNull()),
        ("value_out_of_range",
         F.col("value").isNotNull() & (F.col("value") > 100)),
    ]


def test_quality_report_counts_planted_violations(spark):
    got = {r.rule: r.n_violations for r in
           quality_report(_frame(spark), _rules(),
                          unique_key="id").collect()}
    assert got == {
        "null_name": 1,
        "empty_name": 1,
        "null_value": 1,
        "value_out_of_range": 1,
        "duplicate_id": 1,
    }


def test_quality_report_is_one_scan_one_aggregate(spark, tmp_path):
    path = str(tmp_path / "t")
    _frame(spark).write.parquet(path)
    df = quality_report(spark.read.parquet(path), _rules(),
                        unique_key="id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    # one partial+final pair for the predicate rules and one expand-based
    # pair for the exact count-distinct — never a scan per rule
    assert plan.count("Scan") == 1
