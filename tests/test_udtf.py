"""Python UDTF operator: plan shape + ground-truth values."""

from __future__ import annotations

from busdata_pipeline_spark.plans.udtf_ops import fn_udtf_doc_top_terms

SF = "/root/testdata/sf0.001"


def test_udtf_is_arrow_and_shuffle_free_before_sort(spark):
    df = fn_udtf_doc_top_terms(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPython" not in plan
    # allowed exchanges: the final global sort's, plus the
    # under-partitioned-source fanout (round-12; fires only when the
    # input has fewer partitions than the session's parallelism, a
    # no-op at real scale) — nothing between the UDTF and the sort
    assert plan.count("Exchange") <= 2
    # the UDTF itself must not force a shuffle: it runs directly over
    # its (possibly fanned-out) input, before any aggregation
    assert "HashAggregate" not in plan


def test_udtf_matches_relational_form(spark):
    got = fn_udtf_doc_top_terms(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    want = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .count()
        .withColumn(
            "term_rank",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("count"), F.asc("term")
                )
            ),
        )
        .where(F.col("term_rank") <= 3)
        .select(
            "doc_id",
            "term_rank",
            "term",
            F.col("count").cast("int").alias("term_count"),
        )
        .orderBy("doc_id", "term_rank")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0
