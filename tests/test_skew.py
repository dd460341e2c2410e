"""Salted aggregation / join equivalence: any salt assignment must give
exactly the unsalted result (the salt only changes the shuffle layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    """100k rows, 90% on one hot key."""
    base = spark.range(100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    return base


def test_salted_agg_equals_plain(spark, skewed):
    plain = {
        (r.k): (r.total, r.n, r.lo, r.hi)
        for r in skewed.groupBy("k").agg(
            F.sum("v").alias("total"), F.count("v").alias("n"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        ).collect()
    }
    salted = {
        (r.k): (r.total, r.n, r.lo, r.hi)
        for r in salted_agg(
            skewed, ["k"],
            {"total": ("sum", "v"), "n": ("count", "v"),
             "lo": ("min", "v"), "hi": ("max", "v")},
            buckets=16,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_decomposable(spark, skewed):
    with pytest.raises(ValueError, match="not decomposable"):
        salted_agg(skewed, ["k"], {"a": ("avg", "v")})


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), "id").alias("nm")
    )
    plain = sorted(
        (r.k, r.v, r.nm) for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.nm) for r in salted_join(skewed, dim, "k", buckets=8).collect()
    )
    assert salted == plain
    # outer flavor: keys absent from dim survive with nulls
    left = salted_join(skewed.limit(10), dim.where("k < 0"), "k", how="left")
    assert left.where(F.col("nm").isNull()).count() == 10
