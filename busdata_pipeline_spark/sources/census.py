"""S13 — ACS census-tract CSV side-table.

The reference ships ``OR.csv`` (36 typed columns, header at
/root/reference/OR.csv:1) with no in-repo consumer; the capability the
engine must support is a typed CSV scan that filters and aggregates
without schema inference on the hot path.  The explicit schema lives in
``schemas.CENSUS_TRACT``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from busdata_pipeline_spark.schemas import CENSUS_TRACT


def read_census_csv(spark: SparkSession, path: str) -> DataFrame:
    """Typed CSV scan: explicit schema, header skipped, malformed rows
    dropped (the reference tolerates bad input lines elsewhere —
    transform.py:122-124 — so the CSV scan gets the same stance)."""
    return (
        spark.read.schema(CENSUS_TRACT)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


def county_commute_summary(census: DataFrame,
                           state: str | None = None) -> DataFrame:
    """Demo aggregate over the side-table: per-county population-weighted
    mean commute and transit share — a CSV-scan + filter + groupBy that
    partition-prunes nothing (CSV) but pushes the state filter and only
    reads the five referenced columns."""
    if state is not None:
        census = census.where(F.col("State") == state)
    weighted = census.select(
        "County",
        "TotalPop",
        (F.col("MeanCommute") * F.col("TotalPop")).alias("commute_x_pop"),
        (F.col("Transit") * F.col("TotalPop")).alias("transit_x_pop"),
    )
    return (
        weighted.groupBy("County")
        .agg(
            F.sum("TotalPop").alias("population"),
            F.round(F.sum("commute_x_pop") / F.sum("TotalPop"), 4)
            .alias("mean_commute"),
            F.round(F.sum("transit_x_pop") / F.sum("TotalPop"), 4)
            .alias("transit_share"),
        )
        .orderBy(F.desc("population"))
    )
