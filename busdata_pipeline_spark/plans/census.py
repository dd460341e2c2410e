"""S13 — the ACS census-tract CSV side-table as a driver-checked query.

The reference ships ``OR.csv`` (/root/reference/OR.csv:1, 36 typed
columns) with no in-repo consumer; the capability is a typed CSV scan
that filters and aggregates without schema inference on the hot path.
``fixtures/census_or.csv`` is a committed deterministic fixture with the
exact OR.csv column order, so the DuckDB oracle can scan the same file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources.census import (
    county_commute_summary,
    read_census_csv,
)

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CENSUS_FIXTURE = os.path.join(_REPO, "fixtures", "census_or.csv")


@query(
    "bus_census_commute",
    oracle=f"""
SELECT County AS County,
  CAST(SUM(TotalPop) AS BIGINT) AS population,
  ROUND(SUM(MeanCommute * TotalPop) / SUM(TotalPop), 4) + 0.0 AS mean_commute,
  ROUND(SUM(Transit * TotalPop) / SUM(TotalPop), 4) + 0.0 AS transit_share
FROM read_csv('{CENSUS_FIXTURE}', header=true)
WHERE State = 'Oregon'
GROUP BY County
""",
)
def bus_census_commute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 — typed census CSV scan (sources/census.py:18, explicit
    schema, DROPMALFORMED) feeding the population-weighted per-county
    commute/transit aggregate.  The sf_dir parameter is unused: the
    side-table is a fixed fixture, as OR.csv is in the reference."""
    return county_commute_summary(
        read_census_csv(spark, CENSUS_FIXTURE), state="Oregon"
    )
