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


@query(
    "bus_census_unpivot_modes",
    oracle=f"""
WITH m AS (
  SELECT County, 'Drive' AS mode, SUM(Drive * TotalPop) AS weighted, SUM(TotalPop) AS pop
  FROM read_csv('{CENSUS_FIXTURE}', header=true) WHERE State = 'Oregon' GROUP BY County
  UNION ALL
  SELECT County, 'Carpool', SUM(Carpool * TotalPop), SUM(TotalPop)
  FROM read_csv('{CENSUS_FIXTURE}', header=true) WHERE State = 'Oregon' GROUP BY County
  UNION ALL
  SELECT County, 'Transit', SUM(Transit * TotalPop), SUM(TotalPop)
  FROM read_csv('{CENSUS_FIXTURE}', header=true) WHERE State = 'Oregon' GROUP BY County
  UNION ALL
  SELECT County, 'Walk', SUM(Walk * TotalPop), SUM(TotalPop)
  FROM read_csv('{CENSUS_FIXTURE}', header=true) WHERE State = 'Oregon' GROUP BY County
  UNION ALL
  SELECT County, 'WorkAtHome', SUM(WorkAtHome * TotalPop), SUM(TotalPop)
  FROM read_csv('{CENSUS_FIXTURE}', header=true) WHERE State = 'Oregon' GROUP BY County)
SELECT County, mode, ROUND(weighted / pop, 4) + 0.0 AS share
FROM m
""",
)
def bus_census_unpivot_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT of the five commute-mode share columns into
    (County, mode, share) rows — melt is the missing half of the pivot
    pair (rel_pivot_segment_by_type is the other).  Spark's unpivot is a
    zero-shuffle projection (rows expand map-side); the weighted county
    aggregate happens once per mode after the melt."""
    from pyspark.sql import functions as F

    df = read_census_csv(spark, CENSUS_FIXTURE).where(F.col("State") == "Oregon")
    modes = ["Drive", "Carpool", "Transit", "Walk", "WorkAtHome"]
    long = df.select(
        "County",
        "TotalPop",
        *[F.col(m) for m in modes],
    ).unpivot(
        ["County", "TotalPop"], modes, "mode", "share_pct"
    )
    return (
        long.groupBy("County", "mode")
        .agg(
            (
                F.round(
                    F.sum(F.col("share_pct") * F.col("TotalPop"))
                    / F.sum("TotalPop"),
                    4,
                )
            ).alias("share")
        )
    )
