"""Query registry: every operator from SURVEY.md §2 lands here as a named
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle string.  ``__spark_entry__.py`` re-exports these verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from busdata_pipeline_spark.session import apply_session_conf

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register ``fn`` under ``name``; ``oracle`` is ANSI SQL DuckDB runs
    over the same parquet tables (omit for non-SQL-expressible ops →
    driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Pin session conf (UTC etc.) no matter whose session runs us.
            apply_session_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
