"""Query registry: every operator from SURVEY.md §2 lands here as a named
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle string.  ``__spark_entry__.py`` re-exports these verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from busdata_pipeline_spark.session import apply_session_conf

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def normalize_output(df: DataFrame) -> DataFrame:
    """Canonicalize hash-hostile value encodings in a query result.

    IEEE signed zero is the one value where two engines can agree under
    ``==`` yet hash differently (``-0.0`` vs ``0.0`` after ROUND of a tiny
    negative — the round-1 etl_w2/etl_w3 driver failure).  ``x + 0.0``
    maps -0.0 → 0.0, preserves NULL and NaN, and stays inside codegen.
    Applied to every registered query so new queries can't reintroduce
    the bug; oracles must normalize the same way (tools/driver_hash.py
    enforces the pair).
    """
    out = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, T.DoubleType):
            out.append((F.col(f.name) + F.lit(0.0)).alias(f.name))
            changed = True
        elif isinstance(f.dataType, T.FloatType):
            out.append(
                (F.col(f.name) + F.lit(0.0)).cast("float").alias(f.name)
            )
            changed = True
        else:
            out.append(F.col(f.name))
    return df.select(*out) if changed else df


def query(name: str, oracle: str | None = None):
    """Register ``fn`` under ``name``; ``oracle`` is ANSI SQL DuckDB runs
    over the same parquet tables (omit for non-SQL-expressible ops →
    driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Pin session conf (UTC etc.) no matter whose session runs us.
            apply_session_conf(spark)
            return normalize_output(fn(spark, sf_dir))

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
