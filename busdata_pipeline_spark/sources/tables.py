"""Parquet test-table loaders (TESTDATA.md tables).

These are plain ``spark.read.parquet`` scans — column pruning and filter
pushdown reach the parquet reader because callers build declarative plans
on top (verify with ``df.explain('formatted')``: PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Columns stored as parquet TIMESTAMP(NANOS) — read as nano-longs under
#: spark.sql.legacy.parquet.nanosAsLong and normalized here to
#: TimestampType by truncating to micros (identical to DuckDB's
#: TIMESTAMP_NS -> TIMESTAMP read, so oracles agree bit-for-bit).
_NANO_TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLS.get(name, []):
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Belt-and-braces NTZ guard: if the caller's session read naive parquet
    # timestamps as TIMESTAMP_NTZ (inferTimestampNTZ on — we pin it off, but
    # a foreign session may have read before apply_session_conf ran), fold
    # them to session-TZ TIMESTAMP.  Session TZ is pinned UTC, so the wall
    # values are unchanged and epoch arithmetic stays legal.
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp_ltz"))
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [table(spark, sf_dir, n) for n in (names or TABLE_NAMES)]
