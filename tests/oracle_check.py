"""Local replica of the driver's DuckDB-differential check.

For a query name: run the Spark plan and the oracle SQL over the same
parquet tables, sort columns by name, sort rows, and require exact value
equality (floats included — queries round in-engine where summation order
could differ, so surviving bits must match).
"""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb

from busdata_pipeline_spark.sources.tables import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (scale-ladder replicas): a directory of
            # part files rather than the driver's single-file layout.
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_rows = [tuple(r) for r in rel.fetchall()]
    d_cols = list(rel.columns)
    if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, d_cols)):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    a, b = _canon(s_rows, [c.lower() for c in s_cols]), _canon(d_rows, [c.lower() for c in d_cols])
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
