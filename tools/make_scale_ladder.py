#!/usr/bin/env python
"""Build a 10x replica of sf0.1 (synthetic sf~1) for scale-ladder runs.

Key columns are offset per replica so join/group cardinalities grow with
the data (not just row counts).  Dim tables (customer/part/supplier/
nation/region) stay fixed, so fact:dim ratios grow 10x — the direction a
real warehouse skews.

Usage:
    python tools/make_scale_ladder.py [out_dir=/tmp/sf1_synth]
    SPARK_GRAFT_SF_DIR=/tmp/sf1_synth python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from busdata_pipeline_spark.session import get_spark  # noqa: E402
from busdata_pipeline_spark.sources import table  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000
REPLICAS = 10

#: table -> key column to offset (None = copy verbatim).
SPECS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "customer": None,
    "part": None,
    "supplier": None,
    "nation": None,
    "region": None,
}


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    src = sys.argv[2] if len(sys.argv) > 2 else SRC  # chain rungs: sf1 -> sf10
    offset = OFFSET * (REPLICAS if src != SRC else 1)
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("scale-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    for t, key in SPECS.items():
        p = os.path.join(dst, f"{t}.parquet")
        # the table loader normalizes nano-long timestamp columns to
        # TimestampType, so the replica parquet keeps proper timestamp
        # annotations (DuckDB reads them directly)
        df = table(spark, src, t)
        if key is None:
            df.write.mode("overwrite").parquet(p)
            continue
        out = df
        for i in range(1, REPLICAS):
            out = out.unionByName(df.withColumn(key, F.col(key) + F.lit(i * offset)))
        out.write.mode("overwrite").parquet(p)
        print("wrote", p)


if __name__ == "__main__":
    main()
