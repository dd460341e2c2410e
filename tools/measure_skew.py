#!/usr/bin/env python
"""Measure the salted-join payoff on deliberately skewed data (the
round-2 verdict: salting existed but its benefit was asserted, not
measured).  Results land in SCALE.md.

Workload: fact (N rows, HOT_FRAC of them on ONE key) ⨝ dim (D keys),
then a sum over the joined product — forces the full join to
materialize.  Variants:

  plain_aqe_on   — stock sort-merge/broadcast plan, AQE skew-join free
                   to split the hot partition at runtime
  plain_aqe_off  — what happens when runtime re-planning is unavailable
                   (the straggler case salting insures against)
  salted_16      — operators/skew.salted_join with 16 buckets, AQE off

Each timed min-of-REPEATS after a warm pass, like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from busdata_pipeline_spark.operators.skew import salted_join  # noqa: E402
from busdata_pipeline_spark.session import get_spark  # noqa: E402

N_FACT = int(os.environ.get("SKEW_N_FACT", 20_000_000))
N_DIM = int(os.environ.get("SKEW_N_DIM", 2_000_000))
HOT_FRAC = float(os.environ.get("SKEW_HOT_FRAC", 0.5))
REPEATS = int(os.environ.get("SKEW_REPEATS", 2))


def main() -> None:
    spark = get_spark("skew-measure")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = "/tmp/skew_measure"

    fact_path, dim_path = f"{scratch}/fact", f"{scratch}/dim"
    if not os.path.isdir(fact_path):
        # HOT_FRAC of fact rows hit key 0; the rest are uniform over the
        # dim key space.  Written once so every variant reads identical
        # bytes.
        (
            spark.range(N_FACT).select(
                F.when(F.rand(1) < HOT_FRAC, F.lit(0))
                .otherwise((F.rand(2) * (N_DIM - 1)).cast("long") + 1)
                .alias("key"),
                F.rand(3).alias("value"),
            )
            .write.mode("overwrite").parquet(fact_path)
        )
        (
            spark.range(N_DIM).select(
                F.col("id").alias("key"), F.rand(4).alias("attr")
            )
            .write.mode("overwrite").parquet(dim_path)
        )

    def run(variant: str) -> float:
        fact = spark.read.parquet(fact_path)
        # force a shuffle join: the dim is mid-sized (too big to want a
        # 2M-row broadcast at real scale); pin it non-broadcastable
        dim = spark.read.parquet(dim_path)
        aqe = variant != "plain_aqe_off" and variant != "salted_16"
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t0 = time.perf_counter()
        if variant == "salted_16":
            joined = salted_join(fact, dim, "key", buckets=16)
        else:
            joined = fact.join(dim, "key")
        (
            joined.select((F.col("value") * F.col("attr")).alias("x"))
            .agg(F.sum("x"))
            .write.format("noop").mode("overwrite").save()
        )
        return time.perf_counter() - t0

    results = {}
    for variant in ("plain_aqe_on", "plain_aqe_off", "salted_16"):
        run(variant)  # warm
        results[variant] = round(min(run(variant) for _ in range(REPEATS)), 2)
    print(json.dumps({
        "n_fact": N_FACT, "n_dim": N_DIM, "hot_frac": HOT_FRAC,
        "seconds_min_of_runs": results,
    }))


if __name__ == "__main__":
    main()
