"""One-pass table profiling — the data-quality gate a training-data
pipeline runs before anything else touches a new drop.

All metrics fold into a single hash aggregate over one scan (nulls,
bounds, cardinalities); at 100 TB the exact distincts become the only
second-shuffle cost, so ``approximate=True`` swaps them for HLL++
(1% error, one pass, no extra shuffle) — same output schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _distinct(col: str, approximate: bool) -> Column:
    return (
        F.approx_count_distinct(col, 0.01) if approximate
        else F.countDistinct(col)
    )


def profile_documents(docs: DataFrame, approximate: bool = False) -> DataFrame:
    """Corpus profile: volume, null-rates, cardinalities, length bounds —
    the acceptance snapshot for a documents drop."""
    n = F.count(F.lit(1))
    return docs.agg(
        n.alias("n_docs"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("null_text"),
        _distinct("lang", approximate).alias("n_langs"),
        _distinct("source", approximate).alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(
            F.sum(F.when(F.length("text") != F.col("n_chars"), 1).otherwise(0))
            / n, 6
        ).alias("len_mismatch_rate"),
    )
