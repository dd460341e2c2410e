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


def quality_report(df: DataFrame, rules: list[tuple[str, Column]],
                   unique_key: str | None = None) -> DataFrame:
    """Constraint-check report (the expectation-suite / dbt-test shape):
    one row per rule with its violation count.

    Every predicate rule folds into a SINGLE hash aggregate over one
    scan — adding rules adds expression columns, not jobs or shuffles.
    ``unique_key`` adds a uniqueness rule computed in the same aggregate
    as ``count(key) - count_distinct(key)`` (the exact distinct is the
    one extra-shuffle cost at scale; swap approx_count_distinct in when
    a 1% bound is acceptable).  The single result row is unpivoted to
    (rule, n_violations) via stack — no second pass.
    """
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in rules
    ]
    names = [name for name, _ in rules]
    if unique_key is not None:
        aggs.append(
            (F.count(unique_key) - F.countDistinct(unique_key))
            .cast("long")
            .alias(f"duplicate_{unique_key}")
        )
        names.append(f"duplicate_{unique_key}")
    one = df.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return one.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, n_violations)"
    ).orderBy("rule")
