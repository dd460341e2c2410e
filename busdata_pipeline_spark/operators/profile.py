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


# ---------------------------------------------------------------------------
# Bounded-memory exact heavy hitters: Misra-Gries candidates + exact verify.


def mg_partition_summaries(toks, k: int):
    """Per-partition weighted Misra-Gries summaries over a single
    string column ``tok`` — ≤ ``k`` (token, count) rows per partition,
    independent of partition size or vocabulary.

    Weighted MG (Berinde et al. 2010): per Arrow batch we fold the
    batch's value_counts into the counter dict; on overflow the
    decrement mass is charged to k+1 distinct items at once, so any
    item's undercount is ≤ n_p/(k+1) — which yields the candidate
    guarantee ``heavy_hitters_candidates`` relies on.

    This is the algorithmic mapInPandas seam (like the multimodal
    codecs): Python executes the SUMMARY algorithm over Arrow batches;
    the per-item work is over the batch's DISTINCT tokens, not rows."""
    import pandas as pd

    def fold(batches):
        counters: dict = {}
        for pdf in batches:
            for tok, w in pdf["tok"].value_counts().items():
                w = int(w)
                if tok in counters:
                    counters[tok] += w
                elif len(counters) < k:
                    counters[tok] = w
                else:
                    m = min(counters.values())
                    if w <= m:
                        dec = w
                        ins = None
                    else:
                        dec = m
                        ins = w - m
                    dead = []
                    for t in counters:
                        counters[t] -= dec
                        if counters[t] <= 0:
                            dead.append(t)
                    for t in dead:
                        del counters[t]
                    if ins is not None:
                        counters[tok] = ins
        yield pd.DataFrame(
            {"tok": list(counters.keys()),
             "mg_count": list(counters.values())}
        )

    return toks.mapInPandas(fold, "tok string, mg_count long")


def heavy_hitters_exact(toks, k: int = 50):
    """ALL tokens with global count ≥ N/k, with EXACT counts — at
    bounded memory.  Two passes:

    1. candidates = union of per-partition Misra-Gries summary keys.
       Completeness: if a token is absent from partition i's summary its
       local count is ≤ n_i/(k+1) (the MG undercount bound); absent from
       ALL summaries would mean a global count ≤ N/(k+1) < N/k — so
       every true heavy hitter is a candidate.  Candidate cardinality is
       ≤ partitions × k regardless of vocabulary size.
    2. exact verify: semi-join the token stream against the broadcast
       candidate set BEFORE the shuffle (non-candidates never travel),
       one hash aggregate, keep count·k ≥ N (integer comparison — no
       float threshold).

    The OUTPUT is deterministic even though the candidate superset
    depends on partitioning: the exact filter decides membership.
    This is the scale pattern for "exact top terms over 100 TB": the
    full-vocabulary groupBy never happens."""
    import pyspark.sql.functions as F

    summaries = mg_partition_summaries(toks, k)
    cands = summaries.select("tok").distinct()
    tot = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(F.broadcast(cands), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(tot))
        .where(F.col("cnt") * k >= F.col("n"))
        .select("tok", "cnt")
    )
