"""Sequence packing for training-data assembly: concatenate documents in
a stable global order and chunk the token stream into fixed-budget bins
(the "concat and chunk" packing used to build LLM training sequences).

No analog in the reference; part of the training-data tier mandated by
BASELINE.json.

Design for 100 TB — the naive formulation is a single global window
(``Window.orderBy(id)`` = every row through ONE partition), which dies at
scale.  Instead, the classic two-level distributed prefix sum:

1. docs are ranged into blocks by id (``id div block_size``) — block
   order equals global id order;
2. per-block token totals (one tiny row per block) get exclusive
   cumulative offsets via a window over the *block table only* — n_blocks
   rows through one partition, not n_docs;
3. block offsets broadcast-join back, and the within-block running total
   is a window partitioned by block — fully parallel.

The result is bit-identical to the single-window formulation (the oracle
states it that way) while every wide stage stays partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(docs: DataFrame, budget: int,
                   id_col: str = "doc_id", tokens_col: str = "n_tokens",
                   block_size: int = 65536) -> DataFrame:
    """Assign each doc to the bin containing its first token.

    Returns (``id_col``, bin_id, cum_tokens) where cum_tokens is the
    exclusive running total in id order and bin_id = cum_tokens div
    budget.  Docs longer than the remaining budget spill into the next
    bin (concat-and-chunk semantics: bins are split at exact token
    offsets downstream; assignment here is by first token).
    """
    blocked = docs.withColumn("_blk", (F.col(id_col) / block_size).cast("long"))
    block_totals = blocked.groupBy("_blk").agg(
        F.sum(tokens_col).alias("_blk_tokens")
    )
    w_blocks = (
        Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = block_totals.select(
        "_blk",
        F.coalesce(F.sum("_blk_tokens").over(w_blocks), F.lit(0))
        .alias("_blk_offset"),
    )
    w_in = (
        Window.partitionBy("_blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        blocked.join(F.broadcast(offsets), "_blk")
        .select(
            id_col,
            F.col(tokens_col),
            (
                F.col("_blk_offset")
                + F.coalesce(F.sum(tokens_col).over(w_in), F.lit(0))
            ).alias("cum_tokens"),
        )
        .withColumn("bin_id", (F.col("cum_tokens") / budget).cast("long"))
    )


def pack_bins(docs: DataFrame, budget: int, id_col: str = "doc_id",
              tokens_col: str = "n_tokens") -> DataFrame:
    """Per-bin packing summary: (bin_id, n_docs, total_tokens)."""
    return (
        pack_sequences(docs, budget, id_col=id_col, tokens_col=tokens_col)
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens_col).alias("total_tokens"),
        )
    )
