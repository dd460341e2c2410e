"""Benchmark-contamination detection for training corpora.

A training-data pipeline must answer: which training documents share
verbatim n-grams with the evaluation/benchmark set?  The scalable
formulation is an equi-join on shingles, NOT any pairwise comparison:

1. shingle both sides (reuses ``dedup.with_shingles`` — distinct word
   n-grams per doc, pure array algebra);
2. drop high-document-frequency shingles (stop-shingles): common
   n-grams carry no contamination signal but create join skew — the
   classic hot-key blowup.  df-filtering bounds the join's per-key
   fan-out by construction, so the shuffle stays flat at 100 TB;
3. hash-join train shingles against benchmark shingles and count
   distinct benchmark docs hit per training doc.

The df threshold is the recall/precision knob real decontamination
pipelines expose (rare n-grams are the evidence; "the of and" is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.dedup import with_shingles


def exploded_rare_shingles(docs: DataFrame, n: int = 3, max_df: int = 10,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) pairs keeping only shingles whose document
    frequency is <= ``max_df``.  Two hash aggregates, no joins wider
    than the df-filtered shingle key."""
    ex = with_shingles(docs, n, text_col).select(
        id_col, F.explode("shingles").alias("shingle")
    )
    rare = (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("shingle")
    )
    return ex.join(rare, "shingle")


def contamination_hits(docs: DataFrame, bench_filter, n: int = 3,
                       max_df: int = 10, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per training doc: how many distinct benchmark docs share at least
    one rare n-gram with it.  ``bench_filter`` is a Column predicate
    selecting the benchmark membership (e.g. ``doc_id % 17 == 0``)."""
    rex = exploded_rare_shingles(docs, n, max_df, id_col, text_col)
    bench = rex.where(bench_filter).select(
        "shingle", F.col(id_col).alias("_bench_doc")
    ).distinct()
    train = rex.where(~bench_filter)
    return (
        train.join(bench, "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("_bench_doc").alias("n_bench_docs"))
    )
