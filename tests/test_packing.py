"""Sequence-packing operator tests: the two-level distributed prefix sum
must be bit-identical to the naive single-window cumsum."""
from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.packing import pack_bins, pack_sequences


def _docs(spark, n=200, seed=7):
    rng = random.Random(seed)
    rows = [(i, rng.randint(1, 400)) for i in range(n)]
    # sparse, unordered ids too
    rows += [(10_000 + i * 17, rng.randint(1, 400)) for i in range(20)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"])


def test_blocked_prefix_sum_equals_global_window(spark):
    docs = _docs(spark)
    # force many blocks so the block-offset path is actually exercised
    got = {
        (r.doc_id, r.cum_tokens, r.bin_id)
        for r in pack_sequences(docs, budget=512, block_size=16).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r.doc_id, r.cum, (r.cum // 512))
        for r in docs.select(
            "doc_id",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum"),
        ).collect()
    }
    assert got == want


def test_bins_cover_all_tokens_once(spark):
    docs = _docs(spark)
    bins = pack_bins(docs, budget=1000, id_col="doc_id").collect()
    assert sum(b.total_tokens for b in bins) == \
        docs.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(b.n_docs for b in bins) == docs.count()


def test_bin_ids_contiguous_and_monotone(spark):
    docs = _docs(spark)
    seq = pack_sequences(docs, budget=700, block_size=32) \
        .orderBy("doc_id").collect()
    bins = [r.bin_id for r in seq]
    assert bins == sorted(bins)  # first-token assignment is monotone in id
    assert bins[0] == 0


def test_single_doc_larger_than_budget_spills(spark):
    docs = spark.createDataFrame(
        [(1, 50), (2, 5000), (3, 10)], ["doc_id", "n_tokens"]
    )
    rows = {r.doc_id: r.bin_id
            for r in pack_sequences(docs, budget=100).collect()}
    # doc 2 starts in bin 0 (first token at offset 50); doc 3 starts
    # after 5050 tokens -> bin 50.
    assert rows == {1: 0, 2: 0, 3: 50}
