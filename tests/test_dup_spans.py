"""Exact duplicated-substring spans: handcrafted corpus with known
maximal spans, plus merge behavior for overlapping windows."""

from __future__ import annotations

from busdata_pipeline_spark.plans.dup_spans import duplicated_spans

ABC = "a b c d e f g h"          # the shared 8-gram (NGRAM = 8)
NINE = "p q r s t u v w x"       # 9 shared tokens -> two windows, one span


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_8gram_detected_at_each_position(spark):
    docs = _docs(
        spark,
        [
            (1, f"{ABC} k1 k2 k3"),        # span at pos 1..8
            (2, f"j1 {ABC} j2"),           # span at pos 2..9
            (3, "z1 z2 z3 z4 z5 z6 z7 z8"),  # unique, no span
        ],
    )
    got = [tuple(r) for r in duplicated_spans(docs).collect()]
    assert got == [(1, 1, 8, 8), (2, 2, 9, 8)]


def test_overlapping_windows_merge_to_one_maximal_span(spark):
    docs = _docs(
        spark,
        [
            (1, f"{NINE} m1 m2"),   # 9 shared tokens = windows at 1 and 2
            (2, f"n1 n2 {NINE}"),
        ],
    )
    got = [tuple(r) for r in duplicated_spans(docs).collect()]
    # one merged span each, length 9 — not two length-8 spans
    assert got == [(1, 1, 9, 9), (2, 3, 11, 9)]


def test_disjoint_repeats_stay_separate_spans(spark):
    filler = " ".join(f"f{i}" for i in range(8))
    docs = _docs(
        spark,
        [
            (1, f"{ABC} {filler} {NINE}"),
            (2, f"{ABC} u1 u2 u3 u4 u5 u6 u7 u8 u9"),
            (3, f"{NINE} v1 v2 v3 v4 v5 v6 v7 v8"),
        ],
    )
    got = [tuple(r) for r in duplicated_spans(docs).collect()]
    assert (1, 1, 8, 8) in got and (1, 17, 25, 9) in got
    assert len([g for g in got if g[0] == 1]) == 2


def test_short_documents_are_skipped(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])
    assert duplicated_spans(docs).count() == 0


def test_new_operators_tolerate_empty_inputs(spark):
    """Empty partitions/day-slices happen at scale; no operator may
    throw on a zero-row input."""
    from busdata_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )
    from busdata_pipeline_spark.operators.warehouse import (
        assign_surrogate_keys,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert duplicated_spans(empty_docs).count() == 0

    empty_keys = spark.createDataFrame([], "k string")
    assert assign_surrogate_keys(empty_keys, "k", n_parts=4).count() == 0

    empty_iv = spark.createDataFrame(
        [], "aid long, s_start timestamp, s_end timestamp")
    empty_iv2 = spark.createDataFrame(
        [], "bid long, w_start timestamp, w_end timestamp")
    assert interval_overlap_join(
        empty_iv, empty_iv2, "s_start", "s_end", "w_start", "w_end", 3600
    ).count() == 0
