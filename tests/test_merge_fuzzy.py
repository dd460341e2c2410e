"""Edge-case tests for the round-4 operators: MERGE (full-outer
upsert/delete) and blocked fuzzy matching."""

from __future__ import annotations

from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.dedup import fuzzy_prefix_matches
from busdata_pipeline_spark.operators.warehouse import merge_into


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, name string, bal double",
    )


def test_merge_update_delete_insert(spark):
    src = spark.createDataFrame(
        [
            (2, "b2", 99.0, "update"),
            (3, None, 0.0, "delete"),
            (9, "new", 1.0, "insert"),
        ],
        "k int, name string, bal double, op string",
    )
    out = {r["k"]: (r["name"], r["bal"])
           for r in merge_into(_target(spark), src, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 99.0), 9: ("new", 1.0)}


def test_merge_delete_of_missing_key_is_noop(spark):
    src = spark.createDataFrame(
        [(42, None, 0.0, "delete")], "k int, name string, bal double, op string"
    )
    out = merge_into(_target(spark), src, "k")
    assert out.count() == 3
    assert out.where(F.col("k") == 42).count() == 0


def test_merge_empty_source_is_identity(spark):
    src = spark.createDataFrame(
        [], "k int, name string, bal double, op string"
    )
    got = sorted(merge_into(_target(spark), src, "k").collect())
    want = sorted(_target(spark).collect())
    assert got == want


def test_fuzzy_finds_planted_near_matches(spark):
    # Pairs within edit distance 2 of each other on the 12-char prefix,
    # sharing at least one aligned 4-char block.
    docs = spark.createDataFrame(
        [
            (1, "hello world one two"),
            (2, "hello worlds one"),          # 1 insertion vs doc 1 prefix
            (3, "hello wording zzz"),         # shares block 'hell' but dist > 2
            (4, "completely different text"),
        ],
        "doc_id long, text string",
    )
    got = {(r["a"], r["b"]): r["dist"]
           for r in fuzzy_prefix_matches(docs).collect()}
    assert (1, 2) in got and got[(1, 2)] <= 2
    assert (1, 3) not in got and (2, 3) not in got
    assert all(4 not in pair for pair in got)


def test_fuzzy_exact_duplicates_have_distance_zero(spark):
    docs = spark.createDataFrame(
        [(1, "same prefix here"), (2, "same prefix here")],
        "doc_id long, text string",
    )
    rows = fuzzy_prefix_matches(docs).collect()
    assert [(r["a"], r["b"], r["dist"]) for r in rows] == [(1, 2, 0)]
