"""Edge-case tests for the round-8 additions: int8 quantization
(mapInArrow), the IVF-blocked kNN graph, and unigram-LM tokenizer
training.  Oracle parity is covered by tests/test_oracle_parity.py;
these pin the behaviors an oracle diff can't isolate."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from busdata_pipeline_spark.operators import quantize, similarity


def test_int8_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in
            quantize.int8_quantize_signatures(df).collect()}
    z = rows[1]
    assert z["scale"] == 0.0
    assert z["q_sum"] == z["q_sumsq"] == z["q_poly"] == 0
    assert z["recon_err"] == 0.0
    v = rows[2]
    # scale = max |x| = 2.0; q = floor(x*127/2 + .5) = [64, -127, 32, 0]
    assert v["scale"] == 2.0
    assert v["q_sum"] == 64 - 127 + 32 + 0
    assert v["q_sumsq"] == 64**2 + 127**2 + 32**2
    assert v["q_poly"] == 64 * 1 - 127 * 2 + 32 * 3
    # max-magnitude element is exactly representable -> tiny error
    assert 0.0 <= v["recon_err"] < 1e-3


def test_int8_quantize_max_element_exact(spark):
    # the absmax element always quantizes to ±127 exactly
    df = spark.createDataFrame(
        [(7, [3.5, -3.5])], "vec_id long, embedding array<float>"
    )
    r = quantize.int8_quantize_signatures(df).collect()[0]
    assert r["q_sum"] == 0          # +127 + (-127)
    assert r["q_sumsq"] == 2 * 127**2


def test_int8_quantize_ragged_rejected(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>",
    ).coalesce(1)  # same Arrow batch — the guard is per-batch
    with pytest.raises(Exception, match="ragged"):
        quantize.int8_quantize_signatures(df).collect()


def test_knn_graph_singleton_cluster(spark):
    # n_clusters == n with 3 identical vectors + 1 opposite one: the
    # identical triple ties to the lowest centroid (c0) while the
    # opposite vector keeps its own cell — a guaranteed singleton,
    # which must contribute no edges; the triple gets 2 neighbors each
    # (k capped at m-1).
    rows = [
        (0, [1.0, 2.0]),
        (1, [1.0, 2.0]),
        (2, [1.0, 2.0]),
        (3, [-1.0, -2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.knn_graph(df, k=5, n_clusters=4, n_iter=1)
    got = out.collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["vec_id"], []).append(r)
    assert 3 not in by_src                      # singleton: no edges
    assert set(by_src) == {0, 1, 2}
    for src, edges in by_src.items():
        assert len(edges) == 2                  # k capped at m-1
        assert all(e["nbr_id"] != src for e in edges)
        assert sorted(e["rank"] for e in edges) == [1, 2]
        # identical vectors: cosine exactly 1, ties resolve by id
        assert all(e["cosine"] == 1.0 for e in edges)
        nbrs = [e["nbr_id"] for e in sorted(edges, key=lambda e: e["rank"])]
        assert nbrs == sorted(i for i in range(3) if i != src)


def test_knn_graph_tie_breaks_by_id(spark):
    # duplicate vectors -> equal cosines; ranks must resolve by id
    rows = [(i, [1.0, 2.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.knn_graph(df, k=3, n_clusters=1, n_iter=1).collect()
    for src in range(4):
        nbrs = [r["nbr_id"] for r in sorted(
            (r for r in out if r["vec_id"] == src),
            key=lambda r: r["rank"])]
        assert nbrs == sorted(i for i in range(4) if i != src)


def test_unigram_tokenizer_invariants(spark, sf_dir=None):
    from busdata_pipeline_spark.plans.llm_corpus import (
        _UNI_MAXPIECE,
        unigram_train_frame,
    )

    docs = spark.createDataFrame(
        [(1, "banana bandana"), (2, "banana banana band")],
        "doc_id long, text string",
    )
    out = unigram_train_frame(spark, docs).collect()
    pieces = {r["piece"]: r for r in out}
    # coverage: every char of the corpus survives
    for ch in set("bananabandana"):
        assert ch in pieces
    # no piece longer than the cap; no unused multi-char survivor
    for p, r in pieces.items():
        assert len(p) <= _UNI_MAXPIECE
        if len(p) > 1:
            assert r["used_count"] > 0
    # log-probs are negative micro-nats and finite
    assert all(r["logp_micro"] < 0 for r in out)
    # 'ana'/'an'/'ban'-family pieces should dominate banana-heavy text:
    # the most-used multi-char piece is a substring of 'banana(d)'
    top = max((r for r in out if len(r["piece"]) > 1),
              key=lambda r: r["used_count"])
    assert top["piece"] in "bandana" or top["piece"] in "banana"


# ---------------------------------------------------------------------------
# property tests (pure Python — no Spark session needed)

from hypothesis import given, settings
from hypothesis import strategies as st

from busdata_pipeline_spark.plans.llm_corpus import (
    _UNI_MAXPIECE,
    _uni_backtrace,
    _uni_viterbi,
)

_word = st.text(alphabet="ab", min_size=1, max_size=8)


def _lp_map_for(words: set[str]) -> dict[str, int]:
    # chars + every <=_UNI_MAXPIECE substring, scored by length so longer
    # pieces are preferred (log-probs must be negative ints)
    lp = {}
    for w in words:
        for i in range(len(w)):
            for piece_len in range(1, _UNI_MAXPIECE + 1):
                p = w[i:i + piece_len]
                if p:
                    lp[p] = -1000000 // len(p)
    return lp


@settings(max_examples=200, deadline=None)
@given(word=_word)
def test_viterbi_segmentation_reconstructs_word(word):
    lp = _lp_map_for({word})
    pieces = _uni_backtrace(word, _uni_viterbi(word, lp))
    # backtrace emits right-to-left
    assert "".join(reversed(pieces)) == word
    assert all(p in lp for p in pieces)


@settings(max_examples=100, deadline=None)
@given(word=st.text(alphabet="abc", min_size=1, max_size=7))
def test_viterbi_is_optimal_vs_bruteforce(word):
    """The DP score must equal the best over ALL segmentations, and the
    chosen segmentation must be the (score, shortest-piece-first)
    lexicographic winner the oracle's row_number picks."""
    import itertools

    lp = _lp_map_for({word})

    def all_segs(w):
        if not w:
            yield []
            return
        for piece_len in range(1, min(_UNI_MAXPIECE, len(w)) + 1):
            head = w[:piece_len]
            if head in lp:
                for rest in all_segs(w[piece_len:]):
                    yield [head] + rest

    best_score = max(
        sum(lp[p] for p in seg) for seg in all_segs(word)
    )
    bl = _uni_viterbi(word, lp)
    got = list(reversed(_uni_backtrace(word, bl)))
    assert sum(lp[p] for p in got) == best_score


@settings(max_examples=100, deadline=None)
@given(vec=st.lists(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=2, max_size=16))
def test_int8_quantization_model(vec):
    """Pure-numpy model of the mapInArrow kernel: quantized values stay
    in [-127, 127] and reconstruction error per element is bounded by
    half a quantization step."""
    import numpy as np

    x = np.array(vec, dtype=np.float32).astype(np.float64)
    scale = np.abs(x).max()
    if scale == 0.0:
        return
    q = np.floor(x * 127.0 / scale + 0.5)
    assert q.min() >= -127 and q.max() <= 127
    err = np.abs(x - q * scale / 127.0)
    assert (err <= scale / 127.0 / 2 + 1e-12).all()


def test_sign_projection_cross_batch_dim_mismatch_diagnosed(spark):
    """ADVICE r8: a later Arrow batch that is internally uniform but at
    a DIFFERENT width than the first used to die inside q @ signs with
    an opaque numpy shape error; it must raise the explicit ragged/dim
    diagnostic.  maxRecordsPerBatch=1 forces each row into its own
    batch within one partition."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0])],
            "vec_id long, embedding array<float>",
        ).coalesce(1)
        with pytest.raises(Exception, match="ragged embedding column"):
            quantize.sign_projection_signatures(df, out_dim=4).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
