"""Semantic pins for td_span_corruption / td_ngram_novelty /
rel_theil_sen — the invariants an oracle diff can't isolate: the T5
round-trip (splicing targets back into the corrupted input reproduces
the original token stream), the deterministic mask rate, train-half
novelty being exactly zero, and the Theil-Sen median against a numpy
all-pairs reference."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyspark.sql.functions as F

import busdata_pipeline_spark.plans.curation_ext  # noqa: F401  (registers)
import busdata_pipeline_spark.plans.stats_tests  # noqa: F401
from busdata_pipeline_spark.plans.registry import QUERIES


def _mask_block(doc_id: int, block: int) -> bool:
    h = hashlib.md5(f"{doc_id}:{block}".encode()).hexdigest()
    return int(h[:15], 16) % 20 < 3


def _t5_pair(doc_id: int, text: str) -> tuple[str, str, int, int, int]:
    """Pure-Python replay of the query's corruption: returns
    (input, target, n_tokens, n_masked, n_spans)."""
    ws = [w for w in text.strip().split(" ") if w]
    inp, tgt = [], []
    k = -1
    spans = set()
    n_masked = 0
    for p, w in enumerate(ws):
        b = p // 3
        if _mask_block(doc_id, b):
            n_masked += 1
            spans.add(b)
            if p % 3 == 0:
                k += 1
                inp.append(f"<extra_id_{k}>")
                tgt.append(f"<extra_id_{k}> {w}")
            else:
                tgt.append(w)
        else:
            inp.append(w)
    return " ".join(inp), " ".join(tgt), len(ws), n_masked, len(spans)


def test_span_corruption_matches_replay_and_roundtrips(spark, sf_dir):
    rows = {
        r["doc_id"]: r
        for r in QUERIES["td_span_corruption"](spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert set(rows) == set(docs)
    total_tokens = total_masked = 0
    for d, text in docs.items():
        inp, tgt, n_tok, n_masked, n_spans = _t5_pair(d, text)
        r = rows[d]
        assert r["n_tokens"] == n_tok
        assert r["n_masked"] == n_masked
        assert r["n_spans"] == n_spans
        assert r["inp_sig"] == hashlib.md5(inp.encode()).hexdigest()[:16]
        assert r["tgt_sig"] == hashlib.md5(tgt.encode()).hexdigest()[:16]
        total_tokens += n_tok
        total_masked += n_masked

        # the T5 round-trip: splice each sentinel's span from the
        # target back into the input → the original token stream
        spans = dict(
            (m.group(1), m.group(2).strip())
            for m in re.finditer(
                r"(<extra_id_\d+>) ((?:(?!<extra_id_)\S+\s*)*)", tgt
            )
        )
        rebuilt = inp
        for sid, span in spans.items():
            rebuilt = rebuilt.replace(sid, span, 1)
        assert rebuilt.split() == [w for w in text.strip().split(" ") if w]

    # deterministic 15% block-mask rate, corpus-level
    rate = total_masked / total_tokens
    assert 0.10 < rate < 0.20


def test_ngram_novelty_train_half_is_zero(spark, sf_dir):
    rows = QUERIES["td_ngram_novelty"](spark, sf_dir).collect()
    evens = [r for r in rows if r["doc_id"] % 2 == 0]
    odds = [r for r in rows if r["doc_id"] % 2 == 1]
    # train docs' trigrams ARE the train set — novelty exactly 0
    assert evens and all(r["n_novel"] == 0 for r in evens)
    # held-out docs carry real novelty signal on this corpus
    assert sum(r["n_novel"] for r in odds) > 0
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_novel"] <= r["n_trigrams"]


def test_theil_sen_matches_numpy_all_pairs(spark, sf_dir):
    row = QUERIES["rel_theil_sen"](spark, sf_dir).collect()[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    day = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.expr(
                "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))"
                " div 100000"
            ).alias("x")
        )
        .orderBy("d")
        .collect()
    )
    x = np.array([r["x"] for r in day], dtype=np.int64)
    n = len(x)
    i, j = np.triu_indices(n, k=1)
    slopes = (x[j] - x[i]).astype(np.float64) / (j - i).astype(np.float64)
    slopes.sort()
    k = (len(slopes) + 1) // 2  # lower median, 1-indexed
    assert row["n_days"] == n
    assert row["n_pairs"] == len(slopes)
    assert abs(row["sen_slope"] - round(float(slopes[k - 1]), 6)) < 2e-6
