"""Semantic pins for plans/curation_ext.py and the CSV roundtrip —
the invariants an oracle diff can't isolate: normalization idempotence
and byte-exact mode behavior, Kneser-Ney's sum-to-one property and a
pure-Python model replay, and row-level CSV losslessness (not just the
profile hash)."""

from __future__ import annotations

import math
import unicodedata

import pyspark.sql.functions as F

import busdata_pipeline_spark.plans.curation_ext as cx  # noqa: F401
import busdata_pipeline_spark.plans.formats  # noqa: F401
import busdata_pipeline_spark.plans.training_data  # noqa: F401
from busdata_pipeline_spark.plans.registry import QUERIES


def _clean_py(x: str) -> str:
    import re

    y = unicodedata.normalize("NFC", x)
    for z in cx._ZW:
        y = y.replace(z, "")
    return re.sub(r"[ \t\r\n]+", " ", y).strip(" ")


def test_normalize_modes_and_idempotence(spark, sf_dir):
    rows = QUERIES["td_text_normalize"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        t = docs[r["doc_id"]]
        mode = r["doc_id"] % 3
        if mode == 0:
            dirty = t.replace("a", "á")
        elif mode == 1:
            dirty = t + "​﻿"
        else:
            dirty = t.replace(" ", "\t\r\n")
        clean = _clean_py(dirty)
        assert r["n_dirty"] == len(dirty)
        assert r["n_clean"] == len(clean)
        assert r["changed"] == (dirty != clean)
        # idempotence: a second pass is the identity
        assert _clean_py(clean) == clean
        # whitespace-damage mode restores the original text exactly
        if mode == 2:
            assert clean == t
        # combining-acute mode composes to the precomposed á
        if mode == 0 and "a" in t:
            assert "́" not in clean and "á" in clean


def _kn_reference(docs: dict[int, str]):
    """Pure-Python interpolated KN (d=0.75) replay of the query's math,
    including the micro-nat quantization."""
    toks = {d: [w for w in t.strip().split(" ") if w] for d, t in docs.items()}
    tbig: dict[tuple[str, str], int] = {}
    for d, ws in toks.items():
        if d % 2 == 0:
            for a, b in zip(ws, ws[1:]):
                tbig[(a, b)] = tbig.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1p: dict[str, int] = {}
    for (a, b), c in tbig.items():
        c1[a] = c1.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1p[b] = n1p.get(b, 0) + 1
    B = len(tbig)
    out = {}
    for d, ws in toks.items():
        lpm_sum = 0
        n = 0
        for a, b in zip(ws, ws[1:]):
            if a in c1:
                p = (
                    max(tbig.get((a, b), 0) - 0.75, 0.0)
                    + 0.75 * n1f[a] * n1p.get(b, 1) / B
                ) / c1[a]
            else:
                p = n1p.get(b, 1) / B
            lpm_sum += math.floor(math.log(p) * 1000000 + 0.5)
            n += 1
        if n:
            out[d] = (n, round(-lpm_sum / 1000000.0 / n, 6))
    return out, (tbig, c1, n1f, n1p, B)


def test_kn_matches_pure_python_replay(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    want, _ = _kn_reference(docs)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent_nats"])
        for r in QUERIES["td_kn_bigram_logprob"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for d, (n, xent) in want.items():
        assert got[d][0] == n
        # Python round() is banker's, Spark ROUND is HALF_UP — allow the
        # one-ulp-of-ROUND divergence at exact .5e-6 boundaries (the
        # engines themselves agree: driver_sim hash-checks Spark vs
        # DuckDB exactly).
        assert abs(got[d][1] - xent) < 1.1e-6


def test_kn_probabilities_sum_to_one(spark, sf_dir):
    """The KN identity: for every seen context w1, summing P(w2|w1)
    over the full continuation vocabulary gives exactly 1 — the
    discount mass d·N1+(w1•) is redistributed, not lost."""
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    _, (tbig, c1, n1f, n1p, B) = _kn_reference(docs)
    vocab = list(n1p.keys())
    for w1 in list(c1.keys())[:5]:
        total = sum(
            (
                max(tbig.get((w1, w2), 0) - 0.75, 0.0)
                + 0.75 * n1f[w1] * n1p[w2] / B
            )
            / c1[w1]
            for w2 in vocab
        )
        assert abs(total - 1.0) < 1e-9


def test_csv_roundtrip_row_level_lossless(spark, sf_dir, tmp_path):
    """Beyond the registered profile hash: every column of every row
    survives the CSV write/read byte-for-byte (quotes in props, nulls
    vs empties, micros timestamps, shortest-repr doubles)."""
    from pyspark.sql import types as T

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "csv")
    opts = {
        "header": "true",
        "quote": '"',
        "escape": '"',
        "nullValue": "\\N",
        "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    }
    w = ev.write.mode("overwrite")
    for k, v in opts.items():
        w = w.option(k, v)
    w.csv(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    r = spark.read.schema(schema)
    for k, v in opts.items():
        r = r.option(k, v)
    back = r.csv(path)

    a = sorted(ev.collect(), key=lambda x: x["event_id"])
    b = sorted(back.collect(), key=lambda x: x["event_id"])
    assert len(a) == len(b)
    n_quoted = 0
    for ra, rb in zip(a, b):
        assert ra == rb
        if ra["props"] and '"' in ra["props"]:
            n_quoted += 1
    assert n_quoted > 0  # the hostile rows were actually exercised


def test_lr_trainer_loss_decreases_and_learns(spark, sf_dir):
    """The trained-ness invariants: logistic loss strictly decreases
    across all 10 GD rounds, and the learned weights actually separate
    the classes (accuracy above the majority baseline)."""
    import math

    rows = sorted(
        QUERIES["td_quality_lr_train"](spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == list(range(1, 11))
    losses = [r["loss"] for r in rows]
    assert all(a > b for a, b in zip(losses, losses[1:])), losses
    w = rows[-1]
    # replay features in python and score
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    good = 0
    n = 0
    n_pos = 0
    for d in docs:
        t = [x for x in d["text"].strip().split(" ") if x]
        if not t:
            continue
        f1 = len(t) / 100.0
        f2 = d["n_chars"] / len(t) / 10.0
        f3 = sum(1 for x in t if x in ("a", "the")) / len(t)
        y = 1.0 if d["n_chars"] >= 300 else 0.0
        z = w["w0"] + w["w1"] * f1 + w["w2"] * f2 + w["w3"] * f3
        p = 1.0 / (1.0 + math.exp(-z))
        good += int((p >= 0.5) == (y == 1.0))
        n_pos += int(y == 1.0)
        n += 1
    majority = max(n_pos, n - n_pos) / n
    assert good / n > majority  # learned signal beyond the base rate


def test_kn_bigram_adjacency_survives_consecutive_spaces(spark, tmp_path):
    """Regression pin for the raw-split-index adjacency bug: a doc with
    consecutive spaces ('x  y') must form the (x, y) bigram on BOTH
    engines — the oracle re-ranks positions after the empty-token
    filter, matching Spark's lead() over the filtered stream."""
    import shutil

    from busdata_pipeline_spark.plans.registry import ORACLES
    from tests.conftest import SF0001
    from tests.oracle_check import compare, duckdb_con

    d = str(tmp_path / "sfspacing")
    shutil.copytree(SF0001, d)
    docs = [
        (0, "x  y x", "en", "s", 6),          # double space mid-doc
        (1, " a  the  a ", "en", "s", 11),    # leading/trailing + doubles
        (2, "x y the a x y", "en", "s", 13),
        (3, "a the a the a", "en", "s", 13),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents_new.parquet")
    import os

    os.remove(f"{d}/documents.parquet")
    shutil.move(f"{d}/documents_new.parquet", f"{d}/documents.parquet")

    out = {
        r["doc_id"]: r["n_bigrams"]
        for r in QUERIES["td_kn_bigram_logprob"](spark, d).collect()
    }
    # filtered-token adjacency: 'x  y x' → [x, y, x] → 2 bigrams
    assert out == {0: 2, 1: 2, 2: 5, 3: 4}
    ok, msg = compare(
        QUERIES["td_kn_bigram_logprob"](spark, d),
        duckdb_con(d),
        ORACLES["td_kn_bigram_logprob"],
    )
    assert ok, msg


def test_lr_lift_is_a_working_gain_chart(spark, sf_dir):
    rows = sorted(
        QUERIES["td_quality_lr_lift"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # NTILE: bucket sizes differ by at most 1 and cover the corpus
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # a working classifier concentrates positives up front
    assert rows[0]["cum_lift"] > 1.2
    assert rows[0]["pos_rate"] > rows[-1]["pos_rate"]
    # cumulative lift over ALL deciles is the base rate: exactly 1
    assert rows[-1]["cum_lift"] == 1.0
    # cum_lift is monotonically non-increasing down the ranking
    lifts = [r["cum_lift"] for r in rows]
    assert all(a >= b for a, b in zip(lifts, lifts[1:]))


def test_audio_doc_features_replay(spark, sf_dir):
    import math as m

    rows = QUERIES["td_audio_doc_features"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs
    for r in rows[:50]:
        i = r["doc_id"]
        n = 16 + i % 17
        v = [(i * 13 + j * 7) % 4001 - 2000 for j in range(n)]
        assert r["n_samples"] == n
        assert r["peak_abs"] == max(abs(x) for x in v)
        assert r["zero_crossings"] == sum(
            1 for a, b in zip(v, v[1:]) if a * b < 0
        )
        rms = m.floor(m.sqrt(sum(x * x for x in v) / n) * 1e6 + 0.5) / 1e6
        assert abs(r["rms"] - rms) < 1e-9
        assert 0 <= r["peak_abs"] <= 2000


def test_stream_quality_gate_filters_both_ways(spark, sf_dir):
    """The gate is a real filter: some docs pass, some are dropped, and
    every emitted score clears the threshold.  (Stream==batch equality
    is the registered oracle's job — driver_sim hash-checks it.)"""
    import busdata_pipeline_spark.plans.streaming_windows  # noqa: F401

    rows = QUERIES["st_stream_quality_gate"](spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert 0 < len(rows) < total
    assert all(r["score"] >= 0.5 for r in rows)
    assert len({r["doc_id"] for r in rows}) == len(rows)  # exactly-once


def test_corpus_snapshot_diff_accounting(spark, sf_dir):
    """The diff classes partition both versions exactly: v1 = removed +
    changed + unchanged; v2 = added + changed + unchanged."""
    row = QUERIES["td_corpus_snapshot_diff"](spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    n_removed_expect = docs.where(F.col("doc_id") % 17 == 0).count()
    n_changed_expect = docs.where(
        (F.col("doc_id") % 17 != 0) & (F.col("doc_id") % 10 == 0)
    ).count()
    assert row["n_removed"] == n_removed_expect == row["n_added"]
    assert row["n_changed"] == n_changed_expect
    assert row["n_removed"] + row["n_changed"] + row["n_unchanged"] == n
    assert row["n_added"] > 0 and row["n_changed"] > 0
