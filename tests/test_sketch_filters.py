"""Semantic pins for the sketch/filter tier (plans/sketch_filters.py)
and label propagation (plans/graph.py) — the invariants an oracle diff
can't isolate: the Bloom no-false-negative contract, the CMS one-sided
error guarantee, JL norm concentration, fold disjointness, and LPA
determinism.  Oracle parity itself is covered by test_oracle_parity /
driver_sim."""

from __future__ import annotations

import pyspark.sql.functions as F

import busdata_pipeline_spark.plans.graph  # noqa: F401  (registers)
import busdata_pipeline_spark.plans.sketch_filters  # noqa: F401
import busdata_pipeline_spark.plans.streaming_windows  # noqa: F401
from busdata_pipeline_spark.operators import quantize
from busdata_pipeline_spark.plans.registry import QUERIES


def test_bloom_no_false_negatives(spark, sf_dir):
    row = QUERIES["td_bloom_prune"](spark, sf_dir).collect()[0]
    # the Bloom contract: every blocklisted doc passes the filter
    assert row["n_true_pos"] == row["n_blocklist"]
    assert row["n_bloom_pass"] == row["n_true_pos"] + row["n_false_pos"]
    assert row["n_blocklist"] > 0
    # pruning must actually prune at the gate sf (fpr well below 1)
    assert row["n_bloom_pass"] < row["n_docs"]


def test_countmin_one_sided_error(spark, sf_dir):
    rows = QUERIES["td_countmin"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        # CMS never undercounts: collisions only add
        assert r["cms_est"] >= r["exact_tf"]
        assert r["overcount"] == r["cms_est"] - r["exact_tf"]


def test_random_projection_norm_concentration(spark, sf_dir):
    rows = QUERIES["td_random_projection"](spark, sf_dir).collect()
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == emb_n
    ratios = [r["norm_ratio"] for r in rows if r["norm_ratio"] is not None]
    assert ratios, "all-zero embedding corpus?"
    # JL with m=16: ratios concentrate near 1 (loose tail bound)
    assert all(0.2 < x < 2.5 for x in ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3


def test_sign_matrix_matches_duckdb_md5():
    import hashlib

    s = quantize._sign_matrix(4, 3)
    for j in range(4):
        for p in range(3):
            h = int(hashlib.md5(f"{j},{p}".encode()).hexdigest()[:15], 16)
            assert s[j, p] == (1 if h % 2 == 0 else -1)
    assert (s != 0).all() and set(s.flatten()) <= {-1, 1}


def test_grouped_kfold_partitions_corpus(spark, sf_dir):
    rows = QUERIES["td_grouped_kfold"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert sum(r["n_sources"] for r in rows) == (
        docs.select("source").distinct().count()
    )  # disjoint by construction: a source hashes to exactly one fold
    assert all(0 <= r["fold"] < 5 for r in rows)


def test_label_propagation_deterministic_and_closed(spark, sf_dir):
    out = QUERIES["rel_label_propagation"](spark, sf_dir)
    rows = out.collect()
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    keys = {r["s_suppkey"] for r in sup.select("s_suppkey").collect()}
    assert {r["s_suppkey"] for r in rows} == keys
    # labels are always node ids (closure: no label invented mid-flight)
    assert {r["community"] for r in rows} <= keys
    # propagation did SOMETHING: fewer communities than nodes
    assert len({r["community"] for r in rows}) < len(rows)
    # determinism: a second run is bit-identical
    again = QUERIES["rel_label_propagation"](spark, sf_dir).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_cms_real_stream_equals_batch(spark, tmp_path):
    """The CMS counter grid built by a REAL stream (state-store
    incremental aggregation, availableNow trigger, complete mode) must
    equal the batch sketch exactly — counting is associative, so the
    sketch merges losslessly across micro-batches."""
    from busdata_pipeline_spark.sources import table
    from busdata_pipeline_spark.streaming.sketches import cms_counters
    from tests.conftest import SF0001

    ev = table(spark, SF0001, "events").where(F.col("user_id").isNotNull())
    src = tmp_path / "cms_src"
    ev.coalesce(3).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    q = (
        cms_counters(stream, "user_id")
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM cms_stream").collect())
    )
    want = sorted(map(tuple, cms_counters(ev, "user_id").collect()))
    assert got == want and len(want) > 0


def test_stream_countmin_query_contract(spark, sf_dir):
    rows = QUERIES["st_stream_countmin"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)


def test_bottomk_kmv_distinct_estimate(spark, sf_dir):
    """The k-th smallest hash of the bottom-k sample is the KMV
    distinct-count estimator: (k-1) * 2^60 / h_k ~ |corpus|."""
    import busdata_pipeline_spark.plans.sketch_filters as sk

    out = QUERIES["td_bottomk_sample"](spark, sf_dir)
    rows = out.orderBy("rank").collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    k = min(sk._BOTTOMK, n)
    assert len(rows) == k
    # recompute the k-th hash the operator sorted by
    import hashlib

    h_k = sorted(
        int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16)
        for r in rows
    )[-1]
    est = (k - 1) * (1 << 60) / h_k
    assert 0.3 * n < est < 3.0 * n  # loose: k=50 gives ~15% rel. error
    # mergeability: bottom-k over any 2-way split, merged, is identical
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")

    def bk(df):
        return [
            (r["doc_id"],)
            for r in df.select(
                "doc_id",
                F.conv(F.md5(F.col("doc_id").cast("string")).substr(1, 15),
                       16, 10).cast("long").alias("h"),
            ).orderBy("h", "doc_id").limit(k).collect()
        ]

    merged = spark.createDataFrame(
        [x for x in bk(a)] + [x for x in bk(b)], "doc_id long"
    ).join(docs, "doc_id")
    assert bk(merged) == [(r["doc_id"],) for r in rows]


def test_winsorized_mean_bounded(spark, sf_dir):
    rows = QUERIES["td_winsorized_stats"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = {
        r["lang"]: (r["mx"], r["avg"])
        for r in docs.groupBy("lang")
        .agg(F.max("n_chars").alias("mx"), F.avg("n_chars").alias("avg"))
        .collect()
    }
    assert len(rows) == len(plain)
    for r in rows:
        mx, avg = plain[r["lang"]]
        assert r["p95_chars"] <= mx
        # clipping the upper tail can only pull the mean down
        assert r["win_mean_chars"] <= avg + 1e-9

def test_k_anonymity_audit_consistent(spark, sf_dir):
    row = QUERIES["td_k_anonymity"](spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    groups = (
        docs.groupBy("lang", "source").count().collect()
    )
    sizes = [g["count"] for g in groups]
    viol = [s for s in sizes if s < 5]
    assert row["n_groups"] == len(sizes)
    assert row["min_group_size"] == min(sizes)
    assert row["n_violating_groups"] == len(viol)
    assert row["n_exposed_docs"] == sum(viol)
    # exposed docs are exactly the members of sub-k groups
    assert row["n_exposed_docs"] <= row["n_violating_groups"] * 4


def test_embed_whitening_matches_numpy(spark, sf_dir):
    """Per-dim mean/std against numpy over the same 2^20 quantization."""
    import numpy as np

    rows = QUERIES["td_embed_whitening"](spark, sf_dir).collect()
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    M = np.array([r["embedding"] for r in embs], dtype=np.float64)
    Q = np.floor(M * 1048576.0 + 0.5)
    assert len(rows) == M.shape[1]
    for r in rows:
        col = Q[:, r["dim"]]
        n = len(col)
        mean = col.sum() / n / 1048576.0
        var = (
            (col * col).sum() - col.sum() * col.sum() / n
        ) / (n - 1) / (1048576.0 * 1048576.0)
        assert r["n"] == n
        assert abs(r["mean"] - round(mean, 6)) < 2e-6
        assert abs(r["std"] - round(var ** 0.5, 6)) < 2e-6
        assert r["std"] > 0


def test_dp_laplace_null_group_keys_agree_cross_engine(spark, tmp_path):
    """ADVICE r8: Spark concat_ws SKIPS NULLs while DuckDB || propagates
    them, so a NULL lang/source group used to get DIFFERENT noise per
    engine (silently — testdata has no NULL keys).  Both sides now
    coalesce to a shared sentinel; pin the divergence case with a
    corpus that has NULL lang, NULL source, and both."""
    import os

    from busdata_pipeline_spark.plans.registry import ORACLES
    from tests.oracle_check import compare, duckdb_con

    rows = [
        (1, "en", "web"), (2, None, "web"), (3, "en", None),
        (4, None, None), (5, "de", "web"),
    ]
    d = str(tmp_path / "dpnull")
    os.makedirs(d)
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    got = QUERIES["td_dp_laplace_release"](spark, d)
    ok, msg = compare(got, duckdb_con(d), ORACLES["td_dp_laplace_release"])
    assert ok, msg
