"""Ground-truth tests for the approximate / non-SQL-expressible
training-data operators (dedup LSH, SimHash, ANN, multimodal, sketches).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from busdata_pipeline_spark.operators import dedup, multimodal, similarity
from busdata_pipeline_spark.sources import table
from tests.conftest import SF0001

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
         "pi", "rho", "sigma", "tau", "upsilon"]


def make_docs(spark):
    """20 random docs + planted near-dups + one exact dup (seeded)."""
    rng = random.Random(7)
    rows = []
    for i in range(20):
        words = [rng.choice(VOCAB) for _ in range(60)]
        rows.append((i, " ".join(words)))
    # near-dups of docs 0..4: perturb 3 words of 60 (~Jaccard 0.85+)
    for j in range(5):
        words = rows[j][1].split(" ")
        for p in range(3):
            words[10 + 7 * p] = "zz%d" % p
        rows.append((100 + j, " ".join(words)))
    rows.append((200, rows[10][1]))  # exact dup of doc 10
    return spark.createDataFrame(rows, ["doc_id", "text"])


def brute_jaccard_pairs(rows, n=3, threshold=0.5):
    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    out = set()
    for i, (ida, ta) in enumerate(rows):
        for idb, tb in rows[i + 1:]:
            a, b = sh(ta), sh(tb)
            j = len(a & b) / len(a | b)
            if j >= threshold:
                out.add((min(ida, idb), max(ida, idb)))
    return out


def test_minhash_finds_planted_near_dups(spark):
    docs = make_docs(spark)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    truth = brute_jaccard_pairs(rows, threshold=0.5)
    got = {(r.a, r.b) for r in
           dedup.minhash_near_duplicates(docs, threshold=0.5).collect()}
    assert truth, "fixture must plant near-dups"
    # verify stage => no false positives; banded LSH at J>=0.8 => full recall here
    assert got <= brute_jaccard_pairs(rows, threshold=0.5 - 1e-9)
    planted = {(j, 100 + j) for j in range(5)} | {(10, 200)}
    assert planted <= got


def test_minhash_jaccard_matches_exact(spark):
    docs = make_docs(spark)
    rows = dict((r.doc_id, r.text) for r in docs.collect())
    for r in dedup.minhash_near_duplicates(docs, threshold=0.5).collect():
        w_a, w_b = rows[r.a].split(" "), rows[r.b].split(" ")
        sa = {" ".join(w_a[i:i + 3]) for i in range(len(w_a) - 2)}
        sb = {" ".join(w_b[i:i + 3]) for i in range(len(w_b) - 2)}
        assert r.jaccard == pytest.approx(len(sa & sb) / len(sa | sb), abs=1e-6)


def test_simhash_exact_dup_distance_zero(spark):
    docs = make_docs(spark)
    got = {(r.a, r.b): r.hamming for r in
           dedup.simhash_near_duplicates(docs, max_hamming=10).collect()}
    assert got.get((10, 200)) == 0  # exact dup => identical simhash


def test_simhash_portable_mode_matches_semantics(spark):
    docs = make_docs(spark)
    got = {(r.a, r.b): r.hamming for r in
           dedup.simhash_near_duplicates(
               docs, max_hamming=10, portable=True).collect()}
    assert got.get((10, 200)) == 0  # exact dup => identical 60-bit simhash


def test_drop_exact_duplicates_keeps_lowest_id(spark):
    docs = make_docs(spark)
    kept = {r.doc_id for r in dedup.drop_exact_duplicates(docs).collect()}
    assert 10 in kept and 200 not in kept
    assert len(kept) == docs.count() - 1


def make_clustered_embeddings(spark, n_clusters=10, per=30, dim=16):
    """Tight gaussian clusters — the regime ANN indexes are built for."""
    import numpy as np

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((n_clusters, dim)) * 5
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + rng.standard_normal(dim) * 0.3
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


@pytest.fixture(scope="module")
def clustered(spark):
    emb = make_clustered_embeddings(spark)
    q = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = {(r.qid, r.vec_id) for r in
             similarity.cosine_topk(emb, q, k=10).collect()}
    return emb, q, exact


def test_lsh_ann_recall_on_clustered(spark, clustered):
    emb, q, exact = clustered
    got = {(r.qid, r.vec_id) for r in
           similarity.lsh_ann_topk(emb, q, dim=16, k=10).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall} too low on clustered data"


def test_ivf_ann_recall_on_clustered(spark, clustered):
    emb, q, exact = clustered
    got = {(r.qid, r.vec_id) for r in
           similarity.ivf_ann_topk(emb, q, k=10, nprobe=2).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall} too low on clustered data"


def test_ann_results_bounded_and_deterministic(spark):
    emb = table(spark, SF0001, "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    a = similarity.lsh_ann_topk(emb, q, dim=64, k=10).collect()
    b = similarity.lsh_ann_topk(emb, q, dim=64, k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_q = {}
    for r in a:
        per_q.setdefault(r.qid, []).append(r.rank)
    for qid, ranks in per_q.items():
        assert len(ranks) <= 10 and len(set(ranks)) == len(ranks)


def test_semdedup_drops_exactly_the_planted_copies(spark):
    """SemDeDup on the planted corpus: every perturbed copy (cosine
    ~0.9999 to its base) is removed, every original (background cosine
    ~0.5) survives — the decision set, not just counts."""
    base = table(spark, SF0001, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = base.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    kept = {r.vec_id: r.kept for r in
            similarity.semdedup_flags(corpus, threshold=0.98).collect()}
    base_ids = {r.vec_id for r in base.select("vec_id").collect()}
    planted_ids = {i + 1000000 for i in base_ids if i % 50 == 0}
    assert len(kept) == len(base_ids) + len(planted_ids)
    assert all(not kept[p] for p in planted_ids), "planted copy survived"
    assert all(kept[b] for b in base_ids), "original was dropped"


def test_semdedup_gemm_path_drops_exactly_the_planted_copies(spark):
    """Same planted-corpus invariant through the LARGE-k configuration
    (> _GEMM_K), which routes training and final assignment through the
    Arrow/BLAS matmul path — the SemDeDup scale contract (cluster count
    grows with the corpus; the 100x rung measured 120s -> 4.6s after
    this path landed)."""
    base = table(spark, SF0001, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = base.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    assert 32 > similarity._GEMM_K
    kept = {r.vec_id: r.kept for r in
            similarity.semdedup_flags(
                corpus, threshold=0.98, n_clusters=32
            ).collect()}
    base_ids = {r.vec_id for r in base.select("vec_id").collect()}
    planted_ids = {i + 1000000 for i in base_ids if i % 50 == 0}
    assert all(not kept[p] for p in planted_ids), "planted copy survived"
    assert all(kept[b] for b in base_ids), "original was dropped"


def test_vectorized_cosine_identical_to_fold(spark):
    """The matmul scorer must be bit-identical to the fold-expression
    formulation (same float64 arithmetic, different engine path)."""
    emb = table(spark, SF0001, "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    a = sorted(tuple(r) for r in
               similarity.cosine_topk(emb, q, k=10).collect())
    b = sorted(tuple(r) for r in
               similarity.cosine_topk_vectorized(emb, q, k=10).collect())
    assert a == b


def test_embedding_near_dups_ground_truth(spark):
    """Planted perturbed copies are recovered exactly: LSH candidate
    pruning loses none of them and the cosine verify admits no random
    pair (background max cosine ~0.5 on the synthetic table)."""
    emb = table(spark, SF0001, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    n_planted = planted.count()
    got = similarity.embedding_near_duplicates(
        emb.unionByName(planted), threshold=0.98
    ).collect()
    assert n_planted > 0
    assert {(r.a, r.b) for r in got} == {
        (r.vec_id - 1000000, r.vec_id) for r in planted.collect()
    }
    assert all(r.cosine >= 0.98 for r in got)


def test_multimodal_decode_shape_and_determinism(spark):
    docs = table(spark, SF0001, "documents").limit(50)
    media = multimodal.attach_binary_payload(docs)
    d1 = multimodal.decode_items(media).collect()
    d2 = multimodal.decode_items(media).collect()
    assert sorted(map(tuple, d1)) == sorted(map(tuple, d2))
    for r in d1:
        assert 16 <= r.width < 80 and 16 <= r.height < 80
        assert 1 <= r.n_frames <= 8
        assert len(r.feature) == 8


def test_multimodal_real_decode_raises(spark):
    docs = table(spark, SF0001, "documents").limit(1)
    media = multimodal.attach_binary_payload(docs)
    if not multimodal.HAVE_IMAGE_CODEC:
        with pytest.raises(NotImplementedError):
            multimodal.decode_items(media, real=True)


def test_resize_preserves_aspect_and_bounds(spark):
    docs = table(spark, SF0001, "documents").limit(80)
    decoded = multimodal.decode_items(multimodal.attach_binary_payload(docs))
    out = multimodal.resize_items(decoded, max_side=32).collect()
    assert out
    import math

    for r in out:
        assert 1 <= max(r.out_width, r.out_height) <= 32
        if max(r.width, r.height) <= 32:
            assert (r.out_width, r.out_height) == (r.width, r.height)
            assert r.scale == 1.0
        else:
            # exact geometry contract: round-6 scale, floored dims, min 1
            want_scale = round(32 / max(r.width, r.height), 6)
            assert r.scale == want_scale
            assert r.out_width == max(1, math.floor(r.width * want_scale))
            assert r.out_height == max(1, math.floor(r.height * want_scale))


def test_frame_sample_keeps_even_frames(spark):
    docs = table(spark, SF0001, "documents").limit(20)
    media = multimodal.attach_binary_payload(docs)
    frames = multimodal.frame_sample(multimodal.decode_items(media), every_n=2)
    for r in frames.collect():
        assert r.frame_idx % 2 == 0


def test_sketches_accuracy(spark):
    ev = table(spark, SF0001, "events")
    exact_users = ev.select("user_id").distinct().count()
    exact_events = ev.select("event_id").distinct().count()
    row = ev.agg(
        F.approx_count_distinct("user_id", 0.01).alias("u"),
        F.approx_count_distinct("event_id", 0.01).alias("e"),
    ).first()
    assert abs(row.u - exact_users) / exact_users < 0.05
    assert abs(row.e - exact_events) / exact_events < 0.05


def test_vectorized_cosine_boundary_ties(spark):
    """Round-2 regression (ADVICE): duplicate vectors create cosine ties
    at the k-boundary inside a batch; the batch-local prune must keep
    every tied row so the global (cos desc, vec_id asc) rank matches the
    unpruned scorer exactly."""
    from pyspark.sql import types as T

    base = [1.0] + [0.0] * 7
    off = [0.9] + [0.1] * 7
    # 30 identical vectors (all tie at cosine 1.0 vs the query) + filler
    rows = [(i, base) for i in range(30)] + [(100 + i, off) for i in range(10)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    emb = spark.createDataFrame(rows, schema).repartition(4)
    q = spark.createDataFrame([(0, base)], schema).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    a = sorted(tuple(r) for r in similarity.cosine_topk(emb, q, k=5).collect())
    b = sorted(tuple(r) for r in
               similarity.cosine_topk_vectorized(emb, q, k=5).collect())
    assert a == b
    # deterministic tie-break: lowest vec_ids (excluding self 0) win
    assert [r[1] for r in sorted(b, key=lambda r: r[3])] == [1, 2, 3, 4, 5]


def test_vectorized_cosine_large_queryset_routes_to_join(spark):
    """The driver-collect side is guarded: beyond max_queries the call
    must route to the fully distributed join path (same results)."""
    emb = table(spark, SF0001, "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    a = sorted(tuple(r) for r in
               similarity.cosine_topk_vectorized(emb, q, k=5, max_queries=2).collect())
    b = sorted(tuple(r) for r in similarity.cosine_topk(emb, q, k=5).collect())
    assert a == b


def test_contamination_flags_planted_copy(spark):
    """A train doc that verbatim-copies a benchmark doc must be flagged;
    a doc with entirely unique text must not."""
    from busdata_pipeline_spark.operators.contamination import (
        contamination_hits,
    )

    bench_text = "zeta omega kappa lambda sigma tau upsilon phi chi psi"
    rows = [
        (17, bench_text),                       # benchmark (17 % 17 == 0)
        (1, bench_text),                        # train copy -> flagged
        (2, "one two three four five six seven eight nine ten"),  # clean
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    hits = {
        r.doc_id: r.n_bench_docs
        for r in contamination_hits(docs, F.col("doc_id") % 17 == 0).collect()
    }
    assert hits == {1: 1}


def test_contamination_drops_stop_shingles(spark):
    """Shingles above the df threshold must not create hits: 20 train
    docs sharing one common 3-gram with the benchmark are NOT flagged
    when that 3-gram's df exceeds max_df."""
    from busdata_pipeline_spark.operators.contamination import (
        contamination_hits,
    )

    common = "alpha beta gamma"
    rows = [(17, common + " delta epsilon")] + [
        (i, common + f" unique{i}a unique{i}b") for i in range(1, 15)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = contamination_hits(
        docs, F.col("doc_id") % 17 == 0, max_df=5
    ).collect()
    assert out == []  # 'alpha beta gamma' has df 15 > 5 -> filtered


def test_minhash_matches_exact_at_driver_sf(spark):
    """Guards the td_minhash_near_dups oracle promotion: the LSH pipeline's
    output must equal the exact all-pairs Jaccard >= 0.5 definition on the
    driver's correctness dataset (sf0.01).  Every planted near-dup there
    sits at j >= 0.9, where 8-band miss probability is < 3e-4 with fixed
    seeds; if the data ever changes to include boundary pairs, this fails
    locally before the driver sees a mismatch."""
    from tests.conftest import SF001

    docs = table(spark, SF001, "documents")
    got = {(r.a, r.b, r.jaccard) for r in
           dedup.minhash_near_duplicates(docs, threshold=0.5).collect()}
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    truth = set()
    for i, (ida, ta) in enumerate(rows):
        wa = ta.strip().split(" ")
        sa = {" ".join(wa[k:k + 3]) for k in range(len(wa) - 2)}
        for idb, tb in rows[i + 1:]:
            wb = tb.strip().split(" ")
            sb = {" ".join(wb[k:k + 3]) for k in range(len(wb) - 2)}
            if not (sa | sb):
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.5:
                lo, hi = min(ida, idb), max(ida, idb)
                truth.add((lo, hi, round(j, 6)))
    assert got == truth


def test_wav_decode_roundtrip(spark):
    """Real RIFF/PCM codec through the mapInPandas seam: synthesized
    16-bit mono payloads decode back to exact sample stats."""
    import numpy as np

    rows = []
    for doc_id, rate, n in [(1, 8000, 64), (2, 16000, 1), (3, 44100, 777)]:
        samples = [((doc_id * 13 + i) % 65536) - 32768 for i in range(n)]
        rows.append((doc_id, bytearray(multimodal.encode_wav(rate, samples))))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in multimodal.decode_wav_items(media).collect()}
    for doc_id, rate, n in [(1, 8000, 64), (2, 16000, 1), (3, 44100, 777)]:
        samples = np.array(
            [((doc_id * 13 + i) % 65536) - 32768 for i in range(n)],
            dtype=np.float64,
        )
        r = got[doc_id]
        assert (r.sample_rate, r.n_samples) == (rate, n)
        assert r.mean_abs == pytest.approx(
            round(float(np.abs(samples).mean()), 6), abs=1e-9
        )


def test_wav_decode_rejects_garbage(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"not a riff file at all"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="RIFF|WAVE"):
        multimodal.decode_wav_items(media).collect()


def test_ppm_decode_rejects_bad_magic(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"P3\n1 1\n255\n0 0 0"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="P6"):
        multimodal.decode_ppm_items(media).collect()


def test_ppm_roundtrip_exact_pixels(spark):
    """encode_ppm -> decode_ppm_items preserves exact channel means,
    including multi-digit dims (width 12 exercises the header tokenizer)."""
    w, h = 12, 5
    px = [(3 * j + 1) % 256 for j in range(w * h * 3)]
    media = spark.createDataFrame(
        [(9, bytearray(multimodal.encode_ppm(w, h, px)))],
        "doc_id long, payload binary",
    )
    r = multimodal.decode_ppm_items(media).collect()[0]
    assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
    mean_r = sum(px[0::3]) / (w * h)
    assert r.mean_r == pytest.approx(round(mean_r, 6), abs=1e-9)


def test_ivf_kmeans_recall_at_10(spark):
    """Lloyd-trained IVF must recover >= 0.9 of the exact top-10 on a
    corpus with real cluster structure (10 planted clusters, tight
    noise), probing only 2 of 10 partitions."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 16))
    rows = []
    vid = 0
    for c in range(10):
        for _ in range(24):
            v = centers[c] + 0.15 * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where(F.col("vec_id") % 48 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = {
        (r.qid, r.vec_id)
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.qid, r.vec_id)
        for r in similarity.ivf_kmeans_ann_topk(
            emb, queries, k=10, n_clusters=10, n_iter=2, nprobe=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall@10 = {recall:.3f}"


def test_unigram_logprob_round_margin(spark):
    """The ROUND(_, 6) canonicalization of td_unigram_logprob is only
    engine-stable if no document's score sits near a rounding boundary.
    Guard the measured margin (~7.4e-4 in micro-nat units at sf0.01,
    ~7000x the worst-case summation-order noise) so a testdata change
    that erodes it fails HERE, not in the driver's hash comparison."""
    import duckdb

    from tests.conftest import SF001

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF001}/documents.parquet')"
    )
    margin = con.sql("""
WITH toks AS (SELECT doc_id, unnest(string_split(TRIM(text),' ')) AS tok
              FROM documents),
dt AS (SELECT doc_id, tok, COUNT(*) c_dt FROM toks WHERE tok<>'' GROUP BY 1,2),
ct AS (SELECT tok, CAST(COUNT(*) AS BIGINT) c_t FROM toks WHERE tok<>'' GROUP BY 1),
tot AS (SELECT CAST(SUM(c_t) AS BIGINT) total FROM ct),
x AS (SELECT doc_id,
             ln(CAST(total AS DOUBLE))
             - SUM(c_dt*ln(CAST(c_t AS DOUBLE)))/SUM(c_dt) AS v
      FROM dt JOIN ct USING (tok) CROSS JOIN tot GROUP BY doc_id, total)
SELECT MIN(ABS(ABS(v*1e6 - FLOOR(v*1e6)) - 0.5)) FROM x
""").fetchone()[0]
    assert margin > 1e-5, f"round-6 boundary margin eroded: {margin}"


def test_weighted_sample_prefers_long_documents(spark):
    """Length-weighted sampling must over-represent long docs vs the
    corpus mean (statistical sanity on the deterministic draw)."""
    import __spark_entry__ as E
    from tests.conftest import SF001

    sample = E.queries()["td_weighted_sample"](spark, SF001)
    got = sample.agg(F.avg("n_chars")).first()[0]
    base = (table(spark, SF001, "documents").where("n_chars > 0")
            .agg(F.avg("n_chars")).first()[0])
    assert got > base * 1.05, (got, base)


def test_winnowing_guarantee_shared_substring_shares_fingerprint(spark):
    """Schleimer et al.'s core guarantee: two documents sharing a
    substring of >= w+k-1 (= 8) tokens share at least one selected
    fingerprint — checked on planted shared spans with disjoint
    backgrounds."""
    import __spark_entry__ as E
    import tempfile, os, shutil

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"          # exactly w+k-1 tokens
    rows = [
        (1, f"a1 a2 a3 {shared} a4 a5 a6"),
        (2, f"b1 b2 {shared} b3 b4 b5 b6 b7"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),  # unrelated
    ]
    d = tempfile.mkdtemp()
    try:
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        fps = E.queries()["td_winnow_fingerprints"](spark, d).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r.doc_id, set()).add(r.fp)
        assert by_doc[1] & by_doc[2], "shared substring lost"
        assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_y4m_frame_sample_roundtrip(spark):
    """Real YUV4MPEG2 container walk through the mapInPandas seam:
    synthesized C444 payloads frame-sample back to exact per-frame luma
    means, with unsampled frames skipped arithmetically."""
    import numpy as np

    rows, want = [], {}
    for doc_id, w, h, n_frames in [(1, 4, 2, 5), (2, 8, 5, 1), (3, 3, 3, 4)]:
        frames = []
        for f in range(n_frames):
            j = np.arange(w * h, dtype=np.int64)
            y = (doc_id * 100 + f * 7 + j) % 256
            uv = np.zeros(2 * w * h, dtype=np.int64)
            frames.append(np.concatenate([y, uv]).astype(np.uint8).tobytes())
            if f % 2 == 0:
                want[(doc_id, f)] = (w, h,
                                     round(float(y.astype(np.float64).mean()), 6))
        rows.append((doc_id, bytearray(multimodal.encode_y4m(w, h, 25, frames))))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r.doc_id, r.frame_idx): (r.width, r.height, r.mean_y)
        for r in multimodal.video_frame_sample_means(media, every_n=2).collect()
    }
    assert got == want


def test_y4m_rejects_wrong_colorspace(spark):
    # C420 frame layout differs; the walker must refuse, not mis-slice
    buf = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\nFRAME\n" + b"\x00" * 12
    media = spark.createDataFrame([(1, bytearray(buf))],
                                  "doc_id long, payload binary")
    with pytest.raises(Exception, match="colorspace"):
        multimodal.video_frame_sample_means(media).collect()


def test_y4m_rejects_bad_frame_marker(spark):
    buf = b"YUV4MPEG2 W2 H1 F25:1 Ip A1:1 C444\nFRAMX\n" + b"\x00" * 6
    media = spark.createDataFrame([(1, bytearray(buf))],
                                  "doc_id long, payload binary")
    with pytest.raises(Exception, match="FRAME"):
        multimodal.video_frame_sample_means(media).collect()


def test_ccnet_buckets_ordered_and_partition(spark):
    """CCNet head/middle/tail: the buckets partition each language's
    docs, sizes are within tie-slack of thirds, and mean cross-entropy
    is monotone head <= middle <= tail (head = best quality)."""
    import __spark_entry__ as E
    from tests.conftest import SF001

    rows = E.queries()["td_ccnet_perplexity_buckets"](spark, SF001).collect()
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    per_lang = {
        r["lang"]: r["n"] for r in
        docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    assert set(by_lang) == set(per_lang)
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        assert sum(b["n_docs"] for b in buckets.values()) == per_lang[lang]
        # value-cut at the tercile order statistic: head holds at least
        # a third (ties at the cut can only grow it)
        assert buckets["head"]["n_docs"] >= per_lang[lang] // 3
        means = [
            buckets[k]["mean_xent"]
            for k in ("head", "middle", "tail") if k in buckets
        ]
        assert means == sorted(means)


def test_ppm_nn_resize_matches_python_model(spark):
    """resize_ppm_items vs an independent pure-Python NN resample of the
    same closed-form pixel plane (no numpy gather, no SQL)."""
    from tests.conftest import SF001

    docs = spark.read.parquet(f"{SF001}/documents.parquet").limit(40)
    media = multimodal.synth_ppm_media(docs)
    got = {
        r["doc_id"]: (r["out_width"], r["out_height"], r["sum_rgb"])
        for r in multimodal.resize_ppm_items(media, max_side=4).collect()
    }
    for doc_id in got:
        i = int(doc_id)
        w, h = 4 + i % 8, 3 + i % 5
        longest = max(w, h)
        ow, oh = max(w * 4 // longest, 1), max(h * 4 // longest, 1)
        total = 0
        for y in range(oh):
            for x in range(ow):
                si = (y * h // oh) * w + (x * w // ow)
                for c in range(3):
                    total += (i * 7 + 3 * si + c) % 256
        assert got[doc_id] == (ow, oh, total), doc_id


def test_ann_recall_eval_matches_independent_intersection(spark):
    """td_ann_recall_eval's recall numbers must equal an independently
    computed |exact ∩ ivf| per query (the eval is itself evaluated),
    and cover every query id exactly once with 0 <= n_hits <= 10."""
    import __spark_entry__ as E
    from tests.conftest import SF001

    got = {r.qid: (r.n_hits, r.recall_at_10)
           for r in E.queries()["td_ann_recall_eval"](spark, SF001).collect()}
    exact = E.queries()["td_cosine_topk"](spark, SF001).collect()
    ivf = E.queries()["td_ivf_ann"](spark, SF001).collect()
    ex_sets, ivf_sets = {}, {}
    for r in exact:
        ex_sets.setdefault(r.qid, set()).add(r.vec_id)
    for r in ivf:
        ivf_sets.setdefault(r.qid, set()).add(r.vec_id)
    assert set(got) == set(ex_sets)
    for qid, (n, rec) in got.items():
        want = len(ex_sets[qid] & ivf_sets.get(qid, set()))
        assert n == want, (qid, n, want)
        assert rec == round(want / 10.0, 6)
        assert 0 <= n <= 10
