"""Duplicate-heavy equivalence regressions for the round-11 quotient
rewrites (VERDICT-r11 task 2).

Round 11 rewrote three kernels to run their quadratic work on DISTINCT
payloads and expand verdicts back to members (ORACLES.md rule 16 —
exact dedup before quadratic work, the 100 TB-correct shape):

- ``dedup.fuzzy_nm_pairs`` / ``fuzzy_prefix_matches`` — blocking +
  levenshtein once per distinct normalized name, expanded to doc pairs;
- ``rel_entity_resolution`` — label propagation on the distinct-name
  graph (self-edge keeps multi-member names), membership expanded after;
- ``knn_graph`` — one GEMM over np.unique'd vectors per IVF cell,
  scores expanded to members.

Each rewrite is an algebraic identity that sf0.01 CANNOT exercise (no
duplicates => the quotient is a no-op), so a future edit to the
expansion joins could silently break it while every driver gate stayed
green.  These tests pin each identity on a fixture where every distinct
payload has >= 3 exact copies, comparing the quotient output against
the DEFINITIONAL doc-level computation written out longhand.
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from busdata_pipeline_spark.operators import clustering, dedup
from busdata_pipeline_spark.operators.similarity import knn_graph

# Nine distinct texts in three fuzzy families (pairwise levenshtein on
# the 12-char padded prefix <= 2 within a family, > 2 across), each
# replicated 3-5x => 36 docs.  Prefixes are crafted so every family
# shares at least one aligned 4-char block (the blocking contract).
_DISTINCT_TEXTS = [
    # family A: "hello world!" +/- 1-2 edits inside one block
    "hello world! lorem ipsum",
    "hello w0rld! dolor sit",
    "hello world? amet consectetur",
    # family B: "data pipelin" +/- edits
    "data pipelin adipiscing",
    "data pipelim elit sed",
    "data pipe1im do eiusmod",
    # family C: singletons-by-name (no cross-name match: first block
    # differs from everything else)
    "zebra quartz unique one",
    "quark zephyr unique two",
    "mauve python unique three",
]
_COPIES = [3, 4, 5, 3, 4, 3, 5, 3, 4]  # >= 3 copies per distinct text


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = []
    doc_id = 0
    for text, n in zip(_DISTINCT_TEXTS, _COPIES):
        for _ in range(n):
            rows.append((doc_id, text))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _definitional_fuzzy_pairs(docs, prefix_len=12, n_blocks=3, max_dist=2):
    """fuzzy_prefix_matches written out at DOC level, no quotient:
    every doc explodes its aligned prefix blocks, candidates share a
    (block_index, block), levenshtein verifies on the padded names."""
    nm = dedup.normalized_names(docs, prefix_len)
    blk = prefix_len // n_blocks
    blocks = nm.select(
        "doc_id", "nm",
        F.posexplode(F.array(*[
            F.substring("nm", 1 + i * blk, blk) for i in range(n_blocks)
        ])).alias("blk_i", "blk"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(b, (F.col("a.blk_i") == F.col("b.blk_i"))
               & (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"),
                F.levenshtein("a.nm", "b.nm").cast("int").alias("dist"))
        .where(F.col("dist") <= max_dist)
        .distinct()
    )


def test_fuzzy_quotient_equals_doc_level_definition(spark, dup_docs):
    got = sorted(
        tuple(r) for r in dedup.fuzzy_prefix_matches(dup_docs).collect()
    )
    want = sorted(
        tuple(r) for r in _definitional_fuzzy_pairs(dup_docs).collect()
    )
    assert got == want
    # the fixture actually exercises both expansion legs: within-name
    # (dist 0) AND cross-name pairs must be present
    dists = {d for _, _, d in got}
    assert 0 in dists and dists - {0}, dists


def test_entity_resolution_quotient_equals_doc_level_definition(
    spark, dup_docs, tmp_path
):
    """rel_entity_resolution (distinct-name graph + expansion) must
    equal the definitional doc-level pipeline: doc-pair fuzzy edges ->
    connected components -> survivorship, with no quotient anywhere."""
    from busdata_pipeline_spark.plans.llm_corpus import (
        rel_entity_resolution,
    )
    from pyspark.sql import Window

    sf_dir = str(tmp_path / "sfdup")
    dup_docs.write.parquet(f"{sf_dir}/documents.parquet")

    got = sorted(tuple(r) for r in rel_entity_resolution(
        spark, sf_dir).collect())

    doc_edges = _definitional_fuzzy_pairs(dup_docs).select("a", "b")
    clusters = clustering.dedup_clusters(doc_edges)
    n_chars = dup_docs.select(
        "doc_id", F.length(F.trim("text")).alias("n_chars")
    )
    wc = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    rep = (
        clusters.join(n_chars, "doc_id")
        .withColumn("rn", F.row_number().over(wc))
        .where(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("rep_doc_id"))
    )
    want = sorted(tuple(r) for r in (
        clusters.join(rep, "cluster_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("rep_doc_id").alias("rep_doc_id"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
    ).collect())
    assert got == want
    # sanity: the duplicate-heavy fixture produced multi-member
    # entities spanning MORE docs than distinct names (the expansion
    # actually expanded)
    assert got and all(r[1] >= 3 for r in got)


def test_knn_distinct_row_gemm_equals_per_pair_definition(spark):
    """knn_graph's np.unique distinct-row GEMM must equal the
    definitional per-PAIR scoring: cosine computed independently for
    each (query, neighbor) pair with np.dot — which is bit-deterministic
    in its inputs, unlike a blocked GEMM over the member matrix — then
    ranked by (cos DESC, id ASC).  Run on duplicate-heavy vectors
    (every distinct vector has >= 3 exact copies) where the round-11
    bug class lives: equal inputs MUST tie exactly and break by id."""
    rng = np.random.default_rng(7)
    distinct = rng.normal(size=(12, 8))
    rows, vid = [], 0
    for i in range(len(distinct)):
        for _ in range(3 + i % 3):  # 3-5 exact copies each
            rows.append((vid, [float(x) for x in distinct[i]]))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    k, n_clusters = 5, 2
    got = {
        (r["vec_id"], r["rank"]): (r["nbr_id"], r["cosine"])
        for r in knn_graph(emb, k=k, n_clusters=n_clusters).collect()
    }

    # definitional replay: same trained cells (the IVF contract), then
    # per-pair np.dot scoring and an explicit (cos DESC, id ASC) sort
    from busdata_pipeline_spark.operators.similarity import (
        assign_to_centroids_auto, kmeans_centroids,
    )
    cents = kmeans_centroids(emb, n_clusters, 2)
    assigned = assign_to_centroids_auto(emb, cents, "embedding").collect()
    cells: dict = {}
    for r in assigned:
        cells.setdefault(r["cluster"], []).append(
            (r["vec_id"], np.array(r["embedding"]))
        )
    want = {}
    for members in cells.values():
        members.sort()
        for qid, qv in members:
            qn = np.linalg.norm(qv)
            scored = []
            for nid, nv in members:
                if nid == qid:
                    continue
                nn = np.linalg.norm(nv)
                denom = (qn if qn else 1.0) * (nn if nn else 1.0)
                cos = float(np.dot(qv / (qn if qn else 1.0),
                                   nv / (nn if nn else 1.0)))
                scored.append((-cos, nid))
            scored.sort()
            for rank, (negc, nid) in enumerate(scored[:k], start=1):
                want[(qid, rank)] = (nid, round(-negc, 6))
    assert got == want
    # duplicate-consistency property (fails under the pre-r11 GEMM
    # tie-break bug even if the definitional replay is weakened):
    # copies of the same vector must see each other at cosine 1.0
    # ahead of every non-parallel neighbor
    copies: dict = {}
    for v_id, vec in rows:
        copies.setdefault(tuple(vec), []).append(v_id)
    for ids in copies.values():
        for q in ids:
            top = [got[(q, r)] for r in range(1, min(k, len(ids) - 1) + 1)
                   if (q, r) in got]
            expected_ids = sorted(i for i in ids if i != q)[: len(top)]
            assert [t[0] for t in top] == expected_ids
            assert all(t[1] == 1.0 for t in top)


def test_lloyd_training_is_deterministic(spark):
    """Round-12 (optimization): the cross-run codebook memos were
    removed — every query invocation must compute from the parquet
    inputs.  What remains load-bearing is the property the memos relied
    on and that intra-run `centroids=` threading still relies on:
    training is a pure function of (corpus, k, n_iter), so two
    independent runs return bit-identical centroids."""
    from busdata_pipeline_spark.operators import similarity

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=4)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    c1 = similarity.kmeans_centroids(emb, 4, 2)
    c2 = similarity.kmeans_centroids(emb, 4, 2)
    assert c1 == c2  # bit-identical retrain
    # and the public entry points no longer accept a memo key at all
    import inspect
    for fn in (similarity.kmeans_centroids, similarity.pq_train_codebooks,
               similarity.semdedup_flags, similarity.knn_graph,
               similarity.pq_adc_topk):
        assert "cache_key" not in inspect.signature(fn).parameters


def test_setsim_quotient_equals_doc_level_kernel(spark):
    """Round-12: jaccard_pairs_prefix quotients by distinct trimmed
    text (kernel on reps, verdicts expanded).  On duplicate-heavy docs
    its output must equal the doc-level AllPairs/PPJoin kernel
    (_prefix_rep_pairs) run over ALL docs — the pre-quotient
    definition.  The fixture has >= 3 copies per text, a same-text
    family (within leg, j = 1.0) and a near-identical long pair whose
    3-shingle jaccard is 18/19 >= 9/10 (cross leg)."""
    from busdata_pipeline_spark.operators import setsim

    base = " ".join(f"w{i}" for i in range(20))
    texts = [
        base,                      # 18 shingles
        base + " extra",           # 19 shingles, 18 shared -> j=18/19
        "a tiny doc here",         # unrelated
    ]
    rows, did = [], 0
    for t, n in zip(texts, (3, 3, 4)):
        for _ in range(n):
            rows.append((did, t))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(tuple(r) for r in setsim.jaccard_pairs_prefix(docs).collect())
    want = sorted(
        tuple(r) for r in setsim._prefix_rep_pairs(docs).collect()
    )
    assert got == want
    # both legs really fired: same-text 1.0 pairs AND the 18/19 cross
    js = {j for _, _, j in got}
    assert 1.0 in js and round(18 / 19, 6) in js


def test_setsim_quotient_routing_is_adaptive(spark):
    """Round-13: the quotient is bypassed when texts are ~all distinct
    (the rep/expand machinery is pure overhead there — r12's worst
    bench regression) and kept when replication is heavy (its 100×-rung
    raison d'être).  The md5 text-hash only exists on the quotient
    route, so the executed plan pins which route fired; both routes
    compute the identical relation (previous test)."""
    from busdata_pipeline_spark.operators import setsim

    distinct = spark.createDataFrame(
        [(i, f"alpha w{i} beta w{i + 1} gamma w{i + 2} delta")
         for i in range(40)],
        "doc_id bigint, text string",
    )
    plan = setsim.jaccard_pairs_prefix(distinct)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "md5" not in plan  # bypass: kernel directly on docs

    base = " ".join(f"w{i}" for i in range(20))
    heavy = spark.createDataFrame(
        [(i, base) for i in range(30)] + [(100, "a tiny doc here")],
        "doc_id bigint, text string",
    )
    plan = setsim.jaccard_pairs_prefix(heavy)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "md5" in plan  # quotient: rep build + expansion retained


def test_embed_near_dups_quotient_equals_doc_level_definition(spark):
    """Round-12: embedding_near_duplicates quotients by distinct
    vector.  On duplicate-heavy embeddings its output must equal the
    pre-quotient doc-level definition (bucket join + Hamming<=1 probes
    + exact cosine over ALL id pairs), written out longhand here."""
    from pyspark.sql import functions as F2

    from busdata_pipeline_spark.operators.similarity import (
        cosine, embedding_near_duplicates, with_lsh_bucket,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(6, 64))
    base[1] = base[0] + 0.001          # a planted near-dup pair
    rows, vid = [], 0
    for i in range(len(base)):
        for _ in range(3 + i % 2):     # 3-4 exact copies each
            rows.append((vid, [float(x) for x in base[i]]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    got = sorted(
        tuple(r) for r in embedding_near_duplicates(emb, threshold=0.98)
        .collect()
    )

    e = with_lsh_bucket(emb, 64, 8, "embedding")
    left = e.select(F2.col("vec_id").alias("a"),
                    F2.col("embedding").alias("va"), "bucket")
    probes = F2.array(
        F2.col("bucket"),
        *[F2.col("bucket").bitwiseXOR(F2.lit(2 ** p)) for p in range(8)],
    )
    right = e.withColumn("probe", F2.explode(probes)).select(
        F2.col("vec_id").alias("b"), F2.col("embedding").alias("vb"),
        "probe",
    )
    want = sorted(tuple(r) for r in (
        left.join(right, (F2.col("bucket") == F2.col("probe"))
                  & (F2.col("a") < F2.col("b")))
        .dropDuplicates(["a", "b"])
        .withColumn("cos", cosine(F2.col("va"), F2.col("vb")))
        .where(F2.col("cos") >= 0.98)
        .select("a", "b", F2.round("cos", 6).alias("cosine"))
    ).collect())
    assert got == want
    # both legs fired: exact-copy pairs (within, cosine rounds to 1.0)
    # and the planted near-dup pair across distinct vectors (cross)
    assert any(c == 1.0 for _, _, c in got)
    assert any(c < 1.0 for _, _, c in got)


# ---------------------------------------------------------------------------
# round-12: MinHash near-dup family quotient (pairs + clusters)

# Two near-dup families (drop-last-word variants: word-trigram jaccard
# ~0.9 across distinct texts), one isolated shingleable clique, and an
# UNSHINGLEABLE (<3 words) text with 3 copies that must stay invisible
# to both formulations (no signature doc-level; nonempty-gated in the
# quotient).  Every distinct text has >= 3 copies so the expansion legs
# do real work.
_MH_BASE_A = ("the quick brown fox jumps over the lazy dog near the "
              "river bank today")
_MH_BASE_B = ("pack my box with five dozen liquor jugs before the "
              "long winter night falls")
_MH_TEXTS = [
    _MH_BASE_A,
    _MH_BASE_A.rsplit(" ", 1)[0],       # near-dup of A (j ~ 0.92)
    _MH_BASE_B,
    _MH_BASE_B.rsplit(" ", 1)[0],       # near-dup of B
    "isolated clique sentence with enough words to shingle cleanly",
    "tiny doc",                          # unshingleable, 3 copies
]
_MH_COPIES = [3, 3, 3, 4, 4, 3]


@pytest.fixture(scope="module")
def mh_dup_docs(spark):
    rows, doc_id = [], 0
    for text, n in zip(_MH_TEXTS, _MH_COPIES):
        for _ in range(n):
            rows.append((doc_id, text))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _definitional_minhash_pairs(docs, threshold=0.5):
    """minhash_near_duplicates written out at DOC level, no quotient —
    verbatim the pre-round-12 implementation (signatures for every doc,
    banded candidates over all docs, corpus-centric verify)."""
    sigs = dedup.minhash_signatures(docs)
    cands = dedup.lsh_candidate_pairs(sigs)
    return dedup.jaccard_pairs(docs, cands, pairs_small=False).where(
        F.col("jaccard") >= 0.5
    )


def test_minhash_quotient_equals_doc_level_definition(spark, mh_dup_docs):
    got = sorted(
        tuple(r) for r in
        dedup.minhash_near_duplicates(mh_dup_docs, threshold=0.5).collect()
    )
    want = sorted(
        tuple(r) for r in
        _definitional_minhash_pairs(mh_dup_docs).collect()
    )
    assert got == want
    # both expansion legs fire: exact-copy pairs at 1.0 AND cross-text
    # near-dup pairs strictly below 1.0
    js = {j for _, _, j in got}
    assert 1.0 in js and js - {1.0}, js
    # the unshingleable 3-copy group contributes nothing
    tiny_ids = {r[0] for r in mh_dup_docs.where(
        F.col("text") == "tiny doc").collect()}
    assert not any(a in tiny_ids or b in tiny_ids for a, b, _ in got)


def test_minhash_cluster_quotient_equals_doc_level_definition(
    spark, mh_dup_docs
):
    got = sorted(
        tuple(r) for r in
        dedup.minhash_text_clusters(mh_dup_docs, threshold=0.5).collect()
    )
    doc_pairs = _definitional_minhash_pairs(mh_dup_docs).select("a", "b")
    want = sorted(
        tuple(r) for r in clustering.dedup_clusters(doc_pairs).collect()
    )
    assert got == want
    # fixture sanity: the two near-dup families merge across texts and
    # the isolated clique clusters on the self-loop alone
    n_clusters = len({c for _, c in got})
    assert n_clusters == 3, got
