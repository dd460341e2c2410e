"""Deduplication operators for the training-data tier: exact, n-gram
Jaccard, MinHash+LSH, SimHash.  (BASELINE.json north star; no analog in
the reference, which dedups only by primary key — transform.py:193.)

Design for 100 TB:

- Exact dedup is a hash-groupBy on a fingerprint — one shuffle keyed by
  md5, no full-text comparison ever crosses the wire.
- MinHash+LSH: per-doc signatures are computed in one pass (explode
  shingles -> k min-aggregations, map-side combined); candidate pairs
  come from an equi-join on (band_id, band_hash) — i.e. a shuffle keyed
  by tiny band buckets instead of an O(n²) cross join.  Verification
  (exact Jaccard) runs only on candidates.
- SimHash: 64 per-bit weighted sums in a single hash-aggregate;
  near-dup candidates join on 16-bit chunks (Hamming<=3 ⇒ at least one
  of 4 chunks equal — pigeonhole), again avoiding n².
- Everything is built-in expressions (xxhash64, explode, groupBy);
  nothing row-at-a-time in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from busdata_pipeline_spark.functions.text import fingerprint

# ---------------------------------------------------------------------------
# parallelism guard

def fanout(df: DataFrame, key: str, min_bytes: int = 0) -> DataFrame:
    """Ensure at least defaultParallelism partitions before CPU-heavy
    per-row work (shingle explode, k hash functions).

    A small single-file parquet source arrives as ONE input partition and
    would serialize the whole signature computation on one core (measured
    4-6 s for 5k docs at sf0.1).  At real scale the source already has
    thousands of partitions and this is a no-op — the repartition only
    fires when the input is UNDER-partitioned, so it never shrinks or
    reshuffles big data.

    ``min_bytes`` (round-13, VERDICT r12 #4): additionally skip the
    repartition when the OPTIMIZER-ESTIMATED input is below this size —
    for cheap-per-byte kernels (the BLAS cosine scorer) a sub-second
    single-partition input cannot repay a fixed shuffle, while a large
    single-partition input at scale still fans out.  0 (the default)
    keeps the pure partition-count guard for expensive-per-byte work
    (shingle explosion, k hash functions), where even a few MB of text
    serializes seconds of compute on one core."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if min_bytes:
        est = int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ))
        if est < min_bytes:
            return df
    return df.repartition(target, F.col(key))


# ---------------------------------------------------------------------------
# shingling

def with_shingles(docs: DataFrame, n: int = 3,
                  text_col: str = "text") -> DataFrame:
    """Word n-gram shingle set per document (distinct), as an array column.
    Pure array algebra: split -> positional transform -> distinct.

    The words array is materialized as its own column first so the
    document is split ONCE per row; inlining the split into the transform
    lambda re-tokenizes the full text per shingle — O(len²) per document
    (measured ~2× on the signature stage at sf0.1)."""
    base = docs.withColumn("_words", F.split(F.trim(F.col(text_col)), " "))
    grams = F.expr(
        f"transform(sequence(0, size(_words) - {n}), "
        f"i -> concat_ws(' ', slice(_words, i + 1, {n})))"
    )
    # guard: < n words -> empty shingle set (Spark's sequence(0, neg)
    # would count DOWN, not produce an empty array)
    safe = F.when(F.size("_words") >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
    return (
        base.withColumn("shingles", safe)
        .withColumn("n_words", F.size("_words"))
        .drop("_words")
    )


# ---------------------------------------------------------------------------
# exact

def exact_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row summary: total docs, distinct fingerprints, dupes."""
    return docs.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct(fingerprint(text_col)).alias("distinct_docs"),
        (F.count(F.lit(1)) - F.countDistinct(fingerprint(text_col))).alias("duplicate_docs"),
    )


def drop_exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative of each fingerprint class.
    (row_number over the fingerprint, not dropDuplicates, so the survivor
    is deterministic.)"""
    from pyspark.sql import Window

    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH

def minhash_signatures(docs: DataFrame, k: int = 32,
                       id_col: str = "doc_id",
                       shingles_ready: bool = False) -> DataFrame:
    """k-permutation MinHash signature per doc.

    Two-level hashing: ONE base string hash per shingle
    (h0 = xxhash64(s, 0)), then k derived functions h_i = xxhash64(h0,
    i) over the fixed 8-byte long — the variable-length string is walked
    once instead of k times, and the k re-hashes are constant-width.
    (The natural h1 + i*h2 Kirsch–Mitzenmacher form is off the table:
    Spark 4 runs ANSI mode, where the intended 64-bit wrap-around is an
    overflow error.)  Same independence class for MinHash purposes — the
    ground-truth recall tests pin behavior.  signature[i] = min over
    shingles; one explode + one groupBy with k min() aggregates —
    map-side partial mins keep the shuffle at k longs per doc.
    """
    # explode_outer, not explode: plain explode adds an implicit
    # size(shingles) > 0 pre-filter that Catalyst pushes BELOW the fanout
    # exchange, re-evaluating the whole shingle expression on the (single)
    # input partition — serializing exactly the work the fanout exists to
    # spread.  The outer variant has no pre-filter; the null rows from
    # empty shingle sets are dropped on the generator OUTPUT, which no
    # rule can push below the exchange.  (Measured 3.2s -> 0.6s at sf0.1.)
    # ``shingles_ready``: the caller materialized the distinct shingle
    # array (the checkpointed rep tables) — explode it directly instead
    # of re-running the shingle HOF chain (round-12; scan-level
    # subtrees have no reuse mechanism, only exchanges do).
    base = fanout(docs, id_col)
    if not shingles_ready:
        base = with_shingles(base)
    exploded = (
        base
        .select(id_col, F.explode_outer("shingles").alias("shingle"))
        .where(F.col("shingle").isNotNull())
        .select(
            id_col,
            F.xxhash64(F.col("shingle"), F.lit(0)).alias("_h0"),
        )
    )
    aggs = [
        F.min(F.xxhash64(F.col("_h0"), F.lit(i))).alias(f"mh_{i}")
        for i in range(k)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[f"mh_{i}" for i in range(k)]).alias("signature")
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 8,
                        id_col: str = "doc_id") -> DataFrame:
    """Banded LSH: split the k-length signature into ``bands`` rows of
    length k/bands, hash each band, and self-join on (band, hash).
    Returns distinct candidate (a, b) pairs with a < b."""
    banded = signatures.select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"xxhash64(concat_ws(',', slice(signature, b * (size(signature) div {bands}) + 1, "
                f"size(signature) div {bands})), b))"
            )
        ).alias("band", "band_hash"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, pairs: DataFrame, n: int = 3,
                  id_col: str = "doc_id",
                  pairs_small: bool = True,
                  carry: tuple = (),
                  shingles_ready: bool = False) -> DataFrame:
    """Exact word-n-gram Jaccard for given (a, b) pairs — the verify
    stage after LSH candidate generation.

    Two physical strategies, chosen by the caller's knowledge of the
    pair-set cardinality (Catalyst can't know it statically):

    - ``pairs_small=True`` (LSH candidates — a vanishing fraction of the
      corpus, that's the point of LSH): pair-centric.  The pair set
      picks up each side's text via two broadcast hash joins and the
      shingle expression runs on the joined candidate rows — never as a
      full-corpus pass.  ``pairs`` is consumed exactly once (its
      signature+LSH lineage executes once); the corpus is touched by two
      pruned-column scans probing broadcast tables: no shuffle at all.
    - ``pairs_small=False`` (pair set ~ corpus-sized, e.g. a linear
      neighbor chain): corpus-centric.  Shingles are computed once per
      doc in a full parallel pass and the joins shuffle on the pair
      keys — broadcasting corpus-scale texts would OOM an executor at
      real scale and serializes locally.

    ``carry`` names extra ``pairs`` columns to thread through to the
    output unchanged.  Callers that need pair-level context after the
    verify (e.g. the quotient expansions' text-hash keys) would
    otherwise re-join the verified pairs back to ``pairs`` — and since
    the candidate DataFrame is unpersisted lineage, that re-join
    EXECUTES the banded-join/distinct lineage a second time.
    """
    if pairs_small:
        texts = docs.select(F.col(id_col), F.col("text"))
        with_a = F.broadcast(pairs.select("a", "b", *carry)).join(
            texts.select(F.col(id_col).alias("a"),
                         F.col("text").alias("_text_a")),
            "a",
        )
        both = F.broadcast(with_a).join(
            texts.select(F.col(id_col).alias("b"),
                         F.col("text").alias("_text_b")),
            "b",
        )
        sh = with_shingles(
            with_shingles(both, n=n, text_col="_text_a")
            .withColumnRenamed("shingles", "sh_a").drop("n_words"),
            n=n, text_col="_text_b",
        ).withColumnRenamed("shingles", "sh_b").drop("n_words")
    else:
        shc = fanout(docs, id_col)
        if not shingles_ready:  # pre-shingled rep tables skip the HOF
            shc = with_shingles(shc, n=n)
        shc = shc.select(F.col(id_col), F.col("shingles"))
        a = shc.select(F.col(id_col).alias("a"),
                       F.col("shingles").alias("sh_a"))
        b = shc.select(F.col(id_col).alias("b"),
                       F.col("shingles").alias("sh_b"))
        sh = pairs.select("a", "b", *carry).join(a, "a").join(b, "b")
    # |A ∪ B| = |A| + |B| - |A ∩ B| (shingle arrays are distinct by
    # construction) — same exact integers as materializing the union
    # array, without building it.
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return sh.select("a", "b", *carry,
                     F.round(inter / union, 6).alias("jaccard"))


def _minhash_rep_pairs(docs: DataFrame, threshold: float, k: int,
                       bands: int, id_col: str):
    """Shared quotient core for the MinHash near-dup family: the LSH +
    verify kernel runs once per DISTINCT trimmed text (rep = the text's
    minimum member doc id).  Returns (hdocs, reps, rep_pairs, nonempty):
    (id, text-hash) map, checkpointed rep table (id, h, cnt, shingles —
    the distinct shingle array materialized once for every downstream
    consumer), verified rep pairs at >= threshold, and the shingleable
    text-hash set.  Exactness: ``with_shingles`` trims before splitting, so
    identical TRIM(text) implies identical shingles, signature, bands,
    and jaccard — a rep's verdict holds for every member, and docs with
    empty shingle sets never acquire a signature on either formulation.
    """
    th = F.md5(F.trim("text"))
    hdocs = docs.select(F.col(id_col), th.alias("h"))
    # eager localCheckpoint: the rep table (one row per DISTINCT text,
    # bounded by corpus diversity) feeds signatures, the verify's
    # shingle passes, the shingleability gate, and the expansion maps.
    # Round-12: the checkpoint materializes the DISTINCT SHINGLE ARRAY
    # instead of the text — the signature pass, the verify's two
    # shingle derivations, and the shingleability gate each re-ran the
    # shingle HOF chain otherwise (scan-level subtrees have no reuse
    # mechanism, only exchanges do); exploding a materialized array is
    # a plain generator over checkpointed rows, and the arrays replace
    # the text bytes rather than adding to them.
    reps = (
        with_shingles(
            hdocs.groupBy("h").agg(
                F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("cnt")
            )
            .join(docs.select(id_col, "text"), id_col)
        )
        .select(id_col, "h", "cnt", "shingles")
        .localCheckpoint(eager=True)
    )
    sigs = minhash_signatures(reps, k=k, id_col=id_col, shingles_ready=True)
    cands = lsh_candidate_pairs(sigs, bands=bands, id_col=id_col)
    rep_pairs = jaccard_pairs(
        reps, cands, id_col=id_col, pairs_small=False, shingles_ready=True
    ).where(F.col("jaccard") >= threshold)
    nonempty = (
        reps.where(F.size("shingles") > 0)
        .select("h", F.col(id_col).alias("rid"), "cnt")
    )
    return hdocs, reps, rep_pairs, nonempty


def minhash_near_duplicates(docs: DataFrame, threshold: float = 0.7,
                            k: int = 32, bands: int = 8,
                            id_col: str = "doc_id") -> DataFrame:
    """Full near-dup pipeline: signatures -> banded candidates -> exact
    Jaccard verify -> pairs over threshold.

    Round-12 (ORACLES.md rule 16, engine-side — the same quotient the
    family's oracles already state): the whole kernel runs once per
    DISTINCT trimmed text and verdicts expand back to doc pairs.
    Same-text pairs are exactly 1.0 when the text is shingleable (the
    doc-level formulation produced the identical 1.0 via identical
    shingle arrays, and dropped unshingleable pairs via the 0/0-null
    verify — mirrored here by the nonempty gate); cross-text verdicts
    are functions of the text pair alone.  Pre-quotient, candidates and
    the verify shuffle scale with text replication SQUARED: the 100x
    replica (100 copies of every text) measured 150 s in the ladder
    bench, while distinct-text candidates are bounded by corpus
    diversity.

    The rep-level verify keeps the corpus-centric (shuffle) strategy,
    NOT the broadcast pair-centric one: rep-pair cardinality scales
    with the corpus's true near-dup density among DISTINCT texts, which
    the engine cannot know statically — broadcasting a dense rep-pair
    set risks an executor OOM, while the shuffle plan's worst case is
    two extra shingle passes over the (diversity-bounded) rep table.
    """
    hdocs, reps, rep_pairs, nonempty = _minhash_rep_pairs(
        docs, threshold, k, bands, id_col
    )
    rep_h = reps.select(F.col(id_col).alias("rid"), "h")
    rp_h = (
        rep_pairs
        .join(rep_h.withColumnRenamed("rid", "a")
              .withColumnRenamed("h", "ha"), "a")
        .join(rep_h.withColumnRenamed("rid", "b")
              .withColumnRenamed("h", "hb"), "b")
        .select("ha", "hb", "jaccard")
    )
    # symmetrize in ONE pass (no self-union: it would re-execute the
    # rep-pair kernel lineage — same finding as the setsim kernel)
    sym = rp_h.select(
        F.explode(F.array(
            F.struct(F.col("ha"), F.col("hb"), F.col("jaccard")),
            F.struct(F.col("hb").alias("ha"), F.col("ha").alias("hb"),
                     F.col("jaccard")),
        )).alias("s")
    ).select("s.ha", "s.hb", "s.jaccard")
    xa, xb = hdocs.alias("xa"), hdocs.alias("xb")
    within = (
        xa.join(F.broadcast(nonempty.select("h")), "h")
        .join(xb, (F.col("xa.h") == F.col("xb.h"))
              & (F.col(f"xa.{id_col}") < F.col(f"xb.{id_col}")))
        .select(F.col(f"xa.{id_col}").alias("a"),
                F.col(f"xb.{id_col}").alias("b"),
                F.lit(1.0).alias("jaccard"))
    )
    cross = (
        sym.join(xa, F.col("xa.h") == F.col("ha"))
        .join(xb, (F.col("xb.h") == F.col("hb"))
              & (F.col(f"xb.{id_col}") > F.col(f"xa.{id_col}")))
        .select(F.col(f"xa.{id_col}").alias("a"),
                F.col(f"xb.{id_col}").alias("b"), "jaccard")
    )
    return within.unionByName(cross)


def minhash_text_clusters(docs: DataFrame, threshold: float = 0.7,
                          k: int = 32, bands: int = 8,
                          id_col: str = "doc_id") -> DataFrame:
    """Near-dup connected components as (doc_id, cluster_id), computed
    on the DISTINCT-text quotient graph (ORACLES.md rule 16 — the
    formulation the family's ``_CLUSTER_CTE`` oracles already state,
    and the rel_entity_resolution engine already uses for names).

    Equivalent to ``dedup_clusters(minhash_near_duplicates(docs))``
    but label propagation runs over one vertex per distinct text (plus
    a clique self-loop for shingleable multi-member texts) instead of
    one per document — at the 100x replica that is a ~5k-vertex graph
    instead of ~25M doc-level edges.  cluster_id is exact: the rep id
    is each text's MINIMUM member doc id, so the component-min rep id
    IS the component-wide minimum doc id."""
    from busdata_pipeline_spark.operators.clustering import (
        connected_components,
    )

    hdocs, reps, rep_pairs, nonempty = _minhash_rep_pairs(
        docs, threshold, k, bands, id_col
    )
    loops = nonempty.where(F.col("cnt") >= 2).select(
        F.col("rid").alias("a"), F.col("rid").alias("b")
    )
    edges = rep_pairs.select("a", "b").unionByName(loops)
    rep_clusters = connected_components(edges).select(
        F.col("id").alias("rid"), F.col("component").alias("cluster_id")
    )
    rep_h = reps.select(F.col(id_col).alias("rid"), "h")
    return (
        hdocs.join(rep_h.join(rep_clusters, "rid").select("h", "cluster_id"),
                   "h")
        .select(F.col(id_col).alias("doc_id"), "cluster_id")
    )


# ---------------------------------------------------------------------------
# SimHash

def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", portable: bool = False) -> DataFrame:
    """SimHash over word tokens: bit b of the hash of each token votes
    +1/-1; the sign of the per-bit sum forms the output bit.  Implemented
    as per-bit conditional-sum aggregates in ONE hash aggregate — no UDF,
    no per-row Python.

    ``portable=False`` (the scale default) hashes tokens with xxhash64
    and emits 64 bits.  ``portable=True`` hashes with the first 15 hex
    digits of md5 (a 60-bit hash both Spark and DuckDB can compute
    identically — ``conv(substr(md5(tok),1,15),16,10)`` here,
    ``('0x' || substr(md5(tok),1,15))::UBIGINT`` there) and emits 60
    bits, which makes the full pipeline SQL-oracle-checkable; md5 is
    marginally slower than xxhash64 but still JVM-side codegen.
    """
    nbits = 60 if portable else 64
    # explode_outer + output filter for the same pushdown reason as
    # minhash_signatures: keep the split below-exchange partition cheap.
    tok_hash = (
        F.conv(F.md5(F.col("tok")).substr(1, 15), 16, 10).cast("long")
        if portable else F.xxhash64("tok")
    )
    tokens = (
        fanout(docs, id_col)
        .select(
            id_col,
            F.explode_outer(F.split(F.trim(text_col), " ")).alias("tok"),
        )
        .where(F.col("tok").isNotNull())
        .withColumn("h", tok_hash)
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(nbits)
    ]
    per_doc = tokens.groupBy(id_col).agg(*votes)
    bit_terms = [
        F.when(F.col(f"v_{b}") > 0, F.lit(1).cast("long") * (2 ** b if b < 63 else -(2 ** 63)))
        .otherwise(0)
        for b in range(nbits)
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return per_doc.select(F.col(id_col), total.alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 3,
                            id_col: str = "doc_id",
                            portable: bool = False) -> DataFrame:
    """Near-dups by SimHash Hamming distance <= ``max_hamming``.

    Pigeonhole: split the hash into 4 chunks (16 bits each for the
    64-bit hash, 15 for the portable 60-bit one); distance <= 3 implies
    at least one chunk is identical, so candidates come from 4 equi-joins
    on (chunk_idx, chunk_value) instead of a cross join.
    """
    chunk_bits = 15 if portable else 16
    mask = (1 << chunk_bits) - 1
    sh = simhash64(docs, id_col=id_col, portable=portable)
    chunked = sh.select(
        id_col, "simhash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, 3), c -> shiftright(simhash, c * {chunk_bits}) & {mask})"
            )
        ).alias("chunk", "chunk_val"),
    )
    l, r = chunked.alias("l"), chunked.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.select("a", "b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy matching (edit distance)

def fuzzy_prefix_matches(docs: DataFrame, prefix_len: int = 12,
                         n_blocks: int = 3, max_dist: int = 2,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Fuzzy self-match on a normalized fixed-length prefix: candidate
    pairs share at least one of ``n_blocks`` aligned prefix blocks
    exactly (an equi-join on (block_index, block) — the edit-distance
    cousin of the SimHash chunk join), then verify
    ``levenshtein <= max_dist``.

    The *definition* includes the block condition, so the oracle states
    the same blocking + verify predicate — no probabilistic recall
    argument needed.  Scale: one shuffle keyed by tiny (index, block)
    buckets instead of O(n²); bucket skew (popular prefixes) is the
    classic blocking hazard and is AQE-skew-split at runtime.
    """
    nm = normalized_names(docs, prefix_len, id_col, text_col)
    pairs = fuzzy_nm_pairs(
        nm.sparkSession, nm, prefix_len, n_blocks, max_dist
    )
    # Expand distinct-name verdicts back to doc pairs (the round-11
    # quotient, ORACLES.md rule 16): identical names are dist 0 by
    # definition; a verified name pair applies to every member pair.
    # On duplicate-heavy data the blocked join + levenshtein run at
    # distinct-name size while only these expansion joins scale — at
    # the 100x replica this is the difference between ~580M verified
    # block collisions and ~5k.
    sym = pairs.unionByName(
        pairs.select(
            F.col("nb").alias("na"), F.col("na").alias("nb"), "dist"
        )
    )
    a, b = nm.alias("a"), nm.alias("b")
    within = (
        a.join(b, (F.col("a.nm") == F.col("b.nm"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("a"),
                F.col(f"b.{id_col}").alias("b"),
                F.lit(0).cast("int").alias("dist"))
    )
    x, y = nm.alias("x"), nm.alias("y")
    cross = (
        sym.join(x, F.col("x.nm") == F.col("na"))
        .join(y, (F.col("y.nm") == F.col("nb"))
              & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")))
        .select(F.col(f"x.{id_col}").alias("a"),
                F.col(f"y.{id_col}").alias("b"),
                F.col("dist").cast("int").alias("dist"))
    )
    return within.unionByName(cross)


def normalized_names(docs: DataFrame, prefix_len: int = 12,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, nm): the normalized fixed-length prefix key fuzzy blocking
    works on — lowercased, right-padded with '_' to ``prefix_len``."""
    return docs.select(
        F.col(id_col),
        F.rpad(F.lower(F.substring(text_col, 1, prefix_len)), prefix_len, "_")
         .alias("nm"),
    )


def fuzzy_nm_pairs(spark, nm: DataFrame, prefix_len: int = 12,
                   n_blocks: int = 3, max_dist: int = 2) -> DataFrame:
    """DISTINCT-name fuzzy matches: (na, nb, dist) with na's lowest
    member id < nb's — the quotient kernel shared by
    fuzzy_prefix_matches (which expands it to doc pairs) and entity
    resolution (which clusters it).  Blocking and the levenshtein
    verify run once per distinct name pair."""
    nmg = nm.groupBy("nm").agg(F.min(nm.columns[0]).alias("rep_id"))
    blk = prefix_len // n_blocks
    blocks = nmg.select(
        "nm", "rep_id",
        F.posexplode(
            F.array(*[
                F.substring("nm", 1 + i * blk, blk) for i in range(n_blocks)
            ])
        ).alias("blk_i", "blk"),
    )
    # Probe side pre-partitioned on the JOIN KEYS: a small corpus reads
    # as one parquet split, which would run every block-collision probe
    # — and its O(len²) levenshtein per candidate, the actual hot loop
    # (measured 1.2 s of the 1.5 s leg at sf0.1) — on a single task
    # under the broadcast join.  The EXPLICIT partition count keeps AQE
    # from coalescing the tiny row volume back to one task (the work
    # here scales with candidate pairs, not input rows, which AQE's
    # size-based coalescing cannot see); at scale — where the join is
    # sort-merge — this is the exchange ENSURE_REQUIREMENTS would insert
    # anyway, not an extra shuffle.
    n_tasks = spark.sparkContext.defaultParallelism
    a = blocks.repartition(n_tasks, "blk_i", "blk").alias("a")
    b = blocks.alias("b")
    # Verify INSIDE the join projection, before deduplicating: a pair
    # surfaces once per shared block (<= n_blocks), so levenshtein runs
    # up to n_blocks times on short fixed-width strings — cheap — while
    # the distinct then shuffles only the (rare) surviving matches
    # instead of every block-collision candidate.
    return (
        a.join(b, (F.col("a.blk_i") == F.col("b.blk_i"))
               & (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.rep_id") < F.col("b.rep_id")))
        .select(F.col("a.nm").alias("na"),
                F.col("b.nm").alias("nb"),
                F.levenshtein("a.nm", "b.nm").alias("dist"))
        .where(F.col("dist") <= max_dist)
        .distinct()
    )
