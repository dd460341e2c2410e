"""Sketch-based filtering and splitting: the probabilistic-structure
tier a 100 TB curation pipeline leans on when exact state is too big to
ship — plus the group-aware fold assignment that keeps cross-validation
leakage-free.

The reference has no sketch tier (its corpus fits PostgreSQL;
`/root/reference/analytic.sql` counts exactly); these four close the
gap between the exact operators (td_dedup_exact, td_contamination) and
what survives a 1000-executor deployment:

- ``td_bloom_prune`` — blocklist membership pruning through a
  CONSTANT-SIZE Bloom bitmap.  The broadcast is the m-bit bitmap
  (m/32 BIGINT words), not the blocklist itself, so the probe side
  stays O(m) no matter how many entries the blocklist holds — the
  Spark-native pattern behind runtime bloom-filter join pruning,
  surfaced as an operator with its false-positive rate measured
  against the exact semi-join.
- ``td_countmin`` — CountMin frequency sketch (depth x width counter
  grid, estimate = min over rows).  Point-queried for the corpus's
  top-20 tokens against exact counts; the one-sided error guarantee
  (estimate >= truth, always) is hash-checked row by row.
- ``td_random_projection`` — Johnson-Lindenstrauss sign projection of
  the embedding corpus (dim 64 -> 16) over the zero-copy ``mapInArrow``
  seam: one int64 GEMM per Arrow batch, no shuffle, no driver traffic.
  Output is the per-vector norm-preservation ratio, the quantity JL
  bounds promise to concentrate near 1.
- ``td_grouped_kfold`` — k-fold assignment at the SOURCE granularity
  (every doc of a source lands in the same fold), the grouped-CV split
  that prevents near-duplicate leakage across folds.

Cross-engine determinism: all randomness is the house 60-bit md5
prefix (``conv(substr(md5(x),1,15),16,10)`` here,
``('0x' || substr(md5(x),1,15))::UBIGINT`` in DuckDB — see
operators/dedup.py), all accumulation is integer-domain (quantized
micro-units for the projection), and floats appear only in final
ROUND(...,6) projections — the established bit-parity discipline.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from busdata_pipeline_spark.functions.hashing import DUCK_H60, h60
from busdata_pipeline_spark.operators import quantize
from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table


# Shared house hash (functions/hashing.py) — local aliases keep the
# module's call sites unchanged.
_h60 = h60
_DUCK_H60 = DUCK_H60


# ---------------------------------------------------------------------------
# Bloom-filter blocklist pruning

# Bitmap width is an import-time knob mirrored into the oracle (the
# td_knn_graph pattern): production sizes m ≈ 1.44·k·n/ln2 bits from the
# blocklist count n for a target false-positive rate, so the scale
# ladder grows SPARK_GRAFT_BLOOM_WORDS with the corpus while the sf0.01
# correctness gate stays at the default 8 words (256 bits — small
# enough that the sketch actually produces false positives to measure).
_BLOOM_WORDS = int(os.environ.get("SPARK_GRAFT_BLOOM_WORDS", "8"))
_BLOOM_BITS = _BLOOM_WORDS * 32
_BLOOM_K = 5


@query(
    "td_bloom_prune",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         {_DUCK_H60.format(x="CAST(doc_id AS VARCHAR)")} AS h0,
         {_DUCK_H60.format(x="'s:' || CAST(doc_id AS VARCHAR)")} AS h1,
         doc_id % 7 = 0 AS is_block
  FROM documents),
probes AS (
  SELECT doc_id, is_block,
         (h0 + t.i * h1) % {_BLOOM_BITS} AS pos
  FROM keyed, range({_BLOOM_K}) t(i)),
slots AS (
  SELECT doc_id, is_block, pos // 32 AS w_idx,
         (CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS mask
  FROM probes),
words AS (
  SELECT w_idx, bit_or(mask) AS word
  FROM slots WHERE is_block GROUP BY w_idx),
tested AS (
  SELECT s.doc_id, s.is_block,
         CASE WHEN w.word IS NOT NULL AND (w.word & s.mask) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM slots s LEFT JOIN words w ON w.w_idx = s.w_idx),
per_doc AS (
  SELECT doc_id, is_block,
         SUM(hit) = {_BLOOM_K} AS bloom_pass
  FROM tested GROUP BY doc_id, is_block)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN is_block THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocklist,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_pass,
       CAST(SUM(CASE WHEN bloom_pass AND is_block THEN 1 ELSE 0 END)
         AS BIGINT) AS n_true_pos,
       CAST(SUM(CASE WHEN bloom_pass AND NOT is_block THEN 1 ELSE 0 END)
         AS BIGINT) AS n_false_pos
FROM per_doc
""",
)
def td_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pruning of a corpus scan against a blocklist (here:
    every 7th doc_id, standing in for a takedown / contamination list).

    k={_BLOOM_K} double-hashed probes (Kirsch-Mitzenmacher: pos_i =
    (h0 + i*h1) mod m) set bits in an m-bit bitmap stored as m/32
    BIGINT words via one ``bit_or`` aggregate; membership is an
    equi-join of each probe's word index against that constant-size
    word table (broadcast — the fact side never shuffles) requiring
    all k bits set.  Output: one audit row proving the Bloom contract
    — n_true_pos == n_blocklist (a Bloom filter has NO false
    negatives) and the measured false-positive count the exact
    semi-join would then discharge.

    At scale only the m-bit bitmap crosses the cluster; the blocklist
    itself (millions of entries at 100 TB) never does."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id",
        _h60(F.col("doc_id").cast("string")).alias("h0"),
        _h60(F.concat(F.lit("s:"), F.col("doc_id").cast("string"))).alias(
            "h1"
        ),
        (F.col("doc_id") % 7 == 0).alias("is_block"),
    )
    slots = keyed.select(
        "doc_id",
        "is_block",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_BLOOM_K - 1}), "
                f"i -> (h0 + i * h1) % {_BLOOM_BITS})"
            )
        ).alias("pos"),
    ).select(
        "doc_id",
        "is_block",
        F.expr("pos div 32").alias("w_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
            "mask"
        ),
    )
    words = (
        slots.where("is_block")
        .groupBy("w_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    tested = slots.join(F.broadcast(words), "w_idx", "left").select(
        "doc_id",
        "is_block",
        F.expr(
            "CASE WHEN word IS NOT NULL AND (word & mask) <> 0 "
            "THEN 1 ELSE 0 END"
        ).alias("hit"),
    )
    per_doc = tested.groupBy("doc_id", "is_block").agg(
        (F.sum("hit") == _BLOOM_K).alias("bloom_pass")
    )
    blk = F.col("is_block")
    ok = F.col("bloom_pass")
    return per_doc.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(blk, 1).otherwise(0)).alias("n_blocklist"),
        F.sum(F.when(ok, 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(F.when(ok & blk, 1).otherwise(0)).alias("n_true_pos"),
        F.sum(F.when(ok & ~blk, 1).otherwise(0)).alias("n_false_pos"),
    )


# ---------------------------------------------------------------------------
# CountMin frequency sketch

_CMS_DEPTH = 4
_CMS_WIDTH = 512


@query(
    "td_countmin",
    oracle=f"""
WITH toks AS (
  SELECT tok FROM (
    SELECT unnest(string_split(TRIM(text), ' ')) AS tok FROM documents)
  WHERE tok <> ''),
counters AS (
  SELECT t.r,
         {_DUCK_H60.format(x="CAST(t.r AS VARCHAR) || ':' || tok")}
           % {_CMS_WIDTH} AS bucket,
         COUNT(*) AS cnt
  FROM toks, range({_CMS_DEPTH}) t(r)
  GROUP BY 1, 2),
exact AS (
  SELECT tok, COUNT(*) AS exact_tf
  FROM toks GROUP BY tok
  ORDER BY exact_tf DESC, tok LIMIT 20),
probes AS (
  SELECT e.tok, t.r,
         {_DUCK_H60.format(x="CAST(t.r AS VARCHAR) || ':' || e.tok")}
           % {_CMS_WIDTH} AS bucket
  FROM exact e, range({_CMS_DEPTH}) t(r)),
est AS (
  SELECT p.tok, MIN(c.cnt) AS cms_est
  FROM probes p JOIN counters c ON c.r = p.r AND c.bucket = p.bucket
  GROUP BY p.tok)
SELECT e.tok, e.exact_tf, s.cms_est,
       s.cms_est - e.exact_tf AS overcount
FROM exact e JOIN est s USING (tok)
ORDER BY e.exact_tf DESC, e.tok
""",
)
def td_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountMin sketch over the corpus token stream ({_CMS_DEPTH} rows x
    {_CMS_WIDTH} counters, independent per-row salted hashes), point-
    queried for the exact top-20 tokens.  The whole sketch is one hash
    aggregate over (row, bucket) — at most depth*width counter rows
    regardless of corpus size, the property that lets a 100 TB stream
    keep its frequency state in a few KB per executor and merge by
    addition.  Output pins the CMS contract per token: estimate >=
    exact always (collisions only ADD), with the realized overcount.
    """
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
    )
    # Counter cell (r, bucket) sums the stream's occurrences landing
    # there; every occurrence of one token lands in the same bucket, so
    # summing per-distinct-token term frequencies is the identical
    # counter grid while paying the md5 salt 4x per DISTINCT token
    # instead of 4x per occurrence — and the tf aggregate is the same
    # subtree the exact top-20 branch scans (one shuffle, reused).
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_tf"))
    salted = tf.select(
        "tok",
        "exact_tf",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))).alias("r"),
    ).select(
        "exact_tf",
        "r",
        (
            _h60(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("tok")))
            % _CMS_WIDTH
        ).alias("bucket"),
    )
    counters = salted.groupBy("r", "bucket").agg(
        F.sum("exact_tf").alias("cnt")
    )
    exact = tf.orderBy(F.desc("exact_tf"), "tok").limit(20)
    probes = exact.select(
        "tok",
        "exact_tf",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))).alias("r"),
    ).select(
        "tok",
        "exact_tf",
        "r",
        (
            _h60(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("tok")))
            % _CMS_WIDTH
        ).alias("bucket"),
    )
    est = (
        F.broadcast(probes)
        .join(counters, ["r", "bucket"])
        .groupBy("tok", "exact_tf")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "tok",
        "exact_tf",
        "cms_est",
        (F.col("cms_est") - F.col("exact_tf")).alias("overcount"),
    ).orderBy(F.desc("exact_tf"), "tok")


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss sign random projection

_RP_OUT_DIM = 16
_RP_IN_DIM = 64


@query(
    "td_random_projection",
    oracle=f"""
WITH q AS (
  SELECT vec_id, t.j,
         CAST(FLOOR(CAST(embedding[t.j + 1] AS DOUBLE) * 1048576.0 + 0.5)
              AS BIGINT) AS qv
  FROM embeddings, range({_RP_IN_DIM}) t(j)),
signs AS (
  SELECT a.j, b.p,
         CASE WHEN {_DUCK_H60.format(
             x="CAST(a.j AS VARCHAR) || ',' || CAST(b.p AS VARCHAR)")}
              % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM range({_RP_IN_DIM}) a(j), range({_RP_OUT_DIM}) b(p)),
proj AS (
  SELECT q.vec_id, s.p, CAST(SUM(q.qv * s.s) AS BIGINT) AS pv
  FROM q JOIN signs s ON s.j = q.j
  GROUP BY q.vec_id, s.p),
norms AS (
  SELECT vec_id, CAST(SUM(pv * pv) AS BIGINT) AS sp2
  FROM proj GROUP BY vec_id),
orig AS (
  SELECT vec_id, CAST(SUM(qv * qv) AS BIGINT) AS sq2
  FROM q GROUP BY vec_id)
SELECT n.vec_id,
       CASE WHEN o.sq2 = 0 THEN NULL
            ELSE ROUND(sqrt(CAST(n.sp2 AS DOUBLE) / {_RP_OUT_DIM}.0)
                       / sqrt(CAST(o.sq2 AS DOUBLE)), 6) + 0.0
       END AS norm_ratio
FROM norms n JOIN orig o USING (vec_id)
ORDER BY n.vec_id
""",
)
def td_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL sign random projection of the embedding corpus (64 -> 16 dims,
    +-1 entries derived from the portable 60-bit md5 of "j,p") over the
    ``mapInArrow`` zero-copy seam: embeddings are quantized to 2^20
    micro-units and multiplied by the sign matrix as ONE int64 GEMM per
    Arrow batch — exact integer arithmetic, so the oracle's relational
    replay (explode x join x sum) lands on bit-identical sums.

    Output is the norm-preservation ratio ||Px|| / (sqrt(m)·||x||)
    per vector — the quantity the JL lemma concentrates near 1, i.e.
    the audit a pipeline runs before trusting the compressed vectors
    for near-dup / ANN work at 4x less memory.  No shuffle, no driver
    traffic; corpus-linear."""
    emb = table(spark, sf_dir, "embeddings")
    sig = quantize.sign_projection_signatures(
        emb, out_dim=_RP_OUT_DIM
    )
    return sig.select(
        "vec_id",
        F.when(F.col("sq2") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.sqrt(F.col("sp2") / F.lit(float(_RP_OUT_DIM)))
                / F.sqrt(F.col("sq2").cast("double")),
                6,
            )
        )
        .alias("norm_ratio"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Group-aware k-fold assignment

_KFOLD = 5


@query(
    "td_grouped_kfold",
    oracle=f"""
SELECT {_DUCK_H60.format(x="source")} % {_KFOLD} AS fold,
       COUNT(DISTINCT source) AS n_sources,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
ORDER BY fold
""",
)
def td_grouped_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware k-fold split: fold = h60(source) mod {_KFOLD}, so
    every document of a source lands in the same fold — the grouped
    cross-validation discipline that keeps near-identical docs (same
    crawl domain, same template) from straddling a train/eval boundary.
    Deterministic, stateless, one hash aggregate; at 100 TB the fold
    column is a free projection, not a shuffle."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            (_h60(F.col("source")) % _KFOLD).alias("fold"),
            "source",
            "n_chars",
        )
        .groupBy("fold")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# bottom-k (KMV) uniform sample

_BOTTOMK = 50


@query(
    "td_bottomk_sample",
    oracle=f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS INT) AS rank,
       doc_id, lang, n_chars
FROM (
  SELECT doc_id, lang, n_chars,
         {_DUCK_H60.format(x="CAST(doc_id AS VARCHAR)")} AS h
  FROM documents)
ORDER BY h, doc_id
LIMIT {_BOTTOMK}
""",
)
def td_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) uniform sample: the {_BOTTOMK} docs with the
    smallest 60-bit hash of their id.  Unlike LIMIT or Bernoulli
    sampling this is MERGEABLE and CONSISTENT — bottom-k of a union is
    the bottom-k of the merged partial bottom-ks (Spark's
    TakeOrderedAndProject computes exactly that: per-partition top-k,
    then a k-row driver merge — no full sort, no shuffle of the
    corpus), and the same doc set is chosen no matter how the corpus
    is partitioned or which day's increment arrived last.  The k-th
    smallest hash doubles as the KMV distinct-count estimator
    ((k-1)·2^60/h_k — asserted in tests/test_sketch_filters.py).
    The fixed-size uniform sample is what quality-audit / eval-holdout
    tooling reads instead of scanning 100 TB."""
    docs = table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        _h60(F.col("doc_id").cast("string")).alias("h"),
    )
    from pyspark.sql import Window

    win = Window.orderBy("h", "doc_id")
    return (
        hashed.orderBy("h", "doc_id")
        .limit(_BOTTOMK)
        .select(
            F.row_number().over(win).alias("rank"),
            "doc_id",
            "lang",
            "n_chars",
        )
    )


# ---------------------------------------------------------------------------
# winsorized robust stats (quality-filter calibration)

@query(
    "td_winsorized_stats",
    # p95 by EXPLICIT order statistic (value at row ceil(0.95*n) of the
    # ascending sort) — not quantile_disc/percentile, whose index
    # conventions differ between engines.
    oracle="""
WITH ranked AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents),
p AS (
  SELECT lang, MAX(n) AS n_docs,
         MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT)
                  THEN n_chars END) AS p95_chars
  FROM ranked GROUP BY lang)
SELECT d.lang, p.n_docs, p.p95_chars,
       ROUND(CAST(SUM(LEAST(d.n_chars, p.p95_chars)) AS DOUBLE)
             / COUNT(*), 6) + 0.0 AS win_mean_chars
FROM documents d JOIN p ON p.lang = d.lang
GROUP BY d.lang, p.n_docs, p.p95_chars
ORDER BY d.lang
""",
)
def td_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized corpus length stats per language: the p95 order
    statistic (explicit row-at-ceil(0.95·n) of the ascending sort — an
    index convention both engines replay identically, unlike their
    quantile built-ins) and the mean with the upper tail clipped to it.
    This is the robust calibration read a quality-filter tier does
    before setting length cutoffs — outlier docs (concatenated crawls,
    binary spills) would otherwise drag a plain mean.

    Scale shape: one window sort per language partition + two hash
    aggregates; the per-lang p95 table is dimension-sized and
    broadcast back onto the corpus for the clip."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select("lang", "n_chars")
    w = Window.partitionBy("lang").orderBy("n_chars")
    cw = Window.partitionBy("lang")
    ranked = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("n"),
    )
    p = ranked.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.95) * F.col("n")).cast("long"),
                F.col("n_chars"),
            )
        ).alias("p95_chars"),
    )
    return (
        docs.join(F.broadcast(p), "lang")
        .groupBy("lang", "n_docs", "p95_chars")
        .agg(
            F.round(
                F.sum(F.least(F.col("n_chars"), F.col("p95_chars"))).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("win_mean_chars")
        )
        .select("lang", "n_docs", "p95_chars", "win_mean_chars")
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (release-compliance tier)

_KANON = 5


@query(
    "td_k_anonymity",
    oracle=f"""
WITH qi AS (
  SELECT lang, source, COUNT(*) AS group_n
  FROM documents GROUP BY lang, source),
flag AS (
  SELECT group_n, group_n < {_KANON} AS violating FROM qi)
SELECT CAST(SUM(CASE WHEN violating THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(SUM(CASE WHEN violating THEN group_n ELSE 0 END) AS BIGINT)
         AS n_exposed_docs,
       COUNT(*) AS n_groups,
       CAST(MIN(group_n) AS BIGINT) AS min_group_size
FROM flag
""",
)
def td_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the corpus's quasi-identifier tuple
    (lang, source): a released dataset is k-anonymous iff every
    quasi-identifier group holds >= k rows — groups below k={_KANON}
    re-identify their members by attribute intersection alone.  Output
    is the one-row release gate: violating-group count, exposed-row
    count, total groups, smallest group.  The check the PII-redaction
    tier (td_pii_redact) runs AFTER masking direct identifiers, since
    quasi-identifiers are what masking does not touch.

    Scale shape: one hash aggregate on the quasi-identifier key + one
    scalar re-aggregate of the (dimension-sized) group table."""
    docs = table(spark, sf_dir, "documents")
    qi = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("group_n")
    )
    v = F.col("group_n") < _KANON
    return qi.groupBy().agg(
        F.sum(F.when(v, 1).otherwise(0)).alias("n_violating_groups"),
        F.sum(F.when(v, F.col("group_n")).otherwise(0)).alias(
            "n_exposed_docs"
        ),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_n").alias("min_group_size"),
    )


@query(
    "td_dp_laplace_release",
    # ε-differential-privacy Laplace mechanism over the (lang, source)
    # release that td_k_anonymity audits: noise = -b·sgn(u-½)·ln(1-2|u-½|)
    # (the Laplace inverse-CDF), u derived from the 60-bit md5 hash of
    # the group key so the release is REPLAYABLE and both engines add
    # the identical noise.  Hash-derived noise is the deterministic-
    # pipeline variant, not cryptographic DP — the sampling seam is the
    # one line computing u (documented swap point for production).
    oracle=f"""
WITH g AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_true
  FROM documents GROUP BY lang, source),
u AS (
  SELECT lang, source, n_true,
    CAST({_DUCK_H60.format(
        x="coalesce(lang, '<NULL>') || '|' || coalesce(source, '<NULL>')"
    )} % 999998 + 1
         AS DOUBLE) / 1000000.0 AS u
  FROM g)
SELECT lang, source, n_true,
  CAST(1.0 AS DOUBLE) AS epsilon,
  ROUND(-(sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))), 6) AS noise,
  ROUND(CAST(n_true AS DOUBLE)
        + -(sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))), 6) AS n_released
FROM u ORDER BY lang, source
""",
)
def td_dp_laplace_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP Laplace count release for the (lang, source) corpus
    breakdown — the privacy-preserving publication step after
    td_pii_redact masks direct identifiers and td_k_anonymity audits
    quasi-identifiers: each released count gets Laplace(1/ε) noise
    (ε=1, sensitivity 1 for counting queries).  Noise comes from the
    Laplace inverse-CDF applied to u ∈ [1e-6, 0.999998] derived from
    the group key's md5 — deterministic and replayable (the established
    hash-as-RNG discipline; u's derivation is the single documented
    seam to swap for real randomness in production).  One hash
    aggregate over the corpus, then O(groups) scalar math — the
    mechanism costs nothing at any scale."""
    docs = table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    # NULL-safe key hash: concat_ws SKIPS nulls while DuckDB's ||
    # propagates them, so both sides coalesce each key column to the
    # same sentinel before concatenation (ADVICE r8) — a NULL lang or
    # source gets identical noise on both engines.
    key = F.concat_ws(
        "|",
        F.coalesce(F.col("lang"), F.lit("<NULL>")),
        F.coalesce(F.col("source"), F.lit("<NULL>")),
    )
    u = (
        (_h60(key) % 999998 + 1).cast("double") / F.lit(1000000.0)
    )
    noise = -(
        F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return g.select(
        "lang",
        "source",
        "n_true",
        F.lit(1.0).alias("epsilon"),
        F.round(noise, 6).alias("noise"),
        F.round(F.col("n_true").cast("double") + noise, 6).alias(
            "n_released"
        ),
    ).orderBy("lang", "source")


@query(
    "td_embed_whitening",
    # Whitening fit for the embedding space: per-dimension mean/std
    # from 2^20-quantized BIGINT moments (the td_random_projection
    # quantization), sums combined in DOUBLE only at the closed form
    # (the rel_autocorr_daily overflow lesson).  The transform these
    # stats define (x-mean)/std is the standard retrieval preprocessing
    # before cosine ANN.
    oracle="""
WITH q AS (
  SELECT t.j,
         CAST(FLOOR(CAST(embedding[t.j + 1] AS DOUBLE) * 1048576.0 + 0.5)
              AS BIGINT) AS qv
  FROM embeddings, range(64) t(j)),
m AS (
  SELECT j, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qv) AS BIGINT) AS sx,
         CAST(SUM(qv * qv) AS BIGINT) AS sxx
  FROM q GROUP BY j)
SELECT CAST(j AS INTEGER) AS dim, n,
  ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0, 6) AS mean,
  ROUND(sqrt(((CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE))
              / CAST(n - 1 AS DOUBLE))
             / (1048576.0 * 1048576.0)), 6) AS std
FROM m ORDER BY dim
""",
)
def td_embed_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitening-transform fit over the embedding corpus: per-dimension
    mean and std — the (x-mean)/std preprocessing that removes the
    anisotropy hurting cosine retrieval (Su et al. 2021's whitening
    trick, the diagonal variant).  One posexplode pass + a 64-group
    hash aggregate: map-side combinable, corpus-linear, no shuffle
    beyond the 64-key exchange.  Values quantize to 2^20 BIGINT units
    per element so the moment sums are exact; the mean/std closed form
    combines the exact sums in DOUBLE with the identical op order on
    both engines."""
    e = table(spark, sf_dir, "embeddings")
    q = e.select(F.posexplode("embedding").alias("j", "v")).select(
        "j",
        F.floor(F.col("v").cast("double") * F.lit(1048576.0) + F.lit(0.5))
        .cast("long")
        .alias("qv"),
    )
    m = q.groupBy("j").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qv").cast("long").alias("sx"),
        F.sum(F.col("qv") * F.col("qv")).cast("long").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    return m.select(
        F.col("j").cast("int").alias("dim"),
        "n",
        F.round(sxd / nd / F.lit(1048576.0), 6).alias("mean"),
        F.round(
            F.sqrt(
                ((sxxd - sxd * sxd / nd) / (F.col("n") - 1).cast("double"))
                / F.lit(1048576.0 * 1048576.0)
            ),
            6,
        ).alias("std"),
    ).orderBy("dim")
