"""Registered retrieval queries: BM25 lexical search + hybrid RRF fusion.

Extends the engine beyond the reference's relational surface (the
reference has no search tier — `/root/reference/analytic.sql` is pure
warehouse SQL) with the ranked-retrieval workload an LLM-data platform
runs next to its embedding ANN: query-by-document BM25 over an inverted
index expressed as a token equi-join, and reciprocal-rank fusion of the
lexical and vector top-k lists (the standard hybrid-search combiner).

Oracle discipline: the DuckDB oracles replay the full pipeline — tf/dl/df
statistics, idf, the quantized per-term contributions, the rank cut — so
the driver hash-checks the scoring math, not just output shape.  All
float expression trees are written with explicit CASTs so DuckDB's
exact-DECIMAL literal arithmetic (e.g. ``tf * 2.2`` staying DECIMAL)
cannot diverge from Spark's double path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from busdata_pipeline_spark.operators import retrieval, setsim, similarity
from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table

#: query-doc selector shared by the lexical and vector legs.  BOUNDED by
#: construction (≤ 20 query docs at any corpus scale): a retrieval
#: workload's query set is fixed while the corpus grows — a selector
#: that scaled with the corpus (plain ``doc_id % 100``) made the probe
#: join queries×corpus quadratic on this tiny-vocabulary corpus
#: (measured 36× wall on the 10× ladder rung before the cap).
_QPRED_SQL = "doc_id % 100 = 0 AND doc_id < 2000"


def _bm25_ctes() -> str:
    """The BM25 pipeline as DuckDB CTEs ending in ``ranked`` (unlimited
    rank per query); callers append their own SELECT/cut.  Mirrors
    operators/retrieval.bm25_topk expression-for-expression."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS tok
  FROM documents),
t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       FROM t GROUP BY doc_id, tok),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       FROM t GROUP BY doc_id),
dfq AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM t GROUP BY tok),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
       FROM dl),
qi AS (
  SELECT q.qid, q.tok,
         ln(1.0 + (CAST(st.n_docs AS DOUBLE) - dfq.df + 0.5)
                  / (dfq.df + 0.5)) AS idf
  FROM (SELECT DISTINCT doc_id AS qid, tok FROM t WHERE {_QPRED_SQL}) q
  JOIN dfq USING (tok) CROSS JOIN st),
cand AS (
  SELECT qi.qid, tf.doc_id,
    CAST(FLOOR((qi.idf * (CAST(tf.tf AS DOUBLE) * 2.2))
               / (CAST(tf.tf AS DOUBLE)
                  + 1.2 * (0.25 + (0.75 * CAST(dl.dl AS DOUBLE))
                                  / st.avgdl))
               * 1000000000.0 + 0.5) AS BIGINT) AS cq
  FROM tf JOIN qi ON tf.tok = qi.tok
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN st
  WHERE tf.doc_id <> qi.qid),
sc AS (SELECT qid, doc_id, CAST(SUM(cq) AS BIGINT) AS sq
       FROM cand GROUP BY qid, doc_id),
ranked AS (
  SELECT qid, doc_id,
         ROUND(CAST(sq AS DOUBLE) / 1000000000.0, 6) AS bm25,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY sq DESC, doc_id) AS INT) AS rank
  FROM sc)"""


@query(
    "td_bm25_search",
    oracle=_bm25_ctes()
    + """
SELECT qid, doc_id, bm25, rank FROM ranked WHERE rank <= 10
""",
)
def td_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10, query-by-document (every doc_id % 100 = 0 doc
    queries the corpus with its distinct terms; self-match excluded).

    The probe is the inverted index as an equi-join: corpus statistics
    (tf/dl/df) aggregate once, the query-term × idf table is
    dimension-sized and broadcast, and per-term contributions are
    BIGINT-quantized so the score sum is order-independent — the rank cut
    is exact on both engines.  (The optional df > N/2 stopword cut stays
    OFF here: the synthetic corpus vocabulary is ~31 template tokens, all
    above N/2 — see operators/retrieval.bm25_topk.)"""
    docs = table(spark, sf_dir, "documents")
    return retrieval.bm25_topk(
        docs, (F.col("doc_id") % 100 == 0) & (F.col("doc_id") < 2000), k=10
    )


@query(
    "td_rrf_hybrid_search",
    oracle=_bm25_ctes()
    + """,
lex AS (SELECT qid, doc_id AS id, rank AS r_lex FROM ranked WHERE rank <= 20),
eb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qv AS (SELECT vec_id AS qid, v AS qvec FROM eb
       WHERE vec_id % 100 = 0 AND vec_id < 2000),
vec AS (
  SELECT qv.qid, e.vec_id AS id,
    CAST(ROW_NUMBER() OVER (PARTITION BY qv.qid
      ORDER BY list_cosine_similarity(e.v, qv.qvec) DESC,
               e.vec_id) AS INT) AS r_vec
  FROM eb e, qv WHERE e.vec_id <> qv.qid
  QUALIFY r_vec <= 20),
fused AS (
  SELECT COALESCE(l.qid, v.qid) AS qid, COALESCE(l.id, v.id) AS id,
    COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + l.r_lex AS DOUBLE), 0.0)
    + COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + v.r_vec AS DOUBLE), 0.0)
      AS rrf_raw
  FROM lex l FULL OUTER JOIN vec v ON l.qid = v.qid AND l.id = v.id)
SELECT qid, id AS doc_id, ROUND(rrf_raw, 6) AS rrf,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY rrf_raw DESC, id) AS INT) AS rank
FROM fused QUALIFY rank <= 10
""",
)
def td_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 top-20 (lexical leg) fused with exact cosine
    top-20 (vector leg, the td_cosine_topk machinery) by reciprocal-rank
    fusion, 1/(60+rank), Cormack et al. 2009.  The fusion joins two
    already-top-k per-query lists — dimension-sized at any corpus scale —
    and its two-term fixed-order double sum is bit-identical across
    engines, so the fused ranking hash-checks end to end."""
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    lex = retrieval.bm25_topk(
        docs, (F.col("doc_id") % 100 == 0) & (F.col("doc_id") < 2000), k=20
    ).select("qid", F.col("doc_id").alias("id"), "rank")
    qvecs = emb.where(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000)
    ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    vec = similarity.cosine_topk_vectorized(emb, qvecs, k=20).select(
        "qid", F.col("vec_id").alias("id"), "rank"
    )
    return retrieval.rrf_fuse(lex, vec, k=10)


@query(
    "td_setsim_prefix_join",
    # Definitional all-pairs oracle: the driver verifies COMPLETENESS of
    # the prefix-filter candidate generator (any missed pair would show
    # as a row-count/hash mismatch), not just the verify arithmetic.
    # Round-11 (ORACLES.md rule 16): the all-pairs relation is factored
    # through the quotient by exact text equality — the pairwise
    # intersect/union arithmetic runs once per DISTINCT-text pair and is
    # expanded back to doc pairs; identical nonempty token sets are
    # jaccard 1.0 exactly.  The rep-pair intersections are computed
    # RELATIONALLY (explode tokens, equi-join, count per pair) instead
    # of per-pair list lambdas — the sharing-pair set is a provable
    # candidate superset for any positive threshold, and counting is
    # one vectorized GROUP BY, so the kernel stays seconds even where
    # per-pair list_intersect costs ~1ms.
    # Algebraically the same relation (old-vs-new cross-checked
    # IDENTICAL at sf0.01 and the sf0.1 base), but output-bound on the
    # duplicate-heavy scale replicas.
    oracle="""
WITH grp AS MATERIALIZED (
  SELECT md5(TRIM(text)) AS h, MIN(doc_id) AS rep_id, MAX(TRIM(text)) AS t
  FROM documents GROUP BY md5(TRIM(text))),
gdocs AS MATERIALIZED (
  SELECT doc_id, md5(TRIM(text)) AS h FROM documents),
w AS (
  SELECT h, rep_id,
         list_filter(string_split(t, ' '), x -> x <> '') AS ws
  FROM grp),
tset AS MATERIALIZED (
  SELECT h, rep_id,
         list_distinct(list_transform(range(1, len(ws) - 1),
           i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS toks
  FROM w WHERE len(ws) >= 3),
ttoks AS MATERIALIZED (SELECT h, rep_id, unnest(toks) AS tok FROM tset),
szs AS MATERIALIZED (SELECT h, CAST(len(toks) AS BIGINT) AS sz FROM tset),
rp AS MATERIALIZED (
  SELECT x.h AS ha, y.h AS hb,
         CAST(COUNT(*) AS BIGINT) AS inter,
         CAST(ANY_VALUE(sa.sz) + ANY_VALUE(sb.sz) - COUNT(*) AS BIGINT) AS uni
  FROM ttoks x JOIN ttoks y ON y.tok = x.tok AND x.rep_id < y.rep_id
  JOIN szs sa ON sa.h = x.h JOIN szs sb ON sb.h = y.h
  GROUP BY x.h, y.h),
rv AS MATERIALIZED (
  SELECT ha, hb, ROUND(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
  FROM rp WHERE inter * 10 >= uni * 9),
rvs AS (SELECT ha, hb, jaccard FROM rv
        UNION ALL SELECT hb AS ha, ha AS hb, jaccard FROM rv),
within AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(1.0 AS DOUBLE) AS jaccard
  FROM gdocs x JOIN gdocs y ON y.h = x.h AND y.doc_id > x.doc_id
  JOIN tset s ON s.h = x.h),
crossp AS (
  SELECT x.doc_id AS a, y.doc_id AS b, r.jaccard
  FROM rvs r JOIN gdocs x ON x.h = r.ha JOIN gdocs y ON y.h = r.hb
  WHERE y.doc_id > x.doc_id)
SELECT a, b, jaccard FROM within
UNION ALL
SELECT a, b, jaccard FROM crossp
""",
)
def td_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.9 self-join over distinct 3-shingle sets via prefix
    filtering (AllPairs, Bayardo et al. 2007): rarity-ordered prefixes
    make candidate generation an equi-join on RARE tokens, a length
    filter prunes before the exact-intersection verify, and the 9/10
    threshold keeps every comparison in exact integer arithmetic — no
    float boundary, no n² scan, no false negatives."""
    return setsim.jaccard_pairs_prefix(table(spark, sf_dir, "documents"))


#: near-positive exclusion cutoff for hard-negative mining — a
#: candidate whose token-set Jaccard with its query is >= this is too
#: close to a duplicate to label negative.  Shared by the Spark plan
#: and the oracle string below so the two sides can't drift.
_NEAR_POS_J = 0.75


@query(
    "td_hard_negatives",
    # Hard-negative mining for retrieval-model training: BM25 top-20
    # lexical neighbors per query doc (hard: they share vocabulary),
    # MINUS near-positives (exact token-set Jaccard >= _NEAR_POS_J —
    # a near-dup must never be labeled negative), cut to the 10
    # highest-ranked survivors.  Jaccard is |A∩B| / (|A|+|B|-|A∩B|)
    # over DISTINCT token sets — integers until the one division.
    oracle=_bm25_ctes()
    + f""",
cset AS (SELECT doc_id, tok FROM tf),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
          FROM cset GROUP BY doc_id),
cand20 AS (SELECT qid, doc_id, bm25, rank FROM ranked WHERE rank <= 20),
inter AS (
  SELECT c.qid, c.doc_id, CAST(COUNT(*) AS BIGINT) AS ix
  FROM cand20 c
  JOIN cset a ON a.doc_id = c.qid
  JOIN cset b ON b.doc_id = c.doc_id AND b.tok = a.tok
  GROUP BY c.qid, c.doc_id),
jac AS (
  SELECT c.qid, c.doc_id, c.bm25, c.rank,
    CAST(COALESCE(i.ix, 0) AS DOUBLE)
      / CAST(sa.sz + sb.sz - COALESCE(i.ix, 0) AS DOUBLE) AS j
  FROM cand20 c
  LEFT JOIN inter i ON i.qid = c.qid AND i.doc_id = c.doc_id
  JOIN sizes sa ON sa.doc_id = c.qid
  JOIN sizes sb ON sb.doc_id = c.doc_id),
hard AS (
  SELECT qid, doc_id, bm25, ROUND(j, 6) AS jaccard,
    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rank) AS INT)
      AS neg_rank
  FROM jac WHERE j < {_NEAR_POS_J})
SELECT qid, doc_id AS neg_id, bm25, jaccard, neg_rank
FROM hard WHERE neg_rank <= 10
ORDER BY qid, neg_rank
""",
)
def td_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the training-pair generator for embedding
    /reranker models (DPR/Contriever recipe): per query doc, take the
    lexically-confusable BM25 top-20, EXCLUDE near-positives (exact
    token-set Jaccard >= _NEAR_POS_J = 0.75 — labeling a near-dup as
    negative poisons contrastive training), keep the 10 highest-ranked
    survivors with
    their scores and Jaccards.  Scale shape: the BM25 probe is the
    bounded-query-set join td_bm25_search documents; the Jaccard
    verification touches only the ≤ queries×20 candidate pairs — the
    corpus token relation is pre-filtered by a BROADCAST of the
    candidate id set before the intersection join, so the exact-verify
    cost is candidate-bounded, not corpus-bounded."""
    docs = table(spark, sf_dir, "documents")
    qpred = (F.col("doc_id") % 100 == 0) & (F.col("doc_id") < 2000)
    cand20 = retrieval.bm25_topk(docs, qpred, k=20).select(
        "qid", F.col("doc_id").alias("nid"), "bm25", "rank"
    )
    cset = retrieval.corpus_tokens(docs).distinct()
    sizes = cset.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    ids = (
        cand20.select(F.col("qid").alias("doc_id"))
        .union(cand20.select(F.col("nid").alias("doc_id")))
        .distinct()
    )
    # candidate-bounded token relation: corpus tokens semi-joined to
    # the <= queries*21 candidate ids (broadcast)
    ctok = cset.join(F.broadcast(ids), "doc_id", "left_semi")
    qtok = ctok.select(F.col("doc_id").alias("qid"), "tok")
    ntok = ctok.select(F.col("doc_id").alias("nid"), "tok")
    inter = (
        cand20.select("qid", "nid")
        .join(qtok, "qid")
        .join(ntok, ["nid", "tok"])
        .groupBy("qid", "nid")
        .agg(F.count(F.lit(1)).cast("long").alias("ix"))
    )
    jac = (
        cand20.join(inter, ["qid", "nid"], "left")
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("qid"),
                                     F.col("sz").alias("sza"))),
            "qid",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("nid"),
                                     F.col("sz").alias("szb"))),
            "nid",
        )
        .select(
            "qid", "nid", "bm25", "rank",
            (
                F.coalesce("ix", F.lit(0)).cast("double")
                / (
                    F.col("sza") + F.col("szb")
                    - F.coalesce("ix", F.lit(0))
                ).cast("double")
            ).alias("j"),
        )
    )
    w = Window.partitionBy("qid").orderBy("rank")
    hard = (
        jac.where(F.col("j") < F.lit(_NEAR_POS_J))
        .select(
            "qid", "nid", "bm25",
            F.round("j", 6).alias("jaccard"),
            F.row_number().over(w).cast("int").alias("neg_rank"),
        )
        .where(F.col("neg_rank") <= 10)
    )
    return hard.select(
        "qid", F.col("nid").alias("neg_id"), "bm25", "jaccard", "neg_rank"
    ).orderBy("qid", "neg_rank")
