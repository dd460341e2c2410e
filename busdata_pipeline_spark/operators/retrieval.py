"""Lexical retrieval + hybrid rank fusion over the documents corpus.

The reference has no retrieval tier (all analytics are relational —
`/root/reference/analytic.sql`); this extends the engine with the two
search primitives an LLM-data platform needs next to embedding ANN
(operators/similarity.py): BM25 ranked lexical retrieval (Robertson &
Walker 1994; the Okapi BM25 formulation) and reciprocal-rank fusion of
lexical + vector result lists (Cormack, Clarke & Büttcher 2009).

Scale design
------------
- The BM25 probe is the **inverted index expressed as an equi-join**:
  posting lists are the per-(doc, token) tf table partitioned by token,
  and the query side (query terms + their idf) is dimension-sized, so it
  broadcasts — the corpus shuffles once to build tf/dl/df aggregates and
  the candidate scan never moves document text.
- High-df terms are both a skew hazard (the "the" posting list) and
  noise (idf ≈ 0), so query terms with df > N/2 are pruned — the
  standard stopword cut, applied identically in the oracle so results
  stay engine-identical.  Residual hot terms split under AQE skew-join.
- Per-term score contributions are quantized to integer nano-units and
  summed as BIGINT, so the per-(query, doc) score is exact and
  **summation-order-independent** — the same discipline as the IVF
  centroid means (operators/similarity.py) — making the rank cut
  engine-stable without per-engine float drift.
- RRF fusion joins two already-top-k lists (tiny per query), so the
  fusion stage costs nothing at scale; its value is the contract that
  both input rankings are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Okapi BM25 constants (the textbook defaults).  K1P1 is a literal, not
#: ``K1 + 1.0`` computed at runtime: the float sum 1.2 + 1.0 need not
#: round to the same double as the literal 2.2 the oracle SQL parses, and
#: the two engines must fold bit-identical constants.
K1 = 1.2
K1P1 = 2.2
B = 0.75
#: integer quantization unit for per-term contributions (nano-units).
QUANT = 1_000_000_000
#: RRF smoothing constant from Cormack et al. 2009.
RRF_K = 60


def corpus_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, tok) token stream — whitespace tokenization, empties
    dropped; the same convention as the vocabulary/TF-IDF tier."""
    return docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")


def word_ngrams(docs: DataFrame, n: int = 2,
                id_col: str = "doc_id") -> DataFrame:
    """Adjacent-word n-gram stream (doc_id, w1..wn) over the
    empty-filtered token sequence, derived as a per-doc ARRAY projection:
    zip of n shifted slices of the filtered token array, exploded.

    Round-12 (guide §2.4): this replaces the posexplode + per-doc
    row_number/lead window formulation — semantically identical
    (filtering the array FIRST makes adjacency contiguous across
    dropped empty tokens, exactly the re-ranked window's semantics; a
    doc with < n tokens emits nothing either way) but with NO exchange:
    the window shuffled and sorted the entire token stream per
    consumer, while the array zip is corpus-linear map work inside the
    scan stage.  The slice length is clamped at 0 so short/empty docs
    yield empty arrays instead of a negative-length error."""
    ws = F.filter(F.split(F.trim("text"), " "), lambda x: x != "")
    tmp = docs.select(id_col, ws.alias("_ws"))
    ln = F.greatest(F.size("_ws") - (n - 1), F.lit(0))
    cols = [f"w{i + 1}" for i in range(n)]
    gram = F.slice("_ws", 1, ln)
    for i in range(1, n):
        gram = F.zip_with(
            gram, F.slice("_ws", i + 1, ln),
            lambda a, b: F.struct(
                *([a[c].alias(c) for c in cols[:i]] if i > 1
                  else [a.alias(cols[0])]),
                b.alias(cols[i]),
            ),
        )
    return tmp.select(
        id_col, F.explode(gram).alias("_g")
    ).select(id_col, *[F.col(f"_g.{c}").alias(c) for c in cols])


def bm25_topk(
    docs: DataFrame,
    query_pred,
    k: int = 10,
    stopword_prune: bool = False,
) -> DataFrame:
    """Top-k BM25 retrieval, query-by-document: each document matching
    ``query_pred`` (a Column predicate over ``doc_id``) is issued as a
    bag-of-words query against the whole corpus (self-match excluded).

    Output: (qid, doc_id, bm25, rank) — rank 1..k per qid, ordered by
    the exact quantized score then doc_id.
    """
    toks = corpus_tokens(docs)

    # Round-12 (guide §1.2/§2.3, the td_countmin pattern): every other
    # statistic is an exact rollup of the (doc, tok) tf table, so they
    # all derive from the ONE occurrence-level aggregate — dl = Σ tf per
    # doc, df = row count per tok (tf is distinct per (doc, tok), so
    # COUNT(*) == the COUNT(DISTINCT doc_id) Expand it replaces), query
    # terms = tf rows of the query docs (already distinct).  The raw
    # token stream is scanned/shuffled once and the identical tf subtree
    # reuses its exchange across consumers.
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )

    # Query side: distinct terms of the query docs + idf per term.  The
    # df lookup happens on this dimension-sized side (not against the
    # full posting table), then broadcasts into the probe join.
    qterms = (
        tf.where(query_pred)
        .select(F.col("doc_id").alias("qid"), "tok")
        .join(dfreq, "tok")
        .join(F.broadcast(stats))
    )
    if stopword_prune:
        # optional df > N/2 stopword cut: on web-scale vocabularies the
        # hot posting lists ("the") are both a skew hazard and ~zero-idf
        # noise.  OFF by default — the synthetic corpus has a ~31-token
        # template vocabulary where every term exceeds N/2 (pruning
        # would empty the queries); BM25's idf already down-weights
        # common terms, and residual join skew splits under AQE.
        qterms = qterms.where(F.col("df") * 2 <= F.col("n_docs"))
    qterms = (
        qterms.select(
            "qid",
            "tok",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    contrib = (
        F.col("idf")
        * (F.col("tf") * F.lit(K1P1))
        / (
            F.col("tf")
            + F.lit(K1)
            * (F.lit(1.0 - B) + (F.lit(B) * F.col("dl")) / avgdl)
        )
    )

    cand = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(qterms), "tok")
        .join(F.broadcast(stats))
        .where(F.col("doc_id") != F.col("qid"))
        .select(
            "qid",
            "doc_id",
            F.floor(contrib * F.lit(float(QUANT)) + F.lit(0.5))
            .cast("long")
            .alias("cq"),
        )
    )

    scored = cand.groupBy("qid", "doc_id").agg(F.sum("cq").alias("sq"))
    w = Window.partitionBy("qid").orderBy(F.desc("sq"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            "doc_id",
            F.round(F.col("sq") / F.lit(float(QUANT)), 6).alias("bm25"),
            "rank",
        )
    )


def rrf_fuse(lex: DataFrame, vec: DataFrame, k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings.

    ``lex``/``vec``: (qid, id, rank).  Score = Σ 1/(RRF_K + rank) over
    the lists containing the doc — a fixed-order two-term double sum, so
    bit-identical across engines; ties break on id.
    """
    lexr = lex.select("qid", "id", F.col("rank").alias("r_lex"))
    vecr = vec.select("qid", "id", F.col("rank").alias("r_vec"))
    fused = (
        lexr.join(vecr, ["qid", "id"], "full_outer")
        .select(
            "qid",
            "id",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("r_lex")).cast("double"),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("r_vec")).cast("double"),
                    F.lit(0.0),
                )
            ).alias("rrf_raw"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf_raw"), F.asc("id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            F.col("id").alias("doc_id"),
            F.round("rrf_raw", 6).alias("rrf"),
            "rank",
        )
    )
