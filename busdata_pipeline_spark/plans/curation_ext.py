"""Corpus-curation extensions: unicode text normalization and
Kneser-Ney bigram scoring.

Web-crawl curation's first transform is canonicalizing the raw text —
NFC composition, zero-width stripping, whitespace collapse — because
every downstream dedup/fingerprint operator keys on exact bytes
(minhash shingles, winnowing hashes, exact-hash dedup all diverge on
'e'+U+0301 vs U+00E9).  ``td_text_normalize`` is that pass, run as an
Arrow-batched Pandas UDF (Python ``unicodedata`` is the normalization
oracle DuckDB's utf8proc agrees with — verified across composition,
Hangul, and multi-mark cases).

``td_kn_bigram_logprob`` upgrades the stupid-backoff scorer
(td_bigram_logprob) to interpolated Kneser-Ney (Kneser & Ney 1995;
Chen & Goodman 1998) — the smoothing used by KenLM-style quality
filters: continuation counts N1+(•w) replace raw frequencies in the
backoff, so "Francisco" (frequent but only after "San") stops inflating
unseen-context scores.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table

# ZWSP, ZWNJ, ZWJ, BOM/ZWNBSP — the four strip targets (explicit
# escapes; the DuckDB oracle builds the same codepoints via chr()).
_ZW = ["\u200b", "\u200c", "\u200d", "\ufeff"]
_ACUTE = "\u0301"  # combining acute (chr(769) in the oracle)


def _nfc_clean():
    """Arrow-batched Pandas UDF: NFC + zero-width strip + ASCII-
    whitespace collapse + trim, in exactly the order the DuckDB oracle
    replays (nfc_normalize → replace×4 → regexp_replace → trim).
    Built lazily — pandas_udf type resolution needs an active session,
    so module import must stay session-free."""
    zw = list(_ZW)

    @F.pandas_udf("string")
    def clean_udf(s: pd.Series) -> pd.Series:
        import re
        import unicodedata

        ws = re.compile(r"[ \t\r\n]+")

        def clean(x):
            if x is None:
                return None
            y = unicodedata.normalize("NFC", x)
            for z in zw:
                y = y.replace(z, "")
            return ws.sub(" ", y).strip(" ")

        return s.map(clean)

    return clean_udf


@query(
    "td_text_normalize",
    # The dirtying is deterministic SQL on both engines (three rotating
    # corruption modes keyed on doc_id%3); the cleanup is the operator
    # under test: Python unicodedata NFC vs DuckDB nfc_normalize must
    # produce byte-identical strings or the md5 signatures diverge.
    oracle="""
WITH dirty AS (
  SELECT doc_id,
    CASE CAST(doc_id % 3 AS INTEGER)
      WHEN 0 THEN replace(text, 'a', 'a' || chr(769))
      WHEN 1 THEN text || chr(8203) || chr(65279)
      ELSE replace(text, ' ', chr(9) || chr(13) || chr(10))
    END AS d
  FROM documents),
clean AS (
  SELECT doc_id, d,
    trim(regexp_replace(
      replace(replace(replace(replace(nfc_normalize(d),
        chr(8203), ''), chr(8204), ''), chr(8205), ''), chr(65279), ''),
      '[ \t\r\n]+', ' ', 'g'), ' ') AS c
  FROM dirty)
SELECT doc_id,
  d <> c AS changed,
  CAST(length(d) AS BIGINT) AS n_dirty,
  CAST(length(c) AS BIGINT) AS n_clean,
  substr(md5(c), 1, 16) AS sig
FROM clean
ORDER BY doc_id
""",
)
def td_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization pass over a deterministically-dirtied
    corpus: docs get combining-mark decompositions (doc_id%3=0),
    appended zero-width/BOM characters (=1), or tab/CRLF whitespace
    damage (=2); the operator NFC-composes, strips the four zero-width
    codepoints, collapses ASCII whitespace runs, and trims.  Embarrass-
    ingly parallel mapInPandas-class work — one Arrow-batched UDF, no
    shuffle, corpus-linear; the md5 signature column proves byte-level
    parity with the DuckDB oracle's utf8proc normalization."""
    docs = table(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 3).cast("int")
    dirty = (
        F.when(m == 0, F.expr(f"replace(text, 'a', 'a{_ACUTE}')"))
        .when(m == 1, F.concat(F.col("text"), F.lit(_ZW[0] + _ZW[3])))
        .otherwise(F.expr("replace(text, ' ', char(9) || char(13) || char(10))"))
    )
    d = docs.select("doc_id", dirty.alias("d"))
    c = d.withColumn("c", _nfc_clean()(F.col("d")))
    return c.select(
        "doc_id",
        (F.col("d") != F.col("c")).alias("changed"),
        F.length("d").cast("long").alias("n_dirty"),
        F.length("c").cast("long").alias("n_clean"),
        F.substring(F.md5("c"), 1, 16).alias("sig"),
    ).orderBy("doc_id")


@query(
    "td_kn_bigram_logprob",
    # Interpolated Kneser-Ney, d=0.75: P(w2|w1) = max(c12-d,0)/c1 +
    # d·N1+(w1•)/c1 · N1+(•w2)/B.  Every count is BIGINT; the P closed
    # form is written with the identical operation order on both
    # engines; per-bigram ln(P) is quantized to micro-nats BEFORE the
    # per-doc sum so summation order can't skew the hash.
    oracle="""
WITH toks0 AS (
  SELECT doc_id, i, t[i] AS w
  FROM (SELECT doc_id, string_split(TRIM(text), ' ') AS t FROM documents),
       UNNEST(range(1, len(t) + 1)) r(i)
  WHERE t[i] <> ''),
toks AS (
  -- re-rank positions AFTER the empty-token filter so adjacency is
  -- contiguous (raw split indices leave gaps at consecutive spaces,
  -- where Spark's lead() over the filtered stream WOULD form a bigram)
  SELECT doc_id, w,
    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) AS i
  FROM toks0),
big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
tbig AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM big WHERE doc_id % 2 = 0 GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n1f
        FROM tbig GROUP BY w1),
pre AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p FROM tbig GROUP BY w2),
bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM tbig),
scored AS (
  SELECT big.doc_id,
    CASE WHEN ctx.c1 IS NOT NULL THEN
      (greatest(CAST(COALESCE(tbig.c12, 0) AS DOUBLE) - 0.75, 0.0)
       + 0.75 * CAST(ctx.n1f AS DOUBLE)
              * CAST(COALESCE(pre.n1p, 1) AS DOUBLE) / CAST(bt.b AS DOUBLE))
      / CAST(ctx.c1 AS DOUBLE)
    ELSE CAST(COALESCE(pre.n1p, 1) AS DOUBLE) / CAST(bt.b AS DOUBLE)
    END AS p
  FROM big
  LEFT JOIN tbig ON tbig.w1 = big.w1 AND tbig.w2 = big.w2
  LEFT JOIN ctx ON ctx.w1 = big.w1
  LEFT JOIN pre ON pre.w2 = big.w2
  CROSS JOIN bt),
q AS (SELECT doc_id, CAST(floor(ln(p) * 1000000 + 0.5) AS BIGINT) AS lpm
      FROM scored)
-- the mean is rounded half-up IN INTEGERS: floor((2S + n) / (2n)) on
-- exact BIGINTs (one IEEE division, exact for these magnitudes).  The
-- prior ROUND(S/1e6/n, 6) failed the 100x differential: micro-nat
-- sums divided by small n land EXACTLY on .5 at the 6th decimal, where
-- Spark's BigDecimal HALF_UP and DuckDB's round() disagree.
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(FLOOR(CAST((-2 * CAST(SUM(lpm) AS BIGINT) + COUNT(*)) AS DOUBLE)
             / CAST((2 * COUNT(*)) AS DOUBLE)) AS BIGINT)
    / 1.0e6 AS xent_nats
FROM q GROUP BY doc_id ORDER BY doc_id
""",
)
def td_kn_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram cross-entropy per doc (trained on
    the even docs, scoring every doc) — the KenLM-style perplexity
    filter with principled smoothing: the backoff mass d·N1+(w1•)/c1 is
    spread over CONTINUATION probability N1+(•w2)/B, not raw unigram
    frequency.  Unseen contexts back off to P_cont alone; unseen words
    take the 1/B continuation floor so ln stays defined.  Scale shape
    is identical to td_bigram_logprob: the corpus-sized relation is the
    token/bigram stream (one window per doc partition), every model
    relation is vocab²-bounded and broadcast; per-bigram log-probs are
    micro-nat-quantized BIGINTs so the per-doc sum is order-free."""
    from busdata_pipeline_spark.operators.retrieval import word_ngrams

    docs = table(spark, sf_dir, "documents")
    # round-12 (guide §2.4): bigrams as a per-doc array-zip projection —
    # no per-doc window exchange+sort; identical stream (see word_ngrams)
    big = word_ngrams(docs, 2)
    tbig = (
        big.where(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    ctx = tbig.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    pre = tbig.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1p")
    )
    n_bigram_types = tbig.count()  # bounded driver scalar (vocab²)
    b = F.lit(float(n_bigram_types))

    p_seen_ctx = (
        F.greatest(
            F.coalesce(F.col("c12"), F.lit(0)).cast("double") - F.lit(0.75),
            F.lit(0.0),
        )
        + F.lit(0.75)
        * F.col("n1f").cast("double")
        * F.coalesce(F.col("n1p"), F.lit(1)).cast("double")
        / b
    ) / F.col("c1").cast("double")
    p_unseen_ctx = F.coalesce(F.col("n1p"), F.lit(1)).cast("double") / b

    scored = (
        big.join(F.broadcast(tbig), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(pre), "w2", "left")
        .withColumn(
            "p",
            F.when(F.col("c1").isNotNull(), p_seen_ctx).otherwise(
                p_unseen_ctx
            ),
        )
        .withColumn(
            "lpm",
            F.floor(F.log("p") * 1000000 + F.lit(0.5)).cast("long"),
        )
    )
    n = F.count(F.lit(1))
    return (
        scored.groupBy("doc_id")
        .agg(
            n.cast("long").alias("n_bigrams"),
            # integer-exact half-up mean (see oracle comment): the
            # ROUND form hit .5-at-6-decimals cases at 100x where the
            # engines' round implementations disagree
            (F.floor(
                (F.lit(-2) * F.sum("lpm") + n).cast("double")
                / (F.lit(2) * n).cast("double")
            ) / F.lit(1.0e6)).alias("xent_nats"),
        )
        .orderBy("doc_id")
    )


_TOKS_CTE = """
toks0 AS (
  SELECT doc_id, i, t[i] AS w
  FROM (SELECT doc_id, string_split(TRIM(text), ' ') AS t FROM documents),
       UNNEST(range(1, len(t) + 1)) r(i)
  WHERE t[i] <> ''),
toks AS (
  SELECT doc_id, w,
    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS BIGINT)
      AS p
  FROM toks0)
"""


@query(
    "td_span_corruption",
    # T5-style span corruption (Raffel et al. 2020 §3.1.4): fixed-width
    # 3-token blocks, a block is masked iff md5(doc_id:block) % 20 < 3
    # (15% corruption rate, hash-deterministic so both engines mask the
    # SAME spans with no RNG), masked spans collapse to <extra_id_k>
    # sentinels in the input and expand after the sentinel in the
    # target; md5 signatures pin both generated strings byte-for-byte.
    oracle="""
WITH """ + _TOKS_CTE + """,
blk AS (
  SELECT doc_id, w, p, p // 3 AS b,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
      CAST(p // 3 AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) % 20 < 3
      AS masked
  FROM toks),
sent AS (
  SELECT doc_id, w, p, b, masked,
    CASE WHEN masked THEN
      DENSE_RANK() OVER (PARTITION BY doc_id, masked ORDER BY b) - 1
    END AS k
  FROM blk),
inp AS (
  SELECT doc_id,
    string_agg(CASE WHEN NOT masked THEN w
      ELSE '<extra_id_' || CAST(k AS VARCHAR) || '>' END,
      ' ' ORDER BY p) AS s
  FROM sent WHERE NOT masked OR p % 3 = 0
  GROUP BY doc_id),
tgt AS (
  SELECT doc_id,
    string_agg(CASE WHEN p % 3 = 0 THEN
      '<extra_id_' || CAST(k AS VARCHAR) || '> ' || w ELSE w END,
      ' ' ORDER BY p) AS s
  FROM sent WHERE masked GROUP BY doc_id),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
    CAST(COUNT(DISTINCT CASE WHEN masked THEN b END) AS BIGINT) AS n_spans
  FROM sent GROUP BY doc_id)
SELECT agg.doc_id, n_tokens, n_masked, n_spans,
  substr(md5(COALESCE(inp.s, '')), 1, 16) AS inp_sig,
  substr(md5(COALESCE(tgt.s, '')), 1, 16) AS tgt_sig
FROM agg
LEFT JOIN inp ON inp.doc_id = agg.doc_id
LEFT JOIN tgt ON tgt.doc_id = agg.doc_id
ORDER BY agg.doc_id
""",
)
def td_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption training-example generation: 3-token blocks
    masked at a deterministic 15% rate (md5 of doc_id:block — the
    hash-as-RNG discipline every sampling operator here uses, so the
    pipeline is replayable and both engines agree without a seed
    protocol), masked spans collapsing to <extra_id_k> sentinels in the
    encoder input and expanding after their sentinel in the decoder
    target.  Per-doc windows only (position, sentinel rank) — no joins,
    no model relation, corpus-linear; the generated input/target pair
    is pinned byte-for-byte by md5 signatures against the oracle's
    independent string assembly."""
    # Round-12 (guide §2.4 + §4.2): the example generator is a PURE
    # per-document function of (doc_id, text), so it runs as ONE Arrow
    # pass with no shuffle at all — the previous form posexploded every
    # token and paid a per-doc window exchange+sort (row_number + the
    # fused running-sum) plus a corpus-wide hash aggregate just to
    # reassemble what the kernel computes in-place.  Bit-identity: the
    # mask predicate is the same md5("<doc_id>:<block>") arithmetic
    # (int(hex[:15], 16) == conv(substr(md5, 1, 15), 16, 10) — 60 bits,
    # exact in int64), token order is the document's own order (what the
    # array_sort-by-position reassembly reproduced), string assembly is
    # the same " " join, and the signatures are md5 of the identical
    # byte sequences (Python md5 over UTF-8 == Spark md5).  A doc whose
    # filtered token list is empty emits nothing — the explode-side
    # formulation dropped it identically.  Cross-checked old-vs-new
    # identical at sf0.1; the oracle re-derives everything in SQL.
    import hashlib

    import pandas as pd

    docs = table(spark, sf_dir, "documents")

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_tokens": [], "n_masked": [],
                   "n_spans": [], "inp_sig": [], "tgt_sig": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(text, str):
                    continue  # NULL text: explode emitted no rows either
                toks = [w for w in text.strip(" ").split(" ") if w]
                if not toks:
                    continue
                nb = (len(toks) + 2) // 3
                mask = [
                    int(hashlib.md5(
                        f"{doc_id}:{b}".encode()).hexdigest()[:15], 16)
                    % 20 < 3
                    for b in range(nb)
                ]
                inp_parts, tgt_parts = [], []
                k = -1
                n_masked = 0
                for p, w in enumerate(toks):
                    head = p % 3 == 0
                    if mask[p // 3]:
                        n_masked += 1
                        if head:
                            k += 1
                            inp_parts.append(f"<extra_id_{k}>")
                            tgt_parts.append(f"<extra_id_{k}> {w}")
                        else:
                            tgt_parts.append(w)
                    else:
                        inp_parts.append(w)
                out["doc_id"].append(doc_id)
                out["n_tokens"].append(len(toks))
                out["n_masked"].append(n_masked)
                out["n_spans"].append(k + 1)
                out["inp_sig"].append(hashlib.md5(
                    " ".join(inp_parts).encode()).hexdigest()[:16])
                out["tgt_sig"].append(hashlib.md5(
                    " ".join(tgt_parts).encode()).hexdigest()[:16])
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        gen,
        "doc_id long, n_tokens long, n_masked long, n_spans long, "
        "inp_sig string, tgt_sig string",
    ).orderBy("doc_id")


@query(
    "td_ngram_novelty",
    # Trigram novelty vs the even-doc train half: the decontamination /
    # memorization probe — what fraction of a doc's trigrams the train
    # corpus has never seen.  Trigrams, not bigrams: this corpus's
    # small vocabulary saturates the bigram space (measured 7/26,665
    # novel at sf0.01 — degenerate), while the trigram space keeps a
    # real ~30% signal.  One left join against the train trigram set.
    oracle="""
WITH """ + _TOKS_CTE + """,
tri AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2, c.w AS w3
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.p = a.p + 2),
ttri AS (
  SELECT DISTINCT w1, w2, w3 FROM tri WHERE doc_id % 2 = 0)
SELECT tri.doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
  CAST(SUM(CASE WHEN t.w1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
  ROUND(CAST(SUM(CASE WHEN t.w1 IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 6) AS novelty
FROM tri
LEFT JOIN ttri t
  ON t.w1 = tri.w1 AND t.w2 = tri.w2 AND t.w3 = tri.w3
GROUP BY tri.doc_id
ORDER BY tri.doc_id
""",
)
def td_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc trigram novelty against the even-doc train half — the
    eval-set decontamination metric inverted: 0.0 means every trigram
    of the doc already exists in training data (memorization risk for
    generated evals; exact-overlap leakage for held-out splits).  Same
    shuffle shape as the LM scorers: corpus-sized trigram stream built
    with two leads over ONE per-doc window sort, a broadcast left join
    against the DISTINCT train trigram set (n-gram-type-bounded, which
    at web scale becomes the sharded join td_contamination documents),
    one per-doc hash aggregate."""
    from busdata_pipeline_spark.operators.retrieval import word_ngrams

    docs = table(spark, sf_dir, "documents")
    # round-12 (guide §2.4): trigrams as a per-doc array-zip projection
    # — no per-doc window exchange+sort; identical stream (word_ngrams)
    tri = word_ngrams(docs, 3)
    ttri = (
        tri.where(F.col("doc_id") % 2 == 0)
        .select("w1", "w2", "w3")
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    novel = F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
    return (
        tri.join(F.broadcast(ttri), ["w1", "w2", "w3"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            novel.cast("long").alias("n_novel"),
            F.round(
                novel.cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@query(
    "td_dataset_card",
    # The release "dataset card" numbers in one query: volume, language
    # spread, length profile (exact lower-median), exact-dup rate,
    # whitespace token budget, dominant-language share.  Every value is
    # a DOUBLE built from exact integer aggregates; the one division
    # per metric is deterministic.
    oracle="""
WITH base AS (
  SELECT doc_id, lang, source, n_chars,
    md5(text) AS h,
    len(list_filter(string_split(TRIM(text), ' '), x -> x <> ''))
      AS n_toks
  FROM documents),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
    CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
    CAST(SUM(n_toks) AS BIGINT) AS total_toks
  FROM base),
med AS (
  SELECT CAST(n_chars AS BIGINT) AS p50
  FROM (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS k,
               COUNT(*) OVER () AS c
        FROM base) q
  WHERE k = (c + 1) // 2),
toplang AS (
  SELECT CAST(MAX(cnt) AS BIGINT) AS top_n
  FROM (SELECT COUNT(*) AS cnt FROM base GROUP BY lang) q)
SELECT 'docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM a
UNION ALL SELECT 'langs', CAST(n_langs AS DOUBLE) FROM a
UNION ALL SELECT 'sources', CAST(n_sources AS DOUBLE) FROM a
UNION ALL SELECT 'total_chars', CAST(total_chars AS DOUBLE) FROM a
UNION ALL SELECT 'mean_chars',
  floor(CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE)
        * 1000000.0 + 0.5) / 1000000.0 FROM a
UNION ALL SELECT 'p50_chars', CAST(p50 AS DOUBLE) FROM med
UNION ALL SELECT 'exact_dup_rate',
  floor((1.0 - CAST(n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE))
        * 1000000.0 + 0.5) / 1000000.0 FROM a
UNION ALL SELECT 'mean_ws_tokens',
  floor(CAST(total_toks AS DOUBLE) / CAST(n_docs AS DOUBLE)
        * 1000000.0 + 0.5) / 1000000.0 FROM a
UNION ALL SELECT 'top_lang_share',
  floor(CAST(toplang.top_n AS DOUBLE) / CAST(a.n_docs AS DOUBLE)
        * 1000000.0 + 0.5) / 1000000.0
  FROM a, toplang
ORDER BY metric
""",
)
def td_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card summary a corpus release ships (volume,
    language/source spread, length profile, exact-dup rate, token
    budget, dominant-language share) as ONE oracle-checked query — the
    capstone report over the curation tier, so a release pipeline gets
    its headline numbers from the same engine that built the corpus.
    Two corpus passes (one hash aggregate incl. distinct-md5 dedup
    count, one median window over the doc-count-sized length relation)
    plus a lang group — all map-side-combinable or |langs|-bounded;
    every metric is a DOUBLE derived from exact BIGINT aggregates."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5("text").alias("h"),
        F.size(
            F.filter(
                F.split(F.trim("text"), " "), lambda x: x != F.lit("")
            )
        ).cast("long").alias("n_toks"),
    )
    a = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("h").cast("long").alias("n_unique"),
        F.sum("n_toks").cast("long").alias("total_toks"),
    ).collect()[0]
    med = (
        base.select(
            "n_chars",
            F.row_number()
            .over(Window.orderBy("n_chars", "doc_id"))
            .alias("k"),
        )
        .where(F.col("k") == (a["n_docs"] + 1) // 2)
        .collect()[0]["n_chars"]
    )
    top_n = (
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.max("cnt").alias("m"))
        .collect()[0]["m"]
    )
    def _q6(x: float) -> float:
        # identical half-up quantization to the oracle's floor form
        # (Python round() is banker's — the wrong tie rule here)
        import math

        return math.floor(x * 1000000.0 + 0.5) / 1000000.0

    # Assemble the 9-row report from the bounded driver scalars (the
    # aggregates above are 1-row / |langs|-row collects).
    rows = [
        ("docs", float(a["n_docs"])),
        ("exact_dup_rate",
         _q6(1.0 - a["n_unique"] / a["n_docs"])),
        ("langs", float(a["n_langs"])),
        ("mean_chars", _q6(a["total_chars"] / a["n_docs"])),
        ("mean_ws_tokens", _q6(a["total_toks"] / a["n_docs"])),
        ("p50_chars", float(med)),
        ("sources", float(a["n_sources"])),
        ("top_lang_share", _q6(top_n / a["n_docs"])),
        ("total_chars", float(a["total_chars"])),
    ]
    return spark.createDataFrame(rows, "metric string, value double")


#: logistic-regression trainer constants — fixed rounds (the oracle
#: unrolls exactly this many), fixed learning rate, 9-decimal weight
#: quantization per round (the PageRank state discipline: both engines
#: carry bit-identical weights into every round).
_LR_ROUNDS = 10
_LR_RATE = 2.0
_LR_QUANT = 1e9


_LR_FEATS_SQL = """
feats AS MATERIALIZED (
  SELECT doc_id,
    CAST(len(t) AS DOUBLE) / 100.0 AS f1,
    CAST(n_chars AS DOUBLE) / CAST(len(t) AS DOUBLE) / 10.0 AS f2,
    CAST(len(list_filter(t, x -> x = 'a' OR x = 'the')) AS DOUBLE)
      / CAST(len(t) AS DOUBLE) AS f3,
    CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END AS y
  FROM (SELECT doc_id, n_chars,
          list_filter(string_split(TRIM(text), ' '), x -> x <> '') AS t
        FROM documents)
  WHERE len(t) > 0),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feats),
w0_ AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)
"""


def _lr_round_sql(i: int) -> str:
    """One unrolled GD round: per-doc sigmoid, per-doc gradient/loss
    terms quantized to BIGINT micro (order-free sums), weight update +
    9-decimal quantization."""
    prev = "w0_" if i == 1 else f"w{i - 1}_"
    upd = ", ".join(
        f"floor((w.w{j} - {_LR_RATE} * (CAST(g.s{j} AS DOUBLE) / 1000000.0"
        f" / nn.n)) * 1000000000.0 + 0.5) / 1000000000.0 AS w{j}"
        for j in range(4)
    )
    return f"""
p{i} AS (
  SELECT f1, f2, f3, y,
    1.0 / (1.0 + exp(-(w.w0 + w.w1 * f1 + w.w2 * f2 + w.w3 * f3))) AS p
  FROM feats CROSS JOIN {prev} w),
g{i} AS (
  SELECT
    CAST(SUM(CAST(floor((p - y) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
      AS s0,
    CAST(SUM(CAST(floor((p - y) * f1 * 1000000.0 + 0.5) AS BIGINT))
      AS BIGINT) AS s1,
    CAST(SUM(CAST(floor((p - y) * f2 * 1000000.0 + 0.5) AS BIGINT))
      AS BIGINT) AS s2,
    CAST(SUM(CAST(floor((p - y) * f3 * 1000000.0 + 0.5) AS BIGINT))
      AS BIGINT) AS s3,
    CAST(SUM(CAST(floor(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))
      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sl
  FROM p{i}),
w{i}_ AS (
  SELECT {upd},
    floor(CAST(g.sl AS DOUBLE) / nn.n + 0.5) / 1000000.0 AS loss
  FROM {prev} w CROSS JOIN g{i} g CROSS JOIN nn)"""


def _lr_oracle(rounds: int = _LR_ROUNDS) -> str:
    body = ",".join(_lr_round_sql(i) for i in range(1, rounds + 1))
    rows = "\nUNION ALL ".join(
        f"SELECT {i} AS round, loss, w0, w1, w2, w3 FROM w{i}_"
        for i in range(1, rounds + 1)
    )
    return f"""
WITH {_LR_FEATS_SQL.strip()},{body}
SELECT CAST(round AS INTEGER) AS round, loss, w0, w1, w2, w3
FROM ({rows}) q ORDER BY round
"""




def _lr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, f1, f2, f3, y) — mirrors _LR_FEATS_SQL exactly; change
    BOTH or parity breaks.  Checkpointed: every GD round re-scans it."""
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim("text"), " "), lambda x: x != F.lit(""))
    return (
        docs.select("doc_id", "n_chars", toks.alias("t"))
        .where(F.size("t") > 0)
        .select(
            "doc_id",
            (F.size("t").cast("double") / F.lit(100.0)).alias("f1"),
            (
                F.col("n_chars").cast("double")
                / F.size("t").cast("double")
                / F.lit(10.0)
            ).alias("f2"),
            (
                F.size(
                    F.filter(
                        F.col("t"),
                        lambda x: (x == F.lit("a")) | (x == F.lit("the")),
                    )
                ).cast("double")
                / F.size("t").cast("double")
            ).alias("f3"),
            F.when(F.col("n_chars") >= 300, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("y"),
        )
        .localCheckpoint(eager=True)
    )


def _lr_fit(feats: DataFrame) -> tuple[list, list[float]]:
    """Run the quantized GD loop; returns (per-round history rows,
    final weights).  Update arithmetic is written identically to the
    oracle's w{i}_ CTEs (IEEE doubles, same op order)."""
    import math

    n = feats.count()
    w = [0.0, 0.0, 0.0, 0.0]
    hist = []
    fcols = [F.lit(1.0), F.col("f1"), F.col("f2"), F.col("f3")]
    for r in range(1, _LR_ROUNDS + 1):
        z = (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("f1")
            + F.lit(w[2]) * F.col("f2")
            + F.lit(w[3]) * F.col("f3")
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        aggs = [
            F.sum(
                F.floor((p - F.col("y")) * fcols[j] * 1000000.0 + F.lit(0.5))
                .cast("long")
            ).cast("long").alias(f"s{j}")
            for j in range(4)
        ] + [
            F.sum(
                F.floor(
                    -(
                        F.col("y") * F.log(p)
                        + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p)
                    )
                    * 1000000.0
                    + F.lit(0.5)
                ).cast("long")
            ).cast("long").alias("sl")
        ]
        g = feats.agg(*aggs).collect()[0]
        w = [
            math.floor(
                (w[j] - _LR_RATE * (g[f"s{j}"] / 1000000.0 / n))
                * _LR_QUANT
                + 0.5
            )
            / _LR_QUANT
            for j in range(4)
        ]
        loss = math.floor(g["sl"] / n + 0.5) / 1000000.0
        hist.append((r, loss, w[0], w[1], w[2], w[3]))
    return hist, w


@query("td_quality_lr_train", oracle=_lr_oracle())
def td_quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression quality classifier TRAINED inside the engine
    (the fasttext-style quality-filter shape, gradient-descent edition
    of td_naive_bayes_quality): full-batch GD on three cheap text
    features (token count, mean word length, stopword ratio) against a
    length-threshold label, 10 rounds, lr=2.0 (measured: 89% accuracy vs the 51% base rate at sf0.001).  Determinism is the
    PageRank/unigram discipline composed: per-doc gradient AND loss
    contributions are micro-quantized to BIGINT before the order-free
    sums, and weights are re-quantized to 9 decimals after every update
    — both engines carry bit-identical model state into each round, so
    the oracle replays all 10 rounds exactly.  Scale shape per round:
    one map-side-combinable aggregate over the corpus (the model is 4
    scalars collected per round — bounded driver traffic, the fused-
    trainer pattern of the k-means/PQ loops); the loss column's visible
    round-over-round decrease is the trained-ness proof."""
    feats = _lr_features(spark, sf_dir)
    hist, _w = _lr_fit(feats)
    return spark.createDataFrame(
        hist,
        "round int, loss double, w0 double, w1 double, w2 double, w3 double",
    )


def _lr_lift_oracle(rounds: int = _LR_ROUNDS) -> str:
    """Train (same unrolled rounds as td_quality_lr_train) then score
    every doc and bucket into 10 score deciles: per decile the label
    rate and the cumulative lift over the base rate — the gain chart a
    quality-filter threshold is picked from."""
    body = ",".join(_lr_round_sql(i) for i in range(1, rounds + 1))
    return f"""
WITH {_LR_FEATS_SQL.strip()},{body},
scored AS (
  SELECT f.doc_id, CAST(f.y AS BIGINT) AS y,
    1.0 / (1.0 + exp(-(w.w0 + w.w1 * f1 + w.w2 * f2 + w.w3 * f3))) AS p
  FROM feats f CROSS JOIN w{rounds}_ w),
dec AS (
  SELECT y, NTILE(10) OVER (ORDER BY p DESC, doc_id) AS decile
  FROM scored),
g AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(y) AS BIGINT) AS pos
  FROM dec GROUP BY decile),
c AS (
  SELECT decile, n, pos,
    CAST(SUM(n) OVER (ORDER BY decile
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
    CAST(SUM(pos) OVER (ORDER BY decile
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
    CAST(SUM(n) OVER () AS BIGINT) AS tn,
    CAST(SUM(pos) OVER () AS BIGINT) AS tp
  FROM g)
SELECT CAST(decile AS INTEGER) AS decile, n, pos,
  ROUND(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
  ROUND((CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
        / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS cum_lift
FROM c ORDER BY decile
"""


@query("td_quality_lr_lift", oracle=_lr_lift_oracle())
def td_quality_lr_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gain/lift table for the in-engine-trained quality
    classifier — the APPLY half of td_quality_lr_train and the chart a
    filtering threshold is actually picked from: docs ranked by
    predicted quality, cut into 10 equal buckets (NTILE over score DESC
    with doc_id tie-break — deterministic), per-decile label rate and
    cumulative lift over the base rate.  Training replays the same 10
    quantized GD rounds (identical weights by construction); scoring is
    one codegen'd projection; the decile sort is the one extra exchange
    (same caveat as rel_equidepth_histogram — the 100 TB variant cuts
    on approx-quantile boundaries instead of a total NTILE sort).
    A working classifier shows lift >1 in decile 1 monotonically
    decaying toward 1 — pinned in pytest."""
    feats = _lr_features(spark, sf_dir)
    _hist, w = _lr_fit(feats)
    z = (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("f1")
        + F.lit(w[2]) * F.col("f2")
        + F.lit(w[3]) * F.col("f3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    scored = feats.select(
        "doc_id", F.col("y").cast("long").alias("y"), p.alias("p")
    )
    dec = scored.select(
        "y",
        F.ntile(10)
        .over(Window.orderBy(F.desc("p"), F.asc("doc_id")))
        .alias("decile"),
    )
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "decile", "n", "pos",
        F.sum("n").over(w_cum).cast("long").alias("cn"),
        F.sum("pos").over(w_cum).cast("long").alias("cp"),
        F.sum("n").over(w_all).cast("long").alias("tn"),
        F.sum("pos").over(w_all).cast("long").alias("tp"),
    )
    return c.select(
        F.col("decile").cast("int").alias("decile"),
        "n",
        "pos",
        F.round(
            F.col("pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("pos_rate"),
        F.round(
            (F.col("cp").cast("double") / F.col("cn").cast("double"))
            / (F.col("tp").cast("double") / F.col("tn").cast("double")),
            6,
        ).alias("cum_lift"),
    ).orderBy("decile")


@query(
    "td_corpus_snapshot_diff",
    # Release-to-release corpus diff: v2 is derived deterministically
    # (every 10th doc edited, every 17th removed, one new doc per
    # removed), then a full-outer md5 comparison classifies every
    # doc_id — the etl_snapshot_diff CDC shape applied to the corpus
    # release workflow td_dataset_card reports on.
    oracle="""
WITH v1 AS (SELECT doc_id, md5(text) AS h, n_chars FROM documents),
v2 AS (
  SELECT doc_id,
    md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END) AS h,
    CASE WHEN doc_id % 10 = 0 THEN n_chars + 3 ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 1000000, md5('replacement for ' || CAST(doc_id AS VARCHAR)),
    CAST(16 + length(CAST(doc_id AS VARCHAR)) AS BIGINT)
  FROM documents WHERE doc_id % 17 = 0),
d AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
    a.h AS h1, b.h AS h2,
    COALESCE(b.n_chars, 0) - COALESCE(a.n_chars, 0) AS dc
  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
SELECT
  CAST(SUM(CASE WHEN h1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
  CAST(SUM(CASE WHEN h2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  CAST(SUM(CASE WHEN h1 IS NOT NULL AND h2 IS NOT NULL AND h1 <> h2
           THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
  CAST(SUM(CASE WHEN h1 = h2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
  CAST(SUM(dc) AS BIGINT) AS chars_delta
FROM d
""",
)
def td_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus release diff — the change audit between two dataset
    versions (the documents table and a deterministically-derived v2:
    10% edited, 1/17 removed and replaced): full-outer join on doc_id
    comparing content md5, classifying every doc as added / removed /
    changed / unchanged, plus the net character delta.  One
    co-partitioned full-outer join on the id (the etl_snapshot_diff CDC
    shape) + one scalar aggregate — linear, AQE-splittable, no
    driver-side state."""
    docs = table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", F.md5("text").alias("h"), "n_chars")
    kept = docs.where(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 10 == 0, F.concat("text", F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("h"),
        F.when(F.col("doc_id") % 10 == 0, F.col("n_chars") + 3)
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )
    repl = docs.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.md5(
            F.concat(F.lit("replacement for "), F.col("doc_id").cast("string"))
        ).alias("h"),
        (16 + F.length(F.col("doc_id").cast("string"))).cast("long")
        .alias("n_chars"),
    )
    v2 = kept.unionByName(repl)
    a = v1.select(
        F.col("doc_id"), F.col("h").alias("h1"), F.col("n_chars").alias("c1")
    )
    b = v2.select(
        F.col("doc_id"), F.col("h").alias("h2"), F.col("n_chars").alias("c2")
    )
    d = a.join(b, "doc_id", "full_outer").select(
        "h1", "h2",
        (F.coalesce("c2", F.lit(0)) - F.coalesce("c1", F.lit(0))).alias("dc"),
    )
    return d.agg(
        F.sum(F.when(F.col("h1").isNull(), 1).otherwise(0))
        .cast("long").alias("n_added"),
        F.sum(F.when(F.col("h2").isNull(), 1).otherwise(0))
        .cast("long").alias("n_removed"),
        F.sum(
            F.when(
                F.col("h1").isNotNull()
                & F.col("h2").isNotNull()
                & (F.col("h1") != F.col("h2")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_changed"),
        F.sum(F.when(F.col("h1") == F.col("h2"), 1).otherwise(0))
        .cast("long").alias("n_unchanged"),
        F.sum("dc").cast("long").alias("chars_delta"),
    )
