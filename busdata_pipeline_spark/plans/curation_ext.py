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
WITH toks AS (
  SELECT doc_id, i, t[i] AS w
  FROM (SELECT doc_id, string_split(TRIM(text), ' ') AS t FROM documents),
       UNNEST(range(1, len(t) + 1)) r(i)
  WHERE t[i] <> ''),
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
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  ROUND(-CAST(SUM(lpm) AS BIGINT) / 1000000.0 / COUNT(*), 6) AS xent_nats
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
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), " ")).alias("i", "w"),
    ).where(F.col("w") != "")
    w_next = Window.partitionBy("doc_id").orderBy("i")
    big = (
        toks.withColumn("w2", F.lead("w").over(w_next))
        .where(F.col("w2").isNotNull())
        .select("doc_id", F.col("w").alias("w1"), "w2")
    )
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
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                (-F.sum("lpm")).cast("double")
                / F.lit(1000000.0)
                / F.count(F.lit(1)),
                6,
            ).alias("xent_nats"),
        )
        .orderBy("doc_id")
    )
