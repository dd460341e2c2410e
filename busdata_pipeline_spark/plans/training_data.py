"""Training-data pipeline surface (BASELINE.json north star): text
analysis, dedup, similarity search, multimodal plumbing — registered as
driver-checked queries over ``documents`` / ``embeddings``.

Every entry is oracle-checked.  Where ANSI SQL can express the exact
same arithmetic (marker counting, shingle Jaccard, double-precision
cosine) the oracle is definitional; the seeded approximate operators
(LSH / SimHash / IVF) are replayed in full with their constants embedded
as SQL literals; the sketch estimators are checked via error-bound
invariants over exact anchors.  Ground-truth recall/accuracy tests live
in tests/test_training_data.py on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from busdata_pipeline_spark.functions.text import (
    BPE_TOKEN_PATTERN,
    LANG_MARKERS,
    PUNCT,
    STOPWORDS,
    avg_token_len,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    token_count_bpe,
)
from busdata_pipeline_spark.operators import (
    clustering,
    dedup,
    multimodal,
    packing,
    quantize,
    similarity,
)
from busdata_pipeline_spark.plans.registry import ORACLES, query
from busdata_pipeline_spark.sources import table

# ---------------------------------------------------------------------------
# text analysis

@query(
    "td_text_stats",
    oracle="""
SELECT doc_id,
  LENGTH(text) AS n_chars_calc,
  CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
       ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END AS BIGINT) AS n_tokens,
  ROUND(CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 > 0
       THEN CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
            / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) END, 6) AS avg_token_len
FROM documents
""",
)
def td_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + length stats as pure length arithmetic — the same
    formula on both engines, no regex dialect in play."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        token_count("text").alias("n_tokens"),
        F.round(avg_token_len("text"), 6).alias("avg_token_len"),
    )


def _occ_sql(marker: str) -> str:
    m = marker.replace("'", "''")
    return (
        f"CAST((LENGTH(text) - LENGTH(REPLACE(text, '{m}', ''))) / {len(marker)} AS BIGINT)"
    )


def _lang_id_oracle() -> str:
    score_cols = ", ".join(
        " + ".join(_occ_sql(m) for m in ms) + f" AS s_{lang}"
        for lang, ms in LANG_MARKERS.items()
    )
    greatest = "GREATEST(" + ", ".join(f"s_{lang}" for lang in LANG_MARKERS) + ")"
    whens = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in LANG_MARKERS)
    return f"""
WITH scored AS (SELECT doc_id, {score_cols} FROM documents),
best AS (SELECT *, {greatest} AS best FROM scored)
SELECT doc_id, CASE WHEN best = 0 THEN 'und' {whens} END AS lang_pred FROM best
"""


@query("td_lang_id", oracle=_lang_id_oracle())
def td_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-count language ID (argmax with fixed tie order) — the
    n-gram-profile heuristic structure, engine-portable."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id("text").alias("lang_pred"))


@query(
    "td_quality_filter",
    oracle="""
WITH t AS (
  SELECT doc_id,
    CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
         ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END AS n,
    CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 > 0
         THEN CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
              / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) END AS atl
  FROM documents)
SELECT doc_id,
  -- CAST: DuckDB types the 0.5 literals as DECIMAL(2,1) and keeps the
  -- sum decimal; Spark's quality_score is DOUBLE — align the width.
  ROUND(CAST((CASE WHEN n >= 10 AND n <= 100000 THEN 0.5 ELSE 0.0 END)
      + (CASE WHEN atl >= 2.0 AND atl <= 12.0 THEN 0.5 ELSE 0.0 END)
      AS DOUBLE), 6) AS quality
FROM t
""",
)
def td_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-shaped quality scoring (length + token-shape bands)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


@query(
    "td_train_val_split",
    oracle="""
SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '1a'
            THEN 'val' ELSE 'train' END AS split,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 6) AS avg_chars
FROM documents
GROUP BY 1
""",
)
def td_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% holdout split: membership is a pure function
    of the stable doc_id's md5 (hex '00'..'19' of 'ff' ≈ 10.2%), so the
    split is reproducible across runs, engines, and cluster sizes — no
    RNG state, no sampling shuffle, new documents never reshuffle old
    assignments.  The split column is a one-expression projection any
    downstream query can filter on."""
    docs = table(spark, sf_dir, "documents")
    split = F.when(
        F.md5(F.col("doc_id").cast("string")) < "1a", "val"
    ).otherwise("train")
    return (
        docs.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


def _stopword_hits_sql() -> str:
    padded = "(' ' || text || ' ')"
    terms = [
        f"(LENGTH({padded}) - LENGTH(REPLACE({padded}, ' {w} ', ''))) / {len(w) + 2}"
        for w in STOPWORDS
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@query(
    "td_text_ratios",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text,
    CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
         ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END AS n_tok
  FROM documents)
SELECT doc_id,
  ROUND(CASE WHEN LENGTH(text) > 0 THEN
    CAST(LENGTH(text) - LENGTH(translate(text, '{PUNCT}', '')) AS DOUBLE)
      / LENGTH(text) END, 6) AS punct_ratio,
  ROUND(CASE WHEN n_tok > 0 THEN
    CAST({_stopword_hits_sql()} AS DOUBLE) / n_tok END, 6) AS stopword_ratio,
  CAST(len(regexp_extract_all(text, '{BPE_TOKEN_PATTERN}')) AS BIGINT)
    AS n_bpe_tokens
FROM t
""",
)
def td_text_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ratio features: punctuation density, stopword share
    (non-overlapping padded-match arithmetic, identical in the oracle),
    and the BPE-ish pre-tokenization count via regexp_extract_all —
    all whole-stage-codegen column algebra."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(stopword_ratio("text"), 6).alias("stopword_ratio"),
        token_count_bpe("text").alias("n_bpe_tokens"),
    )


@query(
    "td_fingerprint",
    oracle="SELECT doc_id, md5(TRIM(text)) AS fp FROM documents",
)
def td_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic doc fingerprint (md5) — the exact-dedup key."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


@query(
    "td_pii_redact",
    oracle="""
WITH planted AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0
         THEN t || ' call 503-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE t END AS t
  FROM (
    SELECT doc_id,
      CASE WHEN doc_id % 3 = 0
           THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
           ELSE text END AS t
    FROM documents)
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
  md5(regexp_replace(
        regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS redacted_md5
FROM planted
""",
)
def td_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (training-data hygiene): emails and
    phone numbers are planted deterministically into the synthetic docs
    (doc_id % 3 / % 5), counted (regexp_count) and redacted
    (regexp_replace chain, compared via md5 of the redacted text).  The
    regex subset is restricted to constructs identical in Java regex and
    RE2, so both engines see the same matches.  Pure codegen'd column
    expressions — redaction at 100 TB is a map-only pass, no shuffle."""
    from busdata_pipeline_spark.functions.text import pii_counts, redact_pii

    docs = table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "t",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                "text", F.lit(" contact user"),
                F.col("doc_id").cast("string"), F.lit("@example.com now"),
            ),
        ).otherwise(F.col("text")),
    ).withColumn(
        "t",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                "t", F.lit(" call 503-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("t")),
    )
    counts = pii_counts("t")
    return planted.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        F.md5(redact_pii("t")).alias("redacted_md5"),
    )


@query(
    "td_contamination",
    oracle="""
WITH sh AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(1, GREATEST(len(string_split(TRIM(text), ' ')) - 1, 1)),
      i -> string_split(TRIM(text), ' ')[i] || ' ' ||
           string_split(TRIM(text), ' ')[i+1] || ' ' ||
           string_split(TRIM(text), ' ')[i+2])) AS shingles
  FROM documents),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
rare AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= 10),
rex AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN rare USING (shingle)),
bench AS (SELECT DISTINCT shingle, doc_id AS bdoc FROM rex WHERE doc_id % 17 = 0),
train AS (SELECT doc_id, shingle FROM rex WHERE doc_id % 17 <> 0)
SELECT t.doc_id AS doc_id,
  CAST(COUNT(DISTINCT b.bdoc) AS BIGINT) AS n_bench_docs
FROM train t JOIN bench b USING (shingle)
GROUP BY t.doc_id
""",
)
def td_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination sweep: training docs (doc_id % 17 != 0)
    sharing any RARE word-3-gram with the benchmark slice (% 17 == 0).
    Candidates come from a df-filtered shingle equi-join (stop-shingles
    with df > 10 are dropped BEFORE the join) — the skew-bounded
    formulation that survives 100 TB, never a pairwise comparison.  See
    operators/contamination.py."""
    from busdata_pipeline_spark.operators.contamination import (
        contamination_hits,
    )

    docs = table(spark, sf_dir, "documents")
    return contamination_hits(docs, F.col("doc_id") % 17 == 0)


@query(
    "td_repetition",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS t FROM documents),
cnt AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t)
SELECT doc_id,
  ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) + 0.0 AS rep_ratio
FROM cnt GROUP BY doc_id
""",
)
def td_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition ratio (most-frequent-token share) — the
    boilerplate/spam signal C4-style filters threshold on.  Two hash
    aggregates after one explode; both shuffles are on (doc, token) /
    doc keys, so the plan is flat at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("t")
    )
    cnt = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("rep_ratio")
    )


_TOKENS_SQL = """CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
       ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END AS BIGINT)"""

_QUALITY_SQL = """ROUND(CAST(
  (CASE WHEN (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
        ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END)
        BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
  + (CASE WHEN (CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
        / NULLIF(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1, 0))
        BETWEEN 2.0 AND 12.0 THEN 0.5 ELSE 0.0 END) AS DOUBLE), 6)"""


@query(
    "td_domain_quota",
    oracle=f"""
WITH q AS (
  SELECT doc_id, source, {_QUALITY_SQL} AS quality FROM documents),
r AS (
  SELECT doc_id, source, quality,
    CAST(ROW_NUMBER() OVER (PARTITION BY source
         ORDER BY quality DESC, doc_id) AS BIGINT) AS rk
  FROM q)
SELECT doc_id, source, quality, rk FROM r WHERE rk <= 15
""",
)
def td_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota capping: keep at most 15 docs per source, best
    quality first (ties broken by doc_id so the survivor set is
    deterministic).  The standard over-represented-domain guard in a
    training-data mix; one window shuffle keyed by source — domains are
    many and the per-domain cap bounds skew by construction."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        docs.select(
            "doc_id", "source", quality_score("text").alias("quality")
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 15)
    )


@query(
    "td_stratified_sample",
    oracle="""
WITH r AS (
  SELECT doc_id, lang,
    CAST(ROW_NUMBER() OVER (PARTITION BY lang
         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents)
SELECT doc_id, lang, rk FROM r WHERE rk <= 50
""",
)
def td_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-language sample: 50 docs per lang, selected by md5
    rank of the stable doc_id — deterministic across runs, engines, and
    cluster sizes (same contract as td_train_val_split), no RNG state.
    Rebalancing language mixes is a first-class training-data op."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 50)
    )


#: target language mixture in integer percent (sums to 100) — integer
#: weights keep every quota computation in exact arithmetic: n*100/w and
#: w*T/100 are ratios of sub-2^53 integers, so FLOOR sees the same double
#: in both engines.
_MIXTURE_PCT = [("en", 40), ("zh", 15), ("es", 15), ("de", 15), ("fr", 15)]


@query(
    "td_mixture_resample",
    oracle=f"""
WITH tgt(lang, w) AS (VALUES {", ".join("('%s', %d)" % t for t in _MIXTURE_PCT)}),
c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
t AS (SELECT CAST(MIN(FLOOR(n * 100 / w)) AS BIGINT) AS total
      FROM c JOIN tgt USING (lang)),
kept AS (SELECT lang, CAST(FLOOR(w * total / 100) AS BIGINT) AS quota
         FROM tgt CROSS JOIN t),
r AS (SELECT doc_id, lang,
        CAST(ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      FROM documents)
SELECT r.doc_id, r.lang, r.rk, kept.quota
FROM r JOIN kept USING (lang) WHERE rk <= quota
""",
)
def td_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the corpus to a TARGET language mixture (en 40%, rest
    15% each) at the maximum feasible size: T = min_l floor(n_l·100/w_l)
    is the largest total for which every language can fill its share,
    then each language keeps floor(w_l·T/100) docs by md5 rank of the
    stable doc_id.  This is the mixture-weighting step of an LLM data
    pipeline (per-source/per-language sampling to a spec), distinct from
    the fixed-quota `td_stratified_sample`.

    Scale shape: one 5-row dim agg, a 1-row feasible-total broadcast
    (scalar expansion), one per-lang window rank — no global sort; the
    rank window parallelizes across languages and, at 100 TB, would key
    on (lang, salt) with per-salt quotas."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    tgt = spark.createDataFrame(_MIXTURE_PCT, "lang string, w int")
    counts = docs.groupBy("lang").count().withColumnRenamed("count", "n")
    total = (
        counts.join(tgt, "lang")
        .agg(F.min(F.floor(F.col("n") * 100 / F.col("w"))).cast("long").alias("total"))
    )
    kept = tgt.crossJoin(F.broadcast(total)).select(
        "lang", F.floor(F.col("w") * F.col("total") / 100).cast("long").alias("quota")
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    ranked = docs.select("doc_id", "lang").withColumn(
        "rk", F.row_number().over(w).cast("long")
    )
    return ranked.join(F.broadcast(kept), "lang").where(
        F.col("rk") <= F.col("quota")
    ).select("doc_id", "lang", "rk", "quota")


@query(
    "td_global_shuffle_shards",
    oracle="""
WITH h AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      % 8 AS shard
  FROM documents)
SELECT doc_id, shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard
       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
FROM h
""",
)
def td_global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training export: shard by the
    top 60 bits of md5(doc_id) mod 8, order within a shard by the full
    md5 — a seeded permutation with NO global sort and no RNG state.
    Shards are hash-balanced, each shard orders independently (the
    window parallelizes per shard), and the layout is reproducible on
    any cluster size — the properties a 100 TB pretraining-data shuffle
    needs (epoch reshuffle = change the salt in the hashed string)."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    sharded = docs.select(
        "doc_id",
        (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % 8).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return sharded.withColumn("pos", F.row_number().over(w).cast("long"))


@query(
    "td_sequence_packing",
    # The oracle states packing as ONE global window cumsum; the Spark
    # side computes the identical numbers with a two-level distributed
    # prefix sum (operators/packing.py) so no stage is single-partition.
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_tokens
  FROM t)
SELECT CAST(FLOOR(cum_tokens / 1024.0) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM c
GROUP BY 1
""",
)
def td_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into 1024-token bins: docs are
    assigned to the bin containing their first token in stable doc_id
    order.  Per-bin summary (bin_id, n_docs, total_tokens)."""
    docs = table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    return packing.pack_bins(with_tokens, budget=1024)


@query(
    "td_pipeline_funnel",
    # End-to-end pipeline composition as ONE oracled query: the same
    # quality -> exact-dedup -> near-dup-survivor chain a real corpus
    # build runs, with per-stage counts.  The near-dup stage is LSH on
    # the Spark side and definitional all-pairs closure in the oracle
    # (equality guaranteed for this data — see td_minhash_near_dups).
    # The pair scan runs over `ex` — already one doc per DISTINCT text
    # (the rule-16 quotient is built into the pipeline itself), so it
    # is base-sized at every replica rung; sh/edges/sym are
    # MATERIALIZED (rule 7) so the recursive closure cannot re-inline
    # the 12M-intersect edge build once per round.
    oracle="""
WITH RECURSIVE q AS (
  SELECT doc_id, text FROM documents
  WHERE (CASE WHEN (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
        ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END)
        BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
      + (CASE WHEN (CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
        / NULLIF(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1, 0))
        BETWEEN 2.0 AND 12.0 THEN 0.5 ELSE 0.0 END) >= 0.5),
ex AS MATERIALIZED (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
      ROW_NUMBER() OVER (PARTITION BY md5(TRIM(text)) ORDER BY doc_id) AS rn
    FROM q) WHERE rn = 1),
sh AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN len(string_split(TRIM(text),' ')) >= 3 THEN
    list_distinct(list_transform(
      range(1, len(string_split(TRIM(text), ' ')) - 1),
      i -> string_split(TRIM(text), ' ')[i] || ' ' ||
           string_split(TRIM(text), ' ')[i+1] || ' ' ||
           string_split(TRIM(text), ' ')[i+2])) ELSE [] END AS shingles
  FROM ex),
toks AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS tok FROM sh),
szs AS MATERIALIZED (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS sz FROM sh),
inter AS MATERIALIZED (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM toks x JOIN toks y ON y.tok = x.tok AND y.doc_id > x.doc_id
  GROUP BY x.doc_id, y.doc_id),
edges AS MATERIALIZED (
  SELECT i.a, i.b
  FROM inter i JOIN szs sa ON sa.doc_id = i.a JOIN szs sb ON sb.doc_id = i.b
  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.5),
sym AS MATERIALIZED (
  SELECT a AS v, b AS w FROM edges UNION SELECT b, a FROM edges),
reach(v, w) AS (
  SELECT v, v FROM sym GROUP BY v
  UNION
  SELECT r.v, s.w FROM reach r JOIN sym s ON s.v = r.w),
clusters AS (SELECT v AS doc_id, MIN(w) AS cluster_id FROM reach GROUP BY v),
nd AS (
  SELECT e.doc_id FROM ex e LEFT JOIN clusters c ON e.doc_id = c.doc_id
  WHERE c.doc_id IS NULL OR c.cluster_id = e.doc_id)
SELECT * FROM (
  SELECT 0 AS stage, 'input' AS name,
         (SELECT COUNT(*) FROM documents) AS n_docs
  UNION ALL SELECT 1, 'quality>=0.5', (SELECT COUNT(*) FROM q)
  UNION ALL SELECT 2, 'exact_dedup', (SELECT COUNT(*) FROM ex)
  UNION ALL SELECT 3, 'near_dedup', (SELECT COUNT(*) FROM nd))
""",
)
def td_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-build pipeline as one query: quality filter ->
    exact dedup (lowest-id survivor per fingerprint) -> near-dup dedup
    (keep one doc per LSH cluster), reported as a per-stage funnel.
    Every stage is the registered operator itself — this is composition,
    not re-implementation."""
    from busdata_pipeline_spark.functions.text import quality_score

    docs = table(spark, sf_dir, "documents")
    q = docs.where(quality_score("text") >= 0.5)
    ex = dedup.drop_exact_duplicates(q)
    # rule-16 quotient clusters: CC on the distinct-text rep graph
    clusters = dedup.minhash_text_clusters(ex, threshold=0.5)
    nd = ex.join(clusters, "doc_id", "left").where(
        F.col("cluster_id").isNull()
        | (F.col("cluster_id") == F.col("doc_id"))
    )

    def stage(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(i).cast("int").alias("stage"),
            F.lit(name).alias("name"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    return (
        stage(0, "input", docs)
        .unionByName(stage(1, "quality>=0.5", q))
        .unionByName(stage(2, "exact_dedup", ex))
        .unionByName(stage(3, "near_dedup", nd))
    )


@query(
    "td_corpus_release",
    # Capstone composition (VERDICT r10 task #7): the same quality ->
    # exact-dedup -> near-dup-survivor chain as td_pipeline_funnel, but
    # emitting the RELEASE MANIFEST itself — survivor doc ids with
    # token counts and a leakage-safe split — so the operators are
    # hash-proven to compose into the artifact a corpus build ships,
    # not just into stage counts.  The oracle shares the funnel's
    # MATERIALIZED rep-level closure (base-sized at every replica
    # rung, ORACLES.md rules 7 + 16); the split is keyed on the
    # survivor id, which IS the near-dup group id (one survivor per
    # cluster), so it is cluster-granular by construction, mirroring
    # td_leakage_safe_split.
    oracle="""
WITH RECURSIVE q AS (
  SELECT doc_id, text FROM documents
  WHERE (CASE WHEN (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
        ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END)
        BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
      + (CASE WHEN (CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
        / NULLIF(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1, 0))
        BETWEEN 2.0 AND 12.0 THEN 0.5 ELSE 0.0 END) >= 0.5),
ex AS MATERIALIZED (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
      ROW_NUMBER() OVER (PARTITION BY md5(TRIM(text)) ORDER BY doc_id) AS rn
    FROM q) WHERE rn = 1),
sh AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN len(string_split(TRIM(text),' ')) >= 3 THEN
    list_distinct(list_transform(
      range(1, len(string_split(TRIM(text), ' ')) - 1),
      i -> string_split(TRIM(text), ' ')[i] || ' ' ||
           string_split(TRIM(text), ' ')[i+1] || ' ' ||
           string_split(TRIM(text), ' ')[i+2])) ELSE [] END AS shingles
  FROM ex),
toks AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS tok FROM sh),
szs AS MATERIALIZED (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS sz FROM sh),
inter AS MATERIALIZED (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM toks x JOIN toks y ON y.tok = x.tok AND y.doc_id > x.doc_id
  GROUP BY x.doc_id, y.doc_id),
edges AS MATERIALIZED (
  SELECT i.a, i.b
  FROM inter i JOIN szs sa ON sa.doc_id = i.a JOIN szs sb ON sb.doc_id = i.b
  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.5),
sym AS MATERIALIZED (
  SELECT a AS v, b AS w FROM edges UNION SELECT b, a FROM edges),
reach(v, w) AS (
  SELECT v, v FROM sym GROUP BY v
  UNION
  SELECT r.v, s.w FROM reach r JOIN sym s ON s.v = r.w),
clusters AS (SELECT v AS doc_id, MIN(w) AS cluster_id FROM reach GROUP BY v),
nd AS (
  SELECT e.doc_id, e.text FROM ex e LEFT JOIN clusters c ON e.doc_id = c.doc_id
  WHERE c.doc_id IS NULL OR c.cluster_id = e.doc_id)
SELECT n.doc_id,
       d.n_chars,
       CAST(len(list_filter(string_split(TRIM(n.text), ' '),
                            x -> x <> '')) AS BIGINT) AS n_tokens,
       CASE WHEN substring(md5(CAST(n.doc_id AS VARCHAR)), 1, 2) < 'f0'
            THEN 'train' ELSE 'val' END AS split
FROM nd n JOIN documents d ON d.doc_id = n.doc_id
ORDER BY n.doc_id
""",
)
def td_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-release capstone: quality gate -> exact dedup -> MinHash
    near-dup survivors -> release manifest (doc_id, n_chars, n_tokens,
    leakage-safe split).  Every stage is the registered operator itself
    (functions.text.quality_score, dedup.drop_exact_duplicates,
    dedup.minhash_near_duplicates, clustering.dedup_clusters) — this
    entry proves they compose into the shipped artifact.  At scale the
    chain is the sum of its parts: one hash-partitioned dedup shuffle,
    the banded-LSH equi-join, the bounded label-prop closure, then a
    broadcast-size survivor join back to the dim columns."""
    from busdata_pipeline_spark.functions.text import quality_score

    docs = table(spark, sf_dir, "documents")
    q = docs.where(quality_score("text") >= 0.5)
    ex = dedup.drop_exact_duplicates(q)
    # rule-16 quotient clusters: CC on the distinct-text rep graph
    clusters = dedup.minhash_text_clusters(ex, threshold=0.5)
    nd = ex.join(clusters, "doc_id", "left").where(
        F.col("cluster_id").isNull()
        | (F.col("cluster_id") == F.col("doc_id"))
    )
    words = F.split(F.trim("text"), " ")
    return (
        nd.select(
            "doc_id",
            F.size(F.filter(words, lambda x: x != "")).cast("bigint")
            .alias("n_tokens"),
        )
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select("doc_id", "n_chars", "n_tokens",
                F.when(F.substring(F.md5(F.col("doc_id").cast("string")),
                                   1, 2) < "f0", "train")
                .otherwise("val").alias("split"))
        .orderBy("doc_id")
    )


@query(
    "td_char_entropy",
    # Shannon entropy carries log2 sums whose float value could in
    # principle differ across engines by summation order (~1e-13); the
    # closest round-6 boundary in this data sits ~5.7e-10 away (measured),
    # a ~4000x margin, so the hash comparison is deterministic.
    oracle="""
WITH ch AS (
  SELECT doc_id, substring(text, CAST(i AS INTEGER), 1) AS ch
  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)),
freq AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch)
SELECT doc_id,
  ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 6) AS entropy_bits
FROM freq GROUP BY doc_id
""",
)
def td_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (bits/char) — the
    classic gibberish/compression-artifact detector in corpus filtering.
    Formulated as log2(n) - sum(c*log2(c))/n so only per-distinct-char
    logs are taken; frequency build is one explode + hash aggregate."""
    docs = dedup.fanout(table(spark, sf_dir, "documents"), "doc_id")
    chars = (
        docs.select(
            "doc_id",
            # guard: zero-length text -> no char rows (Spark's
            # sequence(1, 0) counts DOWN; DuckDB's range(1, 1) is empty)
            F.explode_outer(
                F.expr(
                    "CASE WHEN length(text) >= 1 THEN "
                    "transform(sequence(1, length(text)), "
                    "i -> substring(text, i, 1)) "
                    "ELSE CAST(array() AS array<string>) END"
                )
            ).alias("ch"),
        )
        .where(F.col("ch").isNotNull())
    )
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    return freq.groupBy("doc_id").agg(
        F.round(
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            6,
        ).alias("entropy_bits")
    )


@query(
    "td_rarity_score",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(TRIM(text), ' ')) AS tok
  FROM documents),
tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
dfreq AS (SELECT tok, COUNT(*) AS df FROM tok2 GROUP BY tok)
SELECT t.doc_id,
  COUNT(*) AS n_distinct_tokens,
  ROUND(AVG(d.df), 6) AS mean_token_df
FROM tok2 t JOIN dfreq d ON t.tok = d.tok
GROUP BY t.doc_id
""",
)
def td_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-rarity scoring: mean corpus document-frequency of each
    document's distinct tokens — a model-free 'how unusual is this doc'
    signal (low mean df = rare vocabulary; boilerplate scores high).
    Two hash shuffles (df build, join back), integer arithmetic only so
    both engines agree exactly."""
    docs = dedup.fanout(table(spark, sf_dir, "documents"), "doc_id")
    toks = (
        docs.select(
            "doc_id",
            F.explode_outer(F.split(F.trim(F.col("text")), " ")).alias("tok"),
        )
        .where(F.col("tok").isNotNull() & (F.col("tok") != ""))
        .distinct()
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.round(F.avg("df"), 6).alias("mean_token_df"),
        )
    )


@query(
    "td_doc_chunks",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(TRIM(text), ' ') AS words,
         len(string_split(TRIM(text), ' ')) AS n
  FROM documents)
SELECT doc_id,
  CAST(c_idx AS BIGINT) AS chunk_idx,
  array_to_string(words[c_idx * 64 + 1 : LEAST((c_idx + 1) * 64, n)], ' ')
    AS chunk_text,
  CAST(LEAST(64, n - c_idx * 64) AS BIGINT) AS n_chunk_tokens
FROM w, UNNEST(range(0, CAST(CEIL(n / 64.0) AS BIGINT))) AS t(c_idx)
""",
)
def td_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document's token stream into
    64-token chunks (doc_id, chunk_idx, chunk_text, n_chunk_tokens) —
    the per-document sibling of td_sequence_packing's cross-document
    bins.  Pure array algebra (split -> slice -> posexplode), fanned out
    before the explode like the dedup pipelines."""
    docs = dedup.fanout(table(spark, sf_dir, "documents"), "doc_id")
    chunked = (
        docs.withColumn("_words", F.split(F.trim(F.col("text")), " "))
        .withColumn("_n", F.size("_words"))
        .select(
            "doc_id",
            "_n",
            F.posexplode_outer(
                F.expr(
                    "transform(sequence(0, (_n - 1) div 64), "
                    "c -> concat_ws(' ', slice(_words, c * 64 + 1, 64)))"
                )
            ).alias("chunk_idx", "chunk_text"),
        )
        .where(F.col("chunk_text").isNotNull())
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.least(
            F.lit(64), F.col("_n") - F.col("chunk_idx") * 64
        ).cast("long").alias("n_chunk_tokens"),
    )


@query(
    "td_bigrams_top50",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(TRIM(text), ' ') AS words,
         len(string_split(TRIM(text), ' ')) AS n
  FROM documents),
bg AS (
  SELECT doc_id, words[i] || ' ' || words[i + 1] AS bigram
  FROM w, UNNEST(range(1, n)) AS t(i)
  WHERE n >= 2 AND words[i] <> '' AND words[i + 1] <> '')
SELECT bigram, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM bg
GROUP BY bigram
ORDER BY tf DESC, bigram
LIMIT 50
""",
)
def td_bigrams_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram head (term + document frequency): the 2-gram sibling
    of td_vocabulary_top50, built from the same shingling machinery the
    near-dup tier uses (n=2, non-distinct so tf counts repeats)."""
    docs = dedup.fanout(table(spark, sf_dir, "documents"), "doc_id")
    grams = (
        docs.withColumn("_words", F.split(F.trim(F.col("text")), " "))
        .withColumn("_n", F.size("_words"))
        .select(
            "doc_id",
            # guard: _n < 2 -> empty pair list (sequence(1, 0) counts
            # DOWN in Spark and would index element 0 — same hazard the
            # shingle builder guards against)
            F.explode_outer(
                F.expr(
                    "CASE WHEN _n >= 2 THEN transform(sequence(1, _n - 1), "
                    "i -> struct(element_at(_words, i) as w1, "
                    "element_at(_words, i + 1) as w2)) "
                    "ELSE CAST(array() AS array<struct<w1:string,w2:string>>) END"
                )
            ).alias("pair"),
        )
        .where(
            F.col("pair").isNotNull()
            & (F.col("pair.w1") != "") & (F.col("pair.w2") != "")
        )
        .select(
            "doc_id",
            F.concat_ws(" ", "pair.w1", "pair.w2").alias("bigram"),
        )
    )
    return (
        grams.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("bigram"))
        .limit(50)
    )


@query(
    "td_vocabulary_top50",
    oracle="""
SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS tok
      FROM documents)
WHERE tok <> ''
GROUP BY tok
ORDER BY tf DESC, tok
LIMIT 50
""",
)
def td_vocabulary_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: explode tokens once, count term and
    document frequencies in one hash aggregate (df via count distinct),
    top-50 by TakeOrderedAndProject.  The vocabulary-building pass every
    tokenizer-training pipeline starts from."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("tok"))
        .limit(50)
    )


@query(
    "td_tfidf_top_terms",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS tok
  FROM documents WHERE doc_id < 100),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       WHERE tok <> '' GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks
       WHERE tok <> '' GROUP BY tok),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks)
SELECT doc_id, tok,
  ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
FROM tf JOIN df USING (tok) CROSS JOIN n
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY doc_id
  ORDER BY ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) DESC, tok) <= 3
""",
)
def td_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (first 100 docs): term frequency
    and document frequency from one exploded pass, the corpus size as a
    broadcast scalar, per-doc ranking as a WindowGroupLimit.  Ranking
    uses the ROUNDED score so the cut is engine-stable."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = toks.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .join(F.broadcast(n))
        .select(
            "doc_id", "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# dedup

@query(
    "td_dedup_exact",
    oracle="""
SELECT COUNT(*) AS total_docs,
       COUNT(DISTINCT md5(TRIM(text))) AS distinct_docs,
       COUNT(*) - COUNT(DISTINCT md5(TRIM(text))) AS duplicate_docs
FROM documents
""",
)
def td_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup summary: hash-groupBy on the fingerprint; only 16-byte
    digests shuffle, never document bodies."""
    return dedup.exact_dedup_stats(table(spark, sf_dir, "documents"))


@query(
    "td_jaccard_adjacent",
    oracle="""
WITH sh AS MATERIALIZED (
  SELECT doc_id,
    list_distinct(list_transform(
      range(1, GREATEST(len(string_split(TRIM(text), ' ')) - 1, 1)),
      i -> string_split(TRIM(text), ' ')[i] || ' ' ||
           string_split(TRIM(text), ' ')[i+1] || ' ' ||
           string_split(TRIM(text), ' ')[i+2])) AS shingles
  FROM documents)
-- sh is self-joined (a, b): MATERIALIZED above keeps DuckDB from
-- re-shingling the corpus per reference — the inlining slowness that
-- kept this LINEAR (adjacent-pair) oracle on the 10x-replica skip
-- list through r8 (ORACLES.md rule 7; 6.9 s at 10x once fixed)
SELECT a.doc_id AS a, b.doc_id AS b,
  ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
WHERE len(list_distinct(list_concat(a.shingles, b.shingles))) > 0
""",
)
def td_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard on a linear pair set (adjacent doc ids):
    the verify kernel of the near-dup pipeline, oracle-checked end to end
    (shingling included) against DuckDB's list algebra."""
    docs = table(spark, sf_dir, "documents")
    pairs = docs.select(F.col("doc_id").alias("a")).join(
        docs.select((F.col("doc_id") - 1).alias("a"), F.col("doc_id").alias("b")),
        "a",
    )
    out = dedup.jaccard_pairs(docs, pairs, pairs_small=False)
    return out.where(F.col("jaccard").isNotNull())


@query(
    "td_minhash_near_dups",
    # The oracle is the *definition* (exact all-pairs Jaccard >= 0.5), not a
    # SQL re-implementation of LSH.  Equality holds because every true pair
    # in the planted data sits at j >= 0.9, where the 8-band miss probability
    # is (1 - j^4)^8 < 3e-4 and the xxhash64 seeds are fixed — verified
    # exhaustively by tests/test_training_data.py::test_minhash_matches_exact
    # so a data change fails locally before it fails in the driver.
    #
    # Round-11 (ORACLES.md rule 16): the all-pairs relation is factored
    # through the QUOTIENT by exact text equality — identical TRIM(text)
    # implies identical shingle sets, so jaccard is computed ONCE per
    # distinct-text pair (rp) and expanded back to doc pairs by join;
    # within-group pairs are exactly 1.0 (x/x of a positive length).
    # The rep-pair kernel is RELATIONAL: explode shingles (toks),
    # equi-join on the shared token, and COUNT per (ha, hb) group —
    # the intersection size falls out of the join itself, touching
    # only pairs that share at least one shingle (disjoint pairs never
    # materialize).  That replaces the per-pair list_intersect
    # formulation whose ~166us/pair over 12.5M all-pairs at 4,992 reps
    # cost ~33 min; the exact intersect is unchanged, so this is
    # algebraically identical on any data (cross-checked old-vs-new at
    # sf0.01 AND the 5,000-doc sf0.1 base), and output-bound on the
    # duplicate-heavy scale replicas (500k docs share 4,992 distinct
    # texts at the 100x rung).  (The ENGINE's td_setsim_prefix_join
    # additionally prefix-filters a la AllPairs; this oracle does not
    # need to — the token join is already candidate-bounded.)
    oracle="""
WITH grp AS MATERIALIZED (
  SELECT md5(TRIM(text)) AS h, MIN(doc_id) AS rep_id, MAX(TRIM(text)) AS t,
         COUNT(*) AS cnt
  FROM documents GROUP BY md5(TRIM(text))),
docs AS MATERIALIZED (
  SELECT doc_id, md5(TRIM(text)) AS h FROM documents),
sh AS MATERIALIZED (
  SELECT h, rep_id,
    CASE WHEN len(string_split(t,' ')) >= 3 THEN
    list_distinct(list_transform(
      range(1, len(string_split(t, ' ')) - 1),
      i -> string_split(t, ' ')[i] || ' ' ||
           string_split(t, ' ')[i+1] || ' ' ||
           string_split(t, ' ')[i+2])) ELSE [] END AS shingles
  FROM grp),
toks AS MATERIALIZED (SELECT h, rep_id, unnest(shingles) AS tok FROM sh),
szs AS MATERIALIZED (SELECT h, CAST(len(shingles) AS BIGINT) AS sz FROM sh),
inter AS MATERIALIZED (
  SELECT x.h AS ha, y.h AS hb, CAST(COUNT(*) AS BIGINT) AS inter
  FROM toks x JOIN toks y ON y.tok = x.tok AND y.rep_id > x.rep_id
  GROUP BY x.h, y.h),
rp AS MATERIALIZED (
  SELECT i.ha, i.hb,
    ROUND(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard
  FROM inter i JOIN szs sa ON sa.h = i.ha JOIN szs sb ON sb.h = i.hb
  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.5),
rps AS (SELECT ha, hb, jaccard FROM rp
        UNION ALL SELECT hb AS ha, ha AS hb, jaccard FROM rp),
within AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(1.0 AS DOUBLE) AS jaccard
  FROM docs x JOIN docs y ON y.h = x.h AND y.doc_id > x.doc_id
  JOIN sh s ON s.h = x.h
  WHERE len(s.shingles) > 0),
crossp AS (
  SELECT x.doc_id AS a, y.doc_id AS b, r.jaccard
  FROM rps r JOIN docs x ON x.h = r.ha JOIN docs y ON y.h = r.hb
  WHERE y.doc_id > x.doc_id)
SELECT a, b, jaccard FROM within
UNION ALL
SELECT a, b, jaccard FROM crossp
""",
)
def td_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + 8-band LSH candidates + exact-Jaccard verify >= 0.5.
    Since round 12 the operator itself is quotiented by distinct
    trimmed text (rule 16, matching this oracle's own factoring — see
    minhash_near_duplicates and tests/test_quotient_identities.py).
    Ground-truth recall/precision is asserted in
    tests/test_training_data.py on planted near-duplicates."""
    docs = table(spark, sf_dir, "documents")
    return dedup.minhash_near_duplicates(docs, threshold=0.5)


# Shared CTE prefix: exact near-dup edges (the definitional ground
# truth the LSH pipeline provably matches on this data — see
# td_minhash_near_dups) feeding transitive closure.  Round-11
# (ORACLES.md rule 16): both the edge relation AND the closure are
# factored through the quotient by exact text equality — identical
# texts form a clique (one sym self-loop suffices for membership), so
# reach runs on the distinct-text graph (<=4,992 vertices at any
# replica rung) instead of accumulating clique^2 rows; the rep-pair
# kernel is the same relational intersect as td_minhash_near_dups
# (explode shingles, equi-join on the shared token, COUNT per pair —
# only pairs sharing a shingle ever materialize); doc-level clusters
# are recovered by
# expanding components through the text-hash and taking the
# component-wide MIN(doc_id) as cluster_id.
# Cross-checked old-vs-new (IDENTICAL) at sf0.01 for all four
# consumers: td_dup_clusters, td_dedup_summary,
# td_dedup_survivors_by_quality, td_leakage_safe_split.
_CLUSTER_CTE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT md5(TRIM(text)) AS h, MIN(doc_id) AS rep_id, MAX(TRIM(text)) AS t,
         COUNT(*) AS cnt
  FROM documents GROUP BY md5(TRIM(text))),
gdocs AS MATERIALIZED (
  SELECT doc_id, md5(TRIM(text)) AS h FROM documents),
sh AS MATERIALIZED (
  SELECT h, rep_id, cnt,
    CASE WHEN len(string_split(t,' ')) >= 3 THEN
    list_distinct(list_transform(
      range(1, len(string_split(t, ' ')) - 1),
      i -> string_split(t, ' ')[i] || ' ' ||
           string_split(t, ' ')[i+1] || ' ' ||
           string_split(t, ' ')[i+2])) ELSE [] END AS shingles
  FROM grp),
toks AS MATERIALIZED (SELECT h, rep_id, unnest(shingles) AS tok FROM sh),
szs AS MATERIALIZED (SELECT h, CAST(len(shingles) AS BIGINT) AS sz FROM sh),
inter AS MATERIALIZED (
  SELECT x.h AS ha, y.h AS hb, CAST(COUNT(*) AS BIGINT) AS inter
  FROM toks x JOIN toks y ON y.tok = x.tok AND y.rep_id > x.rep_id
  GROUP BY x.h, y.h),
redges AS MATERIALIZED (
  SELECT i.ha, i.hb
  FROM inter i JOIN szs sa ON sa.h = i.ha JOIN szs sb ON sb.h = i.hb
  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.5),
sym AS MATERIALIZED (
  SELECT ha AS v, hb AS w FROM redges
  UNION SELECT hb, ha FROM redges
  UNION SELECT h, h FROM sh WHERE cnt >= 2 AND len(shingles) > 0),
reach(v, w) AS (
  SELECT v, v FROM sym GROUP BY v
  UNION
  SELECT r.v, s.w FROM reach r JOIN sym s ON s.v = r.w
),
comp AS (SELECT v AS h, MIN(w) AS comp_h FROM reach GROUP BY v),
cmin AS (SELECT c.comp_h, MIN(d.doc_id) AS cluster_id
         FROM comp c JOIN gdocs d ON d.h = c.h GROUP BY c.comp_h),
clusters AS (
  SELECT d.doc_id, m.cluster_id
  FROM comp c JOIN cmin m USING (comp_h) JOIN gdocs d ON d.h = c.h)
"""


@query(
    "td_dup_clusters",
    # DuckDB can afford full transitive closure at verification scale; the
    # Spark side is hash-min label propagation (one shuffle per round,
    # O(diameter) rounds) — the formulation that survives 100 TB.
    oracle=_CLUSTER_CTE + "SELECT doc_id, cluster_id FROM clusters",
)
def td_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> connected components -> (doc_id, cluster_id).
    Cluster id is the minimum doc_id in the component, so assignment is
    deterministic and engine-independent."""
    docs = table(spark, sf_dir, "documents")
    # rule-16 quotient: CC runs on the distinct-text rep graph and
    # membership expands through the text hash — the oracle's own
    # formulation, and the difference between a ~5k-vertex closure and
    # ~25M doc-level edges at the 100x replica.
    return dedup.minhash_text_clusters(docs, threshold=0.5)


@query(
    "td_dedup_summary",
    oracle=_CLUSTER_CTE + """
SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       COUNT(*) AS n_clustered_docs,
       COUNT(DISTINCT cluster_id) AS n_clusters,
       (SELECT COUNT(*) FROM documents) - COUNT(*)
         + COUNT(DISTINCT cluster_id) AS n_after_dedup
FROM clusters
""",
)
def td_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dedup plan: keep-one-per-cluster survivor count."""
    docs = table(spark, sf_dir, "documents")
    # rule-16 quotient clusters (see td_dup_clusters); the summary
    # aggregate is unchanged arithmetic over (doc_id, cluster_id).
    clusters = dedup.minhash_text_clusters(docs, threshold=0.5)
    return clustering.summary_from_clusters(docs, clusters)


@query(
    "td_simhash_near_dups",
    # Full definitional oracle: DuckDB recomputes the identical simhash
    # (portable 60-bit md5-prefix token hash — the one hash both engines
    # evaluate bit-identically) and takes ALL pairs at Hamming <= 3; the
    # Spark side must recover exactly that set through the pigeonhole
    # chunk equi-join for the hashes to match.
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
  FROM documents
),
hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT) AS h
  FROM toks
),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hashed, range(60) t(b)
  GROUP BY doc_id, b
),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0
                       THEN (CAST(1 AS UBIGINT) << b) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT l.doc_id AS a, r.doc_id AS b,
       CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS hamming
FROM sh l JOIN sh r ON l.doc_id < r.doc_id
WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
""",
)
def td_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups (Hamming <= 3) via chunk pigeonhole, in the
    portable-hash mode (60-bit md5-prefix token hash) so the whole
    pipeline — tokenize, per-bit vote, sign, pigeonhole candidate join,
    Hamming verify — is strict-checked against DuckDB's all-pairs
    definitional form.  The xxhash64 64-bit mode (same plan, faster
    hash) stays the scale default in operators/dedup.py."""
    docs = table(spark, sf_dir, "documents")
    return dedup.simhash_near_duplicates(docs, max_hamming=3, portable=True)


@query(
    "td_embed_near_dups",
    oracle="""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
planted AS (
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding, x -> x + 0.01) AS embedding
  FROM base WHERE vec_id % 50 = 0),
all_vecs AS MATERIALIZED (
  SELECT * FROM base UNION ALL SELECT * FROM planted),
-- ORACLES.md rule 16: quotient by exact (bitwise) vector equality —
-- cosine is computed once per distinct-vector pair and expanded back;
-- identical-vector pairs evaluate list_cosine_similarity(v, v)
-- literally so the rounding path is byte-identical to the
-- definitional form.  Output-bound on duplicate-heavy replicas.
vg AS MATERIALIZED (
  SELECT embedding, MIN(vec_id) AS rep_id
  FROM all_vecs GROUP BY embedding),
rp AS MATERIALIZED (
  SELECT a.embedding AS ea, b.embedding AS eb,
         ROUND(list_cosine_similarity(a.embedding, b.embedding), 6) AS cosine
  FROM vg a JOIN vg b ON b.rep_id > a.rep_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.98),
rps AS (SELECT ea, eb, cosine FROM rp
        UNION ALL SELECT eb AS ea, ea AS eb, cosine FROM rp),
within AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         ROUND(list_cosine_similarity(x.embedding, x.embedding), 6) AS cosine
  FROM all_vecs x JOIN all_vecs y
    ON y.embedding = x.embedding AND y.vec_id > x.vec_id
  WHERE list_cosine_similarity(x.embedding, x.embedding) >= 0.98),
crossp AS (
  SELECT x.vec_id AS a, y.vec_id AS b, r.cosine
  FROM rps r
  JOIN all_vecs x ON x.embedding = r.ea
  JOIN all_vecs y ON y.embedding = r.eb
  WHERE y.vec_id > x.vec_id)
SELECT a, b, cosine FROM within
UNION ALL
SELECT a, b, cosine FROM crossp
""",
)
def td_embed_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection, oracle-checked end to end.

    The corpus is the embeddings table plus deterministic perturbed
    copies of every 50th vector (+0.01 per dimension, id +1e6) — planted
    near-duplicates at cosine ~0.9999 against a background whose max
    pairwise cosine is ~0.51, so LSH-bucketed candidates + exact-cosine
    verify must recover exactly the planted pairs to hash-match the
    oracle's O(n²) cross join."""
    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = base.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    return similarity.embedding_near_duplicates(corpus, threshold=0.98)


# ---------------------------------------------------------------------------
# similarity search

def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED query set for the ANN ladder: ``vec_id % 100 == 0 AND
    vec_id < 2000`` — ≤20 queries at ANY corpus scale.  The modulo alone
    scaled the query set WITH the corpus (2 000 queries at the sf~10
    replica → a 400M-row scored relation, 27× wall for 100× data — the
    identical defect class the round-7 ladder caught in td_bm25_search).
    Production retrieval contract: the query set is fixed, the corpus
    grows."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.where(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000)
    ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


@query(
    "td_cosine_topk",
    oracle="""
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
           FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 2000)
SELECT qid, vec_id,
  ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qvec), 6) AS cosine,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY qid
    ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), qvec) DESC,
             vec_id) AS INT) AS rank
FROM embeddings, q
WHERE vec_id <> qid
QUALIFY rank <= 10
""",
)
def td_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 — the ANN baseline, scored as one
    BLAS matmul per Arrow batch (cosine_topk_vectorized; bit-identical
    to the fold-expression formulation and the DuckDB oracle — float64
    dot products agree exactly at dim 64); rank is a WindowGroupLimit,
    not a global sort."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_vectorized(emb, _queries_df(spark, sf_dir), k=10)


def _lsh_replay_oracle(dim: int = 64, n_planes: int = 8, k: int = 10) -> str:
    """Full SQL replay of the random-hyperplane LSH pipeline: the seeded
    Gaussian planes are embedded as literals (same discipline as the
    td_ivf_ann oracle, which replays Lloyd training), buckets recomputed
    as sign-bit sums, multi-probe = XOR bit flips, exact cosine rescoring
    — so the driver hash-checks the signatures and the probe routing, not
    just output shape.  Bit-safe because both engines fold the dot
    product left-to-right over float64."""
    planes = similarity._hyperplanes(dim, n_planes)
    bucket_terms = " + ".join(
        "CASE WHEN list_dot_product(v, [%s]) > 0 THEN %d ELSE 0 END"
        % (",".join(repr(float(x)) for x in plane), 2 ** p)
        for p, plane in enumerate(planes)
    )
    probe_list = ", ".join(
        ["qbucket"] + ["xor(qbucket, %d)" % 2 ** p for p in range(n_planes)]
    )
    return f"""
WITH eb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {bucket_terms} AS bucket
  FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qvec, bucket AS qbucket
      FROM eb WHERE vec_id % 100 = 0 AND vec_id < 2000),
probes AS (SELECT qid, qvec, unnest([{probe_list}]) AS probe FROM q),
cands AS (
  SELECT p.qid, e.vec_id,
         list_cosine_similarity(e.v, p.qvec) AS cos_raw
  FROM eb e JOIN probes p ON e.bucket = p.probe
  WHERE p.qid <> e.vec_id)
SELECT qid, vec_id, ROUND(cos_raw, 6) AS cosine,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY cos_raw DESC, vec_id) AS INT) AS rank
FROM cands
QUALIFY rank <= {k}
"""


@query("td_lsh_ann", oracle=_lsh_replay_oracle())
def td_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (8 planes, multi-probe Hamming-1);
    recall vs brute force asserted in tests; the oracle replays the whole
    signature->probe->rescore pipeline in SQL (planes as literals)."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.lsh_ann_topk(emb, _queries_df(spark, sf_dir), dim=64, k=10)


def _ivf_codebook(spark: SparkSession, sf_dir: str,
                  n_clusters: int, n_iter: int) -> list:
    # Trains fresh on every call: each query invocation must compute
    # from the parquet inputs (no cross-run memo).  A query that needs
    # the codebook more than once in ONE run threads the returned list
    # through `centroids=` instead of re-calling this.
    return similarity.kmeans_centroids(
        table(spark, sf_dir, "embeddings"), n_clusters, n_iter)


@query(
    "td_ivf_ann",
    # The oracle replays the ENTIRE IVF pipeline — deterministic init
    # (8 lowest-id vectors), two unrolled Lloyd iterations with
    # 2^-20-quantized integer-sum means (bit-identical across engines in
    # any summation order), final corpus assignment, nprobe=3 query
    # routing, exact rescoring — so the trained centroids themselves are
    # hash-checked, not just the output shape.
    oracle="""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c, v
  FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT 8)),
a1 AS (
  SELECT vec_id, v, c FROM (
    SELECT vecs.vec_id, vecs.v, c0.c,
      ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
        ORDER BY list_cosine_similarity(vecs.v, c0.v) DESC, c0.c) AS rn
    FROM vecs, c0) WHERE rn = 1),
m1 AS (
  SELECT c, i,
    CAST(SUM(CAST(FLOOR(v[i + 1] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
      / (COUNT(*) * 1048576.0) AS m
  FROM a1, range(64) t(i) GROUP BY c, i),
c1 AS (
  SELECT c0.c, COALESCE(mm.v, c0.v) AS v
  FROM c0 LEFT JOIN (SELECT c, list(m ORDER BY i) AS v
                     FROM m1 GROUP BY c) mm USING (c)),
a2 AS (
  SELECT vec_id, v, c FROM (
    SELECT vecs.vec_id, vecs.v, c1.c,
      ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
        ORDER BY list_cosine_similarity(vecs.v, c1.v) DESC, c1.c) AS rn
    FROM vecs, c1) WHERE rn = 1),
m2 AS (
  SELECT c, i,
    CAST(SUM(CAST(FLOOR(v[i + 1] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
      / (COUNT(*) * 1048576.0) AS m
  FROM a2, range(64) t(i) GROUP BY c, i),
c2 AS (
  SELECT c1.c, COALESCE(mm.v, c1.v) AS v
  FROM c1 LEFT JOIN (SELECT c, list(m ORDER BY i) AS v
                     FROM m2 GROUP BY c) mm USING (c)),
af AS (
  SELECT vec_id, v, c FROM (
    SELECT vecs.vec_id, vecs.v, c2.c,
      ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
        ORDER BY list_cosine_similarity(vecs.v, c2.v) DESC, c2.c) AS rn
    FROM vecs, c2) WHERE rn = 1),
q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 2000),
routed AS (
  SELECT qid, qv, c FROM (
    SELECT q.qid, q.qv, c2.c,
      ROW_NUMBER() OVER (PARTITION BY q.qid
        ORDER BY list_cosine_similarity(q.qv, c2.v) DESC, c2.c) AS rn
    FROM q, c2) WHERE rn <= 3),
cand AS (
  SELECT r.qid, af.vec_id, list_cosine_similarity(af.v, r.qv) AS cos
  FROM routed r JOIN af ON af.c = r.c
  WHERE af.vec_id <> r.qid)
SELECT qid, vec_id, ROUND(cos, 6) AS cosine,
  CAST(ROW_NUMBER() OVER (PARTITION BY qid
       ORDER BY cos DESC, vec_id) AS INT) AS rank
FROM cand QUALIFY rank <= 10
""",
)
def td_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with REAL Lloyd training (2 iterations, 8 centroids,
    deterministic lowest-id init, quantized bit-reproducible means),
    nprobe=3 — strict-checked against a DuckDB oracle that replays
    training, routing and rescoring verbatim.  Recall@10 >= 0.9 vs the
    exact scorer is asserted on a planted clustered corpus in
    tests/test_training_data.py (this table's vectors are near-random,
    so recall here is structurally meaningless).  Replaces the former
    label-partition single-pass variant."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.ivf_kmeans_ann_topk(
        emb, _queries_df(spark, sf_dir), k=10, n_clusters=8, n_iter=2,
        nprobe=3, centroids=_ivf_codebook(spark, sf_dir, 8, 2),
    )


@query(
    "td_ann_recall_eval",
    # Recall@10 of the IVF scale path against the exact brute-force
    # scorer — the ANN QUALITY number an index build must report before
    # anyone trusts it for retrieval.  The oracle composes the two
    # registered oracles verbatim as CTEs (ex = exact, ivf = the full
    # Lloyd-replay chain), so the eval is hash-checked end to end:
    # trained centroids, routing, rescoring AND the recall arithmetic.
    # ex is referenced twice -> MATERIALIZED (ORACLES.md rule 7).
    oracle=f"""
WITH ex AS MATERIALIZED ({ORACLES["td_cosine_topk"]}),
ivf AS ({ORACLES["td_ivf_ann"]}),
hits AS (
  SELECT ex.qid, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM ex JOIN ivf ON ivf.qid = ex.qid AND ivf.vec_id = ex.vec_id
  GROUP BY ex.qid),
qs AS (SELECT DISTINCT qid FROM ex)
SELECT qs.qid, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
  ROUND(COALESCE(h.n_hits, 0) / 10.0, 6) + 0.0 AS recall_at_10
FROM qs LEFT JOIN hits h ON h.qid = qs.qid
ORDER BY qs.qid
""",
)
def td_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@10 of td_ivf_ann vs the exact scorer
    (td_cosine_topk) — the index-quality eval that closes the ANN
    ladder: brute force is the ground truth, IVF is the candidate, and
    the intersection size per query is the recall numerator.  Both
    paths break rank-10 ties identically (cosine DESC, vec_id), so the
    top-10 SETS are deterministic and the recall is exact, not
    approximate.  Scale shape: the two inputs are the existing
    bounded-query-set pipelines (<= 20 queries at any corpus scale);
    the eval itself joins two <= 200-row relations — free.  On this
    near-random corpus the recall is structurally low (see td_ivf_ann's
    docstring); the planted-cluster recall >= 0.9 assertion lives in
    tests/test_training_data.py."""
    emb = table(spark, sf_dir, "embeddings")
    qs = _queries_df(spark, sf_dir)

    # exact feeds BOTH the hits join and the qid spine; its output is
    # bounded (<= queries x 10 rows) while its lineage is a full-corpus
    # GEMM scan — materialize once instead of executing the scan twice
    # (round-12, guide §5 reuse rule; same in-query pattern as the
    # rep tables in operators/setsim.py).  The exact scorer and the IVF
    # Lloyd training are INDEPENDENT until the final hits join, and both
    # are sequences of small jobs on this session — so the checkpoint
    # runs on a driver thread while training's collect rounds proceed
    # (guide §2.6 overlap; actions are only sequential because driver
    # code calls them sequentially).  Result frames are unchanged —
    # only the job launch order differs.
    from concurrent.futures import ThreadPoolExecutor

    def _exact():
        return similarity.cosine_topk_vectorized(emb, qs, k=10).select(
            "qid", "vec_id"
        ).localCheckpoint(eager=True)

    with ThreadPoolExecutor(max_workers=1) as pool:
        exact_f = pool.submit(_exact)
        codebook = _ivf_codebook(spark, sf_dir, 8, 2)
        exact = exact_f.result()
    ivf = similarity.ivf_kmeans_ann_topk(
        emb, qs, k=10, n_clusters=8, n_iter=2, nprobe=3,
        centroids=codebook,
    ).select("qid", "vec_id")
    hits = (
        exact.join(ivf, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        exact.select("qid").distinct()
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)).cast("double") / F.lit(10.0),
                6,
            ).alias("recall_at_10"),
        )
        .orderBy("qid")
    )


# SemDeDup's scale contract is that n_clusters GROWS with the corpus so
# per-cluster population m stays bounded (the paper uses 50k clusters
# for LAION); a fixed k=8 re-quadratices the within-cluster pair scan at
# the replica rungs (measured 120 s / 42x wall at 100x data).  The
# cluster count is therefore an import-time knob mirrored into the
# oracle (the zorder-block precedent), defaulting to the original 8 for
# the sf0.01 correctness gate; ladder runs set it so m stays ~constant.
_SEMDEDUP_K = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_CLUSTERS", "8"))


@query(
    "td_semdedup",
    # Replays the ENTIRE SemDeDup pipeline in SQL: the augmented corpus
    # (planted near-dups, same construction as td_embed_near_dups),
    # deterministic Lloyd training (identical CTE chain to the
    # td_ivf_ann oracle), final assignment, within-cluster pair scan,
    # lowest-id survivor — so clustering AND dedup decisions are
    # hash-checked, not just row counts.  Round-11 (ORACLES.md rule
    # 16): the within-cluster pair scan is quotiented by exact vector
    # equality — a member is removed iff the MIN qualifying member id
    # (over same-cell groups within cosine 0.98, own group included)
    # is below its own id; cross-checked IDENTICAL at sf0.01 + sf0.1.
    oracle=f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planted AS (
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(v, x -> x + 0.01) AS v
  FROM base WHERE vec_id % 50 = 0),
vecs AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c, v
  FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT {_SEMDEDUP_K})),
a1 AS (
  SELECT vec_id, v, c FROM (
    SELECT vecs.vec_id, vecs.v, c0.c,
      ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
        ORDER BY list_cosine_similarity(vecs.v, c0.v) DESC, c0.c) AS rn
    FROM vecs, c0) WHERE rn = 1),
m1 AS (
  SELECT c, i,
    CAST(SUM(CAST(FLOOR(v[i + 1] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
      / (COUNT(*) * 1048576.0) AS m
  FROM a1, range(64) t(i) GROUP BY c, i),
c1 AS (
  SELECT c0.c, COALESCE(mm.v, c0.v) AS v
  FROM c0 LEFT JOIN (SELECT c, list(m ORDER BY i) AS v
                     FROM m1 GROUP BY c) mm USING (c)),
a2 AS (
  SELECT vec_id, v, c FROM (
    SELECT vecs.vec_id, vecs.v, c1.c,
      ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
        ORDER BY list_cosine_similarity(vecs.v, c1.v) DESC, c1.c) AS rn
    FROM vecs, c1) WHERE rn = 1),
m2 AS (
  SELECT c, i,
    CAST(SUM(CAST(FLOOR(v[i + 1] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
      / (COUNT(*) * 1048576.0) AS m
  FROM a2, range(64) t(i) GROUP BY c, i),
c2 AS (
  SELECT c1.c, COALESCE(mm.v, c1.v) AS v
  FROM c1 LEFT JOIN (SELECT c, list(m ORDER BY i) AS v
                     FROM m2 GROUP BY c) mm USING (c)),
af AS (
  SELECT vec_id, v, c FROM (
    SELECT vecs.vec_id, vecs.v, c2.c,
      ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
        ORDER BY list_cosine_similarity(vecs.v, c2.v) DESC, c2.c) AS rn
    FROM vecs, c2) WHERE rn = 1),
afm AS MATERIALIZED (SELECT vec_id, v, c FROM af),
gaf AS MATERIALIZED (
  SELECT v, c, MIN(vec_id) AS min_id FROM afm GROUP BY v, c),
qual AS MATERIALIZED (
  SELECT b.v AS hv, b.c AS hc, MIN(a.min_id) AS thr
  FROM gaf b JOIN gaf a ON a.c = b.c
  WHERE list_cosine_similarity(a.v, b.v) >= 0.98
  GROUP BY b.v, b.c)
SELECT afm.vec_id, CAST(afm.c AS INT) AS cluster,
       (q.thr IS NULL OR q.thr >= afm.vec_id) AS kept
FROM afm LEFT JOIN qual q ON q.hv = afm.v AND q.hc = afm.c
ORDER BY afm.vec_id
""",
)
def td_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster-then-dedup over embeddings.
    Corpus = embeddings + planted perturbed copies of every 50th vector
    (cosine ~0.9999 vs a ~0.51 background), so exactly the planted
    copies must be dropped and everything else kept — strict-checked
    against a DuckDB oracle replaying training, assignment, and the
    survivor rule end to end."""
    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = base.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    return similarity.semdedup_flags(
        corpus, threshold=0.98, n_clusters=_SEMDEDUP_K,
    )


# ---------------------------------------------------------------------------
# multimodal plumbing

@query(
    "td_multimodal_bytes",
    oracle="""
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
  md5(text) AS checksum
FROM documents
""",
)
def td_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct construction (the ingestion half
    of the multimodal path; decode half is rows-only below)."""
    media = multimodal.attach_binary_payload(table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.checksum").alias("checksum"),
    )


@query(
    "td_multimodal_decode",
    # Payload bytes are pure functions of doc_id (synth_wav_media), so the
    # oracle states the DECODED audio stats in closed form — the verified
    # thing is the encode -> binary column -> REAL RIFF/PCM chunk-walk
    # parse through the mapInPandas seam (operators/multimodal.py
    # decode_wav_items), the audio twin of td_multimodal_ppm_decode.
    oracle="""
SELECT doc_id,
  CAST(8000 + 1000 * (doc_id % 5) AS INTEGER) AS sample_rate,
  CAST(16 + doc_id % 17 AS BIGINT) AS n_samples,
  ROUND(list_avg(list_transform(range(0, 16 + doc_id % 17),
        j -> abs((doc_id * 13 + j * 7) % 4001 - 2000))), 6) AS mean_abs
FROM documents
""",
)
def td_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode through the multimodal seam: deterministic
    RIFF/WAVE 16-bit PCM payloads built per doc, chunk-walked back
    (fmt + data, numpy sample plane) in mapInPandas, sample stats
    checked against the closed form.  Replaces the former
    deterministic-fake stub decode (which proved nothing the PPM query
    didn't); the library-gated stub seam remains available as
    operators/multimodal.decode_items for real codec registration."""
    docs = table(spark, sf_dir, "documents")
    media = multimodal.synth_wav_media(docs)
    return multimodal.decode_wav_items(media)


@query(
    "td_multimodal_ppm_decode",
    # The payload bytes are pure functions of doc_id (synth_ppm_media), so
    # the oracle states the DECODED stats in closed form: what's verified
    # is the full encode -> binary column -> REAL P6 header+pixel parse
    # roundtrip through the mapInPandas seam — an actual codec, not the
    # deterministic fake of td_multimodal_decode.
    oracle="""
SELECT doc_id,
  CAST(4 + doc_id % 8 AS INTEGER) AS width,
  CAST(3 + doc_id % 5 AS INTEGER) AS height,
  CAST((4 + doc_id % 8) * (3 + doc_id % 5) AS BIGINT) AS n_pixels,
  ROUND(list_avg(list_transform(range(0, (4 + doc_id % 8) * (3 + doc_id % 5)),
        i -> (doc_id * 7 + 3 * i) % 256)), 6) AS mean_r,
  ROUND(list_avg(list_transform(range(0, (4 + doc_id % 8) * (3 + doc_id % 5)),
        i -> (doc_id * 7 + 3 * i + 1) % 256)), 6) AS mean_g,
  ROUND(list_avg(list_transform(range(0, (4 + doc_id % 8) * (3 + doc_id % 5)),
        i -> (doc_id * 7 + 3 * i + 2) % 256)), 6) AS mean_b
FROM documents
""",
)
def td_multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode through the multimodal seam: deterministic P6
    PPM payloads built per doc, parsed back (header + numpy pixel plane)
    in mapInPandas, channel means checked against the closed form."""
    docs = table(spark, sf_dir, "documents")
    media = multimodal.synth_ppm_media(docs)
    return multimodal.decode_ppm_items(media)


@query(
    "td_multimodal_video_frames",
    # Payload bytes are pure functions of doc_id (synth_y4m_media:
    # width = 4+id%6, height = 2+id%4, n_frames = 3+id%5, Y byte j of
    # frame f = (id*11 + f*5 + j*3) % 256), so the oracle states every
    # SAMPLED frame's luma mean in closed form — the verified thing is
    # the encode -> binary column -> real YUV4MPEG2 container walk with
    # arithmetic frame skipping (operators/multimodal.py
    # video_frame_sample_means), the video leg beside the PPM image and
    # RIFF/WAV audio decoders.
    oracle="""
WITH fr AS (
  SELECT doc_id, CAST(unnest(range(0, 3 + doc_id % 5)) AS BIGINT) AS f
  FROM documents)
SELECT doc_id,
  CAST(4 + doc_id % 6 AS INTEGER) AS width,
  CAST(2 + doc_id % 4 AS INTEGER) AS height,
  CAST(f AS INTEGER) AS frame_idx,
  ROUND(list_avg(list_transform(
        range(0, (4 + doc_id % 6) * (2 + doc_id % 4)),
        j -> (doc_id * 11 + f * 5 + j * 3) % 256)), 6) AS mean_y
FROM fr
WHERE f % 2 = 0
ORDER BY doc_id, frame_idx
""",
)
def td_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video frame sampling through the multimodal seam:
    deterministic Y4M (YUV4MPEG2, C444) payloads built per doc, every
    2nd frame sampled by walking the container with ARITHMETIC skips
    (unsampled frames' pixel bytes are never materialized), per-sampled-
    frame luma mean checked against the closed form.  The decimation
    step a video training pipeline runs before any per-frame model —
    cost scales with sampled frames, not video length."""
    docs = table(spark, sf_dir, "documents")
    media = multimodal.synth_y4m_media(docs)
    return (
        multimodal.video_frame_sample_means(media, every_n=2)
        .orderBy("doc_id", "frame_idx")
    )


@query(
    "td_profile_documents",
    oracle="""
SELECT COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
  COUNT(DISTINCT lang) AS n_langs,
  COUNT(DISTINCT source) AS n_sources,
  MIN(n_chars) AS min_chars,
  MAX(n_chars) AS max_chars,
  ROUND(AVG(n_chars), 6) AS avg_chars,
  ROUND(SUM(CASE WHEN LENGTH(text) <> n_chars THEN 1 ELSE 0 END)
        / COUNT(*), 6) AS len_mismatch_rate
FROM documents
""",
)
def td_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass corpus profile (volume, null-rates, cardinalities,
    length bounds + metadata-consistency rate) — the acceptance gate a
    training-data pipeline runs on every new drop.  ``approximate=True``
    swaps exact distincts for HLL++ at scale (same schema, one shuffle
    less)."""
    from busdata_pipeline_spark.operators.profile import profile_documents

    return profile_documents(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# sketches

@query(
    "td_sketches",
    # Invariant oracle: HLL/KLL sketch INTERNALS differ per engine, so the
    # estimates can't be equality-checked cross-engine — but their error
    # CONTRACTS can.  The query emits exact anchors (driver-verified
    # value-for-value) plus booleans asserting each deterministic sketch
    # estimate honors its bound; the oracle computes the same anchors and
    # expects every bound to hold (TRUE literals).  A sketch regression
    # flips a boolean and fails the hash.
    oracle="""
SELECT COUNT(DISTINCT user_id) AS exact_users,
       COUNT(DISTINCT event_id) AS exact_events,
       TRUE AS hll_users_ok, TRUE AS hll_events_ok,
       TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM events
""",
)
def td_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable approximations: HyperLogLog++ distinct counts and
    approximate quantiles — the 100 TB replacements for exact
    COUNT(DISTINCT) / percentile sorts.  HLL bound: ±5% (rsd=0.01 gives
    ~1%; 5× headroom).  Quantile bound: the KLL-style estimate at
    accuracy=10000 has rank error ≤ n/10000; the check brackets it
    between exact ±1%-of-rank ANCHOR VALUES — 100× headroom.

    The anchors come from the two-level distributed rank
    (assign_surrogate_keys: range sort + local rank + tiny offset
    window), NOT from the exact `percentile` aggregate — that aggregate
    buffers every value per task, which is precisely the thing the
    sketches exist to replace (it OOMs a vanilla 1 GB driver at the 10×
    replica; rank anchors are shuffle-bounded at any size).  One
    bounded-driver scalar (the non-null count) fixes the anchor ranks.
    Tighter tolerances are asserted in pytest; this row is the
    driver-visible contract."""
    from busdata_pipeline_spark.operators.warehouse import (
        assign_surrogate_keys,
    )

    ev = table(spark, sf_dir, "events")
    # Two exact COUNT(DISTINCT)s expand every row ×3; keeping the KLL
    # percentile buffers OUT of that Expand (separate 1-row aggregates,
    # recombined by scalar crossJoin) is what keeps the heap flat — the
    # combined form OOMs a 1 GB vanilla driver at the 10× replica.
    exact = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct("event_id").alias("exact_events"),
    )
    sketches = ev.agg(
        F.approx_count_distinct("user_id", 0.01).alias("au"),
        F.approx_count_distinct("event_id", 0.01).alias("ae"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("aq"),
    )
    ag = exact.crossJoin(F.broadcast(sketches))
    vals = ev.where(F.col("value").isNotNull()).select("value", "event_id")
    n = vals.count()  # bounded driver traffic: one scalar
    ranked = assign_surrogate_keys(
        vals, order_col=["value", "event_id"], key_col="rk"
    )
    brackets = {  # fraction -> (lo_rank, hi_rank), ±1% of rank
        "p50": (max(1, int(0.49 * n)), min(n, int(0.51 * n) + 1)),
        "p95": (max(1, int(0.94 * n)), min(n, int(0.96 * n) + 1)),
        "p99": (max(1, int(0.985 * n)), min(n, int(0.995 * n) + 1)),
    }
    ks = sorted({k for lo_hi in brackets.values() for k in lo_hi})
    anchors = ranked.where(F.col("rk").isin(ks)).agg(
        *[
            F.max(F.when(F.col("rk") == k, F.col("value"))).alias(f"v{k}")
            for k in ks
        ]
    )
    ag = ag.crossJoin(F.broadcast(anchors))

    def _within(idx: int, name: str):
        lo, hi = brackets[name]
        return (F.col("aq")[idx] >= F.col(f"v{lo}")) & (
            F.col("aq")[idx] <= F.col(f"v{hi}")
        )

    return ag.select(
        "exact_users",
        "exact_events",
        (F.abs(F.col("au") - F.col("exact_users"))
         <= F.col("exact_users") * 0.05).alias("hll_users_ok"),
        (F.abs(F.col("ae") - F.col("exact_events"))
         <= F.col("exact_events") * 0.05).alias("hll_events_ok"),
        _within(0, "p50").alias("p50_ok"),
        _within(1, "p95").alias("p95_ok"),
        _within(2, "p99").alias("p99_ok"),
    )


@query(
    "td_sketches_by_lang",
    # Same invariant-oracle discipline as td_sketches, but GROUPED — the
    # shape that matters at 100 TB: per-group HLL sketches are built
    # map-side and MERGED across partitions (partial/final aggregate),
    # never recomputed from raw, so cost scales with groups, not rows.
    oracle="""
SELECT lang,
       COUNT(DISTINCT source) AS exact_sources,
       COUNT(*) AS n_docs,
       TRUE AS hll_sources_ok,
       TRUE AS p50_chars_ok
FROM documents
GROUP BY lang
""",
)
def td_sketches_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sketch aggregation with exact anchors: per-language HLL
    distinct-source estimate (±5% bound) and approximate median doc
    length (bracketed by exact 40th/60th percentiles).  The groupBy
    builds per-partition partial sketches and merges them — one shuffle
    of sketch states, the only per-group-distinct strategy that holds
    when a group no longer fits one executor."""
    docs = table(spark, sf_dir, "documents")
    ag = docs.groupBy("lang").agg(
        F.countDistinct("source").alias("exact_sources"),
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_count_distinct("source", 0.01).alias("as_"),
        F.percentile_approx("n_chars", 0.5, 10000).alias("ap50"),
        F.expr("percentile(n_chars, array(0.40D, 0.60D))").alias("ep"),
    )
    return ag.select(
        "lang",
        "exact_sources",
        "n_docs",
        (F.abs(F.col("as_") - F.col("exact_sources"))
         <= F.col("exact_sources") * 0.05).alias("hll_sources_ok"),
        ((F.col("ap50") >= F.col("ep")[0]) & (F.col("ap50") <= F.col("ep")[1]))
        .alias("p50_chars_ok"),
    )


@query(
    "td_unigram_logprob",
    # Same float discipline as td_char_entropy: logs are taken only of
    # integers (corpus token counts), the per-doc sum is rounded to 6
    # decimals, and the nearest round-6 boundary margin is measured in
    # tests (test_training_data.py::test_unigram_logprob_round_margin).
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS tok
  FROM documents),
dt AS (SELECT doc_id, tok, COUNT(*) AS c_dt FROM toks
       WHERE tok <> '' GROUP BY doc_id, tok),
ct AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_t FROM toks
       WHERE tok <> '' GROUP BY tok),
tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS total FROM ct)
SELECT doc_id,
  CAST(SUM(c_dt) AS BIGINT) AS n_tokens,
  ROUND(ln(CAST(total AS DOUBLE))
        - SUM(c_dt * ln(CAST(c_t AS DOUBLE))) / SUM(c_dt), 6) AS xent_nats
FROM dt JOIN ct USING (tok) CROSS JOIN tot
GROUP BY doc_id, total
""",
)
def td_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained unigram LM
    (nats/token) — the KenLM-perplexity stand-in used for quality
    scoring when no external model ships with the engine: documents
    whose token distribution diverges from the corpus score high.

    score(d) = -(1/n_d) * Σ_t c_dt · ln(c_t / N) = ln(N) - Σ c_dt·ln(c_t)/n_d

    One exploded token pass feeds both the per-doc and corpus count
    aggregates; they meet again in a shuffle equi-join on token (both
    sides fact-scale — no broadcast), and the corpus total N is a 1-row
    broadcast scalar.  Logs touch only integer counts, so the only
    cross-engine float risk is summation order, absorbed by ROUND(_, 6)
    with a measured boundary margin."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    dt = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c_dt"))
    ct = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_t"))
    tot = ct.agg(F.sum("c_t").alias("total"))
    return (
        dt.join(ct, "tok")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c_dt").alias("n_tokens"),
            F.round(
                F.log(F.max("total").cast("double"))
                - F.sum(F.col("c_dt") * F.log(F.col("c_t").cast("double")))
                / F.sum("c_dt"),
                6,
            ).alias("xent_nats"),
        )
    )


@query(
    "td_fuzzy_prefix_match",
    # The block condition is part of the match definition, so oracle and
    # engine state the identical predicate: share >=1 aligned 4-char
    # prefix block AND levenshtein(prefix_a, prefix_b) <= 2.
    oracle="""
WITH nmg AS MATERIALIZED (
  SELECT rpad(lower(substring(text, 1, 12)), 12, '_') AS nm,
         MIN(doc_id) AS rep_id
  FROM documents GROUP BY 1),
ndocs AS MATERIALIZED (
  SELECT doc_id, rpad(lower(substring(text, 1, 12)), 12, '_') AS nm
  FROM documents),
-- ORACLES.md rule 16: blocking + levenshtein run once per DISTINCT
-- normalized name pair; identical names are dist 0 by definition and
-- expand directly.  Same blocked relation, output-bound on replicas.
blocks AS (
  SELECT nm, rep_id, i, substring(nm, 1 + (i - 1) * 4, 4) AS blk
  FROM nmg, range(1, 4) t(i)),
cand AS (
  SELECT DISTINCT a.nm AS na, b.nm AS nb
  FROM blocks a
  JOIN blocks b ON a.i = b.i AND a.blk = b.blk AND b.rep_id > a.rep_id),
ver AS MATERIALIZED (
  SELECT na, nb, CAST(levenshtein(na, nb) AS INTEGER) AS dist
  FROM cand WHERE levenshtein(na, nb) <= 2),
vs AS (SELECT na, nb, dist FROM ver
       UNION ALL SELECT nb AS na, na AS nb, dist FROM ver),
within AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(0 AS INTEGER) AS dist
  FROM ndocs x JOIN ndocs y ON y.nm = x.nm AND y.doc_id > x.doc_id),
crossp AS (
  SELECT x.doc_id AS a, y.doc_id AS b, v.dist
  FROM vs v JOIN ndocs x ON x.nm = v.na JOIN ndocs y ON y.nm = v.nb
  WHERE y.doc_id > x.doc_id)
SELECT a, b, dist FROM within
UNION ALL
SELECT a, b, dist FROM crossp
""",
)
def td_fuzzy_prefix_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (operators/dedup.fuzzy_prefix_matches):
    aligned-block equi-join candidates, edit-distance verify — the
    record-linkage workhorse for noisy near-identical keys, same
    candidate→verify discipline as MinHash-LSH but for edit distance."""
    docs = table(spark, sf_dir, "documents")
    return dedup.fuzzy_prefix_matches(docs)


@query(
    "td_multimodal_wav_frames",
    # Same closed-form contract as td_multimodal_decode, one level finer:
    # per non-overlapping 8-sample frame, mean |amplitude| of the REAL
    # decoded PCM plane.  frame mean = int-sum / 8 (power of two) -> exact
    # in double on both engines, so no ROUND is needed.
    oracle="""
SELECT d.doc_id AS doc_id,
       CAST(f.f AS INTEGER) AS frame_idx,
       list_avg(list_transform(range(f.f * 8, f.f * 8 + 8),
             j -> abs((d.doc_id * 13 + j * 7) % 4001 - 2000))) AS mean_abs
FROM documents d,
LATERAL (SELECT UNNEST(range(0, (16 + d.doc_id % 17) // 8)) AS f) f
""",
)
def td_multimodal_wav_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed audio features through the real codec path: synth WAV ->
    binary column -> RIFF/PCM parse -> per-frame numpy reduction
    (operators/multimodal.wav_frame_energy), the windowed
    feature-extraction step of an audio training pipeline."""
    docs = table(spark, sf_dir, "documents")
    media = multimodal.synth_wav_media(docs)
    return multimodal.wav_frame_energy(media)


@query(
    "td_dedup_survivors_by_quality",
    # Survivor policy: keep the LONGEST member of each near-dup cluster
    # (ties -> lowest doc_id) plus every unclustered doc — the
    # quality-preferring generalization of keep-lowest-id.
    oracle=_CLUSTER_CTE + """, reps AS (
  SELECT doc_id FROM (
    SELECT c.doc_id,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY d.n_chars DESC, c.doc_id) AS rn
    FROM clusters c JOIN documents d ON d.doc_id = c.doc_id)
  WHERE rn = 1)
SELECT d.doc_id AS doc_id, d.n_chars AS n_chars
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM reps)
   OR d.doc_id NOT IN (SELECT doc_id FROM clusters)
ORDER BY d.doc_id
""",
)
def td_dedup_survivors_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup with a quality-preferring survivor policy: cluster
    the pair graph, keep the longest doc per cluster (deterministic
    tie-break), pass unclustered docs through.  One window over the
    (small) clustered subset + one broadcast anti join on the corpus —
    the full corpus never shuffles."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    # rule-16 quotient clusters: CC on the distinct-text rep graph
    clusters = dedup.minhash_text_clusters(docs, threshold=0.5)
    members = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.col("doc_id")
    )
    reps = (
        members.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id")
    )
    unclustered = docs.join(
        F.broadcast(clusters.select("doc_id")), "doc_id", "left_anti"
    ).select("doc_id")
    keep = unclustered.unionByName(reps)
    return (
        docs.select("doc_id", "n_chars")
        .join(F.broadcast(keep), "doc_id", "left_semi")
        .orderBy("doc_id")
    )


@query(
    "td_weighted_sample",
    # Deterministic Efraimidis-Spirakis A-Res: u = md5-derived uniform in
    # (0,1), key = -ln(u)/w with w = n_chars; the k smallest keys per
    # language are the weighted-without-replacement sample.  Both engines
    # compute the identical key expression; ROUND(...,9) + doc_id
    # tiebreak absorbs last-ulp libm drift.
    oracle="""
WITH k AS (
  SELECT lang, doc_id, n_chars,
         ROUND(-LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    + 1) / 4294967297.0) / n_chars, 9) AS key
  FROM documents WHERE n_chars > 0)
SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY key, doc_id) AS rn FROM k)
WHERE rn <= 20
ORDER BY lang, doc_id
""",
)
def td_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis
    2006), deterministic: the exponential-race key is a pure function of
    doc_id, so re-runs, engines, and cluster sizes draw the SAME sample
    (the same no-RNG-state discipline as td_stratified_sample, but
    length-weighted — long documents proportionally likelier).  One
    window shuffle per language; WindowGroupLimit keeps k rows per
    group per task."""
    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (h + 1) / F.lit(4294967297.0)
    key = F.round((-F.log(u)) / F.col("n_chars"), 9)
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    )


@query(
    "td_winnow_fingerprints",
    # Full SQL replay of winnowing: the same 60-bit md5-prefix gram hash
    # (the portable-hash discipline shared with SimHash's oracle), the
    # same w-window minima, the same distinct.  k=4 token-grams, w=5.
    # toks MATERIALIZED: the gram explode references t per gram; inlined,
    # DuckDB re-splits the document for every gram — the slowness that
    # kept this linear oracle on the 10×-replica skip list through r8
    # (3.2 s at 10× once fixed)
    oracle="""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 8),
g AS (
  SELECT doc_id, i,
         ('0x' || substr(md5(array_to_string(t[i : i + 3], ' ')), 1, 15))::BIGINT
           AS h
  FROM toks, UNNEST(range(1, len(t) - 4 + 2)) r(i)),
ga AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM g GROUP BY doc_id),
w AS (
  SELECT doc_id, list_min(hs[j : j + 4]) AS fp
  FROM ga, UNNEST(range(1, len(hs) - 5 + 2)) r(j))
SELECT DISTINCT doc_id, fp FROM w ORDER BY doc_id, fp
""",
)
def td_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS algorithm): hash every k-token gram, slide a w-window over
    the hash sequence, keep each window's minimum, dedupe.  Guarantees
    every shared substring of >= w+k-1 tokens yields a shared
    fingerprint, at ~2/(w+1) selection density — the classic rolling-
    hash fingerprint for plagiarism/overlap detection at corpus scale.

    All array algebra inside the scan stage (transform/sequence/slice —
    no shuffle until the final distinct, which moves only (doc_id, fp)
    pairs); the "rolling" recurrence is a sequential micro-optimization
    — semantically it IS the per-gram hash, computed here data-parallel.
    """
    K, W = 4, 5
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("t")
    ).where(F.size("t") >= K + W - 1)

    def hash60(s):
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")

    # Grams as ROWS, window minima as a ROWS-frame min over the per-doc
    # position order — each gram hashed exactly once.  The tempting
    # nested-array form (transform over windows of a transform-built
    # hash array) re-inlines the inner transform into every window under
    # projection collapse, turning O(n) hashing into O(n·w) or worse —
    # measured 92 s at sf0.1 vs ~2 s for this formulation.
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - K + 1),
                lambda i: F.array_join(F.slice("t", i, K), " "),
            )
        ).alias("i", "gram"),
    ).select("doc_id", "i", hash60(F.col("gram")).alias("h"))
    n_wins = Window.partitionBy("doc_id")
    wmin = (
        Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, W - 1)
    )
    mins = (
        grams.withColumn("m", F.count(F.lit(1)).over(n_wins))
        .withColumn("fp", F.min("h").over(wmin))
        .where(F.col("i") <= F.col("m") - W)  # posexplode is 0-based
    )
    return (
        mins.select("doc_id", "fp")
        .distinct()
        .orderBy("doc_id", "fp")
    )


@query(
    "td_incremental_dedup",
    # Two arrival batches with planted cross-batch and within-batch
    # exact duplicates; the oracle states the net store: batch-1
    # keep-first survivors, then batch-2 keys not already present.
    oracle="""
WITH base AS (SELECT doc_id, TRIM(text) AS t FROM documents),
d1 AS (SELECT doc_id, md5(t) AS fp FROM base WHERE doc_id % 2 = 0),
d2 AS (
  SELECT doc_id, md5(t) AS fp FROM base WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000000, md5(t) FROM base
  WHERE doc_id % 2 = 0 AND doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000, md5(t) FROM base
  WHERE doc_id % 2 = 1 AND doc_id % 7 = 0
),
k1 AS (SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM d1 GROUP BY fp),
k2 AS (SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM d2
       WHERE fp NOT IN (SELECT fp FROM k1) GROUP BY fp)
SELECT doc_id, fp, 1 AS batch FROM k1
UNION ALL
SELECT doc_id, fp, 2 FROM k2
ORDER BY doc_id
""",
)
def td_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup as a MAINTAINED INDEX, not a batch job: a fingerprint store
    on disk is appended per arrival batch with the S12 upsert-ignore
    discipline (within-batch keep-first, then anti-join against the
    store's keys) — so deduping a new day costs Δ ⨝ store-keys, never a
    corpus rescan.  Batch 2 plants copies of batch-1 docs (cross-batch
    dups → dropped via the store) AND internal dups (dropped via
    keep-first); the returned store is the net corpus membership.

    At 100 TB the store is the bucket-partitioned rollup layout (only
    16-byte fingerprints + ids; bucket-scoped reads for the anti-join),
    and this loop is exactly how td_dedup_exact becomes an operational
    pipeline."""
    import shutil
    import tempfile

    from busdata_pipeline_spark.operators.dedup import fingerprint

    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", fingerprint("text").alias("fp"))
    d1 = base.where(F.col("doc_id") % 2 == 0)
    d2 = (
        base.where(F.col("doc_id") % 2 == 1)
        .unionByName(
            base.where((F.col("doc_id") % 2 == 0)
                       & (F.col("doc_id") % 10 == 0))
            .select((F.col("doc_id") + 1000000).alias("doc_id"), "fp")
        )
        .unionByName(
            base.where((F.col("doc_id") % 2 == 1)
                       & (F.col("doc_id") % 7 == 0))
            .select((F.col("doc_id") + 2000000).alias("doc_id"), "fp")
        )
    )
    store = tempfile.mkdtemp(prefix="dedup_store_")
    shutil.rmtree(store, ignore_errors=True)
    try:
        def keep_first(df):
            return df.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))

        keep_first(d1).select("doc_id", "fp", F.lit(1).alias("batch")) \
            .write.mode("overwrite").parquet(store)
        existing = spark.read.parquet(store).select("fp")
        new2 = (
            keep_first(d2)
            .join(existing, "fp", "left_anti")
            .select("doc_id", "fp", F.lit(2).alias("batch"))
        )
        new2.write.mode("append").parquet(store)
        return (
            spark.read.parquet(store)
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


@query(
    "td_bigram_logprob",
    # Stupid-backoff bigram LM (Brants et al. 2007) trained on the EVEN
    # docs, scored over every doc: seen bigram -> ln c12 - ln c1, unseen
    # -> ln 0.4 + ln c2 - ln N.  Every log argument is an integer corpus
    # count (the same float discipline as td_unigram_logprob), summed
    # per doc and rounded to 6.
    oracle="""
WITH toks0 AS (
  SELECT doc_id, i, t[i] AS w
  FROM (SELECT doc_id, string_split(TRIM(text), ' ') AS t FROM documents),
       UNNEST(range(1, len(t) + 1)) r(i)
  WHERE t[i] <> ''),
toks AS (
  -- re-rank positions AFTER the empty-token filter: raw split indices
  -- leave gaps at consecutive spaces, where Spark's lead() over the
  -- filtered stream WOULD form a bigram
  SELECT doc_id, w,
    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) AS i
  FROM toks0),
train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
big AS (
  SELECT a.doc_id, a.i, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
tbig AS (
  SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM train a JOIN train b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY 1, 2),
uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM train GROUP BY w),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM train)
SELECT big.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  ROUND(-SUM(
    CASE WHEN tbig.c12 IS NOT NULL AND k1.c IS NOT NULL
         THEN ln(CAST(tbig.c12 AS DOUBLE)) - ln(CAST(k1.c AS DOUBLE))
         ELSE ln(0.4) + ln(CAST(COALESCE(k2.c, 1) AS DOUBLE))
              - ln(CAST(tot.n AS DOUBLE)) END
  ) / COUNT(*), 6) AS xent_nats
FROM big
LEFT JOIN tbig ON tbig.w1 = big.w1 AND tbig.w2 = big.w2
LEFT JOIN uni k1 ON k1.w = big.w1
LEFT JOIN uni k2 ON k2.w = big.w2
CROSS JOIN tot
GROUP BY big.doc_id
ORDER BY big.doc_id
""",
)
def td_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram cross-entropy under a stupid-backoff LM (Brants
    et al. 2007: score = c12/c1 when seen, 0.4·c2/N otherwise — no
    normalization, which is what makes it shuffle-light at web scale):
    the model trains on the even docs, every doc is scored.  All joins
    are on token keys (vocab-sized dims broadcast); the per-doc reduce
    is one hash aggregate.  Log arguments are integer counts only, so
    both engines take ln of identical doubles (unseen-word fallback
    count 1 keeps the argument integral)."""
    from busdata_pipeline_spark.operators.retrieval import (
        corpus_tokens,
        word_ngrams,
    )

    docs = table(spark, sf_dir, "documents")
    # round-12 (guide §2.4): bigrams as a per-doc array-zip projection —
    # no per-doc window exchange+sort; identical stream (see word_ngrams)
    big = word_ngrams(docs, 2)
    tbig = (
        big.where(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    train = corpus_tokens(docs).where(F.col("doc_id") % 2 == 0)
    uni = train.groupBy(F.col("tok").alias("w")).agg(
        F.count("*").alias("c")
    )
    n_total = train.count()  # bounded driver scalar (ln N literal)

    scored = (
        big.join(F.broadcast(tbig), ["w1", "w2"], "left")
        .join(
            F.broadcast(uni.select(F.col("w").alias("w1"),
                                   F.col("c").alias("c1"))),
            "w1", "left",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"),
                                   F.col("c").alias("c2"))),
            "w2", "left",
        )
        .withColumn(
            "lp",
            F.when(
                F.col("c12").isNotNull() & F.col("c1").isNotNull(),
                F.log(F.col("c12").cast("double"))
                - F.log(F.col("c1").cast("double")),
            ).otherwise(
                F.log(F.lit(0.4))
                + F.log(F.coalesce(F.col("c2"), F.lit(1)).cast("double"))
                - F.log(F.lit(float(n_total)))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.sum("lp") / F.count("*"), 6).alias("xent_nats"),
        )
        .orderBy("doc_id")
    )


@query(
    "td_temperature_mix",
    # α-weights pass through a 1e-9 integer quantization immediately
    # after the one transcendental (POWER), so quota arithmetic is exact
    # integer/deterministic-double on both engines.
    oracle="""
WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY lang),
q AS (SELECT lang, n,
        CAST(FLOOR(POWER(CAST(n AS DOUBLE), 0.3) * 1000000000.0 + 0.5)
             AS BIGINT) AS ql
      FROM c),
s AS (SELECT CAST(SUM(ql) AS BIGINT) AS qs,
             CAST(FLOOR(CAST(SUM(n) AS DOUBLE) / 2.0) AS BIGINT) AS t
      FROM q),
kept AS (
  SELECT lang,
         LEAST(CAST(FLOOR(CAST(t * ql AS DOUBLE) / qs + 0.5) AS BIGINT), n)
           AS quota
  FROM q CROSS JOIN s),
r AS (SELECT doc_id, lang,
        CAST(ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      FROM documents)
SELECT r.doc_id, r.lang, r.rk, kept.quota
FROM r JOIN kept USING (lang) WHERE rk <= quota
""",
)
def td_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling (the mT5/XLM-R α-mix, Xue et
    al. 2021: p_l ∝ n_l^α, α=0.3) at a budget of half the corpus: rare
    languages are up-weighted relative to their natural share, head
    languages down-weighted, quotas capped at availability, selection by
    the stable md5 rank.  Completes the mixture tier next to the
    fixed-spec `td_mixture_resample` (given targets) and
    `td_stratified_sample` (fixed quota): here the targets are COMPUTED
    from the distribution.  Same scale shape: dim-sized weight table,
    1-row budget broadcast, per-language rank window."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    q = c.select(
        "lang", "n",
        F.floor(
            F.pow(F.col("n").cast("double"), F.lit(0.3))
            * F.lit(1000000000.0) + F.lit(0.5)
        ).cast("long").alias("ql"),
    )
    s = q.agg(
        F.sum("ql").cast("long").alias("qs"),
        F.floor(F.sum("n").cast("double") / F.lit(2.0)).cast("long")
        .alias("t"),
    )
    kept = q.crossJoin(F.broadcast(s)).select(
        "lang",
        F.least(
            F.floor(
                (F.col("t") * F.col("ql")).cast("double") / F.col("qs")
                + F.lit(0.5)
            ).cast("long"),
            F.col("n"),
        ).alias("quota"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    ranked = docs.select("doc_id", "lang").withColumn(
        "rk", F.row_number().over(w).cast("long")
    )
    return ranked.join(F.broadcast(kept), "lang").where(
        F.col("rk") <= F.col("quota")
    ).select("doc_id", "lang", "rk", "quota")


@query(
    "td_zipf_slope",
    # regr_slope aggregates doubles (order-dependent at ~1e-15); the
    # inputs are logs of exact integer (rank, tf) pairs over a bounded
    # vocabulary, and the slope rounds to 6 — the fn_math_bitwise_suite
    # transcendental-margin argument applies.
    oracle="""
WITH tf AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY tok),
rk AS (
  SELECT tf, CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, tok) AS BIGINT)
           AS rank
  FROM tf)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
  ROUND(regr_slope(ln(CAST(tf AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6)
    AS zipf_slope,
  ROUND(corr(ln(CAST(tf AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6)
    AS loglog_corr
FROM rk
""",
)
def td_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic over the corpus vocabulary: the log-log
    rank-frequency regression slope (natural text ≈ −1; template or
    synthetic corpora deviate — a standard corpus-health check in
    pretraining-data QA).  One token aggregate, a vocabulary-sized rank
    window, and a closed-form regression aggregate; slope and
    correlation come from Spark's regr_slope/corr vs DuckDB's, over
    identical (ln rank, ln tf) pairs."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    from pyspark.sql import Window

    rk = tf.select(
        "tf",
        F.row_number().over(
            Window.orderBy(F.desc("tf"), F.asc("tok"))
        ).cast("long").alias("rank"),
    )
    lt = F.log(F.col("tf").cast("double"))
    lr = F.log(F.col("rank").cast("double"))
    return rk.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.round(F.regr_slope(lt, lr), 6).alias("zipf_slope"),
        F.round(F.corr(lt, lr), 6).alias("loglog_corr"),
    )


@query(
    "td_embed_int8_quantize",
    # Replays the symmetric-absmax int8 quantization scalar-for-scalar:
    # every arithmetic step is a deterministic IEEE float64 op in both
    # engines (float32 -> float64 is exact; (x*127.0)/scale, half-up
    # floor, squared reconstruction error), and every SUM is over
    # INTEGERS so summation order cannot move a bit.  CAST(SUM(BIGINT)
    # AS BIGINT) collapses DuckDB's HUGEINT widening (the round-1
    # integer-width driver lesson).
    oracle="""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS scale
  FROM vecs),
el AS (
  SELECT vec_id, scale, i, v[i + 1] AS x,
         CASE WHEN scale = 0 THEN 0
              ELSE CAST(FLOOR(v[i + 1] * 127.0 / scale + 0.5) AS BIGINT)
         END AS q
  FROM s, range(64) t(i))
SELECT vec_id,
       any_value(scale) AS scale,
       CAST(SUM(q) AS BIGINT) AS q_sum,
       CAST(SUM(q * q) AS BIGINT) AS q_sumsq,
       CAST(SUM(q * (i + 1)) AS BIGINT) AS q_poly,
       CAST(SUM(CAST(FLOOR(
           (x - q * scale / 127.0) * (x - q * scale / 127.0)
           * 1048576.0 + 0.5) AS BIGINT))
         AS BIGINT) / 1048576.0 AS recon_err
FROM el
GROUP BY vec_id
""",
)
def td_embed_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric absmax int8 embedding quantization over the zero-copy
    ``mapInArrow`` seam (operators/quantize.py): per-vector scale,
    order-independent integer signatures of the quantized vector, and
    the 2^-20-quantized reconstruction error.  The compression step a
    serving-side ANN index runs over the full corpus — no shuffle, no
    driver traffic, Arrow-batch vectorized."""
    emb = table(spark, sf_dir, "embeddings")
    return quantize.int8_quantize_signatures(emb)


# Like _SEMDEDUP_K: the kNN graph's cell count is an import-time knob
# mirrored into the oracle so the scale ladder can grow cells with the
# corpus (keeping per-cell m — and the per-cell GEMM — constant) while
# the sf0.01 correctness gate stays at the SQL-replayable 8.
_KNN_CELLS = int(os.environ.get("SPARK_GRAFT_KNN_CELLS", "8"))


def _lloyd_cte(k_cells: int) -> str:
    """The deterministic 2-iteration Lloyd replay (identical chain to
    the td_ivf_ann / td_semdedup oracles) over a ``vecs(vec_id, v)``
    CTE, ending at ``af(vec_id, v, c)`` — the trained final
    assignment."""
    return f"""
c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c, v
  FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT {k_cells})),
a1 AS (
  SELECT vec_id, v, c FROM (
    SELECT vecs.vec_id, vecs.v, c0.c,
      ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
        ORDER BY list_cosine_similarity(vecs.v, c0.v) DESC, c0.c) AS rn
    FROM vecs, c0) WHERE rn = 1),
m1 AS (
  SELECT c, i,
    CAST(SUM(CAST(FLOOR(v[i + 1] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
      / (COUNT(*) * 1048576.0) AS m
  FROM a1, range(64) t(i) GROUP BY c, i),
c1 AS (
  SELECT c0.c, COALESCE(mm.v, c0.v) AS v
  FROM c0 LEFT JOIN (SELECT c, list(m ORDER BY i) AS v
                     FROM m1 GROUP BY c) mm USING (c)),
a2 AS (
  SELECT vec_id, v, c FROM (
    SELECT vecs.vec_id, vecs.v, c1.c,
      ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
        ORDER BY list_cosine_similarity(vecs.v, c1.v) DESC, c1.c) AS rn
    FROM vecs, c1) WHERE rn = 1),
m2 AS (
  SELECT c, i,
    CAST(SUM(CAST(FLOOR(v[i + 1] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
      / (COUNT(*) * 1048576.0) AS m
  FROM a2, range(64) t(i) GROUP BY c, i),
c2 AS (
  SELECT c1.c, COALESCE(mm.v, c1.v) AS v
  FROM c1 LEFT JOIN (SELECT c, list(m ORDER BY i) AS v
                     FROM m2 GROUP BY c) mm USING (c)),
af AS (
  SELECT vec_id, v, c FROM (
    SELECT vecs.vec_id, vecs.v, c2.c,
      ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
        ORDER BY list_cosine_similarity(vecs.v, c2.v) DESC, c2.c) AS rn
    FROM vecs, c2) WHERE rn = 1)"""


@query(
    "td_knn_graph",
    # Replays training + assignment (the td_ivf_ann Lloyd chain) and
    # then the within-cell neighbor relation verbatim, so the graph's
    # EDGES are hash-checked — cosine values, ranks, tie-breaks — not
    # just counts.
    # Round-11 (ORACLES.md rule 16): the Lloyd/assignment stages are
    # linear (N x cells) and stay verbatim; only the within-cell
    # all-pairs neighbor stage is factored through the quotient by
    # exact vector equality.  Group pairs carry the member count, a
    # strictly-better running sum prunes groups that provably cannot
    # reach a top-5 slot (better_cnt >= 5 means at least five
    # neighbors with strictly higher cosine exist, all of whose groups
    # are kept by monotonicity), and the surviving groups expand back
    # to member pairs before the exact ROW_NUMBER ranking — so ranks
    # and tie-breaks are byte-identical to the definitional form
    # (cross-checked IDENTICAL at sf0.01 and the sf0.1 base).
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
{_lloyd_cte(_KNN_CELLS)},
afm AS MATERIALIZED (SELECT vec_id, v, c FROM af),
gaf AS MATERIALIZED (
  SELECT v, c, MIN(vec_id) AS rep_id, COUNT(*) AS cnt
  FROM afm GROUP BY v, c),
gpair AS MATERIALIZED (
  SELECT e.rep_id AS g_rep, e.v AS g_v, n.v AS h_v,
         list_cosine_similarity(e.v, n.v) AS cos,
         n.cnt - CASE WHEN n.rep_id = e.rep_id THEN 1 ELSE 0 END AS h_cnt_adj
  FROM gaf e JOIN gaf n ON n.c = e.c),
scored AS (
  SELECT g_v, h_v, cos,
    SUM(h_cnt_adj) OVER (PARTITION BY g_rep ORDER BY cos DESC
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    - SUM(h_cnt_adj) OVER (PARTITION BY g_rep, cos) AS better_cnt
  FROM gpair),
cand_g AS (SELECT g_v, h_v, cos FROM scored WHERE better_cnt < 5),
cand AS (
  SELECT ge.vec_id, hn.vec_id AS nbr_id, c.cos
  FROM cand_g c
  JOIN afm ge ON ge.v = c.g_v
  JOIN afm hn ON hn.v = c.h_v
  WHERE hn.vec_id <> ge.vec_id)
SELECT vec_id, nbr_id, ROUND(cos, 6) AS cosine,
  CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
       ORDER BY cos DESC, nbr_id) AS INT) AS rank
FROM cand QUALIFY rank <= 5
""",
)
def td_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide k-nearest-neighbor graph (k=5) within trained IVF
    cells (operators/similarity.knn_graph) — the edge set that
    graph-based curation (cluster pruning, connectivity filters, label
    propagation) consumes.  One GEMM per cell, output linear in the
    corpus; the cell count scales with the corpus via
    SPARK_GRAFT_KNN_CELLS so per-cell work is a design constant."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.knn_graph(
        emb, k=5, n_clusters=_KNN_CELLS,
    )


@query(
    "td_ccnet_perplexity_buckets",
    # Float discipline: the per-doc cross-entropy is FLOOR-quantized to
    # BIGINT micro-nats immediately (logs touch only integer counts, so
    # the only risk is summation order inside one doc — same margin
    # class as td_unigram_logprob's tested ROUND); every downstream
    # comparison (tercile cuts, bucket assignment) and sum is integer-
    # exact, and the one output double is a division of two exact
    # integers, deterministic bitwise on both engines.
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS tok
  FROM documents),
dt AS (SELECT doc_id, tok, COUNT(*) AS c_dt FROM toks
       WHERE tok <> '' GROUP BY doc_id, tok),
ct AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_t FROM toks
       WHERE tok <> '' GROUP BY tok),
tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS total FROM ct),
xe AS (
  SELECT doc_id, CAST(SUM(c_dt) AS BIGINT) AS n_tokens,
    CAST(FLOOR((ln(CAST(total AS DOUBLE))
                - SUM(c_dt * ln(CAST(c_t AS DOUBLE))) / SUM(c_dt))
               * 1000000 + 0.5) AS BIGINT) AS xq
  FROM dt JOIN ct USING (tok) CROSS JOIN tot
  GROUP BY doc_id, total),
ranked AS (
  SELECT d.lang, x.doc_id, x.n_tokens, x.xq,
         ROW_NUMBER() OVER (PARTITION BY d.lang ORDER BY x.xq, x.doc_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY d.lang) AS n
  FROM xe x JOIN documents d USING (doc_id)),
cuts AS (
  SELECT lang,
    MAX(CASE WHEN rn = CAST(CEIL(n / 3.0) AS BIGINT) THEN xq END) AS c1,
    MAX(CASE WHEN rn = CAST(CEIL(2 * n / 3.0) AS BIGINT) THEN xq END)
      AS c2
  FROM ranked GROUP BY lang),
b AS (
  SELECT r.lang,
    CASE WHEN r.xq <= c.c1 THEN 'head'
         WHEN r.xq <= c.c2 THEN 'middle' ELSE 'tail' END AS bucket,
    r.n_tokens, r.xq
  FROM ranked r JOIN cuts c ON c.lang = r.lang)
SELECT lang, bucket, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  ROUND(CAST(SUM(xq) AS DOUBLE) / (1000000.0 * COUNT(*)), 6) + 0.0
    AS mean_xent
FROM b GROUP BY lang, bucket ORDER BY lang, bucket
""",
)
def td_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail corpus split (Wenzek et al. 2020):
    per-language perplexity terciles under the corpus-trained unigram LM
    (td_unigram_logprob's scorer), each document bucketed by VALUE
    against the tercile cut points — head = lowest cross-entropy third,
    the slice CCNet keeps for pretraining.  Cut points are explicit
    order statistics (value at row ceil(n/3) / ceil(2n/3) of the
    ascending per-lang sort) so both engines replay the identical index
    convention, and the cross-entropy is quantized to BIGINT micro-nats
    before any comparison — the cut, the bucket CASE, and the sums are
    all integer-exact.

    Scale shape: one exploded-token pass feeds the per-doc and corpus
    count aggregates (both fact-scale, shuffle equi-join on token); the
    tercile window sorts each language partition once; the cut table is
    dimension-sized and broadcast back for the value-comparison bucket
    assignment — no rank recomputation on the second pass."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    dt = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c_dt"))
    ct = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_t"))
    tot = ct.agg(F.sum("c_t").alias("total"))
    xe = (
        dt.join(ct, "tok")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c_dt").alias("n_tokens"),
            F.floor(
                (
                    F.log(F.max("total").cast("double"))
                    - F.sum(F.col("c_dt") * F.log(F.col("c_t").cast("double")))
                    / F.sum("c_dt")
                )
                * 1000000
                + F.lit(0.5)
            ).cast("long").alias("xq"),
        )
    )
    w = Window.partitionBy("lang").orderBy("xq", "doc_id")
    cw = Window.partitionBy("lang")
    ranked = (
        xe.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "lang", "doc_id", "n_tokens", "xq",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(cw).alias("n"),
        )
    )
    cuts = ranked.groupBy("lang").agg(
        F.max(
            F.when(
                F.col("rn")
                == F.ceil(F.col("n") / F.lit(3.0)).cast("long"),
                F.col("xq"),
            )
        ).alias("c1"),
        F.max(
            F.when(
                F.col("rn")
                == F.ceil(F.lit(2.0) * F.col("n") / F.lit(3.0)).cast("long"),
                F.col("xq"),
            )
        ).alias("c2"),
    )
    b = ranked.join(F.broadcast(cuts), "lang").select(
        "lang",
        F.when(F.col("xq") <= F.col("c1"), "head")
        .when(F.col("xq") <= F.col("c2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
        "n_tokens",
        "xq",
    )
    return (
        b.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.round(
                F.sum("xq").cast("double")
                / (F.lit(1000000.0) * F.count(F.lit(1))),
                6,
            ).alias("mean_xent"),
        )
        .orderBy("lang", "bucket")
    )


@query(
    "td_multimodal_resize",
    # Payload bytes are pure functions of doc_id (synth_ppm_media:
    # width = 4 + id%8, height = 3 + id%5, byte j = (id*7 + j)%256), and
    # the op's geometry + NN sampling are INTEGER-only (floor divisions),
    # so the oracle replays the resample pixel-for-pixel in closed form:
    # src index si = (y*h//oh)*w + (x*w//ow), channel byte
    # (id*7 + 3*si + c)%256.  sum_rgb is integer-exact — a wrong gather,
    # index off-by-one, or lossy parse shifts it.
    oracle="""
WITH g AS (
  SELECT doc_id, CAST(4 + doc_id % 8 AS BIGINT) AS w,
         CAST(3 + doc_id % 5 AS BIGINT) AS h
  FROM documents),
d AS (
  SELECT doc_id, w, h,
    GREATEST((w * 4) // GREATEST(w, h), 1) AS ow,
    GREATEST((h * 4) // GREATEST(w, h), 1) AS oh
  FROM g),
px AS (
  SELECT doc_id, w, h, ow, oh, unnest(range(0, ow * oh)) AS p
  FROM d),
s AS (
  SELECT doc_id, ow, oh,
    (((p // ow) * h) // oh) * w + ((p % ow) * w) // ow AS si
  FROM px)
SELECT doc_id,
  CAST(ow AS INTEGER) AS out_width, CAST(oh AS INTEGER) AS out_height,
  CAST(SUM((doc_id * 7 + 3 * si) % 256
           + (doc_id * 7 + 3 * si + 1) % 256
           + (doc_id * 7 + 3 * si + 2) % 256) AS BIGINT) AS sum_rgb
FROM s GROUP BY doc_id, ow, oh ORDER BY doc_id
""",
)
def td_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image resize through the multimodal seam: deterministic P6
    PPM payloads built per doc, nearest-neighbor downscaled to longest
    side 4 by an actual numpy gather over the decoded pixel plane
    (operators/multimodal.resize_ppm_items — the pixel path that
    resize_items only plans), resized dims + integer channel sum checked
    against the closed-form oracle.  The thumbnail/normalize step an
    image training pipeline runs before feature extraction; cost is one
    decode + one O(out_pixels) gather per item, embarrassingly parallel,
    no shuffle."""
    docs = table(spark, sf_dir, "documents")
    media = multimodal.synth_ppm_media(docs)
    return multimodal.resize_ppm_items(media, max_side=4).orderBy("doc_id")


@query(
    "td_audio_doc_features",
    # Doc-level clip stats over the REAL RIFF/PCM parse, replayed by the
    # oracle from the synth closed form s_j = (id*13 + j*7) % 4001 - 2000:
    # peak |s|, strict zero crossings (s_j*s_{j-1} < 0, int-exact), and
    # RMS = sqrt(Σs²/n) with the same floor(x*1e6+0.5)/1e6 half-up
    # quantization on both engines.
    oracle="""
WITH s AS (
  SELECT doc_id,
    list_transform(range(0, 16 + doc_id % 17),
                   j -> (doc_id * 13 + j * 7) % 4001 - 2000) AS v
  FROM documents)
SELECT doc_id,
  CAST(len(v) AS BIGINT) AS n_samples,
  CAST(list_max(list_transform(v, x -> abs(x))) AS BIGINT) AS peak_abs,
  CAST(len(list_filter(range(1, len(v)),
       j -> v[j + 1] * v[j] < 0)) AS BIGINT) AS zero_crossings,
  floor(sqrt(CAST(list_sum(list_transform(v, x -> x * x)) AS DOUBLE)
             / CAST(len(v) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
    AS rms
FROM s ORDER BY doc_id
""",
)
def td_audio_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip-level audio curation features through the real codec path:
    synth WAV → binary column → RIFF/PCM chunk walk → numpy reductions
    (operators/multimodal.wav_doc_features) — peak for clipping gates,
    zero-crossing rate for noise/tonality screens, RMS for silence
    filters.  Embarrassingly parallel mapInPandas over the payload
    column, no shuffle; the oracle replays the decoded plane from the
    synth closed form, so what's verified end-to-end is the encode →
    binary → parse → feature loop."""
    docs = table(spark, sf_dir, "documents")
    media = multimodal.synth_wav_media(docs)
    return multimodal.wav_doc_features(media).orderBy("doc_id")
