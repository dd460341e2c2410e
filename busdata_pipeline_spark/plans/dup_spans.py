"""Exact duplicated-substring span detection (training-data tier).

Exact-substring dedup ("Deduplicating Training Data Makes Language Models
Better", Lee et al. 2022) removes *spans* that repeat across documents,
not whole near-dup documents.  The paper's suffix-array construction is a
single-machine algorithm; the Spark-native equivalent is n-gram
fingerprinting: a token span is duplicated iff every length-n window in
it occurs in ≥ 2 distinct documents, so

1. explode each document's overlapping n-grams with their start position
   (built-in ``transform``/``sequence`` array algebra — no Python),
2. fingerprint each n-gram (xxhash64 — only 8-byte hashes + positions
   shuffle, never text; the same only-hashes-move discipline as exact
   dedup),
3. keep fingerprints seen in ≥ 2 distinct docs (hash-agg, map-side
   partial),
4. per document, merge overlapping/adjacent duplicated windows into
   maximal spans (gaps-and-islands over one window shuffle keyed by
   doc — intervals share length n, so ``lag(pos)`` ordering makes the
   island test a single comparison, no running max needed).

Cost at 100 TB: step 2's shuffle carries ~tokens-per-doc 8-byte keys per
document — the same order as the MinHash signature explode — and every
aggregation is partial+final.  No all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from busdata_pipeline_spark.plans.registry import query

#: window width in tokens; spans shorter than this cannot be detected
#: (the Lee et al. length threshold — theirs is 50 BPE tokens, scaled
#: down for the synthetic corpus).
NGRAM = 8


def duplicated_spans(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """Maximal cross-document duplicated token spans per document:
    (doc_id, span_start, span_end, n_tokens), positions 1-based."""
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("t")
    ).where(F.size("t") >= n)
    # overlapping n-gram starts: pos = 1 .. len-n+1.  Each token is
    # hashed ONCE (tokens contain no spaces, so token-sequence identity
    # == joined-string identity), and the gram fingerprint hashes the
    # n-long slice of token hashes — fixed-width work per gram instead
    # of rebuilding every n-token string (round-12, guide §1.2 per-task
    # work; the fingerprint value changes but it only feeds equality
    # grouping, same vanishing-collision argument as before).
    grams = (
        # token hashes materialized as their own column so each token
        # is hashed once per document, not once per covering gram (the
        # with_shingles materialize-once pattern)
        toks.withColumn("hs", F.expr("transform(t, x -> xxhash64(x))"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(hs) - {n} + 1), "
                    f"i -> xxhash64(slice(hs, i, {n})))"
                )
            ).alias("off", "gram_hash"),
        )
        .select("doc_id", (F.col("off") + 1).alias("pos"), "gram_hash")
    )
    # One explicit exchange on gram_hash serves BOTH consumers (the
    # dup-hash aggregate and the position join-back): the explode
    # subtree executes once as a ReusedExchange instead of twice
    # (round-12, guide §2.4 "two operations keyed the same way share
    # one exchange").
    grams = grams.repartition("gram_hash")

    dup_hashes = (
        grams.groupBy("gram_hash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("gram_hash")
    )

    dup_pos = grams.join(dup_hashes, "gram_hash").select("doc_id", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        dup_pos.withColumn(
            "new_island",
            F.when(
                F.lag("pos").over(w).isNull()
                | (F.col("pos") > F.lag("pos").over(w) + n),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("n_tokens"),
        )
        .orderBy("doc_id", "span_start")
    )


@query(
    "td_dup_span_detect",
    # Oracle replays the same construction on gram STRINGS (no xxhash64
    # in DuckDB) — identical output unless a 64-bit hash collision maps
    # two distinct grams together, which the corpus size makes
    # vanishing.  Islands: same-length intervals sorted by start merge
    # iff next_start <= prev_start + n.
    # toks/grams MATERIALIZED: the gram explode references t per gram
    # and grams feeds both dup and dup_pos — inlined, DuckDB re-split/
    # re-grammed the corpus per reference, which kept this LINEAR
    # oracle on the 10×-replica skip list (ORACLES.md rule 7; 1.8 s at
    # 10× once fixed)
    oracle=f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= {NGRAM}
), grams AS MATERIALIZED (
  SELECT doc_id, i AS pos,
         array_to_string(t[i : i + {NGRAM} - 1], ' ') AS gram
  FROM toks, UNNEST(range(1, len(t) - {NGRAM} + 2)) AS r(i)
), dup AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING COUNT(DISTINCT doc_id) >= 2
), dup_pos AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN LAG(pos) OVER w IS NULL
                OR pos > LAG(pos) OVER w + {NGRAM} THEN 1 ELSE 0 END
           AS new_island
  FROM dup_pos
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), islands AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT doc_id,
       CAST(MIN(pos) AS INT) AS span_start,
       CAST(MAX(pos) + {NGRAM} - 1 AS INT) AS span_end,
       CAST(MAX(pos) + {NGRAM} - MIN(pos) AS INT) AS n_tokens
FROM islands
GROUP BY doc_id, island
ORDER BY doc_id, span_start
""",
)
def td_dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span inventory over the documents table
    (exact-substring dedup, n-gram formulation)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicated_spans(docs)
