"""Python UDTF surface (SURVEY.md §2.10 extension tier).

The reference has no pluggable UDF system — custom logic is inline Python
(`/root/reference/transform.py:25-59`).  The engine's rule (§2.10) is:
built-in Column expressions first, Arrow-batched Python only where a
table-valued shape genuinely needs imperative per-row generation.  Spark 4
Python UDTFs are that seam: one input row → many output rows, executed as
``ArrowEvalPythonUDTF`` (Arrow-batched — the plan lint's BatchEvalPython
ban still holds) under a lateral join, partition-parallel with column
pruning intact.

The demonstration operator emits each document's top-3 terms with a
deterministic tie-break — per-row state (a counts dict) that built-ins
would need an explode→groupBy→window detour for, here computed in one
pass over each row.  At 100 TB this is embarrassingly parallel: no
shuffle is introduced; the UDTF runs inside the scan stage.
"""

from __future__ import annotations

import heapq
from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from busdata_pipeline_spark.plans.registry import query


@udtf(returnType="term_rank int, term string, term_count int", useArrow=True)
class DocTopTerms:
    """Top-k most frequent whitespace tokens of one document; ties break
    on the term ascending so output is total-order deterministic."""

    K = 3

    def eval(self, text: str):  # noqa: D102 - contract is the class doc
        # Counter's C-implemented counting loop + a heap top-k instead
        # of a full sort (round-12, guide §4.2: the UDTF seam is the
        # operator under demonstration, so the per-row Python work is
        # minimized rather than eliminated).  The (-count, term) key is
        # a total order (terms unique), so nsmallest == sorted()[:K].
        counts = Counter(text.split(" "))
        best = heapq.nsmallest(
            self.K, counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        for rank, (term, n) in enumerate(best, 1):
            yield rank, term, n


@query(
    "fn_pandas_udaf_geomean",
    # Geometric mean via exp(avg(ln x)) — DuckDB states it in closed
    # form; summation-order float drift is absorbed by ROUND(...,6) on
    # both sides (the repo-wide convention for order-sensitive float
    # aggregates).
    oracle="""
SELECT event_type,
       ROUND(EXP(AVG(LN(value))), 6) AS geo_mean,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE value > 0
GROUP BY event_type
ORDER BY event_type
""",
)
def fn_pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg Pandas UDAF (the remaining UD* shape): per-event-type
    geometric mean of positive readings.  Executes as AggregateInPandas —
    Arrow-batched, one shuffle on the group key; the UDAF sees each
    group's values as a single series (no partial aggregation, which is
    the documented cost of custom Python aggregates vs built-ins)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    # Spark refuses to mix grouped-agg pandas UDFs with built-in
    # aggregates in one Aggregate (INVALID_PANDAS_UDF_PLACEMENT), so the
    # row count is a second pandas aggregate.
    @pandas_udf("long")
    def ngroup(v: pd.Series) -> int:
        return len(v)

    from busdata_pipeline_spark.sources import table

    ev = table(spark, sf_dir, "events").where(F.col("value") > 0)
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(geomean("value"), 6).alias("geo_mean"),
            ngroup("value").alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "fn_udtf_doc_top_terms",
    # Oracle restates the semantics relationally: explode → per-doc term
    # counts → row_number with the same (count desc, term asc) tie-break.
    # Documents are single-space tokenized (no leading/trailing/double
    # spaces — asserted over the corpus), so string_split(' ') and
    # Python str.split(' ') agree token-for-token.
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), cnt AS (
  SELECT doc_id, term, COUNT(*) AS n FROM tok GROUP BY doc_id, term
), ranked AS (
  SELECT doc_id, term, n,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, term) AS rnk
  FROM cnt
)
SELECT doc_id, CAST(rnk AS INT) AS term_rank, term,
       CAST(n AS INT) AS term_count
FROM ranked WHERE rnk <= 3
ORDER BY doc_id, term_rank
""",
)
def fn_udtf_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow Python UDTF under a lateral join: per-document top-3 terms.
    One pass per row; the UDTF executes inside its input stage (plan
    shape pinned in tests/test_udtf.py).

    Round-12 (guide §2.5 input skew): the sf0.1 corpus is ONE parquet
    file → one scan partition, so the entire per-row Python boundary —
    the query's whole cost — ran on a single core.  The input now goes
    through the same under-partitioned-source ``fanout`` the MinHash
    signature pass uses: a repartition that only fires when the input
    has fewer partitions than the session's parallelism, so at real
    scale (thousands of splits) no shuffle is introduced and the
    UDTF still runs inside the scan stage."""
    from busdata_pipeline_spark.operators.dedup import fanout

    spark.udtf.register("doc_top_terms", DocTopTerms)
    fanout(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id"
    ).createOrReplaceTempView("udtf_documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.term_rank, t.term, t.term_count
        FROM udtf_documents d, LATERAL doc_top_terms(d.text) t
        ORDER BY d.doc_id, t.term_rank
        """
    )
