"""Third relational tier — the remaining TPC-H query shapes (Q2, Q9,
Q11, Q16, Q20 analogs) the engine had not yet exercised.

The driver's star schema has no ``partsupp`` table, so the four queries
that consume it in TPC-H are re-grounded on ``lineitem`` as the
part↔supplier link (supply cost ≈ observed discounted unit price); the
*operator shapes* — correlated per-group MIN, profit multi-join with two
dimension chains, HAVING against a global aggregate, NOT-IN exclusion
with COUNT DISTINCT, and a nested semi-join chain — are preserved
exactly.  The reference delegates all such shapes to PostgreSQL
(/root/reference/analytic.sql); here Catalyst owns the plan.

Scale posture per query is noted inline.  Shared rules:

- dimension sides (part / supplier / nation / region) are broadcast —
  never a shuffle keyed on a dim;
- every aggregate over ``lineitem`` is a partial+final hash agg, so the
  one big shuffle moves group rows, not fact rows;
- double-valued threshold comparisons that could flip on summation
  order are done in exact DECIMAL (the rel_decimal_money_sums
  discipline) so Spark and the oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table


# ---------------------------------------------------------------------------
# TPC-H Q2 shape — correlated per-group MIN ("cheapest supplier per part").

@query(
    "rel_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice * (1 - l_discount) / l_quantity) AS supply_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
cand AS (
  SELECT p.p_partkey, p.p_brand, c.l_suppkey, c.supply_cost
  FROM cost c
  JOIN part p ON p.p_partkey = c.l_partkey
  WHERE p.p_size = 15
),
best AS (
  SELECT p_partkey, MIN(supply_cost) AS min_cost FROM cand GROUP BY p_partkey
)
SELECT s.s_acctbal AS s_acctbal, s.s_name AS s_name, n.n_name AS n_name,
       c.p_partkey AS p_partkey, c.p_brand AS p_brand,
       c.supply_cost AS supply_cost
FROM cand c
JOIN best b ON b.p_partkey = c.p_partkey AND c.supply_cost = b.min_cost
JOIN supplier s ON s.s_suppkey = c.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def rel_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog: for each size-15 part, the EUROPE supplier(s)
    observed at the minimum discounted unit price.

    The correlated scalar subquery (``cost = (SELECT MIN …)``)
    decorrelates into: one hash agg over lineitem keyed
    (partkey, suppkey), a broadcast part-filter join *before* the
    per-part MIN (so the second agg sees only ~p_size×p_type-selective
    rows), and an equi-join back on (partkey, cost).  MIN over identical
    IEEE per-row values is order-independent, so the double equality is
    engine-stable, and supply_cost is emitted RAW (un-ROUNDed): both
    engines produce bit-identical doubles here, while ROUND(x, 6) itself
    diverges by 1 ulp between Spark's exact-BigDecimal and DuckDB's
    float-arithmetic rounding on division-dirty mantissas (caught by the
    sf0.1 replica differential).  Scale: the only fact-sized shuffle is the first agg;
    everything after operates on the pruned candidate set with all dims
    broadcast."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        F.col("p_size") == 15
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    unit = F.col("l_extendedprice") * (1 - F.col("l_discount")) / F.col("l_quantity")
    cost = (
        li.select("l_partkey", "l_suppkey", unit.alias("unit_cost"))
        .join(F.broadcast(p.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_brand", "l_suppkey")
        .agg(F.min("unit_cost").alias("supply_cost"))
    )
    best = cost.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    dim = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    return (
        cost.join(F.broadcast(best),
                  (F.col("p_partkey") == F.col("bp"))
                  & (F.col("supply_cost") == F.col("min_cost")))
        .join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "supply_cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape — product-line profit by nation and year.

@query(
    "rel_q9_product_profit",
    oracle="""
SELECT n.n_name AS nation,
       EXTRACT(YEAR FROM l.l_shipdate)::BIGINT AS o_year,
       CAST(CAST(SUM(
         CAST(l.l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
         - CAST(p.p_retailprice AS DECIMAL(18,4))
           * CAST(l.l_quantity AS DECIMAL(18,4)) * CAST(0.5 AS DECIMAL(2,1))
       ) AS DECIMAL(38,8)) AS VARCHAR) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def rel_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 analog: profit (revenue minus a retail-price-proportional cost
    stand-in for the missing ps_supplycost) on 'red' parts, grouped by
    supplier nation × ship year.

    Scale: part (name-filtered) and supplier⋈nation both broadcast into
    the lineitem scan, so the plan is scan → two broadcast hash joins →
    partial/final hash agg; the only shuffle carries
    |nations|×|years| groups.  Profit is summed in exact DECIMAL so the
    engine-vs-oracle comparison is bit-identical with no ROUND
    canonicalization; the FINAL column is rendered as the fixed-scale
    decimal string because the driver's pandas canonicalizer keeps
    Spark Decimals as objects but collapses DuckDB decimals to
    float64 (round-7 lesson)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")

    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    profit = (
        dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
        - dec("p_retailprice") * dec("l_quantity") * F.lit(0.5).cast("decimal(2,1)")
    )
    supp_nat = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")) \
                .select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("decimal(38,8)").cast("string")
              .alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape — groups exceeding a fraction of a global aggregate.

@query(
    "rel_q11_important_parts",
    oracle="""
WITH scoped AS (
  SELECT l.l_partkey,
         CAST(l.l_extendedprice AS DECIMAL(18,4))
           * CAST(l.l_quantity AS DECIMAL(18,4)) AS v
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
)
SELECT l_partkey AS p_partkey,
       CAST(CAST(SUM(v) AS DECIMAL(38,8)) AS VARCHAR) AS part_value
FROM scoped
GROUP BY l_partkey
HAVING SUM(v) > (SELECT SUM(v) * CAST(0.002 AS DECIMAL(4,3)) FROM scoped)
ORDER BY SUM(v) DESC, p_partkey
""",
)
def rel_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 analog: parts whose traded value through NATION_7 suppliers
    exceeds 0.2% of that nation's total traded value.

    The HAVING-vs-global-scalar shape: one grouped agg, one 1-row global
    agg, and a scalar-broadcast crossJoin to compare (the whitelisted
    1-row-expansion pattern — no O(n²) anywhere).  Value sums are exact
    DECIMAL end to end, so the >-threshold cannot flip on float
    summation order in either engine (the final column is rendered as
    the decimal STRING for driver-hashability — round-7 lesson; the
    ORDER BY keys on the decimal value, pre-cast).  Scale:
    nation-filtered suppliers
    broadcast into the scan; both aggs are partial+final; the global
    scalar re-aggregates the *grouped* output (|parts| rows), not the
    fact table, so the scan runs once per branch off a shared pruned
    projection."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")

    supp = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")) \
            .select("s_suppkey")
    v = (F.col("l_extendedprice").cast("decimal(18,4)")
         * F.col("l_quantity").cast("decimal(18,4)"))
    scoped = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", v.alias("v"))
    )
    per_part = scoped.groupBy(F.col("l_partkey").alias("p_partkey")) \
                     .agg(F.sum("v").alias("pv"))
    total = per_part.agg(
        (F.sum("pv") * F.lit(0.002).cast("decimal(4,3)")).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("pv") > F.col("threshold"))
        .orderBy(F.desc("pv"), "p_partkey")
        .select("p_partkey",
                F.col("pv").cast("decimal(38,8)").cast("string")
                 .alias("part_value"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — COUNT DISTINCT with a NOT-IN supplier exclusion.

@query(
    "rel_q16_supplier_counts",
    oracle="""
SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 28, 35)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def rel_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analog: distinct supplier counts per (brand, type, size) slice,
    excluding negative-balance suppliers (the stand-in for TPC-H's
    'Customer Complaints' predicate — the schema has no s_comment).

    The NOT IN over a key column with no NULLs compiles to a broadcast
    left-anti join; the part predicate trio prunes via a broadcast
    semi-side join.  COUNT DISTINCT expands to the standard two-level
    agg (partial distinct per partition, final exact) — no extra shuffle
    beyond the grouped one.  Scale-safe: both dims broadcast, one
    fact shuffle keyed on the 3-column group."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 35))
    )
    bad = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0) \
                                          .select("s_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape — nested semi-join chain.

@query(
    "rel_q20_promo_part_suppliers",
    oracle="""
WITH blue_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
),
shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM blue_parts)
  GROUP BY l_partkey, l_suppkey
)
SELECT s.s_name AS s_name, ROUND(s.s_acctbal, 2) AS s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
  AND s.s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 60)
ORDER BY s_name
""",
)
def rel_q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog: EUROPE suppliers who moved >60 units of 'blue' parts
    in 1996 — the nested IN (… IN (…)) chain.

    Decorrelation: blue_parts broadcast-semi-prunes the date-filtered
    lineitem scan *before* the (partkey, suppkey) agg; qualifying
    suppkeys then broadcast-semi-filter the supplier dim.  Quantity sums
    are small exact-in-double integers, so the >60 threshold is
    engine-stable without DECIMAL.  Scale: one fact shuffle (the agg on
    pruned rows); every other edge is a broadcast semi."""
    li = table(spark, sf_dir, "lineitem")
    blue = table(spark, sf_dir, "part").where(F.col("p_name").like("blue%")) \
                                        .select("p_partkey")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"),
              "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 60)
        .select("l_suppkey")
    )
    eur_nat = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")) \
               .select("n_nationkey")
    return (
        s.join(F.broadcast(eur_nat), F.col("s_nationkey") == F.col("n_nationkey"),
               "left_semi")
        .join(F.broadcast(shipped), F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )
