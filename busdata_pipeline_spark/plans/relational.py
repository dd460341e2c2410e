"""Relational coverage beyond the reference's own query shapes — the
join / aggregate / set-op / rollup / semi-anti / rank surface a user of a
warehouse engine expects, expressed over the TPC-H-ish driver tables.

The reference delegates all of this to PostgreSQL's planner
(/root/reference/analytic.sql); here Catalyst owns it.  Scale posture per
query is noted inline: which side broadcasts, where the shuffles are, and
what AQE does at runtime.  These are also the bench headliners (bench.py)
since they stress the biggest tables (lineitem/orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table


def sum_exact_units(col, k) -> "F.Column":
    """Order-free, overflow-safe SUM of ``col`` quantized to 1/k units,
    returned in UNITS as DOUBLE.

    Per ROW: quantize to BIGINT units (lossless — the true value is a
    k-decimal multiple and the IEEE multiply error is ≪ half a unit;
    Spark's cast-to-long truncates == FLOOR for positive money, while
    DuckDB's double->int cast rounds, hence the explicit FLOOR on the
    SQL side only).  The units are summed as a HI/LO pair
    (u >> 20, u & (2^20-1) — shift/mask, one ALU op each in the per-row
    hot path): each half's BIGINT sum stays ~1e6× under int64 overflow,
    so a single group can hold ~9e12 rows before wrapping (a 100 TB
    lineitem is ~6e11 rows — >10× margin even for a whole-table group;
    the unsplit BIGINT sum wrapped at ~8e7 rows for charge-magnitude
    units).  The halves recombine in DOUBLE with the identical cast +
    a*2^20+b op order on both engines — bit-identical to the unsplit
    int→double result below 2^53, deterministic above it.  Pinned by
    tests/test_overflow_headroom.py.

    Oracle twin (u = CAST(FLOOR(expr * K + 0.5) AS BIGINT); the portable
    FLOOR(u / 2^20) and % match the shift/mask bits for non-negative u,
    and the text parses in BOTH dialects — Spark SQL has no //):
      CAST(CAST(SUM(CAST(FLOOR(u / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE) * 1048576.0
      + CAST(CAST(SUM(u % 1048576) AS BIGINT) AS DOUBLE)
    divided by 1.0eK at the end."""
    u = (col * F.lit(k) + F.lit(0.5)).cast("long")
    lo = u.bitwiseAND(F.lit(1048575))
    hi = F.shiftright(u, 20)
    return (F.sum(hi).cast("double") * F.lit(1048576.0)
            + F.sum(lo).cast("double"))


def hl_sum_sql(u: str, div: str) -> str:
    """Oracle-text twin of sum_exact_units: hi/lo-split SUM of the
    BIGINT unit expression ``u`` (SQL text), divided back by ``div``
    (an exponent literal like '1.0e6').  Portable across DuckDB and
    Spark SQL (no ``//``); assumes non-negative units (``%`` is only
    the mask for those — use ``u - hi*2^20`` if negatives appear)."""
    return (
        f"(CAST(CAST(SUM(CAST(FLOOR(({u}) / 1048576.0) AS BIGINT)) AS BIGINT)"
        f" AS DOUBLE) * 1048576.0"
        f" + CAST(CAST(SUM(({u}) % 1048576) AS BIGINT) AS DOUBLE)) / {div}"
    )


# the two per-row unit quantizations the oracles share (SQL text)
D4_SQL = ("CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) "
          "AS BIGINT)")
V6_SQL = "CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)"


def sum_money4(col) -> "F.Column":
    """sum_exact_units at 1e-4 money precision, divided back to the
    natural scale — the revenue-sum recipe (SCALE.md round 9: the
    double-SUM + ROUND form this replaces diverged from the oracle at
    the 100× replica's multi-million-row groups)."""
    return sum_exact_units(col, 10000.0) / F.lit(10000.0)

# ---------------------------------------------------------------------------
# TPC-H Q1 shape — scan-heavy partial+final hash aggregation.

@query(
    "rel_q1_pricing_summary",
    # Every input column is 2-decimal money (verified: max frac error
    # ~1e-9 cents), so the per-row quantizations below are LOSSLESS and
    # the BIGINT sums are exact in ANY summation order — the double-SUM
    # form this replaces failed the strict 100×-replica differential
    # (8.6M-row groups at ~1e10 magnitude accumulate more cross-engine
    # order error than the final ROUND absorbs; ORACLES.md rule 4).
    # Headroom: the high-magnitude unit columns (base price cents
    # ~1e7/row, disc_price 1e-4 units ~1e9/row, charge 1e-6 units
    # ~1e11/row) are summed as HI/LO pairs via sum_exact_units — each
    # half's per-row peak is ≤1e6, so a group needs ~1e13 rows before
    # either BIGINT sum wraps (vs ~8e7 rows for the unsplit charge sum
    # — the round-9 docstring's own warning).  q2/dc2 stay unsplit
    # (per-row ≤1e4 → ≥1e15-row headroom); the margin arithmetic is
    # pinned by tests/test_overflow_headroom.py.  The derived products
    # (disc_price 4-dec, charge 6-dec) are the identical IEEE
    # multiplies on both engines, so their quantized BIGINTs agree
    # bit-for-bit; averages divide the exact sums with the identical
    # op order.
    oracle="""
WITH q AS (
  SELECT l_returnflag, l_linestatus,
    CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS q2,
    CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS p2,
    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
         AS BIGINT) AS d4,
    CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)
               * 1000000.0 + 0.5) AS BIGINT) AS c6,
    CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS dc2
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00')
-- divisors as EXPONENT literals: Spark SQL parses 100.0 as DECIMAL
-- (DuckDB as DOUBLE), and bigint/decimal is decimal — the shared-text
-- twin would emit driver-unhashable dec(24,2) columns; 1.0e2 is
-- DOUBLE in both dialects.  No ROUND on the sums: they are exact unit
-- multiples, and ROUND-to-decimal picks a representable double
-- differently per engine at 1e10 magnitude (1-ulp diff at the 100×
-- rung); the single int->double division is the identical IEEE op.
-- Averages use the FLOOR-quantize cut (both engines, same ops) for
-- the same reason.  p2/d4/c6 sums are the hi/lo-split form (see
-- sum_exact_units docstring for the op-order contract).
SELECT l_returnflag, l_linestatus,
  CAST(SUM(q2) AS BIGINT) / 1.0e2 AS sum_qty,
  (CAST(CAST(SUM(CAST(FLOOR(p2 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE) * 1048576.0
   + CAST(CAST(SUM(p2 % 1048576) AS BIGINT) AS DOUBLE))
    / 1.0e2 AS sum_base_price,
  (CAST(CAST(SUM(CAST(FLOOR(d4 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE) * 1048576.0
   + CAST(CAST(SUM(d4 % 1048576) AS BIGINT) AS DOUBLE))
    / 1.0e4 AS sum_disc_price,
  (CAST(CAST(SUM(CAST(FLOOR(c6 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE) * 1048576.0
   + CAST(CAST(SUM(c6 % 1048576) AS BIGINT) AS DOUBLE))
    / 1.0e6 AS sum_charge,
  FLOOR(CAST(SUM(q2) AS BIGINT) / 1.0e2 / COUNT(*) * 1.0e6 + 0.5)
    / 1.0e6 AS avg_qty,
  FLOOR((CAST(CAST(SUM(CAST(FLOOR(p2 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE) * 1048576.0
         + CAST(CAST(SUM(p2 % 1048576) AS BIGINT) AS DOUBLE))
        / 1.0e2 / COUNT(*) * 1.0e6 + 0.5)
    / 1.0e6 AS avg_price,
  FLOOR(CAST(SUM(dc2) AS BIGINT) / 1.0e2 / COUNT(*) * 1.0e6 + 0.5)
    / 1.0e6 AS avg_disc,
  COUNT(*) AS count_order
FROM q
GROUP BY l_returnflag, l_linestatus
""",
)
def rel_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: the canonical scan+agg stress test.  Whole plan is
    one WholeStageCodegen span over the parquet scan with a 6-group hash
    agg — map-side partial agg means the shuffle moves 6 rows per task
    regardless of input size.  Money arithmetic is quantized per ROW to
    exact integer cents / 1e-4 / 1e-6 units (lossless — the inputs are
    2-decimal money) so the BIGINT sums are order-free exact and the
    result is bit-stable at EVERY scale rung; the prior double-SUM form
    diverged from the oracle at the 100× replica's 8.6M-row groups.
    Averages divide the same exact sums (identical op order on both
    engines)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def units(col, k):
        # cast-to-long truncates toward zero == FLOOR for these
        # positive money values (cheaper than floor(); the ORACLE keeps
        # CAST(FLOOR(...) AS BIGINT) because DuckDB's double->int cast
        # rounds to nearest instead of truncating)
        return (col * F.lit(k) + F.lit(0.5)).cast("long")

    n = F.count(F.lit(1))
    sq2 = F.sum(units(F.col("l_quantity"), 100.0))
    sp2 = sum_exact_units(F.col("l_extendedprice"), 100.0)
    sd4 = sum_exact_units(disc_price, 10000.0)
    sc6 = sum_exact_units(charge, 1000000.0)
    sdc2 = F.sum(units(F.col("l_discount"), 100.0))

    def cut6(x):
        # the FLOOR-quantize half-up cut — ROUND-to-decimal picks the
        # representable double differently per engine at 1-ulp level
        return F.floor(x * F.lit(1.0e6) + F.lit(0.5)) / F.lit(1.0e6)

    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (sq2 / F.lit(100.0)).alias("sum_qty"),
            (sp2 / F.lit(100.0)).alias("sum_base_price"),
            (sd4 / F.lit(10000.0)).alias("sum_disc_price"),
            (sc6 / F.lit(1000000.0)).alias("sum_charge"),
            cut6(sq2 / F.lit(100.0) / n).alias("avg_qty"),
            cut6(sp2 / F.lit(100.0) / n).alias("avg_price"),
            cut6(sdc2 / F.lit(100.0) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — dim-filter -> big join -> top-k.

@query(
    "rel_q3_top_revenue",
    oracle="""
SELECT l.l_orderkey AS l_orderkey,
  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
  o.o_orderdate AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def rel_q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-10.  customer is filtered on the segment then
    broadcast into orders (no fact shuffle for the first join); the
    orders⨝lineitem join shuffles on orderkey — at 100 TB that is the
    bottleneck shuffle, bounded by pre-filtering both sides first.
    Ordering uses the ROUNDED revenue so the top-k cut matches the oracle
    bit-for-bit; orderkey breaks ties deterministically."""
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                orders.o_custkey == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape — snowflake multi-join with two broadcast tiers.

@query(
    "rel_q5_region_revenue",
    # revenue quantized per ROW to exact 1e-4 units and summed hi/lo
    # (the sum_money4 recipe — see sum_exact_units): order-free exact
    # at any group size, overflow-safe to ~9e12 rows per group.  The
    # prior double-SUM + ROUND form was the same order-dependent class
    # the 100× differential caught on Q1/Q19 (SCALE.md round 9), one
    # magnitude of headroom later.
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
         AS BIGINT) AS d4
  FROM lineitem)
SELECT n.n_name AS n_name,
  (CAST(CAST(SUM(CAST(FLOOR(l.d4 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE) * 1048576.0
   + CAST(CAST(SUM(l.d4 % 1048576) AS BIGINT) AS DOUBLE))
    / 1.0e4 AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN li l       ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def rel_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume.  region→nation→customer collapse to one
    broadcast-joined dim chain (all tiny); the only real shuffles are
    orders⨝lineitem on orderkey and the supplier equality — supplier is
    broadcast too.  The s_nationkey = c_nationkey residual keeps only
    intra-nation sales, matching TPC-H Q5 semantics."""
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dim), F.col("o_custkey") == dim.c_custkey)
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            (li.l_suppkey == F.col("s_suppkey"))
            & (F.col("s_nationkey") == dim.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            sum_money4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape — pure pushdown filter + single scalar agg.

@query(
    "rel_q6_forecast_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def rel_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change: every predicate is pushable, so the scan
    should show 4 PushedFilters and read 4 columns — the plan-shape test
    for pushdown (see tests/test_plan_shapes.py)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape — conditional-aggregate ratio over a fact×dim join.

@query(
    "rel_q14_promo_revenue",
    oracle="""
SELECT ROUND(
  100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN l.l_extendedprice * (1 - l.l_discount)
                   ELSE 0 END)
        / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
""",
)
def rel_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share: the shipdate slice prunes the fact scan,
    part joins broadcast (dim carries only partkey+type after pruning),
    and the CASE ratio folds into one hash aggregate — no second pass."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# ROLLUP — hierarchical subtotals (free via Catalyst Expand).

@query(
    "rel_rollup_customer_counts",
    oracle="""
SELECT r.r_name AS r_name, n.n_name AS n_name,
       COUNT(*) AS n_customers, ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def rel_rollup_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region ⊃ nation subtotal hierarchy.  Spark plans ROLLUP as a single
    Expand (3 grouping sets) + one hash agg — one pass over the fact, not
    three queries."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — EXISTS semi-join with a per-row range condition.

@query(
    "rel_q4_late_ship_priority",
    oracle="""
SELECT o.o_orderpriority AS o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o.o_orderpriority
""",
)
def rel_q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority counts for orders with at least one lineitem
    shipped after the order date: LEFT SEMI with a non-equi residual —
    the probe stops at the first match per order, and only
    (orderkey, shipdate) crosses the wire from the fact side."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — HAVING on an aggregate, joined back to dimensions.

@query(
    "rel_q18_large_orders",
    oracle="""
SELECT c.c_name AS c_name, o.o_orderkey AS o_orderkey,
       ROUND(SUM(l.l_quantity), 2) AS total_qty
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_name, o.o_orderkey
HAVING ROUND(SUM(l.l_quantity), 2) > 250
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
""",
)
def rel_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: aggregate-then-filter (HAVING) with the
    customer name joined in.  The quantity rollup happens BEFORE the
    customer join, so the dim join sees only surviving orders."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", F.col("o_orderkey"), "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Semi / anti joins — EXISTS / NOT EXISTS.

@query(
    "rel_semi_customers_with_orders",
    oracle="""
SELECT c.c_mktsegment AS c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
""",
)
def rel_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI — customers that ordered at least once, by segment."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "rel_anti_customers_without_orders",
    oracle="""
SELECT COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def rel_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI — the S12 upsert-ignore building block, standalone."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape — LEFT OUTER join + two-level aggregation histogram.

@query(
    "rel_q13_order_count_histogram",
    oracle="""
SELECT c_count, COUNT(*) AS n_customers
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def rel_q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution: the outer join keeps
    zero-order customers (COUNT of the null orderkey = 0), then a second
    aggregation histograms the counts.  Both aggs are partial+final;
    the second one's input is already customer-cardinality."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape — scalar-subquery filter + NOT EXISTS.

@query(
    "rel_q22_rich_active_customers",
    oracle="""
SELECT SUBSTRING(c.c_name, 1, 9) AS name_prefix,
       COUNT(*) AS n_customers, ROUND(SUM(c.c_acctbal), 2) AS total_bal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_acctbal > 0)
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY SUBSTRING(c.c_name, 1, 9)
""",
)
def rel_q22_rich_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers who have ordered: the global
    average is a 1-row aggregate broadcast as a cross join (a scalar
    subquery's physical form), the has-orders test is a LEFT SEMI (the
    anti flavor is covered by rel_anti_customers_without_orders)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("_avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.substring("c_name", 1, 9).alias("name_prefix"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape — two-nation trade flow with year extraction.

@query(
    "rel_q7_nation_trade",
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_suppkey, l_shipdate,
    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
         AS BIGINT) AS d4
  FROM lineitem)
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       EXTRACT(YEAR FROM l.l_shipdate) AS ship_year,
       (CAST(CAST(SUM(CAST(FLOOR(l.d4 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE) * 1048576.0
        + CAST(CAST(SUM(l.d4 % 1048576) AS BIGINT) AS DOUBLE))
         / 1.0e4 AS revenue
FROM li l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, EXTRACT(YEAR FROM l.l_shipdate)
""",
)
def rel_q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-border revenue by (supplier nation, customer nation, year).
    supplier+nation and customer+nation collapse into two broadcast dim
    chains; the only fact shuffle is orders⨝lineitem on orderkey.  The
    inequality (different nations) is a cheap post-join residual."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s_dim = (
        table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c_dim = (
        table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s_dim), li.l_suppkey == s_dim.s_suppkey)
        .join(F.broadcast(c_dim), F.col("o_custkey") == c_dim.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            sum_money4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Window rank over a join — top order per customer.

@query(
    "rel_rank_top_order_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1 AND o_custkey < 100
""",
)
def rel_rank_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking (absent from the reference but free in the same Window
    machinery as W1-W4); the rn=1 filter plans as a WindowGroupLimit —
    Spark keeps only the per-partition top row before the full sort."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.where(F.col("o_custkey") < 100)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# PIVOT — wide conditional-aggregate matrix.

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@query(
    "rel_pivot_segment_by_type",
    oracle="""
SELECT c.c_mktsegment AS c_mktsegment,
  {cols}
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""".format(cols=",\n  ".join(
        # CAST: DuckDB SUM(int) yields HUGEINT (int128); Spark's pivot
        # count is BIGINT — the round-1 hash mismatch was that width.
        f"CAST(SUM(CASE WHEN e.event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
        for t in _EVENT_TYPES)),
)
def rel_pivot_segment_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts per market segment pivoted over event type.  The
    explicit value list keeps the plan a single pass (no distinct-values
    pre-query) and the output schema static — the requirement for a
    PIVOT to be sane at 100 TB."""
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        # A (segment, type) combo absent at some SF pivots to NULL;
        # the oracle's SUM(CASE) makes it 0 — align.
        .na.fill(0, subset=list(_EVENT_TYPES))
    )


# ---------------------------------------------------------------------------
# Exact percentiles — interpolated, per group.

@query(
    "rel_value_percentiles",
    oracle="""
SELECT event_type,
  ROUND(quantile_cont(value, 0.5), 6) AS p50,
  ROUND(quantile_cont(value, 0.95), 6) AS p95
FROM events WHERE value IS NOT NULL
GROUP BY event_type
""",
)
def rel_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    SQL-standard continuous quantile == DuckDB quantile_cont).  The
    exact form needs the group's values collected per partition-key —
    fine per-group; the corpus-wide scalable variant is
    ``approx_percentile`` (td_sketches)."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


@query(
    "rel_grouped_percentile_disc",
    # percentile_disc returns an ACTUAL element of the group (no
    # interpolation), so the comparison is exact with no rounding —
    # both engines implement the SQL-standard definition (first value
    # whose cumulative distribution >= p; verified to agree on the
    # boundary cases).  median is continuous and rounded like
    # rel_value_percentiles.
    oracle="""
SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
  CAST(COUNT(*) AS BIGINT) AS n,
  percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25_disc,
  percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50_disc,
  percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90_disc,
  ROUND(median(value), 6) AS median_cont
FROM events WHERE value IS NOT NULL
GROUP BY user_id % 10
""",
)
def rel_grouped_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group DISCRETE percentiles + continuous median over a
    derived 10-bucket grouping — the percentile_disc parity complement
    to rel_value_percentiles (which is quantile_cont).  Exact grouped
    percentiles sort within the hash-partitioned group only; the
    corpus-wide scalable variant stays approx_percentile
    (td_sketches)."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return ev.groupBy(
        (F.col("user_id") % 10).cast("long").alias("user_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("p25_disc"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50_disc"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90_disc"),
        F.round(F.median("value"), 6).alias("median_cont"),
    )


# ---------------------------------------------------------------------------
# Set operations — INTERSECT / EXCEPT (distinct semantics).

@query(
    "rel_set_retained_users",
    oracle="""
SELECT user_id FROM events WHERE ts::date = DATE '2024-01-01'
INTERSECT
SELECT user_id FROM events WHERE ts::date = DATE '2024-01-02'
""",
)
def rel_set_retained_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — users active on both days (plans as a semi-join agg)."""
    ev = table(spark, sf_dir, "events")
    d1 = ev.where(F.to_date("ts") == F.lit("2024-01-01").cast("date")).select("user_id")
    d2 = ev.where(F.to_date("ts") == F.lit("2024-01-02").cast("date")).select("user_id")
    return d1.intersect(d2)


@query(
    "rel_set_churned_users",
    oracle="""
SELECT user_id FROM events WHERE ts::date = DATE '2024-01-01'
EXCEPT
SELECT user_id FROM events WHERE ts::date = DATE '2024-01-02'
""",
)
def rel_set_churned_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — users active on day 1 but not day 2 (anti-join plan)."""
    ev = table(spark, sf_dir, "events")
    d1 = ev.where(F.to_date("ts") == F.lit("2024-01-01").cast("date")).select("user_id")
    d2 = ev.where(F.to_date("ts") == F.lit("2024-01-02").cast("date")).select("user_id")
    return d1.subtract(d2)  # EXCEPT DISTINCT (exceptAll would keep multiset leftovers)
