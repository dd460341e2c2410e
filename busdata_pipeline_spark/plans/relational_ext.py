"""Second relational tier: multi-dimensional aggregation (CUBE /
GROUPING SETS), explicit window frames (ROWS / RANGE), NTILE bucketing,
and batch sessionization.

The reference delegates every relational shape to PostgreSQL
(/root/reference/analytic.sql); these queries extend the engine's own
surface past what analytic.sql exercises, with the same contract as
plans/relational.py: every query is a registered name with a DuckDB
oracle, deterministic tie-breaks, and a noted scale posture.

Scale notes common to the module: CUBE/GROUPING SETS compile to a single
Expand + partial/final hash aggregate (rows are replicated per grouping
set map-side, no extra shuffle rounds); window-frame queries are one
hash-partition shuffle on the partition key with frames evaluated in a
streaming pass over each sorted partition; sessionization is the same
single window shuffle keyed by user — no self-joins anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.plans.relational import (
    hl_sum_sql,
    sum_exact_units,
    sum_money4,
)
from busdata_pipeline_spark.sources import table

# ---------------------------------------------------------------------------
# multi-dimensional aggregation

@query(
    "rel_cube_flag_status",
    # sum_qty in exact integer centi-units (the rel_q1 discipline):
    # the ALL/ALL grouping set sums the WHOLE table in one group —
    # the order-dependent double-SUM class the 100× differential
    # caught on Q1/Q19, one magnitude of headroom later.  l_quantity
    # is 2-decimal, so the quantization is lossless; one int→double
    # division, no ROUND.
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) / 1.0e2 AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def rel_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    Expand + hash aggregate; grouping_id disambiguates real NULLs from
    subtotal rows (both engines use the SQL-standard bitmask)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            (F.sum((F.col("l_quantity") * F.lit(100.0) + F.lit(0.5))
                   .cast("long"))  # trunc == floor for positive qty
             / F.lit(100.0)).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n_items",
            "sum_qty",
        )
    )


@query(
    "rel_grouping_sets_priority",
    # revenue in exact integer cents summed hi/lo (the sum_exact_units
    # recipe): the double SUM failed the strict 100×-replica
    # differential — the grand-total grouping set sums 10M rows in one
    # group, past what ROUND(…,2) absorbs — and the unsplit cents sum
    # of a whole-table group at a true 100 TB (~1.5e11 orders × ~5e7
    # cents) would graze int64.  o_totalprice is 2-decimal money, so
    # the quantization is lossless; one division, no ROUND.
    oracle="""
WITH o AS (
  SELECT o_orderstatus, o_orderpriority,
    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS p2
  FROM orders)
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n_orders,
       (CAST(CAST(SUM(CAST(FLOOR(p2 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE) * 1048576.0
        + CAST(CAST(SUM(p2 % 1048576) AS BIGINT) AS DOUBLE))
         / 1.0e2 AS revenue
FROM o
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def rel_grouping_sets_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent 1-D breakdowns plus the
    grand total in one pass (Expand factor 3, not three scans)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (sum_exact_units(F.col("o_totalprice"), 100.0)
             / F.lit(100.0)).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# explicit window frames

@query(
    "rel_moving_avg_customer",
    oracle="""
SELECT o_custkey, o_orderkey,
  ROUND(AVG(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mavg_4
FROM orders
""",
)
def rel_moving_avg_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-4-orders moving average per customer: an explicit ROWS
    frame (the reference's windows are all lag/lead; frames extend W1-W4).
    Tie-broken by orderkey so the frame contents are deterministic."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 6).alias("mavg_4"),
    )


@query(
    "rel_range_frame_trailing30d",
    oracle="""
SELECT o_custkey, o_orderkey,
  COUNT(*) OVER w AS n_orders_30d,
  ROUND(SUM(o_totalprice) OVER w, 2) AS revenue_30d
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY date_diff('day', DATE '1995-01-01', o_orderdate)
  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
""",
)
def rel_range_frame_trailing30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day order count/revenue per customer: a RANGE frame
    over a day ordinal.  RANGE includes peers, so ties on the order date
    need no tie-break to stay deterministic."""
    orders = table(spark, sf_dir, "orders")
    day_ord = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_ord)
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_30d"),
    )


@query(
    "rel_ntile_acctbal",
    oracle="""
WITH q AS (
  SELECT c_custkey, c_acctbal,
    CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
  FROM customer)
SELECT quartile, COUNT(*) AS n_customers,
  ROUND(MIN(c_acctbal), 2) AS min_bal,
  ROUND(MAX(c_acctbal), 2) AS max_bal,
  ROUND(AVG(c_acctbal), 6) AS avg_bal
FROM q
GROUP BY quartile
""",
)
def rel_ntile_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance quartiles via NTILE (SQL-standard even split,
    remainder to the leading buckets), deterministic through the custkey
    tie-break.  Scale note: a global NTILE is a single-partition sort —
    fine for a dimension table; for fact-scale data use ntile within
    hash partitions or approx percentiles (rel_value_percentiles)."""
    cust = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    q = cust.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )
    return q.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
    )


# ---------------------------------------------------------------------------
# skew-safe aggregation (driver-visible face of operators/skew.py)

@query(
    "rel_skew_salted_user_totals",
    oracle="""
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  ROUND(SUM(value), 6) AS total_value,
  ROUND(MAX(value), 6) AS max_value
FROM events
GROUP BY user_id
""",
)
def rel_skew_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over events keyed by user_id: phase 1
    groups by (user_id, salt) so a hot user spreads across tasks, phase 2
    merges the per-salt partials.  The oracle is the plain GROUP BY —
    any salt assignment yields identical results (only decomposable
    aggregates are allowed through operators/skew.py), which is exactly
    the property that makes the trick safe under task retries."""
    from busdata_pipeline_spark.operators.skew import salted_agg

    events = table(spark, sf_dir, "events")
    out = salted_agg(
        events,
        keys=["user_id"],
        aggs={
            "n_events": ("count", "value"),
            "total_value": ("sum", "value"),
            "max_value": ("max", "value"),
        },
        buckets=16,
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("total_value", 6).alias("total_value"),
        F.round("max_value", 6).alias("max_value"),
    )


# ---------------------------------------------------------------------------
# batch sessionization

@query(
    "rel_sessionize_users",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EXTRACT(EPOCH FROM ts - LAG(ts) OVER w) > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts,
    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged)
SELECT user_id, session_idx,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_idx
""",
)
def rel_sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts after a >30 min gap.
    Gap flag (lag) and session index (running sum) share ONE window
    exchange keyed by user_id; the per-session rollup reuses the same
    hash partitioning.  The streaming twin is st_session_5min
    (session_window) — this is the batch formulation over history."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = events.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_idx",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# rank-distribution windows

@query(
    "rel_percent_rank_cume",
    oracle="""
SELECT o_orderkey, o_orderstatus,
  ROUND(PERCENT_RANK() OVER w, 6) AS pr,
  ROUND(CUME_DIST() OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
""",
)
def rel_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per order-status partition.  Both are
    tie-stable by definition (peers share rank / cumulative count), so no
    tie-break column is needed; one exchange serves both functions."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item revenue per customer

@query(
    "rel_q10_returned_revenue",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def rel_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers.
    Scale posture: the returnflag filter pushes to the lineitem scan,
    customer/nation broadcast, the single big shuffle is the
    orderkey join, and the top-20 is TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# slowly-changing-dimension (type 2) history construction

@query(
    "rel_scd2_user_type_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events),
chg AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type)
SELECT user_id,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
  event_type,
  ts AS valid_from,
  LEAD(ts) OVER w AS valid_to
FROM chg
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def rel_scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse each user's
    event_type stream into validity intervals — consecutive repeats drop,
    each change opens a version with valid_from/valid_to (NULL = current).
    Both window passes share the user_id hash partitioning, so the second
    window reuses the first exchange."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        events.withColumn("_prev", F.lag("event_type").over(w))
        .where(F.col("_prev").isNull()
               | (F.col("event_type") != F.col("_prev")))
    )
    return chg.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape — correlated aggregate subquery (small-quantity orders)

@query(
    "rel_q17_small_quantity_revenue",
    # the single-group revenue SUM in exact integer cents summed hi/lo
    # (the sum_exact_units recipe — this is the same order-dependent
    # double-SUM class the 100× differential caught, one magnitude of
    # headroom later); sum/7.0 is not a unit multiple, so the final
    # value takes the FLOOR-quantize half-up cut (identical IEEE ops
    # both engines) instead of ROUND.  The correlated qty_cut stays
    # double: the per-part AVG groups are bounded (~30 lineitems per
    # part at any SF), not the unbounded-group class.
    oracle="""
WITH kept AS (
  SELECT CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) AS p2
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#13'
    AND l.l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey))
SELECT FLOOR((CAST(CAST(SUM(CAST(FLOOR(p2 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
                * 1048576.0
              + CAST(CAST(SUM(p2 % 1048576) AS BIGINT) AS DOUBLE))
             / 1.0e2 / 7.0
             * 1.0e4 + 0.5) / 1.0e4 AS avg_yearly
FROM kept
""",
)
def rel_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from unusually-small-quantity orders of
    one brand's parts.  The oracle states it as a correlated aggregate
    subquery; the Spark side is the decorrelated form Catalyst would
    produce — a per-part average pre-aggregated once and broadcast-joined
    back, so the fact table is scanned twice but never self-joined
    row-to-row.  The brand filter prunes the part side before either
    join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    per_part_avg = (
        li.groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part_avg, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.floor(
                sum_exact_units(F.col("l_extendedprice"), 100.0)
                / F.lit(100.0) / F.lit(7.0) * F.lit(1.0e4) + F.lit(0.5)
            ) / F.lit(1.0e4)).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape — disjunctive bracket predicates

@query(
    "rel_q19_bracket_revenue",
    # revenue in exact 1e-4 units summed hi/lo (the sum_exact_units
    # recipe): the plain double SUM failed the strict 100×-replica
    # differential — a single-group sum over the bracket subset of 60M
    # rows accumulates more cross-engine order error than ROUND(…,4)
    # absorbs — and a single unsplit d4 group would graze int64 one
    # magnitude past that.  disc_price is the identical IEEE multiply
    # on both engines, so the quantized BIGINTs agree bit-for-bit; one
    # division at the end, no ROUND.
    oracle="""
WITH li AS (
  SELECT l_partkey, l_quantity,
    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
         AS BIGINT) AS d4
  FROM lineitem)
SELECT (CAST(CAST(SUM(CAST(FLOOR(l.d4 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE) * 1048576.0
        + CAST(CAST(SUM(l.d4 % 1048576) AS BIGINT) AS DOUBLE))
         / 1.0e4 AS revenue
FROM li l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def rel_q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three disjunctive (brand, size, quantity)
    brackets across the join.  Catalyst extracts the common
    join-independent conjuncts from the OR (brand/size to the part scan,
    quantity to the lineitem scan) so both sides prune before the join —
    the classic CNF-pushdown stress test."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return j.where(bracket).agg(
        sum_money4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape — aggregate view + max-over-view self-filter

@query(
    "rel_q15_top_supplier",
    # per-supplier revenue in exact 1e-4 units (the rel_q1 discipline
    # — Q15 was on the named residual-exposure list): order-free BIGINT
    # sums make total_revenue an exact unit multiple, which also makes
    # the revenue = MAX(revenue) equality join bit-robust instead of a
    # double-rounding coin flip at scale.
    oracle="""
WITH li AS (
  SELECT l_suppkey,
    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
         AS BIGINT) AS d4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'),
revenue AS (
  SELECT l_suppkey AS supplier_no,
         (CAST(CAST(SUM(CAST(FLOOR(d4 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE) * 1048576.0
          + CAST(CAST(SUM(d4 % 1048576) AS BIGINT) AS DOUBLE))
           / 1.0e4 AS total_revenue
  FROM li
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def rel_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a quarter's per-supplier revenue view, filtered
    to its own maximum (returns all ties, per the spec).  The view is
    computed once and reused for both the max and the filter — Spark
    caches nothing here, but the scalar max is a 1-row broadcast, so the
    revenue aggregation is the only real work."""
    li = table(spark, sf_dir, "lineitem")
    rev = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            sum_money4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(F.broadcast(sup), rev.supplier_no == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# gaps and islands — consecutive-day activity streaks

@query(
    "rel_activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
grp AS (
  SELECT user_id, d,
    d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
             AS INTEGER) AS anchor
  FROM days),
streaks AS (
  SELECT user_id, MIN(d) AS streak_start, MAX(d) AS streak_end,
         COUNT(*) AS streak_days
  FROM grp GROUP BY user_id, anchor)
SELECT user_id, streak_start, streak_end, streak_days
FROM streaks WHERE streak_days >= 3
""",
)
def rel_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: runs of consecutive active days per user.  The
    date minus its per-user row_number is constant within a run (the
    island anchor), so streaks fall out of one window pass + one
    aggregate on the same user_id partitioning — no self-join, no
    iteration, distance-based grouping at any scale."""
    events = table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return (
        grp.groupBy("user_id", "anchor")
        .agg(
            F.min("d").alias("streak_start"),
            F.max("d").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .where(F.col("streak_days") >= 3)
        .drop("anchor")
    )


# ---------------------------------------------------------------------------
# skew-salted JOIN (driver-visible face of operators/skew.py:salted_join)

@query(
    "rel_skew_salted_segment_revenue",
    # total_value is the 1e-6-quantized hi/lo sum (sum-of-rounded
    # semantic): per-segment groups are ~1/5 of the fact, and the raw
    # ROUND(SUM(value),6) failed the strict 100x differential.
    oracle=f"""
SELECT c.c_mktsegment AS segment,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  {hl_sum_sql("CAST(FLOOR(e.value * 1000000.0 + 0.5) AS BIGINT)",
              "1.0e6")} AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def rel_skew_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact⨝dim join: the events fact gets a random salt, the
    customer dim is replicated into every salt bucket, and the join runs
    on (key, salt) — a hot user spreads over ``buckets`` tasks.  The
    oracle is the plain join: any salt assignment yields identical
    results, the property that makes the trick retry-safe."""
    from busdata_pipeline_spark.operators.skew import salted_join

    events = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(events, cust, "user_id", buckets=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (sum_exact_units(F.col("value"), 1000000.0)
         / F.lit(1000000.0)).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# NULL-semantics suite — three-valued logic + null-safe equality

@query(
    "rel_null_semantics",
    oracle="""
WITH t AS (
  SELECT event_id, value,
    NULLIF(event_type, 'click') AS maybe_type,
    CASE WHEN value > 50 THEN value END AS big_value
  FROM events)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(maybe_type) AS BIGINT) AS n_type_notnull,
  CAST(COUNT(big_value) AS BIGINT) AS n_big,
  -- sum of per-row 1e-6-quantized values: events.value is an arbitrary
  -- double (not decimal-exact), so the quantization is a deliberate
  -- semantic (sum-of-rounded), chosen because the raw double SUM over
  -- 10M rows failed the strict 100x differential (order error beyond
  -- ROUND(…,6)); FLOOR of the identical double is identical on both
  -- engines, making the BIGINT sum exact in any order
  CAST(SUM(CAST(FLOOR(COALESCE(big_value, 0.0) * 1000000.0 + 0.5)
                AS BIGINT)) AS BIGINT) / 1.0e6 AS sum_big_coalesced,
  CAST(SUM(CASE WHEN maybe_type IS NOT DISTINCT FROM NULL
           THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks_nullsafe,
  CAST(SUM(CASE WHEN (value > 100) IS NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS n_unknown_cmp
FROM t
""",
)
def rel_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic suite: NULLIF / guarded CASE producing NULLs,
    COUNT(col) vs COUNT(*), COALESCE in aggregates, null-safe equality
    (Spark <=> == SQL IS NOT DISTINCT FROM), and NULL-valued boolean
    comparisons — the dialect corners where engines classically drift."""
    ev = table(spark, sf_dir, "events")
    t = ev.select(
        "event_id",
        F.nullif("event_type", F.lit("click")).alias("maybe_type"),
        F.when(F.col("value") > 50, F.col("value")).alias("big_value"),
        "value",
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("maybe_type").alias("n_type_notnull"),
        F.count("big_value").alias("n_big"),
        (
            F.sum(
                F.floor(
                    F.coalesce("big_value", F.lit(0.0)) * F.lit(1000000.0)
                    + F.lit(0.5)
                ).cast("long")  # value can be negative -> keep FLOOR
            )
            / F.lit(1000000.0)
        ).alias("sum_big_coalesced"),
        F.sum(
            F.when(F.col("maybe_type").eqNullSafe(F.lit(None)), 1).otherwise(0)
        ).cast("long").alias("n_clicks_nullsafe"),
        F.sum(
            F.when(F.isnull(F.col("value") > 100), 1).otherwise(0)
        ).cast("long").alias("n_unknown_cmp"),
    )


# ---------------------------------------------------------------------------
# exact decimal arithmetic (no float rounding anywhere)

@query(
    "rel_decimal_money_sums",
    oracle="""
SELECT l_returnflag,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
    AS VARCHAR) AS gross,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
         * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,8))
    AS VARCHAR) AS discount_amt
FROM lineitem
GROUP BY l_returnflag
""",
)
def rel_decimal_money_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic in exact DECIMAL end to end — no binary-float
    rounding, no ROUND() canonicalization needed: both engines produce
    bit-identical scaled integers.  Sums and products follow SQL-standard
    precision propagation; the outputs are cast to a common (38,s) width
    because Spark's sum widens to 28 digits and DuckDB's to 38, then
    rendered as the fixed-scale decimal STRING ('….8300') — the driver's
    pandas canonicalizer keeps Spark Decimals as objects but collapses
    DuckDB decimals to float64, so only the string form hashes equal."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("decimal(38,4)").cast("string").alias("gross"),
        F.sum(price * disc).cast("decimal(38,8)").cast("string")
         .alias("discount_amt"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape — double-correlated EXISTS + NOT EXISTS.

@query(
    "rel_q21_sole_late_supplier",
    oracle="""
SELECT s.s_name AS s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def rel_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
    multi-supplier finished order ("late" = shipped >90 days after the
    order date; the testdata lacks commit/receipt dates —
    /root/reference has no Q21 either, this extends the semi/anti tier).

    The oracle states it as the classic double-correlated
    EXISTS + NOT EXISTS; executing that literally would self-join
    lineitem twice per probe row.  The Spark form decorrelates into ONE
    pass: aggregate lineitem×orders to per-(order, supplier) lateness,
    roll that up to per-order supplier/late-supplier counts, and keep
    late rows whose order has >1 supplier and exactly 1 late one.  The
    compiled plan evaluates the per-(order, supplier) branch twice (two
    fact scans — still far cheaper than the two correlated lineitem
    self-joins the literal form would run), then a broadcast dim join
    for the name."""
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    per_os = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
    )
    sole_late = (
        per_os.where(F.col("is_late") == 1)
        .join(
            per_o.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
    )
    return (
        sole_late.join(F.broadcast(s), sole_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape — conditional aggregation over a join.

@query(
    "rel_q12_delay_priority_split",
    oracle="""
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN '0-30'
            WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90 THEN '31-90'
            ELSE '90+' END AS delay_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
)
def rel_q12_delay_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (pivot-style) aggregation over the
    orders⋈lineitem join — high/low-priority line counts per ship-delay
    bucket (the testdata lacks l_shipmode, so the group key is a derived
    delay bucket; same plan shape).  One shuffle join on orderkey, one
    hash aggregate; both CASE branches evaluate in the same codegen
    stage, so the two counts cost one pass."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, F.lit("0-30"))
        .when(delay <= 90, F.lit("31-90"))
        .otherwise(F.lit("90+"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape — market-share ratio of conditional sums over a snowflake.

@query(
    "rel_q8_market_share",
    # both sums in exact 1e-4 units summed hi/lo (the sum_exact_units
    # recipe — Q8 was on the named residual-exposure list): order-free
    # exact, overflow-safe to ~9e12 rows per group.  The recombined
    # DOUBLE sums divide ONCE, then the FLOOR-quantize half-up cut —
    # ROUND-to-decimal diverges by 1 ulp between engines at scale
    # (ORACLES.md rule 4).
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
         AS BIGINT) AS d4
  FROM lineitem)
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       FLOOR((CAST(CAST(SUM(CASE WHEN sn.n_name = 'NATION_2'
                                 THEN CAST(FLOOR(l.d4 / 1048576.0) AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS DOUBLE) * 1048576.0
              + CAST(CAST(SUM(CASE WHEN sn.n_name = 'NATION_2'
                                   THEN l.d4 % 1048576 ELSE 0 END)
                          AS BIGINT) AS DOUBLE))
             / (CAST(CAST(SUM(CAST(FLOOR(l.d4 / 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
                  * 1048576.0
                + CAST(CAST(SUM(l.d4 % 1048576) AS BIGINT) AS DOUBLE))
             * 1.0e6 + 0.5) / 1.0e6 AS mkt_share
FROM li l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = cn.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
""",
)
def rel_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of ASIA-region
    customers' revenue per order year — a ratio of conditional sums over
    a two-armed snowflake (customer→nation→region picks the market,
    supplier→nation tags the origin).  Every dimension broadcasts; the
    only shuffles are the lineitem⋈orders join and the final per-year
    aggregate.  Both sums come out of one codegen pass, and the division
    happens on the 6-row aggregate, not per row."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    asia_reg = reg.where(F.col("r_name") == "ASIA")
    asia_nations = (
        nat.join(F.broadcast(asia_reg), nat.n_regionkey == asia_reg.r_regionkey)
        .select(F.col("n_nationkey").alias("cn_nationkey"))
    )
    supp_nat_dim = nat.select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    supp_nation = s.join(
        F.broadcast(supp_nat_dim),
        s.s_nationkey == supp_nat_dim.sn_nationkey,
    ).select("s_suppkey", "supp_nation")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    nation2_rev = F.when(
        F.col("supp_nation") == "NATION_2", rev
    ).otherwise(F.lit(0.0))  # quantizes to exactly 0 units
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(asia_nations),
            F.col("c_nationkey") == F.col("cn_nationkey"),
        )
        .join(F.broadcast(supp_nation),
              F.col("l_suppkey") == supp_nation.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (F.floor(
                sum_exact_units(nation2_rev, 10000.0)
                / sum_exact_units(rev, 10000.0)
                * F.lit(1.0e6) + F.lit(0.5)
            ) / F.lit(1.0e6)).alias("mkt_share")
        )
    )


@query(
    "rel_funnel_conversion",
    # signup -> first click at-or-after signup -> first purchase
    # at-or-after that click, per user; stage populations + rates.
    oracle="""
WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY e.user_id)
SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_signup,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_click,
       CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase,
       ROUND(CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
             / (SELECT COUNT(*) FROM s1), 6) AS click_rate,
       ROUND(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
             / (SELECT COUNT(*) FROM s2), 6) AS purchase_rate
""",
)
def rel_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-step funnel (signup → click → purchase, order-respecting):
    the oracle states it as three chained join-aggregates; the engine
    computes it in ONE user-keyed shuffle — three conditional-min window
    passes share the same partitioning (each stage's threshold is the
    previous stage's window column), then a per-user reduce and a global
    count.  The join-chain form re-shuffles the fact once per stage; the
    window form's cost is flat in the number of funnel stages."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("t1").alias("t1"),
        F.first("t2").alias("t2"),
        F.first("t3").alias("t3"),
    )
    return per_user.agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_click"),
        F.count("t3").alias("n_purchase"),
        F.round(F.count("t2").cast("double") / F.count("t1"), 6)
        .alias("click_rate"),
        F.round(F.count("t3").cast("double") / F.count("t2"), 6)
        .alias("purchase_rate"),
    )


@query(
    "rel_retention_cohorts",
    # Cohort = first-activity day; retention(k) = distinct users of that
    # cohort active exactly k days later, k in 1..7.
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         CAST(ts AS DATE) - cohort_day AS k
  FROM events e JOIN firsts f USING (user_id))
SELECT cohort_day, CAST(k AS INT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity
WHERE k BETWEEN 1 AND 7
GROUP BY cohort_day, k
ORDER BY cohort_day, day_offset
""",
)
def rel_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix (the analytics companion to the funnel):
    cohort users by first-activity day, count distinct users active at
    each day offset 1..7.  The first-activity day is a per-user window
    min sharing the distinct-activity shuffle — no self-join of the
    fact against its own aggregate."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    w = Window.partitionBy("user_id")
    act = (
        ev.distinct()
        .withColumn("cohort_day", F.min("day").over(w))
        .withColumn("k", F.datediff("day", "cohort_day"))
        .where(F.col("k").between(1, 7))
    )
    return (
        act.groupBy("cohort_day", F.col("k").cast("int").alias("day_offset"))
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "rel_event_transitions",
    # First-order transition counts over each user's time-ordered event
    # sequence (ties broken by event_id, both engines).
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY event_type, next_type
""",
)
def rel_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition (Markov bigram) matrix over per-user ordered
    sequences: one lead window on the user-keyed shuffle, then a
    25-cell hash aggregate — path analysis without sessionizing."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "next_type")
    )


@query(
    "rel_rfm_segments",
    # Quartile RFM (recency/frequency/monetary) with deterministic
    # (metric, user_id) tie-breaks; NTILE semantics agree cross-engine.
    oracle="""
WITH m AS (
  SELECT user_id,
         MAX(ts) AS last_ts,
         CAST(COUNT(*) AS BIGINT) AS freq,
         ROUND(SUM(CASE WHEN value > 0 THEN value ELSE 0 END), 6) AS monetary
  FROM events GROUP BY user_id),
q AS (
  SELECT user_id,
         NTILE(4) OVER (ORDER BY last_ts DESC, user_id) AS r_q,
         NTILE(4) OVER (ORDER BY freq DESC, user_id) AS f_q,
         NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_q,
         freq, monetary
  FROM m)
SELECT CAST(r_q AS INT) || '-' || CAST(f_q AS INT) || '-'
         || CAST(m_q AS INT) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(freq), 6) AS avg_freq,
       ROUND(AVG(monetary), 6) AS avg_monetary
FROM q GROUP BY 1 ORDER BY 1
""",
)
def rel_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation: one per-user aggregate, three NTILE
    windows over the (small) per-user table, then a segment rollup.
    The windows run on user-grain rows — cardinality users, not events
    — so the global sorts are dim-sized; the only fact-sized operation
    is the first aggregate."""
    ev = table(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("freq"),
        F.round(
            F.sum(F.when(F.col("value") > 0, F.col("value")).otherwise(0.0)),
            6,
        ).alias("monetary"),
    )
    q = m.select(
        "user_id", "freq", "monetary",
        F.ntile(4).over(
            Window.orderBy(F.desc("last_ts"), F.asc("user_id"))
        ).alias("r_q"),
        F.ntile(4).over(
            Window.orderBy(F.desc("freq"), F.asc("user_id"))
        ).alias("f_q"),
        F.ntile(4).over(
            Window.orderBy(F.desc("monetary"), F.asc("user_id"))
        ).alias("m_q"),
    )
    seg = F.concat_ws(
        "-", F.col("r_q").cast("int"), F.col("f_q").cast("int"),
        F.col("m_q").cast("int"),
    )
    return (
        q.groupBy(seg.alias("segment"))
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.avg("freq"), 6).alias("avg_freq"),
            F.round(F.avg("monetary"), 6).alias("avg_monetary"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Robust statistics — median/MAD outlier detection per group.

#: 3 sigma-equivalents under normality: 3 x 1.4826; computed once in
#: Python and embedded as the SAME literal in engine and oracle so the
#: outlier predicate compares bit-identical doubles.
_MAD_K = 3 * 1.4826


def _mad_outliers_oracle() -> str:
    return f"""
WITH m1 AS (
  SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
  FROM events WHERE value IS NOT NULL GROUP BY event_type),
dev AS (
  SELECT e.event_type, abs(e.value - m1.med) AS absdev
  FROM events e JOIN m1 USING (event_type)
  WHERE e.value IS NOT NULL),
m2 AS (
  SELECT event_type, ROUND(quantile_cont(absdev, 0.5), 6) AS mad
  FROM dev GROUP BY event_type)
SELECT dev.event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  MIN(m1.med) AS med,
  MIN(m2.mad) AS mad,
  CAST(SUM(CASE WHEN m2.mad > 0 AND dev.absdev > {_MAD_K!r} * m2.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  ROUND(CASE WHEN MIN(m2.mad) > 0
             THEN MAX(dev.absdev) / (1.4826 * MIN(m2.mad)) END, 6)
    AS max_robust_z
FROM dev
JOIN m1 USING (event_type)
JOIN m2 USING (event_type)
GROUP BY dev.event_type
"""


@query("rel_mad_outliers", oracle=_mad_outliers_oracle())
def rel_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median + MAD (median absolute
    deviation), the estimator that survives the outliers it hunts —
    mean/stddev z-scores (rel_stats_aggregates) break down past ~21%
    contamination, MAD at 50%.  A row is an outlier when
    |x − med| > 3·1.4826·MAD (1.4826 scales MAD to sigma under
    normality).

    Cross-engine float determinism for a PREDICATE (not just an output):
    med and MAD are quantized to 6 decimals in both engines before the
    comparison, and the 3·1.4826 constant is embedded as the identical
    Python-computed literal — so the compared doubles are bit-equal and
    the outlier SET (not merely its rounded score) is engine-stable.

    Scale shape: two grouped exact-percentile passes (the group's values
    sort within its hash partition only — rel_value_percentiles
    contract) bridged by a broadcastable per-group medians dim; the
    corpus-wide scalable variant swaps in approx_percentile."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    m1 = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = ev.join(F.broadcast(m1), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("absdev")
    )
    m2 = dev.groupBy("event_type").agg(
        F.round(F.percentile("absdev", F.lit(0.5)), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(m1), "event_type")
        .join(F.broadcast(m2), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(
                    (F.col("mad") > 0)
                    & (F.col("absdev") > F.lit(_MAD_K) * F.col("mad")),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
            F.round(
                F.when(
                    F.min("mad") > 0,
                    F.max("absdev") / (F.lit(1.4826) * F.min("mad")),
                ),
                6,
            ).alias("max_robust_z"),
        )
    )


@query(
    "rel_yoy_revenue_growth",
    oracle="""
WITH r AS (
  SELECT n.n_name AS n_name,
         CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, yr)
SELECT n_name, yr, rev_cents,
  ROUND((CAST(rev_cents AS DOUBLE)
         / LAG(rev_cents) OVER (PARTITION BY n_name ORDER BY yr) - 1.0)
        * 100.0, 6) AS yoy_pct
FROM r
""",
)
def rel_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation: the
    window-over-aggregate composition (agg to (nation, year) grain, then
    LAG across the year series).  Revenue sums in exact integer cents
    (order-independent), so the only float op is the final ratio — both
    engines divide the same two BIGINTs.  The window runs on the
    AGGREGATED table (|nations|×|years| rows — dimension-sized at any
    fact scale); dims broadcast into the fact aggregate."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                .cast("long")
            ).cast("long").alias("rev_cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    return r.select(
        "n_name", "yr", "rev_cents",
        F.round(
            (F.col("rev_cents").cast("double") / F.lag("rev_cents").over(w)
             - F.lit(1.0)) * F.lit(100.0),
            6,
        ).alias("yoy_pct"),
    )


@query(
    "rel_ab_welch_ttest",
    # Exact-moment discipline: per-group n, Σcents, Σcents² aggregate as
    # BIGINTs (order-independent — value is exact cents, test-asserted),
    # so the Welch statistic is derived from identical integers on both
    # engines; the only float ops are the shared closed-form tail.
    oracle="""
WITH m AS (
  SELECT
    CAST(SUM(CASE WHEN wknd THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN wknd THEN c ELSE 0 END) AS BIGINT) AS s_a,
    CAST(SUM(CASE WHEN wknd THEN c * c ELSE 0 END) AS BIGINT) AS q_a,
    CAST(SUM(CASE WHEN NOT wknd THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN NOT wknd THEN c ELSE 0 END) AS BIGINT) AS s_b,
    CAST(SUM(CASE WHEN NOT wknd THEN c * c ELSE 0 END) AS BIGINT) AS q_b
  FROM (
    SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c,
           EXTRACT(dow FROM CAST(ts AS DATE)) IN (0, 6) AS wknd
    FROM events WHERE value IS NOT NULL)),
d AS (
  SELECT n_a, n_b,
    CAST(s_a AS DOUBLE) / (100.0 * n_a) AS mean_a,
    CAST(s_b AS DOUBLE) / (100.0 * n_b) AS mean_b,
    (CAST(q_a AS DOUBLE) / 10000.0
     - n_a * ((CAST(s_a AS DOUBLE) / (100.0 * n_a))
              * (CAST(s_a AS DOUBLE) / (100.0 * n_a)))) / (n_a - 1) AS var_a,
    (CAST(q_b AS DOUBLE) / 10000.0
     - n_b * ((CAST(s_b AS DOUBLE) / (100.0 * n_b))
              * (CAST(s_b AS DOUBLE) / (100.0 * n_b)))) / (n_b - 1) AS var_b
  FROM m)
SELECT n_a, n_b,
  ROUND(mean_a, 6) AS mean_a,
  ROUND(mean_b, 6) AS mean_b,
  ROUND((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6) AS t_stat,
  ROUND(((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b))
        / (((var_a / n_a) * (var_a / n_a)) / (n_a - 1)
           + ((var_b / n_b) * (var_b / n_b)) / (n_b - 1)), 6) AS welch_dof
FROM d
""",
)
def rel_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test, weekend vs weekday event values —
    the A/B-analysis primitive.  ONE conditional-aggregation scan (no
    join, no second pass) produces exact integer moments per arm
    (n, Σcents, Σcents²); mean/variance/t/dof are closed-form floats over
    those integers, so cross-engine parity is exact without quantizing
    intermediate state.  Scales as a single map-side-combinable
    aggregate — the cheapest possible shape for a 100 TB fact scan."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    c = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    wknd = F.dayofweek(F.to_date("ts")).isin(1, 7)
    m = ev.select(c.alias("c"), wknd.alias("wknd")).agg(
        F.sum(F.when(F.col("wknd"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("wknd"), F.col("c")).otherwise(0)).cast("long")
        .alias("s_a"),
        F.sum(F.when(F.col("wknd"), F.col("c") * F.col("c")).otherwise(0))
        .cast("long").alias("q_a"),
        F.sum(F.when(~F.col("wknd"), 1).otherwise(0)).cast("long")
        .alias("n_b"),
        F.sum(F.when(~F.col("wknd"), F.col("c")).otherwise(0)).cast("long")
        .alias("s_b"),
        F.sum(F.when(~F.col("wknd"), F.col("c") * F.col("c")).otherwise(0))
        .cast("long").alias("q_b"),
    )

    def mean(s, n):
        return F.col(s).cast("double") / (F.lit(100.0) * F.col(n))

    def var(q, s, n):
        return (
            F.col(q).cast("double") / F.lit(10000.0)
            - F.col(n) * (mean(s, n) * mean(s, n))
        ) / (F.col(n) - 1)

    d = m.select(
        "n_a", "n_b",
        mean("s_a", "n_a").alias("mean_a"),
        mean("s_b", "n_b").alias("mean_b"),
        var("q_a", "s_a", "n_a").alias("var_a"),
        var("q_b", "s_b", "n_b").alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    return d.select(
        "n_a", "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(
            (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se_a + se_b), 6
        ).alias("t_stat"),
        F.round(
            ((se_a + se_b) * (se_a + se_b))
            / ((se_a * se_a) / (F.col("n_a") - 1)
               + (se_b * se_b) / (F.col("n_b") - 1)),
            6,
        ).alias("welch_dof"),
    )


@query(
    "rel_top_paths",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EXTRACT(EPOCH FROM ts - LAG(ts) OVER w) > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, event_type, ts, event_id,
    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_idx
  FROM flagged),
paths AS (
  SELECT user_id, session_idx,
         STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, session_idx)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
""",
)
def rel_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session journey paths: sessionize (same gap>30min islands
    as rel_sessionize_users, one user-keyed exchange), assemble each
    session's ordered event-type string in-group (sorted struct
    collect — no second window), count identical journeys, take the
    head.  The path-frequency table behind every product-analytics
    'top user flows' view; path cardinality is bounded by journey
    diversity, not fact count, so the final aggregate is small."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = events.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "session_idx",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    paths = (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


@query(
    "rel_max_drawdown",
    # Running max over exact cents (integer, order-independent), one
    # float division per row against that integer peak, MIN of the
    # resulting deterministic doubles — no quantization needed anywhere.
    oracle="""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT user_id, c,
         CAST(MAX(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rm
  FROM c)
SELECT user_id,
  ROUND(MIN(CAST(c AS DOUBLE) / rm - 1.0), 6) AS max_drawdown,
  ROUND(CAST(MAX(rm) AS DOUBLE) / 100.0, 6) AS peak_value
FROM r GROUP BY user_id
""",
)
def rel_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the value series (the running-peak
    decline metric): running MAX over exact cents via one user-keyed
    window exchange, per-row relative drop, grouped MIN reusing the same
    partitioning — the two-pass-looking metric in a single shuffle."""
    events = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    c = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = events.select(
        "user_id", "ts", "event_id", c.alias("c")
    ).withColumn("rm", F.max("c").over(w).cast("long"))
    return r.groupBy("user_id").agg(
        F.round(
            F.min(F.col("c").cast("double") / F.col("rm") - F.lit(1.0)), 6
        ).alias("max_drawdown"),
        F.round(F.max("rm").cast("double") / F.lit(100.0), 6)
        .alias("peak_value"),
    )


@query(
    "rel_funnel_lag_percentiles",
    # Lags are exact integer microseconds (epoch_us difference), so the
    # discrete percentiles are actual elements with no float anywhere
    # until the final seconds conversion.
    oracle="""
WITH f AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id),
l AS (
  SELECT epoch_us(first_purchase) - epoch_us(first_view) AS lag_us
  FROM f
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase > first_view)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
  ROUND(CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY lag_us)
             AS DOUBLE) / 1000000.0, 6) AS p25_sec,
  ROUND(CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_us)
             AS DOUBLE) / 1000000.0, 6) AS p50_sec,
  ROUND(CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY lag_us)
             AS DOUBLE) / 1000000.0, 6) AS p75_sec,
  ROUND(CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_us)
             AS DOUBLE) / 1000000.0, 6) AS p90_sec
FROM l
""",
)
def rel_funnel_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-lag distribution: time from each user's FIRST view to
    their FIRST purchase, summarized as exact discrete percentiles — the
    'how long does conversion take' companion to rel_funnel_conversion
    (which answers 'how many convert').  One user-keyed conditional
    aggregate produces the per-user lag table (dimension-sized), then a
    single global percentile_disc over exact integer microseconds."""
    ev = table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("first_purchase"),
    )
    lags = f.where(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select(
        (F.unix_micros("first_purchase") - F.unix_micros("first_view"))
        .alias("lag_us")
    )

    def pd_sec(p, name):
        return F.round(
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY lag_us)"
            ).cast("double") / F.lit(1000000.0),
            6,
        ).alias(name)

    return lags.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        pd_sec(0.25, "p25_sec"),
        pd_sec(0.5, "p50_sec"),
        pd_sec(0.75, "p75_sec"),
        pd_sec(0.9, "p90_sec"),
    )


@query(
    "rel_equidepth_histogram",
    oracle="""
WITH c AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         NTILE(10) OVER (ORDER BY FLOOR(o_totalprice * 100.0 + 0.5),
                         o_orderkey) AS bucket
  FROM orders)
SELECT CAST(bucket AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(CAST(MIN(cents) AS DOUBLE) / 100.0, 2) AS lo,
  ROUND(CAST(MAX(cents) AS DOUBLE) / 100.0, 2) AS hi,
  ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS bucket_revenue
FROM c GROUP BY bucket
""",
)
def rel_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (10-quantile) histogram of order revenue: NTILE over
    the exact-cents order with the key as tie-break (deterministic
    bucket assignment), then per-bucket bounds and exact-cents totals —
    the optimizer-statistics histogram shape, driver-checked.  The
    global NTILE sort is the documented single-exchange cost (same
    caveat as rel_ntile_acctbal); the production variant at 100 TB uses
    approx quantile boundaries (td_sketches) instead of a total sort."""
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    w = Window.orderBy(
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)),
        F.col("o_orderkey"),
    )
    c = o.select(
        "o_orderkey", cents.alias("cents"),
        F.ntile(10).over(w).cast("long").alias("bucket"),
    )
    return c.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("cents").cast("double") / F.lit(100.0), 2).alias("lo"),
        F.round(F.max("cents").cast("double") / F.lit(100.0), 2).alias("hi"),
        F.round(F.sum("cents").cast("double") / F.lit(100.0), 2)
        .alias("bucket_revenue"),
    )


@query(
    "rel_running_distinct_users",
    oracle="""
WITH fs AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
newu AS (SELECT d0 AS d, CAST(COUNT(*) AS BIGINT) AS new_users
         FROM fs GROUP BY d0),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
SELECT days.d AS d,
  CAST(COALESCE(newu.new_users, 0) AS BIGINT) AS new_users,
  CAST(SUM(COALESCE(newu.new_users, 0)) OVER (
    ORDER BY days.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS BIGINT) AS cumulative_users
FROM days LEFT JOIN newu ON newu.d = days.d
""",
)
def rel_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day WITHOUT a per-day COUNT(DISTINCT
    expanding window) — the first-seen decomposition: a user contributes
    to exactly the day they first appear (one user-keyed MIN aggregate),
    so the running distinct count is a plain running SUM over the
    dimension-sized daily series.  The naive expanding-window
    COUNT(DISTINCT) is O(days × users) state; this is one fact aggregate
    + one tiny window — the standard trick for 'total unique customers
    to date' dashboards at any scale."""
    ev = table(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    newu = fs.groupBy(F.col("d0").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(newu, "d", "left")
        .select("d", F.coalesce("new_users", F.lit(0)).cast("long")
                .alias("new_users"))
        .withColumn(
            "cumulative_users", F.sum("new_users").over(w).cast("long")
        )
    )


@query(
    "rel_cohort_ltv",
    oracle="""
WITH co AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
  FROM events GROUP BY user_id),
cs AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_users
       FROM co GROUP BY cohort),
rev AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND event_type = 'purchase'),
g AS (
  SELECT co.cohort, CAST((rev.d - co.cohort) // 7 AS BIGINT) AS age_week,
         CAST(SUM(rev.c) AS BIGINT) AS cents
  FROM rev JOIN co ON co.user_id = rev.user_id
  GROUP BY co.cohort, age_week)
SELECT g.cohort, g.age_week,
  ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS week_revenue,
  ROUND(CAST(SUM(cents) OVER (PARTITION BY g.cohort ORDER BY g.age_week
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        / (100.0 * cs.cohort_users), 6) AS cum_ltv_per_user
FROM g JOIN cs ON cs.cohort = g.cohort
""",
)
def rel_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users cohorted by first-activity day, purchase
    revenue bucketed by cohort age in weeks, cumulative
    revenue-per-cohort-user along the age axis — the lifetime-value
    companion to rel_retention_cohorts.  Revenue stays exact integer
    cents through the running sum (order-independent); the window runs
    on the (cohort × age) grid — dimension-sized at any fact volume."""
    ev = table(spark, sf_dir, "events")
    co = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    cs = co.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    rev = ev.where(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    ).select(
        "user_id", F.to_date("ts").alias("d"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
        .alias("c"),
    )
    g = (
        rev.join(co, "user_id")
        .groupBy(
            "cohort",
            F.floor(F.datediff("d", "cohort") / 7).cast("long")
            .alias("age_week"),
        )
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort").orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return g.join(F.broadcast(cs), "cohort").select(
        "cohort", "age_week",
        F.round(F.col("cents").cast("double") / F.lit(100.0), 2)
        .alias("week_revenue"),
        F.round(
            F.sum("cents").over(w).cast("double")
            / (F.lit(100.0) * F.col("cohort_users")),
            6,
        ).alias("cum_ltv_per_user"),
    )


@query(
    "rel_abc_pareto",
    oracle="""
WITH r AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM r),
c AS (
  SELECT o_custkey, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
  FROM r),
cls AS (
  SELECT o_custkey, cents,
    CASE WHEN cum_cents * 10 <= t.total * 8 THEN 'A'
         WHEN cum_cents * 100 <= t.total * 95 THEN 'B'
         ELSE 'C' END AS abc_class
  FROM c CROSS JOIN t)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_customers,
  ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS class_revenue
FROM cls GROUP BY abc_class
""",
)
def rel_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of customers by revenue: cumulative
    exact-cents share along the descending revenue order, class cuts at
    80% / 95% as INTEGER cross-multiplications (cum·10 ≤ total·8 — no
    float boundary anywhere).  The running-share window runs over the
    customer-grain aggregate; at 100 TB the global order would ride the
    two-level distributed rank (assign_surrogate_keys), noted as with
    NTILE."""
    o = table(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
        ).cast("long").alias("cents")
    )
    t = r.agg(F.sum("cents").cast("long").alias("total"))
    w = Window.orderBy(F.desc("cents"), F.asc("o_custkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = r.withColumn("cum_cents", F.sum("cents").over(w).cast("long"))
    cls = c.join(F.broadcast(t)).select(
        "o_custkey", "cents",
        F.when(F.col("cum_cents") * 10 <= F.col("total") * 8, "A")
        .when(F.col("cum_cents") * 100 <= F.col("total") * 95, "B")
        .otherwise("C").alias("abc_class"),
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("cents").cast("double") / F.lit(100.0), 2)
        .alias("class_revenue"),
    )


@query(
    "rel_revenue_gini",
    oracle="""
WITH r AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
k AS (
  SELECT cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
  FROM r),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(i * cents) AS BIGINT) AS si
      FROM k)
SELECT n,
  ROUND(CAST(2 * si AS DOUBLE) / (CAST(n AS DOUBLE) * s)
        - (CAST(n + 1 AS DOUBLE) / n), 6) AS gini
FROM m
""",
)
def rel_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration:
    G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over the ascending-sorted exact-cents
    totals.  Ranks and both sums are exact BIGINTs (i·cents ≤ 1e14 —
    overflow-safe), so the only float math is the final two divisions.
    The inequality KPI behind revenue-concentration dashboards; the
    global rank carries the NTILE scale caveat."""
    o = table(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
        ).cast("long").alias("cents")
    )
    k = r.select(
        "cents",
        F.row_number().over(
            Window.orderBy(F.asc("cents"), F.asc("o_custkey"))
        ).cast("long").alias("i"),
    )
    m = k.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("si"),
    )
    return m.select(
        "n",
        F.round(
            (F.lit(2) * F.col("si")).cast("double")
            / (F.col("n").cast("double") * F.col("s"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )
