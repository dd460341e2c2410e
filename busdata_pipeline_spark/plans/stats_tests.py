"""Distribution-comparison statistics and referential-integrity audits.

The reference validates its loads with ad-hoc SQL checks
(analytic.sql:1-190 is a battery of profile queries over the warehouse);
this module packages the statistician's versions of those checks as
first-class, oracle-verified operators:

- ``rel_mannwhitney_value`` / ``rel_ks_2sample`` — nonparametric
  two-sample tests (rank-sum and ECDF-distance) between event cohorts,
  the robust complement to the parametric ``rel_ab_welch_ttest``.
- ``rel_autocorr_daily`` — ACF of the daily revenue series at lags 1-7,
  the seasonality probe behind ``rel_seasonal_decompose``.
- ``etl_fk_integrity_audit`` — orphan detection across every FK edge of
  the star schema (the load-audit counterpart of data_collector.py's
  assert-based record validation).

Float discipline (established across rounds): every statistic is built
from BIGINT counts / early-quantized BIGINT cents; doubles appear only
in the final closed-form expression, written with the identical
operation order on both engines, then ROUND 6 (+0.0 via
registry.normalize_output).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table


def _ranked_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared shape for the rank tests: the click-vs-view ``value``
    samples collapsed to one row per distinct value with per-group
    counts.  groupBy(value) is the only corpus-sized shuffle; the
    distinct-value relation it emits is what the single-partition
    window sorts, and that is bounded by the measurement domain (a
    6-decimal sensor reading), not the row count.  At 100 TB the same
    two-pass prefix-sum trick rel_running_distinct_users documents
    applies; at any realistic domain size one task sorting distinct
    values is cheap."""
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & ~F.isnan("value")
        & F.col("event_type").isin("click", "view")
    )
    return ev.groupBy("value").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("long").alias("n1v"),
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).cast("long").alias("n2v"),
    )


_DAY_REV_CTE = """
day_rev AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      // 100000 AS x
  FROM orders GROUP BY 1)
"""


def _day_rev(spark: SparkSession, sf_dir: str, with_count: bool = False):
    """Daily revenue in exact whole thousands (per-row cents
    quantization, integer division) — the shared series every
    calendar-bounded statistic in this module consumes.  Mirrors
    _DAY_REV_CTE exactly; change BOTH or parity breaks."""
    aggs = [
        F.expr(
            "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))"
            " div 100000"
        )
        .cast("long")
        .alias("x")
    ]
    if with_count:
        aggs.append(F.count(F.lit(1)).cast("long").alias("y"))
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(*aggs)
    )


_TWO_SAMPLE_CTE = """
ev AS (
  SELECT event_type, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND event_type IN ('click', 'view')),
pv AS (
  SELECT value,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS n1v,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      AS n2v
  FROM ev GROUP BY value)
"""


@query(
    "rel_mannwhitney_value",
    # Tie-corrected Mann-Whitney U via per-distinct-value average ranks:
    # avg_rank(v) = cnt_less + (nv+1)/2, carried as 2*R1 so every
    # aggregate stays BIGINT-exact; the z closed form is the only double
    # arithmetic, identical op order on both engines.
    oracle="""
WITH """ + _TWO_SAMPLE_CTE + """,
r AS (
  SELECT n1v, n2v, n1v + n2v AS nv,
    CAST(COALESCE(SUM(n1v + n2v) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS lt
  FROM pv),
a AS (
  SELECT CAST(SUM(n1v) AS BIGINT) AS n1, CAST(SUM(n2v) AS BIGINT) AS n2,
    CAST(SUM(n1v * (2 * lt + nv + 1)) AS BIGINT) AS two_r1,
    CAST(SUM(nv * nv * nv - nv) AS BIGINT) AS tie_t
  FROM r)
SELECT n1, n2,
  CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
  ROUND(
    (CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0
       - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
       * (CAST(n1 + n2 + 1 AS DOUBLE)
          - CAST(tie_t AS DOUBLE)
            / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))),
    6) AS z_score
FROM a
""",
)
def rel_mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (tie-corrected normal approximation)
    comparing the click vs view ``value`` distributions — the
    nonparametric sibling of rel_ab_welch_ttest for the same A/B
    question when normality can't be assumed.  Average ranks are exact
    rationals carried as 2*R1 in BIGINT (ranks of ties are halves), the
    tie correction sums nv^3-nv per distinct value, and only the final
    z expression touches doubles."""
    pv = _ranked_two_sample(spark, sf_dir)
    w_less = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = pv.select(
        "n1v",
        "n2v",
        (F.col("n1v") + F.col("n2v")).alias("nv"),
        F.coalesce(
            F.sum(F.col("n1v") + F.col("n2v")).over(w_less), F.lit(0)
        ).cast("long").alias("lt"),
    )
    a = r.agg(
        F.sum("n1v").cast("long").alias("n1"),
        F.sum("n2v").cast("long").alias("n2"),
        F.sum(
            F.col("n1v") * (2 * F.col("lt") + F.col("nv") + 1)
        ).cast("long").alias("two_r1"),
        F.sum(
            F.col("nv") * F.col("nv") * F.col("nv") - F.col("nv")
        ).cast("long").alias("tie_t"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    u1 = (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)).cast(
        "double"
    ) / F.lit(2.0)
    sigma = F.sqrt(
        n1d * n2d / F.lit(12.0)
        * (
            (F.col("n1") + F.col("n2") + 1).cast("double")
            - F.col("tie_t").cast("double")
            / (
                (F.col("n1") + F.col("n2")).cast("double")
                * (F.col("n1") + F.col("n2") - 1).cast("double")
            )
        )
    )
    return a.select(
        "n1",
        "n2",
        u1.alias("u1"),
        F.round((u1 - n1d * n2d / F.lit(2.0)) / sigma, 6).alias("z_score"),
    )


@query(
    "rel_ks_2sample",
    # KS D as an integer argmax: max |c1*n2 - c2*n1| over the pooled
    # ECDF steps (BIGINT-exact), divided once at the end.  Group totals
    # come from an unbounded frame over the SAME window sort — no extra
    # exchange, no scalar cross join.
    oracle="""
WITH """ + _TWO_SAMPLE_CTE + """,
c AS (
  SELECT
    CAST(SUM(n1v) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
    CAST(SUM(n2v) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2,
    CAST(SUM(n1v) OVER () AS BIGINT) AS n1,
    CAST(SUM(n2v) OVER () AS BIGINT) AS n2
  FROM pv)
SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
  ROUND(CAST(MAX(abs(c1 * n2 - c2 * n1)) AS DOUBLE)
        / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE)), 6) AS d_stat
FROM c
""",
)
def rel_ks_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    view ``value`` distributions: D = max_x |F1(x) - F2(x)|, computed
    as the BIGINT argmax of |c1*n2 - c2*n1| over the pooled ECDF steps
    so the comparison is exact and the single division happens once at
    the end.  Shares rel_mannwhitney_value's one-shuffle shape; the
    group totals ride the same window sort via an unbounded frame."""
    pv = _ranked_two_sample(spark, sf_dir)
    w_cum = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = pv.select(
        F.sum("n1v").over(w_cum).cast("long").alias("c1"),
        F.sum("n2v").over(w_cum).cast("long").alias("c2"),
        F.sum("n1v").over(w_all).cast("long").alias("n1"),
        F.sum("n2v").over(w_all).cast("long").alias("n2"),
    )
    return c.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.round(
            F.max(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            ).cast("double")
            / (
                F.max("n1").cast("double") * F.max("n2").cast("double")
            ),
            6,
        ).alias("d_stat"),
    )


@query(
    "rel_autocorr_daily",
    # Daily revenue quantized to whole thousands (integer division of
    # exact per-row cents — FLOOR(x*100+0.5) is the established
    # per-row quantization) so every lag-L moment sum is BIGINT-exact;
    # the Pearson closed form is the only double arithmetic.
    oracle="""
WITH """ + _DAY_REV_CTE + """,
lagged AS (
  SELECT l.lag, x,
    LAG(x, l.lag) OVER (PARTITION BY l.lag ORDER BY d) AS y
  FROM day_rev CROSS JOIN (SELECT UNNEST(range(1, 8)) AS lag) l),
m AS (
  SELECT CAST(lag AS INTEGER) AS lag, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
    CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM lagged WHERE y IS NOT NULL GROUP BY lag)
SELECT lag, n,
  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf
FROM m ORDER BY lag
""",
)
def rel_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily order-revenue series at lags 1-7 —
    the weekly-seasonality probe that motivates rel_seasonal_decompose.
    The series is one row per calendar day (corpus-independent length:
    ~2,400 points for the 1995-2001 span no matter the SF), so the
    per-lag windows are trivially cheap; the corpus-sized work is the
    single groupBy(day) partial-aggregate scan.  Revenue is quantized
    to whole thousands via exact integer arithmetic so all moment sums
    are BIGINT and both engines feed identical doubles to the Pearson
    closed form."""
    day_rev = _day_rev(spark, sf_dir)
    # Spark's lag() needs a literal offset — build the 7 series as
    # explicit per-lag columns over ONE window sort, then stack.
    w1 = Window.orderBy("d")
    cols = day_rev.select(
        "x",
        *[F.lag("x", k).over(w1).alias(f"y{k}") for k in range(1, 8)],
    )
    stacked = cols.select(
        F.expr(
            "stack(7, "
            + ", ".join(f"{k}, x, y{k}" for k in range(1, 8))
            + ") AS (lag, x, y)"
        )
    ).where(F.col("y").isNotNull())
    m = stacked.groupBy(F.col("lag").cast("int").alias("lag")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    # Combine the exact BIGINT moment sums in DOUBLE: n*sxx would
    # overflow int64 at the 100x rung (measured: 2405 * 6.0e15), and a
    # BIGINT->DOUBLE cast of identical sums is deterministic on both
    # engines at any scale — accuracy degrades gracefully, identically.
    nd, sxd, syd = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxxd, syyd, sxyd = (
        F.col(c).cast("double") for c in ("sxx", "syy", "sxy")
    )
    num = nd * sxyd - sxd * syd
    den = F.sqrt(nd * sxxd - sxd * sxd) * F.sqrt(nd * syyd - syd * syd)
    return m.select(
        "lag", "n", F.round(num / den, 6).alias("acf")
    ).orderBy("lag")


_FK_EDGES = [
    # (edge label, child table, fk col, parent table, pk col)
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
]


def _fk_edge_sql(edge: str, child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{edge}' AS edge,
  CAST(SUM(c) AS BIGINT) AS child_rows,
  CAST(COUNT(*) AS BIGINT) AS distinct_child_keys,
  CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS orphan_keys,
  CAST(SUM(CASE WHEN p.{pk} IS NULL THEN c ELSE 0 END) AS BIGINT)
    AS orphan_rows
FROM (SELECT {fk} AS k, CAST(COUNT(*) AS BIGINT) AS c FROM {child}
      WHERE {fk} IS NOT NULL GROUP BY {fk}) ck
LEFT JOIN {parent} p ON p.{pk} = ck.k"""


@query(
    "etl_fk_integrity_audit",
    oracle="\nUNION ALL\n".join(
        _fk_edge_sql(*e) for e in _FK_EDGES
    ) + "\nORDER BY edge",
)
def etl_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the star
    schema: per edge, the child row/key counts and how many keys/rows
    point at a missing parent.  This is the post-load validation the
    reference does with assert-per-record in data_collector.py
    (validate_* checks), reshaped into one declarative pass per edge:
    the child side collapses to per-key counts FIRST (one partial-agg
    shuffle on the key — the relation the join sees is key-cardinality,
    not row-cardinality), then a single left join against the parent
    key column classifies orphans.  Tiny dims (nation, region) hit
    broadcast joins automatically; the fact-fact edge (lineitem→orders)
    is a key-collapsed shuffle join AQE can skew-split.  No edge ever
    materializes orphan ROWS — only their counts — so the audit output
    is 7 rows at any corpus size."""
    frames = []
    for edge, child, fk, parent, pk in _FK_EDGES:
        ck = (
            table(spark, sf_dir, child)
            .where(F.col(fk).isNotNull())
            .groupBy(F.col(fk).alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        pk_col = (
            table(spark, sf_dir, parent)
            .select(F.col(pk).alias("pk"))
        )
        joined = ck.join(pk_col, ck.k == pk_col.pk, "left")
        frames.append(
            joined.agg(
                F.lit(edge).alias("edge"),
                F.sum("c").cast("long").alias("child_rows"),
                F.count(F.lit(1)).cast("long").alias("distinct_child_keys"),
                F.sum(
                    F.when(F.col("pk").isNull(), 1).otherwise(0)
                ).cast("long").alias("orphan_keys"),
                F.sum(
                    F.when(F.col("pk").isNull(), F.col("c")).otherwise(0)
                ).cast("long").alias("orphan_rows"),
            )
        )
    return reduce(DataFrame.unionAll, frames).orderBy("edge")


@query(
    "rel_theil_sen",
    # Theil-Sen slope of the daily revenue series: median over all
    # C(n,2) pairwise slopes (x_j-x_i)/(j-i), x in exact whole-thousand
    # units, positions as day ranks — every slope is a quotient of
    # small integers, so both engines divide identical operands; the
    # lower-median pick (k = (c+1)//2 in slope order) is positional,
    # not arithmetic.
    oracle="""
WITH """ + _DAY_REV_CTE + """,
s AS (
  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn
  FROM day_rev),
p AS (
  SELECT b.rn AS brn,
    CAST(b.x - a.x AS DOUBLE) / CAST(b.rn - a.rn AS DOUBLE) AS slope
  FROM s a JOIN s b ON a.rn < b.rn),
r AS (
  SELECT slope, brn,
    ROW_NUMBER() OVER (ORDER BY slope) AS k,
    COUNT(*) OVER () AS c
  FROM p)
SELECT CAST(MAX(brn) AS BIGINT) AS n_days,
  CAST(MAX(c) AS BIGINT) AS n_pairs,
  ROUND(MAX(CASE WHEN k = (c + 1) // 2 THEN slope END), 6) AS sen_slope
FROM r
""",
)
def rel_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator over the daily revenue series —
    the outlier-immune alternative to OLS slope (breakdown point 29%):
    the median of all pairwise slopes between days.  The series is
    calendar-bounded (~2,400 points regardless of corpus size), so the
    all-pairs self-join is a CONSTANT ~2.9M-row relation at any SF —
    the one deliberate nested-loop join in the registry, documented in
    the plan-lint whitelist; the corpus-sized work remains the single
    groupBy(day) scan.  Revenue uses the same exact whole-thousand
    quantization as rel_autocorr_daily; the median is picked by
    position, never averaged."""
    day_rev = _day_rev(spark, sf_dir)
    s = day_rev.select(
        "x",
        F.row_number().over(Window.orderBy("d")).cast("long").alias("rn"),
    )
    a = s.select(F.col("x").alias("ax"), F.col("rn").alias("arn"))
    b = s.select(F.col("x").alias("bx"), F.col("rn").alias("brn"))
    p = a.join(b, F.col("arn") < F.col("brn")).select(
        "brn",
        (
            (F.col("bx") - F.col("ax")).cast("double")
            / (F.col("brn") - F.col("arn")).cast("double")
        ).alias("slope"),
    )
    w_slope = Window.orderBy("slope")
    w_all = Window.orderBy("slope").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = p.select(
        "slope",
        "brn",
        F.row_number().over(w_slope).alias("k"),
        F.count(F.lit(1)).over(w_all).alias("c"),
    )
    return r.agg(
        F.max("brn").cast("long").alias("n_days"),
        F.max("c").cast("long").alias("n_pairs"),
        F.round(
            F.max(
                F.when(
                    F.col("k") == F.expr("(c + 1) div 2"), F.col("slope")
                )
            ),
            6,
        ).alias("sen_slope"),
    )


@query(
    "rel_welch_bh_fdr",
    # Multiple-testing control: per-event-type Welch z vs the rest of
    # the corpus (exact-cents integer moments, one conditional scan),
    # two-sided normal p via the Abramowitz-Stegun 7.1.26 erf
    # polynomial (Horner form, identical op order on both engines),
    # then Benjamini-Hochberg at alpha=0.05: significant iff
    # rank <= max{k : p_(k) <= k*alpha/m}.
    oracle="""
WITH v AS (
  SELECT event_type, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS q
  FROM v GROUP BY event_type),
t AS (
  SELECT event_type, n, s, q,
    CAST(SUM(n) OVER () AS BIGINT) AS tn,
    CAST(SUM(s) OVER () AS BIGINT) AS ts,
    CAST(SUM(q) OVER () AS BIGINT) AS tq
  FROM g),
w AS (
  SELECT event_type, n,
    CAST(s AS DOUBLE) / (100.0 * n) AS mean_g,
    CAST(ts - s AS DOUBLE) / (100.0 * (tn - n)) AS mean_r,
    (CAST(q AS DOUBLE) / 10000.0
     - n * ((CAST(s AS DOUBLE) / (100.0 * n))
            * (CAST(s AS DOUBLE) / (100.0 * n)))) / (n - 1) AS var_g,
    (CAST(tq - q AS DOUBLE) / 10000.0
     - (tn - n) * ((CAST(ts - s AS DOUBLE) / (100.0 * (tn - n)))
                   * (CAST(ts - s AS DOUBLE) / (100.0 * (tn - n)))))
      / (tn - n - 1) AS var_r,
    tn - n AS n_r
  FROM t),
z AS (
  SELECT event_type, n,
    (mean_g - mean_r) / sqrt(var_g / n + var_r / n_r) AS t_stat
  FROM w),
p AS (
  SELECT event_type, n, t_stat,
    ((((1.061405429 * (1.0 / (1.0 + 0.3275911 * (abs(t_stat) / sqrt(2.0))))
        - 1.453152027) * (1.0 / (1.0 + 0.3275911 * (abs(t_stat) / sqrt(2.0))))
       + 1.421413741) * (1.0 / (1.0 + 0.3275911 * (abs(t_stat) / sqrt(2.0))))
      - 0.284496736) * (1.0 / (1.0 + 0.3275911 * (abs(t_stat) / sqrt(2.0))))
     + 0.254829592) * (1.0 / (1.0 + 0.3275911 * (abs(t_stat) / sqrt(2.0))))
    * exp(-(abs(t_stat) / sqrt(2.0)) * (abs(t_stat) / sqrt(2.0))) AS p_raw
  FROM z),
r AS (
  SELECT event_type, n, t_stat, p_raw,
    CAST(ROW_NUMBER() OVER (ORDER BY p_raw, event_type) AS BIGINT) AS k,
    CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM p),
cut AS (
  SELECT *, MAX(CASE WHEN p_raw <= k * 0.05 / m THEN k END) OVER () AS kmax
  FROM r)
SELECT event_type, n,
  ROUND(t_stat, 6) AS t_stat,
  ROUND(p_raw, 6) AS p_approx,
  k AS bh_rank,
  COALESCE(k <= kmax, FALSE) AS significant
FROM cut ORDER BY event_type
""",
)
def rel_welch_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a family of Welch tests —
    each event type's value distribution vs the rest of the corpus,
    the screening pattern behind every metrics-regression dashboard.
    One conditional-aggregation scan builds exact-cents integer moments
    per type (rel_ab_welch_ttest's discipline); the complement arm is
    total-minus-group via an unbounded window over the TYPE-cardinality
    relation, so the corpus is scanned exactly once.  Two-sided p uses
    the Abramowitz-Stegun 7.1.26 erfc polynomial in strict Horner form
    — both engines evaluate the identical expression tree, and exp/ln
    agree on this platform (established).  BH then ranks the m=5 raw
    p-values and flags ranks up to the largest k with p_(k) <= k*α/m
    (α=0.05)."""
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    c = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    g = ev.select("event_type", c.alias("c")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    w_all = Window.orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = g.select(
        "event_type", "n", "s", "q",
        F.sum("n").over(w_all).cast("long").alias("tn"),
        F.sum("s").over(w_all).cast("long").alias("ts"),
        F.sum("q").over(w_all).cast("long").alias("tq"),
    )
    mean_g = F.col("s").cast("double") / (F.lit(100.0) * F.col("n"))
    mean_r = (F.col("ts") - F.col("s")).cast("double") / (
        F.lit(100.0) * (F.col("tn") - F.col("n"))
    )
    var_g = (
        F.col("q").cast("double") / F.lit(10000.0)
        - F.col("n") * (mean_g * mean_g)
    ) / (F.col("n") - 1)
    var_r = (
        (F.col("tq") - F.col("q")).cast("double") / F.lit(10000.0)
        - (F.col("tn") - F.col("n")) * (mean_r * mean_r)
    ) / (F.col("tn") - F.col("n") - 1)
    n_r = F.col("tn") - F.col("n")
    t_stat = (mean_g - mean_r) / F.sqrt(
        var_g / F.col("n") + var_r / n_r
    )
    z = t.select("event_type", "n", t_stat.alias("t_stat"))
    x = F.abs(F.col("t_stat")) / F.sqrt(F.lit(2.0))
    tp = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    p_raw = (
        (
            (
                (
                    (F.lit(1.061405429) * tp - F.lit(1.453152027)) * tp
                    + F.lit(1.421413741)
                )
                * tp
                - F.lit(0.284496736)
            )
            * tp
            + F.lit(0.254829592)
        )
        * tp
        * F.exp(-x * x)
    )
    p = z.select("event_type", "n", "t_stat", p_raw.alias("p_raw"))
    w_rank = Window.orderBy("p_raw", "event_type")
    w_m = Window.orderBy("p_raw", "event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = p.select(
        "event_type", "n", "t_stat", "p_raw",
        F.row_number().over(w_rank).cast("long").alias("k"),
        F.count(F.lit(1)).over(w_m).cast("long").alias("m"),
    )
    kmax = F.max(
        F.when(
            F.col("p_raw") <= F.col("k") * F.lit(0.05) / F.col("m"),
            F.col("k"),
        )
    ).over(w_m)
    return (
        r.withColumn("kmax", kmax)
        .select(
            "event_type",
            "n",
            F.round("t_stat", 6).alias("t_stat"),
            F.round("p_raw", 6).alias("p_approx"),
            F.col("k").alias("bh_rank"),
            F.coalesce(
                F.col("k") <= F.col("kmax"), F.lit(False)
            ).alias("significant"),
        )
        .orderBy("event_type")
    )


@query(
    "rel_runs_test",
    # Wald-Wolfowitz runs test on the daily revenue up/down sequence:
    # signs from exact whole-thousand diffs (zero diffs dropped, the
    # textbook treatment), R = sign changes + 1 via one lag, z closed
    # form from BIGINT counts only.
    oracle="""
WITH """ + _DAY_REV_CTE + """,
diffs AS (
  SELECT d, x - LAG(x) OVER (ORDER BY d) AS dx FROM day_rev),
signs AS (
  SELECT d, CASE WHEN dx > 0 THEN 1 ELSE 0 END AS s
  FROM diffs WHERE dx IS NOT NULL AND dx <> 0),
runs AS (
  SELECT s,
    CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
           OR LAG(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END AS brk
  FROM signs),
a AS (
  SELECT CAST(SUM(s) AS BIGINT) AS n1,
    CAST(SUM(1 - s) AS BIGINT) AS n2,
    CAST(SUM(brk) AS BIGINT) AS r
  FROM runs)
SELECT n1, n2, r AS n_runs,
  ROUND((CAST(r AS DOUBLE)
         - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
            / CAST(n1 + n2 AS DOUBLE) + 1.0))
    / sqrt((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
            * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)))
      / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
         * CAST(n1 + n2 - 1 AS DOUBLE))), 6) AS z_score
FROM a
""",
)
def rel_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily revenue
    direction sequence — too few runs means momentum/trend, too many
    means oscillation; the nonparametric sanity check a forecast
    pipeline runs before trusting rel_seasonal_decompose.  Signs come
    from exact whole-thousand diffs (ties dropped, textbook), the run
    count is one lag over the calendar-bounded series, and the z
    closed form touches doubles only at the end."""
    day_rev = _day_rev(spark, sf_dir)
    w = Window.orderBy("d")
    signs = (
        day_rev.withColumn("dx", F.col("x") - F.lag("x").over(w))
        .where(F.col("dx").isNotNull() & (F.col("dx") != 0))
        .select("d", F.when(F.col("dx") > 0, 1).otherwise(0).alias("s"))
    )
    runs = signs.withColumn(
        "brk",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            1,
        ).otherwise(0),
    )
    a = runs.agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
        F.sum("brk").cast("long").alias("r"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    mu = F.lit(2.0) * n1d * n2d / nd + F.lit(1.0)
    sig = F.sqrt(
        (F.lit(2.0) * n1d * n2d * (F.lit(2.0) * n1d * n2d - n1d - n2d))
        / (nd * nd * (F.col("n1") + F.col("n2") - 1).cast("double"))
    )
    return a.select(
        "n1",
        "n2",
        F.col("r").alias("n_runs"),
        F.round((F.col("r").cast("double") - mu) / sig, 6).alias("z_score"),
    )


@query(
    "rel_cramers_v",
    # Chi-square independence on the event_type × day-of-week
    # contingency table + Cramér's V effect size.  Row/col/grand totals
    # ride windows over the 35-cell relation (no joins); expected
    # counts are doubles of BIGINT products, identical op order both
    # engines.  DOW convention: DuckDB EXTRACT(dow) = Sunday 0 ==
    # Spark dayofweek - 1 (the F5 convention table).
    oracle="""
WITH c AS (
  SELECT event_type, EXTRACT(dow FROM CAST(ts AS DATE)) AS dow,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
t AS (
  SELECT event_type, dow, n,
    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
    CAST(SUM(n) OVER (PARTITION BY dow) AS BIGINT) AS ct,
    CAST(SUM(n) OVER () AS BIGINT) AS tot,
    CAST(COUNT(DISTINCT event_type) OVER () AS BIGINT) AS nr,
    CAST(COUNT(DISTINCT dow) OVER () AS BIGINT) AS nc
  FROM c),
x AS (
  SELECT
    CAST(SUM(CAST(floor(
      (CAST(n AS DOUBLE)
         - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tot AS DOUBLE))
      * (CAST(n AS DOUBLE)
         - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tot AS DOUBLE))
      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tot AS DOUBLE))
      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS chi2_micro,
    CAST(MAX(tot) AS BIGINT) AS n_obs,
    CAST(MAX((nr - 1) * (nc - 1)) AS BIGINT) AS dof,
    CAST(MAX(CASE WHEN nr < nc THEN nr ELSE nc END - 1) AS BIGINT) AS mindim
  FROM t)
SELECT n_obs, dof,
  ROUND(CAST(chi2_micro AS DOUBLE) / 1000000.0, 6) AS chi2,
  ROUND(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0
             / (CAST(n_obs AS DOUBLE) * CAST(mindim AS DOUBLE))), 6)
    AS cramers_v
FROM x
""",
)
def rel_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and day of
    week, with Cramér's V effect size — the categorical-association
    audit (is traffic mix weekday-dependent?) complementing the
    goodness-of-fit chi-square in etl_benford_audit.  One hash
    aggregate collapses the corpus to the ≤|types|×7 contingency
    relation; marginals ride windows over those 35 rows.  The 35-term
    chi2 sum is over identical doubles on both engines (products of
    BIGINT marginals), summed by DuckDB and Spark in different orders —
    35 same-sign terms keep that order-stable at ROUND 6."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type",
        (F.dayofweek(F.col("ts").cast("date")) - 1).cast("long").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_r = Window.partitionBy("event_type")
    w_c = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    t = c.select(
        "event_type", "dow", "n",
        F.sum("n").over(w_r).cast("long").alias("rt"),
        F.sum("n").over(w_c).cast("long").alias("ct"),
        F.sum("n").over(w_all).cast("long").alias("tot"),
        F.size(F.collect_set("event_type").over(w_all)).cast("long")
        .alias("nr"),
        F.size(F.collect_set("dow").over(w_all)).cast("long").alias("nc"),
    )
    exp = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("tot").cast("double")
    )
    # Per-cell chi2 terms micro-quantized to BIGINT BEFORE the sum —
    # the 35 same-sign terms would otherwise be summed in engine-
    # specific order (the established order-free-sum discipline).
    term_micro = F.floor(
        (F.col("n").cast("double") - exp)
        * (F.col("n").cast("double") - exp)
        / exp
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    x = t.agg(
        F.sum(term_micro).cast("long").alias("chi2_micro"),
        F.max("tot").cast("long").alias("n_obs"),
        F.max((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long")
        .alias("dof"),
        F.max(
            F.when(F.col("nr") < F.col("nc"), F.col("nr")).otherwise(
                F.col("nc")
            )
            - 1
        ).cast("long").alias("mindim"),
    )
    chi2d = F.col("chi2_micro").cast("double") / F.lit(1000000.0)
    return x.select(
        "n_obs",
        "dof",
        F.round(chi2d, 6).alias("chi2"),
        F.round(
            F.sqrt(
                chi2d
                / (
                    F.col("n_obs").cast("double")
                    * F.col("mindim").cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "rel_spearman_rho",
    # Spearman rank correlation between daily revenue and daily order
    # count: tie-averaged ranks carried as 2r = 2*rank + ties - 1
    # (BIGINT-exact), Pearson closed form over the doubled ranks —
    # scale-invariant, so rho is unchanged.  Series is calendar-bounded.
    oracle="""
WITH day_rev AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      // 100000 AS x,
    CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1),
r AS (
  SELECT
    CAST(2 * RANK() OVER (ORDER BY x)
         + COUNT(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
    CAST(2 * RANK() OVER (ORDER BY y)
         + COUNT(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
  FROM day_rev),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
    CAST(SUM(rx * rx) AS BIGINT) AS sxx,
    CAST(SUM(ry * ry) AS BIGINT) AS syy,
    CAST(SUM(rx * ry) AS BIGINT) AS sxy
  FROM r)
SELECT n,
  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
FROM m
""",
)
def rel_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily revenue and daily order
    count — the monotone-association measure immune to the revenue
    distribution's heavy tail (Pearson's blind spot).  Tie-averaged
    ranks are exact: avg_rank = rank + (ties-1)/2, carried doubled so
    every moment sum is BIGINT; the Pearson closed form over doubled
    ranks equals rho (affine invariance).  Everything after the one
    groupBy(day) scan happens on the calendar-bounded series."""
    day_rev = _day_rev(spark, sf_dir, with_count=True)
    rx = (
        2 * F.rank().over(Window.orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("x"))
        - 1
    ).cast("long")
    ry = (
        2 * F.rank().over(Window.orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("y"))
        - 1
    ).cast("long")
    r = day_rev.select(rx.alias("rx"), ry.alias("ry"))
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
    )
    nd, sxd, syd = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxxd, syyd, sxyd = (
        F.col(c).cast("double") for c in ("sxx", "syy", "sxy")
    )
    return m.select(
        "n",
        F.round(
            (nd * sxyd - sxd * syd)
            / (
                F.sqrt(nd * sxxd - sxd * sxd)
                * F.sqrt(nd * syyd - syd * syd)
            ),
            6,
        ).alias("rho"),
    )


#: bootstrap replica count (fixed → the 2.5%/97.5% picks are the
#: literal order statistics 5 and 195).
_BOOT_B = 200


@query(
    "rel_bootstrap_ci",
    # Percentile bootstrap CI for the mean daily revenue: B=200
    # hash-deterministic resamples (draw j of replica b reads the
    # series at index md5-hash(b:j) % n — the replayable hash-as-RNG
    # discipline), replica means ORDERED BY THEIR EXACT BIGINT SUMS so
    # the percentile picks never compare floats.
    oracle="""
WITH """ + _DAY_REV_CTE + """,
s AS (
  SELECT x,
    CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS BIGINT) AS i,
    CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM day_rev),
draws AS (
  SELECT b.b, s.i,
    CAST(('0x' || substr(md5(CAST(b.b AS VARCHAR) || ':' ||
      CAST(s.i AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) % s.n AS idx
  FROM s CROSS JOIN (SELECT UNNEST(range(0, 200)) AS b) b),
sums AS (
  SELECT d.b, CAST(SUM(s2.x) AS BIGINT) AS sx,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM draws d JOIN s s2 ON s2.i = d.idx
  GROUP BY d.b),
ranked AS (
  SELECT sx, n, ROW_NUMBER() OVER (ORDER BY sx, b) AS k FROM sums),
obs AS (
  SELECT CAST(SUM(x) AS BIGINT) AS sx, CAST(COUNT(*) AS BIGINT) AS n
  FROM s)
SELECT obs.n AS n_days,
  CAST(200 AS BIGINT) AS n_boot,
  ROUND(CAST(obs.sx AS DOUBLE) / CAST(obs.n AS DOUBLE), 6) AS mean_obs,
  ROUND((SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
         FROM ranked WHERE k = 5), 6) AS ci_lo,
  ROUND((SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
         FROM ranked WHERE k = 195), 6) AS ci_hi
FROM obs
""",
)
def rel_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap 95% confidence interval for mean daily
    revenue — the distribution-free uncertainty quantification every
    metrics report should carry.  B=200 resamples are hash-
    deterministic (draw j of replica b indexes the series at
    md5(b:j) % n), so the 'random' bootstrap replays identically on
    both engines and across runs.  Replica means are ranked by their
    EXACT BIGINT sums (the series is whole-thousands), so the 2.5%/97.5%
    order-statistic picks involve no float comparison; doubles appear
    only in the final divisions.  Scale: the draw matrix is B × n_days
    (~480k rows) — calendar-bounded, corpus-independent; the corpus
    cost stays the one groupBy(day) scan."""
    day_rev = _day_rev(spark, sf_dir)
    w_i = Window.orderBy("d")
    w_all = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s = day_rev.select(
        "x",
        (F.row_number().over(w_i) - 1).cast("long").alias("i"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    bs = spark.range(0, _BOOT_B).select(F.col("id").cast("long").alias("b"))
    idx = (
        F.conv(
            F.md5(
                F.concat_ws(
                    ":", F.col("b").cast("string"), F.col("i").cast("string")
                )
            ).substr(1, 15),
            16,
            10,
        ).cast("long")
        % F.col("n")
    )
    draws = s.join(F.broadcast(bs)).select("b", idx.alias("idx"))
    sums = (
        draws.join(
            s.select(F.col("i").alias("idx"), F.col("x")), "idx"
        )
        .groupBy("b")
        .agg(
            F.sum("x").cast("long").alias("sx"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    ranked = sums.select(
        "sx",
        "n",
        F.row_number().over(Window.orderBy("sx", "b")).alias("k"),
    )
    mean_at = lambda k: F.max(  # noqa: E731
        F.when(F.col("k") == k, F.col("sx").cast("double") / F.col("n").cast("double"))
    )
    picks = ranked.agg(
        F.round(mean_at(5), 6).alias("ci_lo"),
        F.round(mean_at(195), 6).alias("ci_hi"),
    )
    obs = s.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(
            F.sum("x").cast("double") / F.max("n").cast("double"), 6
        ).alias("mean_obs"),
    )
    return obs.join(picks).select(
        "n_days",
        F.lit(200).cast("long").alias("n_boot"),
        "mean_obs",
        "ci_lo",
        "ci_hi",
    )


@query(
    "rel_market_basket_lift",
    # Association rules over order baskets: directed part pairs with
    # support / confidence / lift from exact BIGINT basket counts
    # (support(A,B)=n_AB/N, confidence=n_AB/n_A, lift=conf/supp(B)) —
    # top-20 by lift with a total-order tiebreak.  The rule metrics are
    # ratios of integers, so ROUND 6 sees identical doubles.
    oracle="""
WITH e0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM e0),
ca AS (SELECT l_partkey AS p, CAST(COUNT(*) AS BIGINT) AS c
       FROM e0 GROUP BY 1),
cab AS (
  SELECT a.l_partkey AS ant, b.l_partkey AS cons,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM e0 a JOIN e0 b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2),
m AS (
  SELECT cab.ant, cab.cons, cab.n_both,
    CAST(cab.n_both AS DOUBLE) / CAST(n.n_orders AS DOUBLE) AS supp,
    CAST(cab.n_both AS DOUBLE) / CAST(a.c AS DOUBLE) AS conf,
    (CAST(cab.n_both AS DOUBLE) / CAST(a.c AS DOUBLE))
      / (CAST(b.c AS DOUBLE) / CAST(n.n_orders AS DOUBLE)) AS lift
  FROM cab
  JOIN ca a ON a.p = cab.ant
  JOIN ca b ON b.p = cab.cons
  CROSS JOIN n),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, ant, cons) AS rk
  FROM m)
SELECT ant, cons, n_both,
  ROUND(supp, 6) AS support,
  ROUND(conf, 6) AS confidence,
  ROUND(lift, 6) AS lift,
  CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 20 ORDER BY rank
""",
)
def rel_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets (the retail
    market-basket classic): directed part-pair rules A→B scored by
    support, confidence, and lift from exact basket counts, top-20 by
    lift under a total order.  The pair derivation is the same
    per-order collect_set + double-explode shape as the co-occurrence
    graph (two narrow shuffles, no SMJ of the fact against itself);
    the per-part counts broadcast into the rule join; N is a bounded
    1-row scalar.  Lift > 1 means B is over-represented in A's baskets
    — ties broken (ant, cons) so the cut is deterministic."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = e0.select("l_orderkey").distinct().count()  # 1 scalar
    ca = e0.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_order = e0.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    cab = (
        per_order.select(F.explode("ps").alias("ant"), "ps")
        .select("ant", F.explode("ps").alias("cons"))
        .where(F.col("ant") != F.col("cons"))
        .groupBy("ant", "cons")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    nd = F.lit(float(n_orders))
    m = (
        cab.join(
            F.broadcast(ca.select(F.col("p").alias("ant"),
                                  F.col("c").alias("ca"))),
            "ant",
        )
        .join(
            F.broadcast(ca.select(F.col("p").alias("cons"),
                                  F.col("c").alias("cb"))),
            "cons",
        )
        .select(
            "ant", "cons", "n_both",
            (F.col("n_both").cast("double") / nd).alias("supp"),
            (F.col("n_both").cast("double") / F.col("ca").cast("double"))
            .alias("conf"),
            (
                (F.col("n_both").cast("double") / F.col("ca").cast("double"))
                / (F.col("cb").cast("double") / nd)
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.desc("lift"), "ant", "cons")
    return (
        m.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 20)
        .select(
            "ant", "cons", "n_both",
            F.round("supp", 6).alias("support"),
            F.round("conf", 6).alias("confidence"),
            F.round("lift", 6).alias("lift"),
            "rank",
        )
        .orderBy("rank")
    )
