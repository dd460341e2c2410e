"""The reference's 10-question analytic surface (analytic.sql:1-191),
re-expressed as Catalyst-planned DataFrame lineages over the driver's
``events`` table, which stands in for the BreadCrumb fact
(FIXTURES.md §6): ``ts`` = tstamp, ``user_id`` = trip/vehicle id,
``value`` = speed-like measure, ``customer`` = Trip-like dimension.

Every query aliases its computed columns identically to its DuckDB oracle
(driver hash-compares values under sorted column names).  Scale notes:

- all filters/projects are declarative → parquet pushdown + pruning free;
- the fact×dim join (bus_q5/bus_q10_quadrants) broadcasts the dim side;
- aggregates are partial+final hash aggs (map-side combine) — no extra
  code needed; AQE coalesces post-shuffle partitions at small SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from busdata_pipeline_spark.functions import (
    dow_pg,
    event_date,
    epoch_seconds,
    hour_utc,
    weekday_name_expr,
)
from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table

# ---------------------------------------------------------------------------
# q1 / q2 — day counts (analytic.sql:1-9; operators A1, P2, F7)


def _count_on(spark: SparkSession, sf_dir: str, day: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.where(event_date("ts") == F.lit(day).cast("date"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "bus_q1_count_day1",
    oracle="SELECT COUNT(*) AS n_events FROM events WHERE ts::date = DATE '2024-01-01'",
)
def bus_q1_count_day1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:2-4 — COUNT(*) on a single day; date filter pushes to scan."""
    return _count_on(spark, sf_dir, "2024-01-01")


@query(
    "bus_q2_count_day2",
    oracle="SELECT COUNT(*) AS n_events FROM events WHERE ts::date = DATE '2024-01-02'",
)
def bus_q2_count_day2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:6-9."""
    return _count_on(spark, sf_dir, "2024-01-02")


# ---------------------------------------------------------------------------
# q3 — average readings per day-of-week (analytic.sql:11-25; A2-A4, F5, P8, O1)

@query(
    "bus_q3_avg_per_dow",
    oracle="""
SELECT
  CASE dayofweek(ts)
    WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday'
    WHEN 3 THEN 'Wednesday' WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday'
    WHEN 6 THEN 'Saturday' END AS day_of_week,
  CAST(FLOOR(COUNT(*) / COUNT(DISTINCT ts::date)) AS BIGINT) AS avg_readings_per_day
FROM events
GROUP BY dayofweek(ts)
""",
)
def bus_q3_avg_per_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:11-25.  PG integer division is emulated with FLOOR on
    both sides (SURVEY.md §7.5.4).  dow convention: PG 0=Sunday."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(dow_pg("ts").alias("_dow"), weekday_name_expr("ts").alias("day_of_week"))
        .agg(
            F.floor(F.count(F.lit(1)) / F.countDistinct(event_date("ts")))
            .cast("long")
            .alias("avg_readings_per_day")
        )
        .drop("_dow")
    )


# ---------------------------------------------------------------------------
# q4 — DISTINCT ids inside a 2-D box on one day (analytic.sql:27-34; P2, P3, A9, O1)

@query(
    "bus_q4_distinct_in_box",
    oracle="""
SELECT DISTINCT user_id
FROM events
WHERE ts::date = DATE '2024-01-01'
  AND value BETWEEN 100 AND 200
  AND user_id BETWEEN 40 AND 120
""",
)
def bus_q4_distinct_in_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:27-34 — the I-205 bounding box becomes a (value,
    user_id) box; conjunctive range predicates push to the parquet scan."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.where(
            (event_date("ts") == F.lit("2024-01-01").cast("date"))
            & F.col("value").between(100, 200)
            & F.col("user_id").between(40, 120)
        )
        .select("user_id")
        .distinct()
    )


# ---------------------------------------------------------------------------
# q5 — fact×dim join + day-of-week + hour slice (analytic.sql:36-57; J1, P5, F8)

@query(
    "bus_q5_join_timeslice",
    oracle="""
SELECT e.event_id AS event_id, e.ts AS ts, e.user_id AS user_id,
       e.event_type AS event_type, e.value AS value, c.c_name AS c_name
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
WHERE dayofweek(e.ts) = 1
  AND hour(e.ts) BETWEEN 16 AND 17
""",
)
def bus_q5_join_timeslice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:36-46 — Mondays 4-6pm, joined to the dimension.

    The dimension is broadcast (Trip is tiny relative to the fact:
    SURVEY.md J1) so the fact never shuffles.
    """
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        ev.where((dow_pg("ts") == 1) & hour_utc("ts").between(16, 17))
        .join(F.broadcast(cust), ev.user_id == cust.c_custkey, "inner")
        .select("event_id", "ts", "user_id", "event_type", "value", "c_name")
    )


@query(
    "bus_q5_period_counts",
    oracle="""
SELECT 'Monday 4pm-6pm' AS time_period, COUNT(*) AS reading_count
FROM events WHERE dayofweek(ts) = 1 AND hour(ts) BETWEEN 16 AND 17
UNION ALL
SELECT 'Sunday 6am-8am' AS time_period, COUNT(*) AS reading_count
FROM events WHERE dayofweek(ts) = 0 AND hour(ts) BETWEEN 6 AND 7
""",
)
def bus_q5_period_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:59-78 — UNION ALL of labeled aggregate branches (U1)."""
    ev = table(spark, sf_dir, "events")
    mon = (
        ev.where((dow_pg("ts") == 1) & hour_utc("ts").between(16, 17))
        .agg(F.count(F.lit(1)).alias("reading_count"))
        .select(F.lit("Monday 4pm-6pm").alias("time_period"), "reading_count")
    )
    sun = (
        ev.where((dow_pg("ts") == 0) & hour_utc("ts").between(6, 7))
        .agg(F.count(F.lit(1)).alias("reading_count"))
        .select(F.lit("Sunday 6am-8am").alias("time_period"), "reading_count")
    )
    return mon.unionByName(sun)


# ---------------------------------------------------------------------------
# q6 — global MAX with null guard (analytic.sql:80-83; A5, P4)

@query(
    "bus_q6_max_value",
    oracle="SELECT MAX(value) AS max_value FROM events WHERE value IS NOT NULL",
)
def bus_q6_max_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:80-83."""
    ev = table(spark, sf_dir, "events")
    return ev.where(F.col("value").isNotNull()).agg(F.max("value").alias("max_value"))


# ---------------------------------------------------------------------------
# q7 — per-speed distinct-vehicle histogram (analytic.sql:85-93; A3, A7, O2)

@query(
    "bus_q7_value_histogram",
    oracle="""
SELECT e.value AS value, COUNT(DISTINCT c.c_custkey) AS vehicle_count
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
WHERE e.value IS NOT NULL
GROUP BY e.value
""",
)
def bus_q7_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:85-93 — join then GROUP BY measure with COUNT DISTINCT.

    At 100 TB the exact distinct forces a second shuffle keyed by
    (value, custkey); Catalyst plans expand+two-phase agg automatically.
    ``approx_count_distinct`` is the documented scale escape hatch.
    """
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    return (
        ev.where(F.col("value").isNotNull())
        .join(F.broadcast(cust), ev.user_id == cust.c_custkey, "inner")
        .groupBy("value")
        .agg(F.countDistinct("c_custkey").alias("vehicle_count"))
    )


# ---------------------------------------------------------------------------
# q8 — longest trip by duration (analytic.sql:95-104; A5, A8, O3)

@query(
    "bus_q8_longest_trip",
    oracle="""
SELECT user_id, MIN(ts) AS start_time, MAX(ts) AS end_time,
       ROUND(epoch(MAX(ts)) - epoch(MIN(ts)), 6) AS duration_sec
FROM events
GROUP BY user_id
ORDER BY duration_sec DESC, user_id
LIMIT 1
""",
)
def bus_q8_longest_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:95-104 — interval aggregate as fractional epoch-seconds
    (bit-identical to DuckDB's epoch()); secondary key stabilizes ties
    (SURVEY.md §7.5.5).  Catalyst turns ORDER+LIMIT into
    TakeOrderedAndProject — no global sort materialized."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("start_time"),
            F.max("ts").alias("end_time"),
            F.round(epoch_seconds(F.max("ts")) - epoch_seconds(F.min("ts")), 6).alias("duration_sec"),
        )
        .orderBy(F.desc("duration_sec"), F.asc("user_id"))
        .limit(1)
    )


# ---------------------------------------------------------------------------
# q9 — labeled day-type comparison (analytic.sql:106-126; U1)

@query(
    "bus_q9_day_type_compare",
    oracle="""
SELECT 'Non-holiday Wednesday' AS day_type, COUNT(*) AS breadcrumb_count
FROM events WHERE ts::date = DATE '2024-01-03'
UNION ALL
SELECT 'Non-holiday Saturday' AS day_type, COUNT(*) AS breadcrumb_count
FROM events WHERE ts::date = DATE '2024-01-06'
UNION ALL
SELECT 'Holiday (New Year''s Day)' AS day_type, COUNT(*) AS breadcrumb_count
FROM events WHERE ts::date = DATE '2024-01-01'
""",
)
def bus_q9_day_type_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:106-126."""
    ev = table(spark, sf_dir, "events")

    def branch(label: str, day: str) -> DataFrame:
        return (
            ev.where(event_date("ts") == F.lit(day).cast("date"))
            .agg(F.count(F.lit(1)).alias("breadcrumb_count"))
            .select(F.lit(label).alias("day_type"), "breadcrumb_count")
        )

    return (
        branch("Non-holiday Wednesday", "2024-01-03")
        .unionByName(branch("Non-holiday Saturday", "2024-01-06"))
        .unionByName(branch("Holiday (New Year's Day)", "2024-01-01"))
    )


# ---------------------------------------------------------------------------
# q10.1 — rush hour vs off-peak (analytic.sql:129-154; P6, A6, U1)

_RUSH = "(hour(ts) BETWEEN 7 AND 8) OR (hour(ts) BETWEEN 16 AND 17)"

@query(
    "bus_q10_rush_vs_offpeak",
    oracle=f"""
SELECT 'Rush Hour (7-9am, 4-6pm)' AS time_period,
       ROUND(AVG(value), 6) AS avg_value, COUNT(*) AS reading_count
FROM events WHERE value IS NOT NULL AND ({_RUSH})
UNION ALL
SELECT 'Off-Peak Hours' AS time_period,
       ROUND(AVG(value), 6) AS avg_value, COUNT(*) AS reading_count
FROM events WHERE value IS NOT NULL AND NOT ({_RUSH})
""",
)
def bus_q10_rush_vs_offpeak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:129-154 — compound boolean predicate and its complement."""
    ev = table(spark, sf_dir, "events")
    rush = hour_utc("ts").between(7, 8) | hour_utc("ts").between(16, 17)

    def branch(label: str, cond) -> DataFrame:
        return (
            ev.where(F.col("value").isNotNull() & cond)
            .agg(
                F.round(F.avg("value"), 6).alias("avg_value"),
                F.count(F.lit(1)).alias("reading_count"),
            )
            .select(F.lit(label).alias("time_period"), "avg_value", "reading_count")
        )

    return branch("Rush Hour (7-9am, 4-6pm)", rush).unionByName(
        branch("Off-Peak Hours", ~rush)
    )


# ---------------------------------------------------------------------------
# q10.2 — top-5 by average measure (analytic.sql:156-169; A6, A7, O3)

@query(
    "bus_q10_top5_fastest",
    oracle="""
SELECT user_id, ROUND(AVG(value), 6) AS avg_value, COUNT(*) AS reading_count
FROM events
WHERE value IS NOT NULL AND user_id IS NOT NULL
GROUP BY user_id
ORDER BY avg_value DESC, user_id
LIMIT 5
""",
)
def bus_q10_top5_fastest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:156-169 — ordering on the ROUNDED average so the
    top-5 cut is identical on both engines even if low bits differ."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.count(F.lit(1)).alias("reading_count"),
        )
        .orderBy(F.desc("avg_value"), F.asc("user_id"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# q10.3 — quadrant density (analytic.sql:171-191; P8, A2, A3, J1)

@query(
    "bus_q10_quadrants",
    oracle="""
SELECT
  CASE WHEN e.value >= 245 AND e.user_id >= 75 THEN 'Northeast'
       WHEN e.value >= 245 AND e.user_id < 75 THEN 'Northwest'
       WHEN e.value < 245 AND e.user_id >= 75 THEN 'Southeast'
       WHEN e.value < 245 AND e.user_id < 75 THEN 'Southwest' END AS city_quadrant,
  COUNT(*) AS reading_count,
  COUNT(DISTINCT c.c_custkey) AS active_buses
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
)
def bus_q10_quadrants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytic.sql:171-191 — GROUP BY CASE expression; the lat/lon city
    split becomes a (value, user_id) split on the stand-in fact."""
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    quadrant = (
        F.when((F.col("value") >= 245) & (F.col("user_id") >= 75), "Northeast")
        .when((F.col("value") >= 245) & (F.col("user_id") < 75), "Northwest")
        .when((F.col("value") < 245) & (F.col("user_id") >= 75), "Southeast")
        .when((F.col("value") < 245) & (F.col("user_id") < 75), "Southwest")
    )
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "inner")
        .groupBy(quadrant.alias("city_quadrant"))
        .agg(
            F.count(F.lit(1)).alias("reading_count"),
            F.countDistinct("c_custkey").alias("active_buses"),
        )
    )


# ---------------------------------------------------------------------------
# props JSON extraction (F12 from_json analog over events.props)

@query(
    "fn_from_json_decode",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
FROM events
GROUP BY 1
""",
)
def fn_from_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/F12 proper — schema'd JSON payload decode with from_json (the
    ingest path's message parsing), vs DuckDB's json_extract."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.from_json("props", "k BIGINT").getField("k").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "fn_props_extract",
    oracle="""
SELECT CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k, COUNT(*) AS n
FROM events
GROUP BY 1
""",
)
def fn_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/F12 — JSON payload decode (from_json in the ingest path; here a
    regexp extraction with identical semantics on both engines)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(F.regexp_extract("props", "[0-9]+", 0).cast("long").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "fn_variant_extract",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       COUNT(*) AS n,
       ROUND(SUM(value), 6) AS total_value
FROM events
GROUP BY 1
""",
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads via Spark 4 VariantType: parse_json once
    into a binary variant (no up-front schema, unlike from_json in
    fn_from_json_decode), path-extract with try_variant_get.  At scale
    variant keeps shredded binary instead of strings, so repeated
    path access never re-parses the JSON text."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.try_variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


@query(
    "fn_string_suite",
    oracle="""
SELECT doc_id,
  UPPER(SUBSTRING(text, 1, 12)) AS up,
  LPAD(SUBSTRING(text, 1, 5), 8, '_') AS pad,
  REVERSE(SUBSTRING(text, 1, 10)) AS rev,
  translate(SUBSTRING(text, 1, 10), 'aeiou', 'AEIOU') AS tr,
  CAST(levenshtein(SUBSTRING(text, 1, 8),
                   REVERSE(SUBSTRING(text, 1, 8))) AS INTEGER) AS lev
FROM documents
""",
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function parity suite: case mapping, padding, reversal,
    character translation, and edit distance — the scalar string surface
    beyond the reference's split/trim/format (F2/F10/F11), each verified
    byte-identical against DuckDB.  All codegen'd JVM expressions."""
    docs = table(spark, sf_dir, "documents")
    head = lambda n: F.substring("text", 1, n)  # noqa: E731
    return docs.select(
        "doc_id",
        F.upper(head(12)).alias("up"),
        F.lpad(head(5), 8, "_").alias("pad"),
        F.reverse(head(10)).alias("rev"),
        F.translate(head(10), "aeiou", "AEIOU").alias("tr"),
        F.levenshtein(head(8), F.reverse(head(8))).alias("lev"),
    )


@query(
    "fn_datetime_suite",
    oracle="""
SELECT event_id,
  CAST(date_trunc('quarter', ts) AS TIMESTAMP) AS qtr,
  last_day(CAST(ts AS DATE)) AS month_end,
  CAST(dayofyear(ts) AS INTEGER) AS doy,
  CAST(weekofyear(ts) AS INTEGER) AS iso_week,
  strftime(ts, '%Y-%m-%d %H:%M') AS fmt_minute
FROM events
""",
)
def fn_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-function parity suite beyond the reference's F5-F10:
    quarter truncation, month-end, day-of-year, ISO week number, and
    minute-grain formatting — each byte/value-identical to DuckDB (the
    one dialect delta is date_trunc's return type, aligned by casting
    the oracle to TIMESTAMP)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("quarter", "ts").alias("qtr"),
        F.last_day(F.col("ts").cast("date")).alias("month_end"),
        F.dayofyear("ts").alias("doy"),
        F.weekofyear("ts").alias("iso_week"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("fmt_minute"),
    )
