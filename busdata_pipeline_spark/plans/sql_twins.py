"""Entry point C of the reference — the hand-run SQL workload
(/root/reference/analytic.sql:1-191) — as *literal Spark SQL* through
``spark.sql``, not DataFrame chains.

SURVEY.md §3.3: the reference ships no parser/planner/executor of its
own; PostgreSQL runs the SQL.  Here Spark's SQL front end owns that
layer, so every analytic question runs verbatim-modulo-dialect.  The
dialect deltas (all mechanical) are:

- ``tstamp::date``            -> ``to_date(ts)``
- ``EXTRACT(DOW FROM ts)``    -> ``dayofweek(ts) - 1``   (PG is 0=Sunday)
- ``AT TIME ZONE 'UTC'``      -> identity (session pinned to UTC)
- ``MAX(ts) - MIN(ts)``       -> double epoch subtraction (interval q8)
- PG integer division (q3)    -> explicit FLOOR

Each twin registers under ``sql_<name>`` with the SAME DuckDB oracle as
its DataFrame twin in plans/analytics.py, so the driver hash-checks both
front ends against one ground truth; tests/test_sql_twins.py additionally
asserts SQL-vs-DataFrame result equality directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Import for registration order: the DataFrame twins must be in ORACLES
# before we alias their oracle strings.
import busdata_pipeline_spark.plans.analytics  # noqa: F401
from busdata_pipeline_spark.plans.registry import ORACLES, query
from busdata_pipeline_spark.sources import table

_VIEWS = ("events", "customer")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the warehouse tables to the SQL front end (the
    createOrReplaceTempView analog of the reference's Postgres tables)."""
    for name in _VIEWS:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


#: analytic.sql re-expressed in Spark SQL dialect.  Keys match the
#: DataFrame twins; aliases match the shared oracles exactly.
SQL_TWINS: dict[str, str] = {
    # analytic.sql:2-9 — q1/q2 day counts
    "bus_q1_count_day1": """
        SELECT COUNT(*) AS n_events FROM events
        WHERE to_date(ts) = DATE '2024-01-01'
    """,
    "bus_q2_count_day2": """
        SELECT COUNT(*) AS n_events FROM events
        WHERE to_date(ts) = DATE '2024-01-02'
    """,
    # analytic.sql:11-25 — q3 avg readings per day-of-week (PG DOW CASE)
    "bus_q3_avg_per_dow": """
        SELECT
          CASE dayofweek(ts) - 1
            WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday'
            WHEN 3 THEN 'Wednesday' WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday'
            WHEN 6 THEN 'Saturday' END AS day_of_week,
          CAST(FLOOR(COUNT(*) / COUNT(DISTINCT to_date(ts))) AS BIGINT)
            AS avg_readings_per_day
        FROM events
        GROUP BY dayofweek(ts) - 1
    """,
    # analytic.sql:27-34 — q4 distinct ids in the bounding box
    "bus_q4_distinct_in_box": """
        SELECT DISTINCT user_id FROM events
        WHERE to_date(ts) = DATE '2024-01-01'
          AND value BETWEEN 100 AND 200
          AND user_id BETWEEN 40 AND 120
    """,
    # analytic.sql:36-46 — q5 join + Monday 4-6pm slice
    "bus_q5_join_timeslice": """
        SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, c.c_name
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        WHERE dayofweek(e.ts) - 1 = 1 AND hour(e.ts) BETWEEN 16 AND 17
    """,
    # analytic.sql:59-78 — q5b labeled UNION ALL period counts
    "bus_q5_period_counts": """
        SELECT 'Monday 4pm-6pm' AS time_period, COUNT(*) AS reading_count
        FROM events WHERE dayofweek(ts) - 1 = 1 AND hour(ts) BETWEEN 16 AND 17
        UNION ALL
        SELECT 'Sunday 6am-8am' AS time_period, COUNT(*) AS reading_count
        FROM events WHERE dayofweek(ts) - 1 = 0 AND hour(ts) BETWEEN 6 AND 7
    """,
    # analytic.sql:80-83 — q6 max with null guard
    "bus_q6_max_value": """
        SELECT MAX(value) AS max_value FROM events WHERE value IS NOT NULL
    """,
    # analytic.sql:85-93 — q7 per-value distinct-vehicle histogram
    "bus_q7_value_histogram": """
        SELECT e.value AS value, COUNT(DISTINCT c.c_custkey) AS vehicle_count
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        WHERE e.value IS NOT NULL
        GROUP BY e.value
    """,
    # analytic.sql:95-104 — q8 longest trip (interval as epoch seconds)
    "bus_q8_longest_trip": """
        SELECT user_id, MIN(ts) AS start_time, MAX(ts) AS end_time,
               ROUND(CAST(MAX(ts) AS DOUBLE) - CAST(MIN(ts) AS DOUBLE), 6)
                 AS duration_sec
        FROM events
        GROUP BY user_id
        ORDER BY duration_sec DESC, user_id
        LIMIT 1
    """,
    # analytic.sql:106-126 — q9 labeled day-type comparison
    "bus_q9_day_type_compare": """
        SELECT 'Non-holiday Wednesday' AS day_type, COUNT(*) AS breadcrumb_count
        FROM events WHERE to_date(ts) = DATE '2024-01-03'
        UNION ALL
        SELECT 'Non-holiday Saturday' AS day_type, COUNT(*) AS breadcrumb_count
        FROM events WHERE to_date(ts) = DATE '2024-01-06'
        UNION ALL
        SELECT 'Holiday (New Year\\'s Day)' AS day_type, COUNT(*) AS breadcrumb_count
        FROM events WHERE to_date(ts) = DATE '2024-01-01'
    """,
    # analytic.sql:129-154 — q10.1 rush hour vs off-peak
    "bus_q10_rush_vs_offpeak": """
        SELECT 'Rush Hour (7-9am, 4-6pm)' AS time_period,
               ROUND(AVG(value), 6) AS avg_value, COUNT(*) AS reading_count
        FROM events WHERE value IS NOT NULL
          AND ((hour(ts) BETWEEN 7 AND 8) OR (hour(ts) BETWEEN 16 AND 17))
        UNION ALL
        SELECT 'Off-Peak Hours' AS time_period,
               ROUND(AVG(value), 6) AS avg_value, COUNT(*) AS reading_count
        FROM events WHERE value IS NOT NULL
          AND NOT ((hour(ts) BETWEEN 7 AND 8) OR (hour(ts) BETWEEN 16 AND 17))
    """,
    # analytic.sql:156-169 — q10.2 top-5 by average measure
    "bus_q10_top5_fastest": """
        SELECT user_id, ROUND(AVG(value), 6) AS avg_value,
               COUNT(*) AS reading_count
        FROM events
        WHERE value IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id
        ORDER BY avg_value DESC, user_id
        LIMIT 5
    """,
    # analytic.sql:171-191 — q10.3 quadrant density
    "bus_q10_quadrants": """
        SELECT
          CASE WHEN e.value >= 245 AND e.user_id >= 75 THEN 'Northeast'
               WHEN e.value >= 245 AND e.user_id < 75 THEN 'Northwest'
               WHEN e.value < 245 AND e.user_id >= 75 THEN 'Southeast'
               WHEN e.value < 245 AND e.user_id < 75 THEN 'Southwest'
          END AS city_quadrant,
          COUNT(*) AS reading_count,
          COUNT(DISTINCT c.c_custkey) AS active_buses
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
    """,
}


def _register(name: str, sql: str) -> None:
    @query(f"sql_{name}", oracle=ORACLES[name])
    def twin(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    twin.__name__ = f"sql_{name}"
    twin.__doc__ = f"Spark-SQL twin of {name} (see SQL_TWINS['{name}'])."


for _name, _sql in SQL_TWINS.items():
    _register(_name, _sql)


# ---------------------------------------------------------------------------
# TPC-H-shape SQL twins: for these three the DuckDB oracle text is ALSO
# valid Spark SQL (shared ANSI subset — ROUND/HAVING/TIMESTAMP literals,
# no dialect deltas), so the literal oracle string runs on BOTH engines:
# the strongest possible front-end parity statement.

import busdata_pipeline_spark.plans.relational  # noqa: E402,F401

_TPCH_VIEWS = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem")


def register_tpch_views(spark: SparkSession, sf_dir: str) -> None:
    for name in _TPCH_VIEWS:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def _register_shared_text(name: str) -> None:
    @query(f"sql_{name}", oracle=ORACLES[name])
    def twin(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tpch_views(spark, sf_dir)
        return spark.sql(ORACLES[name])

    twin.__name__ = f"sql_{name}"
    twin.__doc__ = (
        f"Shared-text SQL twin of {name}: the DuckDB oracle string "
        f"itself runs through spark.sql."
    )


for _name in ("rel_q1_pricing_summary", "rel_q5_region_revenue",
              "rel_q18_large_orders"):
    _register_shared_text(_name)


# --- Shared-text twins over the events fact: the nonparametric rank
# tests' oracle strings are pure ANSI (windows + isnan + sqrt), so the
# identical text runs on both engines — front-end parity for the
# statistics tier.

import busdata_pipeline_spark.plans.stats_tests  # noqa: E402,F401


def _register_shared_text_events(name: str) -> None:
    @query(f"sql_{name}", oracle=ORACLES[name])
    def twin(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(ORACLES[name])

    twin.__name__ = f"sql_{name}"
    twin.__doc__ = (
        f"Shared-text SQL twin of {name}: the DuckDB oracle string "
        f"itself runs through spark.sql."
    )


for _name in ("rel_mannwhitney_value", "rel_ks_2sample"):
    _register_shared_text_events(_name)
