"""Scalar expression helpers — the engine's answer to SURVEY.md §2.8.

Everything here is a Column expression (JVM-side, codegen-friendly); no
Python UDFs.  The delicate part is day-of-week convention skew
(SURVEY.md §7.5.3): three conventions exist in the reference —

- PostgreSQL ``EXTRACT(DOW)``: 0=Sunday..6=Saturday  (analytic.sql:13-24)
- Python ``datetime.weekday()``: 0=Monday..6=Sunday  (transform.py:162)
- Spark ``dayofweek``: 1=Sunday..7=Saturday

Each consumer gets an explicitly-named helper so the offset is encoded at
the definition site, once.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dow_pg(ts: Column | str) -> Column:
    """PostgreSQL/DuckDB EXTRACT(DOW): 0=Sunday..6=Saturday."""
    return F.dayofweek(ts) - F.lit(1)


def weekday_python(d: Column | str) -> Column:
    """Python datetime.weekday(): 0=Monday..6=Sunday (transform.py:162)."""
    return F.weekday(d)


def hour_utc(ts: Column | str) -> Column:
    """EXTRACT(HOUR FROM ts AT TIME ZONE 'UTC') (analytic.sql:45).

    The session is pinned to UTC (session.SESSION_TZ) so plain hour() is
    the identity-timezone extraction the reference performs.
    """
    return F.hour(ts)


def event_date(ts: Column | str) -> Column:
    """``tstamp::date`` (analytic.sql:4)."""
    return F.to_date(ts)


def epoch_seconds(ts: Column | str) -> Column:
    """Seconds-since-epoch as DOUBLE with fractional micros — matches
    DuckDB ``epoch(ts)`` bit-for-bit (both compute micros/1e6).

    Casts through TIMESTAMP_LTZ *explicitly* (not the session-resolvable
    "timestamp" alias) so TIMESTAMP_NTZ inputs (naive parquet reads under
    inferTimestampNTZ) are legal even when the caller's session set
    spark.sql.timestampType=TIMESTAMP_NTZ; under the pinned UTC session
    the NTZ->LTZ fold is value-identity and the extra cast is a no-op for
    columns already LTZ.
    """
    col = ts if isinstance(ts, Column) else F.col(ts)
    return col.cast("timestamp_ltz").cast("double")


def service_key_for(d: Column | str) -> Column:
    """Weekday/Saturday/Sunday bucket (transform.py:164-170): Python
    weekday() 5 -> Saturday, 6 -> Sunday, else Weekday."""
    wd = weekday_python(d)
    return (
        F.when(wd == 5, F.lit("Saturday"))
        .when(wd == 6, F.lit("Sunday"))
        .otherwise(F.lit("Weekday"))
    )


def weekday_name_expr(ts: Column | str) -> Column:
    """CASE EXTRACT(DOW) -> name (analytic.sql:13-21)."""
    d = dow_pg(ts)
    names = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
             "Friday", "Saturday"]
    expr = F.when(d == 0, F.lit(names[0]))
    for i in range(1, 7):
        expr = expr.when(d == i, F.lit(names[i]))
    return expr
