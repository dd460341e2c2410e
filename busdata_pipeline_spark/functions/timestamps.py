"""F1 — the reference's custom timestamp encoding, as pure Column algebra.

``OPD_DATE`` is a string like ``"25DEC2022:00:00:00"`` (uppercase month,
``ddMMMyyyy`` prefix) and ``ACT_TIME`` is seconds-since-midnight that can
exceed 86400 (service-day rollover past midnight):
/root/reference/transform.py:25-59 (rollover :42-54).

Spark's datetime parser wants month names in title case (``Dec``), so the
month slice is recased before ``to_timestamp``; the >24 h rollover is not a
special case at all — adding an interval of N seconds rolls days natively.
No Python UDF: stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def opd_date(opd: Column | str) -> Column:
    """``OPD_DATE`` -> DateType (the service day)."""
    col = opd if isinstance(opd, Column) else F.col(opd)
    raw = F.substring(col, 1, 9)  # '25DEC2022'
    recased = F.concat(
        F.substring(raw, 1, 2),
        F.initcap(F.lower(F.substring(raw, 3, 3))),
        F.substring(raw, 6, 4),
    )
    # try_to_date: unparseable OPD_DATE -> NULL (the reference skips such
    # records, transform.py:212-215) instead of an ANSI runtime error.
    return F.try_to_date(recased, "ddMMMyyyy")


def _require_utc_session() -> None:
    """The date→timestamp cast below lands on session-TZ midnight, so
    under a DST-observing session timezone a spring-forward service day
    would silently shift every breadcrumb by an hour relative to the
    reference's naive wall-clock arithmetic.  Registered queries are
    safe (plans/registry pins UTC before building the plan); this guard
    makes the contract explicit for direct callers instead of letting
    them diverge silently."""
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        return
    tz = s.conf.get("spark.sql.session.timeZone", "UTC")
    if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        raise ValueError(
            f"breadcrumb_timestamp requires an UTC session timezone "
            f"(got {tz!r}); call busdata_pipeline_spark.session."
            f"apply_session_conf(spark) first"
        )


def breadcrumb_timestamp(opd: Column | str, act_time: Column | str) -> Column:
    """service-day midnight + ACT_TIME seconds -> TimestampType.

    ACT_TIME >= 86400 lands on the next calendar day, matching the
    reference's explicit day-carry arithmetic (transform.py:42-54).
    Unparseable OPD_DATE yields NULL (the reference skips such records:
    transform.py:212-215 — callers filter on isNotNull).
    Raises at plan-construction time if the active session's timezone
    is not UTC (see _require_utc_session).
    """
    _require_utc_session()
    act = act_time if isinstance(act_time, Column) else F.col(act_time)
    base = opd_date(opd).cast("timestamp_ltz")
    return base + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), act.cast("double"))
