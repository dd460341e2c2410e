"""Property tests (hypothesis) for the delicate scalar semantics —
SURVEY.md §7.5 watch list items 1 and 3.

The model implementations here are written from the spec (FIXTURES.md /
SURVEY.md §2.8), independent of both the reference's code and the
engine's Column expressions: timestamp = service-day midnight +
ACT_TIME seconds (days roll naturally past 86400); service bucket from
Python-convention weekday (0=Monday).
"""

from __future__ import annotations

from datetime import date, datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from busdata_pipeline_spark.functions.core import (
    dow_pg,
    service_key_for,
    weekday_python,
)
from busdata_pipeline_spark.functions.timestamps import (
    breadcrumb_timestamp,
    opd_date,
)

MONTHS = ["JAN", "FEB", "MAR", "APR", "MAY", "JUN",
          "JUL", "AUG", "SEP", "OCT", "NOV", "DEC"]


def encode_opd(d: date) -> str:
    return f"{d.day:02d}{MONTHS[d.month - 1]}{d.year}:00:00:00"


def model_timestamp(d: date, act_time: int) -> datetime:
    return datetime(d.year, d.month, d.day) + timedelta(seconds=act_time)


def model_service_key(d: date) -> str:
    wd = d.weekday()
    return "Saturday" if wd == 5 else ("Sunday" if wd == 6 else "Weekday")


_rows = st.lists(
    st.tuples(
        st.dates(min_value=date(1990, 1, 1), max_value=date(2049, 12, 31)),
        st.integers(min_value=0, max_value=3 * 86400),  # up to 2-day rollover
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_rows)
def test_timestamp_and_service_key_match_model(spark, rows):
    df = spark.createDataFrame(
        [(encode_opd(d), act) for d, act in rows],
        ["OPD_DATE", "ACT_TIME"],
    ).select(
        breadcrumb_timestamp("OPD_DATE", "ACT_TIME").alias("ts"),
        service_key_for(opd_date("OPD_DATE")).alias("sk"),
        weekday_python(opd_date("OPD_DATE")).alias("wd"),
        dow_pg(breadcrumb_timestamp("OPD_DATE", "ACT_TIME")).alias("dow"),
    )
    got = df.collect()
    for (d, act), r in zip(rows, got):
        want_ts = model_timestamp(d, act)
        assert r.ts == want_ts, (d, act)
        assert r.sk == model_service_key(d)
        assert r.wd == d.weekday()
        # PG DOW: 0=Sunday..6=Saturday, on the ROLLED date
        assert r.dow == (want_ts.date().weekday() + 1) % 7


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(garbage=st.lists(
    st.text(min_size=0, max_size=12).filter(lambda s: ":" not in s),
    min_size=1, max_size=10,
))
def test_unparseable_opd_yields_null_not_error(spark, garbage):
    """The reference skips records whose date can't parse
    (transform.py:212-215); our expressions must yield NULL, never raise
    (ANSI-mode runtime errors would kill the whole job)."""
    df = spark.createDataFrame(
        [(g + ":00:00:00", 100) for g in garbage],
        ["OPD_DATE", "ACT_TIME"],
    ).select(breadcrumb_timestamp("OPD_DATE", "ACT_TIME").alias("ts"))
    for g, r in zip(garbage, df.collect()):
        try:
            datetime.strptime(g[:9].capitalize(), "%d%b%Y")
            parseable = True
        except ValueError:
            parseable = False
        if not parseable:
            assert r.ts is None, repr(g)


# ---------------------------------------------------------------------------
# round-2 distributed-algorithm properties: the Spark implementations
# must agree with trivially-correct single-process models on arbitrary
# inputs, not just the planted fixtures.

@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=60,
))
def test_connected_components_matches_union_find(spark, edges):
    from busdata_pipeline_spark.operators.clustering import connected_components

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for a, b in edges:
        union(a, b)
    groups: dict[int, list[int]] = {}
    for v in parent:
        groups.setdefault(find(v), []).append(v)
    want = {v: min(g) for g in groups.values() for v in g}

    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(st.integers(0, 10_000), st.integers(1, 500)),
             min_size=1, max_size=60, unique_by=lambda r: r[0]),
    st.integers(10, 1000),
)
def test_pack_sequences_matches_serial_cumsum(spark, rows, budget):
    from busdata_pipeline_spark.operators.packing import pack_sequences

    want, cum = {}, 0
    for doc_id, n in sorted(rows):
        want[doc_id] = (cum, cum // budget)
        cum += n

    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {
        r.doc_id: (r.cum_tokens, r.bin_id)
        for r in pack_sequences(df, budget, block_size=7).collect()
    }
    assert got == want


def test_breadcrumb_timestamp_rejects_dst_session(spark):
    """The UTC-session contract is explicit: building the breadcrumb
    timestamp under a DST-observing session timezone raises at plan
    construction instead of silently shifting spring-forward service
    days by an hour."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="UTC session timezone"):
            breadcrumb_timestamp("OPD_DATE", "ACT_TIME")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # restored: construction succeeds again
    breadcrumb_timestamp("OPD_DATE", "ACT_TIME")
