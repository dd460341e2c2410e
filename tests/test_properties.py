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


# ---------------------------------------------------------------------------
# round-5 operators: model-based properties

def model_dup_spans(docs: list[tuple[int, str]], n: int = 8):
    """Pure-Python reference for plans/dup_spans.duplicated_spans."""
    grams: dict[str, set[int]] = {}
    per_doc: dict[int, list[int]] = {}
    for did, text in docs:
        toks = text.split(" ")
        per_doc[did] = []
        for p in range(1, len(toks) - n + 2):
            g = " ".join(toks[p - 1:p - 1 + n])
            grams.setdefault(g, set()).add(did)
    out = []
    for did, text in docs:
        toks = text.split(" ")
        dup_pos = [
            p for p in range(1, len(toks) - n + 2)
            if len(grams[" ".join(toks[p - 1:p - 1 + n])]) >= 2
        ]
        spans: list[list[int]] = []
        for p in dup_pos:
            if spans and p <= spans[-1][1] - n + 1 + n:  # p <= prev_start_max + n
                if p <= spans[-1][2] + n:
                    spans[-1][1] = p + n - 1
                    spans[-1][2] = p
                    continue
            spans.append([p, p + n - 1, p])
        for s, e, _ in spans:
            out.append((did, s, e, e - s + 1))
    return sorted(out)


_doc_corpus = st.lists(
    st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=24)
    .map(lambda ws: " ".join(ws)),
    min_size=2, max_size=8,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_doc_corpus)
def test_dup_spans_match_python_model(spark, texts):
    from busdata_pipeline_spark.plans.dup_spans import duplicated_spans

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in duplicated_spans(df).collect())
    assert got == model_dup_spans(docs)


_intervals = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 500)).map(
        lambda t: (min(t), max(t))
    ),
    min_size=1, max_size=10,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(aiv=_intervals, biv=_intervals)
def test_interval_overlap_matches_model(spark, aiv, biv):
    from busdata_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    base = 1_700_000_000
    a = spark.createDataFrame(
        [(i, base + s * 60, base + e * 60) for i, (s, e) in enumerate(aiv)],
        "aid long, s long, e long",
    ).select("aid", F.timestamp_seconds("s").alias("a_s"),
             F.timestamp_seconds("e").alias("a_e"))
    b = spark.createDataFrame(
        [(i, base + s * 60, base + e * 60) for i, (s, e) in enumerate(biv)],
        "bid long, s long, e long",
    ).select("bid", F.timestamp_seconds("s").alias("b_s"),
             F.timestamp_seconds("e").alias("b_e"))
    got = sorted(
        (r.aid, r.bid)
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bin_seconds=600
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (s1, e1) in enumerate(aiv)
        for j, (s2, e2) in enumerate(biv)
        if s1 <= e2 and s2 <= e1
    )
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=6),
                     min_size=1, max_size=30, unique=True),
       parts=st.integers(1, 6))
def test_surrogate_keys_are_global_rank_for_any_partitioning(
        spark, keys, parts):
    from busdata_pipeline_spark.operators.warehouse import (
        assign_surrogate_keys,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r.k: r.sk for r in
           assign_surrogate_keys(df, "k", n_parts=parts).collect()}
    want = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == want
