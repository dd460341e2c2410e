"""Regression: a faithful replica of the driver's hash-level check.

Round 1 had three queries that passed `tests/oracle_check.compare` but
failed the driver's hash_match.  `tools/driver_hash.strict_compare` must
(a) reproduce those failures when fed the round-1 (un-canonicalized)
oracles, and (b) pass on the fixed registry versions — otherwise it is
not the same check and gives false confidence.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from driver_hash import (  # noqa: E402
    canon_duck_type,
    canon_spark_type,
    strict_compare,
)
from oracle_check import duckdb_con  # noqa: E402

import __spark_entry__  # noqa: E402,F401 - imports register all queries
from busdata_pipeline_spark.plans.registry import ORACLES, QUERIES  # noqa: E402

SF001 = "/root/testdata/sf0.01"

# The round-1 oracle texts, BEFORE canonicalization (no `+ 0.0`, no
# CAST AS BIGINT) — what the driver actually failed on.
_R1_W2_ORACLE = """
SELECT event_id, user_id,
  ROUND(
    CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 0
         THEN (value - LAG(value) OVER w) / (epoch(ts) - epoch(LAG(ts) OVER w))
    END, 6) AS rate
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

_R1_PIVOT_ORACLE_HEAD = """
SELECT c.c_mktsegment AS c_mktsegment,
  {cols}
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF001)


def test_type_lattice_distinguishes_widths():
    assert canon_duck_type("HUGEINT") != canon_spark_type("bigint")
    assert canon_duck_type("BIGINT") == canon_spark_type("bigint")
    assert canon_duck_type("DOUBLE") == canon_spark_type("double")
    assert canon_duck_type("DECIMAL(18,6)") == canon_spark_type("decimal(18,6)")
    assert canon_duck_type("FLOAT") != canon_spark_type("double")


def test_replica_reproduces_r1_signed_zero_failure(spark, con):
    """The normalized Spark result vs the round-1 oracle (which emits
    -0.0 for tiny negative rates) must FAIL strict, exactly as the
    driver failed it."""
    df = QUERIES["etl_w2_lag_rate"](spark, SF001)
    ok, msg = strict_compare(df, con, _R1_W2_ORACLE)
    assert not ok, "strict replica failed to see the -0.0 divergence"
    assert "value bits" in msg


def test_replica_reproduces_r1_hugeint_failure(spark, con):
    """The round-1 pivot oracle returns HUGEINT columns; strict must
    fail on the width, as the driver did."""
    from busdata_pipeline_spark.plans.relational import _EVENT_TYPES

    oracle = _R1_PIVOT_ORACLE_HEAD.format(
        cols=",\n  ".join(
            f"SUM(CASE WHEN e.event_type = '{t}' THEN 1 ELSE 0 END) AS {t}"
            for t in _EVENT_TYPES
        )
    )
    df = QUERIES["rel_pivot_segment_by_type"](spark, SF001)
    ok, msg = strict_compare(df, con, oracle)
    assert not ok, "strict replica failed to see the HUGEINT width"
    assert "type of" in msg


@pytest.mark.parametrize(
    "name",
    ["etl_w2_lag_rate", "etl_w3_lead_backfill", "rel_pivot_segment_by_type"],
)
def test_r1_failures_now_pass_strict(spark, con, name):
    df = QUERIES[name](spark, SF001)
    ok, msg = strict_compare(df, con, ORACLES[name])
    assert ok, msg


# ---------------------------------------------------------------------------
# Round-7 regression: the output-type gate.
#
# Round 7's 8 driver reds were all one class — output schemas whose
# types survive this module's collect()/fetchall() canonicalization but
# not the driver's pandas-based one (ndarray cells crash its row sort,
# Decimal-vs-float64 hash-diverges, TIMESTAMPTZ breaks schema compare).
# strict_compare must now fail LOUDLY on any such schema, naming the
# column, before values are compared.


def _gate_msg(spark, con, df, sql):
    ok, msg = strict_compare(df, con, sql)
    assert not ok, f"gate missed a driver-unhashable schema: {msg}"
    assert "output-type gate" in msg, msg
    return msg


def test_gate_rejects_array_output(spark, con):
    """The round-7 fn_array_suite shape: an array<float> output column
    (driver: TypeError unhashable numpy.ndarray)."""
    df = spark.sql("SELECT array(1.0, 2.0) AS mid, 1 AS vec_id")
    msg = _gate_msg(spark, con, df, "SELECT [1.0, 2.0] AS mid, 1 AS vec_id")
    assert "mid" in msg


def test_gate_rejects_map_output(spark, con):
    df = spark.sql("SELECT map('k', 1) AS m, 1 AS i")
    msg = _gate_msg(spark, con, df, "SELECT MAP {'k': 1} AS m, 1 AS i")
    assert ".m:" in msg


def test_gate_rejects_decimal_output(spark, con):
    """The round-7 rel_decimal_money_sums shape: a DECIMAL output
    (Spark→pandas keeps Decimal objects, DuckDB→pandas makes float64)."""
    df = spark.sql("SELECT CAST(1.5 AS DECIMAL(18,4)) AS gross")
    msg = _gate_msg(
        spark, con, df, "SELECT CAST(1.5 AS DECIMAL(18,4)) AS gross"
    )
    assert "gross" in msg


def test_gate_rejects_tz_aware_oracle_timestamp(spark, con):
    """The round-7 rel_resample_linear_interp shape: a DuckDB
    TIMESTAMPTZ projection (to_timestamp(epoch)) vs Spark's tz-naive."""
    df = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-01 00:00:00' AS bucket_ts")
    msg = _gate_msg(
        spark, con, df, "SELECT to_timestamp(1704067200) AS bucket_ts"
    )
    assert "bucket_ts" in msg and "tstz" in msg


def test_gate_rejects_binary_output(spark, con):
    df = spark.sql("SELECT CAST('ab' AS BINARY) AS payload")
    msg = _gate_msg(
        spark, con, df, "SELECT encode('ab') AS payload"
    )
    assert "payload" in msg


_R7_FIXED = [
    "fn_array_suite",
    "fn_hof_suite",
    "fn_map_suite",
    "rel_array_agg_sorted",
    "rel_decimal_money_sums",
    "rel_q9_product_profit",
    "rel_q11_important_parts",
    "rel_resample_linear_interp",
]


@pytest.mark.parametrize("name", _R7_FIXED)
def test_r7_failures_now_pass_strict(spark, con, name):
    """All 8 round-7 driver reds must be green under the (now stricter)
    comparator — scalar-only schemas, decimals rendered as strings,
    no TIMESTAMPTZ anywhere."""
    df = QUERIES[name](spark, SF001)
    ok, msg = strict_compare(df, con, ORACLES[name])
    assert ok, msg


def test_streaming_comparator_matches_collect(spark):
    """strict_compare_streaming is the memory-bounded sibling of
    strict_compare: same verdicts on equal data, row-count mismatches,
    and value diffs (round-11, built for the 25M-200M-row replica
    outputs the collect comparator cannot hold)."""
    import duckdb

    from driver_hash import strict_compare_streaming

    con = duckdb.connect()
    df = spark.createDataFrame(
        [(1, 2.5, "x"), (2, -0.5, "y"), (3, 0.25, None)],
        "id bigint, v double, s string",
    )
    ok, msg = strict_compare_streaming(
        df, con,
        "SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(2.5 AS DOUBLE), 'x'),"
        " (CAST(2 AS BIGINT), CAST(-0.5 AS DOUBLE), 'y'),"
        " (CAST(3 AS BIGINT), CAST(0.25 AS DOUBLE), NULL)) t(id, v, s)")
    assert ok and "streamed" in msg, msg
    # one value bit differs -> red
    ok, msg = strict_compare_streaming(
        df, con,
        "SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(2.5 AS DOUBLE), 'x'),"
        " (CAST(2 AS BIGINT), CAST(-0.5 AS DOUBLE), 'y'),"
        " (CAST(3 AS BIGINT), CAST(0.75 AS DOUBLE), NULL)) t(id, v, s)")
    assert not ok and "value bits differ" in msg, msg
    # row-count mismatch in either direction -> red
    ok, msg = strict_compare_streaming(
        df, con,
        "SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(2.5 AS DOUBLE), 'x'),"
        " (CAST(2 AS BIGINT), CAST(-0.5 AS DOUBLE), 'y')) t(id, v, s)")
    assert not ok and "rows" in msg, msg


def test_streaming_comparator_normalizes_oracle_minus_zero_sort_key(spark):
    """VERDICT-r11 task 4: DuckDB computations can emit -0.0 (e.g.
    -1.0*0.0) and its ORDER BY puts -0.0 BEFORE 0.0, so an oracle row
    with a -0.0 sort key used to zip-misalign against the engine's
    (normalize_output-guarded) 0.0 twin and cascade spurious diffs.
    With the sort KEY normalized the rows align: equal-but-for-sign
    rows report exactly one diff at the right row, and an oracle whose
    VALUES are genuinely 0.0 still passes."""
    import duckdb

    from driver_hash import strict_compare_streaming

    con = duckdb.connect()
    # float column sorts FIRST (name order: a_v < b_id) so the sort
    # key, not a leading id, decides row order
    df = spark.createDataFrame(
        [(0.0, 1), (0.0, 2)], "a_v double, b_id bigint"
    )
    # aligned values, oracle emits computed -0.0 for b_id=2: the rows
    # must line up (key normalized) and the single sign diff report at
    # sorted row 1 — a true red, not a cascade from row 0
    ok, msg = strict_compare_streaming(
        df, con,
        "SELECT * FROM (VALUES (CAST(-1.0 AS DOUBLE)*CAST(0.0 AS DOUBLE),"
        " CAST(2 AS BIGINT)),"
        " (CAST(0.0 AS DOUBLE), CAST(1 AS BIGINT))) t(a_v, b_id)")
    assert not ok and "sorted row 1" in msg, msg
    # identical data (no -0.0): green, streamed
    ok, msg = strict_compare_streaming(
        df, con,
        "SELECT * FROM (VALUES (CAST(0.0 AS DOUBLE), CAST(2 AS BIGINT)),"
        " (CAST(0.0 AS DOUBLE), CAST(1 AS BIGINT))) t(a_v, b_id)")
    assert ok and "streamed" in msg, msg


def test_streaming_comparator_collation_agrees_on_supplementary_plane(spark):
    """ADVICE-r11 collation caveat, settled empirically: Spark's
    default UTF8_BINARY collation compares UTF-8 BYTES (code-point
    order), same as DuckDB's binary collation — NOT UTF-16 code units,
    under which U+10000 (surrogate pair D800 DC00) would sort before
    U+FFFF.  Equal well-formed text must therefore zip-align and pass,
    supplementary plane included."""
    import duckdb

    from driver_hash import strict_compare_streaming

    con = duckdb.connect()
    # U+FFFF vs U+10000: the pair whose order flips between UTF-8
    # byte collation and UTF-16 code-unit collation
    df = spark.createDataFrame(
        [("￿-bmp", 1), ("\U00010000-supp", 2), ("plain", 3)],
        "s string, id bigint",
    )
    sql = (
        "SELECT * FROM (VALUES ('￿-bmp', CAST(1 AS BIGINT)),"
        " (CAST('\U00010000-supp' AS VARCHAR), CAST(2 AS BIGINT)),"
        " ('plain', CAST(3 AS BIGINT))) t(s, id)"
    )
    ok, msg = strict_compare_streaming(df, con, sql)
    assert ok, msg
