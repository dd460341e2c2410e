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
