"""Round-3 driver regression: naive parquet timestamps read as
TIMESTAMP_NTZ and the bare "timestamp" type name resolving to NTZ
(spark.sql.timestampType=TIMESTAMP_NTZ) broke every epoch-arithmetic
query with DATATYPE_MISMATCH "cannot cast TIMESTAMP_NTZ to DOUBLE"
(CORRECTNESS_r03: bus_q8_longest_trip, etl_w2_lag_rate,
etl_w3_lead_backfill; BENCH_r03 rc=1).

Two defense layers, each tested here:
1. session.apply_session_conf pins inferTimestampNTZ=false +
   timestampType=TIMESTAMP_LTZ on whatever session runs a query.
2. Even if the pin is unavailable (a foreign pyspark where those confs
   are static or gone), sources.tables folds NTZ columns to
   timestamp_ltz explicitly and functions.core.epoch_seconds casts
   through "timestamp_ltz", never the resolvable "timestamp" alias.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from busdata_pipeline_spark import session as sess
from busdata_pipeline_spark.sources import table

SF = "/root/testdata/sf0.001"

# The three queries the round-3 driver flagged, plus one window twin.
AFFECTED = ["bus_q8_longest_trip", "etl_w2_lag_rate", "etl_w3_lead_backfill"]

HOSTILE = {
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.timestampType": "TIMESTAMP_NTZ",
}


@pytest.fixture()
def hostile(spark):
    saved = {k: spark.conf.get(k) for k in HOSTILE}
    for k, v in HOSTILE.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


def _expected(spark, name):
    sess.apply_session_conf(spark)
    return entry.queries()[name](spark, SF).collect()


def test_ntz_read_is_folded_to_ltz(hostile):
    # Under the hostile conf a raw read yields NTZ; the loader must not.
    raw = hostile.read.parquet(f"{SF}/events.parquet")
    assert raw.schema["ts"].dataType.typeName() == "timestamp_ntz"
    loaded = table(hostile, SF, "events")
    assert loaded.schema["ts"].dataType.typeName() == "timestamp"


@pytest.mark.parametrize("name", AFFECTED)
def test_affected_queries_survive_hostile_session(hostile, name):
    expected = _expected(hostile, name)
    # re-hostilize: the expected run re-pinned the conf.
    for k, v in HOSTILE.items():
        hostile.conf.set(k, v)
    got = entry.queries()[name](hostile, SF).collect()
    assert got == expected


@pytest.mark.parametrize("name", AFFECTED)
def test_affected_queries_survive_without_conf_pinning(
    hostile, name, monkeypatch
):
    """Layer 2 alone: conf pinning disabled entirely (as if the driver's
    pyspark rejected the pins), only the explicit timestamp_ltz casts
    stand between NTZ inputs and the epoch arithmetic."""
    expected = _expected(hostile, name)
    for k, v in HOSTILE.items():
        hostile.conf.set(k, v)
    # Keep only the timezone pin (always runtime-settable on any Spark);
    # drop the two type-semantics pins the round-3 driver ignored.
    real_set = hostile.conf.set

    def crippled_set(key, value):
        if key in ("spark.sql.parquet.inferTimestampNTZ.enabled",
                   "spark.sql.timestampType"):
            return None
        return real_set(key, value)

    monkeypatch.setattr(hostile.conf, "set", crippled_set)
    got = entry.queries()[name](hostile, SF).collect()
    assert got == expected
