"""Collector-side sources (S1-S3, S13, S14) against deterministic fakes.

The reference's collector is a 10-thread HTTP fan-out over ids.txt with
per-vehicle raw JSON archives (/root/reference/data_collector.py:36-79,
176-188); here the same surface is Spark task parallelism + a
partitioned bronze sink, verified with an injected fetcher.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from busdata_pipeline_spark.sources.census import (
    county_commute_summary,
    read_census_csv,
)
from busdata_pipeline_spark.sources.collector import (
    fetch_breadcrumbs,
    http_fetcher,
    read_vehicle_ids,
    write_bronze,
)

# ---------------------------------------------------------------------------
# S14 id-list + S1/S2 fan-out + S3 bronze


@pytest.fixture(scope="module")
def ids_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("ids") / "ids.txt"
    p.write_text("2909\n\n3003\n  \n3101\n")  # blanks dropped (collector:46)
    return str(p)


@pytest.fixture()
def fake_fetch():
    """Deterministic per-vehicle breadcrumb array (2 records; vehicle
    3003 fails -> empty, mirroring fetch-error skip).  Defined as a local
    closure so cloudpickle ships it by value to executors (the test
    module itself is not importable there)."""

    def fetch(vehicle_id: int) -> list[dict]:
        if vehicle_id == 3003:
            return []
        return [
            {
                "EVENT_NO_TRIP": vehicle_id * 10 + i,
                "EVENT_NO_STOP": 1,
                "OPD_DATE": "25DEC2022:00:00:00",
                "METERS": 100.0 * i,
                "ACT_TIME": 3600 + i,
                "GPS_LATITUDE": 45.5,
                "GPS_LONGITUDE": -122.6,
            }
            for i in range(2)
        ]

    return fetch


def test_read_vehicle_ids_strips_blanks(spark, ids_file):
    ids = read_vehicle_ids(spark, ids_file)
    assert [r.vehicle_id for r in ids.orderBy("vehicle_id").collect()] == [
        2909, 3003, 3101,
    ]


def test_fetch_fanout_schema_and_skip(spark, ids_file, fake_fetch):
    ids = read_vehicle_ids(spark, ids_file)
    got = fetch_breadcrumbs(ids, fake_fetch, parallelism=4)
    rows = got.orderBy("EVENT_NO_TRIP").collect()
    # 2 vehicles x 2 records; the failing vehicle contributes nothing
    assert [r.EVENT_NO_TRIP for r in rows] == [29090, 29091, 31010, 31011]
    assert rows[0].VEHICLE_ID == 2909 and rows[0].ACT_TIME == 3600
    assert got.schema["METERS"].dataType.typeName() == "double"


def test_http_fetcher_is_stubbed_offline():
    with pytest.raises(NotImplementedError):
        http_fetcher(2909)


def test_bronze_roundtrip_partitioned(spark, ids_file, fake_fetch, tmp_path):
    ids = read_vehicle_ids(spark, ids_file)
    df = fetch_breadcrumbs(ids, fake_fetch, parallelism=2)
    out = str(tmp_path / "bronze")
    write_bronze(df, out)
    back = spark.read.json(out)
    assert back.count() == 4
    # partition columns survive as prunable keys
    assert {"VEHICLE_ID", "opd_day"} <= set(back.columns)
    assert back.where(F.col("VEHICLE_ID") == 2909).count() == 2
    assert str(back.select("opd_day").distinct().collect()[0][0]) == "2022-12-25"


# ---------------------------------------------------------------------------
# S13 census CSV

_CENSUS_HEADER = (
    "TractId,State,County,TotalPop,Men,Women,Hispanic,White,Black,Native,"
    "Asian,Pacific,VotingAgeCitizen,Income,IncomeErr,IncomePerCap,"
    "IncomePerCapErr,Poverty,ChildPoverty,Professional,Service,Office,"
    "Construction,Production,Drive,Carpool,Transit,Walk,OtherTransp,"
    "WorkAtHome,MeanCommute,Employed,PrivateWork,PublicWork,SelfEmployed,"
    "FamilyWork,Unemployment"
)


def _row(tract, state, county, pop, commute, transit):
    vals = [""] * 37
    vals[0], vals[1], vals[2], vals[3] = str(tract), state, county, str(pop)
    vals[26], vals[30] = str(transit), str(commute)
    return ",".join(vals)


@pytest.fixture(scope="module")
def census_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("census") / "OR.csv"
    lines = [
        _CENSUS_HEADER,
        _row(41001950100, "Oregon", "Multnomah", 4000, 20.0, 10.0),
        _row(41001950200, "Oregon", "Multnomah", 6000, 30.0, 20.0),
        _row(41001950300, "Oregon", "Washington", 5000, 25.0, 5.0),
        _row(29149470100, "Missouri", "Oregon", 3000, 40.0, 0.0),
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_census_schema_and_filter(spark, census_file):
    df = read_census_csv(spark, census_file)
    assert df.count() == 4
    assert df.schema["TractId"].dataType.typeName() == "long"
    assert df.schema["MeanCommute"].dataType.typeName() == "double"
    assert df.where(F.col("State") == "Oregon").count() == 3


def test_census_weighted_aggregate(spark, census_file):
    df = read_census_csv(spark, census_file)
    out = {r.County: r for r in county_commute_summary(df, "Oregon").collect()}
    assert set(out) == {"Multnomah", "Washington"}
    # population-weighted: (20*4000 + 30*6000) / 10000 = 26.0
    assert out["Multnomah"].mean_commute == 26.0
    assert out["Multnomah"].transit_share == 16.0
    assert out["Washington"].population == 5000
