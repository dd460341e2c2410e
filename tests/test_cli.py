"""CLI entry points (python -m busdata_pipeline_spark …) — the
switch-over surface for a user of the reference's three executables.
Runs main() in-process against the session-scoped Spark fixture."""

from __future__ import annotations

import pytest

from busdata_pipeline_spark.__main__ import main
from busdata_pipeline_spark.sources.jsonl import read_breadcrumb_jsonl
from tests.test_breadcrumb_etl import fixture_lines


@pytest.fixture()
def ids_file(tmp_path):
    p = tmp_path / "ids.txt"
    p.write_text("2909\n3101\n")
    return str(p)


def test_cli_collect_fake_fetch(spark, ids_file, tmp_path):
    out = str(tmp_path / "bronze")
    rc = main(["collect", "--ids", ids_file, "--out", out,
               "--parallelism", "2", "--fake-fetch"])
    assert rc == 0
    got = spark.read.json(out)
    assert got.count() == 6  # 2 vehicles x 3 deterministic crumbs
    assert set(r.VEHICLE_ID for r in got.select("VEHICLE_ID").distinct().collect()) == {2909, 3101}


def test_cli_transform_and_audit(tmp_path, spark, capsys):
    day = tmp_path / "day.jsonl"
    day.write_text("\n".join(fixture_lines()) + "\n")
    wh = str(tmp_path / "wh")
    rc = main(["transform", "--in", str(day), "--warehouse", wh,
               "--date", "2023-01-01"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "2023-01-01:" in out and "transformed" in out
    # the CLI load equals the library load
    n_lib = read_breadcrumb_jsonl(spark, str(day)).count()
    assert n_lib > 0


def test_cli_query_runs_and_rejects_unknown(capsys):
    rc = main(["query", "bus_q1_count_day1", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    assert "bus_q1_count_day1" in capsys.readouterr().out
    assert main(["query", "no_such_query"]) == 2


def test_cli_list_names_everything(capsys):
    import __spark_entry__ as entry

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) == len(entry.queries())


def test_cli_check_gate_passes_and_fails(spark, tmp_path):
    clean = str(tmp_path / "clean")
    dirty = str(tmp_path / "dirty")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string") \
        .write.parquet(clean)
    spark.createDataFrame([(1, "a"), (1, None)], "id long, name string") \
        .write.parquet(dirty)
    assert main(["check", "--path", clean,
                 "--not-null", "name", "--unique", "id"]) == 0
    assert main(["check", "--path", dirty,
                 "--not-null", "name", "--unique", "id"]) == 1
    assert main(["check", "--path", clean, "--not-null", "nope"]) == 2
