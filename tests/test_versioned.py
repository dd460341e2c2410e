"""Versioned table: commit log, time travel, overwrite boundary, and
manifest-last atomicity."""

from __future__ import annotations

import os

import pytest

from busdata_pipeline_spark.operators.versioned import (
    read_version,
    table_history,
    write_version,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "tbl")

    def df(vals):
        return spark.createDataFrame([(v,) for v in vals], "x long")

    write_version(df([1, 2]), path, "append")        # v1
    write_version(df([3]), path, "append")           # v2
    write_version(df([10, 11]), path, "overwrite")   # v3
    write_version(df([12]), path, "append")          # v4
    return path


def _xs(spark, path, v=None):
    return sorted(r.x for r in read_version(spark, path, v).collect())


def test_snapshots_reconstruct_every_version(spark, tbl):
    assert _xs(spark, tbl, 1) == [1, 2]
    assert _xs(spark, tbl, 2) == [1, 2, 3]
    assert _xs(spark, tbl, 3) == [10, 11]      # overwrite erases history
    assert _xs(spark, tbl, 4) == [10, 11, 12]
    assert _xs(spark, tbl) == [10, 11, 12]     # latest


def test_history_records_modes_in_order(tbl):
    hist = table_history(tbl)
    assert [c["version"] for c in hist] == [1, 2, 3, 4]
    assert [c["mode"] for c in hist] == \
        ["append", "append", "overwrite", "append"]


def test_unmanifested_data_is_invisible(spark, tbl):
    """Data dir present but manifest missing = commit never happened."""
    os.rename(os.path.join(tbl, "_log", "4.json"),
              os.path.join(tbl, "_log_removed"))
    assert _xs(spark, tbl) == [10, 11]
    os.rename(os.path.join(tbl, "_log_removed"),
              os.path.join(tbl, "_log", "4.json"))
    assert _xs(spark, tbl) == [10, 11, 12]


def test_read_before_first_commit_raises(spark, tbl):
    with pytest.raises(ValueError):
        read_version(spark, tbl, 0)


def test_vacuum_removes_only_unreachable_versions(spark, tbl):
    from busdata_pipeline_spark.operators.versioned import vacuum_versions

    assert vacuum_versions(tbl) == [1, 2]   # pre-overwrite dirs
    # latest snapshot still fully readable
    assert _xs(spark, tbl) == [10, 11, 12]
    assert _xs(spark, tbl, 3) == [10, 11]
    # pre-overwrite time travel is gone (retention window passed)
    with pytest.raises(Exception):
        _xs(spark, tbl, 2)
    # idempotent
    assert vacuum_versions(tbl) == []


# ---------------------------------------------------------------------------
# cross-table transactions


def test_txn_hides_torn_cross_table_write(spark, tmp_path):
    from busdata_pipeline_spark.operators.versioned import (
        txn_commit,
        txn_read,
        write_version,
    )

    root = str(tmp_path / "txnroot")
    a, b = f"{root}/a", f"{root}/b"
    d1 = spark.range(5).withColumnRenamed("id", "k")
    d2 = spark.range(5, 9).withColumnRenamed("id", "k")
    va1 = write_version(d1, a, "append")
    vb1 = write_version(d1, b, "append")
    txn_commit(root, {"a": va1, "b": vb1})

    # both tables commit v2 at TABLE level; txn manifest missing
    write_version(d2, a, "append")
    write_version(d2, b, "append")
    snap = txn_read(spark, root, {"a": a, "b": b})
    assert snap["a"].count() == 5 and snap["b"].count() == 5


def test_txn_as_of_reads(spark, tmp_path):
    from busdata_pipeline_spark.operators.versioned import (
        txn_commit,
        txn_read,
        write_version,
    )

    root = str(tmp_path / "txnroot2")
    a, b = f"{root}/a", f"{root}/b"
    va1 = write_version(spark.range(3), a, "append")
    vb1 = write_version(spark.range(4), b, "append")
    txn_commit(root, {"a": va1, "b": vb1})
    va2 = write_version(spark.range(10, 13), a, "append")
    txn_commit(root, {"a": va2, "b": vb1})

    old = txn_read(spark, root, {"a": a, "b": b}, txn=1)
    new = txn_read(spark, root, {"a": a, "b": b})
    assert old["a"].count() == 3 and new["a"].count() == 6
    assert old["b"].count() == 4 and new["b"].count() == 4
