"""Versioned table: commit log, time travel, overwrite boundary, and
manifest-last atomicity."""

from __future__ import annotations

import datetime
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


# ---------------------------------------------------------------------------
# replace (partition-scoped) commits: atomic retraction/erasure


@pytest.fixture()
def ptbl(spark, tmp_path):
    """user/day/value table committed as v1, then day-2 replaced (one
    row retracted, one updated) as v2."""
    from busdata_pipeline_spark.operators.versioned import (
        write_replace_partitions,
    )

    path = str(tmp_path / "ptbl")
    rows = [(1, "d1", 10.0), (2, "d1", 20.0), (1, "d2", 30.0),
            (3, "d2", 40.0), (3, "d3", 50.0)]
    df = spark.createDataFrame(rows, "user_id long, day string, value double")
    write_version(df, path, "overwrite")                       # v1
    new_d2 = spark.createDataFrame([(3, "d2", 41.0)],
                                   "user_id long, day string, value double")
    write_replace_partitions(new_d2, path, "day", ["d2"])      # v2
    return path


def _rows(spark, path, v=None):
    return sorted(map(tuple, read_version(spark, path, v)
                      .select("user_id", "day", "value").collect()))


def test_replace_commit_masks_earlier_partitions(spark, ptbl):
    assert _rows(spark, ptbl) == [
        (1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 41.0), (3, "d3", 50.0),
    ]


def test_time_travel_across_replace(spark, ptbl):
    # pre-replace snapshot intact: the replace never mutated v1's files
    assert _rows(spark, ptbl, v=1) == [
        (1, "d1", 10.0), (1, "d2", 30.0), (2, "d1", 20.0),
        (3, "d2", 40.0), (3, "d3", 50.0),
    ]


def test_replace_to_zero_rows_deletes_partition(spark, ptbl):
    from busdata_pipeline_spark.operators.versioned import (
        write_replace_partitions,
    )

    empty = read_version(spark, ptbl).limit(0)
    write_replace_partitions(empty, ptbl, "day", ["d1"])       # v3
    assert _rows(spark, ptbl) == [(3, "d2", 41.0), (3, "d3", 50.0)]
    # and the table remains readable/time-travelable
    assert len(_rows(spark, ptbl, v=2)) == 4


def test_unmanifested_replace_is_invisible(spark, ptbl):
    """Crash between data write and manifest rename: the data dir
    exists but no snapshot includes it (manifest-last atomicity)."""
    import shutil

    before = _rows(spark, ptbl)
    # simulate the torn state: copy v2's dir layout as an orphan _v9
    shutil.copytree(os.path.join(ptbl, "_v2"), os.path.join(ptbl, "_v9"))
    assert _rows(spark, ptbl) == before


def test_vacuum_replaced_purges_history_bytes(spark, ptbl):
    from busdata_pipeline_spark.operators.versioned import vacuum_replaced

    got = vacuum_replaced(spark, ptbl)
    assert got == {"dirs_rewritten": 1, "rows_purged": 2}
    # current snapshot unchanged
    assert _rows(spark, ptbl) == [
        (1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 41.0), (3, "d3", 50.0),
    ]
    # history no longer resurrects the purged (d2) rows; v1's other
    # partitions are untouched
    assert _rows(spark, ptbl, v=1) == [
        (1, "d1", 10.0), (2, "d1", 20.0), (3, "d3", 50.0),
    ]
    # idempotent
    assert vacuum_replaced(spark, ptbl)["rows_purged"] == 0


def test_merge_rollup_retract_versioned_matches_inplace(spark, tmp_path):
    """The versioned retraction merge must produce exactly the in-place
    variant's state, with the pre-retraction snapshot time-travelable."""
    from busdata_pipeline_spark.operators.rollup import (
        merge_rollup_retract,
        merge_rollup_retract_versioned,
        read_rollup,
        read_rollup_versioned,
    )

    def partials(rows):
        return spark.createDataFrame(rows, "user_id long, dn long, dc long")

    base = partials([(1, 3, 300), (2, 2, 200), (3, 1, 50)])
    delta = partials([(1, -3, -300), (2, 1, 999), (4, 2, 20)])

    p_old = str(tmp_path / "inplace")
    merge_rollup_retract(spark, base, p_old)
    merge_rollup_retract(spark, delta, p_old)
    want = sorted(map(tuple, read_rollup(spark, p_old)
                      .select("user_id", "dn", "dc").collect()))

    p_new = str(tmp_path / "versioned")
    merge_rollup_retract_versioned(spark, base, p_new)
    v = merge_rollup_retract_versioned(spark, delta, p_new)
    got = sorted(map(tuple, read_rollup_versioned(spark, p_new)
                     .select("user_id", "dn", "dc").collect()))
    assert got == want
    assert (1, 3, 300) not in got  # user 1 fully retracted
    # pre-retraction state still readable at v-1
    pre = sorted(map(tuple, read_rollup_versioned(spark, p_new, v - 1)
                     .select("user_id", "dn", "dc").collect()))
    assert pre == sorted([(1, 3, 300), (2, 2, 200), (3, 1, 50)])


def test_erase_subject_versioned_atomic_and_purged(spark, tmp_path):
    import datetime

    from busdata_pipeline_spark.operators.versioned import write_version
    from busdata_pipeline_spark.operators.warehouse import (
        erase_subject_versioned,
    )

    d = datetime.date
    rows = [
        (7, d(2024, 1, 1), 1.0), (8, d(2024, 1, 1), 2.0),
        (7, d(2024, 1, 2), 3.0),                     # day 2 is 7-only
        (9, d(2024, 1, 3), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_date date, value double")
    path = str(tmp_path / "vfact")
    # partition-laid-out initial load -> the purge pass deletes masked
    # day subdirectories instead of rewriting the commit
    write_version(df, path, "overwrite", partition_col="event_date")

    import glob

    def day3_files():
        return {
            f: os.path.getsize(f)
            for f in glob.glob(os.path.join(
                path, "_v1", "event_date=2024-01-03", "*.parquet"))
        }

    before = day3_files()
    audit = erase_subject_versioned(spark, path, "user_id", 7)
    # untouched day's files byte-identical: commit + purge never read
    # or rewrote them (the bounded-erasure contract)
    assert day3_files() == before and before
    assert audit["days_rewritten"] == 2
    assert audit["rows_removed"] == 2
    # purge drops every v1 row of the two replaced days (subject rows
    # AND the survivor copies that now live in the replace commit)
    assert audit["rows_purged"] == 3

    got = sorted(map(tuple, read_version(spark, path)
                     .select("user_id", "event_date", "value").collect()))
    assert got == [(8, d(2024, 1, 1), 2.0), (9, d(2024, 1, 3), 4.0)]
    # history physically purged: v1 read shows no subject rows either
    v1 = read_version(spark, path, 1)
    assert v1.where(v1.user_id == 7).count() == 0
    # erasing an absent subject is a no-op
    again = erase_subject_versioned(spark, path, "user_id", 7)
    assert again["days_rewritten"] == 0 and again["rows_removed"] == 0


# ---------------------------------------------------------------------------
# round-8 ADVICE regressions: vacuum on a fully-masked commit, empty
# partitioned first commits, and Spark-canonical mask value rendering.


def test_vacuum_replaced_survives_fully_masked_commit(spark, tmp_path):
    """When a later replace supersedes EVERY partition of a commit,
    vacuum must leave a schema marker captured BEFORE the delete — the
    old read_version fallback read the just-emptied dir and crashed
    with UNABLE_TO_INFER_SCHEMA, leaving the whole table unreadable."""
    from busdata_pipeline_spark.operators.versioned import (
        vacuum_replaced,
        write_replace_partitions,
    )

    path = str(tmp_path / "full_mask")
    df = spark.createDataFrame(
        [(1, "d1", 1.0), (2, "d2", 2.0)],
        "user_id long, day string, value double",
    )
    write_version(df, path, "overwrite", partition_col="day")   # v1
    repl = spark.createDataFrame(
        [(9, "d1", 9.0), (9, "d2", 9.9)],
        "user_id long, day string, value double",
    )
    write_replace_partitions(repl, path, "day", ["d1", "d2"])   # v2

    got = vacuum_replaced(spark, path)
    assert got["rows_purged"] == 2
    # the table is still fully readable, at latest AND at v1 (whose
    # rows are all purged — snapshot is empty, not broken)
    assert _rows(spark, path) == [(9, "d1", 9.0), (9, "d2", 9.9)]
    assert _rows(spark, path, v=1) == []
    # idempotent
    assert vacuum_replaced(spark, path)["rows_purged"] == 0
    assert _rows(spark, path) == [(9, "d1", 9.0), (9, "d2", 9.9)]


def test_write_version_partitioned_empty_df_stays_readable(spark, tmp_path):
    """A zero-row partitioned commit emits no parquet file; the schema
    marker must make later snapshot reads work instead of failing with
    UNABLE_TO_INFER_SCHEMA (merge_rollup_retract_versioned's
    first-commit delta can be exactly this shape)."""
    path = str(tmp_path / "empty_part")
    df = spark.createDataFrame([], "user_id long, day string, value double")
    write_version(df, path, "overwrite", partition_col="day")
    assert read_version(spark, path).count() == 0
    # and a follow-up append still unions cleanly with the marker
    more = spark.createDataFrame([(1, "d1", 1.0)],
                                 "user_id long, day string, value double")
    write_version(more, path, "append", partition_col="day")
    assert _rows(spark, path) == [(1, "d1", 1.0)]


def test_replace_mask_values_use_spark_string_rendering(spark, tmp_path):
    """Mask values render via Spark's cast-to-string, not Python str():
    a boolean partition written by Python True must still be masked
    (str(True)='True' vs Spark 'true' silently resurrected rows)."""
    from busdata_pipeline_spark.operators.versioned import (
        write_replace_partitions,
    )

    path = str(tmp_path / "booltbl")
    df = spark.createDataFrame(
        [(1, True, 1.0), (2, False, 2.0)],
        "user_id long, flagged boolean, value double",
    )
    write_version(df, path, "overwrite", partition_col="flagged")  # v1
    repl = spark.createDataFrame(
        [(9, True, 9.0)], "user_id long, flagged boolean, value double",
    )
    write_replace_partitions(repl, path, "flagged", [True])        # v2
    rows = sorted(map(tuple, read_version(spark, path)
                      .select("user_id", "flagged", "value").collect()))
    assert rows == [(2, False, 2.0), (9, True, 9.0)]
    # vacuum also finds the flagged=true subdir via the canonical string
    from busdata_pipeline_spark.operators.versioned import vacuum_replaced

    assert vacuum_replaced(spark, path)["rows_purged"] == 1
    rows = sorted(map(tuple, read_version(spark, path)
                      .select("user_id", "flagged", "value").collect()))
    assert rows == [(2, False, 2.0), (9, True, 9.0)]


def test_vacuum_recovers_from_crash_between_swap_renames(spark, tmp_path):
    """Simulate a crash window of the fully-masked swap: commit dir
    renamed to .purged but the marker not yet swapped in.  The next
    vacuum run must restore and complete instead of skipping the
    missing dir (which left the table unreadable and the masked bytes
    on disk)."""
    import shutil

    from busdata_pipeline_spark.operators.versioned import (
        vacuum_replaced,
        write_replace_partitions,
    )

    path = str(tmp_path / "crashy")
    df = spark.createDataFrame(
        [(1, "d1", 1.0), (2, "d2", 2.0)],
        "user_id long, day string, value double",
    )
    write_version(df, path, "overwrite", partition_col="day")      # v1
    repl = spark.createDataFrame(
        [(9, "d1", 9.0), (9, "d2", 9.9)],
        "user_id long, day string, value double",
    )
    write_replace_partitions(repl, path, "day", ["d1", "d2"])      # v2
    # crash simulation: rename v1 -> v1.purged (first swap rename done,
    # second never happened)
    v1 = os.path.join(path, "_v1")
    os.rename(v1, v1 + ".purged")
    got = vacuum_replaced(spark, path)
    assert got["rows_purged"] == 2
    assert not os.path.isdir(v1 + ".purged")
    assert _rows(spark, path) == [(9, "d1", 9.0), (9, "d2", 9.9)]
    assert _rows(spark, path, v=1) == []


def test_vacuum_finishes_interrupted_final_delete(spark, tmp_path):
    """Crash after the swap landed but before rmtree(.purged): the next
    run must delete the leftover (it still holds the masked bytes — an
    erasure must not leave them)."""
    import shutil

    from busdata_pipeline_spark.operators.versioned import (
        vacuum_replaced,
        write_replace_partitions,
    )

    path = str(tmp_path / "leftover")
    df = spark.createDataFrame(
        [(1, "d1", 1.0)], "user_id long, day string, value double",
    )
    write_version(df, path, "overwrite", partition_col="day")      # v1
    repl = spark.createDataFrame(
        [(9, "d1", 9.0)], "user_id long, day string, value double",
    )
    write_replace_partitions(repl, path, "day", ["d1"])            # v2
    vacuum_replaced(spark, path)
    # crash simulation: resurrect a .purged leftover beside the live dir
    v1 = os.path.join(path, "_v1")
    shutil.copytree(v1, v1 + ".purged")
    vacuum_replaced(spark, path)
    assert not os.path.isdir(v1 + ".purged")
    assert _rows(spark, path) == [(9, "d1", 9.0)]


def test_replace_value_not_renderable_raises(spark, tmp_path):
    """A mask value the partition column's type cannot represent must
    refuse the commit (a JSON-null manifest entry would poison every
    later read with None/str sort comparisons)."""
    from busdata_pipeline_spark.operators.versioned import (
        write_replace_partitions,
    )

    path = str(tmp_path / "badval")
    df = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1), 1.0)],
        "user_id long, day date, value double",
    )
    write_version(df, path, "overwrite", partition_col="day")
    # ANSI sessions fail the cast itself; non-ANSI sessions hit the
    # helper's None guard — either way the commit is refused loudly
    # BEFORE any data or manifest lands
    with pytest.raises(Exception,
                       match="do not render|cannot be cast|CAST_INVALID"):
        write_replace_partitions(df.limit(0), path, "day",
                                 ["definitely-not-a-date"])
    assert len(table_history(path)) == 1  # no torn replace commit
