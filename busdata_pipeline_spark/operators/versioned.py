"""Minimal versioned table with time travel — the lakehouse commit-log
discipline (Delta/Iceberg shape) on plain parquet.

The reference's warehouse mutates in place (delete-then-reload a day,
/root/reference/transform.py:62-83), so "what did the table say
yesterday" is unanswerable there.  Here every write is an immutable
commit:

- data lands in a fresh ``_v{n}/`` directory (never rewritten),
- a one-line JSON manifest ``_log/{n}.json`` records (version, mode) and
  is the COMMIT POINT — written via temp-file + atomic rename, so a
  reader either sees the whole commit or none of it,
- a snapshot at version v = the latest ``overwrite`` ≤ v plus every
  ``append`` after it, reconstructed as a union of parquet scans.

Scale posture: the log is O(commits) tiny JSON files (a real deployment
checkpoints it, same as Delta); data files are normal distributed
parquet writes; snapshot reads are unions of pruned scans, and old
versions stay readable until a retention vacuum deletes their dirs.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def _commits(path: str) -> list[dict]:
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d), key=lambda s: int(s.split(".")[0])):
        with open(os.path.join(d, f)) as fh:
            out.append(json.load(fh))
    return out


def _commit(path: str, mode: str, extra: dict | None = None) -> int:
    os.makedirs(_log_dir(path), exist_ok=True)
    version = len(_commits(path)) + 1
    entry = {"version": version, "mode": mode, "dir": f"_v{version}"}
    if extra:
        entry.update(extra)
    fd, tmp = tempfile.mkstemp(dir=_log_dir(path))
    with os.fdopen(fd, "w") as fh:
        json.dump(entry, fh)
    os.rename(tmp, os.path.join(_log_dir(path), f"{version}.json"))
    return version


def _write_schema_marker_if_empty(df: DataFrame, target: str) -> None:
    """A partitioned write of a zero-row frame emits no parquet file at
    all (only _SUCCESS), which would make every later snapshot read
    fail with UNABLE_TO_INFER_SCHEMA — land ``df``'s schema as a single
    UNpartitioned empty file (partition dirs plus root files is a
    layout parquet discovery rejects, so the marker carries the
    partition column in-file)."""
    import glob

    if not glob.glob(os.path.join(target, "**", "*.parquet"),
                     recursive=True):
        df.limit(0).repartition(1).write.mode("overwrite").parquet(target)


def write_version(df: DataFrame, path: str, mode: str = "append",
                  partition_col: str | None = None) -> int:
    """Commit ``df`` as the next version (mode: append | overwrite).
    Data first, manifest last — the rename IS the commit.

    With ``partition_col`` the commit directory is laid out as
    ``<pcol>=<value>`` subdirectories (recorded in the manifest with
    the column's type) — required for later ``replace`` commits to be
    maskable by directory pruning and for ``vacuum_replaced`` to purge
    by subdirectory delete instead of rewriting the commit."""
    assert mode in ("append", "overwrite")
    version = len(_commits(path)) + 1
    target = os.path.join(path, f"_v{version}")
    extra = None
    if partition_col is not None:
        ptype = df.schema[partition_col].dataType.simpleString()
        df.write.mode("overwrite").partitionBy(partition_col).parquet(target)
        # reachable e.g. via merge_rollup_retract_versioned's
        # first-commit delta, which can legitimately be empty
        _write_schema_marker_if_empty(df, target)
        extra = {"partition_col": partition_col, "pcol_type": ptype}
    else:
        df.write.mode("overwrite").parquet(target)
    return _commit(path, mode, extra)


def _mask_value_strings(df: DataFrame, partition_col: str,
                        values: list) -> list[str]:
    """Render mask values through Spark's OWN cast-to-string for the
    partition column's type, so manifest strings always equal what
    ``F.col(pcol).cast('string')`` produces at snapshot-mask time.
    Python ``str()`` diverges for several types (bool: 'True' vs
    Spark's 'true'; some float/decimal/timestamp renderings) — a
    diverged manifest string would silently fail to mask, resurrecting
    supposedly replaced/erased rows.  One 1-row driver job over the
    bounded value list."""
    from pyspark.sql import functions as F

    if not values:
        return []
    ptype = df.schema[partition_col].dataType
    row = (
        df.sparkSession.range(1)
        .select(*[
            F.lit(v).cast(ptype).cast("string").alias(f"c{i}")
            for i, v in enumerate(values)
        ])
        .first()
    )
    out = [row[i] for i in range(len(values))]
    bad = [values[i] for i, s in enumerate(out) if s is None]
    if bad:
        # a value the column's type cannot represent would land as JSON
        # null in the manifest and poison every later sorted(masked)
        # with a None/str comparison — refuse the commit instead
        raise ValueError(
            f"replace value(s) {bad!r} do not render under "
            f"{partition_col}'s type {ptype.simpleString()}")
    return out


def write_replace_partitions(df: DataFrame, path: str, partition_col: str,
                             values: list) -> int:
    """Partition-scoped atomic commit (the Delta ``replaceWhere``
    shape): the new data directory carries the FULL new content of the
    listed ``partition_col`` values — possibly zero rows, when every
    row of those partitions was retracted/erased — and the manifest
    records the replaced values.  Snapshot readers drop those values
    from every EARLIER commit, so the replace is all-or-nothing at the
    manifest rename: no in-place deletes, no rmtree, no torn state on
    object stores, and the pre-replace snapshot stays time-travelable.

    Cost contract: the commit writes only the replaced partitions'
    rows (delta-bounded), laid out as ``<pcol>=<value>`` directories so
    (a) snapshot masks prune earlier commits by DIRECTORY, and (b)
    ``vacuum_replaced`` purges history by subdirectory delete with no
    data rewrite.  A periodic full-overwrite compaction bounds the
    commit chain length."""
    from pyspark.sql import functions as F

    version = len(_commits(path)) + 1
    ptype = df.schema[partition_col].dataType.simpleString()
    # render the manifest strings FIRST: an unrepresentable value fails
    # here — loudly, before any data lands (ANSI cast error or the
    # helper's None check under non-ANSI), never as a torn commit
    mask_strings = _mask_value_strings(df, partition_col, list(values))
    out = df.where(F.col(partition_col).isin(list(values)))
    target = os.path.join(path, f"_v{version}")
    out.write.mode("overwrite").partitionBy(partition_col).parquet(target)
    # an all-retracted replace still needs a schema-carrying file so
    # snapshot reads (a union over commit dirs) keep working
    _write_schema_marker_if_empty(df, target)
    return _commit(path, "replace",
                   {"partition_col": partition_col,
                    "pcol_type": ptype,
                    "values": mask_strings})


def _replaced_after(commits: list[dict], i: int) -> tuple[str | None, set]:
    """Partition values replaced by commits AFTER index ``i`` (and the
    partition column they key on — one per table by construction)."""
    col = None
    vals: set = set()
    for c in commits[i + 1:]:
        if c["mode"] == "replace":
            col = c["partition_col"]
            vals.update(c["values"])
    return col, vals


def read_version(spark: SparkSession, path: str,
                 version: int | None = None) -> DataFrame:
    """Snapshot as of ``version`` (default: latest).  ``replace``
    commits mask their partition values in every earlier commit."""
    from pyspark.sql import functions as F

    commits = _commits(path)
    if version is not None:
        commits = [c for c in commits if c["version"] <= version]
    if not commits:
        raise ValueError(f"no commits at or before version {version}")
    start = 0
    for i, c in enumerate(commits):
        if c["mode"] == "overwrite":
            start = i
    live = commits[start:]
    frames = []
    for i, c in enumerate(live):
        d = os.path.join(path, c["dir"])
        if not os.path.isdir(d):
            raise ValueError(
                f"version {c['version']} was vacuumed; snapshot "
                f"unavailable")
        df = spark.read.parquet(d)
        # partitioned commit dirs re-infer the partition column's type
        # from directory names (e.g. long buckets come back int) — pin
        # it back to the manifest-recorded type so commit frames union
        # losslessly with unpartitioned markers / non-replace commits
        if c.get("pcol_type") and c["partition_col"] in df.columns:
            df = df.withColumn(
                c["partition_col"],
                F.col(c["partition_col"]).cast(c["pcol_type"]),
            )
        col, masked = _replaced_after(live, i)
        if masked:
            # compare in string space (manifest values are JSON
            # strings; Spark's date/long->string casts match str());
            # NULL partition values are never replace targets, so a
            # null row must survive the mask, not vanish under the
            # three-valued ~isin
            df = df.where(
                F.col(col).isNull()
                | ~F.col(col).cast("string").isin(sorted(masked))
            )
        frames.append(df)
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df)
    return out


def table_history(path: str) -> list[dict]:
    return _commits(path)


def vacuum_versions(path: str) -> list[int]:
    """Retention: delete data directories unreachable from the LATEST
    snapshot (everything before the last overwrite).  The log entries
    stay — history remains auditable, but time travel before the
    overwrite now raises at read (the same contract as Delta VACUUM
    beyond the retention window).  Returns the vacuumed versions."""
    import shutil

    commits = _commits(path)
    start = 0
    for i, c in enumerate(commits):
        if c["mode"] == "overwrite":
            start = i
    gone = []
    for c in commits[:start]:
        d = os.path.join(path, c["dir"])
        if os.path.isdir(d):
            shutil.rmtree(d)
            gone.append(c["version"])
    return gone


#: Spark simpleString -> pyarrow type, for rebuilding a partition
#: column in the footer-derived vacuum marker below.  Types outside
#: this map fall back to the (slower) Spark read path.
_PA_PARTITION_TYPES = {
    "string": "string",
    "bigint": "int64",
    "int": "int32",
    "smallint": "int16",
    "tinyint": "int8",
    "double": "float64",
    "float": "float32",
    "boolean": "bool_",
    "date": "date32",
}


def _footer_row_count(parquet_files: list[str]) -> int:
    """Sum row counts from parquet FOOTERS — the erasure audit needs
    the doomed-row count, and the footer already holds it; a Spark
    count() job here re-reads data the pass is about to delete (the
    round-8 etl_gdpr_erasure regression)."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in parquet_files)


def _write_footer_marker(d: str, doomed_files: list[str], col: str,
                         ptype_name: str | None) -> bool:
    """Build the empty schema-marker dir ``d + '.marker'`` straight
    from a doomed file's parquet footer (+ the manifest-recorded
    partition column), with no Spark job.  Returns False when the
    partition type isn't in the footer map — caller falls back to the
    Spark read path."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    pa_name = _PA_PARTITION_TYPES.get(ptype_name or "")
    if pa_name is None or not doomed_files:
        return False
    # drop the Spark-written schema metadata
    # (org.apache.spark.sql.parquet.row.metadata): it lists only the
    # IN-FILE columns, survives pq.write_table, and Spark trusts it
    # over the physical footer — the appended partition column would
    # silently vanish on read.  Unify across ALL doomed footers: a
    # commit dir with per-file schema drift (column added mid-commit)
    # must not write a marker narrowed to the first file's columns.
    footer_schemas = [pq.ParquetFile(p).schema_arrow.remove_metadata()
                      for p in doomed_files]
    try:
        schema = pa.unify_schemas(footer_schemas)
    except pa.ArrowInvalid:
        # irreconcilable footers (same column, conflicting types):
        # fall back to the Spark limit(0) path, which resolves the
        # merged schema the same way reads do
        return False
    if col not in schema.names:
        # partition-laid-out files never carry the partition column
        # in-file; Spark appends it LAST on read — match that order
        schema = schema.append(pa.field(col, getattr(pa, pa_name)()))
    marker_tmp = d + ".marker"
    shutil.rmtree(marker_tmp, ignore_errors=True)
    os.makedirs(marker_tmp)
    pq.write_table(schema.empty_table(),
                   os.path.join(marker_tmp, "part-00000.parquet"))
    return True


def vacuum_replaced(spark: SparkSession, path: str) -> dict:
    """Physically purge masked rows from history — the retention pass
    that completes an erasure.  For every commit directory holding
    partition values a later ``replace`` commit superseded:

    - partition-laid-out commits (the normal case — commits written
      with ``partition_col``): DELETE the masked ``<pcol>=<value>``
      subdirectories.  Masking is whole-partition by construction, so
      the delete is exact and touches no other bytes — cost scales
      with the masked partitions, never the commit;
    - unpartitioned commits (legacy/marker dirs): rewrite the
      directory without the masked rows (write-aside then swap).

    Correctness posture: the manifest mask already hides these rows
    from every snapshot ≥ the replace commit, so this pass changes no
    current query result — it only removes bytes.  Time travel to a
    pre-replace version afterwards reflects the purge (the GDPR
    contract: history must not resurrect the subject).  Deletes/swaps
    here are maintenance, not commit points; run like Delta VACUUM.
    Returns {dirs_rewritten, rows_purged}."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    commits = _commits(path)
    dirs_rewritten = 0
    rows_purged = 0
    for i, c in enumerate(commits):
        d = os.path.join(path, c["dir"])
        # crash recovery for the write-aside swaps below (same .purged
        # protocol in both branches): the ONLY writer of <d>.purged is
        # a swap sequence [rename d -> .purged, rename aside -> d,
        # rmtree .purged], so
        #   - d missing + .purged present  = crashed between renames:
        #     restore the intact pre-swap dir and redo the purge;
        #   - d present + .purged present  = crashed before the final
        #     rmtree: the swap landed, just finish the delete (leaving
        #     .purged would keep the masked bytes on disk — the very
        #     thing an erasure must not do).
        if os.path.isdir(d + ".purged"):
            if not os.path.isdir(d):
                os.rename(d + ".purged", d)
            else:
                shutil.rmtree(d + ".purged")
        if not os.path.isdir(d):
            continue
        col, masked = _replaced_after(commits, i)
        if not masked:
            continue
        subdirs = [v for v in sorted(masked)
                   if os.path.isdir(os.path.join(d, f"{col}={v}"))]
        if subdirs:
            sub_paths = [os.path.join(d, f"{col}={v}") for v in subdirs]
            masked_prefixes = tuple(f"{col}={v}" + os.sep for v in subdirs)
            all_files = glob.glob(os.path.join(d, "**", "*.parquet"),
                                  recursive=True)
            doomed_files = [
                p for p in all_files
                if os.path.relpath(p, d).startswith(masked_prefixes)
            ]
            # the audit's doomed-row count comes from the parquet
            # FOOTERS — metadata-only, no Spark job over bytes the pass
            # is about to delete (r8's measured erasure regression)
            doomed = _footer_row_count(doomed_files)
            doomed_set = set(doomed_files)
            survivors = [p for p in all_files if p not in doomed_set]
            if not survivors:
                # will the delete leave the commit dir without any
                # parquet file?  Capture the schema marker BEFORE
                # deleting — after the rmtree there is nothing left to
                # infer it from (the old read_version fallback crashed
                # with UNABLE_TO_INFER_SCHEMA on the emptied dir,
                # taking the whole table down).  Swap FIRST (marker
                # write-aside, two renames), delete LAST, so no crash
                # point leaves the live dir half-empty — after the
                # marker rename the masked subdirs live inside .purged,
                # and every crash window is healed by the loop-top
                # .purged recovery on the next run.  The marker schema
                # comes from a doomed file's footer + the manifest's
                # partition type; exotic partition types fall back to a
                # Spark limit(0) read.
                if not _write_footer_marker(d, doomed_files, col,
                                            c.get("pcol_type")):
                    snap = spark.read.parquet(d).limit(0)
                    if c.get("pcol_type") and col in snap.columns:
                        snap = snap.withColumn(
                            col, F.col(col).cast(c["pcol_type"]))
                    snap.repartition(1).write.mode("overwrite").parquet(
                        d + ".marker")
                old = d + ".purged"
                os.rename(d, old)
                os.rename(d + ".marker", d)
                shutil.rmtree(old)
            else:
                for p in sub_paths:
                    shutil.rmtree(p)
            dirs_rewritten += 1
            rows_purged += doomed
            continue
        # unpartitioned layout: write-aside rewrite
        df = spark.read.parquet(d)
        if col not in df.columns:
            continue
        doomed = df.where(
            F.col(col).isNotNull()
            & F.col(col).cast("string").isin(sorted(masked))
        ).count()
        if not doomed:
            continue
        keep = df.where(
            F.col(col).isNull()
            | ~F.col(col).cast("string").isin(sorted(masked))
        )
        tmp = d + ".rewrite"
        keep.write.mode("overwrite").parquet(tmp)
        if not glob.glob(os.path.join(tmp, "*.parquet")):
            df.limit(0).repartition(1).write.mode("overwrite").parquet(tmp)
        old = d + ".purged"
        os.rename(d, old)
        os.rename(tmp, d)
        shutil.rmtree(old)
        dirs_rewritten += 1
        rows_purged += doomed
    return {"dirs_rewritten": dirs_rewritten, "rows_purged": rows_purged}


# ---------------------------------------------------------------------------
# Cross-table atomic snapshots: one transaction manifest pins a version
# per table, so readers get a CONSISTENT view across tables — table A at
# v2 with table B still at v1 is unobservable, even when each table's
# own commit already landed (the torn-write window the single-table log
# cannot close).


def _txn_log(root: str) -> str:
    return os.path.join(root, "_txn")


def txn_commits(root: str) -> list[dict]:
    d = _txn_log(root)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d), key=lambda s: int(s.split(".")[0])):
        with open(os.path.join(d, f)) as fh:
            out.append(json.load(fh))
    return out


def txn_commit(root: str, table_versions: dict[str, int]) -> int:
    """Atomically publish a cross-table snapshot {table: version}.  The
    manifest rename is the ONLY commit point: per-table data and
    per-table version manifests may already exist (written in any
    order, by any number of writers) — none of it is visible through
    ``txn_read`` until this rename lands."""
    os.makedirs(_txn_log(root), exist_ok=True)
    txn = len(txn_commits(root)) + 1
    entry = {"txn": txn, "tables": dict(table_versions)}
    fd, tmp = tempfile.mkstemp(dir=_txn_log(root))
    with os.fdopen(fd, "w") as fh:
        json.dump(entry, fh)
    os.rename(tmp, os.path.join(_txn_log(root), f"{txn}.json"))
    return txn


def txn_read(spark: SparkSession, root: str, paths: dict[str, str],
             txn: int | None = None) -> dict[str, DataFrame]:
    """The snapshot as of transaction ``txn`` (default latest): every
    table read AT ITS PINNED VERSION via time travel — cross-table
    consistency reduces to single-table time travel plus one atomic
    manifest."""
    commits = txn_commits(root)
    if txn is not None:
        commits = [c for c in commits if c["txn"] <= txn]
    if not commits:
        raise ValueError(f"no transaction at or before {txn}")
    pinned = commits[-1]["tables"]
    return {
        name: read_version(spark, paths[name], pinned[name])
        for name in pinned
    }
