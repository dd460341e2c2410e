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


def _commit(path: str, mode: str) -> int:
    os.makedirs(_log_dir(path), exist_ok=True)
    version = len(_commits(path)) + 1
    entry = {"version": version, "mode": mode, "dir": f"_v{version}"}
    fd, tmp = tempfile.mkstemp(dir=_log_dir(path))
    with os.fdopen(fd, "w") as fh:
        json.dump(entry, fh)
    os.rename(tmp, os.path.join(_log_dir(path), f"{version}.json"))
    return version


def write_version(df: DataFrame, path: str, mode: str = "append") -> int:
    """Commit ``df`` as the next version (mode: append | overwrite).
    Data first, manifest last — the rename IS the commit."""
    assert mode in ("append", "overwrite")
    version = len(_commits(path)) + 1
    df.write.mode("overwrite").parquet(os.path.join(path, f"_v{version}"))
    return _commit(path, mode)


def read_version(spark: SparkSession, path: str,
                 version: int | None = None) -> DataFrame:
    """Snapshot as of ``version`` (default: latest)."""
    commits = _commits(path)
    if version is not None:
        commits = [c for c in commits if c["version"] <= version]
    if not commits:
        raise ValueError(f"no commits at or before version {version}")
    start = 0
    for i, c in enumerate(commits):
        if c["mode"] == "overwrite":
            start = i
    dirs = [os.path.join(path, c["dir"]) for c in commits[start:]]
    return spark.read.parquet(*dirs)


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
