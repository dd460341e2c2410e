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
