"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are populated by the engine's query
registry (busdata_pipeline_spark.plans.registry): one entry per operator
from SURVEY.md §2, each callable ``(spark, sf_dir) -> DataFrame`` with a
matching DuckDB-runnable ANSI-SQL oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the plan modules registers their queries.
import busdata_pipeline_spark.plans.analytics  # noqa: F401
import busdata_pipeline_spark.plans.census  # noqa: F401
import busdata_pipeline_spark.plans.curation_ext  # noqa: F401
import busdata_pipeline_spark.plans.dup_spans  # noqa: F401
import busdata_pipeline_spark.plans.etl_windows  # noqa: F401
import busdata_pipeline_spark.plans.formats  # noqa: F401
import busdata_pipeline_spark.plans.graph  # noqa: F401
import busdata_pipeline_spark.plans.llm_corpus  # noqa: F401
import busdata_pipeline_spark.plans.pruning  # noqa: F401
import busdata_pipeline_spark.plans.relational  # noqa: F401
import busdata_pipeline_spark.plans.relational_ext  # noqa: F401
import busdata_pipeline_spark.plans.relational_tail  # noqa: F401
import busdata_pipeline_spark.plans.retrieval  # noqa: F401
import busdata_pipeline_spark.plans.scalar_suites  # noqa: F401
import busdata_pipeline_spark.plans.sketch_filters  # noqa: F401
import busdata_pipeline_spark.plans.spatial  # noqa: F401
import busdata_pipeline_spark.plans.sql_twins  # noqa: F401
import busdata_pipeline_spark.plans.stats_tests  # noqa: F401
import busdata_pipeline_spark.plans.streaming_windows  # noqa: F401
import busdata_pipeline_spark.plans.temporal  # noqa: F401
import busdata_pipeline_spark.plans.training_data  # noqa: F401
import busdata_pipeline_spark.plans.udtf_ops  # noqa: F401
from busdata_pipeline_spark.plans.registry import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the day-of-week readings profile (analytic.sql q3 shape)
    on sf0.001 — scan → date derivation → grouped agg, fully codegen'd."""
    return QUERIES["bus_q3_avg_per_dow"](spark, SF0001)


def _sampled_names() -> tuple[set[str], set[str]]:
    """(all sampled, currently failed) query names across the driver
    CORRECTNESS_r*.json artifacts.  A name counts as failed iff the
    LATEST artifact that mentions it recorded an err / rows / schema /
    hash miss — a later green run demotes it, so fixed names leave the
    front block and stop displacing the never-sampled registry walk
    from the driver's fixed-size sample."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    last_bad: dict[str, bool] = {}

    def round_no(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
                       key=round_no):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            seen.add(name)
            if not isinstance(rec, dict):
                continue
            last_bad[name] = rec.get("err") is not None or any(
                rec.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
    failed = {n for n, bad in last_bad.items() if bad}
    return seen, failed


def _changed_files() -> set[str]:
    """Repo-relative paths touched since the newest driver correctness
    artifact's commit (committed AND working-tree changes).  Empty when
    git (or any artifact) is unavailable — the rotation then degrades
    to the round-8 failed/fresh/green contract."""
    import glob
    import os
    import re
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))

    def round_no(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    arts = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
                  key=round_no)
    if not arts:
        return set()
    try:
        base = subprocess.run(
            ["git", "log", "-n", "1", "--format=%H", "--",
             os.path.basename(arts[-1])],
            cwd=here, capture_output=True, text=True, timeout=20,
        )
        sha = base.stdout.strip().splitlines()[-1] if base.stdout.strip() \
            else ""
        if base.returncode != 0 or not sha:
            return set()
        diff = subprocess.run(
            ["git", "diff", "--name-only", sha],
            cwd=here, capture_output=True, text=True, timeout=20,
        )
        if diff.returncode != 0:
            return set()
        return {ln.strip() for ln in diff.stdout.splitlines() if ln.strip()}
    except Exception:
        return set()


def _changed_module_names(names: list[str],
                          changed: set[str] | None = None) -> set[str]:
    """Names whose registering plan module — or any engine module that
    module (transitively) references — changed since the last driver
    round (round-11 gap: the alphabetical sample missed every name
    whose ENGINE code changed that round; this fronts them).  Module
    references are read from source (both ``import busdata_...x.y``
    and ``from busdata_...x import y`` forms) because plan modules
    import operators inside function bodies."""
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    changed = _changed_files() if changed is None else changed
    changed_py = {
        p for p in changed
        if p.endswith(".py") and p.startswith("busdata_pipeline_spark/")
    }
    if not changed_py:
        return set()

    _dotted = re.compile(r"busdata_pipeline_spark(?:\.\w+)+")
    # the import list may be a parenthesized multi-line block; [^)]*
    # crosses newlines without DOTALL because it is a character class
    _from = re.compile(
        r"^\s*from\s+(busdata_pipeline_spark(?:\.\w+)*)\s+import\s+"
        r"(\([^)]*\)|[\w ,]+)", re.M,
    )

    def to_file(mod: str) -> str | None:
        rel = mod.replace(".", "/") + ".py"
        return rel if os.path.exists(os.path.join(here, rel)) else None

    dep_cache: dict[str, set[str]] = {}

    def refs(relpath: str) -> set[str]:
        if relpath in dep_cache:
            return dep_cache[relpath]
        dep_cache[relpath] = set()  # break import cycles mid-walk
        try:
            with open(os.path.join(here, relpath)) as f:
                src = f.read()
        except OSError:
            src = ""
        mods: set[str] = set(_dotted.findall(src))
        for base, imported in _from.findall(src):
            mods.add(base)
            for item in imported.strip("()").replace("\n", ",").split(","):
                item = item.split(" as ")[0].strip()
                if item:
                    mods.add(f"{base}.{item}")
        out = {f for f in (to_file(m) for m in mods) if f}
        dep_cache[relpath] = out
        return out

    hit_cache: dict[str, bool] = {}

    def module_hit(relpath: str) -> bool:
        if relpath in hit_cache:
            return hit_cache[relpath]
        seen_f, stack = {relpath}, [relpath]
        hit = False
        while stack:
            f = stack.pop()
            if f in changed_py:
                hit = True
                break
            for d in refs(f):
                if d not in seen_f:
                    seen_f.add(d)
                    stack.append(d)
        hit_cache[relpath] = hit
        return hit

    out: set[str] = set()
    for n in names:
        mod = getattr(QUERIES[n], "__module__", "") or ""
        rel = to_file(mod)
        if rel is not None and module_hit(rel):
            out.add(n)
    return out


def _rotated(names: list[str]) -> list[str]:
    """Deterministic enumeration order: names whose LATEST driver
    artifact is red come first (sorted) so the driver's prefix-biased
    sample re-verifies their fixes next round (a green re-check demotes
    them); then names whose implementing modules changed since the last
    round artifact (sorted — round-12: the driver's sample must cover
    exactly the code that moved); then names the driver has never
    sampled (sorted), walking its sample across the registry; then the
    green tail (sorted).  Order is a pure function of the artifact set
    plus the git diff vs the latest artifact's commit — stable within a
    round, no random shuffle."""
    seen, failed = _sampled_names()
    changed = _changed_module_names(names)
    front = sorted(n for n in names if n in failed)
    touched = sorted(
        n for n in names if n in changed and n not in failed
    )
    placed = failed | changed
    fresh = sorted(n for n in names if n not in seen and n not in placed)
    checked = sorted(
        n for n in names if n in seen and n not in placed
    )
    return front + touched + fresh + checked


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _rotated(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    order = [n for n in _rotated(list(QUERIES)) if n in ORACLES]
    return {n: ORACLES[n] for n in order}
