"""Standing-proxy correctness gate: the external driver samples ~50 of
the registered queries per round, so 60+ queries can silently rot
between rounds if nothing else exercises their oracles.  This test runs
a rotating (date-seeded) sample of the full surface through the FAITHFUL
driver replica — a fresh subprocess with the hostile non-UTC vanilla
session and the strict hash comparator — every time the suite runs.

Full-surface runs stay available as `python tools/driver_sim.py`
(~4 min); this keeps the per-suite cost at ~1 min while guaranteeing
every query gets replica coverage every ~2 weeks of daily runs.
"""

from __future__ import annotations

import datetime
import os
import random
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLE = int(os.environ.get("DRIVER_SIM_SAMPLE", "8"))


def test_driver_sim_rotating_sample():
    if SAMPLE <= 0:
        pytest.skip("DRIVER_SIM_SAMPLE=0")
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = sorted(entry.queries())
    # Date-seeded: deterministic within a day, rotates across days so
    # repeated daily runs sweep the whole surface.
    rng = random.Random(datetime.date.today().toordinal())
    picked = rng.sample(names, min(SAMPLE, len(names)))
    proc = subprocess.run(
        [sys.executable, os.path.join("tools", "driver_sim.py"), *picked],
        capture_output=True, text=True, cwd=REPO, timeout=1200,
    )
    tail = (proc.stdout or "")[-4000:] + (proc.stderr or "")[-1000:]
    assert proc.returncode == 0, tail
    assert "TOTAL_FAILS=0" in proc.stdout, tail
    assert "FAIL" not in proc.stdout.replace("TOTAL_FAILS", ""), tail


def test_rotation_fronts_failed_then_changed_then_fresh_then_green():
    """Ordering contract (round-8, extended round-12): names that
    FAILED their latest driver artifact lead (so fixes get re-verified
    next round), then names whose implementing modules CHANGED since
    the last round's artifact commit (the r11 gap: the sample missed
    every name whose engine code moved), then never-sampled names,
    then the green-unchanged tail — each block sorted, the whole order
    a pure function of the artifact set + the git diff."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = list(entry.queries())
    all_names = set(names)
    seen, failed = entry._sampled_names()
    failed = failed & all_names
    changed = entry._changed_module_names(sorted(all_names)) - failed
    n_f, n_c = len(failed), len(changed)
    assert names[:n_f] == sorted(failed)
    assert names[n_f:n_f + n_c] == sorted(changed)
    fresh = sorted(
        n for n in all_names if n not in seen
        and n not in failed and n not in changed
    )
    assert names[n_f + n_c:n_f + n_c + len(fresh)] == fresh
    tail = names[n_f + n_c + len(fresh):]
    assert tail == sorted(tail)
    assert set(tail) == (seen & all_names) - failed - changed


def test_changed_module_names_maps_engine_files_to_registry_names():
    """VERDICT-r11 task 5, unit level with INJECTED diffs: a change to
    a plan module fronts its own names; a change to an OPERATORS file
    fronts the names of every plan module that references it (even via
    function-body imports); an out-of-package diff fronts nothing."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = sorted(entry.QUERIES)

    # out-of-package / non-python changes: no names fronted
    assert entry._changed_module_names(
        names, {"tools/bench_gate.py", "SCALE.md", "tests/x.py"}
    ) == set()

    # a plan-module change fronts at least its own registrations
    got = entry._changed_module_names(
        names, {"busdata_pipeline_spark/plans/analytics.py"}
    )
    assert "bus_q3_avg_per_dow" in got
    assert all(
        n in got for n in names
        if entry.QUERIES[n].__module__.endswith("plans.analytics")
    )

    # an OPERATOR change fronts names registered in OTHER modules that
    # import it in function bodies (the exact r11 miss: similarity.py
    # changed, td_knn_graph was not sampled)
    got = entry._changed_module_names(
        names, {"busdata_pipeline_spark/operators/similarity.py"}
    )
    assert "td_knn_graph" in got and "td_semdedup" in got
    # and does NOT front everything: some pure-SQL analytics name
    # stays out
    assert "bus_q1_count_day1" not in got
