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


def test_rotation_fronts_failed_then_fresh_then_green():
    """Round-8 ordering contract: names that ever FAILED a driver
    artifact lead (so fixes get re-verified next round), then
    never-sampled names (walking the registry), then the green tail —
    each block sorted, the whole order a pure function of the
    CORRECTNESS_r*.json set."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = list(entry.queries())
    seen, failed = entry._sampled_names()
    failed = failed & set(names)
    fresh = sorted(n for n in names if n not in seen)
    n_f = len(failed)
    assert names[:n_f] == sorted(failed)
    assert names[n_f:n_f + len(fresh)] == fresh
    tail = names[n_f + len(fresh):]
    assert tail == sorted(tail)
    assert set(tail) == (seen & set(names)) - failed
