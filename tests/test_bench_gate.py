"""CI face of tools/bench_gate.py (VERDICT r9 task #6).

The gate exists and works from the command line, but nothing failed CI
when a round committed a regressed bench artifact without the
explanation paragraph SCALE.md expects.  This test runs the gate's own
logic (imported, not reimplemented) against the COMMITTED artifacts —
no live timings, so it is load-independent and deterministic — and
requires every flagged query to have a SCALE.md anchor (its name
appearing in SCALE.md, where the accepted-regression story lives).

Unit tests below also pin the round-10 robust-minimum semantics: one
lucky outlier must not permanently ratchet the per-query bar.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench_gate  # noqa: E402


def _artifacts():
    paths = sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        + glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json"))
    )
    loaded = []
    for p in paths:
        try:
            loaded.append((os.path.basename(p), bench_gate.load_bench(p)))
        except (ValueError, OSError, json.JSONDecodeError):
            continue  # a crashed round's artifact is not a baseline
    return loaded


def _round_no(name: str) -> int:
    m = re.search(r"_r(\d+)", name)
    return int(m.group(1)) if m else -1


def test_latest_artifact_vs_best_ever_has_scale_md_anchors():
    arts = _artifacts()
    if len(arts) < 2:
        pytest.skip("fewer than two usable bench artifacts")
    latest_round = max(_round_no(n) for n, _ in arts)
    current = [d for n, d in arts if _round_no(n) == latest_round]
    baselines = [(n, d) for n, d in arts if _round_no(n) < latest_round]
    if not baselines:
        pytest.skip("no earlier-round baseline")
    best, src = bench_gate.merge_best(baselines)
    with open(os.path.join(REPO, "SCALE.md")) as f:
        scale_md = f.read()
    unexplained = []
    # a round may have both driver (BENCH_rN) and quiet-box
    # (BENCH_LOCAL_rN) artifacts; a query is only flagged if EVERY
    # current-round artifact shows it slow (the quiet-box run exists
    # precisely to acquit driver-box noise)
    flagged_per_artifact = []
    for cur in current:
        v = bench_gate.compare(cur, {"queries": best}, prev_src=src)
        flagged_per_artifact.append(
            {line.split()[1].rstrip(":") for line in v if line.startswith("SLOW ")}
        )
    flagged = set.intersection(*flagged_per_artifact) if flagged_per_artifact else set()
    for name in sorted(flagged):
        if name not in scale_md:
            unexplained.append(name)
    assert not unexplained, (
        "bench-gate-flagged queries lack a SCALE.md anchor (add the "
        f"accepted-regression paragraph or fix the regression): {unexplained}"
    )


def test_merge_best_discards_single_outlier_with_enough_samples():
    mk = lambda sec: {"queries": {"q": sec}}  # noqa: E731
    # 4 samples: the lone 0.1 outlier is dropped, bar = second-smallest
    best, src = bench_gate.merge_best(
        [("a", mk(0.5)), ("b", mk(0.1)), ("c", mk(0.52)), ("d", mk(0.55))]
    )
    assert best["q"] == 0.5 and src["q"] == "a"
    # 3 samples: too few to call an outlier — plain minimum stands
    best, _ = bench_gate.merge_best([("a", mk(0.5)), ("b", mk(0.1)), ("c", mk(0.52))])
    assert best["q"] == 0.1
    # a REPEATABLE speedup (two fast rounds) does tighten the bar
    best, _ = bench_gate.merge_best(
        [("a", mk(0.5)), ("b", mk(0.1)), ("c", mk(0.11)), ("d", mk(0.55))]
    )
    assert best["q"] == 0.11


def test_gate_flags_real_regression_and_passes_noise():
    prev = {"queries": {"q1": 0.877, "q2": 0.55}}
    cur_bad = {"queries": {"q1": 1.373, "q2": 0.55}}   # round-2 real case
    cur_noise = {"queries": {"q1": 0.95, "q2": 0.676}}  # 1.23x on 0.55 s
    assert any("SLOW q1" in v for v in bench_gate.compare(cur_bad, prev))
    assert bench_gate.compare(cur_noise, prev) == []


def test_epoch_anchor_gates_only_same_epoch(tmp_path, capsys):
    """--epoch LABEL (round-11): a current run that regressed vs a
    faster RETIRED host epoch but is clean vs its own epoch must PASS,
    with the cross-epoch drift reported as an informational TREND line;
    without --epoch the same artifacts fail the gate (the r10 drift
    relitigating this flag exists to stop)."""
    def write(name, sec):
        p = tmp_path / name
        p.write_text(json.dumps({"queries": {"q1": sec}}))
        return str(p)

    cur = write("BENCH_r11_cur.json", 1.5)          # slow epoch
    fast = write("BENCH_LOCAL_r10.json", 1.0)       # fast old epoch
    same = write("BENCH_LOCAL_r11.json", 1.45)      # current epoch
    # no epoch anchor: best-ever bar (1.0) flags the 1.5 s run
    assert bench_gate.main(["gate", cur, fast, same]) == 1
    capsys.readouterr()
    # epoch anchor: gate vs r11-only (1.45), clean; trend line printed
    assert bench_gate.main(["gate", cur, fast, same, "--epoch", "r11"]) == 0
    out = capsys.readouterr().out
    assert "TREND" in out and "epoch 'r11'" in out
    # epoch with no matching artifact: vacuously clean with a warning
    assert bench_gate.main(["gate", cur, fast, "--epoch", "r99"]) == 0
    assert "no baseline matches epoch" in capsys.readouterr().out


def test_merge_best_tie_keeps_input_order():
    mk = lambda sec: {"queries": {"q": sec}}  # noqa: E731
    best, src = bench_gate.merge_best(
        [("zzz", mk(0.5)), ("aaa", mk(0.5)), ("b", mk(0.7)), ("c", mk(0.8))]
    )
    # second-smallest of the tied pair: stable sort keeps input order,
    # so the pick is the SECOND artifact fed, not the alphabetical one
    assert best["q"] == 0.5 and src["q"] == "aaa"
