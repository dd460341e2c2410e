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
    # >= 1 s queries keep the tight 0.1 s floor: a 1.5x there is real
    prev = {"queries": {"q1": 1.877, "q2": 0.55}}
    cur_bad = {"queries": {"q1": 2.873, "q2": 0.55}}
    cur_noise = {"queries": {"q1": 2.05, "q2": 0.676}}  # 1.23x on 0.55 s
    assert any("SLOW q1" in v for v in bench_gate.compare(cur_bad, prev))
    assert bench_gate.compare(cur_noise, prev) == []


def test_subsecond_floor_passes_busy_host_noise_catches_real_regression():
    """VERDICT-r11 task 3: the exact r11 driver-vs-quiet-box deltas
    (2.0-2.5x on three untouched sub-second queries) must gate CLEAN,
    while a real 2x on a >= 1 s query in the same artifact still
    fails, and a SYSTEMATIC sub-second slowdown is still caught by the
    SLOW-TOTAL bound on the common-subset sum."""
    # the "big" entry stands in for the rest of a real 56-query
    # artifact, keeping the common-subset total inside its 1.25x bound
    # the way the real r11 artifacts do (77.3 vs 79.5 s)
    prev = {"queries": {"bus_q7": 0.453, "etl_w3": 0.368,
                        "bus_q8": 0.205, "big": 20.0}}
    # the r11 busy-host artifact values, big query unchanged: clean
    noisy = {"queries": {"bus_q7": 1.123, "etl_w3": 0.742,
                         "bus_q8": 0.477, "big": 20.3}}
    assert bench_gate.compare(noisy, prev) == []
    # same noise PLUS a real 2x on the >= 1 s query: flagged
    bad = dict(noisy, queries=dict(noisy["queries"], big=40.0))
    viol = bench_gate.compare(bad, prev)
    assert any("SLOW big" in v for v in viol)
    assert not any("SLOW bus_q7" in v for v in viol)
    # systematic 3x across MANY sub-second queries: each is inside the
    # per-query floor, but the common-subset total (no additive slack)
    # still fails
    prev_many = {"queries": {f"q{i}": 0.5 for i in range(20)}}
    cur_many = {"queries": {f"q{i}": 1.4 for i in range(20)}}
    viol = bench_gate.compare(cur_many, prev_many)
    assert viol and all(v.startswith("SLOW-TOTAL") for v in viol)


def test_epoch_label_matches_delimited_token_only(tmp_path, capsys):
    """ADVICE-r11: --epoch r1 must NOT select r10/r11 artifacts (the
    old substring match did), and a trailing --epoch with no value is
    usage exit 2, not an IndexError."""
    def write(name, sec):
        p = tmp_path / name
        p.write_text(json.dumps({"queries": {"q1": sec}}))
        return str(p)

    cur = write("BENCH_cur.json", 5.0)
    r1 = write("BENCH_r1.json", 5.1)      # r1 epoch: current run clean
    r10 = write("BENCH_r10.json", 1.0)    # r10 epoch: would flag 5x
    # substring matching would gate vs r10's 1.0 and fail; token
    # matching selects only BENCH_r1.json -> clean
    assert bench_gate.main(["gate", cur, r1, r10, "--epoch", "r1"]) == 0
    out = capsys.readouterr().out
    assert "1 artifact(s)" in out.split("clean")[1]
    # --epoch as the last token: usage, exit 2
    assert bench_gate.main(["gate", cur, r1, "--epoch"]) == 2
    assert "missing argument" in capsys.readouterr().out
    # --retire as the last token: same contract
    assert bench_gate.main(["gate", cur, r1, "--retire"]) == 2


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
