"""bench.py error isolation + the cross-round regression gate
(tools/bench_gate.py).  Both are pinned against the two REAL incidents
in this repo's bench history: the round-2 +39% silent regression and the
round-3 single-exception total crash."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench  # noqa: E402
import bench_gate  # noqa: E402


# ---------------------------------------------------------------- bench.py

def test_timed_loop_failure_is_recorded_not_fatal():
    """A query that passes warm-up but fails in the timed loop must land
    in errors and not abort the remaining queries (round-5 audit
    finding #3: the guard used to wrap only the warm pass)."""
    calls = {"flaky": 0, "good": 0}

    def run(name):
        calls[name] += 1
        if name == "flaky" and calls[name] >= 2:   # warm pass OK, timed dies
            raise RuntimeError("temp dir vanished")
        return 0.01

    timings, errors = bench.time_queries(run, ["flaky", "good"], repeats=3)
    assert "flaky" in errors and "RuntimeError" in errors["flaky"]
    assert "flaky" not in timings
    assert timings["good"] == 0.01
    assert calls["good"] == 4  # 1 warm + 3 timed


def test_warm_pass_failure_skips_timed_loop():
    def run(name):
        if name == "dead":
            raise ValueError("no such table")
        return 0.02

    timings, errors = bench.time_queries(run, ["dead", "live"], repeats=2)
    assert set(errors) == {"dead"} and set(timings) == {"live"}


# ---------------------------------------------------------- bench_gate.py

def test_gate_flags_round2_regression():
    """r01 -> r02 was a real +39% on the common 12-headliner subset; the
    gate must flag it from the committed artifacts."""
    prev = bench_gate.load_bench(os.path.join(REPO, "BENCH_r01.json"))
    cur = bench_gate.load_bench(os.path.join(REPO, "BENCH_r02.json"))
    violations = bench_gate.compare(cur, prev)
    assert any(v.startswith("SLOW") for v in violations), violations


def test_gate_flags_round3_crash():
    """r03's bench crashed (rc=1, parsed=null): load_bench must raise so
    the CLI reports CRASH instead of diffing nothing."""
    with pytest.raises(ValueError):
        bench_gate.load_bench(os.path.join(REPO, "BENCH_r03.json"))
    rc = bench_gate.main(["bench_gate",
                          os.path.join(REPO, "BENCH_r03.json"),
                          os.path.join(REPO, "BENCH_r02.json")])
    assert rc == 1


def test_gate_passes_round5_noise():
    """r04 -> r05 ran identical code (+2.3% box noise, worst per-query
    1.23x on a 0.55 s query) — inside the budget, must NOT flag."""
    prev = bench_gate.load_bench(os.path.join(REPO, "BENCH_r04.json"))
    cur = bench_gate.load_bench(os.path.join(REPO, "BENCH_r05.json"))
    assert bench_gate.compare(cur, prev) == []


def test_gate_flags_missing_and_errored_queries():
    prev = {"queries": {"a": 1.0, "b": 2.0}}
    cur = {"queries": {"a": 1.0}, "errors": {"b": "OOM: heap"}}
    v = bench_gate.compare(cur, prev)
    assert any(x.startswith("ERROR b") for x in v)

    cur2 = {"queries": {"a": 1.0}}          # b silently vanished
    v2 = bench_gate.compare(cur2, prev)
    assert any(x.startswith("MISSING b") for x in v2)


def test_merge_best_takes_per_query_minimum_and_labels_source():
    best, src = bench_gate.merge_best([
        ("r1", {"queries": {"a": 1.0, "b": 2.0}}),
        ("r2", {"queries": {"a": 0.5, "c": 3.0}}),
    ])
    assert best == {"a": 0.5, "b": 2.0, "c": 3.0}
    assert src == {"a": "r2", "b": "r1", "c": "r2"}


def test_gate_best_ever_absorbs_one_noisy_round():
    """r7/r8 incident shape: the single-previous-round diff flags a
    query that only looks slow because the PREVIOUS round ran on a
    noisy box; the best-ever baseline does not cry wolf, but a real
    regression against the all-time best still flags."""
    noisy_prev = {"queries": {"q": 3.0}}      # slow-box round
    quiet_old = {"queries": {"q": 1.0}}       # best-ever
    cur = {"queries": {"q": 1.05}}            # actually fine
    best, src = bench_gate.merge_best([("old", quiet_old),
                                       ("prev", noisy_prev)])
    assert not bench_gate.compare(cur, {"queries": best}, prev_src=src)
    really_slow = {"queries": {"q": 2.0}}
    v = bench_gate.compare(really_slow, {"queries": best}, prev_src=src)
    assert any("best: old" in s for s in v), v
