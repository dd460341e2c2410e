"""Bench regression gate: compare the current round's bench output with
the previous round's and flag regressions the per-round eyeball missed.

Built after two real incidents this gate would have caught:
- round 2: +39% on the 12-headliner common subset (silent, shipped);
- round 3: bench.py crashed on one AnalysisException and recorded
  NOTHING for the other 31 queries (rc=1, parsed=null).

Accepts either the raw one-line JSON bench.py prints or the driver's
wrapper file ({"n", "rc", "tail", "parsed": {...}}).

Usage:  python tools/bench_gate.py CURRENT.json BASELINE.json [...]
        [--retire LABEL ...]   # drop known-outlier artifacts by substring
        [--epoch LABEL]        # gate only vs same-host-epoch baselines
Exit 0 = clean; exit 1 = violations (printed one per line).

--epoch LABEL (round-11, SCALE.md addendum 5): hosts drift between
rounds — r10 measured a uniform 1.2-1.9x slowdown with a bit-identical
engine, and a cross-epoch best-ever bar would relitigate that noise
every round.  With --epoch, only baselines whose PATH contains LABEL
(e.g. "r11" for artifacts recorded on the current epoch) participate
in the pass/fail compare; all other artifacts still feed an
informational best-ever TREND line so cross-epoch drift stays visible
without failing the gate.  No epoch-matching baseline => vacuously
clean (with a warning), same as the all-crashed case.

With multiple baselines the gate compares each query against its BEST
(minimum) time across ALL of them and quotes which artifact holds that
best — r7 (+11%) and r8 (+24%) were both slow-box regimes where the
single-previous-round diff cried wolf; the best-ever baseline is
stable against one noisy round.  Pass every BENCH_r*.json and
BENCH_LOCAL_r*.json you have (a crashed/unparseable baseline is
skipped with a warning, not fatal).

Budget: a query regresses when cur > prev * BUDGET + floor.  The
multiplicative budget (default 1.25x) catches real plan regressions; the
additive floor keeps short queries from flagging on scheduler jitter —
round 5's worst pure-noise drift was 1.23x on a 0.55 s query, and
round 11 measured 2.0-2.5x driver-vs-quiet-box deltas on three
sub-second queries whose implementing files were untouched (VERDICT
r11 "what's wrong" #1).  Sub-second queries are jitter-dominated at
sf0.1, so below 1 s the per-query floor is a full extra second
(SUBSEC_FLOOR); a SYSTEMATIC slowdown across many such queries is
still caught by the SLOW-TOTAL 1.25x bound on the common-subset sum,
which has no additive slack.  At/above 1 s the floor is 0.1 s, so a
real 2x regression on any >=1 s query still fails.
"""

from __future__ import annotations

import json
import re
import sys

BUDGET = 1.25
FLOOR_SEC = 0.1
SUBSEC_FLOOR = 1.0


def load_bench(path: str) -> dict:
    """Parsed bench dict {value, queries, ...} plus driver metadata.

    Raises ValueError when the run crashed (nonzero rc or unparseable
    output) — a crash IS a gate failure, reported by the caller.
    """
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:          # raw bench.py line
        return d
    # driver wrapper
    if d.get("rc", 0) != 0:
        raise ValueError(f"bench run crashed: rc={d.get('rc')}")
    parsed = d.get("parsed")
    if not parsed or "queries" not in parsed:
        raise ValueError("bench output unparseable (parsed=null)")
    return parsed


def merge_best(baselines: list[tuple[str, dict]]) -> tuple[dict, dict]:
    """Per-query ROBUST minimum across all baseline artifacts.

    A plain minimum lets one lucky/noisy-fast outlier permanently
    ratchet the bar (and the SLOW-TOTAL sum then compares against a
    composite no single run ever achieved).  With >= 4 samples for a
    query we therefore use the SECOND-smallest time — one outlier is
    discarded, while genuinely repeatable speedups (which show up in
    at least two rounds) still tighten the bar.  With < 4 samples the
    plain minimum stands (too few points to call anything an outlier).

    Known-bad artifacts can be retired outright with --retire LABEL
    (substring match on the path) in main().

    Returns ({name: best_sec}, {name: artifact_label}) so violation
    lines can say WHICH round holds the quoted baseline time."""
    times: dict[str, list[tuple[float, str]]] = {}
    for label, d in baselines:
        for name, sec in d.get("queries", {}).items():
            times.setdefault(name, []).append((sec, label))
    best: dict[str, float] = {}
    src: dict[str, str] = {}
    for name, pairs in times.items():
        # explicit time-only key: a tie between two equal times keeps
        # input order rather than silently breaking on artifact label
        pairs.sort(key=lambda p: p[0])
        pick = pairs[1] if len(pairs) >= 4 else pairs[0]
        best[name], src[name] = pick
    return best, src


def compare(cur: dict, prev: dict,
            budget: float = BUDGET, floor_sec: float = FLOOR_SEC,
            prev_src: dict | None = None) -> list[str]:
    """Violation strings, empty when the current round is clean.

    ``prev`` may be a single round's dict or a merged best-ever dict
    (see merge_best); ``prev_src`` optionally labels each baseline
    query's source artifact for the violation message."""
    out: list[str] = []
    cq, pq = cur.get("queries", {}), prev.get("queries", {})
    for name, err in (cur.get("errors") or {}).items():
        out.append(f"ERROR {name}: {err[:120]}")
    for name in pq:
        if name not in cq and name not in (cur.get("errors") or {}):
            out.append(f"MISSING {name}: timed last round, absent now")
    common = [n for n in pq if n in cq]
    for name in common:
        # sub-second queries are scheduler-jitter-dominated (see module
        # docstring): give them a full-second additive floor and let
        # SLOW-TOTAL catch any systematic drift instead
        floor = max(floor_sec, SUBSEC_FLOOR) if pq[name] < 1.0 else floor_sec
        if cq[name] > pq[name] * budget + floor:
            where = f" [best: {prev_src[name]}]" if prev_src else ""
            out.append(
                f"SLOW {name}: {pq[name]:.3f}s -> {cq[name]:.3f}s "
                f"({cq[name] / pq[name]:.2f}x, budget {budget:.2f}x+{floor}s)"
                f"{where}"
            )
    # total over the COMMON subset only — new queries grow the headline
    # total legitimately every round
    tc, tp = sum(cq[n] for n in common), sum(pq[n] for n in common)
    if tp > 0 and tc > tp * budget:
        out.append(
            f"SLOW-TOTAL common subset: {tp:.3f}s -> {tc:.3f}s "
            f"({tc / tp:.2f}x, budget {budget:.2f}x)"
        )
    return out


def trend_line(cur: dict, baselines: list[tuple[str, dict]]) -> str:
    """Informational cross-epoch drift summary: current total over the
    common subset vs the best-ever composite across ALL artifacts.
    Never part of the gate verdict — epochs drift (SCALE.md add. 5)."""
    best, _ = merge_best(baselines)
    cq = cur.get("queries", {})
    common = [n for n in best if n in cq]
    if not common:
        return "TREND no common queries vs best-ever"
    tc, tb = sum(cq[n] for n in common), sum(best[n] for n in common)
    return (f"TREND vs best-ever (all epochs, {len(baselines)} artifact(s), "
            f"{len(common)} common): {tb:.3f}s -> {tc:.3f}s "
            f"({tc / tb:.2f}x, informational)")


def main(argv: list[str]) -> int:
    retired: list[str] = []
    while "--retire" in argv:
        i = argv.index("--retire")
        if i + 1 >= len(argv):
            print("usage: --retire LABEL (missing argument)")
            return 2
        retired.append(argv[i + 1])
        del argv[i:i + 2]
    epoch: str | None = None
    while "--epoch" in argv:
        i = argv.index("--epoch")
        if i + 1 >= len(argv):
            print("usage: --epoch LABEL (missing argument)")
            return 2
        epoch = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 3:
        print(__doc__)
        return 2
    try:
        cur = load_bench(argv[1])
    except ValueError as exc:
        print(f"CRASH current round: {exc}")
        return 1
    baselines: list[tuple[str, dict]] = []
    for path in argv[2:]:
        if any(r in path for r in retired):
            print(f"RETIRED baseline {path} (--retire)")
            continue
        try:
            baselines.append((path, load_bench(path)))
        except (ValueError, OSError, json.JSONDecodeError) as exc:
            print(f"WARN baseline {path} unusable ({exc}); skipped")
    if not baselines:
        # every baseline crashed: nothing sane to diff against; pass but say so
        print("WARN no usable baseline; gate vacuously clean")
        return 0
    gate_baselines = baselines
    if epoch is not None:
        print(trend_line(cur, baselines))
        # delimited-token match, not substring: --epoch r1 must NOT
        # select BENCH_r10/BENCH_r11 artifacts (ADVICE r11)
        pat = re.compile(
            rf"(?<![A-Za-z0-9]){re.escape(epoch)}(?![A-Za-z0-9])"
        )
        gate_baselines = [(p, d) for p, d in baselines if pat.search(p)]
        if not gate_baselines:
            print(f"WARN no baseline matches epoch '{epoch}'; "
                  "gate vacuously clean")
            return 0
    best, src = merge_best(gate_baselines)
    violations = compare(cur, {"queries": best}, prev_src=src)
    for v in violations:
        print(v)
    if not violations:
        scope = f"epoch '{epoch}'" if epoch is not None else "best-ever"
        print(f"bench gate: clean (vs {scope} over {len(gate_baselines)} "
              f"artifact(s))")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
