"""Bench regression gate: compare the current round's bench output with
the previous round's and flag regressions the per-round eyeball missed.

Built after two real incidents this gate would have caught:
- round 2: +39% on the 12-headliner common subset (silent, shipped);
- round 3: bench.py crashed on one AnalysisException and recorded
  NOTHING for the other 31 queries (rc=1, parsed=null).

Accepts either the raw one-line JSON bench.py prints or the driver's
wrapper file ({"n", "rc", "tail", "parsed": {...}}).

Usage:  python tools/bench_gate.py CURRENT.json PREVIOUS.json
Exit 0 = clean; exit 1 = violations (printed one per line).

Budget: a query regresses when cur > prev * BUDGET + FLOOR_SEC.  The
multiplicative budget (default 1.25x) catches real plan regressions; the
additive floor (default 0.1 s) keeps sub-second queries from flagging on
scheduler jitter — round 5's worst pure-noise drift was 1.23x on a
0.55 s query, inside this envelope, while round 2's real regressions
(e.g. 0.877 -> 1.373 s) are well outside it.
"""

from __future__ import annotations

import json
import sys

BUDGET = 1.25
FLOOR_SEC = 0.1


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


def compare(cur: dict, prev: dict,
            budget: float = BUDGET, floor_sec: float = FLOOR_SEC) -> list[str]:
    """Violation strings, empty when the current round is clean."""
    out: list[str] = []
    cq, pq = cur.get("queries", {}), prev.get("queries", {})
    for name, err in (cur.get("errors") or {}).items():
        out.append(f"ERROR {name}: {err[:120]}")
    for name in pq:
        if name not in cq and name not in (cur.get("errors") or {}):
            out.append(f"MISSING {name}: timed last round, absent now")
    common = [n for n in pq if n in cq]
    for name in common:
        if cq[name] > pq[name] * budget + floor_sec:
            out.append(
                f"SLOW {name}: {pq[name]:.3f}s -> {cq[name]:.3f}s "
                f"({cq[name] / pq[name]:.2f}x, budget {budget:.2f}x+{floor_sec}s)"
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


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    try:
        cur = load_bench(argv[1])
    except ValueError as exc:
        print(f"CRASH current round: {exc}")
        return 1
    try:
        prev = load_bench(argv[2])
    except ValueError as exc:
        # previous round crashed: nothing sane to diff against; pass but say so
        print(f"WARN previous round unusable ({exc}); gate vacuously clean")
        return 0
    violations = compare(cur, prev)
    for v in violations:
        print(v)
    if not violations:
        print("bench gate: clean")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
