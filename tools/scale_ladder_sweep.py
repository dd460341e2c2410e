#!/usr/bin/env python
"""One-command full-registry strict differential at a scale-ladder rung.

Round 10's 267/281 campaign at the 100x replica was assembled by hand:
chunked fresh-JVM sweeps (one long-lived sim JVM accumulates session
state and OOMs around name ~180), heap knobs per rung, solo retries for
kernel-OOM (rc=137 = a co-tenant heavy oracle, not the query), and a
manual tally.  This tool scripts that playbook so re-certification is
one command (VERDICT r10 task #4):

    python tools/scale_ladder_sweep.py                 # 100x rung
    python tools/scale_ladder_sweep.py --sf-dir /tmp/sf1_synth --mem 8g
    python tools/scale_ladder_sweep.py --names a b c   # subset
    python tools/scale_ladder_sweep.py --out TALLY.json

Behavior:
- rebuilds missing replicas via tools/make_scale_ladder.py (sf0.1 ->
  /tmp/sf1_synth -> /tmp/sf10_synth; ~4 min, ~1.7 GB);
- splits the registry into fresh-JVM chunks (default 40 names) and runs
  tools/driver_sim.py per chunk with DRIVER_SIM_SF_DIR/DRIVER_SIM_MEM;
- names with no verdict from a chunk whose JVM died (rc=137 kernel OOM,
  ConnectionRefused cascade, ...) are retried SOLO in their own JVM
  before anything is recorded as an error;
- skips the canonical super-linear-ORACLE names (SCALE.md round-10
  addendum 4: definitional all-pairs / transitive-closure ground truths
  whose DuckDB TIME is super-linear; their ENGINE sides hold 100x bench
  rows) — override with --no-skip or SCALE_SWEEP_SKIP=a,b,c;
- emits ONE JSON tally line {pass, fail, error, skip, names: {...}} and
  exits nonzero iff any FAIL/ERROR remains after retries.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Canonical super-linear-ORACLE skips at big replica rungs.  EMPTY
#: since round 11: the former 14-name class (all-pairs / transitive-
#: closure ground truths) was dissolved by the rule-16 quotient +
#: relational-intersect rewrites (ORACLES.md rule 16, SCALE.md
#: round-11 addendum 1) — every oracle is now output-bound at any
#: replica rung.  The list stays as the mechanism should a genuinely
#: irreducible kernel ever land.
CANONICAL_SKIPS: list[str] = []

RUNGS = {  # sf_dir -> (build args, heap)
    "/tmp/sf1_synth": (["/tmp/sf1_synth"], "8g"),
    "/tmp/sf10_synth": (["/tmp/sf10_synth", "/tmp/sf1_synth"], "20g"),
}


def ensure_replica(sf_dir: str) -> None:
    """Rebuild the rung (and any rung it chains from) when absent —
    replicas live in /tmp and vanish between sessions."""
    if os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        return
    if sf_dir not in RUNGS:
        raise SystemExit(f"{sf_dir} missing and not a known rung "
                         f"({sorted(RUNGS)}); build it yourself")
    build_args, _ = RUNGS[sf_dir]
    if len(build_args) > 1:  # chained rung: need the parent first
        ensure_replica(build_args[1])
    print(f"REBUILD {sf_dir} ...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_scale_ladder.py"),
         *build_args],
        check=True, cwd=REPO,
    )


def run_sim(names: list[str], sf_dir: str, mem: str,
            skip: list[str], stream: str = "") -> tuple[int, dict[str, str]]:
    """One fresh-JVM driver_sim over ``names``; returns (rc, verdicts).

    A verdict is the first token of each result line (PASS/FAIL/ERROR/
    SKIP/ROWSONLY); names the dead-JVM run never reached are absent."""
    env = dict(os.environ,
               DRIVER_SIM_SF_DIR=sf_dir,
               DRIVER_SIM_MEM=mem,
               DRIVER_SIM_SKIP=",".join(skip),
               DRIVER_SIM_STREAM=stream)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "driver_sim.py"),
         *names],
        env=env, cwd=REPO, capture_output=True, text=True,
    )
    # Verdict tokens can share a physical line with Spark progress-bar
    # carriage returns, so scan for them anywhere rather than line-anchored.
    import re
    verdicts = {
        m.group(2): m.group(1)
        for m in re.finditer(
            r"\b(PASS|FAIL|ERROR|SKIP|ROWSONLY) ([A-Za-z0-9_]+)",
            proc.stdout)
    }
    return proc.returncode, verdicts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10_synth")
    ap.add_argument("--mem", default=None,
                    help="driver-sim heap (default: rung-appropriate)")
    ap.add_argument("--chunk", type=int, default=40)
    ap.add_argument("--names", nargs="*", default=None,
                    help="subset of registry names (default: all)")
    ap.add_argument("--no-skip", action="store_true",
                    help="run even the canonical super-linear-oracle names")
    ap.add_argument("--stream", default=None,
                    help="comma-list (or 'all') of names compared with the "
                         "memory-bounded streaming comparator "
                         "(DRIVER_SIM_STREAM); default: the big-output "
                         "pair-expansion names at replica rungs")
    ap.add_argument("--out", default=None, help="also write the tally here")
    args = ap.parse_args()

    skip = [] if args.no_skip else list(filter(None, os.environ.get(
        "SCALE_SWEEP_SKIP", ",".join(CANONICAL_SKIPS)).split(",")))
    mem = args.mem or RUNGS.get(args.sf_dir, (None, "8g"))[1]
    # big-output pair-expansion names: stream the comparison at replica
    # rungs (their 100x result sets are 10M-200M rows — see
    # driver_hash.strict_compare_streaming)
    stream = args.stream if args.stream is not None else ",".join([
        "td_minhash_near_dups", "td_setsim_prefix_join",
        "td_fuzzy_prefix_match", "td_embed_near_dups",
        "td_incremental_minhash", "td_dup_clusters",
        "td_leakage_safe_split", "td_knn_graph", "td_semdedup",
    ]) if args.sf_dir in RUNGS else ""
    ensure_replica(args.sf_dir)

    import __spark_entry__ as E  # after ensure: import is cheap, no JVM
    registry = sorted(E.queries())
    names = args.names if args.names else registry
    unknown = sorted(set(names) - set(registry))
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    t0 = time.time()
    verdicts: dict[str, str] = {}
    chunks = [names[i:i + args.chunk] for i in range(0, len(names), args.chunk)]
    for ci, chunk in enumerate(chunks, 1):
        rc, got = run_sim(chunk, args.sf_dir, mem, skip, stream)
        verdicts.update(got)
        missing = [n for n in chunk if n not in verdicts]
        print(f"CHUNK {ci}/{len(chunks)} rc={rc} "
              f"verdicts={len(got)} missing={len(missing)} "
              f"t={time.time() - t0:.0f}s", flush=True)
        # rc=137 (or any dead JVM leaving names unresolved) = usually a
        # co-tenant heavy oracle's kernel OOM, not the queries: solo-retry
        for n in missing:
            rc2, got2 = run_sim([n], args.sf_dir, mem, skip, stream)
            verdicts[n] = got2.get(n, "ERROR")
            print(f"  SOLO-RETRY {n}: {verdicts[n]} (rc={rc2})", flush=True)

    tally = {"sf_dir": args.sf_dir, "mem": mem,
             "elapsed_sec": round(time.time() - t0, 1),
             "pass": sum(v == "PASS" for v in verdicts.values()),
             "rowsonly": sum(v == "ROWSONLY" for v in verdicts.values()),
             "skip": sum(v == "SKIP" for v in verdicts.values()),
             "fail": sum(v == "FAIL" for v in verdicts.values()),
             "error": sum(v == "ERROR" for v in verdicts.values()),
             "names": dict(sorted(verdicts.items()))}
    line = json.dumps(tally)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 1 if (tally["fail"] or tally["error"]) else 0


if __name__ == "__main__":
    raise SystemExit(main())
