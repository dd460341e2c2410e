"""Property tests: EventTimeSessionProcessor == batch gap sessionization.

VERDICT-r11 task 6 / ADVICE-r11 (medium): the event-time sessionizer's
emitted session SET must be a pure function of event times — independent
of how the stream is sliced into micro-batches — and must match batch
session-window semantics (session start = MIN event time, end = MAX,
n = ping count) for every delivery order the watermark permits.

These tests drive the PROCESSOR CLASS directly (fake value-state + fake
timer handle, no Spark streaming query), which makes 100+ randomized
replays affordable; the full transformWithStateInPandas integration is
pinned separately by tests/test_streaming.py and the driver entry
``st_session_gap_verdicts``.

Watermark validity constraint: with watermark delay <= gap, a late ping
a full gap BEFORE an open session's start can never be delivered (it
would be at/below the watermark by the time the session opened), so the
randomized property uses delay < gap — the regime where batch-split
determinism provably holds.  The pre-gap "own session, emitted
immediately" path is exercised by a direct scenario test with a slow
watermark instead.
"""
from __future__ import annotations

import random
from collections import Counter
from types import SimpleNamespace

import pandas as pd
import pytest

from busdata_pipeline_spark.streaming.stateful import (
    EventTimeSessionProcessor,
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    """Per-key stand-in for the transformWithState handle: one value
    state slot and a set of registered event-time timers."""

    def __init__(self):
        self._state = _FakeValueState()
        self.timers = set()

    def getValueState(self, name, schema):
        return self._state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.discard(t)

    def registerTimer(self, t):
        self.timers.add(t)


def _run_stream(batches, gap_ms, delay_ms):
    """Replay `batches` (list of list[(trip, ts_ms, act)]) through the
    processor with Spark's event-time contract: rows at/below the
    PREVIOUS batch's watermark are dropped, the watermark is
    max(event ts) - delay over all delivered rows, and timers fire
    when the watermark passes their expiry.  Returns
    (emitted session multiset, delivered rows, final watermark)."""
    procs: dict = {}
    emitted: list = []
    delivered: list = []
    wm = -(10 ** 18)

    def _collect(gen):
        for out in gen:
            for row in out.itertuples(index=False):
                emitted.append(
                    (int(row.trip_id), int(row.first_time),
                     int(row.last_time), int(row.n_pings))
                )

    for batch in batches:
        live = [(t, ts, a) for (t, ts, a) in batch if ts > wm]
        delivered.extend(live)
        by_key: dict = {}
        for t, ts, a in live:
            by_key.setdefault(t, []).append((ts, a))
        for t, rows in by_key.items():
            if t not in procs:
                p = EventTimeSessionProcessor(gap_ms)
                h = _FakeHandle()
                p.init(h)
                procs[t] = (p, h)
            p, h = procs[t]
            pdf = pd.DataFrame({
                "tstamp": [pd.Timestamp(ts, unit="ms") for ts, _ in rows],
                "ACT_TIME": [a for _, a in rows],
            })
            _collect(p.handleInputRows((t,), iter([pdf]), None))
        if live:
            wm = max(wm, max(ts for _, ts, _ in live) - delay_ms)
        for t, (p, h) in procs.items():
            for timer in sorted(h.timers):
                if wm >= timer:
                    h.timers.discard(timer)
                    info = SimpleNamespace(
                        getExpiryTimeInMs=lambda timer=timer: timer
                    )
                    _collect(p.handleExpiredTimer((t,), None, info))
    return Counter(emitted), delivered, wm


def _batch_oracle(events, gap_ms, final_wm):
    """Pure batch gap sessionization over the delivered rows: sort by
    (ts, act) per key, split where consecutive ts differ >= gap,
    first/last act from the boundary tie groups (min at start, max at
    end); the final session per key is emitted iff the final watermark
    passed last+gap."""
    sessions: list = []
    by_key: dict = {}
    for t, ts, a in events:
        by_key.setdefault(t, []).append((ts, a))
    for t, rows in by_key.items():
        rows.sort()
        runs: list = []
        for ts, a in rows:
            if not runs or ts - runs[-1][2] >= gap_ms:
                runs.append([ts, a, ts, a, 1])
                continue
            r = runs[-1]
            if ts > r[2]:
                r[2], r[3] = ts, a
            elif ts == r[2]:
                r[3] = max(r[3], a)
            r[4] += 1
        for i, r in enumerate(runs):
            if i < len(runs) - 1 or final_wm >= r[2] + gap_ms:
                sessions.append((t, r[1], r[3], r[4]))
    return Counter(sessions)


@pytest.mark.parametrize("seed", range(120))
def test_sessionizer_matches_batch_oracle_under_late_arrivals(seed):
    """Random event streams, random within-watermark delivery jitter,
    random micro-batch cuts: the processor's emitted session set must
    equal the batch sessionization of exactly the delivered rows."""
    rng = random.Random(seed)
    gap_ms = 10_000
    delay_ms = rng.choice([0, 1_000, 5_000, 9_999])  # always < gap
    n_keys = rng.randint(1, 4)
    events = []
    for t in range(1, n_keys + 1):
        ts = rng.randint(0, 5_000)
        for _ in range(rng.randint(1, 30)):
            # mix sub-gap steps, exact-gap boundaries, and big jumps
            ts += rng.choice([0, 1, 500, 2_000, gap_ms, gap_ms + 1,
                              3 * gap_ms])
            events.append((t, ts, ts // 1000))
    # delivery order: event time + jitter bounded by the watermark
    # delay (a row can arrive up to delay late and still be live)
    order = sorted(
        events, key=lambda e: (e[1] + rng.randint(0, delay_ms), rng.random())
    )
    # cut into random micro-batches
    batches: list = [[]]
    for ev in order:
        if batches[-1] and rng.random() < 0.35:
            batches.append([])
        batches[-1].append(ev)
    got, delivered, final_wm = _run_stream(batches, gap_ms, delay_ms)
    want = _batch_oracle(delivered, gap_ms, final_wm)
    assert got == want, (
        f"seed={seed} delay={delay_ms} batches={batches}\n"
        f"got={sorted(got.items())}\nwant={sorted(want.items())}"
    )


def test_late_ping_extends_first_boundary_backwards():
    """ADVICE-r11 medium: a within-watermark ping from a later batch
    with event time BEFORE the session's first ping must pull the
    session start back (batch semantics: start = min event time)."""
    gap = 10_000
    batches = [
        [(7, 5_000, 50), (7, 6_000, 60)],
        # wm after batch 0 = 6_000 - 5_000 = 1_000; 4_000 is live
        [(7, 4_000, 40)],
        [(8, 100_000, 1_000)],  # drives wm to flush trip 7
    ]
    got, delivered, final_wm = _run_stream(batches, gap, 5_000)
    assert got[(7, 40, 60, 3)] == 1
    assert got == _batch_oracle(delivered, gap, final_wm)


def test_pre_gap_late_ping_forms_own_session():
    """A live ping a full gap BEFORE the open session's start is its
    own session, emitted immediately (the open session's first ping
    proves the gap elapsed) — not silently merged.  Requires a
    watermark delay > gap to be reachable, hence the direct scenario."""
    gap = 10_000
    delay = 60_000
    batches = [
        [(7, 70_000, 700)],
        # wm = 10_000: a ping at 50_000 is live, 20_000 before the
        # session start = 2 gaps -> its own (already provably closed)
        # session
        [(7, 50_000, 500)],
        [(8, 200_000, 2_000)],  # flush
    ]
    got, delivered, final_wm = _run_stream(batches, gap, delay)
    assert got[(7, 500, 500, 1)] == 1
    assert got[(7, 700, 700, 1)] == 1
    assert got == _batch_oracle(delivered, gap, final_wm)


def test_single_batch_runs_fold_like_sorted_walk():
    """In-batch semantics are unchanged by the run-fold rewrite: ties
    extend (min act at the start tie group, max at the end one), the
    >= gap boundary splits, and the tail stays open."""
    gap = 10_000
    batches = [
        [(1, 1_000, 99), (1, 1_000, 11), (1, 2_000, 20),
         (1, 2_000, 25), (1, 12_000, 120),  # exactly gap after 2_000
         (1, 13_000, 130)],
        [(2, 100_000, 1_000)],  # flush
    ]
    got, delivered, final_wm = _run_stream(batches, gap, 5_000)
    assert got[(1, 11, 25, 4)] == 1
    assert got[(1, 120, 130, 2)] == 1
    assert got == _batch_oracle(delivered, gap, final_wm)
