"""Overflow-headroom pins for the integer-unit money sums.

Round 9's 100× differential replaced order-dependent double SUMs with
exact per-row BIGINT unit sums (SCALE.md) — which trades float drift
for a new failure mode: a BIGINT sum that silently wraps once a single
group's row count × per-row unit magnitude passes int64.  Round 9's own
docstring measured the unsplit charge sum at ~9× from the edge at a
10M-row group — i.e. a 1000×-class rung would have wrapped.

Round 10 split every high-magnitude unit column into HI/LO pairs
(sum_exact_units, plans/relational.py): each half's per-row peak is
≤ ~1e6, so the wrap point moves from ~1e8 rows to ~1e13 rows per group.
This test pins that arithmetic against MEASURED data maxima (sf0.001 —
the value distribution, not the row count, is what scales) so a future
unit-scale change that silently re-shrinks the margin fails CI.

Design scale: a 100 TB lineitem is ~6e11 rows (TPC-H SF ~1e5).  The
worst group is the whole table in ONE group (Q17/Q19 single-group, the
cube's ALL/ALL cell).  We require ≥10× margin at that scale for every
summed unit column.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
INT64_MAX = 2**63 - 1
ROWS_100TB = 6.0e11          # whole-table single group at ~100 TB
MARGIN = 10.0                # required safety factor at that scale
HI_LO_DIV = 1_048_576       # sum_exact_units split divisor (2^20 shift/mask)


def _max_units():
    """(label, per-row peak units, split?) for every BIGINT unit sum in
    the registry's money queries, from measured data maxima."""
    con = duckdb.connect()
    row = con.execute(
        f"""
        SELECT
          MAX(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)),
          MAX(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)),
          MAX(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0
                         + 0.5) AS BIGINT)),
          MAX(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         * 1000000.0 + 0.5) AS BIGINT)),
          MAX(CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))
        FROM read_parquet('{SF_DIR}/lineitem.parquet')
        """
    ).fetchone()
    q2, p2, d4, c6, dc2 = row
    (tp2,) = con.execute(
        f"""SELECT MAX(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchone()
    con.close()
    return [
        # unsplit sums: per-row peak must clear the margin on its own
        ("q1.q2  (quantity centi)", q2, False),
        ("q1.dc2 (discount centi)", dc2, False),
        # hi/lo split sums: the binding half is max(peak // 1e6, 1e6-1)
        ("q1.p2  (price cents, split)", p2, True),
        ("q1/q5/q7/q15/q19.d4 (disc_price 1e-4, split)", d4, True),
        ("q1.c6  (charge 1e-6, split)", c6, True),
        ("gsets.totalprice cents (split)", tp2, True),
    ]


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_money_unit_sums_have_margin_at_100tb_whole_table_group():
    for label, peak, split in _max_units():
        assert peak is not None and peak > 0, label
        per_row = max(peak // HI_LO_DIV, HI_LO_DIV - 1) if split else peak
        margin = INT64_MAX / (per_row * ROWS_100TB)
        assert margin >= MARGIN, (
            f"{label}: per-row worst half {per_row} units leaves only "
            f"{margin:.1f}x margin for a {ROWS_100TB:.0e}-row group "
            f"(need >= {MARGIN}x) — split this sum or shrink its unit scale"
        )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_unsplit_charge_sum_would_have_wrapped():
    """Regression direction-check: the round-9 UNSPLIT charge sum really
    was the hazard the docstring warned about — without the hi/lo split
    the same 100 TB whole-table group wraps int64."""
    c6 = next(u for label, u, _ in _max_units() if label.startswith("q1.c6"))
    assert c6 * ROWS_100TB > INT64_MAX, (
        "charge units shrank enough that the unsplit sum is now safe — "
        "update the headroom story in plans/relational.py if intentional"
    )
