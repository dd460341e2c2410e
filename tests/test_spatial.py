"""Ground-truth tests for the grid proximity join (operators/spatial.py)."""

from __future__ import annotations

import itertools
import math

from busdata_pipeline_spark.operators.spatial import grid_proximity_join


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, x double, y double")


def test_grid_join_equals_all_pairs_bruteforce(spark):
    # irregular cloud incl. points straddling cell boundaries
    rows = [
        (0, 0.0, 0.0), (1, 3.9, 0.0), (2, 4.1, 0.0), (3, 8.05, 0.0),
        (4, 0.0, 3.95), (5, 2.8, 2.8), (6, 7.9, 7.9), (7, 4.0, 4.0),
        (8, -3.2, -0.5), (9, -4.05, -4.05), (10, 11.9, 12.0),
    ]
    r = 4.0
    got = {
        (a, b): d
        for a, b, d in grid_proximity_join(_pts(spark, rows), r).collect()
    }
    want = {}
    for (i, xi, yi), (j, xj, yj) in itertools.combinations(rows, 2):
        d2 = (xi - xj) ** 2 + (yi - yj) ** 2
        if d2 <= r * r:
            want[(min(i, j), max(i, j))] = d2
    assert set(got) == set(want)
    for k, v in want.items():
        assert math.isclose(got[k], v, rel_tol=0, abs_tol=0), k


def test_grid_join_cross_cell_pairs_found(spark):
    # two points exactly r apart, straddling a cell edge: the 3x3 probe
    # must find them (the completeness property the oracle relies on)
    r = 2.0
    rows = [(0, 1.99, 0.0), (1, 2.01, 0.0), (2, 3.99, 0.0)]
    got = {(a, b) for a, b, _ in
           grid_proximity_join(_pts(spark, rows), r).collect()}
    assert (0, 1) in got and (1, 2) in got and (0, 2) in got


def test_grid_join_no_duplicate_pairs(spark):
    # points sharing a cell must not be emitted 9x through the probes
    rows = [(0, 0.1, 0.1), (1, 0.2, 0.2), (2, 0.3, 0.3)]
    out = grid_proximity_join(_pts(spark, rows), 5.0).collect()
    pairs = [(r.a_id, r.b_id) for r in out]
    assert len(pairs) == len(set(pairs)) == 3
