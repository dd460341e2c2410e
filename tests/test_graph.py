"""Ground-truth tests for plans/graph.py (weighted PageRank)."""

from __future__ import annotations

import duckdb
import pytest

from busdata_pipeline_spark.plans.graph import _DAMPING, _QUANT, pagerank_frame
from busdata_pipeline_spark.plans.registry import QUERIES
from tests.conftest import SF001


def _pure_python_pagerank(nodes, edges, iters=5, damping=_DAMPING):
    """The identical quantized iteration in plain Python (dict algebra)."""
    n = len(nodes)
    wu = {}
    for u, _, w in edges:
        wu[u] = wu.get(u, 0.0) + w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        m = {v: 0.0 for v in nodes}
        for u, v, w in edges:
            m[v] += (w / wu[u]) * r[u]
        r = {
            v: round((1 - damping) / n + damping * m[v], _QUANT)
            for v in nodes
        }
    return r


def test_pagerank_matches_pure_python_on_handcrafted_graph(spark):
    # star + chain: 1 feeds 2 and 3; 2 and 3 feed each other; 4 dangling.
    nodes = [1, 2, 3, 4]
    edges = [
        (1, 2, 2.0), (1, 3, 1.0),
        (2, 3, 1.0), (3, 2, 1.0),
        (2, 1, 1.0),
    ]
    nd = spark.createDataFrame([(v,) for v in nodes], "v long")
    ed = spark.createDataFrame(edges, "u long, v long, w double")
    got = {r["v"]: r["r"] for r in pagerank_frame(nd, ed).collect()}
    want = _pure_python_pagerank(nodes, edges)
    for v in nodes:
        assert got[v] == pytest.approx(want[v], abs=2e-9), v
    # dangling node holds only the base term through every iteration
    assert got[4] == pytest.approx(round((1 - _DAMPING) / 4, _QUANT), abs=2e-9)
    # probability mass is conserved up to the (documented) dangling leak
    assert 0.5 < sum(got.values()) <= 1.0 + 1e-6


def test_pagerank_weight_sensitivity(spark):
    # v=2 receives a double-weight edge from 1; with equal in-degree
    # counts, 2 must outrank 3.
    nd = spark.createDataFrame([(1,), (2,), (3,)], "v long")
    ed = spark.createDataFrame(
        [(1, 2, 2.0), (1, 3, 1.0), (2, 3, 1.0), (3, 2, 1.0)],
        "u long, v long, w double",
    )
    got = {r["v"]: r["r"] for r in pagerank_frame(nd, ed).collect()}
    assert got[2] > got[3] > got[1]


def test_pagerank_quantization_margin_at_driver_sf():
    """Per-iteration pre-quantization values must sit away from the
    0.5e-9 rounding boundary, so the ~1e-15 cross-engine summation-order
    deltas cannot flip the quantized state (the property that makes the
    iterative float loop strict-hashable at all)."""
    con = duckdb.connect()
    for t in ("lineitem", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF001}/{t}.parquet')"
        )
    [(margin,)] = con.execute(f"""
WITH e0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v, CAST(COUNT(*) AS DOUBLE) AS w
  FROM e0 a JOIN e0 b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY u, v),
wd AS (SELECT u, SUM(w) AS wu FROM pairs GROUP BY u),
nodes AS (SELECT s_suppkey AS v FROM supplier),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT v, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
raw1 AS (
  SELECT nodes.v,
         {1 - _DAMPING} / MIN(nn.n)
         + {_DAMPING} * COALESCE(SUM(p.w / wd.wu * r0.r), 0) AS x
  FROM nodes CROSS JOIN nn
  LEFT JOIN pairs p ON p.v = nodes.v
  LEFT JOIN wd ON wd.u = p.u
  LEFT JOIN r0 ON r0.v = p.u
  GROUP BY nodes.v)
SELECT MIN(abs(abs(x * 1e{_QUANT} - floor(x * 1e{_QUANT})) - 0.5)) FROM raw1
""").fetchall()
    assert margin > 1e-4, f"iteration-1 value near quantization boundary: {margin}"


def test_mad_outliers_hand_computed(spark):
    """Planted group: values {1..9} plus a 100 outlier.  med/MAD are
    computed over the 10 values; only the 100 crosses 3*1.4826*MAD."""
    from busdata_pipeline_spark.plans import relational_ext  # noqa: F401
    from busdata_pipeline_spark.plans.registry import QUERIES
    import statistics

    # run the registered query against a temp parquet dir shaped like the
    # events table
    import tempfile, os
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    rows = [(i, None, i, "t", v, None) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = QUERIES["rel_mad_outliers"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    med = statistics.median(vals)                      # 5.5
    mad = statistics.median(sorted(abs(v - med) for v in vals))  # 2.5
    assert r["med"] == med and r["mad"] == mad
    assert r["n_outliers"] == 1
    assert r["max_robust_z"] == round((100.0 - med) / (1.4826 * mad), 6)


def test_bfs_hand_checked_distances(spark):
    """Tiny chain + branch graph: distances must equal hand BFS, and
    unreached nodes (beyond the hop bound) must be absent."""
    from busdata_pipeline_spark.plans.graph import _BFS_HOPS  # noqa: F401
    from pyspark.sql import functions as F

    # replicate the query loop on a handcrafted sym edge table
    sym = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (9, 10), (10, 9)],
        "u long, v long",
    )
    dist = spark.createDataFrame([(1, 0)], "node long, d int")
    for _ in range(2):  # 2 hops only
        ext = dist.join(sym, dist["node"] == sym["u"]).select(
            F.col("v").alias("node"), (F.col("d") + 1).alias("d")
        )
        dist = dist.unionByName(ext).groupBy("node").agg(F.min("d").alias("d"))
    got = {r["node"]: r["d"] for r in dist.collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # 4 is 3 hops away; 9/10 disconnected


def test_kcore_hindex_matches_replay_and_bounds(spark, sf_dir):
    """Pure-Python h-index replay: the query's 5-round values match
    exactly, decrease monotonically from the degree, and stay >= the
    true coreness (fixpoint of the same iteration)."""
    import collections

    import busdata_pipeline_spark.plans.graph as g

    rows = QUERIES["rel_kcore_hindex"](spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    by_order = collections.defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    adj = collections.defaultdict(set)
    for parts in by_order.values():
        for u in parts:
            for v in parts:
                if u != v:
                    adj[u].add(v)

    def h_round(c):
        nc = {}
        for u, ns in adj.items():
            vals = sorted((c[v] for v in ns), reverse=True)
            h = 0
            for r, x in enumerate(vals, 1):
                if x >= r:
                    h = r
                else:
                    break
            nc[u] = h
        return nc

    c = {u: len(ns) for u, ns in adj.items()}
    seq = [c]
    for _ in range(g._HIDX_ITERS):
        seq.append(h_round(seq[-1]))
    want = seq[-1]
    # fixpoint for the true coreness lower bound
    fix = dict(seq[-1])
    while True:
        nxt = h_round(fix)
        if nxt == fix:
            break
        fix = nxt

    assert len(rows) == len(adj)
    for r in rows:
        v = r["p_partkey"]
        assert r["degree"] == len(adj[v])
        assert r["core_ub"] == want[v]
        # monotone upper bound: degree >= round-5 value >= coreness
        assert r["degree"] >= r["core_ub"] >= fix[v] > 0
