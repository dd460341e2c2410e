"""Graph analytics over relational facts.

The reference has no graph tier (SURVEY.md §1.1: "no graphs ... anywhere
in the reference"); this module extends the engine with the iterative
numeric-fixpoint shape that complements the boolean-fixpoint
connected-components loop (operators/clustering.py): weighted PageRank
over a graph DERIVED from the warehouse facts.

Float discipline for iterative float algorithms: hash-aggregate addend
order is engine-dependent, so per-node contribution sums can differ by
~1e-15 between Spark and DuckDB; left unchecked that delta compounds
across iterations.  The loop therefore QUANTIZES ranks to 9 decimals
after every iteration — both engines then carry bit-identical state into
the next round, so error cannot compound — and the final output rounds
to the house 6 decimals.  tests/test_graph.py measures the distance of
every pre-quantization value to the nearest 0.5e-9 boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table

#: PageRank constants — classical damping, fixed iteration count (the
#: oracle unrolls exactly this many rounds).
_DAMPING = 0.85
_ITERS = 5
#: per-iteration state quantization (see module docstring).
_QUANT = 9


def _pagerank_oracle(iters: int = _ITERS) -> str:
    """Unrolled DuckDB replay: edge derivation + every iteration."""
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(f"""
r{i} AS (
  SELECT nodes.v,
         ROUND({1 - _DAMPING} / MIN(nn.n)
               + {_DAMPING} * COALESCE(
                   SUM(p.w / wd.wu * {prev}.r), 0), {_QUANT}) AS r
  FROM nodes CROSS JOIN nn
  LEFT JOIN pairs p ON p.v = nodes.v
  LEFT JOIN wd ON wd.u = p.u
  LEFT JOIN {prev} ON {prev}.v = p.u
  GROUP BY nodes.v)""")
        prev = f"r{i}"
    return f"""
WITH e0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM e0 a JOIN e0 b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY u, v),
wd AS (SELECT u, SUM(w) AS wu FROM pairs GROUP BY u),
nodes AS (SELECT s_suppkey AS v FROM supplier),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT v, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),{",".join(steps)}
SELECT v AS s_suppkey, ROUND(r, 6) AS pagerank
FROM {prev}
"""


@query("rel_pagerank_cosuppliers", oracle=_pagerank_oracle())
def rel_pagerank_cosuppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the co-supply graph: suppliers are linked
    when they supply line items of the same order, edge weight = number
    of shared orders (the classic bipartite-projection graph used for
    entity-importance ranking over transactional facts).

    Fixed-iteration power method, damping 0.85:

        r'(v) = (1-d)/N + d · Σ_{{u→v}} (w_uv / W_u) · r(u)

    Dangling mass (suppliers with no co-supply edges) keeps the (1-d)/N
    base term only — documented identically in the oracle, which unrolls
    all 5 iterations so the driver verifies the ITERATION, not just the
    fixpoint.

    Scale shape: the edge derivation is one equi-join on l_orderkey with
    fanout bounded by items-per-order (TPC-H ≤ 7, so ≤ 42 pairs/order —
    never quadratic in a key's global frequency); per iteration, one
    rank⨝edge equi-join + one hash aggregate keyed on the destination
    node — identical loop discipline to operators/clustering.py
    (eager localCheckpoint truncates the plan every round; the graph and
    degree tables are checkpointed once and reused).  Ranks are
    quantized to 1e-9 each round so cross-engine summation-order deltas
    cannot compound (module docstring)."""
    pairs, nodes = _cosupply_graph(spark, sf_dir)
    ranks = pagerank_frame(nodes, pairs)
    return ranks.select(
        F.col("v").alias("s_suppkey"), F.round("r", 6).alias("pagerank")
    )


def _cosupply_graph(spark: SparkSession, sf_dir: str):
    """(pairs[u, v, w], nodes[v]) — the weighted co-supply graph, both
    checkpointed once for reuse across iterations."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")

    e0 = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = e0.alias("a"), e0.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = sup.select(F.col("s_suppkey").alias("v")).localCheckpoint(eager=True)
    return pairs, nodes


def pagerank_frame(
    nodes: DataFrame,
    pairs: DataFrame,
    iters: int = _ITERS,
    damping: float = _DAMPING,
) -> DataFrame:
    """Quantized power iteration over (nodes[v], pairs[u, v, w]) — the
    loop body of rel_pagerank_cosuppliers; returns (v, r) with r at
    1e-9 quantization (callers round to the output precision)."""
    wd = pairs.groupBy("u").agg(F.sum("w").alias("wu")).localCheckpoint(eager=True)
    n = float(nodes.count())

    ranks = nodes.select("v", F.lit(1.0 / n).alias("r"))
    contrib_base = pairs.join(wd, "u")
    for _ in range(iters):
        contrib = (
            contrib_base.join(ranks.withColumnRenamed("v", "u"), "u")
            .groupBy("v")
            .agg(F.sum(F.col("w") / F.col("wu") * F.col("r")).alias("m"))
        )
        # No per-round checkpoint: a FIXED iteration count builds a
        # bounded (iters-deep) plan over the checkpointed graph tables —
        # one job at the end instead of one materialization per round
        # (5.2 s → ~2 s on the sf0.1 bench).  Checkpoint-per-round is
        # for UNBOUNDED convergence loops (operators/clustering.py).
        ranks = nodes.join(contrib, "v", "left").select(
            "v",
            F.round(
                F.lit((1 - damping) / n)
                + F.lit(damping) * F.coalesce("m", F.lit(0.0)),
                _QUANT,
            ).alias("r"),
        )
    return ranks


# ---------------------------------------------------------------------------
# bounded-hop BFS (min-plus traversal — the integer-exact sibling of the
# PageRank float fixpoint; no quantization needed, distances are ints)

_BFS_HOPS = 4


def _bfs_oracle(hops: int = _BFS_HOPS) -> str:
    steps = []
    prev = "d0"
    for i in range(1, hops + 1):
        steps.append(f"""
d{i} AS (
  SELECT node, MIN(d) AS d FROM (
    SELECT node, d FROM {prev}
    UNION ALL
    SELECT sym.v AS node, {prev}.d + 1 AS d
    FROM {prev} JOIN sym ON sym.u = {prev}.node) q{i}
  GROUP BY node)""")
        prev = f"d{i}"
    return f"""
WITH e0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
sym AS (
  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
  FROM e0 a JOIN e0 b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
src AS (SELECT MIN(s_suppkey) AS s FROM supplier),
d0 AS (SELECT s AS node, 0 AS d FROM src),{",".join(steps)}
SELECT node AS s_suppkey, CAST(d AS INTEGER) AS hops FROM {prev}
"""


@query("rel_bfs_cosuppliers", oracle=_bfs_oracle())
def rel_bfs_cosuppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS from the lowest-id supplier over the co-supply
    graph: hop distance via ``_BFS_HOPS`` rounds of min-plus expansion
    (frontier ⨝ edges, union, MIN per node) — the traversal composition
    the CC loop (boolean fixpoint) and PageRank (float fixpoint) don't
    cover.  Distances are INTEGERS, so cross-engine parity is exact by
    construction; the oracle unrolls every round.  Per round: one
    equi-join on the source endpoint + one destination-keyed MIN
    aggregate over the checkpointed edge table — the same bounded-depth
    no-checkpoint plan argument as pagerank_frame."""
    pairs, nodes = _cosupply_graph(spark, sf_dir)
    sym = pairs.select("u", "v")
    dist = nodes.agg(F.min("v").alias("node")).select(
        "node", F.lit(0).alias("d")
    )
    for _ in range(_BFS_HOPS):
        ext = (
            dist.join(sym, dist["node"] == sym["u"])
            .select(F.col("v").alias("node"), (F.col("d") + 1).alias("d"))
        )
        dist = dist.unionByName(ext).groupBy("node").agg(
            F.min("d").alias("d")
        )
    return dist.select(
        F.col("node").alias("s_suppkey"), F.col("d").cast("int").alias("hops")
    )
