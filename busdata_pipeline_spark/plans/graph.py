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
WITH e0 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS MATERIALIZED (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM e0 a JOIN e0 b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY u, v),
wd AS MATERIALIZED (SELECT u, SUM(w) AS wu FROM pairs GROUP BY u),
nodes AS MATERIALIZED (SELECT s_suppkey AS v FROM supplier),
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

    # Per-order supplier sets via ONE hash aggregate (collect_set dedups
    # in-flight), pairs by double explode of the ≤|items-per-order|
    # array — semantically identical to the DISTINCT + orderkey
    # self-join the oracle spells, but with no sort-merge join: two
    # narrow shuffles, map-sized memory (the self-join's per-task SMJ
    # sort of the 10x-replica fact flirted with OOM on a vanilla 1 GB
    # session and cost the edge-derivation its 2.2x ladder growth).
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("ss")
    )
    pairs = (
        per_order.select(F.explode("ss").alias("u"), "ss")
        .select("u", F.explode("ss").alias("v"))
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint(eager=True)
    )
    # nodes is NOT checkpointed (round-12): it is a bare dimension scan
    # (1 parquet column, no shuffle) — re-executing it per consumer costs
    # less than the extra materialization job the checkpoint added
    # (measured ~0.5 s/query at sf0.1); pairs, which IS the expensive
    # multi-shuffle lineage, keeps its checkpoint.
    nodes = sup.select(F.col("s_suppkey").alias("v"))
    return pairs, nodes


def pagerank_frame(
    nodes: DataFrame,
    pairs: DataFrame,
    iters: int = _ITERS,
    damping: float = _DAMPING,
) -> DataFrame:
    """Quantized power iteration over (nodes[v], pairs[u, v, w]) — the
    loop body of rel_pagerank_cosuppliers; returns (v, r) with r at
    1e-9 quantization (callers round to the output precision).

    Contract: edge endpoints are drawn from ``nodes`` (the FK-clean
    co-supply derivation guarantees it) — the round-12 loop carries
    ranks over the receiver set instead of re-joining the node table
    every round, so an edge from OUTSIDE the node set would contribute
    its base-rank mass rather than being silently dropped the way the
    old per-round ``nodes`` join happened to."""
    wd = pairs.groupBy("u").agg(F.sum("w").alias("wu")).localCheckpoint(eager=True)
    n = float(nodes.count())

    base_expr = lambda m: F.round(  # noqa: E731 - shared round expression
        F.lit((1 - damping) / n) + F.lit(damping) * m, _QUANT
    )
    # Round-12 (guide §2.4): a node's rank departs from the constant
    # round((1-d)/n + d·0.0) only while it RECEIVES contributions, so
    # the per-round ``nodes LEFT JOIN contrib`` — five dimension scans
    # + five joins re-deriving the receiving/non-receiving split — is
    # replaced by carrying ranks over the receiver set alone:
    # non-receiving contribution sources coalesce to the constant
    # (1/n in round 1, the base term after), and the node table is
    # attached by ONE final left join with the identical expression,
    # so every emitted double is bit-equal to the old form's.  (On the
    # co-supply graph the edge relation is symmetric and FK-clean, so
    # receivers == sources == every connected node and the coalesce
    # never fires inside the loop; it is the general-graph contract —
    # pure sources, dangling nodes — that keeps it.)
    ranks = None  # round 1: r is the 1/n literal everywhere
    contrib_base = pairs.join(wd, "u")
    for _ in range(iters):
        if ranks is None:
            scored, r_expr = contrib_base, F.lit(1.0 / n)
        else:
            scored = contrib_base.join(
                ranks.withColumnRenamed("v", "u"), "u", "left"
            )
            r_expr = F.coalesce("r", base_expr(F.lit(0.0)))
        contrib = (
            scored.groupBy("v")
            .agg(F.sum(F.col("w") / F.col("wu") * r_expr).alias("m"))
        )
        ranks = contrib.select("v", base_expr(F.col("m")).alias("r"))
    return nodes.join(ranks, "v", "left").select(
        "v",
        F.coalesce("r", base_expr(F.lit(0.0))).alias("r"),
    )


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
WITH e0 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
sym AS MATERIALIZED (
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


# ---------------------------------------------------------------------------
# triangle counting (degree-ordered orientation — the motif-counting
# composition; all-integer, so parity is exact by construction)

#: strong-tie sparsifier: keep each node's TOP-K strongest co-supply
#: edges (weight = shared orders, ties on neighbor id), union over both
#: endpoints — the k-NN graph construction.  The raw projection
#: densifies toward a complete graph as facts grow (every supplier pair
#: eventually shares SOME order; an absolute weight cut re-densifies the
#: moment weights inflate — measured 6× wall on the 10× ladder rung
#: with a w≥6 cut), while top-K bounds edges at |V|·K REGARDLESS of
#: fact volume: triangle cost then scales with the node set, not with
#: how much history the warehouse has accumulated.
_TRI_TOPK = 10

_TRI_ORACLE = f"""
WITH e0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pw AS MATERIALIZED (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v, CAST(COUNT(*) AS BIGINT) AS w
  FROM e0 a JOIN e0 b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY u, v),
topk AS (
  SELECT u, v FROM (
    SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY w DESC, v) AS r
    FROM pw) x
  WHERE r <= {_TRI_TOPK}),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v FROM topk),
sym AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u),
ok AS MATERIALIZED (
  SELECT u, ROW_NUMBER() OVER (ORDER BY d, u) AS okey FROM deg),
eo AS MATERIALIZED (
  SELECT CASE WHEN ou.okey < ov.okey THEN und.u ELSE und.v END AS s,
         CASE WHEN ou.okey < ov.okey THEN und.v ELSE und.u END AS t
  FROM und
  JOIN ok ou ON ou.u = und.u
  JOIN ok ov ON ov.u = und.v),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM eo e1
  JOIN eo e2 ON e2.s = e1.s
  JOIN ok oa ON oa.u = e1.t
  JOIN ok ob ON ob.u = e2.t
  JOIN eo e3 ON e3.s = e1.t AND e3.t = e2.t
  WHERE oa.okey < ob.okey),
wed AS (SELECT CAST(SUM(d * (d - 1)) AS BIGINT) AS w2 FROM deg),
cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d) // 2 AS BIGINT) AS n_edges
        FROM deg)
SELECT cnt.n_nodes, cnt.n_edges, CAST(wed.w2 // 2 AS BIGINT) AS n_wedges,
       tri.n_triangles,
       ROUND(CAST(6 * tri.n_triangles AS DOUBLE) / wed.w2, 6) AS transitivity
FROM tri CROSS JOIN wed CROSS JOIN cnt
"""


@query("rel_triangle_count", oracle=_TRI_ORACLE)
def rel_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global transitivity over the co-supply graph via
    degree-ordered orientation (the standard MapReduce-era trick:
    Suri & Vassilvitskii 2011, "Counting triangles and the curse of the
    last reducer").  Each undirected edge is oriented from the
    lower-(degree, id) endpoint, so every wedge is generated at its
    lowest-order corner: per-node fan-out is bounded by out-degree,
    which the orientation caps near sqrt(m) even on skewed graphs — the
    hub node never becomes the quadratic reducer.  The closing-edge
    check is one equi-join against the oriented edge list.  All counts
    are integers, transitivity = 6T / Σ d(d-1) — exact cross-engine.

    Extends the graph tier's fixpoints (CC / PageRank / BFS) with the
    motif-counting composition; the reference has no graph surface
    (SURVEY.md §1.1)."""
    from pyspark.sql import Window

    pairs, _nodes = _cosupply_graph(spark, sf_dir)
    wtop = Window.partitionBy("u").orderBy(F.desc("w"), F.asc("v"))
    topk = (
        pairs.withColumn("_r", F.row_number().over(wtop))
        .where(F.col("_r") <= _TRI_TOPK)
        .select("u", "v")
    )
    und = topk.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct().localCheckpoint(eager=True)
    sym = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # total-order key by (degree, id): dimension-sized global window
    # (node table), broadcast back onto edges.
    ok = deg.select(
        "u", "d",
        F.row_number().over(Window.orderBy(F.asc("d"), F.asc("u"))).alias("okey"),
    )
    oku = ok.select(F.col("u").alias("_u"), F.col("okey").alias("oku"))
    okv = ok.select(F.col("u").alias("_v"), F.col("okey").alias("okv"))
    # Carry the HEAD endpoint's order key on the oriented edge itself
    # (round-12, guide §2.3): the wedge stage below needs each wedge
    # arm's okey only to order the two arms, and the wedge stream is
    # the largest relation in the query — re-attaching okeys there cost
    # two broadcast-hash probes over every wedge; one extra int column
    # on the |E|-sized checkpoint is free by comparison.
    eo = (
        und
        .join(F.broadcast(oku), F.col("u") == F.col("_u"))
        .join(F.broadcast(okv), F.col("v") == F.col("_v"))
        .select(
            F.when(F.col("oku") < F.col("okv"), F.col("u"))
            .otherwise(F.col("v")).alias("s"),
            F.when(F.col("oku") < F.col("okv"), F.col("v"))
            .otherwise(F.col("u")).alias("t"),
            F.greatest("oku", "okv").alias("ot"),
        )
        .localCheckpoint(eager=True)
    )
    e1 = eo.select(F.col("s"), F.col("t").alias("a"), F.col("ot").alias("oka"))
    e2 = eo.select(F.col("s"), F.col("t").alias("b"), F.col("ot").alias("okb"))
    wedges = (
        e1.join(e2, "s")
        .where(F.col("oka") < F.col("okb"))
        .select("a", "b")
    )
    closing = eo.select(F.col("s").alias("a"), F.col("t").alias("b"))
    tri = (
        wedges.join(closing, ["a", "b"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    wed = deg.agg(F.sum(F.col("d") * (F.col("d") - 1)).alias("w2"))
    cnt = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("CAST(SUM(d) div 2 AS BIGINT)").alias("n_edges"),
    )
    return (
        tri.join(F.broadcast(wed))
        .join(F.broadcast(cnt))
        .select(
            "n_nodes",
            "n_edges",
            F.expr("CAST(w2 div 2 AS BIGINT)").alias("n_wedges"),
            "n_triangles",
            F.round(
                (F.lit(6) * F.col("n_triangles")).cast("double") / F.col("w2"), 6
            ).alias("transitivity"),
        )
    )


# ---------------------------------------------------------------------------
# frequency label propagation (community detection — the integer-exact
# argmax fixpoint completing the numeric (PageRank) / min-plus (BFS) /
# counting (triangles) graph tier)

_LPA_ITERS = 3


def _lpa_oracle(iters: int = _LPA_ITERS) -> str:
    """Unrolled synchronous LPA replay: every iteration's argmax is
    re-derived, so the driver verifies the ITERATION (weighted
    neighbor-label scores, tie-breaks) and not just the fixpoint.
    ``pairs`` is MATERIALIZED: DuckDB inlines CTEs by default and the
    edge derivation is referenced once per unrolled round."""
    steps = []
    prev = "l0"
    for i in range(1, iters + 1):
        steps.append(f""",
l{i} AS (
  SELECT {prev}.v, COALESCE(b{i}.nlab, {prev}.lab) AS lab
  FROM {prev} LEFT JOIN (
    SELECT v, lab AS nlab FROM (
      SELECT p.v, {prev}.lab,
             ROW_NUMBER() OVER (PARTITION BY p.v
               ORDER BY SUM(p.w) DESC, {prev}.lab) AS rn
      FROM pairs p JOIN {prev} ON {prev}.v = p.u
      GROUP BY p.v, {prev}.lab) q{i} WHERE rn = 1) b{i}
    ON b{i}.v = {prev}.v)""")
        prev = f"l{i}"
    return f"""
WITH e0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS MATERIALIZED (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS w
  FROM e0 a JOIN e0 b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY u, v),
nodes AS (SELECT s_suppkey AS v FROM supplier),
l0 AS (SELECT v, v AS lab FROM nodes){"".join(steps)}
SELECT v AS s_suppkey, CAST(lab AS BIGINT) AS community
FROM {prev} ORDER BY s_suppkey
"""


@query("rel_label_propagation", oracle=_lpa_oracle())
def rel_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous weighted label propagation over the co-supply graph
    (community detection): every node starts as its own label; each
    round v adopts the label with the LARGEST summed edge weight among
    its neighbors (tie -> smallest label), isolated nodes keep their
    own.  Deterministic — weights are BIGINT shared-order counts and
    the argmax is a total order (score DESC, label ASC), so there is
    no float state at all and the oracle replays every round exactly.

    Scale shape: per iteration one rank-join on u (labels are |V|-sized,
    the broadcast side at any realistic |V|) + one hash aggregate on
    (v, lab) + one hash-agg argmax on v — the argmax is
    max(struct(s, -lab)) rather than a row_number window (round-12):
    the struct max is the same total order (score DESC, label ASC,
    integer-exact) but aggregates with map-side partial combine
    instead of shuffling every (v, lab) score into a per-v SORT.  Same
    bounded-plan discipline as rel_pagerank_cosuppliers (fixed
    iteration count over the checkpointed edge table; no per-round
    materialization).

    Round-12 (guide §2.4): the per-round ``labels LEFT JOIN best``
    coalesce is replaced by ``best UNION iso``.  The graph is fixed, so
    a node either has neighbors — then it receives contributions and
    appears in EVERY round's argmax — or is isolated and keeps its own
    label forever; the left join re-derived that partition of the node
    set every round (measured ~0.47 s/round of pure join/stage
    overhead on 1k-row inputs).  ``iso`` is computed once against the
    checkpointed edge table.  Round 1 additionally skips the rank
    join: labels start as the identity and the edge list is distinct
    per (u, v), so the round-1 (v, lab, s) relation IS (v, u, w) —
    both rewrites old-vs-new cross-checked identical at sf0.1."""
    pairs, nodes = _cosupply_graph(spark, sf_dir)
    pairs_i = pairs.select(
        "u", "v", F.col("w").cast("long").alias("wi")
    )
    iso = (
        nodes.join(pairs_i.select("v").distinct(), "v", "left_anti")
        .select("v", F.col("v").alias("lab"))
        .localCheckpoint(eager=True)
    )

    def argmax_round(contrib: DataFrame) -> DataFrame:
        return (
            contrib.groupBy("v")
            .agg(
                F.max(F.struct(F.col("s"), (-F.col("lab")).alias("nl")))
                .alias("m")
            )
            .select("v", (-F.col("m.nl")).alias("lab"))
        )

    labels = argmax_round(
        pairs_i.select("v", F.col("u").alias("lab"), F.col("wi").alias("s"))
    ).unionByName(iso)
    for _ in range(_LPA_ITERS - 1):
        labels = argmax_round(
            pairs_i.join(labels.withColumnRenamed("v", "u"), "u")
            .groupBy("v", "lab")
            .agg(F.sum("wi").alias("s"))
        ).unionByName(iso)
    return labels.select(
        F.col("v").alias("s_suppkey"), F.col("lab").cast("long").alias("community")
    ).orderBy("s_suppkey")


#: h-index coreness iteration depth (the oracle unrolls exactly this
#: many rounds; convergence to exact coreness on this graph takes ~38
#: rounds — the fixed-round value is the documented monotone upper
#: bound, exact after enough rounds).
_HIDX_ITERS = 5


def _hindex_oracle(iters: int = _HIDX_ITERS) -> str:
    """Unrolled h-index coreness replay over the part co-occurrence
    graph.  H(v) = max_j min(j, x_j) over v's neighbor values sorted
    descending — tie-order-invariant, so ROW_NUMBER needs no tiebreak.
    ``pairs`` is MATERIALIZED (referenced once per unrolled round)."""
    steps = []
    prev = "c0"
    for i in range(1, iters + 1):
        steps.append(f""",
c{i} AS (
  SELECT u AS v, CAST(MAX(LEAST(rn, c)) AS BIGINT) AS c
  FROM (
    SELECT p.u, {prev}.c,
           CAST(ROW_NUMBER() OVER (PARTITION BY p.u
             ORDER BY {prev}.c DESC) AS BIGINT) AS rn
    FROM pairs p JOIN {prev} ON {prev}.v = p.v) q{i}
  GROUP BY u)""")
        prev = f"c{i}"
    return f"""
WITH e0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM e0 a JOIN e0 b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY u, v),
c0 AS (SELECT u AS v, CAST(COUNT(*) AS BIGINT) AS c
       FROM pairs GROUP BY u){"".join(steps)}
SELECT c0.v AS p_partkey, c0.c AS degree, {prev}.c AS core_ub
FROM c0 JOIN {prev} ON {prev}.v = c0.v
ORDER BY p_partkey
"""


@query("rel_kcore_hindex", oracle=_hindex_oracle())
def rel_kcore_hindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by h-index iteration (Lü et al. 2016,
    "The H-index of a network node") over the part co-occurrence graph:
    c_0(v) = deg(v); c_{t+1}(v) = H-index of v's neighbors' values;
    the sequence decreases monotonically to the exact coreness.  Fixed
    5 rounds emit the bounded-latency UPPER BOUND (the early-
    stopping form used in practice; exact peeling on this graph needs
    ~38 rounds — raise the loop bound for exactness, same plan per
    round).  Per round: one equi-join of the checkpointed edge list
    against the |V|-sized value relation + one window per destination
    node + one hash aggregate — the bounded-plan discipline of the
    PageRank/LPA loops; all state is BIGINT, no float drift possible.
    Scale: the part-co-occurrence edge list is catalog-bounded (parts ×
    avg co-order partners) — measured constant across the 10×/100×
    replicas, so the 5 iteration rounds cost the same at any SF; only
    the one-pass edge DERIVATION (per-order collect_set over the fact)
    scales with the corpus."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pairs = (
        per_order.select(F.explode("ps").alias("u"), "ps")
        .select("u", F.explode("ps").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    c = pairs.groupBy(F.col("u").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    deg = c.select(F.col("v"), F.col("c").alias("degree"))
    win = Window.partitionBy("u").orderBy(F.desc("c"))
    for _ in range(_HIDX_ITERS):
        c = (
            pairs.join(c, "v")
            .select("u", "c", F.row_number().over(win).cast("long").alias("rn"))
            .groupBy(F.col("u").alias("v"))
            .agg(F.max(F.least("rn", "c")).cast("long").alias("c"))
        )
    return (
        deg.join(c, "v")
        .select(
            F.col("v").alias("p_partkey"),
            "degree",
            F.col("c").alias("core_ub"),
        )
        .orderBy("p_partkey")
    )
