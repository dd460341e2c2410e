"""Whole-surface physical-plan lint: every registered query, one set of
global invariants.  Complements test_plan_shapes.py (which pins specific
plans) by guaranteeing no query anywhere in the surface regresses into
the three classic Spark scale-killers:

1. a cartesian product / broadcast nested-loop join,
2. row-at-a-time Python UDFs (BatchEvalPython) — Python is allowed only
   behind Arrow (mapInPandas / ArrowEvalPython),
3. a driver-side collect hidden inside query construction (asserted
   indirectly: building every plan under a tiny driver memory budget is
   covered by the suite's runtime; here we check the explain output).

Runs on plans only (no execution), so linting 100+ queries stays cheap.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF001

QUERIES = entrymod.queries()

#: queries whose *construction* runs jobs (iterative label propagation,
#: driver-broadcast query sets) — their final plan is still linted, but
#: they are the documented exceptions to "plan construction is free".
CONSTRUCTION_RUNS_JOBS = {
    "td_dup_clusters", "td_dedup_summary", "td_cosine_topk",
    # BPE merge loop: N bounded 1-row argmax collects during training
    "td_bpe_train", "td_bpe_encode",
    # PageRank power iterations: per-round checkpoints + node count
    "rel_pagerank_cosuppliers",
    # PQ codebook training: bounded ksub x dsub mean collects per subspace
    "td_pq_ann",
    # CC label propagation inside the split assignment
    "td_leakage_safe_split",
    # signature-store write + checkpointed delta result
    "td_incremental_minhash",
    # CC label propagation inside the resolution workflow
    "rel_entity_resolution",
    # versioned-table writes + txn manifests during construction
    "etl_multi_table_txn",
    # co-supply graph checkpoint during construction
    "rel_bfs_cosuppliers",
    # oriented edge list checkpointed during construction
    "rel_triangle_count",
    # vector leg collects the (bounded) query matrix during construction
    "td_rrf_hybrid_search",
}

#: streaming queries build temp checkpoint dirs; lint batch surface only.
def _lintable_names():
    return sorted(n for n in QUERIES if not n.startswith("st_"))


@pytest.fixture(scope="module")
def plans(spark):
    jexp = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out = {}
    for name in _lintable_names():
        df = QUERIES[name](spark, SF001)
        out[name] = df._jdf.queryExecution().explainString(jexp)
    return out


def test_no_cartesian_products_anywhere(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian products in: {bad}"


#: BroadcastNestedLoopJoin is acceptable ONLY as scalar expansion — a
#: conditionless join whose broadcast side is a 1-row aggregate (global
#: bounds / corpus count / avg) or a deliberately tiny literal set
#: (query×centroid routing).  Each entry documents which join that is.
SCALAR_EXPANSION_BNLJ = {
    "rel_q22_rich_active_customers",  # scalar subquery: global avg(acctbal)
    "rel_resample_hourly_ffill",      # 1-row (min,max) span broadcast
    "rel_resample_linear_interp",     # 1-row (min,max) span broadcast
    "td_dedup_summary",               # 1-row total-docs aggregate
    "td_tfidf_top_terms",             # 1-row corpus doc count (idf)
    "td_unigram_logprob",             # 1-row corpus token total (ln N)
    "td_ccnet_perplexity_buckets",    # same 1-row token-total broadcast
    "td_ivf_ann",                     # queries × nlist centroids routing
    "rel_q11_important_parts",        # 1-row global value-sum threshold
    "td_mixture_resample",            # 1-row feasible-total (T) broadcast
    "td_sketches",                    # 1-row sketch/anchor aggregates recombined
    "td_naive_bayes_quality",         # 1-row class totals + prior broadcast
    "td_dsir_weights",                # 1-row (N_t, N_r, V) LM totals broadcast
    "td_pq_ann",                      # bounded query-dtab set × corpus codes
                                      # (ADC is a broadcast map by design)
    "td_heavy_hitters",               # 1-row corpus-total broadcast threshold
    "etl_cusum_changepoint",          # 1-row grand-mean broadcast
    "etl_psi_drift",                  # 1-row bucket-totals broadcast
    "etl_benford_audit",              # 1-row digit-total broadcast
    "td_bm25_search",                 # 1-row (N, avgdl) corpus stats broadcast
    "td_rrf_hybrid_search",           # inherits the BM25 stats broadcast
    "td_hard_negatives",              # inherits the BM25 stats broadcast
    "rel_triangle_count",             # 1-row tri/wedge/count aggregates joined
    "td_temperature_mix",             # 1-row (Σweights, budget) broadcast
    "rel_spatial_hotspots",           # 1-row global cell moments broadcast
    "rel_abc_pareto",                 # 1-row grand-total broadcast
    "rel_blocking_quality",           # bounded 200-id labeled-sample
                                      # all-pairs ground truth + 1-row
                                      # metric-count recombination
    "rel_bootstrap_ci",               # 200-row literal replica-id range
                                      # × calendar-bounded series; 1-row
                                      # obs × picks recombination
    "rel_theil_sen",                  # calendar-bounded daily series
                                      # (~2.4k rows at ANY corpus size):
                                      # the all-pairs slope join is a
                                      # constant ~2.9M-row relation
}


def test_no_nested_loop_joins_anywhere(plans):
    bad = [n for n, p in plans.items()
           if "BroadcastNestedLoopJoin" in p
           and n not in SCALAR_EXPANSION_BNLJ]
    assert not bad, f"undocumented nested-loop joins in: {bad}"


def test_no_row_at_a_time_python_udfs(plans):
    """BatchEvalPython = per-row Python (pickled, no Arrow).  Only
    Arrow-batched Python (ArrowEvalPython / mapInPandas / FlatMapsInPandas
    nodes) is allowed in any registered plan."""
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDFs in: {bad}"


def test_every_scan_prunes_columns(plans):
    """No registered query may scan ALL columns of lineitem or events
    (the two widest fact tables) unless it genuinely projects them; a
    full-width ReadSchema on a narrow query means pruning regressed."""
    FULL = {
        "lineitem": 11,
        "events": 6,
    }
    offenders = []
    for name, p in plans.items():
        for line in p.splitlines():
            m = re.search(r"ReadSchema: struct<(.+)>$", line.strip())
            if not m:
                continue
            cols = m.group(1).count(":")
            for tbl, width in FULL.items():
                # scans are identified by their location line nearby; a
                # cheap sufficient proxy: a scan as wide as the full table
                # that includes its signature first column name.
                sig = {"lineitem": "l_orderkey", "events": "event_id"}[tbl]
                if cols >= width and sig in m.group(1):
                    offenders.append((name, tbl, cols))
    allowed = set()
    bad = [o for o in offenders if o[0] not in allowed]
    assert not bad, f"full-width scans (pruning regressed): {bad}"


def test_aqe_wraps_every_shuffling_plan(plans):
    """Every plan that shuffles must be adaptive (AQE re-plans joins and
    splits skewed partitions at runtime — part of the 100 TB posture).
    Exchange-free pure projections are not wrapped by AQE, which is fine:
    there is nothing to re-plan."""
    bad = [
        n for n, p in plans.items()
        if re.search(r"\(\d+\) Exchange", p) and "AdaptiveSparkPlan" not in p
        # label-propagation / power-iteration outputs read from
        # checkpointed RDDs whose remaining one-stage plan AQE has
        # nothing to re-plan
        and n not in {"td_dup_clusters", "rel_pagerank_cosuppliers",
                      "td_leakage_safe_split", "rel_entity_resolution"}
    ]
    assert not bad, f"non-adaptive shuffling plans: {bad}"
