"""Ground-truth tests for the retrieval tier (operators/retrieval.py,
operators/setsim.py) and the round's recurrence/graph additions: every
algorithm is checked against an independent pure-Python model on either a
handcrafted corpus or the small testdata tables."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from busdata_pipeline_spark.operators.retrieval import (
    K1,
    K1P1,
    B,
    bm25_topk,
    rrf_fuse,
)
from busdata_pipeline_spark.operators.setsim import jaccard_pairs_prefix

import busdata_pipeline_spark.plans.retrieval  # noqa: E402, F401  (registers)
from busdata_pipeline_spark.plans.registry import QUERIES  # noqa: E402
from busdata_pipeline_spark.operators.temporal import ewma_smooth
from tests.conftest import SF0001


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# BM25

_CORPUS = [
    (0, "apple banana cherry"),
    (1, "apple apple durian"),
    (2, "banana cherry cherry cherry"),
    (3, "durian elderberry"),
    (4, "apple banana"),  # the query doc
]


def _bm25_model(corpus, qid):
    """Pure-Python BM25 over whitespace tokens, quantized like the
    operator (integer nano-sum)."""
    toks = {d: t.split() for d, t in corpus}
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len([d for d in dl if dl[d] > 0])
    avgdl = sum(dl.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for d, ts in toks.items():
        if d == qid:
            continue
        sq = 0
        for t in set(toks[qid]):
            tf = ts.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (float(n) - df[t] + 0.5) / (df[t] + 0.5))
            c = (idf * (tf * K1P1)) / (tf + K1 * ((1.0 - B) + (B * dl[d]) / avgdl))
            sq += math.floor(c * 1e9 + 0.5)
        if sq:
            scores[d] = sq
    return scores


def test_bm25_matches_pure_python_model(spark):
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(
            _docs(spark, _CORPUS), F.col("doc_id") == 4, k=10
        ).collect()
    }
    want = {d: round(sq / 1e9, 6) for d, sq in _bm25_model(_CORPUS, 4).items()}
    assert got == want
    # doc 0 (both query terms) must outrank doc 1 (one high-tf term)
    assert got[0] > got[1]


def test_bm25_rank_is_dense_and_capped(spark):
    out = bm25_topk(_docs(spark, _CORPUS), F.col("doc_id") == 4, k=2).collect()
    assert sorted(r["rank"] for r in out) == [1, 2]


# ---------------------------------------------------------------------------
# RRF fusion

def test_rrf_fusion_scores_and_order(spark):
    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "qid long, id long, rank int"
    )
    vec = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "qid long, id long, rank int"
    )
    got = {
        r["doc_id"]: (r["rrf"], r["rank"])
        for r in rrf_fuse(lex, vec, k=10).collect()
    }
    # doc 11 is in both lists -> highest fused score
    assert got[11] == (round(1.0 / 62 + 1.0 / 61, 6), 1)
    assert got[10] == (round(1.0 / 61, 6), 2)  # id tie-break beats 12
    assert got[12] == (round(1.0 / 62, 6), 3)


# ---------------------------------------------------------------------------
# prefix-filter set-similarity join

def _shingles(text: str, w: int = 3) -> set:
    ws = [t for t in text.strip().split(" ") if t]
    return {" ".join(ws[i:i + w]) for i in range(len(ws) - w + 1)}


def _setsim_model(rows):
    tsets = {d: _shingles(t) for d, t in rows}
    want = {}
    for a, b in itertools.combinations(sorted(tsets), 2):
        ta, tb = tsets[a], tsets[b]
        if not ta or not tb:
            continue
        inter, uni = len(ta & tb), len(ta | tb)
        if inter * 10 >= uni * 9:
            want[(a, b)] = round(inter / uni, 6)
    return want


def test_setsim_equals_bruteforce_on_handcrafted_corpus(spark):
    base = "a b c d e f g h i j k l m n o p q r s t"
    rows = [
        (0, base),                    # 18 shingles
        (1, base + " u"),             # J(0,1) = 18/19 >= 0.9
        (2, base),                    # J(0,2) = 1.0
        (3, "a b c x " + base),       # heavy prefix perturbation
        (4, "z y x"),                 # single disjoint shingle
        (5, ""),                      # no shingles -> excluded
        (6, "one two"),               # shorter than the window -> excluded
    ]
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in jaccard_pairs_prefix(_docs(spark, rows)).collect()}
    want = _setsim_model(rows)
    assert got == want
    assert (0, 2) in got and got[(0, 2)] == 1.0
    assert (0, 1) in got and got[(0, 1)] == round(18 / 19, 6)
    assert all(5 not in p and 6 not in p for p in got)


def test_setsim_complete_vs_bruteforce_on_testdata(spark):
    from busdata_pipeline_spark.sources import table

    docs = table(spark, SF0001, "documents")
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in jaccard_pairs_prefix(docs).collect()}
    rows = [(r["doc_id"], r["text"])
            for r in docs.select("doc_id", "text").collect()]
    assert got == _setsim_model(rows)  # completeness: no pair lost


# ---------------------------------------------------------------------------
# EWMA recurrence

def test_ewma_matches_sequential_model(spark):
    rows = [
        (1, 1, 10.0), (2, 1, 20.0), (3, 1, 15.0),
        (4, 2, 5.0), (5, 2, None), (6, 2, 7.0),
    ]
    ev = spark.createDataFrame(
        [(i, __import__("datetime").datetime(2024, 1, 1, 0, 0, i), u, v)
         for i, u, v in rows],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = {r["event_id"]: r["ewma"]
           for r in ewma_smooth(ev, alpha=0.3).collect()}
    assert got[1] == 10.0
    assert got[2] == 0.7 * 10.0 + 0.3 * 20.0
    assert got[3] == 0.7 * (0.7 * 10.0 + 0.3 * 20.0) + 0.3 * 15.0
    # nulls are excluded, not zero-filled: event 6 follows event 4's state
    assert 5 not in got
    assert got[6] == 0.7 * 5.0 + 0.3 * 7.0


def test_ewma_null_key_is_one_group(spark):
    """All null-key rows fold as ONE group (groupBy semantics): the
    first null-key row starts the run with s = x_1, later null-key rows
    continue it — NaN/None key comparisons must not restart the fold,
    and the 'no key yet' sentinel must not collide with a NULL key."""
    import datetime

    rows = [(1, None, 10.0), (2, None, 20.0), (3, 1, 4.0), (4, None, 30.0)]
    ev = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1, 0, 0, i), u, v)
         for i, u, v in rows],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = {r["event_id"]: r["ewma"]
           for r in ewma_smooth(ev, alpha=0.3).collect()}
    assert got[1] == 10.0                       # starts the null-key run
    assert got[2] == 0.7 * 10.0 + 0.3 * 20.0    # continues it
    assert got[4] == 0.7 * got[2] + 0.3 * 30.0  # still the same group
    assert got[3] == 4.0                        # real key unaffected


def test_ewma_partitioning_invariant(spark):
    from busdata_pipeline_spark.sources import table

    ev = table(spark, SF0001, "events").limit(500)
    a = {r["event_id"]: r["ewma"]
         for r in ewma_smooth(ev.repartition(1)).collect()}
    b = {r["event_id"]: r["ewma"]
         for r in ewma_smooth(ev.repartition(13)).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# triangle count

def test_triangle_count_matches_bruteforce(spark):
    from busdata_pipeline_spark.plans.graph import rel_triangle_count
    from busdata_pipeline_spark.sources import table

    row = rel_triangle_count(spark, SF0001).collect()[0]

    li = table(spark, SF0001, "lineitem").select(
        "l_orderkey", "l_suppkey").distinct().collect()
    by_order = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_suppkey"])
    weights = {}
    for sups in by_order.values():
        for u, v in itertools.combinations(sorted(sups), 2):
            weights[(u, v)] = weights.get((u, v), 0) + 1
            weights[(v, u)] = weights.get((v, u), 0) + 1
    from busdata_pipeline_spark.plans.graph import _TRI_TOPK

    # top-K strongest directed edges per node (w desc, neighbor asc),
    # union over both endpoints, canonicalized u < v
    by_node = {}
    for (u, v), w in weights.items():
        by_node.setdefault(u, []).append((-w, v))
    edges = set()
    for u, nbrs in by_node.items():
        for _, v in sorted(nbrs)[:_TRI_TOPK]:
            edges.add((min(u, v), max(u, v)))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(
        1
        for u, v in edges
        for w in adj[u] & adj[v]
        if v < w  # count each triangle once at its smallest-id edge
    )
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    assert row["transitivity"] == round(6 * tri / (2 * wedges), 6)


# ---------------------------------------------------------------------------
# statistical additions: Welch t-test + seasonal decomposition, checked
# against independent pure-Python models over the sf0.001 events table

def test_welch_ttest_matches_python_model(spark):
    import math

    import __spark_entry__ as E

    row = E.queries()["rel_ab_welch_ttest"](spark, SF0001).collect()[0]

    from busdata_pipeline_spark.sources import table
    ev = table(spark, SF0001, "events").where(
        F.col("value").isNotNull()).collect()
    a, b = [], []
    for r in ev:
        # Sunday=6, Saturday=5 in weekday(); weekend split
        (a if r["ts"].weekday() >= 5 else b).append(
            math.floor(r["value"] * 100.0 + 0.5))
    def moments(xs):
        n = len(xs); s = sum(xs); q = sum(x * x for x in xs)
        m = s / (100.0 * n)
        v = (q / 10000.0 - n * (m * m)) / (n - 1)
        return n, m, v
    na, ma, va = moments(a)
    nb, mb, vb = moments(b)
    se = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se)
    dof = (se * se) / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["mean_a"] == round(ma, 6) and row["mean_b"] == round(mb, 6)
    assert abs(row["t_stat"] - t) < 1e-5
    assert abs(row["welch_dof"] - dof) < 1e-3


def test_seasonal_decompose_identity_and_nulls(spark):
    import __spark_entry__ as E

    rows = E.queries()["rel_seasonal_decompose"](spark, SF0001).collect()
    rows.sort(key=lambda r: r["d"])
    # edges: first/last 3 days have no trend (7-row frame incomplete)
    for r in rows[:3] + rows[-3:]:
        assert r["trend"] is None and r["residual"] is None
    for r in rows[3:-3]:
        assert r["trend"] is not None
        # additive identity up to the per-component 6-decimal output
        # rounding (3 components x 0.5e-6) + 1e-9 quantization steps
        assert abs(
            r["daily_mean"] - (r["trend"] + r["seasonal"] + r["residual"])
        ) < 2.5e-6
    # seasonal is a pure day-of-week function
    seas = {}
    for r in rows:
        seas.setdefault(r["d"].weekday(), set()).add(r["seasonal"])
    assert all(len(v) == 1 for v in seas.values())


def test_hard_negatives_exclude_near_positives(spark, sf_dir):
    """Every mined negative clears the Jaccard near-positive bar, ranks
    are dense per query, and the exclusion actually bites (some BM25
    top-20 candidates were rejected)."""
    import pyspark.sql.functions as F

    from busdata_pipeline_spark.operators import retrieval as ret

    rows = QUERIES["td_hard_negatives"](spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r["jaccard"] < 0.75
        assert r["neg_id"] != r["qid"]
        by_q.setdefault(r["qid"], []).append(r["neg_rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10
    # the near-positive exclusion removed candidates: fewer negatives
    # than the raw BM25 shortlist provides
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qpred = (F.col("doc_id") % 100 == 0) & (F.col("doc_id") < 2000)
    raw = ret.bm25_topk(docs, qpred, k=20).count()
    assert len(rows) < raw
