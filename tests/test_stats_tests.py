"""Semantic pins for the distribution-test / FK-audit tier
(plans/stats_tests.py) — the invariants an oracle diff can't isolate:
the MWU statistic against a hand-computed tie-heavy example, KS bounds
and sensitivity, ACF range and lag-0 degeneracy, and the FK audit
actually catching planted orphans.  Oracle parity itself is covered by
test_oracle_parity / driver_sim."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

import busdata_pipeline_spark.plans.sketch_filters  # noqa: F401  (registers)
import busdata_pipeline_spark.plans.stats_tests  # noqa: F401  (registers)
from busdata_pipeline_spark.plans.registry import QUERIES


def _mwu_reference(x1: list[float], x2: list[float]):
    """Textbook tie-corrected MWU (z from the normal approximation)."""
    pooled = sorted([(v, 1) for v in x1] + [(v, 2) for v in x2])
    n = len(pooled)
    ranks: dict[int, float] = {}
    i = 0
    r1 = 0.0
    tie_t = 0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        avg_rank = (i + 1 + j) / 2.0  # ranks i+1..j
        t = j - i
        tie_t += t * t * t - t
        for k in range(i, j):
            if pooled[k][1] == 1:
                r1 += avg_rank
        i = j
    n1, n2 = len(x1), len(x2)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    sigma = math.sqrt(
        n1 * n2 / 12.0 * ((n + 1) - tie_t / (n * (n - 1)))
    )
    return u1, (u1 - mu) / sigma


def test_mwu_matches_textbook_on_events(spark, sf_dir):
    row = QUERIES["rel_mannwhitney_value"](spark, sf_dir).collect()[0]
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & F.col("event_type").isin("click", "view")
        )
        .select("event_type", "value")
        .collect()
    )
    x1 = [r["value"] for r in ev if r["event_type"] == "click"]
    x2 = [r["value"] for r in ev if r["event_type"] == "view"]
    u1, z = _mwu_reference(x1, x2)
    assert row["n1"] == len(x1) and row["n2"] == len(x2)
    assert abs(row["u1"] - u1) < 1e-6
    assert abs(row["z_score"] - round(z, 6)) < 2e-6


def test_mwu_u_bounds(spark, sf_dir):
    row = QUERIES["rel_mannwhitney_value"](spark, sf_dir).collect()[0]
    # 0 <= U1 <= n1*n2 always
    assert 0.0 <= row["u1"] <= row["n1"] * row["n2"]


def test_ks_matches_textbook_on_events(spark, sf_dir):
    row = QUERIES["rel_ks_2sample"](spark, sf_dir).collect()[0]
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & F.col("event_type").isin("click", "view")
        )
        .select("event_type", "value")
        .collect()
    )
    x1 = sorted(r["value"] for r in ev if r["event_type"] == "click")
    x2 = sorted(r["value"] for r in ev if r["event_type"] == "view")
    values = sorted(set(x1) | set(x2))
    import bisect

    d = 0.0
    for v in values:
        f1 = bisect.bisect_right(x1, v) / len(x1)
        f2 = bisect.bisect_right(x2, v) / len(x2)
        d = max(d, abs(f1 - f2))
    assert 0.0 <= row["d_stat"] <= 1.0
    assert abs(row["d_stat"] - round(d, 6)) < 2e-6


def test_autocorr_shape_and_range(spark, sf_dir):
    rows = QUERIES["rel_autocorr_daily"](spark, sf_dir).collect()
    assert [r["lag"] for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    # pair counts strictly decrease by one per extra lag step
    ns = [r["n"] for r in rows]
    assert all(ns[i] == ns[i + 1] + 1 for i in range(6))
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0


def test_fk_audit_clean_on_generated_data(spark, sf_dir):
    rows = QUERIES["etl_fk_integrity_audit"](spark, sf_dir).collect()
    assert len(rows) == 7
    by_edge = {r["edge"]: r for r in rows}
    # generator data is referentially intact
    assert all(r["orphan_keys"] == 0 and r["orphan_rows"] == 0 for r in rows)
    li = by_edge["lineitem.l_orderkey->orders"]
    assert li["child_rows"] >= li["distinct_child_keys"] > 0


def test_fk_audit_catches_planted_orphans(spark, sf_dir, tmp_path):
    """Plant orphan FK rows in a copied sf dir and assert the audit
    counts them exactly (keys and rows separately)."""
    import shutil

    d = str(tmp_path / "sfcorrupt")
    shutil.copytree(sf_dir, d)
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    # deterministic row pick + eager materialization: a bare limit(3)
    # gives no cross-action row guarantee, so the count below could see
    # different rows than the write
    bad = (
        li.orderBy("l_orderkey", "l_linenumber")
        .limit(3)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.lit(10**12))
    )
    # two rows share one bogus key, one row gets another
    bad = bad.withColumn(
        "l_orderkey",
        F.when(
            F.col("l_linenumber") % 2 == 0, F.col("l_orderkey") + 1
        ).otherwise(F.col("l_orderkey")),
    ).localCheckpoint(eager=True)
    planted = li.unionAll(bad)
    # materialize BEFORE replacing the file the lazy plans read
    n_bad_keys = bad.select("l_orderkey").distinct().count()
    planted.write.mode("overwrite").parquet(f"{d}/lineitem_new.parquet")
    import os

    os.remove(f"{d}/lineitem.parquet")  # source sf dirs hold plain files
    shutil.move(f"{d}/lineitem_new.parquet", f"{d}/lineitem.parquet")
    rows = QUERIES["etl_fk_integrity_audit"](spark, d).collect()
    rec = {r["edge"]: r for r in rows}["lineitem.l_orderkey->orders"]
    assert rec["orphan_rows"] == 3
    assert rec["orphan_keys"] == n_bad_keys


def test_bh_fdr_flags_are_prefix_monotone(spark, sf_dir):
    rows = QUERIES["rel_welch_bh_fdr"](spark, sf_dir).collect()
    assert len(rows) == 5
    by_rank = sorted(rows, key=lambda r: r["bh_rank"])
    # BH significance is a prefix of the p-ranked list
    flags = [r["significant"] for r in by_rank]
    assert flags == sorted(flags, reverse=True)
    # ranks are a permutation of 1..m
    assert sorted(r["bh_rank"] for r in rows) == [1, 2, 3, 4, 5]
    for r in rows:
        assert 0.0 <= r["p_approx"] <= 1.0000001


def test_bh_p_matches_erfc_reference(spark, sf_dir):
    """The A&S 7.1.26 polynomial is within 1.5e-7 of true erfc — pin
    the query's p against Python's math.erfc."""
    rows = QUERIES["rel_welch_bh_fdr"](spark, sf_dir).collect()
    for r in rows:
        true_p = math.erfc(abs(r["t_stat"]) / math.sqrt(2.0))
        assert abs(r["p_approx"] - true_p) < 2e-6


def test_dp_release_replays_laplace_inverse_cdf(spark, sf_dir):
    import hashlib

    rows = QUERIES["td_dp_laplace_release"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        h = int(
            hashlib.md5(f"{r['lang']}|{r['source']}".encode())
            .hexdigest()[:15],
            16,
        )
        u = (h % 999998 + 1) / 1000000.0
        w = u - 0.5
        noise = -(
            (0.0 if w == 0 else math.copysign(1.0, w))
            * math.log(1.0 - 2.0 * abs(w))
        )
        assert abs(r["noise"] - round(noise, 6)) < 2e-6
        assert abs(r["n_released"] - round(r["n_true"] + noise, 6)) < 2e-6
        assert r["epsilon"] == 1.0
    # Laplace(b=1): mean absolute noise is b — loose corpus-level check
    mean_abs = sum(abs(r["noise"]) for r in rows) / len(rows)
    assert 0.4 < mean_abs < 2.5


def _daily(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.expr(
                "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))"
                " div 100000"
            ).alias("x"),
            F.count(F.lit(1)).alias("y"),
        )
        .orderBy("d")
        .collect()
    )
    return [r["x"] for r in rows], [r["y"] for r in rows]


def test_runs_test_matches_replay(spark, sf_dir):
    row = QUERIES["rel_runs_test"](spark, sf_dir).collect()[0]
    x, _ = _daily(spark, sf_dir)
    signs = [1 if b > a else 0 for a, b in zip(x, x[1:]) if b != a]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert row["n1"] == n1 and row["n2"] == n2 and row["n_runs"] == runs
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1.0
    sig = math.sqrt(
        (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) / (n * n * (n - 1))
    )
    assert abs(row["z_score"] - round((runs - mu) / sig, 6)) < 2e-6


def _avg_ranks(v):
    order = sorted(range(len(v)), key=lambda i: v[i])
    ranks = [0.0] * len(v)
    i = 0
    while i < len(v):
        j = i
        while j < len(v) and v[order[j]] == v[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def test_spearman_matches_replay(spark, sf_dir):
    row = QUERIES["rel_spearman_rho"](spark, sf_dir).collect()[0]
    x, y = _daily(spark, sf_dir)
    rx, ry = _avg_ranks(x), _avg_ranks(y)
    n = len(x)
    mx = sum(rx) / n
    my = sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)) * math.sqrt(
        sum((b - my) ** 2 for b in ry)
    )
    assert row["n"] == n
    assert abs(row["rho"] - round(num / den, 6)) < 5e-6
    assert -1.0 <= row["rho"] <= 1.0


def test_cramers_v_matches_replay(spark, sf_dir):
    row = QUERIES["rel_cramers_v"](spark, sf_dir).collect()[0]
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow"),
        )
        .collect()
    )
    from collections import Counter

    cells = Counter((r["event_type"], r["dow"]) for r in ev)
    rt = Counter()
    ct = Counter()
    for (t, d), n in cells.items():
        rt[t] += n
        ct[d] += n
    tot = sum(cells.values())
    chi2 = 0.0
    for (t, d), n in cells.items():
        e = rt[t] * ct[d] / tot
        chi2 += math.floor((n - e) * (n - e) / e * 1e6 + 0.5) / 1e6
    v = math.sqrt(chi2 / (tot * (min(len(rt), len(ct)) - 1)))
    assert row["n_obs"] == tot
    assert row["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert abs(row["chi2"] - round(chi2, 6)) < 5e-6
    assert abs(row["cramers_v"] - round(v, 6)) < 5e-6
    assert 0.0 <= row["cramers_v"] <= 1.0


def test_bootstrap_ci_replays_hash_draws(spark, sf_dir):
    import hashlib

    row = QUERIES["rel_bootstrap_ci"](spark, sf_dir).collect()[0]
    x, _ = _daily(spark, sf_dir)
    n = len(x)
    sums = []
    for b in range(200):
        sx = 0
        for j in range(n):
            h = int(
                hashlib.md5(f"{b}:{j}".encode()).hexdigest()[:15], 16
            )
            sx += x[h % n]
        sums.append(sx)
    sums.sort()
    assert row["n_days"] == n and row["n_boot"] == 200
    assert abs(row["mean_obs"] - round(sum(x) / n, 6)) < 2e-6
    assert abs(row["ci_lo"] - round(sums[4] / n, 6)) < 2e-6
    assert abs(row["ci_hi"] - round(sums[194] / n, 6)) < 2e-6
    assert row["ci_lo"] < row["mean_obs"] < row["ci_hi"]


def test_market_basket_lift_metrics_are_consistent(spark, sf_dir):
    rows = QUERIES["rel_market_basket_lift"](spark, sf_dir).collect()
    assert len(rows) == 20
    e0 = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = e0.select("l_orderkey").distinct().count()
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows[:5]:
        # replay the rule's counts exactly
        both = (
            e0.where(F.col("l_partkey") == r["ant"])
            .select("l_orderkey")
            .intersect(
                e0.where(F.col("l_partkey") == r["cons"]).select("l_orderkey")
            )
            .count()
        )
        ca = e0.where(F.col("l_partkey") == r["ant"]).count()
        cb = e0.where(F.col("l_partkey") == r["cons"]).count()
        assert r["n_both"] == both
        assert abs(r["support"] - round(both / n_orders, 6)) < 2e-6
        assert abs(r["confidence"] - round(both / ca, 6)) < 2e-6
        assert abs(r["lift"] - round((both / ca) / (cb / n_orders), 6)) < 2e-6
