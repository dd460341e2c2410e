"""Ground-truth tests for the LLM-corpus curation wave
(plans/llm_corpus.py): planted fixtures with hand-computed expectations,
plus the house round-6 boundary-margin checks for the float outputs."""

from __future__ import annotations

import math

import pytest

from busdata_pipeline_spark.plans.llm_corpus import (
    bpe_train_frame,
    gopher_repetition_frame,
    line_dedup_frame,
    naive_bayes_frame,
)
from tests.conftest import SF001


def _docs(spark, rows, extra_cols="") -> "DataFrame":  # noqa: F821
    return spark.createDataFrame(
        rows, "doc_id long, text string" + extra_cols
    )


# ---------------------------------------------------------------------------
# paragraph dedup


def test_line_dedup_first_occurrence_wins(spark):
    # 4-token paragraphs; doc 2 repeats doc 0's first paragraph, doc 3 is
    # built ENTIRELY of earlier paragraphs and must survive as empty.
    rows = [
        (0, "a b c d e f g h"),          # paras: "a b c d", "e f g h"
        (1, "p q r s"),                  # para:  "p q r s"
        (2, "a b c d x y z w"),          # first para is a dup of doc 0's
        (3, "e f g h p q r s"),          # both paras seen earlier
    ]
    out = {
        r["doc_id"]: r
        for r in line_dedup_frame(_docs(spark, rows), para_tokens=4).collect()
    }
    assert out[0]["n_paras"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["kept_text"] == "a b c d e f g h"
    assert out[2]["n_kept"] == 1 and out[2]["kept_text"] == "x y z w"
    assert out[3]["n_kept"] == 0 and out[3]["kept_text"] == ""


def test_line_dedup_within_doc_duplicates(spark):
    # the same paragraph twice INSIDE one doc: first occurrence (lowest
    # para_idx) survives, later one is dropped — order preserved.
    rows = [(7, "a b c d m n o p a b c d")]
    r = line_dedup_frame(_docs(spark, rows), para_tokens=4).collect()[0]
    assert r["n_paras"] == 3 and r["n_kept"] == 2
    assert r["kept_text"] == "a b c d m n o p"


def test_line_dedup_ragged_tail_paragraph(spark):
    # token count not divisible by the window: the tail paragraph is the
    # remainder and still dedups against an identical tail elsewhere.
    rows = [(0, "a b c d e f"), (1, "x y z w e f")]
    out = {
        r["doc_id"]: r
        for r in line_dedup_frame(_docs(spark, rows), para_tokens=4).collect()
    }
    assert out[0]["kept_text"] == "a b c d e f"
    assert out[1]["n_paras"] == 2 and out[1]["kept_text"] == "x y z w"


# ---------------------------------------------------------------------------
# Gopher repetition


def test_gopher_repetition_hand_computed(spark):
    # "a b a b a b": 2-grams = [ab, ba, ab, ba, ab] -> occ(ab)=3, occ(ba)=2
    # each gram is 3 chars; total_chars = 11.
    # dup2 = (3-1)*3 + (2-1)*3 = 9 -> 9/11;  top2 = 3*3 = 9 -> 9/11
    # 3-grams = [aba, bab, aba, bab] -> occ 2,2 (5 chars each)
    # dup3 = (2-1)*5*2 = 10 -> 10/11
    r = gopher_repetition_frame(
        _docs(spark, [(0, "a b a b a b")])
    ).collect()[0]
    assert r["dup_2gram_frac"] == round(9 / 11, 6)
    assert r["top_2gram_frac"] == round(9 / 11, 6)
    assert r["dup_3gram_frac"] == round(10 / 11, 6)
    assert bool(r["repetitive"]) is True


def test_gopher_repetition_all_unique(spark):
    r = gopher_repetition_frame(
        _docs(spark, [(0, "q w e r t y")])
    ).collect()[0]
    assert r["dup_2gram_frac"] == 0.0
    assert r["dup_3gram_frac"] == 0.0
    assert bool(r["repetitive"]) is False
    # top fraction of an all-unique doc is one 2-gram's share
    assert r["top_2gram_frac"] == round(3 / 11, 6)


def test_gopher_short_doc_no_grams(spark):
    # single token: no 2-grams or 3-grams -> all fractions 0, not null
    r = gopher_repetition_frame(_docs(spark, [(0, "solo")])).collect()[0]
    assert r["dup_2gram_frac"] == 0.0 and r["top_2gram_frac"] == 0.0
    assert bool(r["repetitive"]) is False


# ---------------------------------------------------------------------------
# Naive Bayes quality


def test_naive_bayes_separates_planted_classes(spark):
    rows = [
        (0, "good good fine", "cur"),
        (1, "good fine fine", "cur"),
        (2, "bad bad junk", "web"),
        (3, "junk junk bad", "web"),
        (4, "good fine fine", "web"),   # crawl doc that reads curated
        (5, "bad junk junk", "cur"),    # curated doc that reads crawly
    ]
    out = {
        r["doc_id"]: r["log_odds"]
        for r in naive_bayes_frame(
            spark.createDataFrame(
                rows, "doc_id long, text string, source string"
            ),
            curated=("cur",),
        ).collect()
    }
    assert out[0] > 0 and out[1] > 0          # curated-looking positive
    assert out[2] < 0 and out[3] < 0          # crawl-looking negative
    assert out[4] > 0                          # scored by CONTENT, not label
    assert out[5] < 0


def test_naive_bayes_matches_pure_python_model(spark):
    rows = [
        (0, "x y", "cur"),
        (1, "y z z", "web"),
        (2, "x x z", "web"),
    ]
    out = {
        r["doc_id"]: r["log_odds"]
        for r in naive_bayes_frame(
            spark.createDataFrame(
                rows, "doc_id long, text string, source string"
            ),
            curated=("cur",),
        ).collect()
    }
    # closed-form NB by hand
    corpus = {0: ("x y", True), 1: ("y z z", False), 2: ("x x z", False)}
    c_pos, c_neg = {}, {}
    for _, (txt, pos) in corpus.items():
        for t in txt.split():
            (c_pos if pos else c_neg)[t] = (c_pos if pos else c_neg).get(t, 0) + 1
    vocab = set(c_pos) | set(c_neg)
    n_pos, n_neg, v = sum(c_pos.values()), sum(c_neg.values()), len(vocab)
    prior = math.log(1) - math.log(2)
    for did, (txt, _) in corpus.items():
        score = prior
        for t in txt.split():
            score += math.log(c_pos.get(t, 0) + 1) - math.log(n_pos + v)
            score -= math.log(c_neg.get(t, 0) + 1) - math.log(n_neg + v)
        assert out[did] == pytest.approx(round(score, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# BPE training


def test_bpe_learns_expected_merges(spark):
    # corpus: "aab aab ab" -> words: aab (freq 2), ab (freq 1)
    # step 1 pairs: (a,a):2  (a,b):3  -> merge (a,b) -> aab => <a><a b>,
    #   ab => <a b>
    # step 2 pairs: (a, 'a b'): 2 -> merge (a, 'a b')
    docs = _docs(spark, [(0, "aab aab ab")])
    rows = bpe_train_frame(spark, docs, n_merges=2).collect()
    by_step = {r["step"]: r for r in rows}
    assert (by_step[1]["lhs"], by_step[1]["rhs"], by_step[1]["pair_count"]) \
        == ("a", "b", 3)
    assert (by_step[2]["lhs"], by_step[2]["rhs"], by_step[2]["pair_count"]) \
        == ("a", "a b", 2)


def test_bpe_greedy_nonoverlapping_pairing(spark):
    # 'aaaa' with merge (a,a) must pair as (aa)(aa): the SECOND merge then
    # sees the pair ('a a','a a') with full weight — the overlap-consuming
    # replace semantics both engines share.
    docs = _docs(spark, [(0, "aaaa aaaa")])
    rows = bpe_train_frame(spark, docs, n_merges=2).collect()
    by_step = {r["step"]: r for r in rows}
    assert (by_step[1]["lhs"], by_step[1]["rhs"]) == ("a", "a")
    assert by_step[1]["pair_count"] == 6          # 3 adjacent pairs x 2 words
    assert (by_step[2]["lhs"], by_step[2]["rhs"]) == ("a a", "a a")
    assert by_step[2]["pair_count"] == 2


def test_bpe_tie_breaks_lexicographically(spark):
    # (a,b) and (c,d) both occur twice: the lexicographically smaller
    # pair must win in every engine.
    docs = _docs(spark, [(0, "ab ab cd cd")])
    rows = bpe_train_frame(spark, docs, n_merges=1).collect()
    assert (rows[0]["lhs"], rows[0]["rhs"]) == ("a", "b")


# ---------------------------------------------------------------------------
# round-6 boundary margins (house float discipline)


def test_round6_boundary_margin_at_driver_sf():
    """The rounded float outputs must sit away from the .5e-6 rounding
    boundary at the driver's sf, so engine summation-order deltas
    (~1e-12 relative) cannot flip the 6th decimal (house discipline,
    same check as test_unigram_logprob's margin)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF001}/documents.parquet')"
    )
    # unrounded NB log-odds margin
    [(m_nb,)] = con.execute("""
WITH lab AS (SELECT doc_id, text, source IN ('src0','src1','src2','src3')
             AS pos FROM documents),
toks AS (SELECT doc_id, pos, unnest(string_split(trim(text), ' ')) AS tok
         FROM lab),
dt AS (SELECT doc_id, tok, COUNT(*) AS c_dt FROM toks GROUP BY doc_id, tok),
ct AS (SELECT tok, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
              SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg
       FROM toks GROUP BY tok),
tot AS (SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg,
               COUNT(*) AS v FROM ct),
prior AS (SELECT ln(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE))
               - ln(CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS DOUBLE))
          AS lp FROM lab),
raw AS (
  SELECT SUM(c_dt * ln(CAST(c_pos + 1 AS DOUBLE)))
         - SUM(c_dt * ln(CAST(c_neg + 1 AS DOUBLE)))
         - SUM(c_dt) * ln(CAST(MIN(n_pos + v) AS DOUBLE))
         + SUM(c_dt) * ln(CAST(MIN(n_neg + v) AS DOUBLE)) + MIN(lp) AS x
  FROM dt JOIN ct USING (tok) CROSS JOIN tot CROSS JOIN prior
  GROUP BY dt.doc_id)
SELECT MIN(abs(abs(x * 1e6 - floor(x * 1e6)) - 0.5)) FROM raw
""").fetchall()
    assert m_nb > 1e-4, f"NB log-odds too close to a round-6 boundary: {m_nb}"
    # gopher fractions are exact int/int divisions -> both engines compute
    # the identical IEEE double before ROUND; margin check not required,
    # but assert the denominators stay comfortably under 2^53.
    [(mx,)] = con.execute(
        "SELECT MAX(length(trim(text))) FROM documents"
    ).fetchall()
    assert mx < 2 ** 53


# ---------------------------------------------------------------------------
# BPE encoding (application of learned merges)


def test_bpe_encode_fertility_hand_computed(spark):
    """corpus 'aab aab ab': merges learned = (a,b) then (a,'a b').
    After merge 1: aab -> <a><a b>, ab -> <a b>; merge 2 then fuses
    (a,'a b') so aab -> <a a b> — ONE symbol.  Both words tokenize to a
    single BPE token."""
    from busdata_pipeline_spark.plans.llm_corpus import _bpe_learn

    docs = _docs(spark, [(0, "aab aab ab")])
    _, cur = _bpe_learn(spark, docs, 2)
    from pyspark.sql import functions as F

    tokc = {
        r["word"]: r["n"]
        for r in cur.select(
            "word",
            F.size(
                F.split(F.expr("substring(seq, 2, length(seq) - 2)"), "><")
            ).alias("n"),
        ).collect()
    }
    assert tokc == {"aab": 1, "ab": 1}


# ---------------------------------------------------------------------------
# Misra-Gries exact heavy hitters


def test_heavy_hitters_exact_with_eviction_pressure(spark):
    """k smaller than the vocabulary so MG evictions actually fire; the
    output must still equal the brute-force frequent set exactly."""
    from collections import Counter

    from pyspark.sql import functions as F

    from busdata_pipeline_spark.operators.profile import heavy_hitters_exact

    words = (["alpha"] * 40 + ["beta"] * 25 + ["gamma"] * 12
             + [f"rare{i}" for i in range(60)] + ["delta"] * 8)
    toks = spark.createDataFrame(
        [(w,) for w in words], "tok string"
    ).repartition(7)
    k = 5
    got = {r["tok"]: r["cnt"] for r in heavy_hitters_exact(toks, k=k).collect()}
    n = len(words)
    want = {w: c for w, c in Counter(words).items() if c * k >= n}
    assert got == want


def test_mg_summaries_bounded(spark):
    from pyspark.sql import functions as F

    from busdata_pipeline_spark.operators.profile import mg_partition_summaries

    words = [f"w{i % 37}" for i in range(2000)]
    toks = spark.createDataFrame([(w,) for w in words], "tok string").repartition(4)
    k = 6
    sizes = (
        mg_partition_summaries(toks, k)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert all(r["count"] <= k for r in sizes)


# ---------------------------------------------------------------------------
# leakage-safe split


def test_leakage_safe_split_groups_never_straddle(spark):
    from busdata_pipeline_spark.plans.registry import QUERIES
    from tests.conftest import SF001

    out = QUERIES["td_leakage_safe_split"](spark, SF001).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values()), "cluster straddles split"
    splits = {r["split"] for r in out}
    assert splits == {"train", "val"}
    frac = sum(r["split"] == "train" for r in out) / len(out)
    assert 0.75 < frac < 1.0  # ~15/16 by construction


# ---------------------------------------------------------------------------
# incremental MinHash (signature store + delta)


def test_incremental_minhash_finds_planted_truncated_copies(spark):
    from busdata_pipeline_spark.plans.registry import QUERIES
    from tests.conftest import SF001

    out = QUERIES["td_incremental_minhash"](spark, SF001).collect()
    pairs = {(r["new_doc_id"], r["store_doc_id"]): r["jaccard"] for r in out}
    planted_new_ids = {new for new, _ in pairs if new >= 1000000}
    assert planted_new_ids, "no planted matches found"
    # every planted truncated copy must match its own base doc at
    # near-1 jaccard (one shingle-set member lost to the truncation)
    for new in planted_new_ids:
        base = new - 1000000
        assert (new, base) in pairs, f"planted copy {new} missed base {base}"
        assert pairs[(new, base)] > 0.85, (new, base, pairs[(new, base)])


# ---------------------------------------------------------------------------
# entity resolution


def test_entity_resolution_golden_record_is_longest_member(spark):
    from pyspark.sql import functions as F

    from busdata_pipeline_spark.plans.registry import QUERIES
    from busdata_pipeline_spark.sources import table
    from tests.conftest import SF001

    out = QUERIES["rel_entity_resolution"](spark, SF001).collect()
    lens = {
        r["doc_id"]: r["n"]
        for r in table(spark, SF001, "documents")
        .select("doc_id", F.length(F.trim("text")).alias("n")).collect()
    }
    for r in out:
        members = [int(x) for x in r["members"].split(",")]
        assert r["rep_doc_id"] in members
        assert r["n_members"] == len(members)
        best = max(lens[m] for m in members)
        assert lens[r["rep_doc_id"]] == best
        # ties -> lowest id
        tied = [m for m in members if lens[m] == best]
        assert r["rep_doc_id"] == min(tied)
        assert r["cluster_id"] == min(members)


# ---------------------------------------------------------------------------
# sketch overlap


def test_sketch_overlap_exact_anchors_match_bruteforce(spark):
    from pyspark.sql import functions as F

    from busdata_pipeline_spark.plans.registry import QUERIES
    from busdata_pipeline_spark.sources import table
    from tests.conftest import SF001

    out = {str(r["pair_day"]): r
           for r in QUERIES["td_sketch_overlap"](spark, SF001).collect()}
    ev = table(spark, SF001, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    ).collect()
    by_day = {}
    for r in ev:
        by_day.setdefault(str(r["d"]), set()).add(r["user_id"])
    for i in range(1, 5):
        d1, d2 = f"2024-01-0{i}", f"2024-01-0{i+1}"
        r = out[d1]
        assert r["exact_a"] == len(by_day[d1])
        assert r["exact_b"] == len(by_day[d2])
        assert r["exact_overlap"] == len(by_day[d1] & by_day[d2])
        assert bool(r["overlap_est_ok"]) is True


# ---------------------------------------------------------------------------
# geodesic suite


def test_geo_suite_matches_pure_python_haversine(spark):
    import math as m

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from busdata_pipeline_spark.sources import table
    from tests.conftest import SF001

    out = {r["event_id"]: r
           for r in entrymod.queries()["fn_geo_suite"](spark, SF001).collect()}
    ev = table(spark, SF001, "events").where(
        (F.to_date("ts") == F.lit("2024-01-01").cast("date"))
        & F.col("value").isNotNull()
    ).select("event_id", "user_id", "ts", "value").collect()
    by_user = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    R = 6371.0088
    checked = 0
    for rows in by_user.values():
        for prev, cur in zip(rows, rows[1:]):
            la1, lo1 = prev["value"] / 10 - 25, prev["user_id"] - 75.0
            la2, lo2 = cur["value"] / 10 - 25, cur["user_id"] - 75.0
            p1, p2 = m.radians(la1), m.radians(la2)
            dp, dl = m.radians(la2 - la1), m.radians(lo2 - lo1)
            h = m.sin(dp / 2) ** 2 + m.cos(p1) * m.cos(p2) * m.sin(dl / 2) ** 2
            want = 2 * R * m.asin(m.sqrt(h))
            got = out[cur["event_id"]]["dist_km"]
            assert abs(got - want) < 1e-3, (cur["event_id"], got, want)
            checked += 1
    assert checked > 100


def test_dsir_round_margin_and_selection(spark):
    """td_dsir_weights: (a) the ROUND(_,6) canonicalization has a real
    boundary margin at sf0.01 (a testdata change eroding it should fail
    here, not in the driver's hash diff); (b) the deterministic
    resampling keeps exactly the quota; (c) direction sanity — curated-
    source docs score higher on average than raw (the target LM must
    recognize its own training corpus)."""
    import duckdb
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from busdata_pipeline_spark.plans.llm_corpus import (
        _CURATED_SOURCES,
        _DSIR_QUOTA,
    )
    from busdata_pipeline_spark.sources import table
    from tests.conftest import SF001

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF001}/documents.parquet')")
    margin = con.sql(f"""
WITH lab AS (SELECT doc_id, text,
                    source IN {str(tuple(_CURATED_SOURCES))} AS tgt
             FROM documents),
toks AS (SELECT doc_id, tgt, unnest(string_split(trim(text),' ')) AS tok
         FROM lab),
tk AS (SELECT * FROM toks WHERE tok <> ''),
dt AS (SELECT doc_id, tok, COUNT(*) c_dt FROM tk GROUP BY 1,2),
ct AS (SELECT tok,
              CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) c_t,
              CAST(COUNT(*) AS BIGINT) c_r
       FROM tk GROUP BY tok),
sc AS (SELECT CAST(SUM(c_t) AS BIGINT) n_t, CAST(SUM(c_r) AS BIGINT) n_r,
              CAST(COUNT(*) AS BIGINT) v FROM ct),
x AS (SELECT doc_id,
             SUM(c_dt*(ln(CAST(c_t+1 AS DOUBLE))-ln(CAST(c_r+1 AS DOUBLE))))
               / SUM(c_dt)
             + ln(CAST(MIN(n_r+v) AS DOUBLE)) - ln(CAST(MIN(n_t+v) AS DOUBLE))
               AS w
      FROM dt JOIN ct USING (tok) CROSS JOIN sc GROUP BY doc_id)
SELECT MIN(ABS(ABS(w*1e6 - FLOOR(w*1e6)) - 0.5)) FROM x
""").fetchone()[0]
    assert margin > 1e-5, f"round-6 boundary margin eroded: {margin}"

    out = E.queries()["td_dsir_weights"](spark, SF001)
    assert out.where("selected").count() == _DSIR_QUOTA

    docs = table(spark, SF001, "documents").select("doc_id", "source")
    j = out.join(docs, "doc_id").withColumn(
        "curated", F.col("source").isin(*_CURATED_SOURCES)
    )
    means = {r["curated"]: r["m"] for r in
             j.groupBy("curated").agg(F.avg("logw").alias("m")).collect()}
    assert means[True] > means[False], means
