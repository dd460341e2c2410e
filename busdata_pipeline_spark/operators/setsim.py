"""Exact set-similarity self-join via prefix filtering (AllPairs /
PPJoin family — Bayardo, Ma & Srikant, WWW 2007; Xiao et al., WWW 2008).

Completes the near-duplicate ladder (operators/dedup.py: MinHash-LSH and
SimHash are probabilistic candidate generators) with the EXACT variant:
every pair of documents whose token-set Jaccard similarity ≥ τ, no false
negatives, no n² scan.

How it scales
-------------
The classic inverted-index prefix filter, expressed relationally:

1. tokens are globally ordered by ascending document frequency (rarest
   first, ties on the token string) — one aggregate + one dimension-sized
   ranking, broadcast back onto the token stream;
2. each document keeps only its **prefix**: the first
   ``|d| - ceil(τ·|d|) + 1`` tokens in that global order.  Two sets with
   Jaccard ≥ τ MUST share at least one prefix token (pigeonhole on the
   required overlap), so the candidate pairs are an equi-join on prefix
   tokens — and because prefixes are drawn from the RARE end of the
   vocabulary, posting lists in the join are short by construction (the
   skew profile is the inverse of the BM25 probe's);
3. a length filter (``τ·|a| ≤ |b|``) prunes candidates before the
   verify join recomputes the exact intersection.

With τ = 9/10 all threshold comparisons reduce to exact integer
arithmetic (``10·x ≥ 3·y``), so the pair set is engine-identical with no
float boundary anywhere.  The definitional all-pairs oracle makes the
driver verify COMPLETENESS of the candidate generator, not just the
verify step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Jaccard threshold as an exact rational (numerator / denominator).
TAU_NUM = 9
TAU_DEN = 10

#: shingle width.  Sets are 3-word shingles, not unigrams: the synthetic
#: corpus is template-generated over a ~31-token vocabulary, so unigram
#: sets make nearly ALL pairs similar (τ=0.3 matches 95% of all pairs)
#: and give the prefix filter nothing rare to key on; shingling restores
#: a 16k-term vocabulary where prefixes are genuinely selective — the
#: same reason the MinHash tier shingles (operators/dedup.py).
SHINGLE_W = 3


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, tok) with per-document distinct ``SHINGLE_W``-word
    shingles (space-joined).  Docs shorter than the window have no rows
    — same convention as the MinHash shingler."""
    w = SHINGLE_W
    return (
        docs.withColumn(
            "_ws",
            F.filter(F.split(F.trim("text"), " "), lambda x: x != ""),
        )
        .withColumn("_n", F.size("_ws"))
        .where(F.col("_n") >= w)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - (w - 1)),
                    lambda i: F.concat_ws(
                        " ",
                        *[F.element_at("_ws", (i + j).cast("int"))
                          for j in range(w)],
                    ),
                )
            ).alias("tok"),
        )
        .distinct()
    )


#: adaptive-quotient routing threshold: the distinct-text quotient only
#: pays off when texts are REPLICATED (its candidate bound is corpus
#: diversity instead of replication²); when the corpus is ~all-distinct
#: the rep/expand machinery is pure overhead (round-12's worst bench
#: regression, 2.07 → 2.58 s at sf0.1 where 4,992 of 5,000 texts are
#: distinct).  Both routes compute the identical relation, so the probe
#: may be approximate; 0.9 leaves >2σ of margin over the HLL's 5% rsd
#: on an all-distinct corpus, and heavy replication (the 100× rung sits
#: at ratio ≈ 0.01) lands far below it.
_QUOTIENT_BYPASS_RATIO = 0.9


def jaccard_pairs_prefix(docs: DataFrame) -> DataFrame:
    """All (a, b, jaccard) pairs with a < b and Jaccard ≥ TAU_NUM/TAU_DEN
    over distinct shingle sets, via prefix filtering.

    Round-12 (ORACLES.md rule 16, mirrored engine-side): the prefix
    kernel runs once per DISTINCT trimmed text (rep = the text's
    minimum member doc id) and verdicts expand back to doc pairs —
    identical texts shingle identically, so same-text pairs are
    jaccard 1.0 exactly (when the set is nonempty) and cross-text
    verdicts are functions of the text pair alone.  Pre-quotient, the
    prefix-token equi-join scales with text replication SQUARED: the
    100x replica (100 copies of every text) spilled ~80 GB of shuffle
    and filled the disk — caught by the round-12 100x campaign —
    while the distinct-text kernel is bounded by corpus diversity.

    Round-13 (guide §2.4 — don't shuffle what you don't need): the
    quotient is ADAPTIVE.  One cheap probe (count + HLL distinct over
    the text hash — a single scan-and-tiny-agg job at any scale)
    measures the distinct ratio; when texts are ~all distinct the
    md5-groupBy rep build, its eager checkpoint, and the four
    expansion joins are skipped and the kernel runs on the documents
    directly — the two routes compute the SAME relation on any input
    (each doc is ~its own rep and ``within`` is ~empty), so an
    approximate probe cannot change the output, only the plan."""
    th = F.md5(F.trim("text"))
    probe = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(th).alias("nd"),
    ).first()
    if probe["nd"] >= _QUOTIENT_BYPASS_RATIO * probe["n"]:
        return _prefix_rep_pairs(docs.select("doc_id", "text"))
    hdocs = docs.select("doc_id", th.alias("h"))
    # rep per hash via a doc_id-keyed min + a join to fetch the rep's
    # text: grouping by (h, text) directly would shuffle every doc's
    # FULL TEXT as part of the grouping key
    # eager localCheckpoint: the rep table (one row per DISTINCT text —
    # bounded by corpus diversity, the quotient's invariant) feeds the
    # prefix kernel's five token-stream derivations plus the expansion
    # legs; materializing it once replaces ~7 re-executions of the
    # scan + min-groupBy + text-fetch join.
    reps = (
        hdocs.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        .join(docs.select("doc_id", F.trim("text").alias("text")),
              "doc_id")
        .localCheckpoint(eager=True)
    )
    rep_pairs = _prefix_rep_pairs(reps.select("doc_id", "text"))
    rep_h = reps.select(F.col("doc_id").alias("rid"), F.col("h").alias("rh"))
    # same shingleability gate as shingle_sets: >= SHINGLE_W words
    nonempty = reps.where(
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
        >= SHINGLE_W
    ).select("h")
    xa, xb = hdocs.alias("xa"), hdocs.alias("xb")
    within = (
        xa.join(F.broadcast(nonempty), "h")
        .join(xb, (F.col("xa.h") == F.col("xb.h"))
              & (F.col("xa.doc_id") < F.col("xb.doc_id")))
        .select(F.col("xa.doc_id").alias("a"),
                F.col("xb.doc_id").alias("b"),
                F.lit(1.0).alias("jaccard"))
    )
    rp_h = (
        rep_pairs
        .join(rep_h.withColumnRenamed("rid", "a")
              .withColumnRenamed("rh", "ha"), "a")
        .join(rep_h.withColumnRenamed("rid", "b")
              .withColumnRenamed("rh", "hb"), "b")
        .select("ha", "hb", "jaccard")
    )
    # symmetrize in ONE pass: a union of rp_h with its column-swapped
    # self would execute the whole rep-pair kernel lineage TWICE (no
    # exchange reuse across the two branches — measured 160 vs 100
    # exchanges in the executed plan); exploding both orientations out
    # of a single row touches the kernel once.
    sym = rp_h.select(
        F.explode(F.array(
            F.struct(F.col("ha"), F.col("hb"), F.col("jaccard")),
            F.struct(F.col("hb").alias("ha"), F.col("ha").alias("hb"),
                     F.col("jaccard")),
        )).alias("s")
    ).select("s.ha", "s.hb", "s.jaccard")
    cross = (
        sym.join(xa, F.col("xa.h") == F.col("ha"))
        .join(xb, (F.col("xb.h") == F.col("hb"))
              & (F.col("xb.doc_id") > F.col("xa.doc_id")))
        .select(F.col("xa.doc_id").alias("a"),
                F.col("xb.doc_id").alias("b"), "jaccard")
    )
    return within.unionByName(cross)


def _prefix_rep_pairs(docs: DataFrame) -> DataFrame:
    """The doc-level AllPairs/PPJoin kernel (prefix filter + positional
    filter + exact verify) — since round 12 invoked on one rep per
    distinct text by jaccard_pairs_prefix."""
    toks = shingle_sets(docs)

    # global rarity order: df ascending, token string as the total-order
    # tie-break.  The df table is vocabulary-sized (a dimension at any
    # corpus scale — it's the same table a tokenizer vocab is) and
    # broadcasts onto the token stream; ordering positions are computed
    # PER DOCUMENT (the (df, tok) pair is the order key directly), so no
    # global rank window ever materializes.
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    sized = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))

    # prefix length p = sz - ceil(τ·sz) + 1, all-integer:
    # ceil(n·sz/d) = (n·sz + d-1) div d.
    ranked = (
        toks.join(F.broadcast(dfreq), "tok")
        .join(sized, "doc_id")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.asc("df"), F.asc("tok")
                )
            ),
        )
        .withColumn(
            "pfx_len",
            F.col("sz")
            - F.expr(f"({TAU_NUM} * sz + {TAU_DEN - 1}) div {TAU_DEN}")
            + F.lit(1),
        )
    )
    prefix = ranked.where(F.col("pos") <= F.col("pfx_len")).select(
        "doc_id", "tok", "sz", "pos"
    )

    # candidates: share a prefix token, canonical a < b, and the length
    # filter τ·|a| ≤ |b| (sets too small relative to a cannot reach τ).
    a = prefix.select(
        F.col("doc_id").alias("a"), "tok",
        F.col("sz").alias("sa"), F.col("pos").alias("ia"),
    )
    b = prefix.select(
        F.col("doc_id").alias("b"), "tok",
        F.col("sz").alias("sb"), F.col("pos").alias("jb"),
    )
    # PPJoin positional filter (Xiao et al., WWW 2008 §3.2): both docs'
    # token sequences follow the SAME global (df, tok) order, so for the
    # minimal-order matched prefix token — positions i in a, j in b —
    # every other shared token sits after i in a AND after j in b
    # (case-split on prefix membership; consistent ordering makes each
    # case land beyond one of the two positions, hence beyond the min).
    # Thus |A∩B| ≤ 1 + min(sa−i, sb−j), which must reach the overlap
    # bound α = ceil(τ·(sa+sb)/(1+τ)) — all-integer with rational τ.
    # Among matched tokens min(ia) and min(jb) are attained by the same
    # (minimal-order) token, so the per-pair reduction is two MINs; the
    # groupBy replaces the old DISTINCT (same shuffle) and the filter
    # prunes the candidate set BEFORE the expensive verify join — the
    # candidate-density² growth flagged in SCALE.md.
    tau_sum = TAU_NUM + TAU_DEN
    cand = (
        a.join(b, "tok")
        .where(
            (F.col("a") < F.col("b"))
            & (F.col("sa") * TAU_NUM <= F.col("sb") * TAU_DEN)
            & (F.col("sb") * TAU_NUM <= F.col("sa") * TAU_DEN)
        )
        .groupBy("a", "b", "sa", "sb")
        .agg(F.min("ia").alias("ia"), F.min("jb").alias("jb"))
        .where(
            F.lit(1) + F.least(
                F.col("sa") - F.col("ia"), F.col("sb") - F.col("jb")
            )
            >= F.expr(
                f"({TAU_NUM} * (sa + sb) + {tau_sum - 1}) div {tau_sum}"
            )
        )
        .select("a", "b", "sa", "sb")
    )

    # verify: exact intersection size via one token equi-join restricted
    # to candidate docs (semi-join pushes the candidate filter into the
    # token stream before the shuffle).  sa/sb ride through the groupBy
    # (they are functions of (a, b)) so ``cand`` is consumed exactly
    # once — joining the verified counts back to ``cand`` would execute
    # its token-equi-join + positional-filter lineage a second time.
    # Every candidate pair shares its matched prefix token, so the
    # inner join preserves every pair (inter ≥ 1 by construction).
    ta = toks.select(F.col("doc_id").alias("a"), "tok")
    tb = toks.select(F.col("doc_id").alias("b"), "tok")
    return (
        cand
        .join(ta, "a")
        .join(tb, ["b", "tok"])
        .groupBy("a", "b", "sa", "sb")
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn("uni", F.col("sa") + F.col("sb") - F.col("inter"))
        .where(F.col("inter") * TAU_DEN >= F.col("uni") * TAU_NUM)
        .select(
            "a",
            "b",
            F.round(F.col("inter").cast("double") / F.col("uni"), 6).alias(
                "jaccard"
            ),
        )
    )
