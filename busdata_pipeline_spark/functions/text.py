"""Text-analysis expressions for the training-data pipeline tier
(BASELINE.json north star: text analysis at 100 TB scale).

Everything is built-in Column algebra — no Python in the hot path, so
these run inside whole-stage codegen over billions of documents.  Each
helper has an exactly-equivalent ANSI formulation used by the DuckDB
oracles (plans/training_data.py), chosen to avoid any engine-specific
semantics (e.g. substring-occurrence counting via length arithmetic
instead of regex, which can differ across regex dialects).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def occurrences(text: Column | str, needle: str) -> Column:
    """Number of (possibly overlapping-start) occurrences of ``needle``:
    (len(x) - len(replace(x, needle, ''))) / len(needle).  Identical
    arithmetic on any SQL engine."""
    col = text if isinstance(text, Column) else F.col(text)
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def token_count(text: Column | str) -> Column:
    """Whitespace token count for single-space-delimited text:
    #spaces + 1 (0 for empty strings)."""
    col = text if isinstance(text, Column) else F.col(text)
    spaces = F.length(col) - F.length(F.replace(col, F.lit(" "), F.lit("")))
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(spaces + 1).cast("long")


def avg_token_len(text: Column | str) -> Column:
    """Mean token length = non-space chars / tokens (NULL on empty)."""
    col = text if isinstance(text, Column) else F.col(text)
    non_space = F.length(F.replace(col, F.lit(" "), F.lit("")))
    n = token_count(col)
    return F.when(n > 0, non_space.cast("double") / n)


#: Punctuation set for the quality-ratio features (fixed, engine-neutral).
PUNCT = "!?.,;:"

#: Stopword markers (space-delimited match, same arithmetic as lang
#: markers — no regex dialect in play).
STOPWORDS = ["the", "a", "of", "and", "to"]

#: "BPE-ish" token pattern: letter runs, digit runs, or single
#: non-alphanumeric-non-space symbols — the coarse pre-tokenization
#: BPE vocabularies start from.  Plain character classes only, so the
#: Java (Spark) and RE2-style (DuckDB) dialects agree exactly.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (NULL on empty text)."""
    col = text if isinstance(text, Column) else F.col(text)
    n_punct = F.length(col) - F.length(F.translate(col, PUNCT, ""))
    return F.when(F.length(col) > 0, n_punct.cast("double") / F.length(col))


def stopword_ratio(text: Column | str) -> Column:
    """Stopword tokens / all tokens (NULL when no tokens).  Counted as
    space-delimited occurrences over a space-padded copy so edge tokens
    match too — identical arithmetic in the SQL oracle."""
    col = text if isinstance(text, Column) else F.col(text)
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    hits = sum(
        (occurrences(padded, f" {w} ") for w in STOPWORDS), F.lit(0)
    )
    n = token_count(col)
    return F.when(n > 0, hits.cast("double") / n)


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish pre-tokenization count via regexp_extract_all."""
    col = text if isinstance(text, Column) else F.col(text)
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), F.lit(0))).cast("long")


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the trimmed text.
    (Standard MD5 over UTF-8 — identical on every engine; the rolling-
    hash variant for near-dup lives in operators/dedup.py.)"""
    col = text if isinstance(text, Column) else F.col(text)
    return F.md5(F.trim(col))


#: Marker vocabularies for the n-gram language-ID heuristic.  Real corpora
#: would use character n-gram profiles; the heuristic structure (count
#: markers -> argmax with deterministic tie order) is what the engine
#: provides, and it is expressed identically in the DuckDB oracle.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " a ", " value "],
    "es": [" data ", " row "],
    "de": [" table ", " hash "],
    "fr": [" join ", " merge "],
    "zh": [" spark ", " stream "],
}


def lang_scores(text: Column | str) -> dict[str, Column]:
    return {
        lang: sum((occurrences(text, m) for m in ms), F.lit(0))
        for lang, ms in LANG_MARKERS.items()
    }


def lang_id(text: Column | str) -> Column:
    """argmax over marker scores; ties resolve in fixed lang order
    (en > es > de > fr > zh), 'und' when every score is 0."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # insertion order == tie priority
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def quality_score(text: Column | str) -> Column:
    """Cheap quality heuristic in [0,1]: length band + mean-token-length
    band (the shape of C4/Gopher-style filters; weights are arbitrary but
    fixed).  Round-6 stable across engines."""
    col = text if isinstance(text, Column) else F.col(text)
    n = token_count(col)
    atl = avg_token_len(col)
    len_ok = F.when((n >= 10) & (n <= 100000), 0.5).otherwise(0.0)
    atl_ok = F.when((atl >= 2.0) & (atl <= 12.0), 0.5).otherwise(0.0)
    return F.round(len_ok + atl_ok, 6)


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data hygiene)

#: Regexes restricted to constructs with identical semantics in Java
#: regex (Spark) and RE2 (DuckDB): literal classes, bounded repetition,
#: no backrefs/lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Match counts per PII class (codegen'd regexp_count)."""
    col = text if isinstance(text, Column) else F.col(text)
    return {
        "n_emails": F.regexp_count(col, F.lit(EMAIL_RE)).cast("long"),
        "n_phones": F.regexp_count(col, F.lit(PHONE_RE)).cast("long"),
    }


def redact_pii(text: Column | str) -> Column:
    """Replace every email/phone occurrence with a class tag.  Pure
    regexp_replace chain — no Python, safe over billions of docs."""
    col = text if isinstance(text, Column) else F.col(text)
    out = F.regexp_replace(col, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


def repetition_ratio_inputs(text: Column | str) -> Column:
    """Token array for the repetition-ratio aggregate (see
    plans/training_data.py:td_repetition): most-frequent-token share is
    a groupBy over (doc, token), not a per-row expression."""
    col = text if isinstance(text, Column) else F.col(text)
    return F.split(F.trim(col), " ")
