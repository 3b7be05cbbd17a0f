"""Text-analysis scalar functions for the training-data pipeline, as pure
column expressions (JVM-side, whole-stage codegen; no Python in the hot path).

All float outputs are exact ratios of integer counts (deterministic IEEE
division) and are rounded where they feed the driver's value-hash compare.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# whitespace-delimited tokens; BPE-ish tokens = word runs or single punct
TOKEN_RE = r"\S+"
BPE_RE = r"\w+|[^\w\s]"

# tiny marker-stopword lists per language for the n-gram/stopword language-ID
# heuristic (deterministic tie order: en, de, fr, es, und)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "que", "es"],
}

STOPWORDS = LANG_MARKERS["en"]


def token_count_expr(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)))


def bpe_token_count_expr(text: Column) -> Column:
    """BPE-ish token count: word runs + individual punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), F.lit(0)))


def _word_occurrences(text: Column, word: str) -> Column:
    """Count of whole-word occurrences (space-padded match)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(f" {word} "), F.lit(""))))
        / (len(word) + 2)
    ).cast("long")


def stopword_count_expr(text: Column, stopwords: list[str] | None = None) -> Column:
    words = stopwords or STOPWORDS
    c = F.lit(0).cast("long")
    for w in words:
        c = c + _word_occurrences(text, w)
    return c


def quality_score_exprs(text: Column) -> dict[str, Column]:
    """Quality-signal columns: length, token count, punctuation ratio,
    alpha ratio, stopword ratio, mean token length.  Ratios rounded to 6dp."""
    n = F.length(text)
    toks = token_count_expr(text)
    punct = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    stop = stopword_count_expr(text)
    nz = F.when(n > 0, n.cast("double")).otherwise(F.lit(1.0))
    tz = F.when(toks > 0, toks.cast("double")).otherwise(F.lit(1.0))
    return {
        "n_chars": n.cast("long"),
        "n_tokens": toks.cast("long"),
        "punct_ratio": F.round(punct / nz, 6),
        "alpha_ratio": F.round(alpha / nz, 6),
        "stopword_ratio": F.round(stop / tz, 6),
        "mean_token_len": F.round(n / tz, 6),
    }


def lang_score_exprs(text: Column) -> dict[str, Column]:
    return {lang: sum((_word_occurrences(text, w) for w in words),
                      F.lit(0).cast("long"))
            for lang, words in LANG_MARKERS.items()}


def lang_id_expr(text: Column) -> Column:
    """Marker-stopword language ID with deterministic tie order
    en > de > fr > es; 'und' when no marker hits."""
    s = lang_score_exprs(text)
    best = F.greatest(*s.values())
    expr = F.lit("und")
    # build reversed so earlier langs win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((s[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set.

    Order-insensitive content fingerprint (bag-of-words identity) — the
    cheap SQL-expressible sibling of the rolling-hash shingle fingerprints
    in functions/hashing.py.
    """
    toks = F.array_sort(F.array_distinct(
        F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0))))
    return F.md5(F.concat_ws(" ", toks))
