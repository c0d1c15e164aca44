"""Text-analysis column functions for the documents pipeline.

All pure ``pyspark.sql.functions`` expressions — they compile into
whole-stage codegen and run at full JVM speed over 100 TB of text; no
Python crosses the hot path. The LLM-data-pipeline use cases (token
counting, quality scoring, language ID, fingerprinting) per the north
star in BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multilingual stopword seed lists for the heuristic language ID /
# stopword-ratio features. Public knowledge (common function words).
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")
LANG_MARKERS = {
    # language → characters/words whose presence is a strong signal
    "de": r"[äöüß]|\b(und|der|die|das|nicht)\b",
    "fr": r"[àâçéèêëîïôùûœ]|\b(le|la|les|et|est|une)\b",
    "es": r"[áéíóúñ¿¡]|\b(el|los|las|es|una|que)\b",
    "zh": r"[一-鿿]",
}


def normalize_text(col: Column | str) -> Column:
    """Lowercase + trim + collapse internal whitespace (canonical form)."""
    return F.regexp_replace(F.lower(F.trim(F.col(col) if isinstance(col, str) else col)), r"\s+", " ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (``size(split(trim(text), '\\s+'))``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are sentence punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.!?,;:]", ""))
    return n_punct / F.length(c)


def stopword_count(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Number of stopword occurrences (regex word-boundary match)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"\b(" + "|".join(stopwords) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0)))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    return stopword_count(col, stopwords) / token_count(col)


def quality_score(col: Column | str) -> Column:
    """Deterministic linear quality heuristic in [0, ~1].

    Rewards reasonable length and stopword presence, penalizes extreme
    punctuation density — the classic cheap pre-filter before expensive
    model-based scoring in a training-data pipeline.
    """
    c = F.col(col) if isinstance(col, str) else col
    length_term = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(1.0) - punct_ratio(c) * 10.0, F.lit(0.0))
    return 0.4 * length_term + 0.3 * stop_term + 0.3 * punct_term


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    The exact-dedup key. (The reference's only dedup is the keep-first
    uuid dedup at io_utils.py:34 in /root/reference; this generalizes it
    to content-addressed dedup for document tables.)
    """
    return F.md5(normalize_text(col))


def lang_guess(col: Column | str) -> Column:
    """Heuristic language ID via marker characters/words, default 'en'."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.when(F.lower(c).rlike(LANG_MARKERS["zh"]), F.lit("zh"))
    for lang in ("de", "fr", "es"):
        expr = expr.when(F.lower(c).rlike(LANG_MARKERS[lang]), F.lit(lang))
    return expr.otherwise(F.lit("en"))
