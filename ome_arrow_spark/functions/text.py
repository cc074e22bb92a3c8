"""Text-analysis column expressions (SURVEY.md §2C north-star ops):
tokenization, quality metrics, language-ID features, fingerprints.

All pure built-in expressions — JVM-side, whole-stage codegen, no UDFs.
Tokenization is the shared normalization: lowercase, runs of
``[a-z0-9]+`` (ASCII word chars), which both Spark and DuckDB regex
engines agree on byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "([a-z0-9]+)"

#: Tiny per-language stopword lists for the n-gram/stopword-vote
#: language-ID heuristic. Order matters: argmax ties resolve in this
#: declaration order.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein"],
    "es": ["el", "la", "de", "que", "y", "los", "una"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "zh": [],
}


def tokens(col: Column) -> Column:
    """Lowercased ASCII word tokens."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 1)


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def distinct_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"([.,;:!?])"), 1)).cast("long")


def total_token_chars(toks: Column) -> Column:
    """Sum of token lengths (exact integer arithmetic)."""
    return F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of token occurrences that are stopwords of ``lang``."""
    stop = F.array(*[F.lit(s) for s in STOPWORDS[lang]]) if STOPWORDS[lang] else None
    if stop is None:
        return F.lit(0).cast("long")
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("long")


def lang_predict(toks: Column) -> Column:
    """Argmax stopword vote with fixed tie order (en,de,es,fr → zh)."""
    hits = {lang: stopword_hits(toks, lang) for lang in ("en", "de", "es", "fr")}
    expr = F.when(
        (hits["en"] >= hits["de"]) & (hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]) & (hits["en"] > 0),
        "en",
    )
    expr = expr.when((hits["de"] >= hits["es"]) & (hits["de"] >= hits["fr"]) & (hits["de"] > 0), "de")
    expr = expr.when((hits["es"] >= hits["fr"]) & (hits["es"] > 0), "es")
    expr = expr.when(hits["fr"] > 0, "fr")
    return expr.otherwise("zh")


def fingerprint(col: Column) -> Column:
    """Normalized-content fingerprint: md5 over the token stream.
    Whitespace/punctuation/case-insensitive — two documents differing
    only in formatting collide (by design)."""
    return F.md5(F.concat_ws(" ", tokens(col)))
