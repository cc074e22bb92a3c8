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


#: Rolling-hash fingerprint parameters (winnowing: Schleimer/Wilkerson/
#: Aiken MOSS scheme): character k-grams hashed with a polynomial rolling
#: hash, window-minimum selection.
KGRAM_K = 8
WINNOW_W = 4
_HASH_BASE = 257
_HASH_MOD = 2147483647  # 2^31 - 1; keeps (h*257 + 255) < 2^39 « int64


def kgram_hash_sql(text_col: str = "text", pos_var: str = "i") -> str:
    """Unrolled polynomial hash of the k-gram starting at 0-based ``pos_var``.

    Pure ANSI arithmetic over ``ascii``/``substr`` — the SAME string
    evaluates bit-identically as a Spark lambda body and inside a DuckDB
    ``generate_series`` oracle. BIGINT from the first term so neither
    engine's 32-bit multiply can overflow; mod applied per step.
    """
    expr = f"CAST(ascii(substr({text_col}, {pos_var} + 1, 1)) AS BIGINT)"
    for j in range(1, KGRAM_K):
        expr = (
            f"(({expr}) * {_HASH_BASE} + "
            f"ascii(substr({text_col}, {pos_var} + {j + 1}, 1))) % {_HASH_MOD}"
        )
    return expr


def winnow_fingerprints(text_col: str = "text") -> Column:
    """Distinct winnowing fingerprints of ``text_col`` as an int64 array.

    One projection, zero shuffle: k-gram hashes via ``transform`` over a
    position ``sequence``, then window minima. The hash array is bound
    through ``transform(array(...), hs -> ...)`` so CollapseProject cannot
    re-inline it into the window lambda (which would turn the O(n·w) scan
    into O(n²) — see slice_op.py for the same idiom).
    """
    return F.expr(
        f"""
        transform(
          array(transform(sequence(0, length({text_col}) - {KGRAM_K}),
                          i -> {kgram_hash_sql(text_col, "i")})),
          hs -> array_distinct(
                  transform(sequence(0, size(hs) - {WINNOW_W}),
                            t -> array_min(slice(hs, t + 1, {WINNOW_W})))))[0]
        """
    )


def max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent values in a pre-sorted array — i.e.
    the count of the most frequent element. Single aggregate fold; the
    array is bound via the array-wrap idiom against optimizer re-inlining.
    Caller guarantees ``size >= 2`` (``sequence(1, 0)`` counts down)."""
    return F.transform(
        F.array(sorted_arr),
        lambda st: F.aggregate(
            F.sequence(F.lit(1), F.size(st) - 1),
            F.struct(
                F.lit(1).cast("long").alias("cur"), F.lit(1).cast("long").alias("best")
            ),
            lambda acc, i: F.when(
                F.element_at(st, i + 1) == F.element_at(st, i),
                F.struct(
                    (acc.cur + 1).alias("cur"),
                    F.greatest(acc.best, acc.cur + 1).alias("best"),
                ),
            ).otherwise(
                F.struct(F.lit(1).cast("long").alias("cur"), acc.best.alias("best"))
            ),
            lambda acc: acc.best,
        ),
    ).getItem(0)


def bigrams(toks: Column) -> Column:
    """Adjacent token pairs as strings; caller guarantees ``size >= 2``."""
    return F.transform(
        F.array(toks),
        lambda tk: F.transform(
            F.sequence(F.lit(0), F.size(tk) - 2),
            lambda i: F.concat_ws(" ", F.element_at(tk, i + 1), F.element_at(tk, i + 2)),
        ),
    ).getItem(0)


def fingerprint(col: Column) -> Column:
    """Normalized-content fingerprint: md5 over the token stream.
    Whitespace/punctuation/case-insensitive — two documents differing
    only in formatting collide (by design)."""
    return F.md5(F.concat_ws(" ", tokens(col)))
