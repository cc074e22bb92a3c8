"""Vector column expressions over ``array<float>`` embeddings —
dot product, norms, cosine — as higher-order functions (JVM-side,
no UDF; SURVEY.md §2C similarity search).

Elements are cast to double before multiply so per-element products are
IEEE-exact; the sequential ``aggregate`` fold keeps accumulation order
deterministic within an engine, and callers round published
similarities (errors live at 1e-15, rounding at 1e-6)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    return F.round(cosine(a, b), digits)
