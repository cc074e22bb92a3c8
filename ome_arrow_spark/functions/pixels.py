"""Pixel-level column expressions — the reference's micro-ops
(SURVEY.md §2A micro-op table) as reusable Catalyst expressions.

All pure built-ins: they run inside whole-stage codegen and compose
into the bigger operators (slice, ingest zero-fill, export repack)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clamp_uint16(pixels: Column) -> Column:
    """clip(x, 0, 65535) (reference ingest.py:236-237 et al.)."""
    return F.transform(
        pixels, lambda x: F.least(F.greatest(x, F.lit(0)), F.lit(65535))
    )


def zero_plane(size_x: Column, size_y: Column) -> Column:
    """[0] * (sx*sy) (reference ingest.py:105, 588; transform.py:128)."""
    return F.array_repeat(F.lit(0), (size_x * size_y).cast("int"))


def crop(pixels: Column, size_x: Column, x_min: int, x_max: int, y_min: int, y_max: int) -> Column:
    """Row-major crop of a flattened Y×X plane (reference
    transform.py:102-111) — strided 1-based slices, flattened."""
    w = x_max - x_min
    return F.flatten(
        F.transform(
            F.sequence(F.lit(y_min), F.lit(y_max - 1)),
            lambda y: F.slice(pixels, (y * size_x + x_min + 1).cast("int"), w),
        )
    )


def rgba_to_rgb(color_rgba: Column) -> Column:
    """Packed 0xRRGGBBAA → (r, g, b) struct (reference K3 channel-color
    repack, export.py:182-187)."""
    return F.struct(
        F.shiftright(color_rgba, 24).bitwiseAND(F.lit(0xFF)).alias("r"),
        F.shiftright(color_rgba, 16).bitwiseAND(F.lit(0xFF)).alias("g"),
        F.shiftright(color_rgba, 8).bitwiseAND(F.lit(0xFF)).alias("b"),
    )


def rgba_alpha(color_rgba: Column) -> Column:
    return color_rgba.bitwiseAND(F.lit(0xFF))


def plane_sum(pixels: Column) -> Column:
    return F.aggregate(pixels, F.lit(0).cast("long"), lambda a, v: a + v)


def autoscale(pixels: Column) -> Column:
    """(vmin, vmax) display range (reference view.py:49-54)."""
    return F.struct(
        F.array_min(pixels).alias("vmin"), F.array_max(pixels).alias("vmax")
    )
