"""Derived relational views over the images table (SURVEY.md §1.3):
``planes_df`` and ``channels_df`` — the exploded workhorses for pixel
analytics and channel metadata queries.

Scale note: exploding planes multiplies row count by T×C×Z but divides
row size by the same factor; partition sizing stays at the pixel-bytes
level. For mega-images use ``repartition`` on (image_id, t) after the
explode to spread one image's planes across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def planes_df(images: DataFrame, column: str = "ome_arrow") -> DataFrame:
    """(image_id, t, c, z, pixels) — one row per 2D plane."""
    return images.select(
        F.col(f"{column}.id").alias("image_id"),
        F.col(f"{column}.pixels_meta.size_x").alias("size_x"),
        F.col(f"{column}.pixels_meta.size_y").alias("size_y"),
        F.explode(f"{column}.planes").alias("p"),
    ).select(
        "image_id",
        F.col("p.t").alias("t"),
        F.col("p.c").alias("c"),
        F.col("p.z").alias("z"),
        "size_x",
        "size_y",
        F.col("p.pixels").alias("pixels"),
    )


def channels_df(images: DataFrame, column: str = "ome_arrow") -> DataFrame:
    """(image_id, channel_idx, id, name, emission_um, excitation_um,
    illumination, color_rgba) via posexplode."""
    return images.select(
        F.col(f"{column}.id").alias("image_id"),
        F.posexplode(f"{column}.pixels_meta.channels").alias("channel_idx", "ch"),
    ).select(
        "image_id",
        "channel_idx",
        F.col("ch.id").alias("channel_id"),
        F.col("ch.name").alias("name"),
        F.col("ch.emission_um").alias("emission_um"),
        F.col("ch.excitation_um").alias("excitation_um"),
        F.col("ch.illumination").alias("illumination"),
        F.col("ch.color_rgba").alias("color_rgba"),
    )


def plane_stats(images: DataFrame, column: str = "ome_arrow") -> DataFrame:
    """Per-plane min/max/sum — array aggregates without leaving the JVM
    (reference V1 autoscale semantics, view.py:49-54, generalized)."""
    pl = planes_df(images, column)
    return pl.select(
        "image_id",
        "t",
        "c",
        "z",
        F.array_min("pixels").alias("px_min"),
        F.array_max("pixels").alias("px_max"),
        F.aggregate("pixels", F.lit(0).cast("long"), lambda acc, v: acc + v).alias("px_sum"),
        F.size("pixels").alias("px_count"),
    )
