"""Multiscale pyramid as derived LOD tables (reference K4's pyramid,
export.py:316-337, re-expressed as a query instead of a writer side
effect): level k halves Y and X by factor-f mean pooling with integer
floor division — exact arithmetic, engine-portable.

The pool is a pure higher-order-function expression over the flattened
pixel array: for each output cell, sum the f×f input block via strided
``slice`` and divide. Runs inside whole-stage codegen; no UDF, no
shuffle (per-row rewrite). At 100 TB, materialize each level
partitioned like the base table and query the coarsest level that
satisfies the resolution bound (classic LOD).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mean_pool_expr(pixels: Column, size_x: Column, factor: int) -> Column:
    """Mean-pool a row-major flattened (Y×X) plane by ``factor`` in
    both axes: out[ny, nx] = floor(sum(block) / factor²). Truncates
    ragged edges (matches the sink's ``[: ny*f, : nx*f]`` crop)."""
    f = factor
    new_w = F.floor(size_x / f).cast("int")

    def pool_cell(ny: Column, nx: Column) -> Column:
        block = F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(f - 1)),
                lambda dy: F.slice(
                    pixels, ((ny * f + dy) * size_x + nx * f + 1).cast("int"), f
                ),
            )
        )
        s = F.aggregate(block, F.lit(0).cast("long"), lambda a, v: a + v)
        return F.floor(s / (f * f)).cast("int")

    def pool_row(ny: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), new_w - 1), lambda nx: pool_cell(ny, nx)
        )

    new_h = F.floor(F.size(pixels) / size_x / f).cast("int")
    return F.flatten(
        F.transform(F.sequence(F.lit(0), new_h - 1), pool_row)
    )


def downsample_planes(
    planes: DataFrame, factor: int = 2, pixels: str = "pixels"
) -> DataFrame:
    """planes_df (image_id, t, c, z, size_x, size_y, pixels) → same
    relation at 1/factor resolution.

    Two-step projection on purpose: aliasing the new ``size_x`` in the
    same select would lateral-column-alias-shadow the input ``size_x``
    inside the pool expression (Spark ≥3.4 resolves lateral aliases
    first)."""
    pooled = planes.withColumn(
        "__pooled", mean_pool_expr(F.col(pixels), F.col("size_x"), factor)
    )
    return pooled.select(
        *[c for c in planes.columns if c not in (pixels, "size_x", "size_y")],
        F.floor(F.col("size_x") / factor).cast("int").alias("size_x"),
        F.floor(F.col("size_y") / factor).cast("int").alias("size_y"),
        F.col("__pooled").alias(pixels),
    )


def multiscale_levels(
    planes: DataFrame, levels: int, factor: int = 2
) -> DataFrame:
    """Union of LOD levels 0..levels-1 with a ``level`` column — the
    queryable pyramid."""
    out = planes.withColumn("level", F.lit(0))
    cur = planes
    for lvl in range(1, levels):
        cur = downsample_planes(cur, factor)
        out = out.unionByName(cur.withColumn("level", F.lit(lvl)))
    return out
