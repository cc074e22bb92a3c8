"""Partitioning policy and plan-inspection helpers — the 100 TB
posture (SURVEY.md §4 "custom work actually needed" #2/#3).

Pixel-bearing rows are MB-scale (a 2048² uint16 plane ≈ 8.4 MB as
int32 in executor memory), so generic row-count heuristics misfire by
orders of magnitude. The policy here sizes partitions by estimated
BYTES, using schema arithmetic instead of sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TARGET_PARTITION_BYTES = 128 * 1024 * 1024


def estimate_image_row_bytes(size_x: int, size_y: int, size_t: int, size_c: int, size_z: int) -> int:
    """int32 in-memory pixel cost of one image row (+5% struct overhead)."""
    px = size_x * size_y * size_t * size_c * size_z
    return int(px * 4 * 1.05)


def repartition_images(
    images: DataFrame,
    column: str = "ome_arrow",
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> DataFrame:
    """Range-partition the images table on id so each partition holds
    ~target_bytes of pixels. One metadata-only aggregate (nested
    pruning: sizes only) estimates total bytes — no pixel scan."""
    pm = f"{column}.pixels_meta"
    est = images.select(
        (
            F.col(f"{pm}.size_x").cast("long")
            * F.col(f"{pm}.size_y")
            * F.col(f"{pm}.size_t")
            * F.col(f"{pm}.size_c")
            * F.col(f"{pm}.size_z")
            * 4
        ).alias("b")
    ).agg(F.sum("b").alias("total")).first()
    total = int((est["total"] or 0) * 1.05)
    n = max(1, (total + target_bytes - 1) // target_bytes)
    return images.repartitionByRange(int(n), F.col(f"{column}.id"))


def repartition_planes(
    planes: DataFrame, target_bytes: int = TARGET_PARTITION_BYTES
) -> DataFrame:
    """Spread exploded plane rows; keying on (image_id, t, c) keeps one
    image's planes together enough for per-image reassembly while
    splitting mega-images across executors (skew guard: a single image
    larger than a partition no longer pins one task)."""
    est = planes.select(
        (F.col("size_x").cast("long") * F.col("size_y") * 4).alias("b")
    ).agg(F.sum("b").alias("total")).first()
    total = int((est["total"] or 0) * 1.05)
    n = max(1, (total + target_bytes - 1) // target_bytes)
    return planes.repartitionByRange(int(n), "image_id", "t", "c")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from the formatted physical plan — for
    asserting scan-level pushdown in tests."""
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("PushedFilters:")
    ]


def read_schema_columns(df: DataFrame) -> list[str]:
    """ReadSchema column lists per scan — for asserting column pruning."""
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in df._jdf.queryExecution().executedPlan().toString()


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left side into
    ``salt_buckets`` sub-keys and explode the (smaller) right side
    across all buckets. Use when one key dominates (AQE skew-join
    handles sort-merge skew automatically, but salting also fixes
    skewed aggregations and broadcast-ineligible cases).

    Cost model: right side replicates ×salt_buckets — keep it the
    smaller input."""
    l2 = left.withColumn(
        "__salt", (F.abs(F.hash(F.col(key), F.monotonically_increasing_id())) % salt_buckets)
    )
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l2.join(r2, [key, "__salt"], how)
    return out.drop("__salt")
