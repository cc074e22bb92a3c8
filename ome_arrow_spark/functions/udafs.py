"""Custom aggregates (SURVEY.md §2C "UDAF custom agg over pixels"):
Arrow-vectorized ``pandas_udf`` GROUPED_AGG functions over plane rows.

Prefer built-in aggregates wherever expressible (every oracle-checked
query does); these exist for genuinely custom math — here, per-image
pixel statistics that fold whole plane arrays per group.

UDFs are built lazily: ``pandas_udf`` resolves its DDL return type
against the active SparkSession, so module-import-time decoration
would require a session before any test/driver creates one."""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@lru_cache(maxsize=1)
def _udafs():
    @pandas_udf("double")
    def mean_of_plane_means(pixels: pd.Series) -> float:
        # GROUPED_AGG: each group's plane arrays arrive as one Arrow
        # batch; numpy folds them vectorized.
        if len(pixels) == 0:
            return float("nan")
        return float(np.mean([np.mean(np.asarray(p)) for p in pixels]))

    @pandas_udf("double")
    def pixel_stddev(pixels: pd.Series) -> float:
        # population stddev across every pixel of the group
        if len(pixels) == 0:
            return float("nan")
        flat = np.concatenate([np.asarray(p) for p in pixels])
        return float(flat.std())

    @pandas_udf("long")
    def plane_count(pixels: pd.Series) -> int:
        # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
        # aggregates in one agg, so the count is a pandas UDAF too.
        return len(pixels)

    return mean_of_plane_means, pixel_stddev, plane_count


def image_pixel_stats(planes: DataFrame) -> DataFrame:
    """Per-image custom aggregate over the exploded planes relation."""
    mean_of_plane_means, pixel_stddev, plane_count = _udafs()
    return planes.groupBy("image_id").agg(
        mean_of_plane_means(F.col("pixels")).alias("mean_of_means"),
        pixel_stddev(F.col("pixels")).alias("px_stddev"),
        plane_count(F.col("pixels")).alias("n_planes"),
    )
