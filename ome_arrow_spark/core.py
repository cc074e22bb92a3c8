"""``OmeImages`` — the engine's facade, mirroring the reference's
``OMEArrow`` class surface (core.py:46-492) over a DataFrame of many
images instead of one record.

Dispatch parity (reference ``__init__`` core.py:46-135):

* pattern string containing ``<...>``        → stack-pattern ingest (S6)
* path ending ``.zarr``                      → zarr store ingest (S4)
* path ending ``.parquet``/``.pq``           → OME-Parquet read (S5)
* path ending ``.tif``/``.tiff``/``.ftif``   → TIFF binaryFile ingest (S3)
* ``numpy.ndarray``                          → from_numpy (S2)
* ``dict`` record                            → validate + single-row table
* ``DataFrame``                              → adopted as-is

Export dispatch parity (reference ``export`` core.py:137-267, alias
normalization core.py:219): ``numpy | dict | ome-parquet | ome-tiff |
ome-zarr`` with the same alias spellings.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from ome_arrow_spark.meta import DEFAULT_COLUMN

_EXPORT_ALIASES = {
    "numpy": "numpy",
    "np": "numpy",
    "ndarray": "numpy",
    "dict": "dict",
    "scalar": "dict",
    "ome-parquet": "ome-parquet",
    "omeparquet": "ome-parquet",
    "parquet": "ome-parquet",
    "pq": "ome-parquet",
    "ome-tiff": "ome-tiff",
    "ometiff": "ome-tiff",
    "tiff": "ome-tiff",
    "tif": "ome-tiff",
    "ome-zarr": "ome-zarr",
    "omezarr": "ome-zarr",
    "zarr": "ome-zarr",
    "ome-table": "ome-table",
    "ometable": "ome-table",
    "table": "ome-table",
    "delta": "ome-table",
}


class OmeImages:
    """A table of OME-Arrow images with the reference's operation
    surface as methods."""

    def __init__(self, df: DataFrame, column: str = DEFAULT_COLUMN):
        self.df = df
        self.column = column

    # -- ingest dispatch (S1) ------------------------------------------------

    @classmethod
    def load(cls, spark: SparkSession, data: Any, **kw) -> "OmeImages":
        if isinstance(data, DataFrame):
            return cls(data, kw.get("column", DEFAULT_COLUMN))
        if isinstance(data, np.ndarray):
            from ome_arrow_spark.sources.numpy_ingest import from_numpy
            from ome_arrow_spark.sources.ome_parquet import spark_table_from_records

            rec = from_numpy(data, **kw)
            return cls(spark_table_from_records(spark, [rec]))
        if isinstance(data, dict):
            from ome_arrow_spark.sources.ome_parquet import spark_table_from_records

            return cls(spark_table_from_records(spark, [data]))
        if isinstance(data, (str, os.PathLike)):
            path = str(data)
            low = path.lower()
            if "<" in path and ">" in path:
                from ome_arrow_spark.sources.stack_pattern import from_stack_pattern

                return cls(from_stack_pattern(spark, path, **kw))
            if low.rstrip("/").endswith(".zarr"):
                from ome_arrow_spark.sources.zarr import from_zarr_manifest

                return cls(from_zarr_manifest(spark, [path], **kw))
            if os.path.isdir(os.path.join(path, "_ome_log")):
                from ome_arrow_spark.sources.table_log import read_ome_table

                return cls(read_ome_table(spark, path, **kw))
            if low.endswith((".parquet", ".pq")) or os.path.isdir(path):
                from ome_arrow_spark.sources.ome_parquet import read_ome_parquet

                return cls(read_ome_parquet(spark, path, **kw))
            if low.endswith((".tif", ".tiff", ".ftif")):
                from ome_arrow_spark.sources.tiff import from_tiff_dir

                folder, fname = os.path.split(path)
                return cls(from_tiff_dir(spark, folder or ".", glob=fname, **kw))
        raise TypeError(f"Unsupported OmeImages source: {type(data).__name__}")

    # -- operations ----------------------------------------------------------

    def describe(self) -> DataFrame:
        from ome_arrow_spark.operators.describe import describe

        return describe(self.df, self.column)

    def verify(self, strict_planes: bool = False) -> DataFrame:
        from ome_arrow_spark.operators.describe import verify

        return verify(self.df, self.column, strict_planes)

    def slice(
        self,
        x_min: int,
        x_max: int,
        y_min: int,
        y_max: int,
        t_indices=None,
        c_indices=None,
        z_indices=None,
        fill_missing: bool = True,
    ) -> "OmeImages":
        from ome_arrow_spark.operators.slice_op import slice_images

        return OmeImages(
            slice_images(
                self.df, x_min, x_max, y_min, y_max,
                t_indices, c_indices, z_indices,
                fill_missing, self.column,
            ),
            self.column,
        )

    def planes(self) -> DataFrame:
        from ome_arrow_spark.operators.views import planes_df

        return planes_df(self.df, self.column)

    def channels(self) -> DataFrame:
        from ome_arrow_spark.operators.views import channels_df

        return channels_df(self.df, self.column)

    def info(self) -> list[dict[str, Any]]:
        """Reference ``info()`` dict shape (core.py:269-279) per image."""
        return [
            {
                "shape": (r["size_t"], r["size_c"], r["size_z"], r["size_y"], r["size_x"]),
                "type": r["type"],
                "channels": r["channels"],
                "is_multichannel": r["is_multichannel"],
                "summary": r["summary"],
            }
            for r in self.describe().collect()
        ]

    # -- export dispatch (K5) ------------------------------------------------

    def export(self, how: str = "numpy", out: str | None = None, **kw):
        mode = _EXPORT_ALIASES.get(how.strip().lower().replace("_", "-"))
        if mode is None:
            raise ValueError(f"Unknown export mode {how!r}")
        if mode == "numpy":
            # Stream partitions to the driver one at a time
            # (toLocalIterator) so peak driver memory is one partition of
            # images, not the whole table — the list contract (same as
            # the reference's to_numpy, core.py:364-377) is unchanged.
            from ome_arrow_spark.operators.densify import record_to_numpy

            return [
                record_to_numpy(r[self.column].asDict(recursive=True), **kw)
                for r in self.df.toLocalIterator()
            ]
        if mode == "dict":
            return [
                r[self.column].asDict(recursive=True)
                for r in self.df.toLocalIterator()
            ]
        if out is None:
            raise ValueError(f"export(how={how!r}) requires out=")
        if mode == "ome-parquet":
            from ome_arrow_spark.sources.ome_parquet import write_ome_parquet

            return write_ome_parquet(self.df, out, **kw)
        if mode == "ome-tiff":
            from ome_arrow_spark.sources.tiff import to_tiff_dir

            return to_tiff_dir(self.df, out, self.column, **kw)
        if mode == "ome-zarr":
            from ome_arrow_spark.sources.zarr import to_zarr_dir

            return to_zarr_dir(self.df, out, self.column, **kw)
        if mode == "ome-table":
            # Transaction-log table: create when absent, MERGE by
            # image id when present (atomic either way).
            from ome_arrow_spark.sources import table_log as tl

            spark = self.df.sparkSession
            if tl.current_version(out) is None:
                return tl.create_ome_table(
                    spark, self.df, out, column=self.column, **kw
                )
            return tl.upsert_ome_table(
                spark, self.df, out, column=self.column, **kw
            )
        raise AssertionError("unreachable")

    def count(self) -> int:
        return self.df.count()
