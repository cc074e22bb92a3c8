"""Canonical OME-Arrow schema as Spark types.

Re-expresses the reference's ``OME_ARROW_STRUCT``
(``/root/reference/src/ome_arrow/meta.py:18-90``) as a Spark
``StructType``. One value describes one 5D microscopy image
(T × C × Z × Y × X); the engine's canonical table is **one row per
image** (SURVEY.md §1.3) — the reference's single-row parquet files are
a 1-row instance of this table.

Type decisions (SURVEY.md §1.1):

* Arrow ``uint16`` pixel values → Spark ``IntegerType`` (Spark has no
  unsigned ints; parquet UINT_16 reads as int32). Values stay in
  [0, 65535] by the clamp invariant (reference ingest.py:236-237).
* Arrow ``uint32`` channel ``color_rgba`` → ``LongType`` (parquet
  UINT_32 reads as int64 in Spark).
* Arrow ``null``-typed ``masks`` placeholder (reference meta.py:88) →
  always-NULL ``StringType`` (Spark cannot write NullType to parquet).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Sentinel value of the ``type`` field (reference meta.py:9).
OME_ARROW_TYPE = "ome.arrow"
#: Schema version this engine writes (mirrors reference semver scheme,
#: reference meta.py:10).
OME_ARROW_VERSION = "0.0.1"

#: Default column name used by the facade when persisting
#: (reference core.py:158 passes "ome_arrow"; export.py default "image").
DEFAULT_COLUMN = "ome_arrow"

#: Parquet file-level metadata keys written by the reference
#: (export.py:405-414); checked softly on read (ingest.py:922-930).
META_KEY_TYPE = "ome.arrow.type"
META_KEY_VERSION = "ome.arrow.version"


def channel_struct() -> T.StructType:
    """Per-channel metadata (reference meta.py:48-67)."""
    return T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("emission_um", T.FloatType()),
            T.StructField("excitation_um", T.FloatType()),
            T.StructField("illumination", T.StringType()),
            T.StructField("color_rgba", T.LongType()),  # Arrow uint32 0xRRGGBBAA
        ]
    )


def pixels_meta_struct() -> T.StructType:
    """OME "Pixels" header (reference meta.py:31-70)."""
    return T.StructType(
        [
            T.StructField("dimension_order", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("size_x", T.IntegerType()),
            T.StructField("size_y", T.IntegerType()),
            T.StructField("size_z", T.IntegerType()),
            T.StructField("size_c", T.ShortType()),
            T.StructField("size_t", T.IntegerType()),
            T.StructField("physical_size_x", T.FloatType()),
            T.StructField("physical_size_y", T.FloatType()),
            T.StructField("physical_size_z", T.FloatType()),
            T.StructField("physical_size_x_unit", T.StringType()),
            T.StructField("physical_size_y_unit", T.StringType()),
            T.StructField("physical_size_z_unit", T.StringType()),
            T.StructField("channels", T.ArrayType(channel_struct())),
        ]
    )


def plane_struct() -> T.StructType:
    """One (t, c, z) 2D plane; pixels are the row-major flattened Y×X
    array, length ``size_x * size_y`` (reference meta.py:73-87)."""
    return T.StructType(
        [
            T.StructField("z", T.IntegerType()),
            T.StructField("t", T.IntegerType()),
            T.StructField("c", T.ShortType()),
            T.StructField("pixels", T.ArrayType(T.IntegerType())),
        ]
    )


def ome_arrow_struct() -> T.StructType:
    """The full OME-Arrow record type (reference meta.py:18-90)."""
    return T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("version", T.StringType()),
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("acquisition_datetime", T.TimestampType()),
            T.StructField("pixels_meta", pixels_meta_struct()),
            T.StructField("planes", T.ArrayType(plane_struct())),
            T.StructField("masks", T.StringType()),  # reserved, always NULL
        ]
    )


def ome_images_schema(column_name: str = DEFAULT_COLUMN) -> T.StructType:
    """Schema of the canonical images table: one struct column per row."""
    return T.StructType([T.StructField(column_name, ome_arrow_struct())])


def field_name_set(struct: T.StructType) -> frozenset[str]:
    """Top-level field-name set, used for the reference's forgiving
    column auto-detect on read (ingest.py:872-875): any struct column
    whose field-name set matches, order-insensitive, is accepted."""
    return frozenset(f.name for f in struct.fields)


OME_FIELD_NAMES = frozenset(
    {
        "type",
        "version",
        "id",
        "name",
        "acquisition_datetime",
        "pixels_meta",
        "planes",
        "masks",
    }
)


def dimension_order(size_z: int) -> str:
    """The reference's dimension-order rule: ``XYZCT`` if Z>1 else
    ``XYCT`` (ingest.py:267, 380, 670, 791)."""
    return "XYZCT" if size_z > 1 else "XYCT"
