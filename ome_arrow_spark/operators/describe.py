"""``describe`` (reference U2, utils.py:30-83) and ``verify``
(reference U1, utils.py:10-27) as DataFrame operators.

The reference describes ONE record at a time; here it's a pure nested
projection over the whole images table — with nested-schema pruning the
scan reads only ``pixels_meta.size_*``, never the pixel payload. This
is the engine's flagship catalog query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ome_arrow_spark.meta import OME_ARROW_TYPE, ome_arrow_struct


def classification(t: Column, z: Column) -> Column:
    """Dimensional classification (reference utils.py:59-69)."""
    return (
        F.when((t == 1) & (z == 1), "2D image")
        .when((t == 1) & (z > 1), "3D image (z-stack)")
        .when((t > 1) & (z == 1), "movie / timelapse")
        .when((t > 1) & (z > 1), "4D timelapse-volume")
        .otherwise("unknown")
    )


def describe(images: DataFrame, column: str = "ome_arrow") -> DataFrame:
    """Shape report + classification per image, exact string parity with
    the reference's golden-tested ``info()`` output (utils.py:59-75,
    asserted in tests/test_core.py)."""
    pm = f"{column}.pixels_meta"
    t = F.col(f"{pm}.size_t").cast("int")
    c = F.col(f"{pm}.size_c").cast("int")
    z = F.col(f"{pm}.size_z").cast("int")
    y = F.col(f"{pm}.size_y").cast("int")
    x = F.col(f"{pm}.size_x").cast("int")
    kind = classification(t, z)
    channel_info = F.when(
        c > 1, F.format_string("multi-channel (%d channels)", c)
    ).otherwise(F.lit("single-channel"))
    return images.select(
        F.col(f"{column}.id").alias("image_id"),
        t.alias("size_t"),
        c.alias("size_c"),
        z.alias("size_z"),
        y.alias("size_y"),
        x.alias("size_x"),
        kind.alias("type"),
        c.cast("long").alias("channels"),
        (c > 1).alias("is_multichannel"),
        F.format_string(
            "%s, %s - shape (T=%d, C=%d, Z=%d, Y=%d, X=%d)",
            kind,
            channel_info,
            t,
            c,
            z,
            y,
            x,
        ).alias("summary"),
    )


def verify(images: DataFrame, column: str = "ome_arrow", strict_planes: bool = False) -> DataFrame:
    """Schema-conformance report per image (reference U1 semantics:
    "does it fit the declared struct" — here the table already carries
    the schema, so verification means invariant checks):

    * ``type`` field equals ``"ome.arrow"``;
    * plane count equals the size_t × size_c × size_z cross product
      (dense-plane invariant, SURVEY.md §1.2);
    * every plane's pixel length equals size_x*size_y (strict mode,
      reference export.py:97-106);
    * pixel values within the uint16 domain is guaranteed by ingest
      clamping and not re-scanned here unless ``strict_planes``.
    """
    pm = f"{column}.pixels_meta"
    expected_planes = (
        F.col(f"{pm}.size_t") * F.col(f"{pm}.size_c") * F.col(f"{pm}.size_z")
    ).cast("int")
    plane_len_ok = F.forall(
        F.col(f"{column}.planes"),
        lambda p: F.size(p["pixels"]) == (F.col(f"{pm}.size_x") * F.col(f"{pm}.size_y")),
    )
    checks = [
        (F.col(f"{column}.type") == OME_ARROW_TYPE).alias("type_ok"),
        (F.size(f"{column}.planes") == expected_planes).alias("planes_dense"),
        plane_len_ok.alias("plane_lengths_ok"),
        (F.size(f"{pm}.channels") == F.col(f"{pm}.size_c").cast("int")).alias("channels_ok"),
    ]
    if strict_planes:
        checks.append(
            F.forall(
                F.col(f"{column}.planes"),
                lambda p: F.forall(p["pixels"], lambda v: (v >= 0) & (v <= 65535)),
            ).alias("pixel_domain_ok")
        )
    out = images.select(F.col(f"{column}.id").alias("image_id"), *checks)
    ok = None
    for c in out.columns[1:]:
        ok = F.col(c) if ok is None else (ok & F.col(c))
    return out.withColumn("valid", ok)


def spark_schema_matches(df: DataFrame, column: str = "ome_arrow") -> bool:
    """Driver-side schema equality (strict mode of reference S5,
    ingest.py:883-893)."""
    return df.schema[column].dataType == ome_arrow_struct()
