"""Real-TIFF ingest without tifffile: the pure-Python baseline codec
(sources/tiff_minimal.py) must produce/consume genuine TIFF 6.0 bytes —
both endians, multi-page, multi-strip, 8- and 16-bit — and plug into
the distributed from_tiff_dir path with results identical to
from_numpy (the reference's fixture contract, reference
tests/test_core.py:199-246)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ome_arrow_spark.operators.describe import describe
from ome_arrow_spark.operators.views import plane_stats
from ome_arrow_spark.sources import tiff as TF
from ome_arrow_spark.sources.tiff_minimal import (
    decode_tiff_baseline,
    encode_tiff_baseline,
    is_tiff,
)


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("rows_per_strip", [None, 3])
def test_roundtrip_uint16(big_endian, rows_per_strip):
    rng = np.random.default_rng(7)
    vol = rng.integers(0, 65536, size=(4, 10, 7), dtype=np.uint16)
    blob = encode_tiff_baseline(
        vol, big_endian=big_endian, rows_per_strip=rows_per_strip
    )
    assert is_tiff(blob)
    assert blob[:2] == (b"MM" if big_endian else b"II")
    back = decode_tiff_baseline(blob)
    assert back.shape == (1, 1, 4, 10, 7)
    np.testing.assert_array_equal(back[0, 0], vol)


def test_roundtrip_uint8_and_2d():
    vol = (np.arange(30).reshape(5, 6) % 256).astype(np.uint8)
    back = decode_tiff_baseline(encode_tiff_baseline(vol))
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back[0, 0, 0], vol.astype(np.uint16))


def test_from_tiff_dir_real_bytes_matches_from_numpy(spark, tmp_path):
    """End-to-end: hand-rolled REAL .tif files through the distributed
    binaryFile+mapInPandas path; pixels/planes identical to building
    the record from the same array via from_numpy."""
    rng = np.random.default_rng(11)
    d = tmp_path / "real_tiffs"
    d.mkdir()
    vols = {}
    for i, z in enumerate((1, 5)):
        vol = rng.integers(0, 65536, size=(z, 12, 9), dtype=np.uint16)
        vols[f"cells_{i}"] = vol
        (d / f"cells_{i}.tif").write_bytes(
            encode_tiff_baseline(vol, big_endian=(i % 2 == 1))
        )

    imgs = TF.from_tiff_dir(spark, str(d), glob="*.tif")
    got = {r["image_id"]: r for r in describe(imgs).collect()}
    assert got["cells_0"]["size_z"] == 1 and got["cells_1"]["size_z"] == 5
    assert got["cells_1"]["size_c"] == 1 and got["cells_1"]["size_t"] == 1

    # per-plane pixel fidelity vs the numpy source of truth
    st = {
        (r["image_id"], r["t"], r["c"], r["z"]): (r["px_sum"], r["px_min"], r["px_max"])
        for r in plane_stats(imgs).collect()
    }
    for iid, vol in vols.items():
        for z in range(vol.shape[0]):
            plane = vol[z]
            assert st[(iid, 0, 0, z)] == (
                int(plane.sum()),
                int(plane.min()),
                int(plane.max()),
            )

    # and vs from_numpy through the same record builder
    from ome_arrow_spark.sources.numpy_ingest import from_numpy

    rec = from_numpy(vols["cells_1"][np.newaxis, np.newaxis], dim_order="TCZYX",
                     image_id="cells_1")
    spark_planes = (
        imgs.filter(F.col("ome_arrow.id") == "cells_1")
        .select(F.explode("ome_arrow.planes").alias("p"))
        .select("p.z", "p.t", "p.c", "p.pixels")
        .collect()
    )
    by_z = {r["z"]: r["pixels"] for r in spark_planes}
    for p in rec["planes"]:
        assert by_z[p["z"]] == list(p["pixels"])


def test_sink_writes_real_tif_for_grayscale(spark, tmp_path):
    """to_tiff_dir emits genuine .tif for C=T=1 stacks and the ingest
    side reads them back bit-identically."""
    from ome_arrow_spark import synth

    imgs = synth.golden_images_df(spark, ids=["z-series"], include_conftest=False)
    out = str(tmp_path / "sink")
    paths = TF.to_tiff_dir(imgs, out)
    assert len(paths) == 1 and paths[0].endswith(".tif")
    raw = open(paths[0], "rb").read()
    assert is_tiff(raw)
    back = TF.from_tiff_dir(spark, out, glob="*.tif")
    sa = {(r["t"], r["c"], r["z"]): r["px_sum"] for r in plane_stats(imgs).collect()}
    sb = {(r["t"], r["c"], r["z"]): r["px_sum"] for r in plane_stats(back).collect()}
    assert sa == sb


def test_ome_tiff_4d_roundtrip(spark, tmp_path):
    """T, C, and Z all >1: the writer's XYCZT page order and the
    reader's DimensionOrder mapping must invert each other exactly."""
    from ome_arrow_spark.sources.numpy_ingest import from_numpy
    from ome_arrow_spark.sources.ome_parquet import spark_table_from_records

    rng = np.random.default_rng(23)
    vol = rng.integers(0, 65536, size=(3, 2, 4, 9, 11), dtype=np.uint16)
    rec = from_numpy(vol, dim_order="TCZYX", image_id="four_d",
                     channel_names=["DAPI", "GFP"])
    imgs = spark_table_from_records(spark, [rec])
    out = str(tmp_path / "sink4d")
    paths = TF.to_tiff_dir(imgs, out)
    assert paths[0].endswith(".ome.tif")
    back = TF.from_tiff_dir(spark, out, glob="*.ome.tif")
    rows = (
        back.select(F.explode("ome_arrow.planes").alias("p"))
        .select("p.t", "p.c", "p.z", "p.pixels")
        .collect()
    )
    assert len(rows) == 3 * 2 * 4
    for r in rows:
        np.testing.assert_array_equal(
            np.asarray(r["pixels"]).reshape(9, 11), vol[r["t"], r["c"], r["z"]]
        )
