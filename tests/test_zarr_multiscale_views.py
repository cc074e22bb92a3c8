"""Zarr manifest ingest, multiscale LOD pooling, viewer-equivalent ops."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ome_arrow_spark import synth
from ome_arrow_spark.operators.describe import describe
from ome_arrow_spark.operators.multiscale import downsample_planes, multiscale_levels
from ome_arrow_spark.operators.view_ops import (
    plane_lookup,
    render_plane_matplotlib,
    stride_downsample,
    volume_contrast,
)
from ome_arrow_spark.operators.views import plane_stats, planes_df
from ome_arrow_spark.sources import zarr as ZR


def test_fzarr_roundtrip_with_pyramid(spark, tmp_path):
    imgs = synth.golden_images_df(spark, ids=["nviz-2ch-single"], include_conftest=False)
    out = str(tmp_path / "stores")
    stores = ZR.to_zarr_dir(imgs, out, multiscale_levels=3)
    assert len(stores) == 1

    back0 = ZR.from_zarr_manifest(spark, stores, level=0)
    sa = {(r["t"], r["c"], r["z"]): r["px_sum"] for r in plane_stats(imgs).collect()}
    sb = {(r["t"], r["c"], r["z"]): r["px_sum"] for r in plane_stats(back0).collect()}
    assert sa == sb

    back1 = ZR.from_zarr_manifest(spark, stores, level=1)
    d = describe(back1).first()
    assert (d["size_y"], d["size_x"]) == (64, 64)

    # level-1 pooling matches the numpy model
    vol = np.stack([synth.pixel_plane(0, c, 0, 128, 128).reshape(128, 128) for c in range(2)])
    pooled = vol.astype(np.int64).reshape(2, 64, 2, 64, 2).sum(axis=(2, 4)) // 4
    st1 = {(r["c"]): r["px_sum"] for r in plane_stats(back1).collect()}
    assert st1[0] == int(pooled[0].sum()) and st1[1] == int(pooled[1].sum())


def test_zarr_real_decode_gated(tmp_path):
    if ZR.HAVE_ZARR:
        pytest.skip("zarr installed")
    d = tmp_path / "notastore"
    d.mkdir()
    with pytest.raises(NotImplementedError):
        ZR.decode_store(str(d))


def test_downsample_planes_matches_numpy(spark):
    imgs = synth.golden_images_df(spark, ids=["img-0001"])
    pl = planes_df(imgs)
    ds = downsample_planes(pl, 2)  # 4×3 → 2×1
    rows = {(r["t"], r["c"], r["z"]): r["pixels"] for r in ds.collect()}
    # plane c0: [[0,1,2,3],[10,11,12,13],[20,21,22,23]] → 2x? h=floor(3/2)=1, w=2
    # cells: floor((0+1+10+11)/4)=5, floor((2+3+12+13)/4)=7
    assert rows[(0, 0, 0)] == [5, 7]
    assert rows[(0, 1, 0)] == [105, 107]


def test_multiscale_levels_union(spark):
    imgs = synth.golden_images_df(spark, ids=["nviz-1ch-stack"], include_conftest=False)
    pyr = multiscale_levels(planes_df(imgs), levels=3)
    sizes = {
        r["level"]: (r["size_y"], r["size_x"])
        for r in pyr.select("level", "size_y", "size_x").distinct().collect()
    }
    assert sizes == {0: (128, 128), 1: (64, 64), 2: (32, 32)}
    assert pyr.filter(F.col("level") == 2).count() == 22


def test_plane_lookup_autoscale(spark):
    imgs = synth.golden_images_df(spark, ids=["multi-channel-z"], include_conftest=False)
    row = plane_lookup(imgs, t=0, c=1, z=2).first()
    arr = synth.pixel_plane(0, 1, 2, 167, 439)
    assert row["vmin"] == int(arr.min()) and row["vmax"] == int(arr.max())
    assert len(row["pixels"]) == 167 * 439
    # missing plane → filtered out
    assert plane_lookup(imgs, t=5, c=0, z=0).count() == 0


def test_stride_downsample(spark):
    imgs = synth.golden_images_df(spark, ids=["img-0001"])
    pl = planes_df(imgs).filter(F.col("c") == 0)
    out = pl.select(
        stride_downsample(F.col("pixels"), F.col("size_x"), 2).alias("px")
    ).first()["px"]
    # rows 0,2 cols 0,2 of [[0,1,2,3],[10..13],[20..23]] → [0,2,20,22]
    assert out == [0, 2, 20, 22]


def test_volume_contrast_percentiles(spark):
    imgs = synth.golden_images_df(spark, ids=["nviz-1ch-stack"], include_conftest=False)
    row = volume_contrast(imgs, c=0, exact=True).first()
    voxels = np.concatenate(
        [synth.pixel_plane(0, 0, z, 128, 128) for z in range(22)]
    ).astype(float)
    lo, hi = np.percentile(voxels, [1.0, 99.9])
    assert row["n_voxels"] == 22 * 128 * 128
    assert abs(row["clim_lo"] - lo) < 1e-6
    assert abs(row["clim_hi"] - hi) < 1e-6
    # the scale-default (percentile_approx) must land near the exact values
    arow = volume_contrast(imgs, c=0).first()
    assert arow["n_voxels"] == row["n_voxels"]
    spread = hi - lo
    assert abs(arow["clim_lo"] - lo) < 0.05 * spread + 1.0
    assert abs(arow["clim_hi"] - hi) < 0.05 * spread + 1.0


def test_render_gated():
    with pytest.raises(NotImplementedError):
        render_plane_matplotlib({"pixels_meta": {}, "planes": []})


def test_build_volume_zyx_conftest():
    from ome_arrow_spark.operators.view_ops import build_volume_zyx

    rec = synth.conftest_record()
    vol, (dx, dy, dz) = build_volume_zyx(rec, c=1)
    assert vol.shape == (1, 3, 4) and vol.dtype == np.uint16
    assert vol[0, 0, 0] == 100 and vol[0, 2, 3] == 123
    assert (dx, dy, dz) == (0.65, 0.65, 1.0)
    # the reference's explicit (Z, Y, X) spacing override (view.py:70)
    _, (ox, oy, oz) = build_volume_zyx(rec, c=1, scaling_values=(2.0, 0.5, 0.25))
    assert (ox, oy, oz) == (0.25, 0.5, 2.0)


def test_render_volume_pyvista_fake_module(monkeypatch):
    """The V2 render body (reference view.py:66-286): verify the VTK
    volume construction — dimensions in (X,Y,Z) order, spacing from
    physical sizes, percentile clim, F-order scalars — against a fake
    in-memory pyvista module (the real one is absent in this
    container)."""
    import sys
    import types

    from ome_arrow_spark.operators import view_ops

    calls = {}

    class FakeImageData:
        def __init__(self):
            self.point_data = {}

    class FakePlotter:
        def set_background(self, color):
            calls["background"] = color

        def add_volume(self, img, **kw):
            calls["img"] = img
            calls.update(kw)

    fake = types.ModuleType("pyvista")
    fake.ImageData = FakeImageData
    fake.Plotter = FakePlotter
    monkeypatch.setitem(sys.modules, "pyvista", fake)

    rec = synth.conftest_record()
    pl = view_ops.render_volume_pyvista(rec, c=0, background="white")
    assert isinstance(pl, FakePlotter)
    img = calls["img"]
    # conftest record: 4×3, Z=1 → VTK (X,Y,Z) dims (4, 3, 1)
    assert img.dimensions == (4, 3, 1)
    assert img.spacing == (0.65, 0.65, 1.0)
    assert img.origin == (0.0, 0.0, 0.0)
    px = [0, 1, 2, 3, 10, 11, 12, 13, 20, 21, 22, 23]
    scalars = img.point_data["scalars"]
    # F-order ravel of the (X,Y,Z) transpose == row-major plane order
    assert list(scalars) == px
    # clim from 1.0/99.9 percentiles of the channel-0 voxels
    lo, hi = np.percentile(np.array(px), [1.0, 99.9])
    assert calls["clim"] == (float(lo), float(hi))
    assert calls["background"] == "white"
    assert calls["shade"] is False
    assert calls["opacity_unit_distance"] == pytest.approx(0.65)


class TestBuiltinPngRender:
    """V1/V2 finally have an EXECUTABLE render path with no external
    dependency: plane/MIP → PNG through the from-scratch codec
    (sources/png_minimal.py). Decoding the PNG back must reproduce the
    exact display mapping (min/max autoscale, clip, colormap)."""

    def test_plane_gray_autoscale(self):
        import numpy as np

        from ome_arrow_spark.operators.view_ops import render_plane_png
        from ome_arrow_spark.sources.png_minimal import png_decode

        rec = synth.conftest_record()
        pm = rec["pixels_meta"]
        png = render_plane_png(rec, tcz=(0, 1, 0))
        img = png_decode(png)
        assert img.shape == (pm["size_y"], pm["size_x"])
        # recompute the mapping straight from the record
        plane = next(
            p for p in rec["planes"] if (p["t"], p["c"], p["z"]) == (0, 1, 0)
        )
        raw = np.asarray(plane["pixels"], dtype=np.float64).reshape(
            pm["size_y"], pm["size_x"]
        )
        lo, hi = raw.min(), raw.max()
        exp = np.round((raw - lo) / (hi - lo if hi > lo else 1.0) * 255)
        np.testing.assert_array_equal(img, exp.astype(np.uint8))

    def test_plane_viridis_and_limits(self):
        import numpy as np

        from ome_arrow_spark.operators.view_ops import render_plane_png
        from ome_arrow_spark.sources.png_minimal import png_decode

        rec = synth.conftest_record()
        pm = rec["pixels_meta"]
        png = render_plane_png(rec, tcz=(0, 0, 0), cmap="viridis",
                               vmin=0.0, vmax=10.0)
        img = png_decode(png)
        assert img.shape == (pm["size_y"], pm["size_x"], 3)
        # vmin/vmax clipping: values ≥ 10 all map to the TOP anchor
        plane = next(
            p for p in rec["planes"] if (p["t"], p["c"], p["z"]) == (0, 0, 0)
        )
        raw = np.asarray(plane["pixels"]).reshape(pm["size_y"], pm["size_x"])
        top = np.round(np.array([0.993248, 0.906157, 0.143936]) * 255)
        if (raw >= 10).any():
            ys, xs = np.nonzero(raw >= 10)
            np.testing.assert_array_equal(img[ys[0], xs[0]], top)

    def test_volume_mip(self):
        import numpy as np

        from ome_arrow_spark.operators.view_ops import (
            build_volume_zyx,
            render_volume_png,
        )
        from ome_arrow_spark.sources.png_minimal import png_decode

        rec = synth.conftest_record()
        png = render_volume_png(rec, c=0)
        img = png_decode(png)
        vol, _ = build_volume_zyx(rec, c=0)
        mip = vol.max(axis=0).astype(np.float64)
        lo, hi = float(vol.min()), float(vol.max())
        exp = np.round((mip - lo) / (hi - lo if hi > lo else 1.0) * 255)
        np.testing.assert_array_equal(img, exp.astype(np.uint8))

    def test_unknown_cmap_rejected(self):
        import pytest

        from ome_arrow_spark.operators.view_ops import render_plane_png

        rec = synth.conftest_record()
        with pytest.raises(ValueError, match="cmap"):
            render_plane_png(rec, tcz=(0, 0, 0), cmap="jet")
