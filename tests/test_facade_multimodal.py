"""Facade dispatch (S1/K5 parity) and multimodal binary-column ops."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ome_arrow_spark import synth
from ome_arrow_spark.core import OmeImages
from ome_arrow_spark.operators import multimodal as MM


def test_load_ndarray_and_info(spark):
    a = np.arange(24).reshape(2, 3, 4)  # ZYX
    oi = OmeImages.load(spark, a, dim_order="ZYX", image_id="vol")
    info = oi.info()
    assert info[0]["shape"] == (1, 1, 2, 3, 4)
    assert info[0]["type"] == "3D image (z-stack)"


def test_load_dict_and_slice_chain(spark):
    oi = OmeImages.load(spark, synth.conftest_record())
    sliced = oi.slice(1, 3, 0, 2, c_indices=[1])
    recs = sliced.export("dict")
    assert recs[0]["planes"][0]["pixels"] == [101, 102, 111, 112]
    assert recs[0]["pixels_meta"]["size_c"] == 1


def test_export_numpy_and_parquet_roundtrip(spark, tmp_path):
    oi = OmeImages.load(spark, synth.conftest_record())
    vols = oi.export("numpy")
    assert vols[0].shape == (1, 2, 1, 3, 4)
    assert vols[0][0, 1, 0, 0, 0] == 100
    out = str(tmp_path / "t")
    oi.export("parquet", out=out, mode="overwrite")
    back = OmeImages.load(spark, out)
    assert back.count() == 1
    assert back.info()[0]["shape"] == (1, 2, 1, 3, 4)


def test_export_tiff_zarr_dispatch(spark, tmp_path):
    oi = OmeImages.load(spark, synth.conftest_record())
    p1 = oi.export("ometiff", out=str(tmp_path / "tf"))
    assert p1 and p1[0].endswith((".ome.tif", ".tif"))
    p2 = oi.export("zarr", out=str(tmp_path / "zr"))
    assert p2 and p2[0].endswith(".zarr")
    back = OmeImages.load(spark, p2[0])
    assert back.info()[0]["shape"] == (1, 2, 1, 3, 4)


def test_export_unknown_mode(spark):
    oi = OmeImages.load(spark, synth.conftest_record())
    with pytest.raises(ValueError, match="Unknown export mode"):
        oi.export("avif")
    with pytest.raises(ValueError, match="requires out="):
        oi.export("parquet")


@pytest.mark.heavy
def test_load_pattern_dispatch(spark, tmp_path):
    from ome_arrow_spark.sources.tiff import encode_ftif

    d = tmp_path / "pat"
    d.mkdir()
    for z in range(2):
        (d / f"p_Z{z}.tif").write_bytes(
            encode_ftif(np.full((1, 1, 1, 2, 2), z, dtype=np.int32), image_id=f"z{z}")
        )
    oi = OmeImages.load(spark, str(d / "p_Z<0-1>.tif"))
    assert oi.info()[0]["shape"] == (1, 1, 2, 2, 2)


# -- multimodal --------------------------------------------------------------


def test_media_features(spark):
    media = MM.synth_media_df(spark)
    feats = {r["media_id"]: r for r in MM.media_features(media).collect()}
    assert len(feats) == 14  # 4 fimg + 3 audio + 2 video + 2 JPEG + 1 PNG + 1 WAV + 1 AVI
    img0 = feats[0]
    rgb = (np.arange(8 * 10 * 3).reshape(8, 10, 3) * 1) % 256
    assert abs(img0["mean_r"] - rgb.reshape(-1, 3)[:, 0].mean()) < 1e-9
    aud = feats[4]
    assert aud["kind"] == "audio" and abs(aud["duration_s"] - 0.1) < 1e-9
    vid = feats[7]
    assert vid["kind"] == "video" and vid["n_frames"] == 6
    # real JPEG blobs decode through the engine's own codec: lossy but
    # close to the source pattern's channel means
    rgb9 = ((np.arange(16 * 24 * 3).reshape(16, 24, 3) * 7) % 256)
    jpg = feats[9]
    assert jpg["kind"] == "image"
    for ch, col in enumerate(["mean_r", "mean_g", "mean_b"]):
        assert abs(jpg[col] - rgb9.reshape(-1, 3)[:, ch].mean()) < 3.0
    # PNG is lossless: decoded means are exact
    rgb11 = ((np.arange(20 * 30 * 3).reshape(20, 30, 3) * 11 + 3) % 256)
    png = feats[11]
    assert png["kind"] == "image"
    for ch, col in enumerate(["mean_r", "mean_g", "mean_b"]):
        assert abs(png[col] - rgb11.reshape(-1, 3)[:, ch].mean()) < 1e-9


@pytest.mark.heavy
def test_resize_and_frame_sample(spark):
    media = MM.synth_media_df(spark)
    small = MM.resize_images(media, 5, 4)
    rows = small.collect()
    assert len(rows) == 7  # 4 fimg + 2 JPEG + 1 PNG images
    kind, arr, meta = MM.decode_media(bytes(rows[0]["content"]))
    assert arr.shape == (4, 5, 3)

    frames = MM.sample_frames(media, every=2)
    got = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] == 3 for r in got)  # 6 frames / every-2


def test_real_codec_gated():
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"\x89PNG\r\n....")


def test_media_table_from_dir(spark, tmp_path):
    """binaryFile directory ingest: magic-byte kind sniffing in pure
    Catalyst, ids from file stems, engine codecs decode the blobs."""
    import os

    from ome_arrow_spark.sources.jpeg_minimal import jpeg_encode
    from ome_arrow_spark.sources.png_minimal import png_encode

    g = ((np.arange(12 * 16) * 3) % 256).reshape(12, 16).astype(np.uint8)
    rgb = np.stack([g, 255 - g, g], axis=-1)
    from ome_arrow_spark.sources.gif_minimal import gif_encode
    from ome_arrow_spark.sources.wav_minimal import wav_encode

    d = str(tmp_path)
    open(os.path.join(d, "7.jpg"), "wb").write(jpeg_encode(rgb))
    open(os.path.join(d, "8.png"), "wb").write(png_encode(rgb))
    open(os.path.join(d, "9.bin"), "wb").write(b"\x00garbage")
    open(os.path.join(d, "10.gif"), "wb").write(
        gif_encode((rgb // 32 * 32).astype(np.uint8))
    )
    open(os.path.join(d, "11.wav"), "wb").write(
        wav_encode(np.zeros(160, np.int16), 16000)
    )
    media = MM.media_table_from_dir(spark, d)
    rows = {r["media_id"]: r["kind"] for r in media.collect()}
    assert rows == {7: "image", 8: "image", 9: "unknown",
                    10: "image", 11: "audio"}
    feats = {
        r["media_id"]: r
        for r in MM.media_features(
            media.filter("kind = 'image'")
        ).collect()
    }
    want = rgb.reshape(-1, 3)[:, 0].mean()
    assert abs(feats[8]["mean_r"] - want) < 1e-9  # PNG lossless
    assert abs(feats[7]["mean_r"] - want) < 3.0   # JPEG lossy-bounded


def test_bilinear_resize_math():
    """Golden checks for the half-pixel-center bilinear kernel:
    identity at same size, exact midpoint average on a 2x upscale of a
    step edge, constant images stay constant."""
    import numpy as np

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert np.array_equal(MM.bilinear_resize(img, 4, 6), img)  # identity
    const = np.full((5, 7, 3), 99, np.uint8)
    assert np.array_equal(MM.bilinear_resize(const, 11, 3), np.full((11, 3, 3), 99))
    # 1D step [0, 100] upscaled 2x: centers at src -0.25/0.25/0.75/1.25
    # → clamped edge, 25/75 blends, clamped edge
    step = np.array([[[0], [100]]], np.uint8).repeat(3, axis=2).reshape(1, 2, 3)
    out = MM.bilinear_resize(step, 1, 4)
    assert out[0, :, 0].tolist() == [0, 25, 75, 100]

def test_resize_method_guard(spark):
    import pytest as _pytest

    media = MM.synth_media_df(spark)
    with _pytest.raises(ValueError, match="method"):
        MM.resize_images(media, 5, 4, method="lanczos")
