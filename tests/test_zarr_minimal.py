"""The built-in Zarr v2 / NGFF codec must write spec-conformant stores
(readable by any zarr client) and read back bit-identically across the
codec matrix: raw/zlib/gzip chunks, custom chunk grids with edge
padding, '.' and '/' key separators, NGFF multiscale group attrs."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pytest

from ome_arrow_spark.sources import zarr as ZR
from ome_arrow_spark.sources.zarr_minimal import (
    read_ngff_attrs,
    read_zarr_array,
    write_ngff_store,
    write_zarr_array,
)


@pytest.mark.parametrize("compressor", [None, "zlib", "gzip"])
@pytest.mark.parametrize("sep", [".", "/"])
def test_array_roundtrip_codec_matrix(tmp_path, compressor, sep):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 65536, size=(2, 3, 4, 10, 7), dtype=np.uint16)
    p = str(tmp_path / "a")
    write_zarr_array(
        p, arr, chunks=(1, 2, 3, 4, 4), compressor=compressor,
        dimension_separator=sep,
    )
    back = read_zarr_array(p)
    np.testing.assert_array_equal(back, arr)
    # spec conformance of the metadata document
    meta = json.load(open(os.path.join(p, ".zarray")))
    assert meta["zarr_format"] == 2 and meta["order"] == "C"
    assert meta["dtype"] == "<u2" and meta["chunks"] == [1, 2, 3, 4, 4]
    if compressor == "zlib":
        # chunk bytes are genuine zlib streams of the C-order block
        key = sep.join(["0"] * 5)
        chunk_path = os.path.join(p, *key.split("/")) if sep == "/" else os.path.join(p, key)
        raw = zlib.decompress(open(chunk_path, "rb").read())
        block = np.frombuffer(raw, dtype="<u2").reshape(1, 2, 3, 4, 4)
        np.testing.assert_array_equal(block, arr[:1, :2, :3, :4, :4])


def test_unsupported_codec_gates(tmp_path):
    arr = np.zeros((2, 2), dtype=np.uint16)
    with pytest.raises(NotImplementedError, match="blosc"):
        write_zarr_array(str(tmp_path / "b"), arr, compressor="blosc")
    p = str(tmp_path / "c")
    write_zarr_array(p, arr)
    meta = json.load(open(os.path.join(p, ".zarray")))
    meta["compressor"] = {"id": "blosc", "cname": "zstd"}
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(NotImplementedError, match="blosc"):
        read_zarr_array(p)


def test_ngff_store_attrs_and_pyramid(tmp_path):
    vol = (np.arange(1 * 2 * 1 * 8 * 8) % 65536).reshape(1, 2, 1, 8, 8)
    levels = ZR.build_pyramid(vol, 2)
    p = str(tmp_path / "img.zarr")
    write_ngff_store(
        p, [lv.astype("<u2") for lv in levels], image_id="img",
        channel_names=["DAPI", "GFP"],
    )
    attrs = read_ngff_attrs(p)
    ms = attrs["multiscales"][0]
    assert ms["version"] == "0.4"
    assert [a["name"] for a in ms["axes"]] == ["t", "c", "z", "y", "x"]
    assert [d["path"] for d in ms["datasets"]] == ["0", "1"]
    assert ms["datasets"][1]["coordinateTransformations"][0]["scale"][-1] == 2.0
    assert [c["label"] for c in attrs["omero"]["channels"]] == ["DAPI", "GFP"]
    lv1 = read_zarr_array(os.path.join(p, "1"))
    np.testing.assert_array_equal(lv1, levels[1].astype(np.uint16))


def test_decode_store_reads_ngff_without_zarr_pkg(tmp_path):
    """decode_store on a real NGFF store: id/name/channels from attrs,
    pixels bit-identical."""
    vol = (np.arange(2 * 1 * 3 * 6 * 5) % 65536).reshape(2, 1, 3, 6, 5)
    p = str(tmp_path / "real.zarr")
    write_ngff_store(
        p, [vol.astype("<u2")], image_id="real", name="Real Store",
        channel_names=["BF"],
    )
    rec = ZR.decode_store(p)
    assert rec["id"] == "real" and rec["name"] == "Real Store"
    assert rec["pixels_meta"]["size_t"] == 2 and rec["pixels_meta"]["size_z"] == 3
    assert [c["name"] for c in rec["pixels_meta"]["channels"]] == ["BF"]
    got = {(pl["t"], pl["c"], pl["z"]): pl["pixels"] for pl in rec["planes"]}
    for t in range(2):
        for z in range(3):
            np.testing.assert_array_equal(
                np.asarray(got[(t, 0, z)]).reshape(6, 5), vol[t, 0, z]
            )
