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


@pytest.mark.parametrize("compressor", [None, "zlib", "gzip", "blosc", "zstd", "lz4"])
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
    from ome_arrow_spark.sources.zarr_minimal import blosc_encode

    arr = np.zeros((2, 2), dtype=np.uint16)
    with pytest.raises(NotImplementedError, match="lzma"):
        write_zarr_array(str(tmp_path / "b"), arr, compressor="lzma")
    # blosclz inner codecs no longer gate: a v2 store whose chunks are
    # blosc frames with format id 0 round-trips through the built-in
    # pure-Python decoder (blosclz_minimal)
    from ome_arrow_spark.sources.zarr_minimal import blosc_decode

    p = str(tmp_path / "c")
    big = (np.arange(64 * 64, dtype=np.uint16) % 97).reshape(64, 64)
    write_zarr_array(p, big, compressor="blosc", chunks=(64, 64))
    meta = json.load(open(os.path.join(p, ".zarray")))
    meta["compressor"] = {"id": "blosc", "cname": "blosclz"}
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    chunk = os.path.join(p, "0.0")
    raw = blosc_decode(open(chunk, "rb").read())
    from ome_arrow_spark.sources.zarr_minimal import blosc_encode

    open(chunk, "wb").write(
        blosc_encode(raw, typesize=2, shuffle=1, cname="blosclz")
    )
    got = read_zarr_array(p)
    assert np.array_equal(got, big)


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


@pytest.mark.parametrize("compressor", [None, "gzip", "blosc", "zstd"])
def test_v3_array_roundtrip(tmp_path, compressor):
    """Zarr v3 layout: zarr.json metadata, c/-prefixed chunk keys,
    bytes(+gzip) codec chain, edge-chunk padding — all bit-exact on
    read-back, with genuine gzip chunk streams on disk."""
    import gzip as _gzip

    from ome_arrow_spark.sources.zarr_minimal import (
        read_zarr_array_v3,
        write_zarr_array_v3,
    )

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 65536, size=(2, 3, 4, 10, 7), dtype=np.uint16)
    p = str(tmp_path / "a3")
    write_zarr_array_v3(p, arr, chunks=(1, 2, 3, 4, 4), compressor=compressor)
    np.testing.assert_array_equal(read_zarr_array_v3(p), arr)
    # generic reader dispatches on layout
    np.testing.assert_array_equal(read_zarr_array(p), arr)
    meta = json.load(open(os.path.join(p, "zarr.json")))
    assert meta["zarr_format"] == 3 and meta["node_type"] == "array"
    assert meta["data_type"] == "uint16"
    assert meta["chunk_grid"]["configuration"]["chunk_shape"] == [1, 2, 3, 4, 4]
    chunk_path = os.path.join(p, "c", "0", "0", "0", "0", "0")
    assert os.path.exists(chunk_path)
    raw = open(chunk_path, "rb").read()
    if compressor == "gzip":
        raw = _gzip.decompress(raw)
    elif compressor == "blosc":
        from ome_arrow_spark.sources.zarr_minimal import blosc_decode

        assert (raw[2] >> 5) == 3 or (raw[2] & 0x2)  # zlib format / memcpy
        raw = blosc_decode(raw)
    elif compressor == "zstd":
        import pyarrow as pa

        assert raw[:4] == b"\x28\xb5\x2f\xfd"  # zstd frame magic
        raw = bytes(pa.Codec("zstd").decompress(raw, decompressed_size=192))
    block = np.frombuffer(raw, dtype="<u2").reshape(1, 2, 3, 4, 4)
    np.testing.assert_array_equal(block, arr[:1, :2, :3, :4, :4])


def test_v3_unsupported_codec_gates(tmp_path):
    from ome_arrow_spark.sources.zarr_minimal import (
        read_zarr_array_v3,
        write_zarr_array_v3,
    )

    arr = np.zeros((2, 2), dtype=np.uint16)
    with pytest.raises(NotImplementedError, match="brotli"):
        write_zarr_array_v3(str(tmp_path / "b"), arr, compressor="brotli")
    # a cname the engine genuinely lacks still gates
    p = str(tmp_path / "c")
    write_zarr_array_v3(p, arr, compressor=None)
    meta = json.load(open(os.path.join(p, "zarr.json")))
    meta["codecs"].append(
        {"name": "blosc", "configuration": {"cname": "lizard"}}
    )
    json.dump(meta, open(os.path.join(p, "zarr.json"), "w"))
    with pytest.raises(NotImplementedError, match="blosc"):
        read_zarr_array_v3(p)


def test_v3_blosclz_codec_chain_roundtrip(tmp_path):
    """A v3 store whose blosc codec uses cname=blosclz reads and
    writes through the built-in pure-Python codec (no zarr package)."""
    from ome_arrow_spark.sources.zarr_minimal import (
        blosc_encode,
        read_zarr_array_v3,
        write_zarr_array_v3,
    )

    arr = (np.arange(48 * 32, dtype=np.uint16) % 251).reshape(48, 32)
    p = str(tmp_path / "lz")
    write_zarr_array_v3(p, arr, compressor="blosc")
    meta = json.load(open(os.path.join(p, "zarr.json")))
    for c in meta["codecs"]:
        if c.get("name") == "blosc":
            c["configuration"]["cname"] = "blosclz"
    json.dump(meta, open(os.path.join(p, "zarr.json"), "w"))
    chunk = os.path.join(p, "c", "0", "0")
    from ome_arrow_spark.sources.zarr_minimal import blosc_decode

    raw = blosc_decode(open(chunk, "rb").read())
    open(chunk, "wb").write(
        blosc_encode(raw, typesize=2, shuffle=1, cname="blosclz")
    )
    assert np.array_equal(read_zarr_array_v3(p), arr)


@pytest.mark.parametrize("compressor", [None, "gzip", "blosc", "zstd"])
def test_v3_sharding_roundtrip(tmp_path, compressor):
    """sharding_indexed: one on-disk object per SHARD holding a
    sub-grid of inner chunks + a uint64 (offset, nbytes) index with a
    CRC-32C footer. Round-trips bit-exactly, cuts object count by the
    inner-grid size (the 100 TB object-store layout), and the index
    must be genuinely spec-shaped (missing-chunk sentinel, absolute
    offsets, valid checksum)."""
    import struct

    from ome_arrow_spark.sources.zarr_minimal import (
        crc32c,
        read_zarr_array_v3,
        write_zarr_array_v3,
    )

    rng = np.random.default_rng(53)
    arr = rng.integers(0, 65536, size=(1, 2, 3, 10, 9), dtype=np.uint16)
    p = str(tmp_path / "sharded")
    write_zarr_array_v3(
        p, arr, chunks=(1, 1, 1, 4, 4), shards=(1, 2, 3, 8, 8),
        compressor=compressor,
    )
    np.testing.assert_array_equal(read_zarr_array_v3(p), arr)
    np.testing.assert_array_equal(read_zarr_array(p), arr)
    meta = json.load(open(os.path.join(p, "zarr.json")))
    assert meta["codecs"][0]["name"] == "sharding_indexed"
    # grid chunk = shard shape → 2x2 shards over (10,9); 4 shard files
    assert meta["chunk_grid"]["configuration"]["chunk_shape"] == [1, 2, 3, 8, 8]
    shard_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(p, "c"))
        for f in fs
    ]
    assert len(shard_files) == 4
    # index of the (0,0,0,0,0) shard: 2*3*2*2=24 inner chunks, CRC valid
    raw = open(os.path.join(p, "c", "0", "0", "0", "0", "0"), "rb").read()
    n_inner = 24
    idx_blob = raw[-(16 * n_inner + 4):]
    body, crc = idx_blob[:-4], struct.unpack("<I", idx_blob[-4:])[0]
    assert crc32c(body) == crc
    pairs = struct.unpack("<" + "Q" * (2 * n_inner), body)
    offs = [pairs[2 * k] for k in range(n_inner) if pairs[2 * k] != (1 << 64) - 1]
    assert offs == sorted(offs) and offs[0] == 0


def test_v3_shard_index_crc_detects_corruption(tmp_path):
    """A flipped byte in a shard's chunk index must fail the CRC-32C
    check loudly instead of silently misplacing pixel data."""
    from ome_arrow_spark.sources.zarr_minimal import (
        read_zarr_array_v3,
        write_zarr_array_v3,
    )

    arr = (np.arange(64, dtype=np.uint16)).reshape(1, 8, 8)
    p = str(tmp_path / "s")
    write_zarr_array_v3(p, arr, chunks=(1, 4, 4), shards=(1, 8, 8))
    shard = os.path.join(p, "c", "0", "0", "0")
    raw = bytearray(open(shard, "rb").read())
    raw[-20] ^= 0xFF  # inside the index, before the CRC footer
    open(shard, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC"):
        read_zarr_array_v3(p)


def test_v3_sharded_ngff_store(tmp_path):
    """write_ngff_store(zarr_format=3, shards=...) → decode_store reads
    the sharded store back bit-identically without the zarr package."""
    vol = (np.arange(1 * 1 * 2 * 12 * 12) % 65536).reshape(1, 1, 2, 12, 12)
    p = str(tmp_path / "sh.zarr")
    write_ngff_store(
        p, [vol.astype("<u2")], image_id="sh", zarr_format=3,
        chunks=(1, 1, 1, 6, 6), shards=(1, 1, 2, 12, 12),
    )
    rec = ZR.decode_store(p)
    got = {(pl["t"], pl["c"], pl["z"]): pl["pixels"] for pl in rec["planes"]}
    for z in range(2):
        np.testing.assert_array_equal(
            np.asarray(got[(0, 0, z)]).reshape(12, 12), vol[0, 0, z]
        )
    with pytest.raises(NotImplementedError, match="zarr_format=3"):
        write_ngff_store(
            str(tmp_path / "bad"), [vol.astype("<u2")], image_id="b",
            shards=(1, 1, 1, 4, 4),
        )


def test_v3_ngff_store_roundtrip(tmp_path):
    """write_ngff_store(zarr_format=3) → a v3 group zarr.json carrying
    the multiscales document in `attributes` + v3 arrays; decode_store
    reads it back without the zarr package, metadata intact."""
    vol = (np.arange(2 * 2 * 1 * 8 * 6) % 65536).reshape(2, 2, 1, 8, 6)
    levels = ZR.build_pyramid(vol, 2)
    p = str(tmp_path / "v3.zarr")
    write_ngff_store(
        p, [lv.astype("<u2") for lv in levels], image_id="v3img",
        name="V3 Image", channel_names=["DAPI", "GFP"], zarr_format=3,
    )
    assert not os.path.exists(os.path.join(p, ".zgroup"))
    gmeta = json.load(open(os.path.join(p, "zarr.json")))
    assert gmeta["node_type"] == "group" and gmeta["zarr_format"] == 3
    # NGFF 0.5: multiscales + omero nest under the versioned "ome" key
    ome = read_ngff_attrs(p)["ome"]
    assert ome["version"] == "0.5"
    ms = ome["multiscales"][0]
    assert [d["path"] for d in ms["datasets"]] == ["0", "1"]
    assert [c["label"] for c in ome["omero"]["channels"]] == ["DAPI", "GFP"]
    arr0 = json.load(open(os.path.join(p, "0", "zarr.json")))
    assert arr0["dimension_names"] == ["t", "c", "z", "y", "x"]
    rec = ZR.decode_store(p)
    assert rec["id"] == "v3img" and rec["name"] == "V3 Image"
    assert [c["name"] for c in rec["pixels_meta"]["channels"]] == ["DAPI", "GFP"]
    got = {(pl["t"], pl["c"], pl["z"]): pl["pixels"] for pl in rec["planes"]}
    for t in range(2):
        for c in range(2):
            np.testing.assert_array_equal(
                np.asarray(got[(t, c, 0)]).reshape(8, 6), vol[t, c, 0]
            )
    # level-1 read through decode_store as well
    rec1 = ZR.decode_store(p, level=1)
    assert rec1["pixels_meta"]["size_y"] == 4 and rec1["pixels_meta"]["size_x"] == 3


def test_deep_pyramid_floors_at_one(tmp_path):
    """levels > log2(min dim): the reference floors every level dim at
    max(1, dim // factor) (export.py:317-330) — deep pyramids over small
    planes must bottom out at 1×1, not crash on a zero-size level, and
    the written store must carry true shape-ratio scales."""
    vol = (np.arange(1 * 1 * 2 * 5 * 9) % 65536).reshape(1, 1, 2, 5, 9)
    levels = ZR.build_pyramid(vol, 6)  # 5x9 → 2x4 → 1x2 → 1x1 → 1x1 → 1x1
    shapes = [lv.shape[-2:] for lv in levels]
    assert shapes == [(5, 9), (2, 4), (1, 2), (1, 1), (1, 1), (1, 1)]
    assert all(lv.shape[-3] == 2 for lv in levels)  # Z kept by default
    # the 1x1 tail is the mean of the preceding level
    assert levels[3][0, 0, 0, 0, 0] == levels[2][0, 0, 0].sum() // 2
    p = str(tmp_path / "deep.zarr")
    write_ngff_store(p, [lv.astype("<u2") for lv in levels], image_id="deep")
    ms = read_ngff_attrs(p)["multiscales"][0]
    got = ms["datasets"][2]["coordinateTransformations"][0]["scale"]
    assert got == [1.0, 1.0, 1.0, 5.0, 4.5]  # true ratio, not factor**k
    lv2 = read_zarr_array(os.path.join(p, "2"))
    np.testing.assert_array_equal(lv2, levels[2].astype(np.uint16))


def test_pyramid_downscale_z_parity():
    """downscale_z=True mirrors the reference exporter's all-spatial-axes
    downscale (export.py:328-330): Z halves with the same max(1, ...)
    floor and level values are the Z-pair means of the YX-pooled level."""
    vol = (np.arange(1 * 1 * 4 * 8 * 8) % 65536).reshape(1, 1, 4, 8, 8)
    levels = ZR.build_pyramid(vol, 3, downscale_z=True)
    assert [lv.shape[-3:] for lv in levels] == [(4, 8, 8), (2, 4, 4), (1, 2, 2)]
    yx = ZR.build_pyramid(vol, 2)[1]  # YX-only pooled level 1
    np.testing.assert_array_equal(
        levels[1][0, 0], (yx[0, 0, 0::2] + yx[0, 0, 1::2]) // 2
    )


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


# --- blosc1 frames ----------------------------------------------------------


def test_blosc_frame_roundtrip_matrix():
    """zlib-inner-codec blosc frames: shuffle on/off, single- and
    multi-block, odd trailing bytes, every typesize 1/2/4/8."""
    from ome_arrow_spark.sources.zarr_minimal import blosc_decode, blosc_encode

    rng = np.random.default_rng(11)
    for typesize in (1, 2, 4, 8):
        for n in (0, 5, 1024, 70000):  # 70000 > default blocksize/4? keeps 1 block; see below
            raw = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            for shuffle in (0, 1):
                for bs in (0, 256, 4096):
                    frame = blosc_encode(raw, typesize=typesize,
                                         shuffle=shuffle, blocksize=bs)
                    assert blosc_decode(frame) == raw


def test_blosc_frame_header_conformance():
    """Wire layout per c-blosc README_HEADER: version/flags/typesize
    bytes, LE sizes, bstarts offsets that actually address streams."""
    import struct
    from ome_arrow_spark.sources.zarr_minimal import blosc_encode

    raw = (np.arange(5000, dtype="<u2") % 251).tobytes()
    frame = blosc_encode(raw, typesize=2, shuffle=1, blocksize=2048)
    assert frame[0] == 2  # BLOSC_VERSION_FORMAT
    flags, typesize = frame[2], frame[3]
    assert flags & 0x1 and (flags >> 5) == 3 and typesize == 2
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    assert nbytes == 10000 and blocksize == 2048 and cbytes == len(frame)
    nblocks = -(-nbytes // blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}I", frame, 16)
    assert bstarts[0] == 16 + 4 * nblocks
    for off in bstarts:
        (csize,) = struct.unpack_from("<I", frame, off)
        assert off + 4 + csize <= len(frame)


def test_blosc_legacy_split_frames_decode():
    """c-blosc <1.11 split zlib blocks into one stream per byte lane;
    synthesize that layout and check the decoder's fallback reads it."""
    import struct
    import zlib as _z
    from ome_arrow_spark.sources.zarr_minimal import blosc_decode, _shuffle_bytes

    rng = np.random.default_rng(5)
    raw = rng.integers(0, 65536, size=1200, dtype="<u2").tobytes()
    typesize, blocksize = 2, 800
    nbytes = len(raw)
    nblocks = -(-nbytes // blocksize)
    streams_all = []
    for i in range(nblocks):
        seg = raw[i * blocksize : i * blocksize + min(blocksize, nbytes - i * blocksize)]
        shuf = _shuffle_bytes(seg, typesize)
        lane = len(shuf) // typesize
        block_streams = b""
        for j in range(typesize):
            comp = _z.compress(shuf[j * lane : (j + 1) * lane], 5)
            if len(comp) >= lane:
                comp = shuf[j * lane : (j + 1) * lane]
            block_streams += struct.pack("<I", len(comp)) + comp
        streams_all.append(block_streams)
    data_start = 16 + 4 * nblocks
    total = data_start + sum(len(s) for s in streams_all)
    header = struct.pack("<BBBBIII", 2, 1, 0x1 | (3 << 5), typesize,
                         nbytes, blocksize, total)
    bstarts, off = b"", data_start
    for s in streams_all:
        bstarts += struct.pack("<I", off)
        off += len(s)
    frame = header + bstarts + b"".join(streams_all)
    assert blosc_decode(frame) == raw


def test_blosc_memcpy_fallback():
    """Incompressible data must produce the pure-memcpy frame, like
    c-blosc, and decode back exactly."""
    from ome_arrow_spark.sources.zarr_minimal import blosc_decode, blosc_encode

    rng = np.random.default_rng(17)
    raw = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
    frame = blosc_encode(raw, typesize=1, shuffle=0)
    assert frame[2] & 0x2  # memcpy flag
    assert len(frame) == 16 + len(raw)
    assert blosc_decode(frame) == raw


def test_blosc_shuffle_actually_helps():
    """Byte-shuffle exists for exactly this case: wide-typed data with
    small deltas. The shuffled frame must be materially smaller."""
    from ome_arrow_spark.sources.zarr_minimal import blosc_encode

    arr = (20000 + np.arange(50000) % 7).astype("<u2")  # low-entropy hi-bytes
    plain = blosc_encode(arr.tobytes(), typesize=2, shuffle=0)
    shuf = blosc_encode(arr.tobytes(), typesize=2, shuffle=1)
    assert len(shuf) < len(plain)


@pytest.mark.parametrize("cname", ["blosclz", "zlib", "zstd", "lz4", "snappy"])
def test_blosc_inner_codec_matrix(cname):
    """Every built-in blosc inner codec round-trips with and without
    shuffle, across block layouts — zlib via the stdlib, the rest via
    pyarrow's bundled C codecs."""
    from ome_arrow_spark.sources.zarr_minimal import blosc_decode, blosc_encode

    rng = np.random.default_rng(41)
    for n in (5, 4096, 70000):
        raw = (np.arange(n, dtype=np.int64) % 251).astype(np.uint8).tobytes()
        for shuffle in (0, 1):
            for bs in (0, 4096):
                frame = blosc_encode(
                    raw, typesize=2, shuffle=shuffle, blocksize=bs,
                    cname=cname,
                )
                assert blosc_decode(frame) == raw, (cname, n, shuffle, bs)
    noise = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    assert blosc_decode(blosc_encode(noise, cname=cname)) == noise


def test_blosc_lz4_split_frames_decode():
    """Modern c-blosc SPLITS lz4 blocks into one stream per byte lane;
    synthesize that layout with pyarrow lz4_raw streams and check the
    decoder's split fallback handles the lz4 format too."""
    import struct as _s

    import pyarrow as pa

    from ome_arrow_spark.sources.zarr_minimal import blosc_decode, _shuffle_bytes

    codec = pa.Codec("lz4_raw")
    rng = np.random.default_rng(6)
    raw = (rng.integers(0, 7, 1200, dtype=np.int64) * 1000).astype("<u2").tobytes()
    typesize, blocksize = 2, 800
    nbytes = len(raw)
    nblocks = -(-nbytes // blocksize)
    streams_all = []
    for i in range(nblocks):
        seg = raw[i * blocksize : i * blocksize + min(blocksize, nbytes - i * blocksize)]
        shuf = _shuffle_bytes(seg, typesize)
        lane = len(shuf) // typesize
        block = b""
        for j in range(typesize):
            comp = bytes(codec.compress(shuf[j * lane : (j + 1) * lane]))
            if len(comp) >= lane:
                comp = shuf[j * lane : (j + 1) * lane]
            block += _s.pack("<I", len(comp)) + comp
        streams_all.append(block)
    data_start = 16 + 4 * nblocks
    total = data_start + sum(len(b) for b in streams_all)
    header = _s.pack("<BBBBIII", 2, 1, 0x1 | (1 << 5), typesize,
                     nbytes, blocksize, total)
    bstarts, off = b"", data_start
    for b in streams_all:
        bstarts += _s.pack("<I", off)
        off += len(b)
    assert blosc_decode(header + bstarts + b"".join(streams_all)) == raw


def test_v2_zstd_and_lz4_numcodecs_framing(tmp_path):
    """Plain numcodecs compressors: zstd = bare frame, LZ4 = uint32-LE
    size prefix + raw block — byte-level framing checked on disk."""
    import struct as _s

    import pyarrow as pa

    rng = np.random.default_rng(15)
    arr = rng.integers(0, 65536, size=(8, 9), dtype=np.uint16)
    for comp in ("zstd", "lz4"):
        p = str(tmp_path / comp)
        write_zarr_array(p, arr, chunks=(8, 9), compressor=comp)
        np.testing.assert_array_equal(read_zarr_array(p), arr)
        blob = open(os.path.join(p, "0.0"), "rb").read()
        if comp == "zstd":
            assert blob[:4] == b"\x28\xb5\x2f\xfd"  # zstd magic
        else:
            (n,) = _s.unpack_from("<I", blob, 0)
            assert n == arr.nbytes
            got = bytes(pa.Codec("lz4_raw").decompress(blob[4:], decompressed_size=n))
            assert got == arr.tobytes()


def test_v2_delta_and_shuffle_filters(tmp_path):
    """numcodecs v2 filter chains: build chunks with Delta and Shuffle
    applied encode-order by hand; the reader must invert in reverse."""
    import struct as _s

    from ome_arrow_spark.sources.zarr_minimal import _shuffle_bytes

    arr = (np.arange(48, dtype="<i4") * 7).reshape(6, 8)
    p = str(tmp_path / "filt")
    os.makedirs(p)
    delta = np.diff(arr.ravel(), prepend=arr.ravel()[:1]).astype("<i4")
    blob = zlib.compress(_shuffle_bytes(delta.tobytes(), 4))
    meta = {
        "zarr_format": 2, "shape": [6, 8], "chunks": [6, 8],
        "dtype": "<i4", "order": "C",
        "compressor": {"id": "zlib", "level": 1},
        "filters": [{"id": "delta", "dtype": "<i4"},
                    {"id": "shuffle", "elementsize": 4}],
        "fill_value": 0,
    }
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    open(os.path.join(p, "0.0"), "wb").write(blob)
    np.testing.assert_array_equal(read_zarr_array(p), arr)
    # unknown filters still gate
    meta["filters"] = [{"id": "quantize"}]
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(NotImplementedError, match="quantize"):
        read_zarr_array(p)


def test_v2_fortran_order(tmp_path):
    arr = np.arange(24, dtype="<u2").reshape(4, 6)
    p = str(tmp_path / "forder")
    os.makedirs(p)
    meta = {
        "zarr_format": 2, "shape": [4, 6], "chunks": [4, 6],
        "dtype": "<u2", "order": "F", "compressor": None,
        "filters": None, "fill_value": 0,
    }
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    open(os.path.join(p, "0.0"), "wb").write(
        np.asfortranarray(arr).tobytes(order="F")
    )
    np.testing.assert_array_equal(read_zarr_array(p), arr)


# ---------------------------------------------------------------------------
# Bit-shuffle (c-blosc flag 0x4). No numcodecs/bitshuffle library ships
# in this container to generate cross-library fixtures, so the layout
# is pinned two independent ways: (a) the vectorized transform must
# equal a from-scratch per-bit model of the published scalar algorithm
# (trans_byte_elem → trans_bit_byte → trans_bitrow_eight), and (b)
# frames round-trip across every inner codec and leftover shape.
# ---------------------------------------------------------------------------


def _naive_bitshuffle(buf: bytes, typesize: int) -> bytes:
    unit = typesize * 8
    n = len(buf) - len(buf) % unit
    if n == 0:
        return bytes(buf)
    elems = [buf[i * typesize:(i + 1) * typesize] for i in range(n // typesize)]
    out = bytearray()
    for lane in range(typesize):          # trans_bitrow_eight ordering
        for bit in range(8):              # plane k of this lane
            for m in range(0, len(elems), 8):
                byte = 0
                for i in range(8):        # little-endian packing
                    byte |= ((elems[m + i][lane] >> bit) & 1) << i
                out.append(byte)
    return bytes(out) + bytes(buf[n:])


def test_bitshuffle_matches_scalar_model():
    from ome_arrow_spark.sources.zarr_minimal import (
        _bitshuffle_bytes,
        _bitunshuffle_bytes,
    )

    rng = np.random.default_rng(11)
    for typesize in (1, 2, 3, 4, 8):
        for nbytes in (
            typesize * 8,
            typesize * 64,
            typesize * 64 + 5,          # ragged tail stays raw
            typesize * 8 * 13 + typesize * 3,
        ):
            buf = rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
            fast = _bitshuffle_bytes(buf, typesize)
            assert fast == _naive_bitshuffle(buf, typesize), (typesize, nbytes)
            assert _bitunshuffle_bytes(fast, typesize) == buf


@pytest.mark.parametrize("cname", ["blosclz", "zlib", "zstd", "lz4", "snappy"])
def test_blosc_bitshuffle_frame_roundtrip(cname):
    from ome_arrow_spark.sources.zarr_minimal import blosc_decode, blosc_encode

    data = np.arange(4096, dtype="<u2")  # smooth: bitshuffle compresses well
    raw = data.tobytes()
    frame = blosc_encode(raw, typesize=2, shuffle=2, cname=cname)
    assert frame[2] & 0x4  # bit-shuffle flag set
    assert not frame[2] & 0x1
    assert blosc_decode(frame) == raw
    # multi-block + ragged-length frames
    long_raw = np.arange(100_003, dtype=np.uint8).tobytes()
    frame2 = blosc_encode(long_raw, typesize=4, shuffle=2, cname=cname,
                          blocksize=1 << 14)
    assert blosc_decode(frame2) == long_raw


def test_v2_store_bitshuffle_roundtrip(tmp_path):
    """A v2 store whose chunks are blosc frames with flag 0x4 reads
    back exactly — the frame flags, not the .zarray config, drive the
    decode path end-to-end."""
    import json as _json

    from ome_arrow_spark.sources.zarr_minimal import (
        blosc_encode,
        read_zarr_array,
    )

    arr = (np.arange(2 * 32 * 32) % 65536).astype("<u2").reshape(2, 32, 32)
    store = tmp_path / "bs.zarr"
    store.mkdir()
    (store / ".zarray").write_text(_json.dumps({
        "zarr_format": 2, "shape": [2, 32, 32], "chunks": [1, 32, 32],
        "dtype": "<u2", "order": "C", "fill_value": 0,
        "dimension_separator": ".", "filters": None,
        "compressor": {"id": "blosc", "cname": "zstd", "clevel": 5,
                       "shuffle": 2, "blocksize": 0},
    }))
    for z in range(2):
        frame = blosc_encode(
            arr[z].tobytes(), typesize=2, shuffle=2, cname="zstd"
        )
        assert frame[2] & 0x4
        (store / f"{z}.0.0").write_bytes(frame)
    assert np.array_equal(read_zarr_array(str(store)), arr)


def test_blosclz_property_roundtrip():
    """Hypothesis: arbitrary byte payloads round-trip through the
    pure-Python blosclz codec, including RLE runs and random noise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ome_arrow_spark.sources.blosclz_minimal import (
        blosclz_compress,
        blosclz_decompress,
    )

    @settings(max_examples=120, deadline=None)
    @given(
        st.one_of(
            st.binary(min_size=0, max_size=4000),
            # highly repetitive payloads hit the overlap-copy path
            st.builds(
                lambda pat, reps, tail: pat * reps + tail,
                st.binary(min_size=1, max_size=8),
                st.integers(min_value=1, max_value=600),
                st.binary(max_size=16),
            ),
        )
    )
    def check(data):
        assert blosclz_decompress(blosclz_compress(data), len(data)) == data

    check()
