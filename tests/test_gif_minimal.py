"""The pure-Python GIF codec (sources/gif_minimal.py): GIF-variant
LZW (LSB-first, decoder-mirrored width schedule, 4096 freeze),
palettes, multi-frame composition, transparency, disposal, interlace,
honest gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ome_arrow_spark.sources.gif_minimal import (
    _lzw_decode_gif,
    _lzw_encode_gif,
    gif_decode,
    gif_encode,
)


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_layer_roundtrip(mcs):
    rng = np.random.default_rng(2)
    for n in (1, 17, 5000, 20000):
        idx = rng.integers(0, 1 << mcs, size=n).tolist()
        assert _lzw_decode_gif(_lzw_encode_gif(idx, mcs), mcs) == idx
    # repetitive data exercises dictionary growth through width bumps
    idx = ([0, 1, 2, 3] * 2000 + [1, 1, 1, 1] * 1000)
    assert _lzw_decode_gif(_lzw_encode_gif(idx, mcs), mcs) == idx


def test_single_frame_roundtrip():
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 8, size=(24, 31))[..., None]
           * np.array([30, 20, 10])).astype(np.uint8)
    frames, meta = gif_decode(gif_encode(img))
    assert meta["n_frames"] == 1 and meta["w"] == 31 and meta["h"] == 24
    assert np.array_equal(frames[0], img)


def test_multi_frame_roundtrip():
    rng = np.random.default_rng(9)
    vid = (rng.integers(0, 6, size=(4, 12, 18))[..., None]
           * np.array([40, 25, 11])).astype(np.uint8)
    frames, meta = gif_decode(gif_encode(vid))
    assert meta["n_frames"] == 4
    assert np.array_equal(frames, vid)


def test_256_color_table():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)[..., None].repeat(3, -1)
    frames, _ = gif_decode(gif_encode(img))
    assert np.array_equal(frames[0], img)
    i = np.arange(300)
    many = np.stack([i % 256, i // 256, np.zeros_like(i)], axis=-1).astype(
        np.uint8
    ).reshape(300, 1, 3)
    with pytest.raises(ValueError, match="256"):
        gif_encode(many)


def test_interlaced_rows_deinterlace():
    """Set the interlace flag and permute rows into GIF pass order by
    hand; the decoder must restore natural order."""
    img = (np.arange(16)[:, None].repeat(8, 1)[..., None]
           * np.array([10, 5, 3])).astype(np.uint8)
    blob = bytearray(gif_encode(img))
    # image descriptor starts after header(6)+LSD(7)+GCT
    gct_n = 2 << (blob[10] & 7)
    desc = 13 + 3 * gct_n
    assert blob[desc] == 0x2C
    h = 16
    order = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    permuted = gif_encode(img[order])  # rows pre-shuffled into pass order
    pblob = bytearray(permuted)
    pblob[desc + 9] |= 0x40  # descriptor flags byte: set interlace
    frames, _ = gif_decode(bytes(pblob))
    assert np.array_equal(frames[0], img)


def test_transparency_composites_over_previous():
    """Frame 2 marks one palette index transparent: those pixels must
    show frame 1's content."""
    base = np.zeros((4, 4, 3), np.uint8)
    base[:] = [10, 20, 30]
    overlay = np.full((4, 4, 3), 200, np.uint8)
    blob = bytearray(gif_encode(np.stack([base, overlay])))
    # find the second image descriptor and inject a GCE before it
    # marking the overlay's palette index transparent where it equals
    # 200 — palette order is sorted unique colors: [10,20,30] idx 0,
    # [200,200,200] idx 1
    second = blob.index(b"\x2c", blob.index(b"\x2c") + 1)
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 1, 0])  # transparent idx 1
    patched = bytes(blob[:second]) + gce + bytes(blob[second:])
    frames, _ = gif_decode(patched)
    # overlay pixels are all transparent → frame 2 == frame 1
    assert np.array_equal(frames[1], frames[0])


def test_gates_and_garbage():
    with pytest.raises(ValueError, match="GIF"):
        gif_decode(b"NOTGIF....")
    img = np.zeros((2, 2, 3), np.uint8)
    blob = bytearray(gif_encode(img))
    first = blob.index(b"\x2c")
    gce = bytes([0x21, 0xF9, 4, 0x0C, 0, 0, 0, 0])  # disposal 3
    patched = bytes(blob[:first]) + gce + bytes(blob[first:])
    with pytest.raises(NotImplementedError, match="disposal 3"):
        gif_decode(patched)


def test_decode_media_routes_gif():
    from ome_arrow_spark.operators.multimodal import decode_media

    img = (np.arange(12)[:, None].repeat(10, 1)[..., None]
           * np.array([9, 7, 5])).astype(np.uint8)
    kind, arr, meta = decode_media(gif_encode(img))
    assert kind == "image" and meta["format"] == "gif"
    assert np.array_equal(arr, img)
    vid = np.stack([img, img[::-1]])
    kind, arr, meta = decode_media(gif_encode(vid))
    assert kind == "video" and arr.shape == (2, 12, 10, 3)
