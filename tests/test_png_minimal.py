"""The pure-Python PNG codec (sources/png_minimal.py). Correctness
bar: lossless round-trips across the sample-type matrix, conformant
chunk/CRC structure, all five filters decoded (cross-checked against
an externally-encoded stream and hand-built filtered scanlines),
palette + tRNS expansion, honest gates (Adam7)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ome_arrow_spark.sources.png_minimal import (
    PNG_SIGNATURE,
    png_decode,
    png_encode,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _build_png(width, height, bit_depth, color_type, raw_scanlines,
               plte=None, trns=None) -> bytes:
    out = PNG_SIGNATURE + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(raw_scanlines)) + _chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((13, 17), np.uint8),
        ((13, 17, 3), np.uint8),
        ((9, 11, 4), np.uint8),
        ((13, 17), np.uint16),
        ((8, 6, 3), np.uint16),
    ],
)
def test_roundtrip_matrix(shape, dtype):
    rng = np.random.default_rng(3)
    hi = 256 if dtype == np.uint8 else 65536
    img = rng.integers(0, hi, size=shape, dtype=dtype)
    back = png_decode(png_encode(img))
    assert back.dtype == dtype and np.array_equal(back, img)


def test_filter_heuristic_compresses_smooth_data():
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    g = ((np.sin(yy / 5) + np.cos(xx / 7)) * 60 + 128).astype(np.uint8)
    rgb = np.stack([g, 255 - g, np.roll(g, 3, axis=1)], axis=-1)
    enc = png_encode(rgb)
    assert np.array_equal(png_decode(enc), rgb)
    assert len(enc) < rgb.nbytes // 2  # filters must actually help


def test_known_external_png_decodes():
    """The ubiquitous 1×1 RGBA PNG literal (produced by a real
    encoder; Sub-filtered scanline) → (0, 0, 255, 127)."""
    import base64

    data = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
        "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    arr = png_decode(data)
    assert arr.shape == (1, 1, 4)
    assert arr.ravel().tolist() == [0, 0, 255, 127]


def test_all_five_filters_decode():
    """Hand-build one image per filter type and check the inverse
    against the spec's recurrences."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    rows = img.reshape(4, 15).astype(np.int16)
    prior = np.vstack([np.zeros((1, 15), np.int16), rows[:-1]])
    left = np.zeros_like(rows)
    left[:, 3:] = rows[:, :-3]
    ul = np.zeros_like(rows)
    ul[1:, 3:] = rows[:-1, :-3]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))

    deltas = {
        0: rows,
        1: rows - left,
        2: rows - prior,
        3: rows - ((left + prior) >> 1),
        4: rows - paeth(left, prior, ul),
    }
    for ft, d in deltas.items():
        raw = b"".join(
            bytes([ft]) + (d[y] & 0xFF).astype(np.uint8).tobytes()
            for y in range(4)
        )
        got = png_decode(_build_png(5, 4, 8, 2, raw))
        assert np.array_equal(got, img), f"filter {ft}"


def test_palette_and_trns():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    raw = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()
    rgb = png_decode(_build_png(2, 2, 8, 3, raw, plte=plte))
    assert rgb.shape == (2, 2, 3)
    assert rgb[0, 0].tolist() == [255, 0, 0] and rgb[1, 1].tolist() == [10, 20, 30]
    rgba = png_decode(_build_png(2, 2, 8, 3, raw, plte=plte, trns=bytes([0, 128])))
    assert rgba.shape == (2, 2, 4)
    assert rgba[0, 0, 3] == 0 and rgba[0, 1, 3] == 128 and rgba[1, 0, 3] == 255


def test_subbyte_gray_depths():
    # 1-bit 8×2 checkerboard: packed MSB-first
    raw = b"\x00" + bytes([0b10101010]) + b"\x00" + bytes([0b01010101])
    arr = png_decode(_build_png(8, 2, 1, 0, raw))
    assert arr.shape == (2, 8)
    assert arr[0].tolist() == [255, 0] * 4 and arr[1].tolist() == [0, 255] * 4
    # 4-bit grayscale scales 0..15 → 0..255 by ×17
    raw4 = b"\x00" + bytes([0x0F, 0x80])
    a4 = png_decode(_build_png(3, 1, 4, 0, raw4))
    assert a4[0].tolist() == [0, 255, 136]


def test_multi_idat_streams():
    img = np.arange(48, dtype=np.uint8).reshape(4, 12)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    comp = zlib.compress(raw)
    half = len(comp) // 2
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 12, 4, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", comp[:half])
        + _chunk(b"IDAT", comp[half:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(data), img)


def test_crc_corruption_detected():
    enc = bytearray(png_encode(np.zeros((4, 4), np.uint8)))
    enc[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(enc))


def test_interlace_gates():
    raw = b"\x00" + bytes(4)
    data = PNG_SIGNATURE + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 1, 8, 0, 0, 0, 1)
    ) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="Adam7"):
        png_decode(data)


def test_not_png_rejected():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"\x89PNG\r\n\x1a\x00garbage")
