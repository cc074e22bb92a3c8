"""The pure-Python PNG codec (sources/png_minimal.py). Correctness
bar: lossless round-trips across the sample-type matrix, conformant
chunk/CRC structure, all five filters decoded (cross-checked against
an externally-encoded stream and hand-built filtered scanlines),
palette + tRNS expansion, Adam7 pass reassembly."""

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


@pytest.mark.parametrize("shape", [(13, 17), (16, 16, 3), (7, 5, 4), (1, 1)])
def test_adam7_interlace_decodes(shape):
    """Hand-build Adam7 streams (per-pass sub-images, filter-0
    scanlines) and check the decoder reassembles the original."""
    from ome_arrow_spark.sources.png_minimal import _ADAM7

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    arr3 = img[..., np.newaxis] if img.ndim == 2 else img
    color_type = {1: 0, 3: 2, 4: 6}[arr3.shape[2]]
    passes = []
    for x0, y0, xs, ys in _ADAM7:
        sub = arr3[y0::ys, x0::xs]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            passes.append(b"\x00" + row.tobytes())
    data = PNG_SIGNATURE + _chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", arr3.shape[1], arr3.shape[0], 8,
                    color_type, 0, 0, 1),
    ) + _chunk(b"IDAT", zlib.compress(b"".join(passes))) + _chunk(b"IEND", b"")
    assert np.array_equal(png_decode(data), img)


def test_not_png_rejected():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"\x89PNG\r\n\x1a\x00garbage")


# --- BMP --------------------------------------------------------------------


def _build_bmp(rgb, bpp=24, top_down=False, palette=None, idx=None):
    h, w = (idx.shape if idx is not None else rgb.shape[:2])
    nb = bpp // 8
    stride = ((w * nb) + 3) & ~3
    pal_bytes = b""
    ncolors = 0
    if bpp == 8:
        ncolors = len(palette)
        pal_bytes = b"".join(
            bytes([b, g, r, 0]) for r, g, b in palette
        )
    pix_off = 14 + 40 + len(pal_bytes)
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        if bpp == 8:
            row = bytes(idx[y])
        elif bpp == 24:
            row = rgb[y, :, ::-1].tobytes()
        else:
            row = np.column_stack(
                [rgb[y, :, ::-1], np.full(w, 255, np.uint8)]
            ).tobytes()
        rows.append(row + bytes(stride - len(row)))
    payload = b"".join(rows)
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(payload), 0, 0, pix_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, 0,
        len(payload), 2835, 2835, ncolors, 0,
    )
    return hdr + dib + pal_bytes + payload


def test_bmp_24_and_32bit():
    from ome_arrow_spark.sources.png_minimal import bmp_decode

    rng = np.random.default_rng(31)
    rgb = rng.integers(0, 256, (7, 5, 3), np.uint8)
    for bpp in (24, 32):
        for td in (False, True):
            got = bmp_decode(_build_bmp(rgb, bpp=bpp, top_down=td))
            assert np.array_equal(got, rgb), (bpp, td)


def test_bmp_8bit_palette():
    from ome_arrow_spark.sources.png_minimal import bmp_decode

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    got = bmp_decode(_build_bmp(None, bpp=8, palette=palette, idx=idx))
    assert got.shape == (2, 4, 3)
    assert got[0, 0].tolist() == [255, 0, 0] and got[1, 0].tolist() == [9, 8, 7]


def test_bmp_gates():
    from ome_arrow_spark.sources.png_minimal import bmp_decode

    rgb = np.zeros((4, 4, 3), np.uint8)
    blob = bytearray(_build_bmp(rgb))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        bmp_decode(bytes(blob))
    with pytest.raises(ValueError, match="BMP"):
        bmp_decode(b"XXnot a bitmap")


def test_decode_media_routes_bmp():
    from ome_arrow_spark.operators.multimodal import decode_media

    rgb = ((np.arange(6 * 8 * 3).reshape(6, 8, 3) * 5) % 256).astype(np.uint8)
    kind, arr, meta = decode_media(_build_bmp(rgb))
    assert kind == "image" and meta["format"] == "bmp"
    assert np.array_equal(arr, rgb)


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((13, 17), np.uint8), ((16, 16, 3), np.uint8), ((7, 5, 4), np.uint8),
        ((11, 9), np.uint16), ((10, 12, 3), np.uint16),
        ((1, 1), np.uint8), ((40, 3, 3), np.uint8), ((3, 40), np.uint8),
    ],
)
def test_interlaced_encode_equals_plain(shape, dtype):
    """png_encode(interlace=True) writes real Adam7 streams (per-pass
    adaptive filters) that decode identical to the non-interlaced twin
    across the bit-depth/color matrix."""
    rng = np.random.default_rng(29)
    hi = 65536 if dtype == np.uint16 else 256
    img = rng.integers(0, hi, size=shape, dtype=dtype)
    data = png_encode(img, interlace=True)
    # IHDR interlace byte really is 1
    assert data[8 + 8 + 12] == 1
    assert np.array_equal(png_decode(data), img)
    assert np.array_equal(png_decode(png_encode(img)), img)
