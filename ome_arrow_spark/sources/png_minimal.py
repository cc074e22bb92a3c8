"""Minimal pure-Python PNG codec (RFC 2083 / ISO 15948) — stdlib
``zlib`` + ``struct`` + numpy only.

Decoder: 8- and 16-bit grayscale / grayscale+alpha / truecolor (RGB) /
truecolor+alpha (RGBA), 8-bit palette (PLTE, with optional tRNS
alpha), 1/2/4-bit grayscale and palette, all five scanline filters
(None/Sub/Up/Average/Paeth), multi-IDAT streams, CRC validation,
Adam7 interlace (pass-by-pass sub-image decode).

Encoder: 8-bit grayscale / RGB / RGBA and 16-bit grayscale / RGB,
per-scanline filter heuristic (minimum-sum-of-absolute-differences
over None/Sub/Up/Average/Paeth — the libpng default strategy), one
zlib IDAT.

The media-table operators (operators/multimodal.py) route ``.png``
blobs here, mirroring how the reference's promise of media as
queryable table columns (README.md:20-22) is met for JPEG via
``jpeg_minimal``. A minimal BMP decoder (24/32-bit + 8-bit palette —
the other header-plus-raw-rows format endemic to web scrapes) rides
along at the bottom of the module. Throughput is zlib-bound (C speed) — the filter
pass is vectorized except the inherently sequential Sub/Paeth
scanline recurrences.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grids: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Undo per-scanline filtering. ``stride`` excludes the filter
    byte; ``bpp`` is the filter-delta distance in whole bytes
    (max(1, bits_per_pixel//8) per spec)."""
    out = bytearray(height * stride)
    pos = 0
    prev_start = -1
    for y in range(height):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        cur = y * stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub: per-byte-lane wrapping prefix sum
            d = np.frombuffer(bytes(line), np.uint8)
            lanes = d.reshape(-1, bpp)  # stride is a bpp multiple
            line = bytearray(
                np.add.accumulate(lanes, axis=0, dtype=np.uint8).tobytes()
            )
        elif ft == 2:  # Up
            if prev_start >= 0:
                prior = out[prev_start : prev_start + stride]
                line = bytearray(
                    (np.frombuffer(bytes(line), np.uint8)
                     + np.frombuffer(bytes(prior), np.uint8)).astype(np.uint8)
                    .tobytes()
                )
        elif ft == 3:  # Average
            prior = (
                out[prev_start : prev_start + stride]
                if prev_start >= 0
                else bytes(stride)
            )
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            prior = (
                out[prev_start : prev_start + stride]
                if prev_start >= 0
                else bytes(stride)
            )
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prior[i], ul)) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter type {ft}")
        out[cur : cur + stride] = line
        prev_start = cur
    return out


def _unpack_subbyte(row_bytes: np.ndarray, bit_depth: int, width: int) -> np.ndarray:
    """Expand 1/2/4-bit packed samples (MSB first) → one value per
    sample, per scanline row of packed bytes."""
    bits = np.unpackbits(row_bytes, axis=-1)
    if bit_depth == 1:
        vals = bits
    else:
        vals = bits.reshape(*bits.shape[:-1], -1, bit_depth)
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint16)
        vals = (vals * weights).sum(axis=-1)
    return vals[..., :width]


def _scanlines_to_samples(
    raw: bytes, pos: int, w: int, h: int, bit_depth: int, channels: int
) -> tuple[np.ndarray, int]:
    """Consume ``h`` filtered scanlines of a ``w``-wide (sub)image →
    ``(h, w, channels)`` sample array + new offset."""
    bits_pp = bit_depth * channels
    stride = (w * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)
    need = h * (stride + 1)
    if len(raw) - pos < need:
        raise ValueError("corrupt PNG: IDAT size mismatch")
    flat = _unfilter(raw[pos : pos + need], h, stride, bpp)
    rows = np.frombuffer(bytes(flat), np.uint8).reshape(h, stride)
    if bit_depth == 16:
        arr = rows.reshape(h, -1).view(">u2").astype(np.uint16)
        arr = arr.reshape(h, w, channels)
    elif bit_depth == 8:
        arr = rows.reshape(h, w, channels)
    else:
        arr = _unpack_subbyte(rows, bit_depth, w)[..., np.newaxis]
    return arr, pos + need


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes → uint8/uint16 array ``(H, W)`` grayscale,
    ``(H, W, 2)`` gray+alpha, ``(H, W, 3)`` RGB, or ``(H, W, 4)``
    RGBA. Palette images come back expanded to RGB (or RGBA with
    tRNS). Adam7-interlaced streams decode pass-by-pass. Truncated or
    malformed input raises ``ValueError``, never a raw struct/index
    error."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG stream (bad signature)")
    try:
        return _png_decode_inner(data)
    except (struct.error, IndexError, zlib.error):
        raise ValueError("truncated PNG stream") from None


def _png_decode_inner(data: bytes) -> np.ndarray:
    pos = 8
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(data[pos + 4 : pos + 8 + length]) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: bad CRC in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = chunk
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("corrupt PNG: missing IHDR")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("corrupt PNG: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"corrupt PNG: interlace method {interlace}")
    if color_type not in _CHANNELS:
        raise ValueError(f"corrupt PNG: color type {color_type}")
    channels = _CHANNELS[color_type]
    if bit_depth not in (1, 2, 4, 8, 16) or (
        bit_depth < 8 and color_type not in (0, 3)
    ):
        raise ValueError(f"invalid PNG bit depth {bit_depth} for color {color_type}")
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        dt = np.uint16 if bit_depth == 16 else np.uint8
        arr = np.zeros((height, width, channels), dtype=dt)
        pos = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no scanlines
            sub, pos = _scanlines_to_samples(
                raw, pos, pw, ph, bit_depth, channels
            )
            arr[y0::ys, x0::xs] = sub
    else:
        arr, pos = _scanlines_to_samples(
            raw, 0, width, height, bit_depth, channels
        )
    if pos != len(raw):
        raise ValueError("corrupt PNG: IDAT size mismatch")
    if bit_depth < 8 and color_type == 0:
        # scale sub-byte gray to the full 8-bit range
        arr = (arr * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
    if color_type == 3:
        if plte is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        idx = arr[..., 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(256, 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return arr[..., 0] if channels == 1 else arr


def _filter_scanlines(arr2d: np.ndarray, bpp: int) -> bytes:
    """Per-scanline minimum-SAD filter choice over all five types,
    vectorized across the whole image per candidate filter."""
    h, stride = arr2d.shape
    cur = arr2d.astype(np.int16)
    prior = np.vstack([np.zeros((1, stride), np.int16), cur[:-1]])
    left = np.zeros_like(cur)
    left[:, bpp:] = cur[:, :-bpp]
    ul = np.zeros_like(cur)
    ul[1:, bpp:] = cur[:-1, :-bpp]
    cand = np.empty((5, h, stride), np.uint8)
    cand[0] = cur.astype(np.uint8)
    cand[1] = ((cur - left) & 0xFF).astype(np.uint8)
    cand[2] = ((cur - prior) & 0xFF).astype(np.uint8)
    cand[3] = ((cur - ((left + prior) >> 1)) & 0xFF).astype(np.uint8)
    p = left + prior - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
    pred = np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
    )
    cand[4] = ((cur - pred) & 0xFF).astype(np.uint8)
    # SAD proxy: sum of values treated as signed deltas (libpng rule)
    signed = cand.astype(np.int16)
    sad = np.where(signed < 128, signed, 256 - signed).sum(axis=2)
    best = sad.argmin(axis=0)
    out = bytearray()
    for y in range(h):
        out.append(int(best[y]))
        out += cand[best[y], y].tobytes()
    return bytes(out)


def bmp_decode(data: bytes) -> np.ndarray:
    """Minimal BMP (Windows DIB) decoder — 24/32-bit uncompressed and
    8-bit palette, bottom-up or top-down rows. Returns uint8 (H, W, 3).
    Compressed (RLE) or 16-bit BMPs raise ``NotImplementedError``.
    BMP shows up constantly in web-scrape corpora; the format is
    header + raw rows, so it rides here beside PNG rather than in its
    own module."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP stream")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP unsupported")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS (default masks)
        raise NotImplementedError(f"BMP compression {compression} unsupported")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP unsupported")
    top_down = height < 0
    height = abs(height)
    if bpp == 8:
        ncolors = struct.unpack_from("<I", data, 46)[0] or 256
        pal = np.frombuffer(
            data, np.uint8, count=4 * ncolors, offset=14 + hdr_size
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRA → RGB
    stride = ((width * bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        data, np.uint8, count=height * stride, offset=pix_off
    ).reshape(height, stride)
    if bpp == 8:
        idx = rows[:, :width]
        rgb = pal[idx]
    else:
        nb = bpp // 8
        px = rows[:, : width * nb].reshape(height, width, nb)
        rgb = px[:, :, 2::-1]  # BGR(A) → RGB
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


def png_encode(
    img: np.ndarray, compress_level: int = 6, interlace: bool = False
) -> bytes:
    """Encode uint8 (H,W) gray / (H,W,3) RGB / (H,W,4) RGBA, or uint16
    (H,W) / (H,W,3), as a conformant PNG. ``interlace=True`` writes
    the Adam7 layout (seven filtered sub-image passes, each with its
    own filter context, PNG spec §8.2) — the old-web-PNG form the
    decoder's interlaced path reads back."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        bit_depth = 8
    elif img.dtype == np.uint16:
        bit_depth = 16
    else:
        raise ValueError("png_encode expects uint8 or uint16 samples")
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError("png_encode expects (H,W), (H,W,3) or (H,W,4)")
    if bit_depth == 16 and color_type == 6:
        raise ValueError("16-bit RGBA encode unsupported (use RGB or gray)")
    h, w = img.shape[:2]
    bpp = max(1, bit_depth * channels // 8)
    arr3 = img[..., np.newaxis] if img.ndim == 2 else img

    def rows_of(sub: np.ndarray) -> np.ndarray:
        sh = sub.shape[0]
        if bit_depth == 16:
            return np.ascontiguousarray(
                sub.astype(">u2").reshape(sh, -1).view(np.uint8)
            )
        return np.ascontiguousarray(sub.reshape(sh, -1))

    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = arr3[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass emits nothing
            parts.append(_filter_scanlines(rows_of(sub), bpp))
        filtered = b"".join(parts)
    else:
        filtered = _filter_scanlines(rows_of(arr3), bpp)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 1 if interlace else 0
    )
    idat = zlib.compress(filtered, compress_level)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
