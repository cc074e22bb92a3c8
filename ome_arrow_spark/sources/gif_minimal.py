"""Minimal pure-Python GIF87a/89a codec — stdlib ``struct`` + numpy.

Decoder: global/local color tables, GIF-variant LZW (LSB-first bit
packing, variable initial code size, no early change, 12-bit cap),
sub-block defragmentation, multi-frame animations with per-frame
offsets, graphic-control transparency, disposal methods 0/1 (leave)
and 2 (restore background), Plain-Text/Comment/Application extensions
skipped. Disposal 3 (restore previous) raises — rare and stateful.
Returns ``(frames, meta)`` with frames ``(F, H, W, 3)`` uint8 RGB
composed on the logical-screen canvas.

Encoder (single- or multi-frame, one global palette built from the
image's distinct colors, ≤ 256): real dictionary LZW whose code-width
schedule mirrors the decoder table growth, so any viewer opens the
output. Used by tests and the media-table fixtures.

GIF is endemic in web-scrape corpora, so the media table routes
``GIF8`` blobs here (operators/multimodal.py): single-frame → image,
multi-frame → video.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode_gif(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW → palette indices. LSB-first packing, CLEAR =
    2^min, EOI = CLEAR+1, table grows to 4096 then freezes until
    CLEAR."""
    CLEAR = 1 << min_code_size
    EOI = CLEAR + 1
    out: list[int] = []
    buf = 0
    cnt = 0
    pos = 0
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(CLEAR)] + [[], []]
    prev: list[int] | None = None
    while True:
        while cnt < width:
            if pos >= len(data):
                return out  # tolerate missing EOI
            buf |= data[pos] << cnt
            pos += 1
            cnt += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        cnt -= width
        if code == CLEAR:
            table = [[i] for i in range(CLEAR)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == EOI:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF: first code not a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF: code beyond table")
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        out.extend(entry)
        prev = entry


def _lzw_encode_gif(indices: list[int], min_code_size: int) -> bytes:
    """Dictionary LZW whose code-width schedule MIRRORS the decoder:
    the decoder appends one table entry per data code after the first
    and widens when its table length reaches 1<<width, so the encoder
    tracks that length (``dlen``) explicitly rather than its own
    ``next_code`` (which leads by one). Both sides freeze at 4096."""
    CLEAR = 1 << min_code_size
    EOI = CLEAR + 1
    out = bytearray()
    buf = 0
    cnt = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal buf, cnt
        buf |= code << cnt
        cnt += width
        while cnt >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            cnt -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(CLEAR)}
    next_code = EOI + 1
    dlen = CLEAR + 2  # decoder's table length
    data_codes = 0

    def emit_data(code: int) -> None:
        nonlocal data_codes, dlen, width
        emit(code)
        data_codes += 1
        if data_codes >= 2 and dlen < 4096:
            dlen += 1
            if dlen == (1 << width) and width < 12:
                width += 1

    emit(CLEAR)
    run: tuple[int, ...] = ()
    for sym in indices:
        cand = run + (sym,)
        if cand in table:
            run = cand
            continue
        emit_data(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        run = (sym,)
    if run:
        emit_data(table[run])
    emit(EOI)
    if cnt:
        out.append(buf & 0xFF)
    return bytes(out)


def gif_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """GIF bytes → ``((F, H, W, 3) uint8 RGB frames, meta)``.
    Truncated or malformed input raises ``ValueError``, never a raw
    struct/index error."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF stream")
    try:
        return _gif_decode_inner(data)
    except (struct.error, IndexError):
        raise ValueError("truncated GIF stream") from None


def _gif_decode_inner(data: bytes) -> tuple[np.ndarray, dict]:
    width, height, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
        pos += 3 * n
    canvas = np.zeros((height, width, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    bg_canvas = canvas.copy()
    frames = []
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = data[pos]
                gflags, _delay, tindex = struct.unpack_from(
                    "<BHB", data, pos + 1
                )
                pos += 1 + sz
                transparent = tindex if gflags & 1 else None
                disposal = (gflags >> 2) & 7
                if disposal == 3:
                    raise NotImplementedError(
                        "GIF disposal 3 (restore previous) unsupported"
                    )
            # skip remaining sub-blocks (and the whole block for other labels)
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            x0, y0, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(
                    data, np.uint8, count=3 * n, offset=pos
                ).reshape(-1, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image with no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.array(
                _lzw_decode_gif(bytes(lzw), min_code)[: w * h], np.int32
            )
            if idx.size < w * h:
                raise ValueError("corrupt GIF: short pixel data")
            idx = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced row order
                order = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2),
                ])
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            region = canvas[y0 : y0 + h, x0 : x0 + w]
            rgb = pal[idx]
            if transparent is not None:
                mask = (idx != transparent)[..., np.newaxis]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            if disposal == 2:  # restore background in the frame rect
                canvas[y0 : y0 + h, x0 : x0 + w] = bg_canvas[
                    y0 : y0 + h, x0 : x0 + w
                ]
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), {"w": int(width), "h": int(height),
                              "n_frames": len(frames)}


def gif_encode(frames: np.ndarray) -> bytes:
    """Encode uint8 RGB ``(H, W, 3)`` or ``(F, H, W, 3)`` (≤ 256
    distinct colors total) as GIF89a with one global color table."""
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[np.newaxis]
    if frames.ndim != 4 or frames.shape[-1] != 3 or frames.dtype != np.uint8:
        raise ValueError("gif_encode expects uint8 (H,W,3) or (F,H,W,3)")
    f, h, w, _ = frames.shape
    colors, inverse = np.unique(
        frames.reshape(-1, 3), axis=0, return_inverse=True
    )
    if len(colors) > 256:
        raise ValueError("gif_encode supports at most 256 distinct colors")
    depth = max(1, int(len(colors) - 1).bit_length())
    n_table = 1 << depth
    pal = np.zeros((n_table, 3), np.uint8)
    pal[: len(colors)] = colors
    idx_frames = inverse.astype(np.int32).reshape(f, h, w)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    min_code = max(2, depth)
    for fi in range(f):
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode_gif(idx_frames[fi].ravel().tolist(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
