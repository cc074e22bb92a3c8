"""Minimal from-spec AVI (RIFF) video container, both directions.

The reference treats video as out-of-scope (single-image library); this
engine's media table (operators/multimodal.py) promises video columns,
so the container has to be real.  Two codecs, both self-contained:

* ``codec="raw"`` — uncompressed DIB frames (``00db`` chunks,
  bottom-up BGR rows padded to 4 bytes, biCompression=0), the
  canonical uncompressed AVI produced by VfW/ffmpeg ``-c:v rawvideo``.
* ``codec="mjpeg"`` — Motion-JPEG (``00dc`` chunks, fourcc MJPG),
  each frame a complete baseline JPEG stream decoded by the engine's
  own ITU T.81 codec (sources/jpeg_minimal.py) — a genuinely
  compressed video path with zero external dependencies.

Layout written (and tolerated when reading, plus common variants):
``RIFF 'AVI ' { LIST hdrl { avih, LIST strl { strh, strf } },
LIST movi { 00db/00dc ... }, idx1 }``.  The parser walks chunks
structurally, so extra streams, JUNK padding, odd-size pad bytes, and
a missing idx1 (unfinalized writers) all decode.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _bgr_dib(frame: np.ndarray, top_down: bool = False) -> bytes:
    """(H,W,3) RGB uint8 → BGR rows, stride padded to 4. Bottom-up
    row order by default; ``top_down`` keeps natural order (pairs with
    a negative biHeight in strf)."""
    h, w, _ = frame.shape
    stride = (w * 3 + 3) & ~3
    bgr = frame[:, :, ::-1] if top_down else frame[::-1, :, ::-1]
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def avi_encode(
    frames: np.ndarray,
    fps: int = 10,
    codec: str = "raw",
    jpeg_quality: int = 90,
    jpeg_restart_interval: int = 0,
    top_down: bool = False,
) -> bytes:
    """(F,H,W,3) uint8 RGB → AVI bytes. ``top_down=True`` writes the
    raw codec with negative biHeight (top-down DIB rows, the Windows
    capture-tool convention); ``jpeg_restart_interval`` adds DRI+RST
    markers to each MJPEG frame."""
    if frames.ndim != 4 or frames.shape[-1] != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (F,H,W,3) uint8")
    f, h, w, _ = frames.shape
    if codec == "raw":
        handler, compression = b"DIB ", 0
        payloads = [_bgr_dib(fr, top_down) for fr in frames]
        frame_cc = b"00db"
    elif codec == "mjpeg":
        from ome_arrow_spark.sources.jpeg_minimal import jpeg_encode

        handler = b"MJPG"
        compression = struct.unpack("<I", b"MJPG")[0]
        payloads = [
            jpeg_encode(fr, quality=jpeg_quality,
                        restart_interval=jpeg_restart_interval)
            for fr in frames
        ]
        frame_cc = b"00dc"
    else:
        raise ValueError(f"unknown codec: {codec!r} (raw, mjpeg)")

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        f, 0, 1, max_bytes,  # frames, initial, streams, bufsize
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + handler
        + struct.pack(
            "<10I4h",
            0, 0, 0,  # flags, prio+lang, initial
            1, fps,  # dwScale / dwRate = frame period
            0, f, max_bytes, 0xFFFFFFFF, 0,  # start, length, buf, quality, samplesize
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<I2i2H6I", 40, w, (-h if top_down and codec == "raw" else h),
        1, 24, compression,
        len(payloads[0]), 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = [_chunk(frame_cc, p) for p in payloads]
    movi = _list(b"movi", b"".join(movi_chunks))
    # idx1: one entry per frame — offset counts from the 'movi' fourcc
    idx, off = [], 4
    for p, ck in zip(payloads, movi_chunks):
        idx.append(frame_cc + struct.pack("<3I", 0x10, off, len(p)))
        off += len(ck)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", b"".join(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a chunk run."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _decode_dib(
    payload: bytes, w: int, h: int, bpp: int, top_down: bool = False
) -> np.ndarray:
    """One uncompressed DIB frame → (H,W,3) RGB. Bottom-up rows (the
    positive-biHeight default) are flipped; ``top_down=True`` (negative
    biHeight, common from Windows capture tools) keeps row order."""
    stride = ((w * bpp // 8) + 3) & ~3
    rows = np.frombuffer(payload[: stride * h], np.uint8).reshape(h, stride)
    flip = slice(None) if top_down else slice(None, None, -1)
    if bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return bgr[flip, :, ::-1].copy()
    if bpp == 32:
        bgrx = rows[:, : w * 4].reshape(h, w, 4)
        return bgrx[flip, :, 2::-1].copy()
    raise ValueError(f"unsupported DIB bit depth: {bpp}")


def avi_decode(data: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    """AVI bytes → ((F,H,W,3) uint8 RGB, meta{w,h,fps,n_frames,codec}).
    Malformed/truncated input raises ``ValueError`` (never a raw
    ``struct.error``/``IndexError``), matching the decode contract of
    the other built-in codecs."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') stream")
    try:
        return _avi_decode_inner(data)
    except (struct.error, IndexError):
        raise ValueError("truncated AVI stream") from None


def _avi_decode_inner(data: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])

    w = h = fps = 0
    bpp, compression, handler = 24, 0, b""
    top_down = False
    frames: list[bytes] = []

    def walk_list(start: int, stop: int) -> None:
        nonlocal w, h, fps, bpp, compression, handler, top_down
        for fourcc, p, n in _walk(data, start, stop):
            if fourcc == b"LIST":
                walk_list(p + 4, p + n)
            elif fourcc == b"avih":
                us_pf, *_rest = struct.unpack_from("<I", data, p)
                if us_pf:
                    fps = round(1_000_000 / us_pf)
                w0, h0 = struct.unpack_from("<2I", data, p + 32)
                w, h = w or w0, h or h0
            elif fourcc == b"strh" and data[p : p + 4] == b"vids":
                handler = data[p + 4 : p + 8]
                scale, rate = struct.unpack_from("<2I", data, p + 20)
                if scale:
                    fps = round(rate / scale)
            elif fourcc == b"strf" and handler:
                _sz, bw, bh, _pl, bc, comp = struct.unpack_from(
                    "<I2i2HI", data, p
                )
                # negative biHeight = top-down row order (no flip)
                w, h, bpp, compression = abs(bw), abs(bh), bc, comp
                top_down = bh < 0
            elif fourcc[2:] in (b"db", b"dc") and fourcc[:2].isdigit():
                frames.append(bytes(data[p : p + n]))

    walk_list(12, end)
    if not frames:
        raise ValueError("AVI contains no video frames")

    mjpg = handler == b"MJPG" or compression == struct.unpack("<I", b"MJPG")[0]
    out = []
    for payload in frames:
        if mjpg or payload[:2] == b"\xff\xd8":
            from ome_arrow_spark.sources.jpeg_minimal import jpeg_decode

            arr = jpeg_decode(payload)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            out.append(arr.astype(np.uint8))
        else:
            out.append(_decode_dib(payload, w, h, bpp, top_down))
    stacked = np.stack(out)
    return stacked, {
        "w": int(stacked.shape[2]),
        "h": int(stacked.shape[1]),
        "fps": int(fps),
        "n_frames": int(stacked.shape[0]),
        "codec": "mjpeg" if mjpg else "raw",
    }
