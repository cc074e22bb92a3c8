"""Netpbm (PGM/PPM) codec — the lingua franca of classic CV datasets.

Decodes the four common variants (P2/P3 ASCII, P5/P6 binary gray/RGB,
maxval ≤ 255 → uint8, 256..65535 → big-endian uint16 per the spec) and
encodes P5/P6.  Header comments (``#``) and arbitrary whitespace are
handled per the netpbm grammar.  Malformed input raises ``ValueError``
(never struct/index errors), matching the engine codec contract.
P1/P4 bitmaps are rejected with ``NotImplementedError`` (rare in
corpora; the CCITT path covers bilevel needs).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["pnm_decode", "pnm_encode"]

_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*([0-9]+)")


def _read_tokens(data: bytes, pos: int, n: int) -> tuple[list[int], int]:
    out = []
    while len(out) < n:
        m = _TOKEN.match(data, pos)
        if not m:
            raise ValueError("truncated PNM header/body")
        out.append(int(m.group(1)))
        pos = m.end()
    return out, pos


def pnm_decode(data: bytes) -> np.ndarray:
    """PGM/PPM bytes → uint8/uint16 (H, W) gray or (H, W, 3) RGB."""
    if len(data) < 2 or data[0:1] != b"P":
        raise ValueError("not a PNM stream")
    magic = data[:2]
    if magic in (b"P1", b"P4"):
        raise NotImplementedError("PNM bitmap (P1/P4) unsupported")
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError(f"not a PNM stream (magic {magic!r})")
    channels = 3 if magic in (b"P3", b"P6") else 1
    (w, h, maxval), pos = _read_tokens(data, 2, 3)
    if w <= 0 or h <= 0 or not (1 <= maxval <= 65535):
        raise ValueError("corrupt PNM header")
    n = w * h * channels
    if magic in (b"P2", b"P3"):  # ASCII samples
        vals, _ = _read_tokens(data, pos, n)
        arr = np.array(vals, dtype=np.uint16 if maxval > 255 else np.uint8)
    else:  # binary: exactly ONE whitespace byte after maxval
        pos += 1
        if maxval > 255:
            raw = data[pos : pos + 2 * n]
            if len(raw) != 2 * n:
                raise ValueError("truncated PNM pixel data")
            arr = np.frombuffer(raw, dtype=">u2").astype(np.uint16)
        else:
            raw = data[pos : pos + n]
            if len(raw) != n:
                raise ValueError("truncated PNM pixel data")
            arr = np.frombuffer(raw, dtype=np.uint8).copy()
    if arr.max(initial=0) > maxval:
        raise ValueError("corrupt PNM: sample exceeds maxval")
    return (
        arr.reshape(h, w) if channels == 1 else arr.reshape(h, w, 3)
    )


def pnm_encode(img: np.ndarray) -> bytes:
    """uint8/uint16 (H, W) gray → P5, (H, W, 3) RGB → P6."""
    img = np.asarray(img)
    if img.dtype not in (np.uint8, np.uint16):
        raise ValueError("pnm_encode expects uint8 or uint16 samples")
    if img.ndim == 2:
        magic, payload_shape = b"P5", img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        magic, payload_shape = b"P6", img.shape[:2]
    else:
        raise ValueError("pnm_encode expects (H, W) or (H, W, 3)")
    h, w = payload_shape[:2]
    maxval = 255 if img.dtype == np.uint8 else 65535
    body = (
        img.astype(">u2").tobytes() if maxval > 255 else img.tobytes()
    )
    return b"%s\n%d %d\n%d\n" % (magic, w, h, maxval) + body
