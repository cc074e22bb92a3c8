"""Minimal pure-Python baseline-TIFF codec: classic (non-Big) TIFF,
uncompressed, striped, grayscale, 8- or 16-bit, little- or big-endian,
multi-page. This is the no-dependency fallback that lets
``from_tiff_dir`` ingest REAL ``.tif`` bytes (the reference's
CellProfiler-style fixtures, reference tests/test_core.py:199-246)
when ``tifffile`` is absent; anything fancier (compression, tiles, RGB,
planar configs) still requires tifffile and raises
``NotImplementedError`` upstream.

Page mapping follows the reference's BioIO convention for plain
grayscale stacks: N pages → a z-stack, volume shape ``(1, 1, N, Y, X)``
(reference ingest.py:293-340 reads TCZYX via BioIO).
"""

from __future__ import annotations

import struct

import numpy as np

# the baseline tag subset (TIFF 6.0 §8)
TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def is_tiff(data: bytes) -> bool:
    """Classic-TIFF magic: byte order mark + 42."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        return False
    bo = "<" if data[:2] == b"II" else ">"
    return struct.unpack(bo + "H", data[2:4])[0] == 42


def _read_ifd_entries(data: bytes, bo: str, off: int) -> tuple[dict[int, list[int]], int]:
    """One IFD → ({tag: values}, next_ifd_offset). Only integer-typed
    tags the baseline needs are materialized."""
    (n_entries,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", data, base)
        if typ not in (1, 3, 4):  # BYTE/SHORT/LONG — all the baseline uses
            continue
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            val_off = base + 8
        else:
            (val_off,) = struct.unpack_from(bo + "I", data, base + 8)
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(bo + str(count) + fmt, data, val_off))
    (next_off,) = struct.unpack_from(bo + "I", data, off + 2 + 12 * n_entries)
    return tags, next_off


def decode_tiff_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale TIFF → uint16 volume ``(1,1,N,Y,X)``.

    Raises ``ValueError`` on non-TIFF bytes and ``NotImplementedError``
    on TIFF features outside the baseline subset — the caller decides
    whether tifffile can take over."""
    if not is_tiff(data):
        raise ValueError("not a classic TIFF byte stream")
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    pages: list[np.ndarray] = []
    while ifd_off:
        try:
            tags, ifd_off = _read_ifd_entries(data, bo, ifd_off)
        except (struct.error, IndexError) as exc:
            raise ValueError(f"malformed/truncated TIFF structure: {exc}") from exc
        if TAG_WIDTH not in tags or TAG_HEIGHT not in tags or TAG_STRIP_OFFSETS not in tags:
            raise ValueError("malformed TIFF: IFD lacks required baseline tags")
        width = tags[TAG_WIDTH][0]
        height = tags[TAG_HEIGHT][0]
        bits = tags.get(TAG_BITS, [1])[0]
        comp = tags.get(TAG_COMPRESSION, [1])[0]
        spp = tags.get(TAG_SAMPLES_PER_PIXEL, [1])[0]
        if comp != 1:
            raise NotImplementedError(
                f"TIFF compression {comp} is outside the baseline subset"
            )
        if spp != 1:
            raise NotImplementedError(
                f"{spp} samples/pixel (RGB/extra) is outside the baseline subset"
            )
        if bits not in (8, 16):
            raise NotImplementedError(f"{bits}-bit samples are outside the baseline subset")
        offsets = tags[TAG_STRIP_OFFSETS]
        counts = tags[TAG_STRIP_BYTE_COUNTS]
        raw = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
        dtype = np.dtype(("<" if bo == "<" else ">") + ("u1" if bits == 8 else "u2"))
        plane = np.frombuffer(raw, dtype=dtype, count=width * height).reshape(
            height, width
        )
        pages.append(plane.astype(np.uint16))
    if not pages:
        raise ValueError("TIFF contains no IFDs")
    vol = np.stack(pages)  # (N, Y, X); pages → z like the reference's BioIO read
    return vol[np.newaxis, np.newaxis, :, :, :]


def encode_tiff_baseline(
    vol: np.ndarray, *, big_endian: bool = False, rows_per_strip: int | None = None
) -> bytes:
    """Encode a ``(Z,Y,X)`` (or ``(Y,X)``) uint8/uint16 array as a real
    multi-page baseline TIFF — one IFD per z-plane, uncompressed strips.
    Exists so tests (and the sink, for single-channel stacks) produce
    genuine TIFF bytes that ANY reader opens."""
    vol = np.asarray(vol)
    if vol.ndim == 2:
        vol = vol[np.newaxis]
    if vol.ndim != 3:
        raise ValueError("encode_tiff_baseline expects (Z,Y,X) or (Y,X)")
    if vol.dtype not in (np.uint8, np.uint16):
        vol = np.clip(vol, 0, 65535).astype(np.uint16)
    bo = ">" if big_endian else "<"
    bits = 8 * vol.dtype.itemsize
    n, height, width = vol.shape
    rps = rows_per_strip or height

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", 0)  # first-IFD offset patched below
    ifd_patch_at = 4

    for z in range(n):
        plane = vol[z].astype(bo + ("u1" if bits == 8 else "u2"))
        strips = [
            plane[r : r + rps].tobytes() for r in range(0, height, rps)
        ]
        strip_offsets = []
        for s in strips:
            strip_offsets.append(len(out))
            out += s
        if len(out) % 2:  # IFDs must be word-aligned
            out += b"\x00"

        entries = [
            (TAG_WIDTH, 4, 1, [width]),
            (TAG_HEIGHT, 4, 1, [height]),
            (TAG_BITS, 3, 1, [bits]),
            (TAG_COMPRESSION, 3, 1, [1]),
            (TAG_PHOTOMETRIC, 3, 1, [1]),  # BlackIsZero
            (TAG_STRIP_OFFSETS, 4, len(strips), strip_offsets),
            (TAG_SAMPLES_PER_PIXEL, 3, 1, [1]),
            (TAG_ROWS_PER_STRIP, 4, 1, [rps]),
            (TAG_STRIP_BYTE_COUNTS, 4, len(strips), [len(s) for s in strips]),
        ]
        # out-of-line value arrays first
        value_offsets: dict[int, int] = {}
        for tag, typ, count, values in entries:
            if _TYPE_SIZES[typ] * count > 4:
                value_offsets[tag] = len(out)
                fmt = {3: "H", 4: "I"}[typ]
                out += struct.pack(bo + str(count) + fmt, *values)
        if len(out) % 2:
            out += b"\x00"

        ifd_off = len(out)
        struct.pack_into(bo + "I", out, ifd_patch_at, ifd_off)
        out += struct.pack(bo + "H", len(entries))
        for tag, typ, count, values in entries:
            out += struct.pack(bo + "HHI", tag, typ, count)
            if _TYPE_SIZES[typ] * count > 4:
                out += struct.pack(bo + "I", value_offsets[tag])
            else:
                fmt = {3: "H", 4: "I"}[typ]
                packed = struct.pack(bo + str(count) + fmt, *values)
                out += packed + b"\x00" * (4 - len(packed))
        ifd_patch_at = len(out)  # this IFD's next-pointer
        out += struct.pack(bo + "I", 0)

    return bytes(out)
