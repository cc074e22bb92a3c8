"""Minimal pure-Python TIFF codec: classic (non-Big) TIFF, grayscale,
8- or 16-bit, little- or big-endian, multi-page; uncompressed, PackBits
(TIFF 6.0 §9) or LZW (TIFF 6.0 §13) segments; striped or tiled
(TIFF 6.0 §15) layout; horizontal-differencing predictor (TIFF 6.0
§14). This is the no-dependency fallback that lets ``from_tiff_dir``
ingest REAL ``.tif`` bytes — including the LZW-compressed output that
microscopes/CellProfiler commonly emit (reference ingest.py:321-330
reads these via BioIO/tifffile) — when ``tifffile`` is absent; RGB,
planar configs, floats and exotic codecs (JPEG/deflate) still require
tifffile and raise ``NotImplementedError`` upstream.

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
TAG_DESCRIPTION = 270
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_PREDICTOR = 317
TAG_TILE_WIDTH = 322
TAG_TILE_LENGTH = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_BYTE_COUNTS = 325
TAG_SAMPLE_FORMAT = 339

COMPRESSION_NONE = 1
COMPRESSION_LZW = 5
COMPRESSION_PACKBITS = 32773

COMPRESSION_NAMES = {"none": COMPRESSION_NONE, "lzw": COMPRESSION_LZW,
                     "packbits": COMPRESSION_PACKBITS}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def packbits_decode(data: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 §9): n in [0,127] → copy n+1 literal
    bytes; n in [-127,-1] → repeat next byte 1-n times; -128 is a
    no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:  # literal run
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # replicate run of 257-h
            out += data[i : i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (literal runs only — valid, decodable by any
    reader; replicate-run detection is a size optimization we skip)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, 9→12-bit
    codes, ClearCode 256, EndOfInformation 257, and the "early change"
    convention (code width bumps when the table reaches 511/1023/2047,
    matching libtiff/tifffile)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    nbits = 9
    bitpos = 0
    nbytes = len(data)
    table: list[bytes] = []
    prev: bytes | None = None
    while True:
        byte = bitpos >> 3
        if byte >= nbytes:
            break  # missing EOI: tolerate, stream ended
        chunk = int.from_bytes(data[byte : byte + 3].ljust(3, b"\x00"), "big")
        code = (chunk >> (24 - (bitpos & 7) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = None
            continue
        if prev is None:  # first code after a clear is a literal
            if code >= 256:
                raise ValueError("corrupt LZW stream: no leading ClearCode")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW stream: code beyond table")
            table.append(prev + entry[:1])
            if len(table) == (1 << nbits) - 1 and nbits < 12:
                nbits += 1
        out += entry
        prev = entry
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder — the exact dual of :func:`lzw_decode`
    (early change: width bumps after table entry 511/1023/2047; table
    flush at 4094 entries like libtiff)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    nbits = 9

    def emit(code: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << nbits) | code
        bitcnt += nbits
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for i in range(len(data)):
        b = data[i : i + 1]
        wb = w + b
        if wb in table:
            w = wb
            continue
        emit(table[w])
        table[wb] = next_code
        next_code += 1
        if next_code > (1 << nbits) - 1 and nbits < 12:
            nbits += 1
        w = b
        if next_code >= 4094:  # table nearly full: flush
            emit(table[w])
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            nbits = 9
            w = b""
    if w:
        emit(table[w])
    emit(EOI)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _decode_segment(seg: bytes, comp: int) -> bytes:
    if comp == COMPRESSION_NONE:
        return seg
    if comp == COMPRESSION_PACKBITS:
        return packbits_decode(seg)
    return lzw_decode(seg)


def _encode_segment(seg: bytes, comp: int) -> bytes:
    if comp == COMPRESSION_NONE:
        return seg
    if comp == COMPRESSION_PACKBITS:
        return packbits_encode(seg)
    return lzw_encode(seg)


def _hdiff_encode(plane: "np.ndarray") -> "np.ndarray":
    """Horizontal differencing (Predictor=2, TIFF 6.0 §14): per row,
    keep col 0, store modular deltas. Dtype arithmetic wraps, matching
    the spec's modulo-2^bits behavior."""
    d = plane.copy()
    d[:, 1:] = plane[:, 1:] - plane[:, :-1]
    return d


def _hdiff_decode(plane: "np.ndarray") -> "np.ndarray":
    return np.cumsum(plane, axis=1, dtype=plane.dtype)


def is_tiff(data: bytes) -> bool:
    """Classic-TIFF magic: byte order mark + 42."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        return False
    bo = "<" if data[:2] == b"II" else ">"
    return struct.unpack(bo + "H", data[2:4])[0] == 42


def _read_ifd_entries(data: bytes, bo: str, off: int) -> tuple[dict[int, object], int]:
    """One IFD → ({tag: values-or-str}, next_ifd_offset). Integer tags
    come back as int lists; ASCII tags (e.g. ImageDescription, which
    carries the OME-XML in OME-TIFF) as stripped str."""
    (n_entries,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, object] = {}
    for i in range(n_entries):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", data, base)
        if typ not in (1, 2, 3, 4):
            continue
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            val_off = base + 8
        else:
            (val_off,) = struct.unpack_from(bo + "I", data, base + 8)
        if typ == 2:  # ASCII
            tags[tag] = data[val_off : val_off + count].split(b"\x00")[0].decode(
                "utf-8", "replace"
            )
            continue
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(bo + str(count) + fmt, data, val_off))
    (next_off,) = struct.unpack_from(bo + "I", data, off + 2 + 12 * n_entries)
    return tags, next_off


def decode_tiff_pages(data: bytes) -> tuple[np.ndarray, str | None]:
    """Decode every page of a grayscale TIFF → ``((N,Y,X) int32 pages,
    first-page ImageDescription)``. Supported: uncompressed + PackBits
    strips, 8/16-bit, unsigned or signed samples, either endianness.

    Raises ``ValueError`` on non-TIFF bytes and ``NotImplementedError``
    on TIFF features outside the baseline subset — the caller decides
    whether tifffile can take over."""
    if not is_tiff(data):
        raise ValueError("not a classic TIFF byte stream")
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    pages: list[np.ndarray] = []
    description: str | None = None
    while ifd_off:
        try:
            tags, ifd_off = _read_ifd_entries(data, bo, ifd_off)
        except (struct.error, IndexError) as exc:
            raise ValueError(f"malformed/truncated TIFF structure: {exc}") from exc
        has_strips = TAG_STRIP_OFFSETS in tags and TAG_STRIP_BYTE_COUNTS in tags
        has_tiles = (
            TAG_TILE_OFFSETS in tags
            and TAG_TILE_BYTE_COUNTS in tags
            and TAG_TILE_WIDTH in tags
            and TAG_TILE_LENGTH in tags
        )
        if TAG_WIDTH not in tags or TAG_HEIGHT not in tags or not (
            has_strips or has_tiles
        ):
            raise ValueError("malformed TIFF: IFD lacks required baseline tags")
        width = tags[TAG_WIDTH][0]
        height = tags[TAG_HEIGHT][0]
        bits = tags.get(TAG_BITS, [1])[0]
        comp = tags.get(TAG_COMPRESSION, [1])[0]
        spp = tags.get(TAG_SAMPLES_PER_PIXEL, [1])[0]
        fmt = tags.get(TAG_SAMPLE_FORMAT, [1])[0]
        predictor = tags.get(TAG_PREDICTOR, [1])[0]
        if description is None and isinstance(tags.get(TAG_DESCRIPTION), str):
            description = tags[TAG_DESCRIPTION]
        if comp not in (COMPRESSION_NONE, COMPRESSION_PACKBITS, COMPRESSION_LZW):
            raise NotImplementedError(
                f"TIFF compression {comp} is outside the baseline subset"
            )
        if spp != 1:
            raise NotImplementedError(
                f"{spp} samples/pixel (RGB/extra) is outside the baseline subset"
            )
        if bits not in (8, 16):
            raise NotImplementedError(f"{bits}-bit samples are outside the baseline subset")
        if fmt not in (1, 2):
            raise NotImplementedError(f"SampleFormat {fmt} (float/complex) unsupported")
        if predictor not in (1, 2):
            raise NotImplementedError(f"Predictor {predictor} (float) unsupported")
        kind = ("i" if fmt == 2 else "u") + ("1" if bits == 8 else "2")
        dtype = np.dtype(("<" if bo == "<" else ">") + kind)
        if has_tiles:
            tw = tags[TAG_TILE_WIDTH][0]
            th = tags[TAG_TILE_LENGTH][0]
            offsets = tags[TAG_TILE_OFFSETS]
            counts = tags[TAG_TILE_BYTE_COUNTS]
            if len(offsets) != len(counts):
                raise ValueError("malformed TIFF: TileOffsets/TileByteCounts mismatch")
            ntx = -(-width // tw)
            plane = np.zeros((height, width), dtype=dtype)
            for i, (o, c) in enumerate(zip(offsets, counts)):
                raw = _decode_segment(data[o : o + c], comp)
                tile = np.frombuffer(raw, dtype=dtype, count=tw * th).reshape(th, tw)
                if predictor == 2:
                    tile = _hdiff_decode(tile)
                ty, tx = divmod(i, ntx)
                rows = min(th, height - ty * th)
                cols = min(tw, width - tx * tw)
                plane[ty * th : ty * th + rows, tx * tw : tx * tw + cols] = tile[
                    :rows, :cols
                ]
        else:
            offsets = tags[TAG_STRIP_OFFSETS]
            counts = tags[TAG_STRIP_BYTE_COUNTS]
            if len(offsets) != len(counts):
                raise ValueError(
                    "malformed TIFF: StripOffsets/StripByteCounts mismatch"
                )
            raw = b"".join(
                _decode_segment(data[o : o + c], comp)
                for o, c in zip(offsets, counts)
            )
            plane = np.frombuffer(raw, dtype=dtype, count=width * height).reshape(
                height, width
            )
            if predictor == 2:
                plane = _hdiff_decode(plane)
        pages.append(plane.astype(np.int32))
    if not pages:
        raise ValueError("TIFF contains no IFDs")
    return np.stack(pages), description


def decode_tiff_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale TIFF → uint16 volume ``(1,1,N,Y,X)``
    (pages → z; use :func:`decode_tiff_pages` + the OME-XML dims for
    proper TCZYX mapping of OME-TIFF)."""
    pages, _ = decode_tiff_pages(data)
    vol = np.clip(pages, 0, 65535).astype(np.uint16)
    return vol[np.newaxis, np.newaxis, :, :, :]


def parse_ome_xml_dims(description: str | None) -> dict[str, object] | None:
    """Extract the plane-mapping metadata from an OME-TIFF
    ImageDescription: SizeT/C/Z, DimensionOrder, channel names,
    physical sizes. Namespace-agnostic (any OME schema year). Returns
    None when the description is not OME-XML."""
    if not description or "<OME" not in description:
        return None
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(description)
    except ET.ParseError:
        return None
    pixels = None
    for el in root.iter():
        if el.tag.rsplit("}", 1)[-1] == "Pixels":
            pixels = el
            break
    if pixels is None:
        return None
    a = pixels.attrib
    out: dict[str, object] = {
        "size_t": int(a.get("SizeT", 1)),
        "size_c": int(a.get("SizeC", 1)),
        "size_z": int(a.get("SizeZ", 1)),
        "dimension_order": a.get("DimensionOrder", "XYZCT"),
        "physical_size_x": float(a.get("PhysicalSizeX", 1.0)),
        "physical_size_y": float(a.get("PhysicalSizeY", 1.0)),
        "physical_size_z": float(a.get("PhysicalSizeZ", 1.0)),
    }
    names = []
    for el in pixels:
        if el.tag.rsplit("}", 1)[-1] == "Channel":
            names.append(el.attrib.get("Name"))
    out["channel_names"] = names if any(n is not None for n in names) else None
    return out


def pages_to_tczyx(pages: np.ndarray, dims: dict[str, object]) -> np.ndarray:
    """Arrange flat TIFF pages into (T,C,Z,Y,X) per the OME
    ``DimensionOrder`` (the first letter after XY varies FASTEST across
    pages, per the OME-TIFF spec)."""
    st, sc, sz = int(dims["size_t"]), int(dims["size_c"]), int(dims["size_z"])
    order = str(dims["dimension_order"]).upper()
    fast = [d for d in order if d in "TCZ"]  # e.g. XYCZT -> [C, Z, T]
    sizes = {"T": st, "C": sc, "Z": sz}
    n = st * sc * sz
    if pages.shape[0] != n:
        raise ValueError(
            f"OME dims T={st} C={sc} Z={sz} need {n} pages, TIFF has {pages.shape[0]}"
        )
    vol = np.empty((st, sc, sz) + pages.shape[1:], dtype=pages.dtype)
    for i in range(n):
        rem, coord = i, {}
        for d in fast:
            coord[d] = rem % sizes[d]
            rem //= sizes[d]
        vol[coord["T"], coord["C"], coord["Z"]] = pages[i]
    return vol


def build_ome_xml(
    *,
    image_id: str,
    name: str | None,
    size_t: int,
    size_c: int,
    size_z: int,
    size_y: int,
    size_x: int,
    channel_names: list[str] | None = None,
    physical_size_x: float = 1.0,
    physical_size_y: float = 1.0,
    physical_size_z: float = 1.0,
) -> str:
    """Minimal OME-XML ImageDescription for an OME-TIFF whose pages are
    written in XYCZT order (C fastest) — the same document the
    reference's exporter emits via ome-types (export.py:116-228)."""
    chans = "".join(
        f'<Channel ID="Channel:{i}" Name="{cn}" SamplesPerPixel="1"/>'
        for i, cn in enumerate(
            channel_names or [f"C{i}" for i in range(size_c)]
        )
    )
    nm = f' Name="{name}"' if name else ""
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        f'<Image ID="Image:0"{nm}>'
        f'<Pixels ID="Pixels:0" DimensionOrder="XYCZT" Type="uint16" '
        f'SizeT="{size_t}" SizeC="{size_c}" SizeZ="{size_z}" '
        f'SizeY="{size_y}" SizeX="{size_x}" '
        f'PhysicalSizeX="{physical_size_x}" PhysicalSizeY="{physical_size_y}" '
        f'PhysicalSizeZ="{physical_size_z}">'
        f"{chans}<TiffData/></Pixels></Image></OME>"
    )


def encode_tiff_baseline(
    vol: np.ndarray,
    *,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    description: str | None = None,
) -> bytes:
    """Encode a ``(Z,Y,X)`` (or ``(Y,X)``) uint8/uint16 array as a real
    multi-page baseline TIFF — one IFD per plane, uncompressed strips,
    optional ImageDescription on the first IFD (the OME-XML carrier).
    Genuine TIFF bytes that ANY reader opens."""
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
        if z == 0 and description is not None:
            desc_bytes = description.encode() + b"\x00"
            entries.insert(4, (TAG_DESCRIPTION, 2, len(desc_bytes), desc_bytes))
            entries.sort(key=lambda e: e[0])  # IFD entries must be tag-ascending
        # out-of-line value arrays first
        value_offsets: dict[int, int] = {}
        for tag, typ, count, values in entries:
            if _TYPE_SIZES[typ] * count > 4:
                value_offsets[tag] = len(out)
                if typ == 2:
                    out += values
                else:
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
                if typ == 2:
                    packed = bytes(values)
                else:
                    fmt = {3: "H", 4: "I"}[typ]
                    packed = struct.pack(bo + str(count) + fmt, *values)
                out += packed + b"\x00" * (4 - len(packed))
        ifd_patch_at = len(out)  # this IFD's next-pointer
        out += struct.pack(bo + "I", 0)

    return bytes(out)
