"""Minimal pure-Python JPEG codec (ITU T.81, DCT, Huffman) — the last
TIFF compression class (Compression=7, "new-style" JPEG-in-TIFF) the
built-in path previously gated on tifffile (reference
ingest.py:321-330 reads it via BioIO/tifffile), plus the progressive
streams that dominate web-scraped image corpora.

Decoder: sequential 8- AND 12-bit streams (SOF0/SOF1) — grayscale or
3-component YCbCr with any sampling factors (4:4:4, 4:2:2, 4:2:0
upsampled by replication), restart intervals, 16-bit quant tables,
Photometric=2 raw-RGB component layouts, abbreviated streams whose
DQT/DHT arrive separately (the TIFF ``JPEGTables`` tag 347 carries
exactly such a tables-only stream) — AND full progressive streams
(SOF2, T.81 Annex G): interleaved or per-component DC scans, spectral
selection, successive approximation for DC and AC (EOB runs,
refinement correction bits), restart intervals per scan. 12-bit
output is uint16 with a 2048 level shift per T.81.
Arithmetic-coded/lossless streams raise ``NotImplementedError``.

Encoder: sequential, grayscale or 4:4:4 RGB→YCbCr (or raw RGB),
Annex-K quantization scaled by ``quality`` (libjpeg's 5000/q · 200−2q
rule), Annex-K Huffman tables emitted as explicit DQT/DHT segments —
so the decoder reads back exactly what was declared, and any external
JPEG reader opens the stream. ``precision=12`` writes extended
sequential streams with a 16-category DC table; AC sizes beyond the
Annex-K range (sharp data at very high quality) raise ``ValueError``
rather than emitting an undecodable symbol. ``progressive=True``
writes the SOF2 web progression (DC Al=1 + refinement; AC bands
1-5/6-63 at Al=2 with two SA refinement passes) — both paths carry
the SAME quantized coefficients losslessly, so progressive and
baseline encodes of one image decode bit-identically.

IDCT/FDCT are exact orthonormal 8×8 matrix products in float64
(vectorized over all blocks with numpy); the only loss is
quantization + integer rounding, so a quality-100 8-bit round-trip is
within ±2 levels quickly verified by the tests.

Throughput is Python-loop bound in the Huffman layer (~1-3 MB/s/core),
like the LZW fallback: fine for per-file task parallelism, and
tifffile takes over wholesale when installed.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[k] = natural index of the k-th scanned coef
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K base quantization tables (luma, chroma), natural order
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
_QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32
)

# Annex K Huffman specs: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
# 12-bit DC table: T.81 allows categories 0-15 for extended precision;
# Annex K only covers 0-11, so this is a valid canonical extension
# (declared in the DHT segment like every other table we emit)
_DC_12BIT = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0],
             list(range(16)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n.reshape(8, 1)
    a = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    a[0] /= np.sqrt(2)
    return a


_A = _dct_matrix()


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """Forward DCT-II over (n, 8, 8) level-shifted blocks."""
    return np.einsum("ij,njk,lk->nil", _A, blocks, _A)


def _idct(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _A, blocks, _A)


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 5000/q below 50, 200-2q above."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class JpegTables:
    """Mutable decode state: quant/huffman tables + restart interval —
    shareable across abbreviated streams (TIFF JPEGTables tag)."""

    def __init__(self) -> None:
        self.quant: dict[int, np.ndarray] = {}
        self.huff: dict[tuple[int, int], "_HuffTable"] = {}
        self.restart_interval = 0
        # arithmetic conditioning (T.81 B.2.4.3 DAC): DC table → (L, U)
        # bounds, AC table → Kx; defaults L=0, U=1, Kx=5 (§F.1.4.4.1.2,
        # F.1.4.4.2) apply when no DAC segment names the table
        self.arith_dc: dict[int, tuple[int, int]] = {}
        self.arith_ac: dict[int, int] = {}


class _HuffTable:
    """Canonical Huffman decode arrays (ITU T.81 F.2.2.3): mincode/
    maxcode/valptr per length let one 16-bit peek resolve any symbol
    without per-bit reads."""

    __slots__ = ("maxcode", "mincode", "valptr", "values")

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.values = list(values)
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        code = 0
        vi = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = vi
                self.mincode[length] = code
                vi += n
                code += n
                self.maxcode[length] = code - 1
            code <<= 1


def _build_decode_table(bits: list[int], values: list[int]) -> _HuffTable:
    return _HuffTable(bits, values)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.cnt <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.buf = (self.buf << 8) | 0  # pad past end
                self.cnt += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # RST markers are consumed by restart(), not here
                    self.marker = nxt
                    self.buf = (self.buf << 8) | 0
                    self.cnt += 8
                    continue
                else:
                    self.marker = nxt
                    self.buf = (self.buf << 8) | 0
                    self.cnt += 8
                    continue
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.cnt += 8

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.cnt < n:
            self._fill()
        self.cnt -= n
        v = (self.buf >> self.cnt) & ((1 << n) - 1)
        self.buf &= (1 << self.cnt) - 1
        return v

    def decode_huffman(self, table: "_HuffTable") -> int:
        if self.cnt < 16:
            self._fill()
        peek = (self.buf >> (self.cnt - 16)) & 0xFFFF
        code = 0
        maxcode = table.maxcode
        for length in range(1, 17):
            code = (code << 1) | ((peek >> (16 - length)) & 1)
            if code <= maxcode[length]:
                self.cnt -= length
                self.buf &= (1 << self.cnt) - 1
                return table.values[
                    table.valptr[length] + code - table.mincode[length]
                ]
        raise ValueError("corrupt JPEG: no Huffman code matched in 16 bits")

    def next_marker_pos(self) -> int:
        """Byte position of the next marker after the entropy data —
        needed between progressive scans. Mirrors restart()'s
        drain-at-boundary handling: the buffer may empty without
        _fill ever latching the marker."""
        if self.marker is not None:
            return self.pos
        p, n = self.pos, len(self.data)
        while p + 1 < n:
            if self.data[p] == 0xFF and self.data[p + 1] != 0x00:
                return p
            p += 1
        return n

    def restart(self) -> None:
        """Byte-align and consume the pending RST marker."""
        self.buf = 0
        self.cnt = 0
        if self.marker is None:
            # The bit buffer can drain exactly at the segment boundary,
            # in which case _fill never reached the marker: self.pos
            # still sits on (or just before) the FF Dx. Entropy data
            # only ever contains FF as the stuffed pair FF 00, so the
            # next FF followed by a non-zero byte IS the marker.
            p, n = self.pos, len(self.data)
            while p + 1 < n:
                if self.data[p] == 0xFF and self.data[p + 1] != 0x00:
                    self.marker = self.data[p + 1]
                    self.pos = p
                    break
                p += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # skip FF Dx
            self.marker = None


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def parse_tables(data: bytes, state: JpegTables | None = None) -> JpegTables:
    """Parse a tables-only (abbreviated) JPEG stream — DQT/DHT/DRI
    between SOI and EOI — into decode state. This is exactly what the
    TIFF ``JPEGTables`` tag holds."""
    state = state or JpegTables()
    _decode_stream(data, state, tables_only=True)
    return state


def jpeg_decode(
    data: bytes,
    state: JpegTables | None = None,
    color_transform: bool = True,
) -> np.ndarray:
    """Decode one baseline JPEG stream → uint8 (H, W) or (H, W, 3).
    ``state`` supplies externally-parsed tables for abbreviated
    streams. 3-component output is YCbCr→RGB converted unless
    ``color_transform=False`` (JPEG-in-TIFF with Photometric=2 stores
    RGB components directly, TIFF 6.0 §22 / TTN2)."""
    out = _decode_stream(
        data, state or JpegTables(), tables_only=False,
        color_transform=color_transform,
    )
    if out is None:
        raise ValueError("JPEG stream contains no scan")
    return out


def _decode_stream(
    data: bytes, state: JpegTables, tables_only: bool,
    color_transform: bool = True,
) -> np.ndarray | None:
    if len(data) < 2 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    frame = None
    progressive = False
    lossless = False
    arith = False
    grids: dict[int, np.ndarray] | None = None
    while pos + 4 <= len(data) + 2:
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and grids is not None:
                return _prog_finish(state, frame, grids, color_transform)
            return None
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        try:
            (seglen,) = struct.unpack_from(">H", data, pos)
        except struct.error:
            raise ValueError("truncated JPEG segment") from None
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    q = np.frombuffer(seg, dtype=">u2", count=64, offset=p)
                    p += 128
                else:
                    q = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p)
                    p += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = q.astype(np.int32)
                state.quant[tq] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                if len(bits) < 16 or p + 17 + n > len(seg):
                    raise ValueError("truncated JPEG DHT segment")
                values = list(seg[p + 17 : p + 17 + n])
                state.huff[(tc, th)] = _build_decode_table(bits, values)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            try:
                (state.restart_interval,) = struct.unpack_from(">H", seg, 0)
            except struct.error:
                raise ValueError("truncated JPEG segment") from None
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 15
                cs = seg[p + 1]
                if tc == 0:
                    lo, up = cs & 15, cs >> 4
                    if lo > up:
                        raise ValueError("corrupt JPEG: DAC with L > U")
                    state.arith_dc[tb] = (lo, up)
                else:
                    if not (1 <= cs <= 63):
                        raise ValueError("corrupt JPEG: DAC Kx out of range")
                    state.arith_ac[tb] = cs
                p += 2
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0/1 sequential, SOF2 progressive, SOF3 lossless
            # (Huffman); SOF9 sequential, SOF10 progressive (arithmetic)
            try:
                prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
                comps = []
                for i in range(nc):
                    cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                    if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 15) <= 4):
                        raise ValueError(
                            "corrupt JPEG: sampling factor out of range"
                        )
                    comps.append((cid, hv >> 4, hv & 15, tq))
            except struct.error:
                raise ValueError("truncated JPEG segment") from None
            lossless = marker == 0xC3
            if lossless:
                if not (2 <= prec <= 16):
                    raise ValueError(f"corrupt JPEG: precision {prec}")
            elif prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            frame = (h, w, comps, prec)
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
        elif marker == 0xCB:
            raise NotImplementedError(
                "lossless arithmetic JPEG (SOF11) unsupported — no "
                "mainstream encoder emits it; lossless Huffman (SOF3) "
                "is the supported bit-exact path"
            )
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "hierarchical/differential JPEG unsupported"
            )
        elif marker == 0xDA:  # SOS
            if tables_only:
                raise ValueError("JPEGTables stream must not contain a scan")
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            if not seg:
                raise ValueError("truncated JPEG SOS segment")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("truncated JPEG SOS segment")
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 15))
            if lossless:
                return _decode_lossless_scan(
                    data, pos + seglen, state, frame, scan, seg[1 + 2 * ns]
                )
            if not progressive:
                if arith:
                    return _decode_scan_arith(
                        data, pos + seglen, state, frame, scan,
                        color_transform,
                    )
                return _decode_scan(
                    data, pos + seglen, state, frame, scan, color_transform
                )
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ah = seg[3 + 2 * ns] >> 4
            al = seg[3 + 2 * ns] & 15
            if grids is None:
                h, w, comps, _prec = frame
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mx = -(-w // (8 * hmax))
                my = -(-h // (8 * vmax))
                grids = {
                    cid: np.zeros((my * cv, mx * ch, 64), dtype=np.int32)
                    for cid, ch, cv, _tq in comps
                }
            if arith:
                pos = _decode_prog_scan_arith(
                    data, pos + seglen, state, frame, scan, ss, se, ah,
                    al, grids,
                )
            else:
                pos = _decode_prog_scan(
                    data, pos + seglen, state, frame, scan, ss, se, ah,
                    al, grids,
                )
            continue
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("corrupt JPEG: no EOI")


def _decode_scan(data, pos, state, frame, scan, color_transform=True) -> np.ndarray:
    h, w, comps, prec = frame
    level = float(1 << (prec - 1))
    maxval = (1 << prec) - 1
    out_dtype = np.uint8 if prec == 8 else np.uint16
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    ri = state.restart_interval
    mcu_count = 0
    # entropy-decode every block's zigzag coefficients first; the
    # dequant+IDCT then runs ONCE per component, vectorized over all
    # blocks, instead of one einsum per 8×8 block
    coef_lists: dict[int, list[list[int]]] = {cid: [] for cid, *_ in comps}
    origins: dict[int, list[tuple[int, int]]] = {cid: [] for cid, *_ in comps}
    decode_huffman = reader.decode_huffman
    receive = reader.receive
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu_count and mcu_count % ri == 0:
                reader.restart()
                pred = {cid: 0 for cid in pred}
            for cid, td, ta in scan:
                if cid not in by_id:
                    raise ValueError(
                        "corrupt JPEG: scan references unknown component"
                    )
                ch, cv, tq = by_id[cid]
                dc_tbl = state.huff.get((0, td))
                ac_tbl = state.huff.get((1, ta))
                if dc_tbl is None or ac_tbl is None or tq not in state.quant:
                    raise ValueError("corrupt JPEG: missing table for scan")
                for by in range(cv):
                    for bx in range(ch):
                        coefs = [0] * 64
                        t = decode_huffman(dc_tbl)
                        pred[cid] += _extend(receive(t), t)
                        coefs[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = decode_huffman(ac_tbl)
                            if rs == 0:
                                break  # EOB
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC index overflow")
                            s = rs & 15
                            coefs[k] = _extend(receive(s), s)
                            k += 1
                        coef_lists[cid].append(coefs)
                        origins[cid].append(
                            ((my * cv + by) * 8, (mx * ch + bx) * 8)
                        )
            mcu_count += 1
    return _idct_assemble(state, frame, coef_lists, origins, color_transform)


def _comp_block_grid(frame, cid):
    """Non-interleaved block-grid dims (ceil of the COMPONENT's own
    downsampled size / 8 — NOT the MCU-padded grid, T.81 A.2.2)."""
    h, w, comps, _prec = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for c, ch, cv, _tq in comps:
        if c == cid:
            cw = -(-w * ch // hmax)
            chh = -(-h * cv // vmax)
            return -(-chh // 8), -(-cw // 8)
    raise ValueError("corrupt JPEG: scan references unknown component")


def _decode_prog_scan(
    data, pos, state, frame, scan, ss, se, ah, al, grids
) -> int:
    """One progressive scan (T.81 Annex G decode) into the coefficient
    grids; returns the byte position of the next marker."""
    h, w, comps, _prec = frame
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    reader = _BitReader(data, pos)
    decode_huffman = reader.decode_huffman
    receive = reader.receive
    ri = state.restart_interval
    for cid, _td, _ta in scan:
        if cid not in by_id:
            raise ValueError("corrupt JPEG: scan references unknown component")

    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("corrupt JPEG: DC scan with Se != 0")
        tables = {}
        if ah == 0:
            for cid, td, _ta in scan:
                tbl = state.huff.get((0, td))
                if tbl is None:
                    raise ValueError("corrupt JPEG: missing table for scan")
                tables[cid] = tbl
        pred = {cid: 0 for cid, *_ in scan}

        def dc_block(cid, by, bx):
            g = grids[cid]
            if ah == 0:
                t = decode_huffman(tables[cid])
                pred[cid] += _extend(receive(t), t)
                g[by, bx, 0] = pred[cid] << al
            else:  # refinement: one bit per block
                if receive(1):
                    g[by, bx, 0] |= 1 << al

        unit = 0
        if len(scan) > 1:  # interleaved MCU order
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if ri and unit and unit % ri == 0:
                        reader.restart()
                        pred = {cid: 0 for cid in pred}
                    for cid, _td, _ta in scan:
                        ch, cv, _tq = by_id[cid]
                        for by in range(cv):
                            for bx in range(ch):
                                dc_block(cid, my * cv + by, mx * ch + bx)
                    unit += 1
        else:  # single component: its own block raster
            cid = scan[0][0]
            bh, bw = _comp_block_grid(frame, cid)
            for by in range(bh):
                for bx in range(bw):
                    if ri and unit and unit % ri == 0:
                        reader.restart()
                        pred = {cid: 0 for cid in pred}
                    dc_block(cid, by, bx)
                    unit += 1
        return reader.next_marker_pos()

    # AC scan: always non-interleaved (T.81 G.1.1.1.1)
    if len(scan) != 1:
        raise ValueError("corrupt JPEG: interleaved progressive AC scan")
    if not (1 <= ss <= se <= 63):
        raise ValueError("corrupt JPEG: bad spectral band")
    cid, _td, ta = scan[0]
    ac_tbl = state.huff.get((1, ta))
    if ac_tbl is None:
        raise ValueError("corrupt JPEG: missing table for scan")
    g = grids[cid]
    bh, bw = _comp_block_grid(frame, cid)
    p1 = 1 << al
    m1 = -(1 << al)
    eobrun = 0
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and unit and unit % ri == 0:
                reader.restart()
                eobrun = 0
            unit += 1
            b = g[by, bx]
            if ah == 0:  # first scan of this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = decode_huffman(ac_tbl)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("corrupt JPEG: AC index overflow")
                    b[k] = _extend(receive(s), s) << al
                    k += 1
                continue
            # refinement scan (G.2.2): correction bits + new coefficients
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = decode_huffman(ac_tbl)
                    r, s = rs >> 4, rs & 15
                    s_val = 0
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r)
                            if r:
                                eobrun += receive(r)
                            break
                        # r == 15: ZRL over 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "corrupt JPEG: refinement magnitude != 1"
                            )
                        s_val = p1 if receive(1) else m1
                    while k <= se:
                        ck = int(b[k])
                        if ck != 0:
                            if receive(1) and (ck & p1) == 0:
                                b[k] = ck + (p1 if ck >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s_val and k <= se:
                        b[k] = s_val
                    k += 1
            if eobrun > 0:  # EOB region: corrections only for the rest
                while k <= se:
                    ck = int(b[k])
                    if ck != 0:
                        if receive(1) and (ck & p1) == 0:
                            b[k] = ck + (p1 if ck >= 0 else m1)
                    k += 1
                eobrun -= 1
    return reader.next_marker_pos()


def _decode_scan_arith(data, pos, state, frame, scan, color_transform=True):
    """Sequential arithmetic scan (SOF9, T.81 F.2.4): same MCU walk as
    the Huffman twin, entropy layer swapped for the QM-coder models.
    Statistics, conditioning contexts, and the coder itself reset at
    every restart marker (§F.2.1.3.1)."""
    from ome_arrow_spark.sources import jpeg_arith as ja

    h, w, comps, prec = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    for cid, _td, _ta in scan:
        if cid not in by_id:
            raise ValueError("corrupt JPEG: scan references unknown component")
        if by_id[cid][2] not in state.quant:
            raise ValueError("corrupt JPEG: missing table for scan")
    ri = state.restart_interval
    coef_lists: dict[int, list[list[int]]] = {cid: [] for cid, *_ in comps}
    origins: dict[int, list[tuple[int, int]]] = {cid: [] for cid, *_ in comps}

    dc_stats: dict[int, list[int]] = {}
    ac_stats: dict[int, list[int]] = {}

    def reset_stats():
        dc_stats.clear()
        ac_stats.clear()
        for _cid, td, ta in scan:
            dc_stats.setdefault(td, ja._new_dc_stats())
            ac_stats.setdefault(ta, ja._new_ac_stats())

    dec = ja.ArithDecoder(data, pos)
    reset_stats()
    dc_ctx = {cid: 0 for cid, *_ in scan}
    pred = {cid: 0 for cid, *_ in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu_count and mcu_count % ri == 0:
                mp = dec.next_marker_pos()
                if not (
                    mp + 1 < len(data)
                    and data[mp] == 0xFF
                    and 0xD0 <= data[mp + 1] <= 0xD7
                ):
                    raise ValueError("corrupt JPEG: missing restart marker")
                dec = ja.ArithDecoder(data, mp + 2)
                reset_stats()
                dc_ctx = {cid: 0 for cid in dc_ctx}
                pred = {cid: 0 for cid in pred}
            for cid, td, ta in scan:
                ch, cv, _tq = by_id[cid]
                dc_l, dc_u = state.arith_dc.get(td, (0, 1))
                kx = state.arith_ac.get(ta, 5)
                dstats = dc_stats[td]
                astats = ac_stats[ta]
                for by in range(cv):
                    for bx in range(ch):
                        coefs = [0] * 64
                        pred[cid] += ja.decode_dc_diff(
                            dec, dstats, dc_ctx, cid, dc_l, dc_u
                        )
                        coefs[0] = pred[cid]
                        ja.decode_ac_coefs(dec, astats, coefs, 1, 63, kx)
                        coef_lists[cid].append(coefs)
                        origins[cid].append(
                            ((my * cv + by) * 8, (mx * ch + bx) * 8)
                        )
            mcu_count += 1
    return _idct_assemble(state, frame, coef_lists, origins, color_transform)


def _decode_prog_scan_arith(
    data, pos, state, frame, scan, ss, se, ah, al, grids
) -> int:
    """One progressive arithmetic scan (SOF10, T.81 G.2 decode models)
    into the shared coefficient grids; returns the next marker
    position. Statistics reset per scan and per restart interval."""
    from ome_arrow_spark.sources import jpeg_arith as ja

    h, w, comps, _prec = frame
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    ri = state.restart_interval
    for cid, _td, _ta in scan:
        if cid not in by_id:
            raise ValueError("corrupt JPEG: scan references unknown component")

    dc_stats: dict[int, list[int]] = {}
    ac_stats: dict[int, list[int]] = {}

    def reset_stats():
        dc_stats.clear()
        ac_stats.clear()
        for _cid, td, ta in scan:
            dc_stats.setdefault(td, ja._new_dc_stats())
            ac_stats.setdefault(ta, ja._new_ac_stats())

    state_box = {"dec": ja.ArithDecoder(data, pos)}
    reset_stats()
    dc_ctx = {cid: 0 for cid, *_ in scan}
    pred = {cid: 0 for cid, *_ in scan}

    def restart():
        dec = state_box["dec"]
        mp = dec.next_marker_pos()
        if not (
            mp + 1 < len(data)
            and data[mp] == 0xFF
            and 0xD0 <= data[mp + 1] <= 0xD7
        ):
            raise ValueError("corrupt JPEG: missing restart marker")
        state_box["dec"] = ja.ArithDecoder(data, mp + 2)
        reset_stats()
        for cid in dc_ctx:
            dc_ctx[cid] = 0
            pred[cid] = 0

    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("corrupt JPEG: DC scan with Se != 0")

        def dc_block(cid, td, by, bx):
            g = grids[cid]
            dec = state_box["dec"]
            if ah == 0:
                dc_l, dc_u = state.arith_dc.get(td, (0, 1))
                pred[cid] += ja.decode_dc_diff(
                    dec, dc_stats[td], dc_ctx, cid, dc_l, dc_u
                )
                g[by, bx, 0] = pred[cid] << al
            else:  # refinement: one fixed-estimate decision per block
                if dec.decode_fixed():
                    g[by, bx, 0] |= 1 << al

        unit = 0
        if len(scan) > 1:  # interleaved MCU order
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if ri and unit and unit % ri == 0:
                        restart()
                    for cid, td, _ta in scan:
                        ch, cv, _tq = by_id[cid]
                        for by in range(cv):
                            for bx in range(ch):
                                dc_block(cid, td, my * cv + by, mx * ch + bx)
                    unit += 1
        else:
            cid, td, _ta = scan[0]
            bh, bw = _comp_block_grid(frame, cid)
            for by in range(bh):
                for bx in range(bw):
                    if ri and unit and unit % ri == 0:
                        restart()
                    dc_block(cid, td, by, bx)
                    unit += 1
        return state_box["dec"].next_marker_pos()

    # AC scan: always non-interleaved (T.81 G.1.1.1.1)
    if len(scan) != 1:
        raise ValueError("corrupt JPEG: interleaved progressive AC scan")
    if not (1 <= ss <= se <= 63):
        raise ValueError("corrupt JPEG: bad spectral band")
    cid, _td, ta = scan[0]
    kx = state.arith_ac.get(ta, 5)
    g = grids[cid]
    bh, bw = _comp_block_grid(frame, cid)
    p1 = 1 << al
    m1 = -(1 << al)
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and unit and unit % ri == 0:
                restart()
            unit += 1
            dec = state_box["dec"]
            astats = ac_stats[ta]
            b = g[by, bx]
            if ah == 0:  # first scan of this band (G.2.3 = F.2.4.2 + Al)
                ja.decode_ac_coefs(dec, astats, b, ss, se, kx, al)
                continue
            # refinement scan (T.81 G.2.4 / Figure G.18)
            kex = se
            while kex > 0 and b[kex] == 0:
                kex -= 1
            k = ss
            while k <= se:
                st = 3 * (k - 1)
                if k > kex and dec.decode(astats, st):
                    break  # EOB
                while True:
                    ck = int(b[k])
                    if ck != 0:  # previously-nonzero: correction bit
                        if dec.decode(astats, st + 2):
                            b[k] = ck + (m1 if ck < 0 else p1)
                        break
                    if dec.decode(astats, st + 1):  # newly nonzero
                        b[k] = m1 if dec.decode_fixed() else p1
                        break
                    st += 3
                    k += 1
                    if k > se:
                        raise ValueError(
                            "corrupt JPEG: arithmetic AC index overflow"
                        )
                k += 1
    return state_box["dec"].next_marker_pos()


def _prog_finish(state, frame, grids, color_transform):
    """EOI of a progressive stream: grids → the shared dequant/IDCT
    assembly."""
    coef_lists = {}
    origins = {}
    for cid, g in grids.items():
        bh, bw = g.shape[:2]
        coef_lists[cid] = [
            [int(v) for v in g[by, bx]]
            for by in range(bh)
            for bx in range(bw)
        ]
        origins[cid] = [
            (by * 8, bx * 8) for by in range(bh) for bx in range(bw)
        ]
    return _idct_assemble(state, frame, coef_lists, origins, color_transform)


def _idct_assemble(state, frame, coef_lists, origins, color_transform):
    """Shared tail of baseline and progressive decode: vectorized
    dequant + IDCT + plane placement + crop/upsample + color."""
    h, w, comps, prec = frame
    level = float(1 << (prec - 1))
    maxval = (1 << prec) - 1
    out_dtype = np.uint8 if prec == 8 else np.uint16
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros(
            (mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64
        )
    by_id2 = {cid: tq for cid, _ch, _cv, tq in comps}
    for _cid, tq in by_id2.items():
        if tq not in state.quant:
            raise ValueError("corrupt JPEG: missing quantization table")
    for cid, blocks in coef_lists.items():
        if not blocks:
            continue
        zz = np.asarray(blocks, dtype=np.int32)
        nat = np.zeros((zz.shape[0], 64), dtype=np.int32)
        nat[:, ZIGZAG] = zz
        quant = state.quant[by_id2[cid]]
        spatial = _idct((nat * quant).reshape(-1, 8, 8).astype(np.float64))
        plane = planes[cid]
        for (y0, x0), block in zip(origins[cid], spatial):
            plane[y0 : y0 + 8, x0 : x0 + 8] = block
        plane += level
    # crop + upsample each component to full (h, w)
    full = []
    for cid, ch, cv, _tq in comps:
        # component's natural (pre-upsample) size
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        p = planes[cid][:chh, :cw]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, maxval).astype(out_dtype)
    if len(full) == 3:
        if not color_transform:  # components are already RGB
            raw = np.stack(full, axis=-1)
            return np.clip(np.rint(raw), 0, maxval).astype(out_dtype)
        y, cb, cr = full
        r = y + 1.402 * (cr - level)
        g = y - 0.344136 * (cb - level) - 0.714136 * (cr - level)
        b = y + 1.772 * (cb - level)
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.rint(rgb), 0, maxval).astype(out_dtype)
    raise NotImplementedError(f"{len(full)}-component JPEG unsupported")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length)."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[vi]] = (code, length)
            vi += 1
            code += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.cnt += length
        while self.cnt >= 8:
            self.cnt -= 8
            b = (self.buf >> self.cnt) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.buf &= (1 << self.cnt) - 1

    def flush(self) -> None:
        if self.cnt:
            pad = 8 - self.cnt
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


# Progressive AC scans emit EOBn symbols (r<<4 for r=1..14) that the
# Annex-K baseline tables lack; this generic table covers the whole
# 256-symbol space at length 9 (Kraft 0.5 — incomplete, so the all-1s
# codeword stays reserved per C.2). Inefficient but universally valid.
_AC_PROG = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


def _toward_zero(v: int, al: int) -> int:
    return v >> al if v >= 0 else -((-v) >> al)


def _emit_ac_first(writer, enc_ac, blocks, ss, se, al) -> None:
    """Progressive AC first scan (T.81 G.1.2.2): band values with EOB
    runs and ZRL."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = enc_ac[r << 4]
            writer.write(code, ln)
            if r:
                writer.write(eobrun - (1 << r), r)
            eobrun = 0

    for zz in blocks:
        vals = [_toward_zero(int(zz[k]), al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        last = nz[-1]
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[0xF0]
                writer.write(code, ln)
                run -= 16
            t, bits = _magnitude(v)
            code, ln = enc_ac[(run << 4) | t]
            writer.write(code, ln)
            writer.write(bits, t)
            run = 0
        if last < len(vals) - 1:
            eobrun += 1  # trailing zeros fold into the EOB run
    flush_eob()


def _emit_ac_refine(writer, enc_ac, blocks, ss, se, al) -> None:
    """Progressive AC refinement scan (T.81 G.1.2.3): newly-significant
    coefficients plus buffered correction bits — the libjpeg
    encode_mcu_AC_refine structure."""
    eobrun = 0
    pending: list[int] = []  # correction bits owed by the EOB run

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = enc_ac[r << 4]
            writer.write(code, ln)
            if r:
                writer.write(eobrun - (1 << r), r)
            for bit in pending:
                writer.write(bit, 1)
            eobrun = 0
            pending = []

    for zz in blocks:
        ab = [
            (abs(int(zz[k])) >> al, int(zz[k])) for k in range(ss, se + 1)
        ]
        eob_idx = -1
        for i, (t, _v) in enumerate(ab):
            if t == 1:
                eob_idx = i
        run = 0
        br: list[int] = []
        for i, (t, v) in enumerate(ab):
            if t == 0:
                run += 1
                continue
            while run > 15 and i <= eob_idx:
                flush_eob()
                code, ln = enc_ac[0xF0]
                writer.write(code, ln)
                run -= 16
                for bit in br:
                    writer.write(bit, 1)
                br = []
            if t > 1:  # history coefficient: buffer its correction bit
                br.append(t & 1)
                continue
            flush_eob()
            code, ln = enc_ac[(run << 4) | 1]
            writer.write(code, ln)
            writer.write(1 if v > 0 else 0, 1)
            for bit in br:
                writer.write(bit, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


# Lossless JPEG (SOF3) difference categories span 0..16; a flat
# 17-symbol table (length 5, Kraft 17/32) is universally valid.
_DC_LOSSLESS = ([0, 0, 0, 0, 17] + [0] * 11, list(range(17)))

_LOSSLESS_PREDICT = {
    1: lambda a, b, c: a,
    2: lambda a, b, c: b,
    3: lambda a, b, c: c,
    4: lambda a, b, c: a + b - c,
    5: lambda a, b, c: a + ((b - c) >> 1),
    6: lambda a, b, c: b + ((a - c) >> 1),
    7: lambda a, b, c: (a + b) >> 1,
}


def jpeg_encode_lossless(
    img: np.ndarray, predictor: int = 1, precision: int | None = None
) -> bytes:
    """Lossless JPEG (ITU T.81 Annex H, SOF3) — predictive Huffman
    coding, NO DCT, bit-exact round-trip.  The compression class old
    DICOM/medical TIFFs carry, and an exact-fidelity carrier for the
    OME uint16 pixel model.  ``img``: uint8 or uint16, (H, W) gray or
    (H, W, 3); ``predictor`` ∈ 1..7 (T.81 H.1.2.1)."""
    img = np.asarray(img)
    if predictor not in _LOSSLESS_PREDICT:
        raise ValueError(f"predictor must be 1..7, got {predictor}")
    if img.dtype.kind == "u" and img.dtype.itemsize == 1:
        prec = precision or 8
    elif img.dtype.kind == "u" and img.dtype.itemsize == 2:
        prec = precision or 16  # either byte order
    else:
        raise ValueError("jpeg_encode_lossless expects uint8/uint16")
    if not (2 <= prec <= 16) or img.max(initial=0) >= (1 << prec):
        raise ValueError(f"samples exceed {prec}-bit precision")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expects (H, W) or (H, W, 3)")
    h, w = img.shape[:2]
    ncomp = 1 if gray else 3
    planes = [
        (img if gray else img[..., c]).astype(np.int64) for c in range(ncomp)
    ]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    sof = struct.pack(">BHHB", prec, h, w, ncomp)
    for i in range(ncomp):
        sof += struct.pack(">BBB", i + 1, 0x11, 0)
    seg(0xC3, sof)
    bits_, vals_ = _DC_LOSSLESS
    seg(0xC4, bytes([0x00] + bits_) + bytes(vals_))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=predictor, Se=0, Ah/Al=0
    seg(0xDA, sos)

    enc = _build_encode_table(*_DC_LOSSLESS)
    writer = _BitWriter()
    pred_fn = _LOSSLESS_PREDICT[predictor]
    default = 1 << (prec - 1)
    for y in range(h):
        for x in range(w):
            for p in planes:
                if y == 0 and x == 0:
                    pv = default
                elif y == 0:
                    pv = int(p[0, x - 1])
                elif x == 0:
                    pv = int(p[y - 1, 0])
                else:
                    pv = pred_fn(
                        int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]),
                    )
                diff = (int(p[y, x]) - pv) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                if diff == -32768:
                    code, ln = enc[16]
                    writer.write(code, ln)  # category 16: no extra bits
                else:
                    t, bits = _magnitude(diff)
                    code, ln = enc[t]
                    writer.write(code, ln)
                    if t:
                        writer.write(bits, t)
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _decode_lossless_scan(data, pos, state, frame, scan, predictor):
    """SOF3 scan decode (T.81 Annex H): per-sample predictive
    differences, modulo-2^16 reconstruction."""
    h, w, comps, prec = frame
    if state.restart_interval:
        raise NotImplementedError(
            "restart intervals in lossless JPEG unsupported"
        )
    if any(ch != 1 or cv != 1 for _cid, ch, cv, _tq in comps):
        raise NotImplementedError("subsampled lossless JPEG unsupported")
    if predictor not in _LOSSLESS_PREDICT:
        raise ValueError(f"corrupt JPEG: lossless predictor {predictor}")
    tables = {}
    for cid, td, _ta in scan:
        tbl = state.huff.get((0, td))
        if tbl is None:
            raise ValueError("corrupt JPEG: missing table for scan")
        tables[cid] = tbl
    reader = _BitReader(data, pos)
    decode_huffman = reader.decode_huffman
    receive = reader.receive
    pred_fn = _LOSSLESS_PREDICT[predictor]
    default = 1 << (prec - 1)
    planes = {cid: np.zeros((h, w), dtype=np.int64) for cid, *_ in scan}
    order = [cid for cid, *_ in scan]
    for y in range(h):
        for x in range(w):
            for cid in order:
                p = planes[cid]
                if y == 0 and x == 0:
                    pv = default
                elif y == 0:
                    pv = int(p[0, x - 1])
                elif x == 0:
                    pv = int(p[y - 1, 0])
                else:
                    pv = pred_fn(
                        int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]),
                    )
                t = decode_huffman(tables[cid])
                if t > 16:
                    raise ValueError("corrupt JPEG: lossless category > 16")
                diff = 32768 if t == 16 else _extend(receive(t), t)
                p[y, x] = (pv + diff) & 0xFFFF
    dtype = np.uint8 if prec <= 8 else np.uint16
    mask = (1 << prec) - 1
    outs = [(planes[cid] & mask).astype(dtype) for cid in order]
    if len(outs) == 1:
        return outs[0]
    return np.stack(outs, axis=-1)


def _encode_progressive(
    out, seg, comps, coef_blocks, bh, bw, dc_luma, dc_chroma, chroma_tables
) -> bytes:
    """Emit the progressive scan script: interleaved DC (Al=1) +
    refinement, then per-component AC spectral bands with two
    successive-approximation passes (the libjpeg-style web script)."""
    ncomp = len(comps)
    # DHT: standard DC tables + the generic progressive AC table
    specs = [(0, 0, dc_luma)]
    if chroma_tables:
        specs.append((0, 1, dc_chroma))
    specs.append((1, 0, _AC_PROG))
    for tc, th, (bits, values) in specs:
        seg(0xC4, bytes([tc << 4 | th] + bits) + bytes(values))
    enc_dc = [_build_encode_table(*dc_luma)] * ncomp
    if chroma_tables:
        enc_dc = enc_dc[:1] + [_build_encode_table(*dc_chroma)] * 2
    enc_ac = _build_encode_table(*_AC_PROG)

    def sos(comp_specs, ss, se, ah, al):
        payload = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            payload += bytes([cid, (td << 4) | ta])
        payload += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, payload)

    def run_scan(emit):
        writer = _BitWriter()
        emit(writer)
        writer.flush()
        out.extend(writer.out)

    # scan 1: interleaved DC first, Al=1
    dc_ids = [
        (i + 1, 1 if (chroma_tables and i) else 0, 0) for i in range(ncomp)
    ]
    sos(dc_ids, 0, 0, 0, 1)

    def dc_first(writer):
        pred = [0] * ncomp
        for bi in range(bh * bw):
            for ci in range(ncomp):
                dc = int(coef_blocks[ci][bi][0]) >> 1  # arithmetic shift
                diff = dc - pred[ci]
                pred[ci] = dc
                t, bits = _magnitude(diff)
                code, ln = enc_dc[ci][t]
                writer.write(code, ln)
                if t:
                    writer.write(bits, t)

    run_scan(dc_first)

    # scan 2: DC refinement, Ah=1 Al=0 (raw bits, no Huffman)
    sos(dc_ids, 0, 0, 1, 0)
    run_scan(
        lambda writer: [
            writer.write((int(coef_blocks[ci][bi][0]) >> 0) & 1, 1)
            for bi in range(bh * bw)
            for ci in range(ncomp)
        ]
    )

    bands = [(1, 5), (6, 63)]
    # AC first scans at Al=2, then SA refinements 2→1 and 1→0
    for ci in range(ncomp):
        for ss, se in bands:
            sos([(ci + 1, 0, 0)], ss, se, 0, 2)
            run_scan(
                lambda w, ci=ci, ss=ss, se=se: _emit_ac_first(
                    w, enc_ac, coef_blocks[ci], ss, se, 2
                )
            )
    for ah, al in ((2, 1), (1, 0)):
        for ci in range(ncomp):
            for ss, se in bands:
                sos([(ci + 1, 0, 0)], ss, se, ah, al)
                run_scan(
                    lambda w, ci=ci, ss=ss, se=se, al=al: _emit_ac_refine(
                        w, enc_ac, coef_blocks[ci], ss, se, al
                    )
                )
    out.extend(b"\xff\xd9")
    return bytes(out)


def jpeg_encode_subsampled(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "420",
    progressive: bool = False,
) -> bytes:
    """Encode uint8 RGB (H, W, 3) with chroma subsampling — 4:2:0
    (``"420"``, the web default) or 4:2:2 (``"422"``).  Luma keeps full
    resolution; chroma is box-averaged over the sampling block.
    ``progressive=True`` writes the same SOF2 script as
    :func:`jpeg_encode` — both forms carry identical quantized
    coefficients, so subsampled progressive and subsampled baseline
    decode bit-identically (and exercise the decoder's non-interleaved
    per-component block grids)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("jpeg_encode_subsampled expects uint8 (H, W, 3)")
    try:
        hs, vs = {"420": (2, 2), "422": (2, 1)}[subsampling]
    except KeyError:
        raise ValueError(
            f"subsampling must be '420' or '422', got {subsampling!r}"
        ) from None
    h, w = img.shape[:2]
    level = 128.0
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + level
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + level

    mcus_y = -(-h // (8 * vs))
    mcus_x = -(-w // (8 * hs))
    ph, pw = mcus_y * vs * 8, mcus_x * hs * 8
    ypad = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
    sub_planes = []
    for c in (cb, cr):
        cpad = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
        sub_planes.append(
            cpad.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
        )

    ql = scaled_quant(_QUANT_LUMA, quality)
    qc = scaled_quant(_QUANT_CHROMA, quality)

    def zz_blocks(plane, q):
        bh2, bw2 = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh2, 8, bw2, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coefs = _fdct(blocks - level)
        return (
            np.rint(coefs / q.reshape(1, 8, 8))
            .astype(np.int32)
            .reshape(-1, 64)[:, ZIGZAG],
            bh2,
            bw2,
        )

    yzz, ybh, ybw = zz_blocks(ypad, ql)
    czz = [zz_blocks(p, qc) for p in sub_planes]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += struct.pack(">BBB", 1, (hs << 4) | vs, 0)
    sof += struct.pack(">BBB", 2, 0x11, 1)
    sof += struct.pack(">BBB", 3, 0x11, 1)
    seg(0xC2 if progressive else 0xC0, sof)

    enc_dc = [
        _build_encode_table(*_DC_LUMA),
        _build_encode_table(*_DC_CHROMA),
        _build_encode_table(*_DC_CHROMA),
    ]

    def mcu_y_index(my, mx, by, bx):
        return (my * vs + by) * ybw + (mx * hs + bx)

    if progressive:
        for tc, th, tbl in (
            (0, 0, _DC_LUMA), (0, 1, _DC_CHROMA), (1, 0, _AC_PROG),
        ):
            bits, values = tbl
            seg(0xC4, bytes([tc << 4 | th] + bits) + bytes(values))
        enc_ac = _build_encode_table(*_AC_PROG)

        def sos(comp_specs, ss, se, ah, al):
            payload = bytes([len(comp_specs)])
            for cid, td, ta in comp_specs:
                payload += bytes([cid, (td << 4) | ta])
            payload += bytes([ss, se, (ah << 4) | al])
            seg(0xDA, payload)

        def run_scan(emit):
            writer = _BitWriter()
            emit(writer)
            writer.flush()
            out.extend(writer.out)

        dc_ids = [(1, 0, 0), (2, 1, 0), (3, 1, 0)]
        sos(dc_ids, 0, 0, 0, 1)

        def dc_first(writer):
            pred = [0, 0, 0]

            def one(ci, zz):
                dc = int(zz[0]) >> 1
                diff = dc - pred[ci]
                pred[ci] = dc
                t, bits = _magnitude(diff)
                code, ln = enc_dc[ci][t]
                writer.write(code, ln)
                if t:
                    writer.write(bits, t)

            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for by in range(vs):
                        for bx in range(hs):
                            one(0, yzz[mcu_y_index(my, mx, by, bx)])
                    one(1, czz[0][0][my * mcus_x + mx])
                    one(2, czz[1][0][my * mcus_x + mx])

        run_scan(dc_first)

        sos(dc_ids, 0, 0, 1, 0)

        def dc_refine(writer):
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for by in range(vs):
                        for bx in range(hs):
                            writer.write(
                                int(yzz[mcu_y_index(my, mx, by, bx)][0]) & 1, 1
                            )
                    writer.write(int(czz[0][0][my * mcus_x + mx][0]) & 1, 1)
                    writer.write(int(czz[1][0][my * mcus_x + mx][0]) & 1, 1)

        run_scan(dc_refine)

        # non-interleaved AC scans emit ONLY the spec's component block
        # grid (ceil(comp_size/8)) — MCU-padding blocks carry no AC
        def comp_ac_blocks(ci):
            if ci == 0:
                bh2 = -(-h // 8)
                bw2 = -(-w // 8)
                return [
                    yzz[by * ybw + bx]
                    for by in range(bh2)
                    for bx in range(bw2)
                ]
            zz, _cbh, cbw = czz[ci - 1]
            ch2 = -(-h // vs)  # component's own downsampled size
            cw2 = -(-w // hs)
            bh2 = -(-ch2 // 8)
            bw2 = -(-cw2 // 8)
            return [
                zz[by * cbw + bx] for by in range(bh2) for bx in range(bw2)
            ]

        bands = [(1, 5), (6, 63)]
        for ci in range(3):
            blocks = comp_ac_blocks(ci)
            for ss, se in bands:
                sos([(ci + 1, 0, 0)], ss, se, 0, 2)
                run_scan(
                    lambda wtr, blocks=blocks, ss=ss, se=se: _emit_ac_first(
                        wtr, enc_ac, blocks, ss, se, 2
                    )
                )
        for ah, al in ((2, 1), (1, 0)):
            for ci in range(3):
                blocks = comp_ac_blocks(ci)
                for ss, se in bands:
                    sos([(ci + 1, 0, 0)], ss, se, ah, al)
                    run_scan(
                        lambda wtr, blocks=blocks, ss=ss, se=se, al=al:
                        _emit_ac_refine(wtr, enc_ac, blocks, ss, se, al)
                    )
        out.extend(b"\xff\xd9")
        return bytes(out)

    # baseline interleaved scan
    for tc, th, tbl in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
        (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA),
    ):
        bits, values = tbl
        seg(0xC4, bytes([tc << 4 | th] + bits) + bytes(values))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    seg(0xDA, sos)
    enc_ac = [
        _build_encode_table(*_AC_LUMA),
        _build_encode_table(*_AC_CHROMA),
        _build_encode_table(*_AC_CHROMA),
    ]
    writer = _BitWriter()
    pred = [0, 0, 0]

    def emit_block(ci, zz):
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t, bits = _magnitude(diff)
        code, ln = enc_dc[ci][t]
        writer.write(code, ln)
        if t:
            writer.write(bits, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[ci][0xF0]
                writer.write(code, ln)
                run -= 16
            t, bits = _magnitude(v)
            code, ln = enc_ac[ci][(run << 4) | t]
            writer.write(code, ln)
            writer.write(bits, t)
            run = 0
        if run:
            code, ln = enc_ac[ci][0x00]
            writer.write(code, ln)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vs):
                for bx in range(hs):
                    emit_block(0, yzz[mcu_y_index(my, mx, by, bx)])
            emit_block(1, czz[0][0][my * mcus_x + mx])
            emit_block(2, czz[1][0][my * mcus_x + mx])
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def jpeg_encode(
    img: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    color_transform: bool = True,
    precision: int = 8,
    progressive: bool = False,
    arithmetic: bool = False,
) -> bytes:
    """Encode uint8 grayscale (H, W) or RGB (H, W, 3) as a baseline
    sequential JPEG (4:4:4, Annex-K tables, explicit DQT/DHT).
    ``restart_interval`` > 0 emits a DRI segment plus RST0-7 markers
    every that many MCUs (T.81 §B.2.4.4 / E.1.4).
    ``color_transform=False`` stores the RGB components directly
    (no YCbCr conversion; all three use the luma tables) — the
    component layout of a Photometric=2 JPEG-in-TIFF.
    ``precision=12`` encodes uint16 samples (≤ 4095) as extended
    sequential 12-bit (SOF1) with a 16-category DC table; AC
    coefficients that exceed the Annex-K size range (very sharp data
    at very high quality) raise ``ValueError`` — lower the quality.
    ``progressive=True`` writes SOF2 with the standard web progression
    (interleaved DC at Al=1 + refinement, then per-component spectral
    bands 1-5/6-63 at Al=2 with two successive-approximation
    refinement passes) — identical reconstruction to baseline, since
    both carry the same quantized coefficients losslessly.
    ``arithmetic=True`` swaps the Huffman entropy layer for the T.81
    Annex-D QM arithmetic coder (SOF9 + DAC, jpeg_arith.py): the SAME
    quantized coefficients, so arithmetic and Huffman encodes of one
    image decode bit-identically; the byte stream is validated against
    the system libjpeg in tests/test_jpeg_interop.py."""
    img = np.asarray(img)
    if progressive and precision != 8:
        raise NotImplementedError("progressive encode is 8-bit only")
    if progressive and restart_interval:
        raise NotImplementedError(
            "restart intervals with progressive encode unsupported"
        )
    if progressive and arithmetic:
        raise NotImplementedError(
            "progressive arithmetic encode unsupported (decode of "
            "SOF10 streams is supported)"
        )
    if precision == 8:
        if img.dtype != np.uint8:
            raise ValueError("jpeg_encode expects uint8 samples")
    elif precision == 12:
        if img.dtype != np.uint16:
            raise ValueError("12-bit jpeg_encode expects uint16 samples")
        if img.max(initial=0) > 4095:
            raise ValueError("12-bit samples must be <= 4095")
    else:
        raise ValueError("precision must be 8 or 12")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("jpeg_encode expects (H, W) or (H, W, 3)")
    h, w = img.shape[:2]
    level = float(1 << (precision - 1))
    if gray:
        comps = [img.astype(np.float64)]
    elif not color_transform:
        comps = [img[..., i].astype(np.float64) for i in range(3)]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + level
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + level
        comps = [y, cb, cr]
    chroma_tables = (not gray) and color_transform
    ql = scaled_quant(_QUANT_LUMA, quality)
    qc = scaled_quant(_QUANT_CHROMA, quality)
    quants = [ql] * len(comps) if not chroma_tables else [ql, qc, qc]

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    # DQT (zigzag order on the wire)
    seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if chroma_tables:
        seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    # SOF0 (baseline) / SOF1 (extended sequential, 12-bit) / SOF2
    sof = struct.pack(">BHHB", precision, h, w, len(comps))
    for i in range(len(comps)):
        tq = 1 if (chroma_tables and i) else 0
        sof += struct.pack(">BBB", i + 1, 0x11, tq)
    if arithmetic:
        sof_marker = 0xC9  # extended sequential, arithmetic coding
    elif progressive:
        sof_marker = 0xC2
    else:
        sof_marker = 0xC0 if precision == 8 else 0xC1
    seg(sof_marker, sof)
    # per-component DCT over edge-replicated 8-multiple padding
    # (shared by the baseline and progressive paths: both entropy-code
    # the SAME quantized coefficients)
    bh, bw = -(-h // 8), -(-w // 8)
    coef_blocks = []
    for ci, plane in enumerate(comps):
        padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coefs = _fdct(blocks - level)
        q = quants[ci].reshape(1, 8, 8)
        coef_blocks.append(
            np.rint(coefs / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
        )

    dc_luma = _DC_12BIT if precision == 12 else _DC_LUMA
    dc_chroma = _DC_12BIT if precision == 12 else _DC_CHROMA

    if progressive:
        return _encode_progressive(
            out, seg, comps, coef_blocks, bh, bw,
            dc_luma, dc_chroma, chroma_tables,
        )

    if arithmetic:
        # DAC: declare the (default) conditioning explicitly — DC
        # L=0/U=1, AC Kx=5 (T.81 F.1.4.4.1.2 / F.1.4.4.2), matching
        # what libjpeg emits
        dac = bytes([0x00, 0x10, 0x10, 0x05])
        if chroma_tables:
            dac += bytes([0x01, 0x10, 0x11, 0x05])
        seg(0xCC, dac)
    else:
        # DHT ×4 (or ×2 for grayscale / untransformed RGB)
        specs = [(0, 0, dc_luma), (1, 0, _AC_LUMA)]
        if chroma_tables:
            specs += [(0, 1, dc_chroma), (1, 1, _AC_CHROMA)]
        for tc, th, (bits, values) in specs:
            seg(0xC4, bytes([tc << 4 | th] + bits) + bytes(values))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    # SOS
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x11 if (chroma_tables and i) else 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    if arithmetic:
        from ome_arrow_spark.sources import jpeg_arith as ja

        tids = [1 if (chroma_tables and i) else 0 for i in range(len(comps))]

        def fresh_stats():
            dcs = {t: ja._new_dc_stats() for t in set(tids)}
            acs = {t: ja._new_ac_stats() for t in set(tids)}
            return dcs, acs

        enc = ja.ArithEncoder()
        dc_stats, ac_stats = fresh_stats()
        dc_ctx = {ci: 0 for ci in range(len(comps))}
        pred = [0] * len(comps)
        rst = 0
        for bi in range(bh * bw):
            if restart_interval and bi and bi % restart_interval == 0:
                out.extend(enc.flush())
                out.extend((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                enc = ja.ArithEncoder()
                dc_stats, ac_stats = fresh_stats()
                dc_ctx = {ci: 0 for ci in range(len(comps))}
                pred = [0] * len(comps)
            for ci in range(len(comps)):
                zz = [int(v) for v in coef_blocks[ci][bi]]
                ja.encode_dc_diff(
                    enc, dc_stats[tids[ci]], dc_ctx, ci,
                    zz[0] - pred[ci], 0, 1,
                )
                pred[ci] = zz[0]
                ja.encode_ac_coefs(enc, ac_stats[tids[ci]], zz, 1, 63, 5)
        out.extend(enc.flush())
        out.extend(b"\xff\xd9")  # EOI
        return bytes(out)

    enc_dc = [_build_encode_table(*dc_luma)] * len(comps)
    enc_ac = [_build_encode_table(*_AC_LUMA)] * len(comps)
    if chroma_tables:
        enc_dc = enc_dc[:1] + [_build_encode_table(*dc_chroma)] * 2
        enc_ac = enc_ac[:1] + [_build_encode_table(*_AC_CHROMA)] * 2

    writer = _BitWriter()
    pred = [0] * len(comps)
    rst = 0
    for bi in range(bh * bw):  # 4:4:4 → one block per component per MCU
        if restart_interval and bi and bi % restart_interval == 0:
            writer.flush()
            writer.out.extend((0xFF, 0xD0 + rst))
            rst = (rst + 1) % 8
            pred = [0] * len(comps)
        for ci in range(len(comps)):
            zz = coef_blocks[ci][bi]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            t, bits = _magnitude(diff)
            code, ln = enc_dc[ci][t]
            writer.write(code, ln)
            if t:
                writer.write(bits, t)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc_ac[ci][0xF0]
                    writer.write(code, ln)
                    run -= 16
                t, bits = _magnitude(v)
                if t > 10:
                    raise ValueError(
                        "AC coefficient too large for the Annex-K size "
                        "range (12-bit at very high quality) — lower the "
                        "encode quality"
                    )
                code, ln = enc_ac[ci][(run << 4) | t]
                writer.write(code, ln)
                writer.write(bits, t)
                run = 0
            if run:
                code, ln = enc_ac[ci][0x00]  # EOB
                writer.write(code, ln)
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
