"""Minimal pure-Python CCITT bilevel fax codec (ITU T.4 / T.6) — the
last TIFF compression class the built-in path gated on tifffile
(reference ingest.py:321-330 reads them via BioIO/tifffile):

* Compression=2 — "Modified Huffman" RLE: per-row 1D run-length codes,
  every row byte-aligned (TIFF 6.0 §10).
* Compression=3 — Group 3: 1D MH rows delimited by EOL codes with
  optional fill bits (T.4 §4.1), AND 2D (T4Options bit 0) where each
  EOL carries a 1D/2D mode flag bit (T.4 §4.2.1).
* Compression=4 — Group 4 / MMR (T.6): full 2D coding — pass,
  horizontal, vertical(±3) modes against the reference line; the
  dominant archival/fax class.

Both directions: the encoder emits MH (Compression=2), G3-2D
(Compression=3 with the K-parameter 1D-row cadence), and G4
(Compression=4) streams any fax-capable TIFF reader opens, which also
round-trip-proves the decoder against the published code tables.

Pixels are bilevel: decode returns uint8 "is_black" (1 = black run),
photometric mapping (WhiteIsZero vs BlackIsZero) happens in the TIFF
layer. Uncompressed-mode extension codes (T6Options bit 1) raise
``NotImplementedError``.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

# ---------------------------------------------------------------------------
# T.4 code tables: {run_length: (code_value, code_bits)}. Terminating
# codes 0-63, makeup codes 64-1728 per color, extended makeup codes
# 1792-2560 shared by both colors (T.4 tables 2/3a/3b).
# ---------------------------------------------------------------------------

WHITE_CODES: dict[int, tuple[int, int]] = {
    0: (0b00110101, 8), 1: (0b000111, 6), 2: (0b0111, 4), 3: (0b1000, 4),
    4: (0b1011, 4), 5: (0b1100, 4), 6: (0b1110, 4), 7: (0b1111, 4),
    8: (0b10011, 5), 9: (0b10100, 5), 10: (0b00111, 5), 11: (0b01000, 5),
    12: (0b001000, 6), 13: (0b000011, 6), 14: (0b110100, 6), 15: (0b110101, 6),
    16: (0b101010, 6), 17: (0b101011, 6), 18: (0b0100111, 7),
    19: (0b0001100, 7), 20: (0b0001000, 7), 21: (0b0010111, 7),
    22: (0b0000011, 7), 23: (0b0000100, 7), 24: (0b0101000, 7),
    25: (0b0101011, 7), 26: (0b0010011, 7), 27: (0b0100100, 7),
    28: (0b0011000, 7), 29: (0b00000010, 8), 30: (0b00000011, 8),
    31: (0b00011010, 8), 32: (0b00011011, 8), 33: (0b00010010, 8),
    34: (0b00010011, 8), 35: (0b00010100, 8), 36: (0b00010101, 8),
    37: (0b00010110, 8), 38: (0b00010111, 8), 39: (0b00101000, 8),
    40: (0b00101001, 8), 41: (0b00101010, 8), 42: (0b00101011, 8),
    43: (0b00101100, 8), 44: (0b00101101, 8), 45: (0b00000100, 8),
    46: (0b00000101, 8), 47: (0b00001010, 8), 48: (0b00001011, 8),
    49: (0b01010010, 8), 50: (0b01010011, 8), 51: (0b01010100, 8),
    52: (0b01010101, 8), 53: (0b00100100, 8), 54: (0b00100101, 8),
    55: (0b01011000, 8), 56: (0b01011001, 8), 57: (0b01011010, 8),
    58: (0b01011011, 8), 59: (0b01001010, 8), 60: (0b01001011, 8),
    61: (0b00110010, 8), 62: (0b00110011, 8), 63: (0b00110100, 8),
    # makeup
    64: (0b11011, 5), 128: (0b10010, 5), 192: (0b010111, 6),
    256: (0b0110111, 7), 320: (0b00110110, 8), 384: (0b00110111, 8),
    448: (0b01100100, 8), 512: (0b01100101, 8), 576: (0b01101000, 8),
    640: (0b01100111, 8), 704: (0b011001100, 9), 768: (0b011001101, 9),
    832: (0b011010010, 9), 896: (0b011010011, 9), 960: (0b011010100, 9),
    1024: (0b011010101, 9), 1088: (0b011010110, 9), 1152: (0b011010111, 9),
    1216: (0b011011000, 9), 1280: (0b011011001, 9), 1344: (0b011011010, 9),
    1408: (0b011011011, 9), 1472: (0b010011000, 9), 1536: (0b010011001, 9),
    1600: (0b010011010, 9), 1664: (0b011000, 6), 1728: (0b010011011, 9),
}

BLACK_CODES: dict[int, tuple[int, int]] = {
    0: (0b0000110111, 10), 1: (0b010, 3), 2: (0b11, 2), 3: (0b10, 2),
    4: (0b011, 3), 5: (0b0011, 4), 6: (0b0010, 4), 7: (0b00011, 5),
    8: (0b000101, 6), 9: (0b000100, 6), 10: (0b0000100, 7),
    11: (0b0000101, 7), 12: (0b0000111, 7), 13: (0b00000100, 8),
    14: (0b00000111, 8), 15: (0b000011000, 9), 16: (0b0000010111, 10),
    17: (0b0000011000, 10), 18: (0b0000001000, 10), 19: (0b00001100111, 11),
    20: (0b00001101000, 11), 21: (0b00001101100, 11), 22: (0b00000110111, 11),
    23: (0b00000101000, 11), 24: (0b00000010111, 11), 25: (0b00000011000, 11),
    26: (0b000011001010, 12), 27: (0b000011001011, 12),
    28: (0b000011001100, 12), 29: (0b000011001101, 12),
    30: (0b000001101000, 12), 31: (0b000001101001, 12),
    32: (0b000001101010, 12), 33: (0b000001101011, 12),
    34: (0b000011010010, 12), 35: (0b000011010011, 12),
    36: (0b000011010100, 12), 37: (0b000011010101, 12),
    38: (0b000011010110, 12), 39: (0b000011010111, 12),
    40: (0b000001101100, 12), 41: (0b000001101101, 12),
    42: (0b000011011010, 12), 43: (0b000011011011, 12),
    44: (0b000001010100, 12), 45: (0b000001010101, 12),
    46: (0b000001010110, 12), 47: (0b000001010111, 12),
    48: (0b000001100100, 12), 49: (0b000001100101, 12),
    50: (0b000001010010, 12), 51: (0b000001010011, 12),
    52: (0b000000100100, 12), 53: (0b000000110111, 12),
    54: (0b000000111000, 12), 55: (0b000000100111, 12),
    56: (0b000000101000, 12), 57: (0b000001011000, 12),
    58: (0b000001011001, 12), 59: (0b000000101011, 12),
    60: (0b000000101100, 12), 61: (0b000001011010, 12),
    62: (0b000001100110, 12), 63: (0b000001100111, 12),
    # makeup
    64: (0b0000001111, 10), 128: (0b000011001000, 12),
    192: (0b000011001001, 12), 256: (0b000001011011, 12),
    320: (0b000000110011, 12), 384: (0b000000110100, 12),
    448: (0b000000110101, 12), 512: (0b0000001101100, 13),
    576: (0b0000001101101, 13), 640: (0b0000001001010, 13),
    704: (0b0000001001011, 13), 768: (0b0000001001100, 13),
    832: (0b0000001001101, 13), 896: (0b0000001110010, 13),
    960: (0b0000001110011, 13), 1024: (0b0000001110100, 13),
    1088: (0b0000001110101, 13), 1152: (0b0000001110110, 13),
    1216: (0b0000001110111, 13), 1280: (0b0000001010010, 13),
    1344: (0b0000001010011, 13), 1408: (0b0000001010100, 13),
    1472: (0b0000001010101, 13), 1536: (0b0000001011010, 13),
    1600: (0b0000001011011, 13), 1664: (0b0000001100100, 13),
    1728: (0b0000001100101, 13),
}

# extended makeup codes (shared, T.4 table 3b)
EXT_CODES: dict[int, tuple[int, int]] = {
    1792: (0b00000001000, 11), 1856: (0b00000001100, 11),
    1920: (0b00000001101, 11), 1984: (0b000000010010, 12),
    2048: (0b000000010011, 12), 2112: (0b000000010100, 12),
    2176: (0b000000010101, 12), 2240: (0b000000010110, 12),
    2304: (0b000000010111, 12), 2368: (0b000000011100, 12),
    2432: (0b000000011101, 12), 2496: (0b000000011110, 12),
    2560: (0b000000011111, 12),
}


def _decode_table(codes: dict[int, tuple[int, int]]) -> dict[tuple[int, int], int]:
    return {(bits, val): run for run, (val, bits) in codes.items()}

_WHITE_DEC = {**_decode_table(WHITE_CODES), **_decode_table(EXT_CODES)}
_BLACK_DEC = {**_decode_table(BLACK_CODES), **_decode_table(EXT_CODES)}

# 2D mode codes (T.4 §4.2.1.3 / T.6): value, bits
_MODE_V0 = (0b1, 1)
_MODE_VR = [(0b011, 3), (0b000011, 6), (0b0000011, 7)]   # VR1..VR3
_MODE_VL = [(0b010, 3), (0b000010, 6), (0b0000010, 7)]   # VL1..VL3
_MODE_H = (0b001, 3)
_MODE_P = (0b0001, 4)


class _BitReader:
    """MSB-first bit reader."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        if self.pos >= len(self.data) * 8:
            raise ValueError("truncated CCITT stream")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self, slack_bits: int = 8) -> bool:
        return self.pos + slack_bits >= len(self.data) * 8


def _read_run(r: _BitReader, black: bool) -> int:
    """One complete run length: zero or more makeup codes + one
    terminating code."""
    table = _BLACK_DEC if black else _WHITE_DEC
    total = 0
    while True:
        code = 0
        for length in range(1, 15):
            code = (code << 1) | r.read_bit()
            run = table.get((length, code))
            if run is not None:
                break
        else:
            raise ValueError("corrupt CCITT stream: no run code in 14 bits")
        total += run
        if run < 64:
            return total


def _decode_mh_row(r: _BitReader, width: int) -> list[int]:
    """One 1D row → transition positions (alternating, first is
    white→black)."""
    transitions: list[int] = []
    pos = 0
    black = False
    while pos < width:
        run = _read_run(r, black)
        pos += run
        if pos > width:
            raise ValueError("corrupt CCITT stream: row overruns width")
        transitions.append(min(pos, width))
        black = not black
    return transitions


def _row_to_bits(transitions: list[int], width: int) -> np.ndarray:
    row = np.zeros(width, dtype=np.uint8)
    for i in range(0, len(transitions) - 1, 2):
        row[transitions[i] : transitions[i + 1]] = 1
    if len(transitions) % 2 == 1:
        row[transitions[-1] :] = 1
    return row


def decode_mh(data: bytes, width: int, height: int) -> np.ndarray:
    """Compression=2: MH rows, each starting on a byte boundary."""
    r = _BitReader(data)
    rows = []
    for _ in range(height):
        r.byte_align()
        rows.append(_row_to_bits(_decode_mh_row(r, width), width))
    return np.stack(rows)


def _skip_to_eol(r: _BitReader) -> None:
    """Consume fill bits + one EOL (>=11 zeros then a 1)."""
    zeros = 0
    while True:
        if r.read_bit():
            if zeros >= 11:
                return
            zeros = 0  # stray 1 before a conformant EOL: keep scanning
        else:
            zeros += 1


def decode_g3_1d(data: bytes, width: int, height: int) -> np.ndarray:
    """Compression=3 with 1D coding: EOL before every row (fill bits
    tolerated)."""
    r = _BitReader(data)
    rows = []
    for _ in range(height):
        _skip_to_eol(r)
        rows.append(_row_to_bits(_decode_mh_row(r, width), width))
    return np.stack(rows)


def decode_g3_2d(data: bytes, width: int, height: int) -> np.ndarray:
    """Compression=3 with 2D coding (T4Options bit 0): every EOL
    carries a mode flag bit — 1 = the next row is 1D (MH), 0 = 2D
    against the previous row (T.4 §4.2.1)."""
    r = _BitReader(data)
    ref: list[int] = []
    rows = []
    for _ in range(height):
        _skip_to_eol(r)
        one_dimensional = bool(r.read_bit())
        if one_dimensional:
            cur = _decode_mh_row(r, width)
        else:
            cur = _decode_2d_row(r, ref, width)
        rows.append(_row_to_bits(cur, width))
        ref = cur
    return np.stack(rows)


def _read_mode(r: _BitReader) -> tuple[str, int]:
    """Decode one 2D mode code → (kind, param)."""
    if r.read_bit():
        return "V", 0
    if r.read_bit():  # 01x
        return "V", 1 if r.read_bit() else -1
    if r.read_bit():  # 001
        return "H", 0
    if r.read_bit():  # 0001
        return "P", 0
    # 0000...
    if r.read_bit():  # 00001 1x
        return "V", 2 if r.read_bit() else -2
    if r.read_bit():  # 000001 1x
        return "V", 3 if r.read_bit() else -3
    # 0000001 → extension (uncompressed mode); more zeros → EOL
    zeros = 6
    while True:
        if r.read_bit():
            if zeros >= 11:
                return "EOL", 0
            if zeros == 6:
                raise NotImplementedError(
                    "CCITT uncompressed-mode extension unsupported"
                )
            raise ValueError("corrupt CCITT 2D stream: bad mode code")
        zeros += 1


def _decode_2d_row(r: _BitReader, ref: list[int], width: int) -> list[int]:
    """One 2D-coded row against reference transitions ``ref``."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 white, 1 black
    while a0 < width:
        # b1: first ref transition > a0 whose parity flips color
        i = bisect_right(ref, a0 if a0 > 0 else 0) if a0 >= 0 else 0
        # transitions at even index are white→black; need transition to
        # opposite of current color
        while i < len(ref) and (ref[i] <= a0 or (i & 1) != color):
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        kind, param = _read_mode(r)
        if kind == "EOL":
            break
        if kind == "P":
            a0 = b2
        elif kind == "H":
            start = a0 if a0 > 0 else 0
            r1 = _read_run(r, black=bool(color))
            r2 = _read_run(r, black=not bool(color))
            cur.append(min(start + r1, width))
            cur.append(min(start + r1 + r2, width))
            a0 = start + r1 + r2
        else:  # vertical
            a1 = b1 + param
            if a1 < 0 or a1 > width:
                raise ValueError("corrupt CCITT 2D stream: a1 out of bounds")
            cur.append(a1)
            a0 = a1
            color ^= 1
    return cur


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """Compression=4 (T.6 MMR): all rows 2D-coded; the first reference
    line is imaginary all-white."""
    r = _BitReader(data)
    ref: list[int] = []
    rows = []
    for _ in range(height):
        cur = _decode_2d_row(r, ref, width)
        rows.append(_row_to_bits(cur, width))
        ref = cur
    return np.stack(rows)


def ccitt_decode(
    data: bytes, width: int, height: int, compression: int,
    t4_options: int = 0,
) -> np.ndarray:
    """Dispatch → uint8 (H, W) is_black bitmap."""
    if compression == 2:
        return decode_mh(data, width, height)
    if compression == 3:
        if t4_options & 1:
            return decode_g3_2d(data, width, height)
        return decode_g3_1d(data, width, height)
    if compression == 4:
        return decode_g4(data, width, height)
    raise ValueError(f"not a CCITT compression code: {compression}")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, val: int, bits: int) -> None:
        self.buf = (self.buf << bits) | val
        self.cnt += bits
        while self.cnt >= 8:
            self.cnt -= 8
            self.out.append((self.buf >> self.cnt) & 0xFF)
        self.buf &= (1 << self.cnt) - 1

    def byte_align(self) -> None:
        if self.cnt:
            self.write(0, 8 - self.cnt)


def _write_run(w: _BitWriter, run: int, black: bool) -> None:
    codes = BLACK_CODES if black else WHITE_CODES
    while run >= 2624:  # 2560 ext-makeup + 63 terminating ceiling
        val, bits = EXT_CODES[2560]
        w.write(val, bits)
        run -= 2560
    if run >= 64:
        makeup = min(2560, (run // 64) * 64)
        table = EXT_CODES if makeup >= 1792 else codes
        val, bits = table[makeup]
        w.write(val, bits)
        run -= makeup
    val, bits = codes[run]
    w.write(val, bits)


def _transitions(row: np.ndarray) -> list[int]:
    d = np.flatnonzero(np.diff(row.astype(np.int8)))
    t = (d + 1).tolist()
    if row[0]:
        t = [0] + t
    return t


def encode_mh(bitmap: np.ndarray) -> bytes:
    """Compression=2 stream for an is_black uint8 (H, W) bitmap."""
    h, width = bitmap.shape
    w = _BitWriter()
    for y in range(h):
        t = _transitions(bitmap[y])
        pos = 0
        black = False
        ti = 0
        while pos < width:
            nxt = t[ti] if ti < len(t) else width
            _write_run(w, nxt - pos, black)
            pos = nxt
            black = not black
            ti += 1
        w.byte_align()
    return bytes(w.out)


def _encode_2d_row(
    w: _BitWriter, cur: list[int], ref: list[int], width: int
) -> None:
    """Emit one 2D-coded row (pass/vertical/horizontal modes)."""
    a0 = -1
    color = 0
    ci = 0  # index into cur of next transition > a0
    while a0 < width:
        a1 = cur[ci] if ci < len(cur) else width
        a2 = cur[ci + 1] if ci + 1 < len(cur) else width
        i = 0
        while i < len(ref) and (ref[i] <= a0 or (i & 1) != color):
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        if b2 < a1:  # pass mode
            w.write(*_MODE_P)
            a0 = b2
        elif abs(a1 - b1) <= 3:  # vertical mode
            d = a1 - b1
            if d == 0:
                w.write(*_MODE_V0)
            elif d > 0:
                w.write(*_MODE_VR[d - 1])
            else:
                w.write(*_MODE_VL[-d - 1])
            a0 = a1
            color ^= 1
            ci += 1
        else:  # horizontal mode
            start = a0 if a0 > 0 else 0
            w.write(*_MODE_H)
            _write_run(w, a1 - start, black=bool(color))
            _write_run(w, a2 - a1, black=not bool(color))
            a0 = a2
            ci += 2


def encode_g4(bitmap: np.ndarray) -> bytes:
    """Compression=4 (T.6) stream for an is_black uint8 (H, W) bitmap,
    EOFB-terminated."""
    h, width = bitmap.shape
    w = _BitWriter()
    ref: list[int] = []
    for y in range(h):
        cur = _transitions(bitmap[y])
        _encode_2d_row(w, cur, ref, width)
        ref = cur
    w.write(0b000000000001, 12)  # EOFB
    w.write(0b000000000001, 12)
    w.byte_align()
    return bytes(w.out)


def encode_g3_2d(bitmap: np.ndarray, k: int = 4) -> bytes:
    """Compression=3 2D stream (T4Options bit 0): EOL + flag bit per
    row, a 1D row at least every ``k`` rows (the T.4 K-parameter)."""
    h, width = bitmap.shape
    w = _BitWriter()
    ref: list[int] = []
    for y in range(h):
        w.write(0b000000000001, 12)  # EOL
        one_dimensional = (y % k) == 0
        w.write(1 if one_dimensional else 0, 1)
        cur = _transitions(bitmap[y])
        if one_dimensional:
            pos, black, ti = 0, False, 0
            while pos < width:
                nxt = cur[ti] if ti < len(cur) else width
                _write_run(w, nxt - pos, black)
                pos, black, ti = nxt, not black, ti + 1
        else:
            _encode_2d_row(w, cur, ref, width)
        ref = cur
    w.byte_align()
    return bytes(w.out)
