"""Minimal pure-Python FLAC codec — stdlib + numpy only.

Decoder: the full frame surface a real encoder emits — constant,
verbatim, fixed-predictor order 0-4, and LPC subframes; Rice residual
partitions of any order, both 4- and 5-bit parameter widths, escape
(raw) partitions; wasted-bits shifts; independent, left/side,
right/side and mid/side channel decorrelation; UTF-8-coded frame/
sample numbers; CRC-8 (header) and CRC-16 (frame) verified; STREAMINFO
MD5 verified over the decoded stream when present.  8/16/24-bit.

Encoder: 16-bit mono/stereo, 4096-sample frames, per-subframe choice
of constant / fixed order 0-4 / verbatim by exact cost, single Rice
partition with exact-cost parameter selection.  Output is bit-exact
losslessly decodable by this decoder AND carries correct CRCs + MD5,
so any conforming FLAC decoder accepts it.

Scale shape: fixed-predictor reconstruction is repeated ``np.cumsum``
(one vectorized pass per order), Rice decoding walks bytes with
integer ops (no per-bit python loop on the unary fast path); LPC
reconstruction is the one genuinely sequential python loop and only
runs for externally-encoded files.  Per-blob decode rides the media
table's ``mapInPandas`` batches like every other codec here
(operators/multimodal.py).

Format reference: the public FLAC format specification
(https://xiph.org/flac/format.html) — implemented from the spec text;
no FLAC source code consulted.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC = 0x3FFE

_BLOCKSIZE_CODES = {192: 0b0001}
for _i in range(2, 6):
    _BLOCKSIZE_CODES[576 << (_i - 2)] = _i
for _i in range(8, 16):
    _BLOCKSIZE_CODES[256 << (_i - 8)] = _i

_RATE_CODES = {
    88200: 0b0001, 176400: 0b0010, 192000: 0b0011, 8000: 0b0100,
    16000: 0b0101, 22050: 0b0110, 24000: 0b0111, 32000: 0b1000,
    44100: 0b1001, 48000: 0b1010, 96000: 0b1011,
}
_RATE_FROM_CODE = {v: k for k, v in _RATE_CODES.items()}

_BPS_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110,
              32: 0b111}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODES.items()}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x^1 + x^0 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


_CRC16_TABLE = None


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + x^0 (0x8005), init 0."""
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        tab = []
        for i in range(256):
            crc = i << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x8005) if crc & 0x8000 else (crc << 1)
                crc &= 0xFFFF
            tab.append(crc)
        _CRC16_TABLE = tab
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


class _BitReader:
    """MSB-first bit reader with an integer-op unary fast path."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated FLAC stream")
        b0, b1 = self.pos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.data[b0:b1], "big")
        self.pos = end
        return (chunk >> ((b1 << 3) - end)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        data, pos = self.data, self.pos
        byte_i, bit_off = pos >> 3, pos & 7
        if byte_i >= len(data):
            raise ValueError("truncated FLAC stream")
        b = data[byte_i] & (0xFF >> bit_off)
        q = 0
        if b == 0:
            q = 8 - bit_off
            byte_i += 1
            while byte_i < len(data) and data[byte_i] == 0:
                q += 8
                byte_i += 1
            if byte_i >= len(data):
                raise ValueError("truncated FLAC stream")
            b = data[byte_i]
            bit_off = 0
        lead = 8 - b.bit_length()  # index of first set bit in the byte
        q += lead - bit_off
        self.pos = (byte_i << 3) + lead + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coding of frame/sample numbers (extended to
    36 bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    prefixes = [(0x800, 2), (0x10000, 3), (0x200000, 4), (0x4000000, 5),
                (0x80000000, 6), (1 << 36, 7)]
    for limit, nbytes in prefixes:
        if n < limit:
            break
    else:
        raise ValueError("frame number too large")
    for i in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead_mask | n)
    return bytes(reversed(out))


def _read_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 frame number")
    n = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# Residual coding
# ---------------------------------------------------------------------------


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return np.where(v >= 0, v << 1, ((-v) << 1) - 1)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return (u >> 1) ^ -(u & 1)


def _read_residuals(
    r: _BitReader, blocksize: int, order: int
) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    if blocksize % (1 << po):
        raise ValueError("partition order does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    w = 0
    for p in range(1 << po):
        n = (blocksize >> po) - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for i in range(n):
                out[w + i] = r.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out[w + i] = (u >> 1) ^ -(u & 1)
        w += n
    return out


def _write_residuals(w: _BitWriter, res: np.ndarray, order: int) -> None:
    """Single-partition Rice coding with exact-cost parameter choice;
    falls back to an escape (raw) partition when that is cheaper."""
    u = _zigzag(res)
    n = len(u)
    best_k, best_cost = 0, None
    for k in range(15):
        cost = int((u >> k).sum()) + n * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    raw_bits = max(2, int(np.abs(res).max()) if n else 0).bit_length() + 1
    w.write(0, 2)   # method 0: 4-bit params
    w.write(0, 4)   # partition order 0
    if best_cost > 5 + n * raw_bits:
        w.write(0xF, 4)
        w.write(raw_bits, 5)
        for v in res.tolist():
            w.write(int(v), raw_bits)
        return
    w.write(best_k, 4)
    k = best_k
    for v in u.tolist():
        w.write_unary(int(v) >> k)
        if k:
            w.write(int(v), k)


# ---------------------------------------------------------------------------
# Subframes
# ---------------------------------------------------------------------------


def _restore_fixed(
    warmup: np.ndarray, res: np.ndarray, order: int
) -> np.ndarray:
    """Invert the fixed predictor: order-o prediction residuals are the
    o-th forward differences, so reconstruction is o nested cumsums —
    vectorized, no per-sample loop."""
    acc = res.astype(np.int64)
    w = warmup.astype(np.int64)
    for j in range(order, 0, -1):
        seed = np.diff(w, n=j - 1)[-1] if j > 1 else w[-1]
        acc = seed + np.cumsum(acc)
    return np.concatenate([w, acc]) if order else acc


def _read_subframe(
    r: _BitReader, blocksize: int, bps: int
) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if stype == 0:  # constant
        v = r.read_signed(bps)
        out = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # verbatim
        out = np.fromiter(
            (r.read_signed(bps) for _ in range(blocksize)),
            dtype=np.int64, count=blocksize,
        )
    elif 8 <= stype <= 12:  # fixed, order stype-8
        order = stype - 8
        warm = np.fromiter(
            (r.read_signed(bps) for _ in range(order)),
            dtype=np.int64, count=order,
        )
        res = _read_residuals(r, blocksize, order)
        out = _restore_fixed(warm, res, order)
    elif stype >= 32:  # LPC, order stype-31
        order = stype - 31
        warm = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coeffs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residuals(r, blocksize, order)
        x = warm + [0] * (blocksize - order)
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coeffs[j] * x[i - 1 - j]
            x[i] = (pred >> shift) + int(res[i - order])
        out = np.array(x, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted if wasted else out


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    """Pick constant / best fixed order / verbatim by exact coded cost."""
    x = x.astype(np.int64)
    if len(x) and (x == x[0]).all():
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    best = None  # (cost, order, residuals)
    for order in range(min(4, len(x) - 1) + 1):
        res = np.diff(x, n=order)
        u = _zigzag(res)
        cost = min(
            int((u >> k).sum()) + len(u) * (k + 1) for k in range(15)
        ) + order * bps
        if best is None or cost < best[0]:
            best = (cost, order, res)
    if best is None or best[0] >= len(x) * bps:
        w.write(0, 1)
        w.write(1, 6)  # verbatim
        w.write(0, 1)
        for v in x.tolist():
            w.write(int(v), bps)
        return
    _, order, res = best
    w.write(0, 1)
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in x[:order].tolist():
        w.write(int(v), bps)
    _write_residuals(w, res, order)


# ---------------------------------------------------------------------------
# Streams
# ---------------------------------------------------------------------------


def flac_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples — ``(n,)`` mono or ``(n, channels)`` — → complete
    FLAC stream (STREAMINFO incl. MD5, fixed 4096-sample frames,
    independent channels)."""
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if channels < 1 or channels > 8:
        raise ValueError("1-8 channels")
    bps = 16
    blocksize = 4096
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()
    frames = bytearray()
    for fi, start in enumerate(range(0, max(n, 1), blocksize)):
        block = x[start:start + blocksize]
        bs = len(block)
        w = _BitWriter()
        w.write(_SYNC, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize strategy
        bs_code = _BLOCKSIZE_CODES.get(bs)
        w.write(bs_code if bs_code else (0b0110 if bs <= 256 else 0b0111), 4)
        rate_code = _RATE_CODES.get(sample_rate, 0b0000)
        w.write(rate_code, 4)
        w.write(channels - 1, 4)  # independent channels
        w.write(_BPS_CODES[bps], 3)
        w.write(0, 1)  # reserved
        for b in _utf8_number(fi):
            w.write(b, 8)
        if bs_code is None:
            w.write(bs - 1, 8 if bs <= 256 else 16)
        hdr = bytes(w.out)  # byte-aligned here by construction
        assert w.nbits == 0
        w.write(_crc8(hdr), 8)
        for c in range(channels):
            _write_subframe(w, block[:, c], bps)
        w.align()
        body = bytes(w.out)
        frames += body + struct.pack(">H", _crc16(body))
    # STREAMINFO
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    info = si.bytes() + md5
    header = b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info
    return header + bytes(frames)


def flac_decode(
    data: bytes, verify_md5: bool = True
) -> tuple[np.ndarray, int]:
    """FLAC stream → (samples, sample_rate).  Samples are int16 for
    bps ≤ 16 else int32, ``(n,)`` mono / ``(n, channels)``.  Frame
    CRC-8/CRC-16 always verified; STREAMINFO MD5 verified unless
    disabled."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        hdr = data[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:
            streaminfo = body
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC stream lacks STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16), si.read(16), si.read(24), si.read(24)
    si_rate = si.read(20)
    si_channels = si.read(3) + 1
    si_bps = si.read(5) + 1
    total = si.read(36)
    md5 = streaminfo[18:34]

    chans: list[list[np.ndarray]] = [[] for _ in range(si_channels)]
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        frame_start = pos
        r = _BitReader(data)
        r.pos = pos * 8
        if r.read(14) != _SYNC:
            raise ValueError("lost frame sync")
        if r.read(1):
            raise ValueError("reserved frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved frame bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if rate_code == 0:
            rate = si_rate
        elif rate_code in _RATE_FROM_CODE:
            rate = _RATE_FROM_CODE[rate_code]
        elif rate_code == 12:
            rate = r.read(8) * 1000
        elif rate_code == 13:
            rate = r.read(16)
        elif rate_code == 14:
            rate = r.read(16) * 10
        else:
            raise ValueError("invalid sample-rate code")
        bps = si_bps if bps_code == 0 else _BPS_FROM_CODE.get(bps_code)
        if bps is None:
            raise ValueError("reserved sample-size code")
        hdr_bytes = data[frame_start:(r.pos + 7) // 8]
        crc8 = r.read(8)
        if _crc8(hdr_bytes) != crc8:
            raise ValueError("frame header CRC-8 mismatch")
        if chan_code < 8:
            nch = chan_code + 1
            subs = [_read_subframe(r, bs, bps) for _ in range(nch)]
        elif chan_code == 8:  # left/side
            left = _read_subframe(r, bs, bps)
            side = _read_subframe(r, bs, bps + 1)
            subs = [left, left - side]
        elif chan_code == 9:  # right/side
            side = _read_subframe(r, bs, bps + 1)
            right = _read_subframe(r, bs, bps)
            subs = [side + right, right]
        elif chan_code == 10:  # mid/side
            mid = _read_subframe(r, bs, bps)
            side = _read_subframe(r, bs, bps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        if len(subs) != si_channels:
            raise ValueError("frame channel count != STREAMINFO")
        r.align()
        body = data[frame_start:r.pos // 8]
        crc16 = r.read(16)
        if _crc16(body) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        pos = r.pos // 8
        for c, s in enumerate(subs):
            chans[c].append(s)
        got += bs
    if not chans[0]:
        out = np.zeros((0, si_channels), dtype=np.int16)
    else:
        out = np.stack(
            [np.concatenate(c) for c in chans], axis=1
        )
    if total:
        out = out[:total]
    dtype = np.int16 if si_bps <= 16 else np.int32
    out = out.astype(dtype)
    if verify_md5 and md5 != b"\x00" * 16:
        if si_bps == 16:
            raw = out.astype("<i2").tobytes()
        elif si_bps == 8:
            raw = out.astype("<i1").tobytes()
        elif si_bps == 24:
            le = out.astype("<i4").view(np.uint8).reshape(-1, 4)
            raw = le[:, :3].tobytes()
        else:
            raw = None
        if raw is not None and hashlib.md5(raw).digest() != md5:
            raise ValueError("decoded stream fails STREAMINFO MD5")
    if si_channels == 1:
        return out.reshape(-1), int(si_rate)
    return out, int(si_rate)
