"""Pure-Python blosclz codec — the c-blosc default inner codec.

BloscLZ's wire format is the FastLZ "level 2" instruction stream
(blosclz derives from FastLZ; both are public C, and the byte format
has stayed stable across c-blosc 1.x so numcodecs' ``Blosc(cname=
'blosclz')`` chunks decode here without the numcodecs dependency —
the last inner codec the built-in NGFF reader gated on, reference
ingest.py:729 reads the same stores through the zarr package):

* the FIRST byte is always a literal-run control (the reference
  decoder masks it with 31);
* control < 32 → literal run of ``ctrl + 1`` bytes following;
* control ≥ 32 → match: bits 5-7 hold ``len_code`` (match length =
  len_code + 2 for 1 ≤ len_code ≤ 6; len_code == 7 adds extension
  bytes, each 255 continuing the sum), bits 0-4 are the offset high
  bits; one low-offset byte follows the length extension, giving
  distance = (hi << 8) + lo + 1 (≤ 8191);
* the escape hi == 31, lo == 255 switches to a 16-bit far distance
  (two more bytes, distance = ofs + 8191 + 1).

Decode handles both forms; encode (greedy 3-byte hash chain) only
emits near matches and never the escape combination, so its output is
decodable by any FastLZ-2/blosclz decoder including c-blosc itself.

Malformed input raises ``ValueError`` (never IndexError), matching
the engine's codec decode contract.
"""

from __future__ import annotations

__all__ = ["blosclz_compress", "blosclz_decompress"]

_MAX_DISTANCE = 8191  # c-blosc MAX_DISTANCE: largest near-form distance


def blosclz_decompress(data: bytes, out_size: int | None = None) -> bytes:
    """Decompress one blosclz stream. ``out_size``, when given, is
    validated against the decoded length."""
    n = len(data)
    if n == 0:
        if out_size in (None, 0):
            return b""
        raise ValueError("truncated blosclz stream")
    out = bytearray()
    try:
        ctrl = data[0] & 31
        ip = 1
        while True:
            if ctrl >= 32:
                length = (ctrl >> 5) - 1
                ofs = (ctrl & 31) << 8
                if length == 6:  # len_code 7: extension bytes
                    while True:
                        code = data[ip]
                        ip += 1
                        length += code
                        if code != 255:
                            break
                code = data[ip]
                ip += 1
                length += 3
                dist = ofs + code + 1
                if code == 255 and ofs == (31 << 8):
                    dist = ((data[ip] << 8) | data[ip + 1]) + _MAX_DISTANCE + 1
                    ip += 2
                ref = len(out) - dist
                if ref < 0:
                    raise ValueError("corrupt blosclz stream: bad distance")
                if dist >= length:
                    out += out[ref : ref + length]
                else:  # overlapping copy == pattern repeat
                    pattern = bytes(out[ref:])
                    reps = -(-length // dist)
                    out += (pattern * reps)[:length]
            else:
                run = ctrl + 1
                if ip + run > n:
                    raise ValueError("truncated blosclz literal run")
                out += data[ip : ip + run]
                ip += run
            if ip < n:
                ctrl = data[ip]
                ip += 1
            else:
                break
    except IndexError:
        raise ValueError("truncated blosclz stream") from None
    if out_size is not None and len(out) != out_size:
        raise ValueError(
            f"blosclz stream decoded to {len(out)} bytes, expected {out_size}"
        )
    return bytes(out)


def _emit_literals(out: bytearray, data: bytes, start: int, end: int) -> None:
    while start < end:
        run = min(32, end - start)
        out.append(run - 1)
        out += data[start : start + run]
        start += run


def blosclz_compress(data: bytes) -> bytes:
    """Greedy single-pass compressor: 3-byte hash table, near-form
    matches only (distance ≤ 8191). Output may exceed the input on
    incompressible data — the blosc frame layer already falls back to
    a stored stream / memcpy frame in that case, like c-blosc."""
    n = len(data)
    if n == 0:
        return b""
    out = bytearray()
    htab: dict[bytes, int] = {}
    lit_start = 0
    ip = 1  # position 0 must reach the decoder as a literal
    while ip + 3 <= n:
        key = data[ip : ip + 3]
        cand = htab.get(key)
        htab[key] = ip
        if cand is None or ip - cand > _MAX_DISTANCE:
            ip += 1
            continue
        m = 3
        limit = n - ip
        while m < limit and data[cand + m] == data[ip + m]:
            m += 1
        _emit_literals(out, data, lit_start, ip)
        dd = ip - cand - 1
        hi, lo = dd >> 8, dd & 255
        if m <= 8:
            out.append(((m - 2) << 5) | hi)
        else:
            out.append((7 << 5) | hi)
            rem = m - 9
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.append(lo)
        ip += m
        lit_start = ip
    _emit_literals(out, data, lit_start, n)
    return bytes(out)
