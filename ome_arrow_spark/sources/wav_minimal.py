"""Minimal pure-Python WAV (RIFF/WAVE) codec — stdlib ``struct`` +
numpy only.

Decoder: PCM integer 8 (unsigned) / 16 / 24 / 32-bit and IEEE float32
/ float64; G.711 µ-law and A-law (8-bit log PCM, the telephony
formats); IMA/DVI ADPCM (4-bit, block-structured, mono or stereo) —
mono or multi-channel, WAVE_FORMAT_EXTENSIBLE unwrapped to its
SubFormat, unknown RIFF chunks skipped (LIST/cue…), the ``fact``
chunk honored for ADPCM frame counts. Output is ``(n_frames,
channels)`` (or ``(n_frames,)`` mono) in the file's native sample
type (int16 for the compressed formats). Perceptual codecs (MP3/AAC)
raise ``NotImplementedError`` — they need real audio libs.

Encoder: PCM 16-bit (the interchange default), float32, µ-law, A-law,
and IMA ADPCM, any channel count (ADPCM: mono/stereo).

G.711 is pure per-sample integer arithmetic (Sun's public-domain
g711.c formulation); both laws here satisfy the canonical involution
``encode(decode(code)) == code`` for all 256 codes.  IMA ADPCM is a
per-block (predictor, step-index) state machine; both directions are
vectorized ACROSS blocks/channels with numpy — the python loop runs
over sample positions within a block only, so cost is O(block length)
regardless of clip count.

This backs the media table's ``decode_media`` for ``audio`` blobs
(operators/multimodal.py), the same way ``jpeg_minimal``/
``png_minimal`` back ``image``.
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_IMA_ADPCM = 0x0011
WAVE_FORMAT_EXTENSIBLE = 0xFFFE


# ---------------------------------------------------------------------------
# G.711 µ-law / A-law
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def _build_ulaw_table() -> np.ndarray:
    code = np.arange(256, dtype=np.int32)
    u = ~code & 0xFF
    exp = (u >> 4) & 7
    man = u & 0x0F
    mag = (((man << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    code = np.arange(256, dtype=np.int32)
    a = code ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    mag = np.where(
        seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0)
    )
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


_ULAW_DECODE = _build_ulaw_table()
_ALAW_DECODE = _build_alaw_table()
_SEG_ENDS = np.array(
    [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF],
    dtype=np.int32,
)
# A-law segments are defined on the 13-bit magnitude (g711.c seg_aend)
_ALAW_SEG_ENDS = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """µ-law bytes → int16 samples (table lookup)."""
    return _ULAW_DECODE[np.asarray(codes, dtype=np.uint8)]


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 samples → µ-law bytes (vectorized g711.c linear2ulaw)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    exp = np.searchsorted(_SEG_ENDS, mag, side="left").astype(np.int32)
    man = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | man) & 0xFF).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes → int16 samples (table lookup)."""
    return _ALAW_DECODE[np.asarray(codes, dtype=np.uint8)]


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 samples → A-law bytes (vectorized g711.c linear2alaw:
    13-bit magnitude, mask 0xD5/0x55, -x-1 negative fold)."""
    x = np.asarray(samples, dtype=np.int32) >> 3
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_ENDS, mag, side="left").astype(np.int32)
    shift = np.where(seg < 2, 1, np.minimum(seg, 7))
    man = (mag >> shift) & 0x0F
    aval = np.where(seg >= 8, 0x7F, (np.minimum(seg, 7) << 4) | man)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int32,
)


def _ima_decode_nibbles(
    nibbles: np.ndarray, predictor: np.ndarray, index: np.ndarray
) -> np.ndarray:
    """Decode ``(n_seq, n_samples)`` nibble rows given per-sequence
    initial (predictor, step index).  The loop runs over sample
    positions; every step is vectorized across sequences."""
    n_seq, n = nibbles.shape
    out = np.empty((n_seq, n), dtype=np.int16)
    pred = predictor.astype(np.int32).copy()
    idx = np.clip(index.astype(np.int32), 0, 88)
    for t in range(n):
        nib = nibbles[:, t].astype(np.int32)
        step = _IMA_STEPS[idx]
        # diff = (2*(nib&7)+1) * step / 8, in the spec's shift form
        diff = step >> 3
        diff += np.where(nib & 4, step, 0)
        diff += np.where(nib & 2, step >> 1, 0)
        diff += np.where(nib & 1, step >> 2, 0)
        pred = pred + np.where(nib & 8, -diff, diff)
        pred = np.clip(pred, -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[nib], 0, 88)
        out[:, t] = pred
    return out


def _ima_encode_samples(
    samples: np.ndarray, predictor: np.ndarray, index: np.ndarray
) -> np.ndarray:
    """Encode ``(n_seq, n_samples)`` int16 rows to nibbles given
    per-sequence initial state (the standard IMA quantizer, the one
    the decoder inverts bit-for-bit on its own output)."""
    n_seq, n = samples.shape
    out = np.empty((n_seq, n), dtype=np.uint8)
    pred = predictor.astype(np.int32).copy()
    idx = np.clip(index.astype(np.int32), 0, 88)
    for t in range(n):
        step = _IMA_STEPS[idx]
        delta = samples[:, t].astype(np.int32) - pred
        sign = delta < 0
        mag = np.where(sign, -delta, delta)
        b2 = mag >= step
        mag = np.where(b2, mag - step, mag)
        b1 = mag >= step >> 1
        mag = np.where(b1, mag - (step >> 1), mag)
        b0 = mag >= step >> 2
        nib = (
            np.where(sign, 8, 0) | np.where(b2, 4, 0)
            | np.where(b1, 2, 0) | np.where(b0, 1, 0)
        )
        # reconstruct exactly as the decoder will
        diff = step >> 3
        diff += np.where(nib & 4, step, 0)
        diff += np.where(nib & 2, step >> 1, 0)
        diff += np.where(nib & 1, step >> 2, 0)
        pred = np.clip(pred + np.where(sign, -diff, diff), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[nib], 0, 88)
        out[:, t] = nib
    return out


def _ima_adpcm_decode(
    payload: bytes, channels: int, block_align: int, n_frames: int | None
) -> np.ndarray:
    """IMA-in-WAV block layout: per block, a 4-byte header per channel
    (int16 first sample, uint8 step index, reserved), then the
    channels' nibble data interleaved in 4-byte (8-nibble) groups."""
    if block_align < 4 * channels:
        raise ValueError("ADPCM block_align smaller than its headers")
    raw = np.frombuffer(payload, np.uint8)
    n_blocks = len(raw) // block_align
    if n_blocks == 0:
        return np.empty((0, channels), dtype=np.int16)
    blocks = raw[: n_blocks * block_align].reshape(n_blocks, block_align)
    head = blocks[:, : 4 * channels].reshape(n_blocks, channels, 4)
    first = (
        head[:, :, 0].astype(np.int16).astype(np.int32)
        | (head[:, :, 1].astype(np.int32) << 8)
    )
    first = ((first & 0xFFFF) ^ 0x8000) - 0x8000  # sign-extend
    index = head[:, :, 2].astype(np.int32)
    body = blocks[:, 4 * channels:]
    # de-interleave the per-channel 4-byte groups
    groups = body.reshape(n_blocks, -1, channels, 4)
    chan_bytes = groups.transpose(0, 2, 1, 3).reshape(
        n_blocks * channels, -1
    )
    nibbles = np.empty(
        (chan_bytes.shape[0], chan_bytes.shape[1] * 2), dtype=np.uint8
    )
    nibbles[:, 0::2] = chan_bytes & 0x0F
    nibbles[:, 1::2] = chan_bytes >> 4
    decoded = _ima_decode_nibbles(
        nibbles, first.reshape(-1), index.reshape(-1)
    )
    per_block = 1 + decoded.shape[1]  # header sample + nibble samples
    out = np.empty((n_blocks, channels, per_block), dtype=np.int16)
    out[:, :, 0] = first.astype(np.int16)
    out[:, :, 1:] = decoded.reshape(n_blocks, channels, -1)
    frames = out.transpose(0, 2, 1).reshape(-1, channels)
    if n_frames is not None:
        frames = frames[:n_frames]
    return frames


def ima_adpcm_encode_wav(
    samples: np.ndarray,
    sample_rate: int = 16000,
    samples_per_block: int = 505,
) -> bytes:
    """int16 samples (``(n,)`` mono or ``(n, 2)`` stereo) → complete
    IMA-ADPCM WAV bytes (fmt extension + fact chunk, canonical
    layout).  The tail block is zero-padded; the fact chunk records
    the true frame count so decode round-trips exactly."""
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n_frames, channels = x.shape
    if channels not in (1, 2):
        raise ValueError("IMA ADPCM encoder supports mono/stereo")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 8k+1")
    spb = samples_per_block
    n_blocks = max(1, -(-n_frames // spb))
    padded = np.zeros((n_blocks * spb, channels), dtype=np.int16)
    padded[:n_frames] = x
    per = padded.reshape(n_blocks, spb, channels).transpose(0, 2, 1)
    first = per[:, :, 0].reshape(-1)  # (n_blocks*channels,)
    rest = per[:, :, 1:].reshape(n_blocks * channels, spb - 1)
    # per-sequence initial index: the step closest to the first delta
    # (what reference encoders do) — restarting every block at index 0
    # costs ~40 samples of adaptation transient per block
    first_delta = np.abs(
        rest[:, 0].astype(np.int32) - first.astype(np.int32)
    ) if spb > 1 else np.zeros(n_blocks * channels, dtype=np.int32)
    index0 = np.clip(
        np.searchsorted(_IMA_STEPS, first_delta), 0, 88
    ).astype(np.int32)
    nibbles = _ima_encode_samples(rest, first.astype(np.int32), index0)
    chan_bytes = (
        nibbles[:, 0::2] | (nibbles[:, 1::2] << 4)
    ).astype(np.uint8)
    groups = chan_bytes.reshape(n_blocks, channels, -1, 4)
    body = groups.transpose(0, 2, 1, 3).reshape(n_blocks, -1)
    head = np.zeros((n_blocks, channels, 4), dtype=np.uint8)
    u = first.reshape(n_blocks, channels).astype(np.int32) & 0xFFFF
    head[:, :, 0] = u & 0xFF
    head[:, :, 1] = u >> 8
    head[:, :, 2] = index0.reshape(n_blocks, channels).astype(np.uint8)
    blocks = np.concatenate(
        [head.reshape(n_blocks, -1), body], axis=1
    )
    payload = blocks.tobytes()
    block_align = blocks.shape[1]
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM, channels, sample_rate,
        sample_rate * block_align // spb, block_align, 4,
        2, spb,  # cbSize, wSamplesPerBlock
    )
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<II", 4, n_frames)
    out += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples, sample_rate). Samples come back
    ``(n_frames,)`` mono or ``(n_frames, channels)``, dtype uint8 /
    int16 / int32 (24-bit widened) / float32 / float64."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    payload = None
    fact_frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == WAVE_FORMAT_EXTENSIBLE:
                if len(body) < 40:
                    raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE")
                # SubFormat GUID: first two bytes are the format tag
                (sub,) = struct.unpack_from("<H", body, 24)
                fmt = (sub,) + fmt[1:]
        elif cid == b"fact" and clen >= 4:
            (fact_frames,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            payload = body
    if fmt is None or payload is None:
        raise ValueError("WAV stream lacks fmt/data chunks")
    tag, channels, rate, _byte_rate, _block, bits = fmt
    if tag == WAVE_FORMAT_PCM:
        if bits == 8:
            arr = np.frombuffer(payload, np.uint8)
        elif bits == 16:
            arr = np.frombuffer(payload, "<i2")
        elif bits == 24:
            raw = np.frombuffer(payload, np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
            # sign-extend 24 -> 32 bit little-endian
            arr = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            arr = (arr << 8) >> 8
        elif bits == 32:
            arr = np.frombuffer(payload, "<i4")
        else:
            raise NotImplementedError(f"{bits}-bit PCM WAV unsupported")
    elif tag == WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            arr = np.frombuffer(payload, "<f4")
        elif bits == 64:
            arr = np.frombuffer(payload, "<f8")
        else:
            raise NotImplementedError(f"{bits}-bit float WAV unsupported")
    elif tag == WAVE_FORMAT_MULAW:
        if bits != 8:
            raise ValueError(f"{bits}-bit µ-law WAV is malformed")
        arr = ulaw_decode(np.frombuffer(payload, np.uint8))
    elif tag == WAVE_FORMAT_ALAW:
        if bits != 8:
            raise ValueError(f"{bits}-bit A-law WAV is malformed")
        arr = alaw_decode(np.frombuffer(payload, np.uint8))
    elif tag == WAVE_FORMAT_IMA_ADPCM:
        if channels < 1:
            raise ValueError("WAV with zero channels")
        frames = _ima_adpcm_decode(payload, channels, _block, fact_frames)
        if channels == 1:
            return frames.reshape(-1), int(rate)
        return frames, int(rate)
    else:
        raise NotImplementedError(
            f"WAV format tag 0x{tag:04x} (perceptual codec) needs "
            "real audio libs"
        )
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if channels > 1:
        arr = arr[: len(arr) - len(arr) % channels].reshape(-1, channels)
    return arr, int(rate)


def wav_from_raw(
    tag: int,
    payload: bytes,
    sample_rate: int,
    channels: int = 1,
    bits: int = 8,
    block_align: int | None = None,
    fact_frames: int | None = None,
) -> bytes:
    """Assemble a WAV around an already-encoded ``payload`` — the
    fixture/oracle seam: a driver query can pin the compressed BYTES
    to a formula and let the SQL oracle replay the decoder's integer
    arithmetic on the same formula."""
    block = block_align if block_align else channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate,
        sample_rate * max(1, block), block, bits,
    )
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if fact_frames is not None:
        out += b"fact" + struct.pack("<II", 4, fact_frames)
    out += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000, codec: str = "auto"
) -> bytes:
    """Encode samples — ``(n,)`` mono or ``(n, channels)`` — as a
    canonical WAV.  ``codec="auto"`` picks PCM-16 for int16 input and
    float32 for float32; ``"ulaw"``/``"alaw"`` write G.711 log-PCM
    from int16 input; ``"ima_adpcm"`` delegates to
    :func:`ima_adpcm_encode_wav`."""
    samples = np.asarray(samples)
    if codec == "ima_adpcm":
        return ima_adpcm_encode_wav(samples, sample_rate)
    if codec in ("ulaw", "alaw"):
        if samples.dtype != np.int16:
            raise ValueError(f"{codec} encoding expects int16 samples")
        tag = WAVE_FORMAT_MULAW if codec == "ulaw" else WAVE_FORMAT_ALAW
        bits = 8
        enc = ulaw_encode if codec == "ulaw" else alaw_encode
        payload = enc(samples).tobytes()
    elif codec != "auto":
        raise ValueError(f"unknown wav codec {codec!r}")
    elif samples.dtype == np.int16:
        tag, bits = WAVE_FORMAT_PCM, 16
        payload = samples.astype("<i2").tobytes()
    elif samples.dtype == np.float32:
        tag, bits = WAVE_FORMAT_IEEE_FLOAT, 32
        payload = samples.astype("<f4").tobytes()
    else:
        raise ValueError("wav_encode expects int16 or float32 samples")
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, sample_rate * block, block, bits
    )
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out
