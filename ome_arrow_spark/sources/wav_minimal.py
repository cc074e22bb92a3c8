"""Minimal pure-Python WAV (RIFF/WAVE) codec — stdlib ``struct`` +
numpy only.

Decoder: PCM integer 8 (unsigned) / 16 / 24 / 32-bit and IEEE float32
/ float64, mono or multi-channel, WAVE_FORMAT_EXTENSIBLE unwrapped to
its SubFormat, unknown RIFF chunks skipped (LIST/fact/cue…). Output is
``(n_frames, channels)`` (or ``(n_frames,)`` mono) in the file's
native sample type. Compressed formats (ADPCM, µ-law/A-law, MP3) raise
``NotImplementedError`` — they need real audio libs.

Encoder: PCM 16-bit (the interchange default) and float32, any
channel count.

This backs the media table's ``decode_media`` for ``audio`` blobs
(operators/multimodal.py), the same way ``jpeg_minimal``/
``png_minimal`` back ``image``.
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples, sample_rate). Samples come back
    ``(n_frames,)`` mono or ``(n_frames, channels)``, dtype uint8 /
    int16 / int32 (24-bit widened) / float32 / float64."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    payload = None
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
    else:
        raise NotImplementedError(
            f"WAV format tag 0x{tag:04x} (ADPCM/law/compressed) needs "
            "real audio libs"
        )
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if channels > 1:
        arr = arr[: len(arr) - len(arr) % channels].reshape(-1, channels)
    return arr, int(rate)


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Encode int16 PCM or float32 samples — ``(n,)`` mono or
    ``(n, channels)`` — as a canonical 44-byte-header WAV."""
    samples = np.asarray(samples)
    if samples.dtype == np.int16:
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
