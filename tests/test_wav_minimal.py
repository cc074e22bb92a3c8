"""The pure-Python WAV codec (sources/wav_minimal.py) and its media
table integration. Correctness bar: lossless PCM round-trips, correct
RIFF chunk walking (unknown chunks skipped, word alignment), 24-bit
sign extension, extensible-format unwrapping, honest gates (ADPCM)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ome_arrow_spark.sources.wav_minimal import wav_decode, wav_encode


def test_int16_mono_roundtrip():
    rng = np.random.default_rng(3)
    s = rng.integers(-30000, 30000, size=1600, dtype=np.int16)
    arr, sr = wav_decode(wav_encode(s, 16000))
    assert sr == 16000 and arr.dtype == np.int16
    assert np.array_equal(arr, s)


def test_float32_stereo_roundtrip():
    rng = np.random.default_rng(5)
    s = (rng.random((800, 2)).astype(np.float32) * 2 - 1)
    arr, sr = wav_decode(wav_encode(s, 44100))
    assert sr == 44100 and arr.shape == (800, 2) and arr.dtype == np.float32
    assert np.array_equal(arr, s)


def test_unknown_chunks_skipped_and_word_alignment():
    s = np.arange(100, dtype=np.int16)
    blob = bytearray(wav_encode(s, 8000))
    # splice an odd-length junk chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # pad byte
    out = bytes(blob[:fmt_end]) + junk + bytes(blob[fmt_end:])
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    arr, sr = wav_decode(out)
    assert sr == 8000 and np.array_equal(arr, s)


def test_24bit_pcm_sign_extension():
    vals = np.array([0, 1, -1, 8388607, -8388608, 123456, -123456], np.int32)
    payload = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 22050, 22050 * 3, 3, 24)
    body = b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    arr, sr = wav_decode(blob)
    assert sr == 22050 and arr.dtype == np.int32
    assert np.array_equal(arr, vals)


def test_extensible_format_unwraps():
    s = np.arange(64, dtype=np.int16)
    blob = bytearray(wav_encode(s, 48000))
    # rebuild the fmt chunk as WAVE_FORMAT_EXTENSIBLE (cbSize 22)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 48000, 96000, 2, 16)
    fmt += struct.pack("<H", 22) + struct.pack("<HI", 16, 3)[:6]
    fmt += struct.pack("<H", 1) + bytes(14)  # SubFormat tag = PCM + GUID tail
    # ^ layout: cbSize, wValidBits+dwChannelMask (6 bytes), SubFormat GUID
    payload = s.astype("<i2").tobytes()
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    out = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    arr, sr = wav_decode(out)
    assert sr == 48000 and np.array_equal(arr, s)


def test_compressed_gates_and_garbage_rejected():
    s = np.zeros(16, np.int16)
    blob = bytearray(wav_encode(s, 8000))
    struct.pack_into("<H", blob, 20, 0x0011)  # IMA ADPCM tag
    with pytest.raises(NotImplementedError, match="0x0011"):
        wav_decode(bytes(blob))
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"not a wav at all")


def test_decode_media_routes_wav():
    from ome_arrow_spark.operators.multimodal import decode_media

    t = np.arange(3200)
    s = (np.sin(t / 20) * 20000).astype(np.int16)
    kind, arr, meta = decode_media(wav_encode(s, 16000))
    assert kind == "audio" and meta["sr"] == 16000 and arr.size == 3200
    stereo = np.stack([s, -s], axis=1)
    kind, arr, meta = decode_media(wav_encode(stereo, 16000))
    assert kind == "audio" and arr.ndim == 1 and arr.size == 3200  # downmixed
