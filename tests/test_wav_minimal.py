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
    struct.pack_into("<H", blob, 20, 0x0055)  # MP3 tag: perceptual gate
    with pytest.raises(NotImplementedError, match="0x0055"):
        wav_decode(bytes(blob))
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"not a wav at all")


# ---------------------------------------------------------------------------
# G.711 µ-law / A-law
# ---------------------------------------------------------------------------


def test_g711_involution_all_codes():
    """encode(decode(code)) == code for every code — the canonical
    G.711 table check.  µ-law's one exception is 0x7F (negative zero):
    it decodes to 0, which re-encodes to the positive-zero code."""
    from ome_arrow_spark.sources.wav_minimal import (
        alaw_decode, alaw_encode, ulaw_decode, ulaw_encode,
    )

    codes = np.arange(256, dtype=np.uint8)
    u = ulaw_encode(ulaw_decode(codes))
    assert np.array_equal(np.nonzero(u != codes)[0], [0x7F])
    assert ulaw_decode(np.array([0x7F], np.uint8))[0] == 0
    assert np.array_equal(alaw_encode(alaw_decode(codes)), codes)


@pytest.mark.parametrize("codec", ["ulaw", "alaw"])
def test_g711_wav_roundtrip_quantization(codec):
    x = ((np.arange(2000) * 37) % 20000 - 10000).astype(np.int16)
    arr, sr = wav_decode(wav_encode(x, 8000, codec=codec))
    assert sr == 8000 and arr.dtype == np.int16 and len(arr) == 2000
    err = np.abs(arr.astype(np.int32) - x.astype(np.int32))
    # log-PCM quantization: error bounded by half the largest step
    assert err.max() <= 1024
    snr = 10 * np.log10(
        (x.astype(np.float64) ** 2).mean()
        / ((arr - x).astype(np.float64) ** 2).mean()
    )
    assert snr > 30  # G.711 delivers ~37 dB on this signal


def test_g711_stereo_and_sign_extremes():
    from ome_arrow_spark.sources.wav_minimal import ulaw_decode, ulaw_encode

    ext = np.array([-32768, -1, 0, 1, 32767], np.int16)
    dec = ulaw_decode(ulaw_encode(ext))
    assert dec[0] < -30000 and dec[-1] > 30000 and dec[2] == 0
    st = np.stack([ext, ext[::-1]], axis=1).astype(np.int16)
    arr, _ = wav_decode(wav_encode(st, 8000, codec="alaw"))
    assert arr.shape == (5, 2)


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM
# ---------------------------------------------------------------------------


def _scalar_ima_decode(nibs, pred, idx):
    """Independent textbook-spec scalar model (no shared code with the
    vectorized decoder beyond the published constant tables)."""
    from ome_arrow_spark.sources.wav_minimal import _IMA_INDEX, _IMA_STEPS

    steps, itab = _IMA_STEPS.tolist(), _IMA_INDEX.tolist()
    out = []
    for nib in nibs:
        step = steps[idx]
        diff = step >> 3
        if nib & 4:
            diff += step
        if nib & 2:
            diff += step >> 1
        if nib & 1:
            diff += step >> 2
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + itab[nib]))
        out.append(pred)
    return out


def test_ima_decoder_matches_scalar_model():
    from ome_arrow_spark.sources.wav_minimal import _ima_decode_nibbles

    rng = np.random.default_rng(7)
    nibs = rng.integers(0, 16, size=(6, 504), dtype=np.uint8)
    preds = rng.integers(-32768, 32768, size=6).astype(np.int32)
    idxs = rng.integers(0, 89, size=6).astype(np.int32)
    vec = _ima_decode_nibbles(nibs, preds, idxs)
    for i in range(6):
        assert vec[i].tolist() == _scalar_ima_decode(
            nibs[i].tolist(), int(preds[i]), int(idxs[i])
        )


def test_ima_adpcm_wav_roundtrip_mono_and_stereo():
    t = np.arange(4000)
    x = (8000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    arr, sr = wav_decode(wav_encode(x, 16000, codec="ima_adpcm"))
    assert sr == 16000 and arr.dtype == np.int16
    assert len(arr) == 4000  # fact chunk trims the padded tail block
    snr = 10 * np.log10(
        (x.astype(np.float64) ** 2).mean()
        / ((arr.astype(np.float64) - x) ** 2).mean()
    )
    assert snr > 30  # 4-bit ADPCM delivers ~36 dB on a sine
    other = np.roll(x, 137)
    st = np.stack([x, other], axis=1).astype(np.int16)
    arr2, _ = wav_decode(wav_encode(st, 16000, codec="ima_adpcm"))
    assert arr2.shape == (4000, 2)
    # channels carry independent state: each equals its mono decode
    assert np.array_equal(arr2[:, 0], arr)
    mono_other, _ = wav_decode(wav_encode(other, 16000, codec="ima_adpcm"))
    assert np.array_equal(arr2[:, 1], mono_other)


def test_ima_adpcm_block_boundaries_and_first_sample():
    """The first sample of every block is carried verbatim in the
    block header, so it decodes exactly."""
    from ome_arrow_spark.sources.wav_minimal import ima_adpcm_encode_wav

    rng = np.random.default_rng(11)
    x = rng.integers(-32768, 32768, size=505 * 3, dtype=np.int16)
    arr, _ = wav_decode(ima_adpcm_encode_wav(x, 8000, samples_per_block=505))
    assert len(arr) == 505 * 3
    assert np.array_equal(arr[::505], x[::505])


def test_ima_adpcm_malformed_block_align():
    from ome_arrow_spark.sources.wav_minimal import ima_adpcm_encode_wav

    blob = bytearray(ima_adpcm_encode_wav(np.zeros(100, np.int16), 8000))
    struct.pack_into("<H", blob, 32, 2)  # block_align < 4*channels
    with pytest.raises(ValueError, match="block_align"):
        wav_decode(bytes(blob))


def test_decode_media_routes_wav():
    from ome_arrow_spark.operators.multimodal import decode_media

    t = np.arange(3200)
    s = (np.sin(t / 20) * 20000).astype(np.int16)
    kind, arr, meta = decode_media(wav_encode(s, 16000))
    assert kind == "audio" and meta["sr"] == 16000 and arr.size == 3200
    stereo = np.stack([s, -s], axis=1)
    kind, arr, meta = decode_media(wav_encode(stereo, 16000))
    assert kind == "audio" and arr.ndim == 1 and arr.size == 3200  # downmixed
