"""The pure-Python CCITT fax codec (sources/ccitt_minimal.py) and its
TIFF Compression=2/3/4 integration. Correctness bar: lossless
round-trips across content styles (bilevel coding is exact), published
code-table spot checks, per-strip coder restarts, photometric
mapping, honest gates (uncompressed extension, tiles).
Reference reads these classes via BioIO/tifffile (ingest.py:321-330).
"""

from __future__ import annotations

import numpy as np
import pytest

from ome_arrow_spark.sources.ccitt_minimal import (
    BLACK_CODES,
    WHITE_CODES,
    decode_g3_1d,
    decode_g4,
    decode_mh,
    encode_g4,
    encode_mh,
)


def _styles(rng, h, w):
    yield (rng.random((h, w)) < 0.5).astype(np.uint8)          # noise
    yield np.zeros((h, w), np.uint8)                            # all white
    yield np.ones((h, w), np.uint8)                             # all black
    blocky = (rng.random((h, (w + 7) // 8)) < 0.3).astype(np.uint8)
    yield blocky.repeat(8, axis=1)[:, :w]                       # fax-like
    vert = np.zeros((h, w), np.uint8)
    vert[:, :: max(1, w // 9)] = 1
    yield vert                                                  # vertical-mode heavy


@pytest.mark.parametrize("codec", ["mh", "g4"])
def test_roundtrip_matrix(codec):
    rng = np.random.default_rng(11)
    enc, dec = (encode_mh, decode_mh) if codec == "mh" else (encode_g4, decode_g4)
    n = 0
    for h, w in [(1, 1), (3, 17), (23, 64), (40, 213)]:
        for bm in _styles(rng, h, w):
            assert np.array_equal(dec(enc(bm), w, h), bm), (codec, h, w)
            n += 1
    assert n == 20


def test_makeup_and_extended_codes():
    # runs > 63 use makeup codes; > 2560 chain extended makeups
    bm = np.zeros((2, 6000), np.uint8)
    bm[0, 100:5000] = 1
    bm[1, :] = 1
    assert np.array_equal(decode_mh(encode_mh(bm), 6000, 2), bm)
    assert np.array_equal(decode_g4(encode_g4(bm), 6000, 2), bm)


def test_published_code_table_spot_checks():
    """A handful of the best-known T.4 codes, straight from the spec
    tables — guards the tables against transcription drift."""
    assert WHITE_CODES[0] == (0b00110101, 8)
    assert WHITE_CODES[1] == (0b000111, 6)
    assert WHITE_CODES[63] == (0b00110100, 8)
    assert WHITE_CODES[64] == (0b11011, 5)
    assert WHITE_CODES[1728] == (0b010011011, 9)
    assert BLACK_CODES[0] == (0b0000110111, 10)
    assert BLACK_CODES[1] == (0b010, 3)
    assert BLACK_CODES[2] == (0b11, 2)
    assert BLACK_CODES[3] == (0b10, 2)
    assert BLACK_CODES[63] == (0b000001100111, 12)
    assert BLACK_CODES[64] == (0b0000001111, 10)


def test_mh_rows_byte_aligned():
    """Compression=2: every row starts on a byte boundary, so a
    single-row slice of the stream decodes independently."""
    rng = np.random.default_rng(3)
    bm = (rng.random((4, 50)) < 0.4).astype(np.uint8)
    blob = encode_mh(bm)
    row0 = encode_mh(bm[:1])
    assert blob[: len(row0)] == row0


def test_g3_1d_eol_delimited():
    from ome_arrow_spark.sources.ccitt_minimal import (
        _BitWriter,
        _transitions,
        _write_run,
    )

    rng = np.random.default_rng(5)
    bm = (rng.random((5, 100)) < 0.4).astype(np.uint8)
    w = _BitWriter()
    for y in range(5):
        w.write(0, 4)  # fill bits before EOL are legal
        w.write(0b000000000001, 12)
        t = _transitions(bm[y])
        pos, black, ti = 0, False, 0
        while pos < 100:
            nxt = t[ti] if ti < len(t) else 100
            _write_run(w, nxt - pos, black)
            pos, black, ti = nxt, not black, ti + 1
    w.byte_align()
    assert np.array_equal(decode_g3_1d(bytes(w.out), 100, 5), bm)


def test_corrupt_stream_raises():
    with pytest.raises(ValueError):
        decode_mh(b"\xff\xff\xff\xff", 64, 2)  # 11... is no white code
    with pytest.raises(ValueError):
        decode_g4(b"", 10, 1)


# --- TIFF integration -------------------------------------------------------


@pytest.mark.parametrize("comp", ["ccitt_g4", "ccitt_rle"])
@pytest.mark.parametrize("big_endian", [False, True])
def test_ccitt_in_tiff_roundtrip(comp, big_endian):
    from ome_arrow_spark.sources.tiff_minimal import (
        decode_tiff_pages,
        encode_tiff_baseline,
    )

    rng = np.random.default_rng(7)
    bm = (rng.random((3, 40, 61)) < 0.3).astype(np.uint8)
    blob = encode_tiff_baseline(
        bm, compression=comp, rows_per_strip=13, big_endian=big_endian
    )
    pages, _ = decode_tiff_pages(blob)
    assert pages.shape == (3, 40, 61) and np.array_equal(pages, bm)


def test_ccitt_tiff_photometric_blackiszero():
    """Photometric=1 inverts: CCITT always codes photometric-white runs
    first, so pixel value = 1 - is_black."""
    import struct

    from ome_arrow_spark.sources.tiff_minimal import (
        decode_tiff_pages,
        encode_tiff_baseline,
    )

    rng = np.random.default_rng(9)
    bm = (rng.random((1, 16, 33)) < 0.5).astype(np.uint8)
    blob = bytearray(encode_tiff_baseline(bm, compression="ccitt_g4"))
    (first,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, first)
    for i in range(n):
        base = first + 2 + 12 * i
        tag = struct.unpack_from("<H", blob, base)[0]
        if tag == 262:
            struct.pack_into("<H", blob, base + 8, 1)
    pages, _ = decode_tiff_pages(bytes(blob))
    assert np.array_equal(pages[0], 1 - bm[0])


def test_ccitt_tiff_bigtiff():
    from ome_arrow_spark.sources.tiff_minimal import (
        decode_tiff_pages,
        encode_tiff_baseline,
    )

    bm = np.zeros((2, 32, 48), np.uint8)
    bm[:, 8:24, 10:30] = 1
    blob = encode_tiff_baseline(
        bm, compression="ccitt_g4", bigtiff=True, rows_per_strip=11
    )
    pages, _ = decode_tiff_pages(blob)
    assert np.array_equal(pages, bm)


def test_ccitt_rejects_nonbilevel_and_tiles():
    from ome_arrow_spark.sources.tiff_minimal import encode_tiff_baseline

    with pytest.raises(ValueError, match="bilevel"):
        encode_tiff_baseline(
            np.full((4, 4), 7, np.uint8), compression="ccitt_g4"
        )
    with pytest.raises(NotImplementedError, match="tiled"):
        encode_tiff_baseline(
            np.zeros((16, 16), np.uint8), compression="ccitt_g4",
            tile=(16, 16),
        )


def test_g3_2d_roundtrip():
    """Group 3 2D: EOL + mode-flag bit per row, 1D anchor row every K
    rows, 2D rows against the previous line."""
    from ome_arrow_spark.sources.ccitt_minimal import (
        ccitt_decode,
        decode_g3_2d,
        encode_g3_2d,
    )

    rng = np.random.default_rng(21)
    for h, w in [(1, 7), (9, 64), (25, 131)]:
        for style in range(3):
            if style == 0:
                bm = (rng.random((h, w)) < 0.5).astype(np.uint8)
            elif style == 1:
                bm = np.zeros((h, w), np.uint8)
                bm[:, : w // 2] = 1
            else:
                blocky = (rng.random((h, (w + 7) // 8)) < 0.3).astype(np.uint8)
                bm = blocky.repeat(8, axis=1)[:, :w]
            for k in (1, 2, 4):
                blob = encode_g3_2d(bm, k=k)
                assert np.array_equal(decode_g3_2d(blob, w, h), bm), (h, w, style, k)
    # dispatch: compression=3 + T4Options bit 0 routes to the 2D decoder
    bm = (rng.random((6, 40)) < 0.4).astype(np.uint8)
    got = ccitt_decode(encode_g3_2d(bm), 40, 6, 3, t4_options=1)
    assert np.array_equal(got, bm)
