"""Netpbm codec (sources/pnm_minimal.py) and its media-table wiring."""

from __future__ import annotations

import numpy as np
import pytest

from ome_arrow_spark.sources.pnm_minimal import pnm_decode, pnm_encode


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((9, 13), np.uint8), ((7, 5, 3), np.uint8),
        ((6, 8), np.uint16), ((4, 4, 3), np.uint16),
        ((1, 1), np.uint8),
    ],
)
def test_binary_roundtrip(shape, dtype):
    rng = np.random.default_rng(31)
    hi = 256 if dtype == np.uint8 else 65536
    img = rng.integers(0, hi, shape, dtype=dtype)
    back = pnm_decode(pnm_encode(img))
    assert back.dtype == dtype and np.array_equal(back, img)


def test_ascii_variants_and_comments():
    a = b"P2 # comment\n# another\n 3 2 255\n1 2 3\n4 5 6\n"
    assert np.array_equal(
        pnm_decode(a), np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    )
    a3 = b"P3\n2 1 255\n255 0 0  0 255 0\n"
    assert np.array_equal(
        pnm_decode(a3), np.array([[[255, 0, 0], [0, 255, 0]]], np.uint8)
    )
    # 16-bit ASCII
    a16 = b"P2\n2 1 65535\n0 40000\n"
    got = pnm_decode(a16)
    assert got.dtype == np.uint16 and list(got[0]) == [0, 40000]


def test_decode_contract_only_valueerror():
    rng = np.random.default_rng(32)
    good = pnm_encode(rng.integers(0, 256, (5, 7, 3), np.uint8))
    for n in range(len(good)):
        try:
            pnm_decode(good[:n])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(1500):
        b = bytearray(good)
        for _ in range(rng.integers(1, 4)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            pnm_decode(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_bitmap_variants_gate():
    with pytest.raises(NotImplementedError, match="P1/P4"):
        pnm_decode(b"P4\n8 8\n" + b"\x00" * 8)
    with pytest.raises(ValueError):
        pnm_decode(b"P9\n1 1 255\n\x00")


def test_sample_above_maxval_rejected():
    with pytest.raises(ValueError, match="maxval"):
        pnm_decode(b"P2\n1 1 100\n120\n")


def test_decode_media_dispatch(spark):
    from ome_arrow_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(33)
    rgb = rng.integers(0, 256, (6, 9, 3), np.uint8)
    kind, arr, meta = decode_media(pnm_encode(rgb))
    assert kind == "image" and meta["format"] == "pnm"
    assert np.array_equal(arr, rgb)
    gray16 = rng.integers(0, 65536, (4, 5), np.uint16)
    kind2, arr2, _ = decode_media(pnm_encode(gray16))
    assert kind2 == "image" and arr2.shape == (4, 5, 3)
    assert np.array_equal(arr2[..., 0], (gray16 >> 8).astype(np.uint8))


def test_pnm_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
        st.sampled_from([(np.uint8, 256), (np.uint16, 65536)]),
        st.booleans(),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(h, w, dt_hi, rgb, seed):
        dt, hi = dt_hi
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        img = rng.integers(0, hi, shape, dtype=dt)
        back = pnm_decode(pnm_encode(img))
        assert back.dtype == dt and np.array_equal(back, img)

    check()
