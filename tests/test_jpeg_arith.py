"""Arithmetic-coded JPEG (T.81 Annex D QM-coder + Annex F/G models,
sources/jpeg_arith.py). Three validation layers:

1. QM-coder primitives: exact encode->decode roundtrip, compression
   sanity on biased bits, byte-stuffing/carry edge cases.
2. Model integration: arithmetic (SOF9) and Huffman encodes of one
   image carry the SAME quantized coefficients, so their decodes are
   bit-identical (gray/RGB/raw-RGB/restarts/12-bit).
3. External conformance: canned fixtures ENCODED BY libjpeg (via
   tools/jpeg_interop.c, regenerable) decode to pinned pixels here;
   tests/test_jpeg_interop.py re-runs the live two-way matrix when a
   C toolchain is present.

Fixture streams below were produced by the system libjpeg
(arith_code=TRUE): SOF9 sequential gray, SOF9 RGB 4:2:0 with restart
intervals, SOF10 progressive RGB.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest

from ome_arrow_spark.sources import jpeg_arith as ja
from ome_arrow_spark.sources.jpeg_minimal import jpeg_decode, jpeg_encode

_SEQ_GRAY = (
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAMCAgMCAgMDAwMEAwMEBQgFBQQEBQoHBwYIDAoM"
    "DAsKCwsNDhIQDQ4RDgsLEBYQERMUFRUVDA8XGBYUGBIUFRT/yQALCAAgADABAREA/8wABgAQ"
    "EAX/2gAIAQEAAD8A0pGJ7+Hb8RXki1X7B4eQxctbKW6OWvQJEFnvyOZ0+vFzF5qjfnmDKQpL"
    "traE6SmZ51MzplCMidi/g+26kdoHyXU71OMZC5EjxDbLhsrg1FXu3+Dwv0zediEGh2bQjLN8"
    "5D267s8KXeDu3VvYZww7CGkf+HsZVQ8qda4HJKswQF6JJPm9RUVZDGp8lo0X8pYaCFjHdxF1"
    "UsjywHa7wtZg++AOVeicR7kB3NAc3lWTZtfZ3yYP/Bsw8VTOkj77kBddWoqeH5uwufW4izxV"
    "2bv3/tuCCTGQt88wHWkQsMIMYY94D0+lwYGFAumv7+8n91BdgVwd6sgHAAndRYUsZ/CF2x/f"
    "SF9h3nWcOqDfmlkY229UKKweR5mlhb6yKuTG2t9OFI2OjCG9B8WfflbHt3G99UIQlkFem8fA"
    "JWpLSVgL1EGl2ngolmIfJx5NqJ63WIqMGP8AOo+H32iJ714NKwDGDY58Q9cFGjzf5JrQpF9v"
    "RqS7eSRyDvF5e0KTTmnkyq8xJHCQn+P4Ts9bclqLcC4VqHzXr4omlW8lSndKFfldhxu8d6bJ"
    "6NnaucvCCarJ+PaJ6nCqlCzGDnwRMDPzKwz1ptPa/wDWICc1PqkPjsli6J4rSee4dr8si9K7"
    "maAJeGUklN2SMWJKFSqFpKbN11dPywfsee4nynvlZ9FGO/c2mm1QRba2bHB/w6c4MxNzTreq"
    "2vzHLvF9t49+iKgCSfMh4wdZOVqZcD/78M5nqMsDglcVPVr52mCfINJu+DxaYLjzB1PUANKy"
    "cjaTXo5H2h16nCK8q9NXqhyY2tg7eUKIXtCIB/y3/wDjv4h0FR72J7gy5yXfCTERthSi65dZ"
    "cfxTjoS54RVkBEBE2CfwklZqtWkJtgQfRjmE8QnSy2NAJTi9K7nBcMhiCYwJnYEQIXXKAN6Q"
    "3T2lbcnw5qiMYu/5CM/nRc7m2QHXsb2yPyNM5UXhNqFWBbKd7WFaW+/NJAOBXRP0T7um6q58"
    "nmvXdbPG7QYoBYJPwD6tEONSFAikqZIJYdJ4gTpOg7VG+4zxTy74MWgcgUCPdT1VzH/9ok8e"
    "Lnd4liTVoRzshH5obM/WJFEVgR9CeNEA8/N5rufPJSWAlghUwiWo/9k="
)
_SEQ_GRAY_SHA = "ea0c54d8c003e052618b79856538c5c4adea5af9f169cefea179d9a27f513ddd"
_SEQ_GRAY_SHAPE = (32, 48)

_SEQ_RGB_RST = (
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAIBAQEBAQIBAQECAgICAgQDAgICAgUEBAMEBgUG"
    "BgYFBgYGBwkIBgcJBwYGCAsICQoKCgoKBggLDAsKDAkKCgr/2wBDAQICAgICAgUDAwUKBwYH"
    "CgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgr/yQAR"
    "CAAoADgDASIAAhEBAxEB/8wACgAQEAUBEBEF/90ABAAE/9oADAMBAAIRAxEAPwDSrI+80q+f"
    "H5xGZj9METtNkQYMNNVDqKrmilZEhbQOanqgj0ZdR7thsZTR7ZfPQFXuatj/AK2CYiAYdB3N"
    "+AdlbZMhQ06N8xcVlJUxXVllVZThb/18rz4DgXAQUfZVuifUW1KDKNwBYzU/TWO6DqUyGtTz"
    "HWgxmEat34FqeREKibDLRBj04IeJ8CMyoVXpu3BObUvEUC8A6N3cGUhfyhzbb+OUsJtWNOr/"
    "AN2BWproWLk17vtyTrA10t5/jjjLMAfcr1+5KVJZPNbbiO7uvZ0h2u+Tmg9YAFZKGr27WBpO"
    "hXkvBb4IEzWmIS2Yf+EKrNzb1wTnEpjysgc65AJR4fX1kYELeo+cKinHl2gkgkt5Lver1OQr"
    "o41CbHivSsYEBmPtaIrNVoeVdoDr6CfVz+s2HBBCWgV3c6x+YP2bZ3gz41kCOv7JiTG3tXMP"
    "3s1JWUGVEoKeY3VsWBWyLeQit+ErasXWDDFqI9vl2dFvmrnueYYBMEQJ6YvUrGPBQ6vhryF5"
    "nNa9OLo1puQcQpvwj9dnVToJWM0U+OQzDsnGSq6gBM50701JIU7WViNyGQuS3I9oiA6ZEwC4"
    "E8/DyeChc9gfu/P/ABw343gYVgqAowtqMcm1Ap2hzKYG6OSRTYeIROWXrZt1uvxap5u8Cc3f"
    "Zc70j+F1PQWAKwivHWQtTO0koCTfIlv1MF8LvR107UZaozcakc0l8itlNZvgJw+QZdJjX5O/"
    "rc5773JbqiyFmw0OEwg6Q8B5pWKLDnsSzXjmsElJHT8j93XHotSCMze7lCSFYIyNRRPS0ZXV"
    "WpxiCeSR7UoglOAC2op4ZNmt4qf2cMkBuwdo/oJY03h4yrNETNWLk3dMmsc2ciFRp2GTq++n"
    "5EhhLa78l0ZiBEgHD0gu8UPQHe4DMP1ObDxBYgZgAzWkinW9YqA1LckHsr2zzAKX1HBCJCCT"
    "/wCGGqWCAL5KwfwuALkAWrZw1WoonLSXzUJisLIfTRB97TIe49hpAZWzXHSafCH6/9D/ALls"
    "q1rnxVDzhL0UoxrmRt1LgK+aIcx3OfK33yFi9j1q4eb7AGai+1HZI7mfSTxo+yp0G/ifydkI"
    "REpB1G+Aj0QyY1tJaTnZqo6A9I3UAv8AH5rcu9rTABperCKGNHiqbggqirLYkDGMXd2Fzxhq"
    "ilpiVj/SU+7AP21MkqxUgkC8dM63EKX8KVkxmqXvJ+hxGTUFQ1ZSffPGxrexgvqvf5/82yhv"
    "BU7HV7eR4FQPImdgPgyYtb3yVaFoLCY+yGmskwfQQtH6PbibfUpA2uQL1NzxryaMx7tjETyF"
    "Z7PRYzICpHieJRMOWmry6z1z5x+jNZXSxX/LzxJYkLVg4GH9cyW9N6C+VndgAG83h9r1ndGi"
    "fUAXqEUSHoY7rSToYgzxmJ0wtXorMOcEC9zAlB5bqyn6an2xqVc0nOr7e/QD6b1phIgZfBbP"
    "tTUK4WD8I5xTSwjyyZkcWMl1PJeCyvxnc5Y59YazOY5Dy9KyfENVwD0RCy+LIFZ081S+TD6o"
    "crrqis7AlGalzVTvL28XPI1RtAaYGWnUb0rlOeEMhtaaVNT+IJhDfSJ8UDUJv4nDBaxzIG88"
    "vnnsk9yuHtZBEfasXiSMFDspMZyPldi1vaCFR4rT68oZR+3iRbNs3KMGBTR1aVZkKQcm9J5M"
    "gm/Uu21IfHYsTL2L+CO4nDCyv2mCr/uJ7j+hbJAqowJWNVU1xd90iJjurUGx1S9gAsaWMx3z"
    "6CJ7X4L5t0ZuHZaGdkGxMBEMX0sQARVr0pSnthzCJ9Zij4h+AwI4b8VpBiOL8CnKGRgxxjSb"
    "ONr9Xe/hzYiYr0HnhXi6GcvnPYe1X+jzNFT2VCGusSsyRLi+YNbSss+SrJoHmXZ7zxaUDnbf"
    "tM0+EycGcRnbiVnPe1azDPs693/5oJoFu/s2HifAJbZBe94iLxckFNY8THuyQCX8a9KMPi7U"
    "2b2N05wioQxlYr64WkmNilqqHalByyKm/wBwfg2HkJVJzQQQAw2dWdzQbfRFV9o2HQzdWo23"
    "RXz/0dKt6DqSskqoMj+4P9By1sD7jCT0uqxYRhRRszkIOB1Du2Y/zAiTIqHUeS8MPX/Zq6dv"
    "CXt3amW+kGReBBaLS6IGpr44McHoXrr5BH17+G/Vd48kZY0PKgdm20LRvEluOhaLZikY34fl"
    "RFkTnvnAkXJrRARnQ2WehUnPx4OWpDNh/wC1GMyRx60RvOXjD2suyAOAF4WV2LeyD9/Ticca"
    "+k5o7FWHNzMlhZWC6dBUG5tpiHymhkh2h5Ciya9p0n+NAs0RuKwXRwBZOxSIAF+bsfo4TelY"
    "l2Huj+Khfq0mhHvvUdiHRrbMZryHbyBmVpx9q9LV/Fk8PvUYc71KD4w0wsilv+ajuSlBOcAY"
    "2Uqid3PLMrmN3/DE9Z+OjYXfbNV2d74qf+g61klorKcBeOKJr/I7rVcEDSPy/bKQ1pWdh2nm"
    "LdqVEpJxgy2pdBma1dngdmvh8ARKRj+GnXDOcnpjAOhYCmEpcUK1bKimuL68S4oa+PoWsUmt"
    "qQ5HQ9gf3JoFYgcLM0Insb/FZWKvN0TSyyJJxj6QdUHhi8ntS4t8B6O9L5ccxfBVWmV4CTU5"
    "InXYLOxuDR3lmmC+yLsN2K+Wz9Nqoe3VoW6CmNaPEyjU4A/wbEjuEhj/2Q=="
)
_SEQ_RGB_RST_SHA = "03eebb6eb27d4232a2adf54bbed25b099451f109fd1819de4dc1ec2b50799558"
_SEQ_RGB_RST_SHAPE = (40, 56, 3)

_PROG_RGB = (
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8LCwkMEQ8S"
    "EhEPERETFhwXExQaFRERGCEYGh0dHx8fExciJCIeJBweHx7/2wBDAQUFBQcGBw4ICA4eFBEU"
    "Hh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh7/ygAR"
    "CAAgADADASIAAhEBAxEB/8wABgAQARD/2gAMAwEAAhADEAAAAdG51ZGA3nAIgqtUDnBgb9th"
    "CGUcyurD6UMayOiiGysm/8wABBAF/9oACAEBAAEFAhWYsH3euTVqT6Of1m1HuCXjBpJseVUE"
    "K09ofWesxT7VOB0luvTUBcWfx0+pQEmEddzJT4JI1jbJ82U1myllqulWYvD/zAAEEQX/2gAI"
    "AQMBAT8BJDneFRzS+P/MAAQRBf/aAAgBAgEBPwEO02RpuLT/zAAEEAX/2gAIAQEABj8CUBlg"
    "xXn7Hk0gEdct1cyHYYJ0juOj7Z4h3U0oBsU346syNcsv0MhGjEVCfzXNdyISSV5Uu30ltTTx"
    "CCL/zAAEEAX/2gAIAQEAAT8hvCugotVUbcnciYXuTC9HHOOlr30jjKgZuOyN9otC1QyTBIDR"
    "SpNSrsy6RENTPn8wVB29RF3AT8LuWGRmQulciJ6WmCWGxCft1or2+fVpxk3VhEH/AARGNmpi"
    "ioLy5ItWgPlDnJPSXzTsMm89XqIZnUTL+Klskd8ASJ5OETGO3tOOnaB/eSw1MBP4OdvpQ+Dr"
    "7cvMgdyvx50irUF7rwh1RYqimurA/9oADAMBAAIAAwAAABDuRwS1/8wABBEF/9oACAEDAQE/"
    "EFI3MWU1ywHMp/FxAaHBCyE5VFgcvi8vzeDwukX562AESbUkZBcT4LBYK9bA/8wABBEF/9oA"
    "CAECAQE/EK8vF8RoAAFofJS+xCBq+vlcJfXciBnCYJstBipYPriUSKl4/8wABBAF/9oACAEB"
    "AAE/EOMd023FPr8oxFP7NF3JkOECgCnBKo8A8ZiHi1Sln0PmUEmK/bKLD/H/ANzBk/l+Zxyq"
    "d52ol0fcP/ZdmnPuTWINAgNgXLowMG6FZlj3dbQmrdnJZ5N3TjTMClg8zP2yJGbo131evcki"
    "QosyIMKzGLn49tO+7QUCoUckHpleILzHNC2eAzXV6E7mFYmYg2JXEwyAvjQy2S69VF/1HeUL"
    "bHcsp0N+EhHlMTSshVaPPwmSL67ZKhaAjOhngwZFz48q8Krs3MT4LKJbZoH7BrKm5pdowdGt"
    "37vGWtaM8C3BhpWdN6dmzp+uj7rJdllTMUpUcyfldhhmUWmUyjmNClHabCb2Ltyc626uAtIp"
    "dGFtwTch/9k="
)
_PROG_RGB_SHA = "20215e8155daf31f95c18f07a3c2ac772960418b0a16351291110b5df6f86364"
_PROG_RGB_SHAPE = (32, 48, 3)

def _decode_fixture(b64: str) -> np.ndarray:
    return jpeg_decode(base64.b64decode(b64))


class TestQMCoder:
    def test_roundtrip_biased_bits(self):
        rng = np.random.default_rng(1)
        for p in (0.02, 0.1, 0.5, 0.9):
            bits = (rng.random(5000) < p).astype(int).tolist()
            enc = ja.ArithEncoder()
            st = [0]
            for b in bits:
                enc.encode(st, 0, b)
            data = enc.flush()
            dec = ja.ArithDecoder(data, 0)
            st2 = [0]
            assert [dec.decode(st2, 0) for _ in bits] == bits

    def test_compression_beats_raw_on_skewed_input(self):
        rng = np.random.default_rng(2)
        bits = (rng.random(20000) < 0.1).astype(int).tolist()
        enc = ja.ArithEncoder()
        st = [0]
        for b in bits:
            enc.encode(st, 0, b)
        data = enc.flush()
        # H(0.1) = 0.469 bits/sym; the adaptive coder should land well
        # under 1 bit/sym (and nowhere near the pre-fix 26 bits/sym)
        assert 8 * len(data) / len(bits) < 0.6

    def test_fixed_bin_roundtrip(self):
        rng = np.random.default_rng(3)
        bits = (rng.random(2000) < 0.5).astype(int).tolist()
        enc = ja.ArithEncoder()
        for b in bits:
            enc.encode_fixed(b)
        dec = ja.ArithDecoder(enc.flush(), 0)
        assert [dec.decode_fixed() for _ in bits] == bits

    def test_stuffing_no_bare_ff(self):
        """Every 0xFF in the coded stream must be followed by 0x00
        (T.81 D.1.6) so framing never mistakes data for a marker."""
        rng = np.random.default_rng(4)
        for seed in range(8):
            r = np.random.default_rng(seed)
            bits = (r.random(4000) < 0.5).astype(int).tolist()
            enc = ja.ArithEncoder()
            st = [0]
            for b in bits:
                enc.encode(st, 0, b)
            data = enc.flush()
            for i, byte in enumerate(data[:-1]):
                if byte == 0xFF:
                    assert data[i + 1] == 0x00, f"bare FF at {i} (seed {seed})"

    def test_multi_bin_independence(self):
        """Interleaved contexts adapt independently and round-trip."""
        rng = np.random.default_rng(5)
        seq = [(int(rng.integers(0, 4)), int(rng.random() < 0.2))
               for _ in range(5000)]
        enc = ja.ArithEncoder()
        st = [0] * 4
        for i, b in seq:
            enc.encode(st, i, b)
        dec = ja.ArithDecoder(enc.flush(), 0)
        st2 = [0] * 4
        assert [(i, dec.decode(st2, i)) for i, _ in seq] == seq

    def test_qe_table_shape(self):
        assert len(ja.QE_TABLE) == 114  # 113 adaptive states + fixed
        for qe, nmps, nlps, sw in ja.QE_TABLE:
            assert 0 < qe <= 0x5B12
            assert 0 <= nmps <= 113 and 0 <= nlps <= 113
            assert sw in (0, 1)
        assert ja.QE_TABLE[113] == (0x5A1D, 113, 113, 0)  # self-looping


class TestSequentialArithmetic:
    def test_equals_huffman_matrix(self):
        """Arithmetic and Huffman entropy-code the SAME quantized
        coefficients -> identical decodes, stream shrinks."""
        rng = np.random.default_rng(7)
        cases = [
            (rng.integers(0, 256, (33, 47), dtype=np.uint8), {}),
            (rng.integers(0, 256, (32, 48, 3), dtype=np.uint8), {}),
            (rng.integers(0, 256, (24, 40, 3), dtype=np.uint8),
             {"color_transform": False}),
            (rng.integers(0, 256, (40, 64), dtype=np.uint8),
             {"restart_interval": 3}),
        ]
        for img, kw in cases:
            ct = kw.get("color_transform", True)
            ah = jpeg_encode(img, quality=85, arithmetic=True, **kw)
            hh = jpeg_encode(img, quality=85, **kw)
            np.testing.assert_array_equal(
                jpeg_decode(ah, color_transform=ct),
                jpeg_decode(hh, color_transform=ct),
            )

    def test_12bit_equals_huffman(self):
        rng = np.random.default_rng(8)
        img = rng.integers(0, 4096, (24, 32), dtype=np.uint16)
        ah = jpeg_encode(img, quality=85, precision=12, arithmetic=True)
        hh = jpeg_encode(img, quality=85, precision=12)
        np.testing.assert_array_equal(jpeg_decode(ah), jpeg_decode(hh))

    def test_stream_structure(self):
        """SOF9 + DAC, no DHT."""
        rng = np.random.default_rng(9)
        blob = jpeg_encode(
            rng.integers(0, 256, (16, 16), dtype=np.uint8), arithmetic=True
        )
        markers = []
        i = 2
        while blob[i + 1] != 0xDA:
            markers.append(blob[i + 1])
            i += 2 + int.from_bytes(blob[i + 2:i + 4], "big")
        assert 0xC9 in markers and 0xCC in markers
        assert 0xC4 not in markers and 0xC0 not in markers

    def test_progressive_arithmetic_encode_gated(self):
        with pytest.raises(NotImplementedError, match="progressive"):
            jpeg_encode(
                np.zeros((8, 8), dtype=np.uint8),
                progressive=True,
                arithmetic=True,
            )


class TestLibjpegFixtures:
    """Streams encoded by the system libjpeg (arith_code=TRUE) via
    tools/jpeg_interop.c; decoded pixels pinned by sha256 — entropy
    drift anywhere in the QM-coder or the F/G models breaks these."""

    @pytest.mark.parametrize(
        "b64,sha,shape",
        [
            (_SEQ_GRAY, _SEQ_GRAY_SHA, _SEQ_GRAY_SHAPE),
            (_SEQ_RGB_RST, _SEQ_RGB_RST_SHA, _SEQ_RGB_RST_SHAPE),
            (_PROG_RGB, _PROG_RGB_SHA, _PROG_RGB_SHAPE),
        ],
        ids=["seq_gray", "seq_rgb_rst4", "prog_rgb"],
    )
    def test_decode_pinned(self, b64, sha, shape):
        out = _decode_fixture(b64)
        assert out.shape == shape
        assert hashlib.sha256(out.tobytes()).hexdigest() == sha

    def test_sof11_gated(self):
        blob = bytearray(base64.b64decode(_SEQ_GRAY))
        i = 2
        while blob[i + 1] != 0xC9:
            i += 2 + int.from_bytes(blob[i + 2:i + 4], "big")
        blob[i + 1] = 0xCB  # SOF9 -> SOF11 (lossless arithmetic)
        with pytest.raises(NotImplementedError, match="lossless arithmetic"):
            jpeg_decode(bytes(blob))

    def test_bad_dac_rejected(self):
        blob = bytearray(base64.b64decode(_SEQ_GRAY))
        i = 2
        while blob[i + 1] != 0xCC:
            i += 2 + int.from_bytes(blob[i + 2:i + 4], "big")
        # DC conditioning with L > U
        blob[i + 5] = 0x01  # Cs: U=0, L=1
        with pytest.raises(ValueError, match="L > U"):
            jpeg_decode(bytes(blob))


class TestTiffIntegration:
    def test_jpeg_arith_in_tiff_matches_huffman_twin(self):
        from ome_arrow_spark.sources.tiff_minimal import (
            decode_tiff_baseline,
            encode_tiff_baseline,
        )

        rng = np.random.default_rng(11)
        vol = rng.integers(0, 256, (3, 32, 48), dtype=np.uint8)
        ta = encode_tiff_baseline(
            vol, compression="jpeg", jpeg_quality=90, rows_per_strip=16,
            jpeg_arithmetic=True,
        )
        th = encode_tiff_baseline(
            vol, compression="jpeg", jpeg_quality=90, rows_per_strip=16,
        )
        da = decode_tiff_baseline(ta)
        dh = decode_tiff_baseline(th)
        for pa, ph in zip(da, dh):
            np.testing.assert_array_equal(pa, ph)
        assert len(ta) < len(th)  # arithmetic compresses tighter
