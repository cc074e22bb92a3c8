"""The pure-Python baseline JPEG codec (sources/jpeg_minimal.py) and
its TIFF Compression=7 integration. Correctness bar: encode→decode is
bounded-error (JPEG is lossy by design), q100 on smooth data is within
±2 levels, and streams are structurally valid baseline JPEG that any
external reader opens (SOI/DQT/SOF0/DHT/SOS/EOI with explicit tables).
Reference reads this class via BioIO/tifffile (ingest.py:321-330)."""

from __future__ import annotations

import numpy as np
import pytest

from ome_arrow_spark.sources.jpeg_minimal import (
    JpegTables,
    jpeg_decode,
    jpeg_encode,
    parse_tables,
)


def _smooth(h, w):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return ((np.sin(yy / 7) + np.cos(xx / 9)) * 60 + 128).astype(np.uint8)


def test_gray_q100_near_exact():
    img = _smooth(40, 52)
    dec = jpeg_decode(jpeg_encode(img, quality=100))
    assert dec.shape == (40, 52) and dec.dtype == np.uint8
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_rgb_q100_near_exact():
    g = _smooth(24, 31)
    img = np.stack([g, 255 - g, np.roll(g, 5, axis=1)], axis=-1)
    dec = jpeg_decode(jpeg_encode(img, quality=100))
    assert dec.shape == (24, 31, 3)
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


@pytest.mark.parametrize("quality", [50, 90])
def test_noisy_bounded_error(quality):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(33, 41), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=quality))
    err = np.abs(dec.astype(int) - img.astype(int))
    # lossy, but the reconstruction must track the signal
    assert float(err.mean()) < (10 if quality >= 90 else 40)


def test_stream_structure():
    blob = jpeg_encode(_smooth(16, 16), quality=90)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    markers = set()
    i = 2
    while i < len(blob) - 2:
        assert blob[i] == 0xFF
        m = blob[i + 1]
        markers.add(m)
        if m == 0xDA:
            break
        seglen = int.from_bytes(blob[i + 2 : i + 4], "big")
        i += 2 + seglen
    assert {0xDB, 0xC0, 0xC4, 0xDA} <= markers  # DQT, SOF0, DHT, SOS


def test_abbreviated_stream_with_external_tables():
    """TIFF JPEGTables pattern: tables-only stream parsed once, then a
    scan-only stream decoded against that state."""
    img = _smooth(16, 24)
    full = jpeg_encode(img, quality=95)
    # split: tables (DQT/DHT) → tables stream; rest → abbreviated scan
    i = 2
    tables = bytearray(b"\xff\xd8")
    scan = bytearray(b"\xff\xd8")
    while i < len(full) - 2:
        m = full[i + 1]
        if m == 0xDA:
            scan.extend(full[i:-2])
            break
        seglen = int.from_bytes(full[i + 2 : i + 4], "big")
        seg = full[i : i + 2 + seglen]
        (tables if m in (0xDB, 0xC4) else scan).extend(seg)
        i += 2 + seglen
    tables.extend(b"\xff\xd9")
    scan.extend(b"\xff\xd9")
    state = parse_tables(bytes(tables))
    dec = jpeg_decode(bytes(scan), state)
    ref = jpeg_decode(full)
    np.testing.assert_array_equal(dec, ref)
    # tables-only stream must reject a scan
    with pytest.raises(ValueError, match="scan"):
        parse_tables(full)


def test_hierarchical_coding_rejected():
    """Sequential/progressive arithmetic (SOF9/SOF10) now decode
    (test_jpeg_arith.py); the hierarchical/differential frame types
    still gate honestly."""
    blob = bytearray(jpeg_encode(_smooth(8, 8)))
    i = 2
    while blob[i + 1] != 0xC0:
        i += 2 + int.from_bytes(blob[i + 2 : i + 4], "big")
    blob[i + 1] = 0xC5  # SOF0 → SOF5 (differential sequential)
    with pytest.raises(NotImplementedError, match="differential"):
        jpeg_decode(bytes(blob))


def test_decoder_state_isolation():
    """Sharing a JpegTables across decodes must not be required —
    per-stream tables win."""
    a = jpeg_decode(jpeg_encode(_smooth(8, 8), quality=30), JpegTables())
    b = jpeg_decode(jpeg_encode(_smooth(8, 8), quality=100), JpegTables())
    assert a.shape == b.shape == (8, 8)


def test_420_subsampled_decode():
    """The decoder's chroma-subsampling path: hand-assemble a 4:2:0
    stream (MCU = 4 Y blocks + 1 Cb + 1 Cr, chroma at half resolution)
    from the module's own primitives and check the luma reconstructs
    and chroma upsamples to a bounded error."""
    import struct

    from ome_arrow_spark.sources.jpeg_minimal import (
        _AC_LUMA,
        _DC_LUMA,
        _BitWriter,
        _build_encode_table,
        _fdct,
        _magnitude,
        ZIGZAG,
    )

    h = w = 16
    g = _smooth(h, w)
    rgb = np.stack([g, g, g], axis=-1)  # gray-in-RGB → flat chroma (128)
    y = g.astype(np.float64)
    cb = np.full((h // 2, w // 2), 128.0)
    cr = np.full((h // 2, w // 2), 128.0)

    quant = np.ones(64, dtype=np.int32)
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0]) + bytes(quant[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += struct.pack(">BBB", 1, 0x22, 0)  # Y: 2x2 sampling
    sof += struct.pack(">BBB", 2, 0x11, 0)
    sof += struct.pack(">BBB", 3, 0x11, 0)
    seg(0xC0, sof)
    bits_, vals_ = _DC_LUMA
    seg(0xC4, bytes([0x00] + bits_) + bytes(vals_))
    bits_, vals_ = _AC_LUMA
    seg(0xC4, bytes([0x10] + bits_) + bytes(vals_))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    enc_dc = _build_encode_table(*_DC_LUMA)
    enc_ac = _build_encode_table(*_AC_LUMA)
    wtr = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}

    def put_block(cid, block):
        zz = np.rint(_fdct((block - 128.0).reshape(1, 8, 8))[0].reshape(64))
        zz = zz.astype(np.int32)[ZIGZAG]
        diff = int(zz[0]) - pred[cid]
        pred[cid] = int(zz[0])
        t, b = _magnitude(diff)
        code, ln = enc_dc[t]
        wtr.write(code, ln)
        if t:
            wtr.write(b, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[0xF0]
                wtr.write(code, ln)
                run -= 16
            t, b = _magnitude(v)
            code, ln = enc_ac[(run << 4) | t]
            wtr.write(code, ln)
            wtr.write(b, t)
            run = 0
        if run:
            code, ln = enc_ac[0x00]
            wtr.write(code, ln)

    # one MCU covers the whole 16x16: 4 Y blocks then Cb, Cr
    for by in range(2):
        for bx in range(2):
            put_block(1, y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
    put_block(2, cb)
    put_block(3, cr)
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")

    dec = jpeg_decode(bytes(out))
    assert dec.shape == (16, 16, 3)
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert int(err.max()) <= 3


# --- TIFF integration -------------------------------------------------------


@pytest.mark.parametrize("layout", ["strips", "tiled"])
@pytest.mark.parametrize("rgb", [False, True])
def test_jpeg_in_tiff_roundtrip(layout, rgb):
    """Compression=7 TIFF: every strip/tile is an independent baseline
    JPEG stream; multi-page, bounded reconstruction error."""
    from ome_arrow_spark.sources.tiff_minimal import (
        decode_tiff_baseline,
        encode_tiff_baseline,
    )

    g0, g1 = _smooth(21, 37), _smooth(21, 37).T[:21, :37]
    if rgb:
        vol = np.stack(
            [np.stack([g, 255 - g, np.roll(g, 3, axis=0)], axis=-1)
             for g in (g0, np.roll(g0, 7, axis=1))]
        )
    else:
        vol = np.stack([g0, np.roll(g0, 7, axis=1)])
    kw = {"tile": (16, 16)} if layout == "tiled" else {"rows_per_strip": 8}
    blob = encode_tiff_baseline(vol, compression="jpeg", jpeg_quality=100, **kw)
    back = decode_tiff_baseline(blob)
    if rgb:
        got = np.stack([back[0, s] for s in range(3)], axis=-1)
    else:
        got = back[0, 0]
    assert got.shape == vol.shape
    assert int(np.abs(got.astype(int) - vol.astype(int)).max()) <= 3


def test_jpeg_in_tiff_rejects_uint16():
    from ome_arrow_spark.sources.tiff_minimal import encode_tiff_baseline

    with pytest.raises(ValueError, match="8-bit"):
        encode_tiff_baseline(
            np.zeros((4, 4), dtype=np.uint16), compression="jpeg"
        )


def test_restart_interval_streams_match_plain_encoding():
    """RST markers are a re-serialization of the same quantized
    coefficients (plus DC-pred resets, which are lossless): decoding a
    restart-interval stream must be bit-identical to decoding the plain
    stream of the same image. Sweeps many random images/intervals so
    some streams drain the bit buffer exactly at a restart boundary —
    the case where _fill never latches the marker and restart() must
    find it by scanning (ADVICE r5 high)."""
    rng = np.random.default_rng(123)
    checked = 0
    for trial in range(120):
        h = int(rng.integers(8, 65))
        w = int(rng.integers(8, 65))
        rgb = bool(rng.integers(0, 2))
        shape = (h, w, 3) if rgb else (h, w)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        q = int(rng.choice([35, 60, 85, 95]))
        ri = int(rng.choice([1, 2, 3, 4, 5, 7, 11]))
        plain = jpeg_decode(jpeg_encode(img, quality=q))
        restarted = jpeg_decode(
            jpeg_encode(img, quality=q, restart_interval=ri)
        )
        assert restarted.shape == plain.shape
        assert np.array_equal(restarted, plain), (
            f"trial={trial} h={h} w={w} rgb={rgb} q={q} ri={ri}: "
            f"max err {np.abs(restarted.astype(int) - plain.astype(int)).max()}"
        )
        checked += 1
    assert checked == 120


def test_restart_interval_stream_structure():
    img = _smooth(32, 32)
    data = jpeg_encode(img, quality=80, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI segment
    # 16 MCUs at ri=2 -> RST0..RST6 appear (7 markers)
    assert data.count(b"\xff\xd0") >= 1
    assert b"\xff\xd6" in data


def test_no_scan_raises_valueerror():
    # SOI + EOI only: decode must raise the documented ValueError,
    # not AssertionError
    with pytest.raises(ValueError, match="no scan"):
        jpeg_decode(b"\xff\xd8\xff\xd9")


def test_truncated_segment_raises_valueerror():
    data = bytearray(jpeg_encode(_smooth(16, 16)))
    with pytest.raises(ValueError):
        jpeg_decode(bytes(data[:3]))  # cut inside first segment header


def test_rgb_color_transform_flag():
    """color_transform=False returns raw components (Photometric=2
    RGB-colorspace JPEG-in-TIFF); with the default the same stream is
    YCbCr-converted, so the two outputs differ on colorful input."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    data = jpeg_encode(img, quality=95)
    as_ycc = jpeg_decode(data)
    raw = jpeg_decode(data, color_transform=False)
    assert raw.shape == as_ycc.shape == img.shape
    assert not np.array_equal(raw, as_ycc)


def test_jpeg_in_tiff_photometric_rgb():
    """Photometric=2 JPEG-in-TIFF (tifffile's photometric='rgb' +
    jpeg): components are raw RGB, so the decoder must skip the YCbCr
    transform (ADVICE r5 medium). Colors round-trip within JPEG error;
    decoding the same bytes as if YCbCr would be wildly off."""
    from ome_arrow_spark.sources.tiff_minimal import (
        decode_tiff_baseline,
        encode_tiff_baseline,
    )

    g = _smooth(24, 32)
    page = np.stack([g, 255 - g, np.roll(g, 5, axis=1)], axis=-1)
    vol = page[np.newaxis]
    blob = encode_tiff_baseline(
        vol, compression="jpeg", jpeg_quality=100, jpeg_photometric="rgb"
    )
    # tag 262 on the wire is 2, not 6
    from ome_arrow_spark.sources.tiff_minimal import _read_ifd_entries
    import struct as _s
    (first_off,) = _s.unpack_from("<I", blob, 4)
    tags, _ = _read_ifd_entries(blob, "<", first_off, False)
    assert tags[262] == [2]
    back = decode_tiff_baseline(blob)
    got = np.moveaxis(np.asarray(back[0][:, 0]), 0, -1)
    assert got.shape == page.shape
    assert int(np.abs(got.astype(int) - page.astype(int)).max()) <= 3


def test_jpeg_in_tiff_unknown_photometric_rejected():
    """Unexpected photometric values raise NotImplementedError so a
    tifffile-backed reader can take over instead of decoding to wrong
    colors."""
    from ome_arrow_spark.sources import tiff_minimal as tm

    g = _smooth(16, 16)
    vol = np.stack([g, 255 - g, g], axis=-1)[np.newaxis]
    blob = bytearray(
        tm.encode_tiff_baseline(vol, compression="jpeg")
    )
    # patch tag 262's value from 6 (YCbCr) to 5 (CMYK-ish, unsupported)
    import struct as _s
    (first_off,) = _s.unpack_from("<I", blob, 4)
    (n_entries,) = _s.unpack_from("<H", blob, first_off)
    for i in range(n_entries):
        base = first_off + 2 + 12 * i
        tag, typ, cnt = _s.unpack_from("<HHI", blob, base)
        if tag == 262:
            _s.pack_into("<H", blob, base + 8, 5)
    with pytest.raises(NotImplementedError, match="photometric"):
        tm.decode_tiff_baseline(bytes(blob))


# --- 12-bit extended sequential ---------------------------------------------


def test_12bit_gray_roundtrip():
    yy, xx = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    img = ((np.sin(yy / 6) + np.cos(xx / 9)) * 800 + 2048).astype(np.uint16)
    for q in (60, 75, 85):
        blob = jpeg_encode(img, quality=q, precision=12)
        dec = jpeg_decode(blob)
        assert dec.dtype == np.uint16 and dec.shape == img.shape
        # lossy, but must stay within a fraction of a percent of range
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 16
    # 12-bit streams are extended sequential: SOF1, precision byte 12
    # (T.81 B.2.2 — baseline SOF0 is defined as 8-bit only)
    sof = blob.find(b"\xff\xc1")
    assert sof > 0 and blob[sof + 4] == 12


def test_12bit_rgb_roundtrip():
    yy, xx = np.meshgrid(np.arange(32), np.arange(40), indexing="ij")
    g = ((np.sin(yy / 5) + np.cos(xx / 7)) * 700 + 2048).astype(np.uint16)
    rgb = np.stack([g, 4095 - g, np.roll(g, 5, axis=1)], axis=-1)
    dec = jpeg_decode(jpeg_encode(rgb, quality=75, precision=12))
    assert dec.dtype == np.uint16 and dec.shape == rgb.shape
    assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 40


def test_12bit_flat_is_exact():
    img = np.full((24, 24), 2048, dtype=np.uint16)
    assert np.array_equal(jpeg_decode(jpeg_encode(img, precision=12)), img)


def test_12bit_input_validation():
    with pytest.raises(ValueError, match="uint16"):
        jpeg_encode(np.zeros((8, 8), np.uint8), precision=12)
    with pytest.raises(ValueError, match="4095"):
        jpeg_encode(np.full((8, 8), 5000, np.uint16), precision=12)
    with pytest.raises(ValueError, match="precision"):
        jpeg_encode(np.zeros((8, 8), np.uint8), precision=10)


def test_12bit_sharp_high_quality_raises_not_corrupts():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 4096, size=(16, 16), dtype=np.uint16)
    with pytest.raises(ValueError, match="quality"):
        jpeg_encode(img, quality=100, precision=12)


def test_prefix_fuzz_only_valueerror_escapes():
    """Every truncation point of a valid stream must raise the
    documented ValueError/NotImplementedError contract (never
    IndexError/struct.error/KeyError), so decode_tiff_pages
    on_error="row"/"skip" isolation can catch it."""
    for ch in (1, 3):
        shape = (16, 24) if ch == 1 else (16, 24, 3)
        img = np.random.default_rng(1).integers(0, 256, shape, dtype=np.uint8)
        good = jpeg_encode(img, quality=80, restart_interval=2)
        for n in range(2, len(good)):
            try:
                jpeg_decode(good[:n])
            except (ValueError, NotImplementedError):
                pass


@pytest.mark.heavy
def test_mutation_fuzz_only_valueerror_escapes():
    """Random byte corruption must never leak KeyError /
    ZeroDivisionError / IndexError out of jpeg_decode."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    good = bytearray(jpeg_encode(img, quality=80, restart_interval=3))
    for _ in range(1500):
        b = bytearray(good)
        for _ in range(rng.integers(1, 5)):
            b[rng.integers(2, len(b))] = rng.integers(0, 256)
        try:
            jpeg_decode(bytes(b))
        except (ValueError, NotImplementedError):
            pass


class TestProgressive:
    def test_progressive_equals_baseline_matrix(self):
        """SOF2 and SOF0 carry the same quantized coefficients, so
        their decodes must be bit-identical — across gray/RGB, odd
        dims, and qualities."""
        rng = np.random.default_rng(17)
        for shape, q in [((8, 8), 90), ((17, 13), 85), ((16, 16, 3), 90),
                         ((21, 19, 3), 60), ((64, 48, 3), 80)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            base = jpeg_decode(jpeg_encode(img, quality=q))
            prog = jpeg_decode(jpeg_encode(img, quality=q, progressive=True))
            assert np.array_equal(base, prog), (shape, q)

    def test_stream_structure(self):
        img = np.random.default_rng(1).integers(0, 256, (16, 16, 3), np.uint8)
        data = jpeg_encode(img, quality=80, progressive=True)
        assert b"\xff\xc2" in data          # SOF2
        assert data.count(b"\xff\xda") == 20  # DC(2) + 3 comps x 6 AC scans

    def test_smooth_and_spiky_content(self):
        """EOB-run-heavy (smooth) and ZRL-heavy (sparse spikes)
        entropy paths both reconstruct exactly."""
        yy, xx = np.meshgrid(np.arange(40), np.arange(56), indexing="ij")
        smooth = ((np.sin(yy / 9) + np.cos(xx / 11)) * 60 + 128).astype(np.uint8)
        spiky = np.full((40, 56), 128, np.uint8)
        spiky[5, 7] = 255
        spiky[30, 50] = 0
        for img in (smooth, spiky):
            base = jpeg_decode(jpeg_encode(img, quality=70))
            prog = jpeg_decode(jpeg_encode(img, quality=70, progressive=True))
            assert np.array_equal(base, prog)

    def test_contract_fuzz(self):
        """Truncation/corruption of progressive streams leaks only the
        documented exception types."""
        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
        good = jpeg_encode(img, quality=80, progressive=True)
        for n in range(2, len(good), 3):
            try:
                jpeg_decode(good[:n])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(1200):
            b = bytearray(good)
            for _ in range(rng.integers(1, 5)):
                b[rng.integers(2, len(b))] = rng.integers(0, 256)
            try:
                jpeg_decode(bytes(b))
            except (ValueError, NotImplementedError):
                pass

    def test_encode_gates(self):
        img = np.zeros((8, 8), np.uint8)
        with pytest.raises(NotImplementedError, match="restart"):
            jpeg_encode(img, progressive=True, restart_interval=2)
        with pytest.raises(NotImplementedError, match="8-bit"):
            jpeg_encode(
                np.zeros((8, 8), np.uint16), progressive=True, precision=12
            )

    def test_decode_media_dispatch(self):
        from ome_arrow_spark.operators.multimodal import decode_media

        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, (12, 18, 3), np.uint8)
        kind, arr, meta = decode_media(
            jpeg_encode(rgb, quality=85, progressive=True)
        )
        assert kind == "image" and meta["format"] == "jpeg"
        base = jpeg_decode(jpeg_encode(rgb, quality=85))
        assert np.array_equal(arr, base)


class TestSubsampledEncode:
    def _smooth_rgb(self, h=37, w=45):
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        g = ((np.sin(yy / 7) + np.cos(xx / 9)) * 50 + 128).astype(np.uint8)
        return np.stack([g, np.roll(g, 5, 1), 255 - g], -1)

    @pytest.mark.parametrize("sub,byte", [("420", 0x22), ("422", 0x21)])
    def test_baseline_roundtrip_bounded(self, sub, byte):
        from ome_arrow_spark.sources.jpeg_minimal import (
            jpeg_encode_subsampled,
        )

        rgb = self._smooth_rgb()
        blob = jpeg_encode_subsampled(rgb, quality=90, subsampling=sub)
        i = blob.find(b"\xff\xc0")
        assert blob[i + 2 + 2 + 6 + 1] == byte  # luma sampling factors
        dec = jpeg_decode(blob)
        assert dec.shape == rgb.shape
        assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 32

    @pytest.mark.parametrize("sub", ["420", "422"])
    def test_progressive_equals_baseline_subsampled(self, sub):
        """Subsampled SOF2 == subsampled SOF0 bit-exactly — this is
        the test that drives the decoder's NON-INTERLEAVED component
        block grids (ceil(comp/8), not the MCU-padded grid) through
        odd dimensions."""
        from ome_arrow_spark.sources.jpeg_minimal import (
            jpeg_encode_subsampled,
        )

        rng = np.random.default_rng(41)
        for _ in range(6):
            h = int(rng.integers(9, 50))
            w = int(rng.integers(9, 50))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            d1 = jpeg_decode(jpeg_encode_subsampled(img, 75, sub))
            d2 = jpeg_decode(
                jpeg_encode_subsampled(img, 75, sub, progressive=True)
            )
            assert np.array_equal(d1, d2), (h, w, sub)

    def test_input_validation(self):
        from ome_arrow_spark.sources.jpeg_minimal import (
            jpeg_encode_subsampled,
        )

        with pytest.raises(ValueError, match="uint8"):
            jpeg_encode_subsampled(np.zeros((8, 8), np.uint8))
        with pytest.raises(ValueError, match="subsampling"):
            jpeg_encode_subsampled(
                np.zeros((8, 8, 3), np.uint8), subsampling="411"
            )


class TestLossless:
    @pytest.mark.parametrize(
        "shape,dtype",
        [((13, 17), np.uint8), ((16, 24, 3), np.uint8),
         ((11, 9), np.uint16), ((20, 14, 3), np.uint16), ((1, 1), np.uint8)],
    )
    @pytest.mark.parametrize("pred", [1, 4, 7])
    def test_bit_exact_roundtrip(self, shape, dtype, pred):
        from ome_arrow_spark.sources.jpeg_minimal import jpeg_encode_lossless

        rng = np.random.default_rng(51)
        hi = 256 if dtype == np.uint8 else 65536
        img = rng.integers(0, hi, shape, dtype=dtype)
        back = jpeg_decode(jpeg_encode_lossless(img, predictor=pred))
        assert back.dtype == dtype and np.array_equal(back, img)

    def test_all_predictors_agree(self):
        from ome_arrow_spark.sources.jpeg_minimal import jpeg_encode_lossless

        rng = np.random.default_rng(52)
        img = rng.integers(0, 65536, (9, 13), dtype=np.uint16)
        outs = [
            jpeg_decode(jpeg_encode_lossless(img, predictor=p))
            for p in range(1, 8)
        ]
        for o in outs:
            assert np.array_equal(o, img)

    def test_12bit_precision(self):
        from ome_arrow_spark.sources.jpeg_minimal import jpeg_encode_lossless

        rng = np.random.default_rng(53)
        img = rng.integers(0, 4096, (10, 12), dtype=np.uint16)
        back = jpeg_decode(jpeg_encode_lossless(img, precision=12))
        assert np.array_equal(back, img)
        with pytest.raises(ValueError, match="precision"):
            jpeg_encode_lossless(np.full((4, 4), 5000, np.uint16), precision=12)

    def test_contract_fuzz(self):
        from ome_arrow_spark.sources.jpeg_minimal import jpeg_encode_lossless

        rng = np.random.default_rng(54)
        img = rng.integers(0, 65536, (10, 14), dtype=np.uint16)
        good = jpeg_encode_lossless(img)
        for n in range(2, len(good), 5):
            try:
                jpeg_decode(good[:n])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(800):
            b = bytearray(good)
            for _ in range(rng.integers(1, 4)):
                b[rng.integers(2, len(b))] = rng.integers(0, 256)
            try:
                jpeg_decode(bytes(b))
            except (ValueError, NotImplementedError):
                pass

    @pytest.mark.parametrize(
        "kw",
        [{"rows_per_strip": 9}, {"tile": (16, 16)},
         {"tile": (16, 16), "bigtiff": True},
         {"rows_per_strip": 7, "big_endian": True}],
    )
    def test_tiff_uint16_exact(self, kw):
        """compression='jpeg_lossless' is the exact-fidelity carrier for
        the OME uint16 pixel model — bit-exact through every layout."""
        from ome_arrow_spark.sources.tiff_minimal import (
            decode_tiff_pages,
            encode_tiff_baseline,
        )

        rng = np.random.default_rng(61)
        vol = rng.integers(0, 65536, (3, 24, 31), dtype=np.uint16)
        blob = encode_tiff_baseline(vol, compression="jpeg_lossless", **kw)
        pages, _ = decode_tiff_pages(blob)
        assert np.array_equal(pages, vol.astype(np.int64))
