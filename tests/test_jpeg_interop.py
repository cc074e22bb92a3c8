"""Live two-way interoperability matrix between the pure-Python JPEG
codec and the SYSTEM libjpeg, driven through tools/jpeg_interop.c
(compiled on demand).  Skipped cleanly when gcc or the libjpeg dev
headers are absent — the canned-fixture tests in test_jpeg_arith.py
carry the pinned evidence in that case.

Decode direction: libjpeg encodes (Huffman AND arithmetic, sequential
AND progressive, gray/RGB/4:2:0/restarts/odd sizes) → our decoder's
quantized coefficients must match libjpeg's own entropy decode
(jpeg_read_coefficients) EXACTLY — no IDCT/upsampling tolerance in the
comparison, this is an entropy-layer bit check.

Encode direction: our arithmetic encoder re-codes libjpeg's own
coefficients and must reproduce libjpeg's entropy segment BYTE FOR
BYTE (same models, same conditioning, same termination); and libjpeg
must decode streams produced by jpeg_encode(arithmetic=True).
"""

from __future__ import annotations

import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

import ome_arrow_spark.sources.jpeg_minimal as jm
from ome_arrow_spark.sources import jpeg_arith as ja
from ome_arrow_spark.sources.jpeg_minimal import ZIGZAG, jpeg_encode

_SRC = Path(__file__).resolve().parent.parent / "tools" / "jpeg_interop.c"


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("gcc") is None:
        pytest.skip("gcc not available")
    exe = tmp_path_factory.mktemp("jpeg_interop") / "jpeg_interop"
    build = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), str(_SRC), "-ljpeg"],
        capture_output=True,
    )
    if build.returncode != 0:
        pytest.skip(f"libjpeg dev environment absent: {build.stderr[:200]!r}")
    return str(exe)


def _libjpeg_enc(oracle, img, quality, arith, progressive, rsti=0):
    h, w = img.shape[:2]
    nc = 1 if img.ndim == 2 else img.shape[2]
    cp = subprocess.run(
        [oracle, "enc", str(w), str(h), str(nc), str(quality),
         str(int(arith)), str(int(progressive)), str(rsti)],
        input=np.ascontiguousarray(img).tobytes(),
        capture_output=True,
    )
    assert cp.returncode == 0, cp.stderr.decode()
    return cp.stdout


def _libjpeg_coefs(oracle, data):
    cp = subprocess.run([oracle, "coef"], input=data, capture_output=True)
    assert cp.returncode == 0, cp.stderr.decode()
    lines = cp.stdout.decode().splitlines()
    comps = {}
    i = 0
    while i < len(lines):
        _, ci, bh, bw = lines[i].split()
        ci, bh, bw = int(ci), int(bh), int(bw)
        blocks = [list(map(int, ln.split())) for ln in lines[i + 1:i + 1 + bh * bw]]
        comps[ci] = (bh, bw, blocks)
        i += 1 + bh * bw
    return comps


def _our_coefs(data):
    """Entropy-decode with jpeg_minimal, capturing the quantized
    coefficient blocks before IDCT."""
    cap = {}
    orig = jm._idct_assemble

    def spy(state, frame, coef_lists, origins, color_transform):
        cap["c"], cap["o"], cap["f"] = coef_lists, origins, frame
        return orig(state, frame, coef_lists, origins, color_transform)

    jm._idct_assemble = spy
    try:
        jm.jpeg_decode(data)
    finally:
        jm._idct_assemble = orig
    return cap


def _entropy_segment(data):
    i = 2
    while True:
        m = data[i + 1]
        (ln,) = struct.unpack_from(">H", data, i + 2)
        if m == 0xDA:
            return data[i + 2 + ln:-2]
        i += 2 + ln


def _test_image(w, h, nc, seed=42):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 80 * np.sin(xx / 7.0) * np.cos(yy / 5.0)).astype(np.float64)
    img = np.clip(base[..., None] + rng.normal(0, 25, (h, w, nc)), 0, 255)
    img = img.astype(np.uint8)
    return img[..., 0] if nc == 1 else img


def _assert_coefs_match(data):
    """Our entropy decode == libjpeg's, block-exact, every component."""
    cap = _our_coefs(data)
    return cap


@pytest.mark.parametrize(
    "w,h,nc,q,arith,prog,rsti",
    [
        (48, 32, 1, 90, 1, 0, 0),
        (33, 17, 1, 75, 1, 0, 0),
        (48, 32, 3, 90, 1, 0, 0),   # 4:2:0
        (56, 40, 3, 95, 1, 0, 4),   # restarts
        (48, 32, 1, 85, 1, 1, 0),   # progressive arithmetic
        (48, 32, 3, 85, 1, 1, 0),
        (64, 48, 3, 60, 1, 1, 3),   # progressive arithmetic + restarts
        (8, 8, 1, 50, 1, 0, 0),
        (17, 9, 3, 90, 1, 0, 0),
        (48, 32, 3, 90, 0, 1, 0),   # Huffman progressive (regression)
        (56, 40, 3, 90, 0, 0, 5),   # Huffman sequential + restarts
    ],
    ids=[
        "a-seq-gray", "a-seq-gray-odd", "a-seq-rgb420", "a-seq-rgb-rst",
        "a-prog-gray", "a-prog-rgb", "a-prog-rgb-rst", "a-seq-tiny",
        "a-seq-rgb-odd", "h-prog-rgb", "h-seq-rgb-rst",
    ],
)
def test_decode_matches_libjpeg_coefficients(oracle, w, h, nc, q, arith,
                                             prog, rsti):
    img = _test_image(w, h, nc)
    data = _libjpeg_enc(oracle, img, q, arith, prog, rsti)
    ref = _libjpeg_coefs(oracle, data)
    cap = _our_coefs(data)
    _, _, comps, _ = cap["f"]
    zz = ZIGZAG
    for idx, (cid, _ch, _cv, _tq) in enumerate(comps):
        bh, bw, rblocks = ref[idx]
        grid = {
            (oy // 8, ox // 8): blk
            for blk, (oy, ox) in zip(cap["c"][cid], cap["o"][cid])
        }
        for by in range(bh):
            for bx in range(bw):
                r = rblocks[by * bw + bx]
                rz = [r[zz[k]] for k in range(64)]
                assert list(grid[(by, bx)]) == rz, (
                    f"comp {cid} block ({by},{bx}) differs"
                )


def test_encoder_byte_exact_vs_libjpeg(oracle):
    """Re-encoding libjpeg's own coefficients with our QM models must
    reproduce libjpeg's entropy segment byte for byte."""
    img = _test_image(48, 32, 1, seed=7)
    data = _libjpeg_enc(oracle, img, 90, arith=1, progressive=0)
    ent = _entropy_segment(data)
    (_, _, rblocks), = _libjpeg_coefs(oracle, data).values()
    zz = ZIGZAG
    enc = ja.ArithEncoder()
    dstats = ja._new_dc_stats()
    astats = ja._new_ac_stats()
    ctx = {1: 0}
    last = 0
    for r in rblocks:
        rz = [r[zz[k]] for k in range(64)]
        ja.encode_dc_diff(enc, dstats, ctx, 1, rz[0] - last, 0, 1)
        last = rz[0]
        ja.encode_ac_coefs(enc, astats, rz, 1, 63, 5)
    assert enc.flush() == bytes(ent)


@pytest.mark.parametrize("nc,rsti", [(1, 0), (3, 0), (1, 3)],
                         ids=["gray", "rgb444", "gray-rst"])
def test_libjpeg_decodes_our_arithmetic_streams(oracle, nc, rsti):
    """Cross direction: jpeg_encode(arithmetic=True) streams must be
    readable by libjpeg, agreeing with our own decode up to IDCT /
    color-convert rounding (the entropy layers agree exactly — proven
    coefficient-wise above; pixels differ by libjpeg's integer IDCT)."""
    img = _test_image(40, 24, nc, seed=11)
    blob = jpeg_encode(img, quality=90, arithmetic=True,
                       restart_interval=rsti)
    cp = subprocess.run([oracle, "dec"], input=blob, capture_output=True)
    assert cp.returncode == 0, cp.stderr.decode()
    hdr, _, raw = cp.stdout.partition(b"\n")
    w, h, got_nc = map(int, hdr.split())
    assert (w, h, got_nc) == (40, 24, nc)
    lj = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, got_nc).squeeze()
    ours = jm.jpeg_decode(blob)
    assert int(np.abs(lj.astype(int) - ours.astype(int)).max()) <= 2


@pytest.mark.heavy
@pytest.mark.parametrize(
    "spp,photo,sub,nstrips",
    [(1, 1, None, 2), (3, 6, (1, 1), 1), (3, 6, (2, 2), 1)],
    ids=["gray-2strip", "ycbcr-444", "ycbcr-420"],
)
def test_old_style_tiff_streams_match_libjpeg(oracle, spp, photo, sub,
                                              nstrips):
    """Old-style JPEG (TIFF Compression=6, table-fragment layout):
    the interchange streams old_style_strip_streams SYNTHESIZES from
    the 519/520/521 fragments must (a) be valid JPEG per libjpeg and
    (b) entropy-decode to the SAME quantized coefficient blocks in
    libjpeg and in jpeg_minimal — closing the cross-decoder loop for
    the r9 old-style path the way baseline/progressive are closed
    (VERDICT r9 'Next round' #7; previously fixture-tested only
    against this repo's own encoder)."""
    from test_tiff_minimal import _build_fragment_tiff

    from ome_arrow_spark.sources.jpeg_minimal import jpeg_encode_subsampled
    from ome_arrow_spark.sources.tiff_minimal import (
        _read_ifd_entries,
        old_style_strip_streams,
    )

    h, w = 32, 40
    img = _test_image(w, h, 1 if spp == 1 else 3, seed=23)
    rps = h // nstrips
    if spp == 1:
        strips = [img[i * rps:(i + 1) * rps] for i in range(nstrips)]
        streams = [jpeg_encode(s, quality=85) for s in strips]
    elif sub == (2, 2):
        streams = [jpeg_encode_subsampled(img, quality=85, subsampling="420")]
    else:
        streams = [jpeg_encode(img, quality=85)]
    blob = _build_fragment_tiff(
        streams, width=w, height=h, rows_per_strip=rps if spp == 1 else h,
        spp=spp, photo=photo, subsampling=sub,
    )
    (first_ifd,) = struct.unpack_from("<I", blob, 4)
    tags, _ = _read_ifd_entries(blob, "<", first_ifd)
    synth = old_style_strip_streams(blob, tags, w, h, photo, spp)
    assert len(synth) == nstrips
    zz = ZIGZAG
    for stream, _rows in synth:
        ref = _libjpeg_coefs(oracle, stream)  # also proves validity
        cap = _our_coefs(stream)
        _, _, comps, _ = cap["f"]
        for idx, (cid, _ch, _cv, _tq) in enumerate(comps):
            bh, bw, rblocks = ref[idx]
            grid = {
                (oy // 8, ox // 8): blk
                for blk, (oy, ox) in zip(cap["c"][cid], cap["o"][cid])
            }
            for by in range(bh):
                for bx in range(bw):
                    r = rblocks[by * bw + bx]
                    rz = [r[zz[k]] for k in range(64)]
                    assert list(grid[(by, bx)]) == rz, (
                        f"old-style comp {cid} block ({by},{bx}) differs"
                    )
