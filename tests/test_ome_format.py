"""Format-half tests: golden describe parity, dense-plane verify,
slice vs a NumPy reference model (the reference's own test strategy,
SURVEY.md §5, strengthened to pixel-exact checks)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ome_arrow_spark import synth
from ome_arrow_spark.operators.describe import describe, spark_schema_matches, verify
from ome_arrow_spark.operators.slice_op import slice_images
from ome_arrow_spark.operators.views import channels_df, planes_df, plane_stats

# Golden summary strings asserted verbatim by the reference
# (tests/test_core.py:29,45,61,128,161,211).
GOLDEN_SUMMARIES = {
    "z-series": "3D image (z-stack), single-channel - shape (T=1, C=1, Z=5, Y=167, X=439)",
    "time-series": "movie / timelapse, single-channel - shape (T=7, C=1, Z=1, Y=167, X=439)",
    "single-channel": "2D image, single-channel - shape (T=1, C=1, Z=1, Y=167, X=439)",
    "multi-channel-4d": "4D timelapse-volume, multi-channel (3 channels) - shape (T=7, C=3, Z=5, Y=167, X=439)",
    "nviz-2ch-stack": "3D image (z-stack), multi-channel (2 channels) - shape (T=1, C=2, Z=22, Y=128, X=128)",
    "examplehuman-d0": "2D image, single-channel - shape (T=1, C=1, Z=1, Y=512, X=512)",
}

SMALL_IDS = ["z-series", "time-series", "single-channel", "img-0001"]


@pytest.fixture(scope="module")
def golden_meta(spark):
    # metadata-focused table: pixel arrays empty to keep it fast
    return synth.golden_images_df(spark, with_pixels=False).cache()


def test_schema_matches_canonical(spark, golden_meta):
    assert spark_schema_matches(golden_meta)


def test_describe_golden_strings(spark, golden_meta):
    got = {r["image_id"]: r["summary"] for r in describe(golden_meta).collect()}
    for image_id, expected in GOLDEN_SUMMARIES.items():
        assert got[image_id] == expected, image_id


def test_describe_conftest(spark, golden_meta):
    row = describe(golden_meta).filter(F.col("image_id") == "img-0001").first()
    assert row["type"] == "2D image"
    assert row["is_multichannel"] is True
    assert (row["size_t"], row["size_c"], row["size_z"], row["size_y"], row["size_x"]) == (
        1, 2, 1, 3, 4
    )


def test_verify_golden(spark):
    imgs = synth.golden_images_df(spark, ids=SMALL_IDS)
    rows = verify(imgs, strict_planes=True).collect()
    assert rows and all(r["valid"] for r in rows)


def test_verify_catches_broken_planes(spark):
    imgs = synth.golden_images_df(spark, ids=["img-0001"])
    broken = imgs.select(
        F.expr(
            "named_struct('type', ome_arrow.type, 'version', ome_arrow.version, "
            "'id', ome_arrow.id, 'name', ome_arrow.name, "
            "'acquisition_datetime', ome_arrow.acquisition_datetime, "
            "'pixels_meta', ome_arrow.pixels_meta, "
            "'planes', slice(ome_arrow.planes, 1, 1), "  # drop a plane
            "'masks', ome_arrow.masks)"
        ).alias("ome_arrow")
    )
    row = verify(broken).first()
    assert row["valid"] is False and row["planes_dense"] is False


def test_planes_channels_views(spark):
    imgs = synth.golden_images_df(spark, ids=["multi-channel-time"], include_conftest=False)
    pl = planes_df(imgs)
    assert pl.count() == 7 * 3 * 1
    ch = channels_df(imgs)
    assert ch.count() == 3
    st = plane_stats(imgs).filter((F.col("t") == 2) & (F.col("c") == 1) & (F.col("z") == 0)).first()
    arr = synth.pixel_plane(2, 1, 0, 167, 439)
    assert st["px_min"] == int(arr.min())
    assert st["px_max"] == int(arr.max())
    assert st["px_sum"] == int(arr.sum())


# ---------------------------------------------------------------------------
# Slice vs NumPy model
# ---------------------------------------------------------------------------


def numpy_slice_model(rec, x_min, x_max, y_min, y_max, kt, kc, kz, fill_missing=True):
    """Independent model of the reference slice semantics."""
    pm = rec["pixels_meta"]
    sx, sy = pm["size_x"], pm["size_y"]
    keep = lambda lst, size: sorted(set(i for i in lst if 0 <= i < size))  # noqa: E731
    kt = keep(kt, pm["size_t"]) if kt is not None else list(range(pm["size_t"]))
    kc = keep(kc, pm["size_c"]) if kc is not None else list(range(pm["size_c"]))
    kz = keep(kz, pm["size_z"]) if kz is not None else list(range(pm["size_z"]))
    by_key = {}
    for p in rec["planes"]:
        by_key[(p["t"], p["c"], p["z"])] = np.asarray(p["pixels"])
    out = []
    for t in kt:
        for c in kc:
            for z in kz:
                src = by_key.get((t, c, z))
                if src is None:
                    if not fill_missing:
                        continue
                    px = [0] * ((x_max - x_min) * (y_max - y_min))
                else:
                    px = (
                        src.reshape(sy, sx)[y_min:y_max, x_min:x_max].ravel().tolist()
                    )
                out.append((kt.index(t), kc.index(c), kz.index(z), px))
    return out, (len(kt), len(kc), len(kz))


@pytest.mark.parametrize(
    "image_id,crop,kt,kc,kz",
    [
        ("img-0001", (1, 3, 0, 2), None, None, None),
        ("img-0001", (0, 4, 0, 3), None, [1], None),
        ("nviz-2ch-single", (10, 50, 20, 60), None, [1, 0, 1, 99], None),
        ("multi-channel-z", (100, 150, 30, 90), [0], [2, 0], [4, 1, 3]),
        ("time-series", (0, 439, 0, 167), [6, 0, 3], None, None),
    ],
)
def test_slice_matches_numpy_model(spark, image_id, crop, kt, kc, kz):
    x_min, x_max, y_min, y_max = crop
    imgs = synth.golden_images_df(spark, ids=[image_id])
    sliced = slice_images(imgs, x_min, x_max, y_min, y_max, kt, kc, kz)
    got = sliced.select("ome_arrow").first()["ome_arrow"].asDict(recursive=True)

    shape = next(
        (s for s in synth.GOLDEN_SHAPES if s[0] == image_id),
        ("img-0001", 1, 2, 1, 3, 4),
    )
    rec = (
        synth.conftest_record()
        if image_id == "img-0001"
        else synth.golden_record(*shape)
    )
    # normalize numpy pixel arrays in the model input
    rec["planes"] = [
        {**p, "pixels": np.asarray(p["pixels"]).tolist()} for p in rec["planes"]
    ]
    expected, (nt, nc, nz) = numpy_slice_model(
        rec, x_min, x_max, y_min, y_max, kt, kc, kz
    )

    pm = got["pixels_meta"]
    assert (pm["size_t"], pm["size_c"], pm["size_z"]) == (nt, nc, nz)
    assert (pm["size_x"], pm["size_y"]) == (x_max - x_min, y_max - y_min)
    got_planes = [(p["t"], p["c"], p["z"], p["pixels"]) for p in got["planes"]]
    assert got_planes == expected
    # channel ids rewritten to ch-{new}
    for i, ch in enumerate(pm["channels"]):
        assert ch["id"] == f"ch-{i}"


def test_slice_zero_fill_and_drop(spark):
    imgs = synth.golden_images_df(spark, ids=["img-0001"])
    # remove the c=1 plane, then ask for both channels
    holey = imgs.select(
        F.expr(
            "named_struct('type', ome_arrow.type, 'version', ome_arrow.version, "
            "'id', ome_arrow.id, 'name', ome_arrow.name, "
            "'acquisition_datetime', ome_arrow.acquisition_datetime, "
            "'pixels_meta', ome_arrow.pixels_meta, "
            "'planes', filter(ome_arrow.planes, p -> p.c = 0), "
            "'masks', ome_arrow.masks)"
        ).alias("ome_arrow")
    )
    filled = slice_images(holey, 0, 2, 0, 2).first()["ome_arrow"]
    planes = {(p["t"], p["c"], p["z"]): p["pixels"] for p in filled["planes"]}
    assert planes[(0, 1, 0)] == [0, 0, 0, 0]
    assert planes[(0, 0, 0)] == [0, 1, 10, 11]

    dropped = slice_images(holey, 0, 2, 0, 2, fill_missing=False).first()["ome_arrow"]
    assert [(p["t"], p["c"], p["z"]) for p in dropped["planes"]] == [(0, 0, 0)]


def test_slice_bounds_validation(spark):
    imgs = synth.golden_images_df(spark, ids=["img-0001"])
    with pytest.raises(ValueError):
        slice_images(imgs, 0, 0, 0, 2)
    with pytest.raises(ValueError):
        slice_images(imgs, 0, 100, 0, 2)  # x_max beyond size_x=4
