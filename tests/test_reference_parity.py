"""Direct parity against the reference implementation itself: the
reference's pure-Python modules (transform.py slice, utils.py
describe/verify — numpy/pyarrow only) run side-by-side with our
operators on identical records. This is stronger than model-based
tests: the authoritative implementation is the oracle.

The reference package is imported read-only from /root/reference (with
a shim for its generated ``_version`` module); no reference code is
copied into this repo."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ome_arrow_spark import synth
from ome_arrow_spark.operators.describe import describe
from ome_arrow_spark.operators.slice_op import slice_images
from ome_arrow_spark.sources.ome_parquet import spark_table_from_records

ref_transform = ref_utils = None


def setup_module(module):
    global ref_transform, ref_utils
    from bench_reference import load_reference

    ref_transform, ref_utils = load_reference()


def _listify(rec):
    rec = dict(rec)
    rec["planes"] = [
        {**p, "pixels": np.asarray(p["pixels"]).tolist()} for p in rec["planes"]
    ]
    return rec


def test_describe_matches_reference_for_all_golden_shapes(spark):
    recs = [
        _listify(synth.golden_record(i, t, c, z, y, x, with_pixels=False))
        for (i, t, c, z, y, x) in synth.GOLDEN_SHAPES
    ] + [_listify(synth.conftest_record())]
    ours = {
        r["image_id"]: r
        for r in describe(spark_table_from_records(spark, recs)).collect()
    }
    for rec in recs:
        ref = ref_utils.describe_ome_arrow(rec)
        got = ours[rec["id"]]
        assert got["summary"] == ref["summary"]
        assert got["type"] == ref["type"]
        assert got["channels"] == ref["channels"]
        assert got["is_multichannel"] == ref["is_multichannel"]
        assert (
            got["size_t"], got["size_c"], got["size_z"], got["size_y"], got["size_x"]
        ) == ref["shape"]


def test_verify_matches_reference(spark):
    from ome_arrow_spark.sources.ome_parquet import unsigned_arrow_struct

    rec = _listify(synth.conftest_record())
    assert ref_utils.verify_ome_arrow(rec, unsigned_arrow_struct()) is True
    assert ref_utils.verify_ome_arrow(1, unsigned_arrow_struct()) is False
    # our schema-conformance equivalent accepts the same record
    from ome_arrow_spark.operators.describe import verify

    row = verify(spark_table_from_records(spark, [rec])).first()
    assert row["valid"] is True


CASES = [
    # (shape TCZYX, crop, keep_t, keep_c, keep_z, fill)
    ((2, 2, 2, 6, 7), (1, 5, 0, 4), None, [1], [0, 1], True),
    ((1, 3, 4, 10, 8), (0, 8, 2, 9), None, [2, 0], [3, 1], True),
    ((3, 1, 1, 5, 5), (2, 5, 1, 4), [0, 2], None, None, True),
    ((2, 2, 3, 9, 9), (4, 9, 0, 9), [1], [0, 1], [2], False),
    ((1, 1, 1, 4, 4), (0, 4, 0, 4), None, None, None, True),
]


@pytest.mark.parametrize("shape,crop,kt,kc,kz,fill", CASES)
def test_slice_matches_reference(spark, shape, crop, kt, kc, kz, fill):
    rec = _listify(synth.golden_record("p", *shape))
    x0, x1, y0, y1 = crop
    expected = ref_transform.slice_ome_arrow(
        rec, x_min=x0, x_max=x1, y_min=y0, y_max=y1,
        t_indices=kt, c_indices=kc, z_indices=kz, fill_missing=fill,
    ).as_py()

    imgs = spark_table_from_records(spark, [rec])
    got = (
        slice_images(imgs, x0, x1, y0, y1, kt, kc, kz, fill)
        .first()["ome_arrow"]
        .asDict(recursive=True)
    )
    e_pm, g_pm = expected["pixels_meta"], got["pixels_meta"]
    for k in ("size_t", "size_c", "size_z", "size_y", "size_x"):
        assert g_pm[k] == e_pm[k], k
    assert [
        (p["t"], p["c"], p["z"], p["pixels"]) for p in got["planes"]
    ] == [(p["t"], p["c"], p["z"], p["pixels"]) for p in expected["planes"]]
    # channel reindex parity: ids rewritten, names preserved
    assert [c["id"] for c in g_pm["channels"]] == [c["id"] for c in e_pm["channels"]]
    assert [c["name"] for c in g_pm["channels"]] == [c["name"] for c in e_pm["channels"]]


def test_slice_zero_fill_matches_reference(spark):
    rec = _listify(synth.golden_record("h", 1, 2, 2, 4, 4))
    rec["planes"] = [p for p in rec["planes"] if not (p["c"] == 1 and p["z"] == 0)]
    expected = ref_transform.slice_ome_arrow(
        rec, x_min=0, x_max=3, y_min=1, y_max=4, fill_missing=True
    ).as_py()
    got = (
        slice_images(spark_table_from_records(spark, [rec]), 0, 3, 1, 4)
        .first()["ome_arrow"]
        .asDict(recursive=True)
    )
    assert [
        (p["t"], p["c"], p["z"], p["pixels"]) for p in got["planes"]
    ] == [(p["t"], p["c"], p["z"], p["pixels"]) for p in expected["planes"]]
