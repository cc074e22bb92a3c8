"""Focused tests for the r14 direct-Arrow decode assembly
(sources/arrow_records.py): the mapInArrow ingest paths must produce
EXACTLY the rows the old pandas-object conversion produced."""

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from ome_arrow_spark.meta import ome_arrow_struct


@pytest.fixture(scope="module")
def tiff_dir(spark):
    d = tempfile.mkdtemp(prefix="t_arrowdec_")
    from ome_arrow_spark.sources.tiff import encode_ftif
    from ome_arrow_spark.sources.tiff_minimal import (
        build_ome_xml,
        encode_tiff_baseline,
    )

    side = 32
    base = (np.arange(side * side, dtype=np.int64) % 65536).reshape(
        1, 1, 1, side, side
    )
    for i in range(4):
        with open(os.path.join(d, f"i{i}.ftif"), "wb") as f:
            f.write(encode_ftif((base + i) % 65536, image_id=f"i{i}"))
    xml = build_ome_xml(
        image_id="omx", name="nm", size_t=1, size_c=1, size_z=1,
        size_y=side, size_x=side,
    )
    with open(os.path.join(d, "o0.ome.tif"), "wb") as f:
        f.write(encode_tiff_baseline(base[0, 0].astype(np.uint16), description=xml))
    return d


def _expected_rows(spark, d, glob):
    """Reference conversion: decode driver-side, build the DataFrame
    through createDataFrame (Spark's own python→Catalyst conversion) —
    the semantics the old pandas-object mapInPandas path had."""
    import glob as g

    from ome_arrow_spark.sources.tiff import _record_to_row, decode_image_bytes

    recs = []
    for p in sorted(g.glob(os.path.join(d, glob))):
        with open(p, "rb") as f:
            rec = _record_to_row(decode_image_bytes(p, f.read()))
        # createDataFrame's python verifier rejects numpy arrays; the
        # VALUES are what is under test, so list-ify for the reference
        rec["planes"] = [
            {**pl, "pixels": [int(x) for x in pl["pixels"]]}
            for pl in rec["planes"]
        ]
        recs.append(rec)
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("ome_arrow", ome_arrow_struct())])
    return spark.createDataFrame([(r,) for r in recs], schema).collect()


def _key(rows):
    return sorted(
        (
            r[0]["id"],
            r[0]["type"],
            r[0]["version"],
            r[0]["name"],
            r[0]["acquisition_datetime"],
            r[0]["masks"],
            tuple(sorted(r[0]["pixels_meta"].asDict(recursive=True).items(), key=str)),
            tuple(
                (p["z"], p["t"], p["c"], tuple(p["pixels"]))
                for p in r[0]["planes"]
            ),
        )
        for r in rows
    )


def test_ftif_decode_matches_reference_conversion(spark, tiff_dir):
    from ome_arrow_spark.sources.tiff import from_tiff_dir

    got = from_tiff_dir(spark, tiff_dir, glob="*.ftif").collect()
    want = _expected_rows(spark, tiff_dir, "*.ftif")
    assert _key(got) == _key(want)


def test_ometiff_decode_matches_reference_conversion(spark, tiff_dir):
    """Real OME-TIFF exercises name + acquisition_datetime + channel
    metadata through the Arrow assembly (timestamp unit/zone parity)."""
    from ome_arrow_spark.sources.tiff import from_tiff_dir

    got = from_tiff_dir(spark, tiff_dir, glob="*.ome.tif").collect()
    want = _expected_rows(spark, tiff_dir, "*.ome.tif")
    assert _key(got) == _key(want)


def test_empty_batch_yields_typed_empty(spark, tiff_dir):
    from ome_arrow_spark.sources.tiff import from_tiff_dir

    df = from_tiff_dir(spark, tiff_dir, glob="*.nomatch")
    assert df.count() == 0
    assert df.schema[0].dataType == ome_arrow_struct()


def test_on_error_skip_drops_bad_file(spark, tiff_dir):
    from ome_arrow_spark.sources.tiff import from_tiff_dir

    bad = os.path.join(tiff_dir, "bad.ftif")
    with open(bad, "wb") as f:
        f.write(b"not a tiff at all")
    try:
        df = from_tiff_dir(spark, tiff_dir, glob="*.ftif", on_error="skip")
        ids = sorted(r[0]["id"] for r in df.collect())
        assert ids == ["i0", "i1", "i2", "i3"]
        with pytest.raises(Exception):
            from_tiff_dir(spark, tiff_dir, glob="*.ftif", on_error="fail").collect()
    finally:
        os.remove(bad)


def test_zarr_decode_matches_reference_conversion(spark):
    from ome_arrow_spark.sources.zarr import from_zarr_manifest
    from ome_arrow_spark.sources.zarr_minimal import write_ngff_store

    d = tempfile.mkdtemp(prefix="t_arrowdec_z_")
    side = 32
    base = (np.arange(side * side, dtype=np.int64) % 65536).reshape(
        1, 1, 1, side, side
    )
    stores = []
    for i in range(2):
        store = os.path.join(d, f"s{i}.zarr")
        write_ngff_store(
            store, [((base + i) % 65536).astype("<u2")], image_id=f"s{i}",
            compressor="blosc", chunks=(1, 1, 1, 16, 16),
        )
        stores.append(store)
    df = from_zarr_manifest(spark, stores)
    rows = df.collect()
    assert sorted(r[0]["id"] for r in rows) == ["s0", "s1"]
    px = next(
        p["pixels"] for r in rows if r[0]["id"] == "s0" for p in r[0]["planes"]
    )
    assert list(px[:5]) == [0, 1, 2, 3, 4]
    assert len(px) == side * side
