"""Hypothesis property tests: slice vs the NumPy model on randomized
crops/keep-lists (SURVEY.md §5 test plan item d), plus UDAF and
salted-join behavior checks."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ome_arrow_spark import synth
from ome_arrow_spark.functions.udafs import image_pixel_stats
from ome_arrow_spark.operators.slice_op import slice_images
from ome_arrow_spark.operators.views import planes_df
from ome_arrow_spark.plans.tuning import salted_join
from tests.test_ome_format import numpy_slice_model

# one small image: T=2, C=2, Z=2, Y=6, X=7
_SHAPE = ("prop-img", 2, 2, 2, 6, 7)


def _maybe_keep(draw, size):
    if draw(st.booleans()):
        return None
    return draw(st.lists(st.integers(-1, size + 1), min_size=0, max_size=size + 2))


@settings(max_examples=12, deadline=None)
@given(data=st.data())
def test_slice_random_crops_match_model(spark, data):
    x0 = data.draw(st.integers(0, 5))
    x1 = data.draw(st.integers(x0 + 1, 7))
    y0 = data.draw(st.integers(0, 4))
    y1 = data.draw(st.integers(y0 + 1, 6))
    kt = _maybe_keep(data.draw, 2)
    kc = _maybe_keep(data.draw, 2)
    kz = _maybe_keep(data.draw, 2)
    fill = data.draw(st.booleans())

    rec = synth.golden_record(*_SHAPE)
    rec["planes"] = [
        {**p, "pixels": np.asarray(p["pixels"]).tolist()} for p in rec["planes"]
    ]
    expected, (nt, nc, nz) = numpy_slice_model(rec, x0, x1, y0, y1, kt, kc, kz, fill)

    from ome_arrow_spark.sources.ome_parquet import spark_table_from_records

    imgs = spark_table_from_records(spark, [synth.golden_record(*_SHAPE)])
    got = (
        slice_images(imgs, x0, x1, y0, y1, kt, kc, kz, fill)
        .first()["ome_arrow"]
        .asDict(recursive=True)
    )
    got_planes = [(p["t"], p["c"], p["z"], p["pixels"]) for p in got["planes"]]
    assert got_planes == expected
    pm = got["pixels_meta"]
    assert (pm["size_t"], pm["size_c"], pm["size_z"]) == (nt, nc, nz)


def test_pandas_udaf_pixel_stats(spark):
    imgs = synth.golden_images_df(spark, ids=["img-0001"])
    row = image_pixel_stats(planes_df(imgs)).first()
    p0 = np.arange(0, 24).reshape(2, 12)  # not exact planes; compute directly
    planes = [
        [0, 1, 2, 3, 10, 11, 12, 13, 20, 21, 22, 23],
        [100, 101, 102, 103, 110, 111, 112, 113, 120, 121, 122, 123],
    ]
    means = [np.mean(p) for p in planes]
    flat = np.concatenate(planes)
    assert row["n_planes"] == 2
    assert abs(row["mean_of_means"] - np.mean(means)) < 1e-9
    assert abs(row["px_stddev"] - flat.std()) < 1e-9


def test_salted_join_matches_plain_join(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    cust = spark.read.parquet(f"{sf_small}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(orders, cust, "o_custkey", salt_buckets=8)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
