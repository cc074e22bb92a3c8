"""asof_join tolerance semantics (pandas merge_asof parity)."""

from __future__ import annotations

import datetime as dt

from ome_arrow_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-10 00:00:00"), "a"),  # match 3 days back: in
            (1, _ts("2024-01-30 00:00:00"), "b"),  # match 23 days back: out
            (2, _ts("2024-01-05 00:00:00"), "c"),  # no right row at all
        ],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-07 00:00:00"), 100.0)],
        "k long, rt timestamp, px double",
    )
    out = {
        r["tag"]: r["px"]
        for r in asof_join(
            left, right,
            left_on="k", right_on="k",
            left_time="t", right_time="rt",
            right_values=["px"],
            keep=["tag"],
            tolerance_seconds=7 * 24 * 3600,
        ).collect()
    }
    assert out == {"a": 100.0, "b": None, "c": None}


def test_no_tolerance_keeps_any_backward_match(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-06-01 00:00:00"), "x")],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2020-01-01 00:00:00"), 5.0)],
        "k long, rt timestamp, px double",
    )
    row = asof_join(
        left, right,
        left_on="k", right_on="k",
        left_time="t", right_time="rt",
        right_values=["px"], keep=["tag"],
    ).collect()[0]
    assert row["px"] == 5.0
