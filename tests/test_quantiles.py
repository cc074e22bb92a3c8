"""Scale twins of the ntile queries (VERDICT r9 "Next round" #4):
equidepth_bucket must be BIT-EQUAL to ntile over (metric, key) — not
approximately — and its physical plan must never funnel the fact
relation through a single-partition (global-sort) window exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ome_arrow_spark.operators.quantiles import equidepth_bucket


def _ntile(df, metric, key, k, descending=False):
    order = [F.col(metric).desc() if descending else F.col(metric).asc(),
             F.col(key).asc()]
    return df.withColumn("bucket", F.ntile(k).over(Window.orderBy(*order)))


@pytest.mark.parametrize("k,descending", [(4, False), (8, False), (4, True)])
def test_equidepth_equals_ntile(spark, sf_dir, k, descending):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_totalprice", "o_orderkey"
    )
    got = {
        (r["o_orderkey"], r["bucket"])
        for r in equidepth_bucket(
            o, "o_totalprice", "o_orderkey", k, descending=descending
        ).collect()
    }
    want = {
        (r["o_orderkey"], r["bucket"])
        for r in _ntile(o, "o_totalprice", "o_orderkey", k, descending).collect()
    }
    assert got == want and len(got) > 0


def test_equidepth_duplicate_values_and_small_n(spark):
    # heavy ties (metric has 3 distinct values over 10 rows) + n < k
    rows = [(i, i % 3) for i in range(10)]
    df = spark.createDataFrame(rows, "id BIGINT, v INT")
    got = {
        (r["id"], r["bucket"])
        for r in equidepth_bucket(df, "v", "id", 4).collect()
    }
    want = {(r["id"], r["bucket"]) for r in _ntile(df, "v", "id", 4).collect()}
    assert got == want
    tiny = spark.createDataFrame([(1, 5), (2, 3), (3, 3)], "id BIGINT, v INT")
    got = {
        (r["id"], r["bucket"])
        for r in equidepth_bucket(tiny, "v", "id", 8).collect()
    }
    want = {(r["id"], r["bucket"]) for r in _ntile(tiny, "v", "id", 8).collect()}
    assert got == want


def test_equidepth_no_single_partition_window(spark, sf_dir):
    """The bucketed fact relation's plan must contain NO
    single-partition exchange: the only Window in the tree runs over
    the distinct-value relation, and bucket assignment is a projection
    of broadcast literals. (The ntile formulation shows
    'Exchange SinglePartition' feeding a Window over the full table —
    exactly what this twin exists to avoid.)"""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_totalprice", "o_orderkey"
    )
    b = equidepth_bucket(o, "o_totalprice", "o_orderkey", 8)
    agg = b.groupBy("bucket").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    # the reference anti-plan really does contain it
    nt = _ntile(o, "o_totalprice", "o_orderkey", 8).groupBy("bucket").agg(
        F.count("*").alias("n")
    )
    ntplan = nt._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" in ntplan


def test_boundary_job_no_single_partition_continuous_metric(spark, sf_dir):
    """VERDICT r10 'What's wrong' #1: the BOUNDARY-computation job
    itself (not just final assignment) must contain no
    Exchange SinglePartition even when the metric is a CONTINUOUS
    double (distinct ≈ rows) — the hierarchical path partitions the
    exact cumulative window by approx-seeded range."""
    from ome_arrow_spark.operators.quantiles import _boundary_keys_df

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            # a continuous synthetic double with ~n distinct values
            (
                F.col("o_totalprice").cast("double")
                + F.col("o_orderkey") * F.lit(1e-6)
            ).alias("p"),
            "o_orderkey",
        )
    )
    bk = _boundary_keys_df(o, "p", "o_orderkey", 10, False)
    plan = bk._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    # and the relation is still the exact ntile boundary set
    nt = _ntile(o, "p", "o_orderkey", 10)
    want = [
        (r["b"], r["p"], r["k"])
        for r in nt.filter(F.col("bucket") < 10)
        .groupBy("bucket")
        .agg(F.max(F.struct("p", "o_orderkey")).alias("m"))
        .select(
            F.col("bucket").alias("b"),
            F.col("m.p").alias("p"),
            F.col("m.o_orderkey").alias("k"),
        )
        .orderBy("b")
        .collect()
    ]
    got = sorted((r["b"], r["p"], r["o_orderkey"]) for r in bk.collect())
    assert got == want and len(got) == 9


def test_rfm_scale_twin_pins_to_ntile(spark, sf_dir):
    from ome_arrow_spark.suite_analytics import rfm_segments, rfm_segments_scale

    a = sorted(map(tuple, rfm_segments(spark, sf_dir).collect()))
    b = sorted(map(tuple, rfm_segments_scale(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_equidepth_edges_match_ntile_tile_maxima(spark, sf_dir):
    """The PSI/reference-edge contract: equidepth_edges must equal the
    per-tile MAX(metric) of the exact ntile assignment (tiles 1..k-1)."""
    from ome_arrow_spark.operators.quantiles import equidepth_edges

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_totalprice", "o_orderkey"
    )
    edges = equidepth_edges(o, "o_totalprice", "o_orderkey", 10)
    nt = _ntile(o, "o_totalprice", "o_orderkey", 10)
    want = [
        r["e"]
        for r in nt.filter(F.col("bucket") < 10)
        .groupBy("bucket")
        .agg(F.max("o_totalprice").alias("e"))
        .orderBy("bucket")
        .collect()
    ]
    assert edges == want and len(edges) == 9
    assert edges == sorted(edges)


def test_equidepth_boundaries_empty_and_small(spark):
    from ome_arrow_spark.operators.quantiles import (
        equidepth_boundaries,
        equidepth_edges,
    )

    empty = spark.createDataFrame([], "id BIGINT, v INT")
    assert equidepth_boundaries(empty, "v", "id", 4) == []
    assert equidepth_edges(empty, "v", "id", 4) == []
    one = spark.createDataFrame([(1, 7)], "id BIGINT, v INT")
    bs = equidepth_boundaries(one, "v", "id", 4)
    # n=1, k=4: every boundary rank is 1 → all three boundaries are the row
    assert [b for b, _, _ in bs] == [1, 2, 3]
    assert all(bv == 7 for _, bv, _ in bs)


def test_equidepth_string_metric_equals_ntile(spark, sf_dir):
    """r12: STRING metrics seed ranges through the common-prefix-
    stripped byte surrogate — exact vs ntile, and the boundary job
    stays partitioned even though every c_name shares the long
    'Customer#' prefix that would collapse a fixed-position surrogate
    into a single range."""
    from ome_arrow_spark.operators.quantiles import _boundary_keys_df

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_name", "c_custkey"
    )
    got = {
        (r["c_custkey"], r["bucket"])
        for r in equidepth_bucket(c, "c_name", "c_custkey", 8).collect()
    }
    want = {
        (r["c_custkey"], r["bucket"])
        for r in _ntile(c, "c_name", "c_custkey", 8).collect()
    }
    assert got == want and len(got) > 0
    # boundary job plan: no single-partition exchange at distinct == rows
    bk = _boundary_keys_df(c, "c_name", "c_custkey", 8, False)
    plan = bk._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_equidepth_string_non_ascii_and_short(spark):
    """Surrogate monotonicity across mixed lengths, a shared prefix,
    multi-byte UTF-8, and values shorter than the 6-byte window."""
    vals = ["", "a", "ab", "abcdefgh", "abcdéf", "zz", "abé", "abc",
            "abcdefgi", "abcdefg", "b", "aa", "a" * 20, "中文"]
    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v STRING, id BIGINT")
    got = {
        (r["id"], r["bucket"])
        for r in equidepth_bucket(df, "v", "id", 5).collect()
    }
    want = {(r["id"], r["bucket"]) for r in _ntile(df, "v", "id", 5).collect()}
    assert got == want


def test_equidepth_null_contract_enforced(spark, sf_dir):
    """r12 (r11 ADVICE): NULL metric or key rows raise
    EquidepthNullError from the range census instead of silently
    producing a NULL bucket that diverges from NTILE's nulls-first."""
    from ome_arrow_spark.operators.quantiles import EquidepthNullError

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_totalprice", "o_orderkey"
    )
    null_metric = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 50 == 0, None).otherwise(
            F.col("o_totalprice")
        ),
    )
    with pytest.raises(EquidepthNullError, match="o_totalprice"):
        equidepth_bucket(null_metric, "o_totalprice", "o_orderkey", 4)
    null_key = o.withColumn(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 50 == 0, None).otherwise(
            F.col("o_orderkey")
        ),
    )
    with pytest.raises(EquidepthNullError, match="o_orderkey"):
        equidepth_bucket(null_key, "o_totalprice", "o_orderkey", 4)
