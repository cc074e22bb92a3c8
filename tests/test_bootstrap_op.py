"""operators/bootstrap.py: the md5 mode must be ROW-EQUAL to the
registered poisson_bootstrap_ci gate query (same resample, same CI),
and the xxhash production mode must produce a statistically equivalent
interval (same point estimate by construction; CI from a different but
equally valid resample RNG)."""

from __future__ import annotations

import pytest

from ome_arrow_spark.operators.bootstrap import bootstrap_ci
from ome_arrow_spark.suite import _t
from ome_arrow_spark.suite_analytics import poisson_bootstrap_ci

# ~35 s of 200× replicate explodes — nightly/per-round lane, not the
# <5-min CI loop.
pytestmark = pytest.mark.heavy


def _orders(spark, sf_dir):
    return _t(spark, sf_dir, "orders")


def test_md5_mode_pins_to_gate_query(spark, sf_dir, sf_small):
    for d in (sf_small, sf_dir):
        gate = poisson_bootstrap_ci(spark, d).collect()[0]
        op = bootstrap_ci(
            _orders(spark, d), "o_orderkey", "o_totalprice", mode="md5"
        ).collect()[0]
        assert tuple(op) == tuple(gate), f"md5 twin diverged at {d}"


def test_xxhash_mode_equivalent_interval(spark, sf_dir):
    md5 = bootstrap_ci(
        _orders(spark, sf_dir), "o_orderkey", "o_totalprice", mode="md5"
    ).collect()[0]
    xx = bootstrap_ci(
        _orders(spark, sf_dir), "o_orderkey", "o_totalprice", mode="xxhash"
    ).collect()[0]
    # same point estimate up to float-summation order (production mode
    # accumulates doubles; the md5/oracle mode uses exact decimals)
    assert abs(xx.point_est - md5.point_est) < 1e-6 * abs(md5.point_est)
    # both are 95% CIs of the same estimator from B=200 Poisson
    # resamples: they must overlap heavily and have comparable width
    assert xx.ci_lo <= md5.ci_hi and md5.ci_lo <= xx.ci_hi
    w_md5 = md5.ci_hi - md5.ci_lo
    w_xx = xx.ci_hi - xx.ci_lo
    assert 0.5 < w_xx / w_md5 < 2.0
    assert xx.ci_lo <= xx.point_est <= xx.ci_hi


def test_ci_width_matches_analytic_standard_error(spark, sf_dir):
    """The 95% bootstrap CI of the mean must reproduce the analytic
    sampling error: width ≈ 2·1.96·sd/√n (the Poisson bootstrap is a
    consistent estimator of the sampling distribution). With B=200
    replicates the width estimate carries ~15% Monte-Carlo noise, so
    the pinned band is [0.6, 1.5]× the analytic width."""
    import math

    from pyspark.sql import functions as F

    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    n, mean, sd = o.groupBy().agg(
        F.count("*"), F.avg("o_totalprice"), F.stddev("o_totalprice")
    ).collect()[0]
    analytic = 2 * 1.96 * sd / math.sqrt(n)
    ci = bootstrap_ci(o, "o_orderkey", "o_totalprice", mode="xxhash").collect()[0]
    width = ci.ci_hi - ci.ci_lo
    assert 0.6 * analytic < width < 1.5 * analytic, (width, analytic)
