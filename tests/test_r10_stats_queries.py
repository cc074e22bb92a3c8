"""Structural invariants for the round-10 statistics/curation batch
(poisson_bootstrap_ci, seasonal_decomposition, rake_keywords,
covariance_matrix). Value-exactness is covered by the oracle gate
(tools/gate_sim.py / tests/test_oracle_parity.py); these assert the
semantic properties an oracle hash cannot express — interval ordering,
island stopword-freedom, PSD diagonal — in the fast lane.
"""

from __future__ import annotations

from ome_arrow_spark.suite_analytics import (
    poisson_bootstrap_ci,
    seasonal_decomposition,
)
from ome_arrow_spark.suite_llm import _RAKE_STOP, covariance_matrix, rake_keywords


def test_bootstrap_interval_brackets_point(spark, sf_dir):
    row = poisson_bootstrap_ci(spark, sf_dir).collect()[0]
    assert row.b_replicates == 200
    assert row.ci_lo < row.ci_hi
    # A 95% CI of the mean from 200 replicates should bracket the point
    # estimate on any non-degenerate sample.
    assert row.ci_lo <= row.point_est <= row.ci_hi
    # Poisson-bootstrap CI width scales ~1/sqrt(n); at sf0.01 (15k
    # orders, sd ~ price sd) it is far tighter than the mean itself.
    assert (row.ci_hi - row.ci_lo) < 0.2 * row.point_est


def test_seasonal_decomposition_shape(spark, sf_dir):
    rows = seasonal_decomposition(spark, sf_dir).collect()
    assert [r.dow for r in rows] == list(range(7))
    # Seasonal indices are mean detrended values: they must straddle 0
    # (the detrended series has ~zero mean by construction) and the
    # residual MAD is non-negative.
    assert min(r.seasonal_idx for r in rows) <= 0 <= max(
        r.seasonal_idx for r in rows
    )
    assert all(r.mean_abs_resid >= 0 for r in rows)
    assert all(r.n_days > 0 for r in rows)


def test_rake_phrases_are_stopword_free_islands(spark, sf_dir):
    stop = {s.strip("'") for s in _RAKE_STOP.split(",")}
    rows = rake_keywords(spark, sf_dir).collect()
    assert len(rows) == 15
    scores = [r.rake_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        words = r.phrase.split(" ")
        assert words, "empty phrase"
        assert not (set(words) & stop), f"stopword inside island: {r.phrase}"
        assert r.n_occurrences >= 1


def test_covariance_matrix_diagonal_and_triangle(spark, sf_dir):
    rows = covariance_matrix(spark, sf_dir).collect()
    assert len(rows) == 36  # upper triangle of 8x8
    seen = {(r.i, r.j) for r in rows}
    assert seen == {(i, j) for i in range(8) for j in range(i, 8)}
    n = rows[0].n
    assert all(r.n == n for r in rows)
    # Variances (diagonal) are non-negative up to the round-6 rendering.
    assert all(r.cov >= -1e-6 for r in rows if r.i == r.j)
