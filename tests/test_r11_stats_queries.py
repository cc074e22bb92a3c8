"""Structural invariants for the round-11 late statistics batch
(spearman_daily, kendall_tau_daily, cramers_v, column_entropy).
Value-exactness is covered by the oracle gate (tools/gate_sim.py /
tests/test_oracle_parity.py); these assert the semantic properties an
oracle hash cannot express — correlation bounds and sign agreement,
pair-census accounting, effect-size range, entropy bounds — plus the
plan shapes that make the operators scale-safe.
"""

from __future__ import annotations

from ome_arrow_spark.suite_analytics import (
    column_entropy,
    cramers_v,
    kendall_tau_daily,
    spearman_daily,
)


def test_spearman_bounds_and_sign(spark, sf_dir):
    row = spearman_daily(spark, sf_dir).collect()[0]
    assert row.n_days > 100
    assert -1.0 <= row.rho <= 1.0
    # Daily spend is the sum of the day's order prices, so more orders
    # per day → more spend: the monotone association must be strongly
    # positive on any of the fixtures.
    assert row.rho > 0.5


def test_kendall_pair_census_accounts_for_every_pair(spark, sf_dir):
    row = kendall_tau_daily(spark, sf_dir).collect()[0]
    assert -1.0 <= row.tau_b <= 1.0
    assert row.tau_b > 0.3  # same monotone association as Spearman
    # conc + disc + ties never exceeds the pair count, and pairs tied
    # on BOTH axes are the only ones outside the four buckets.
    both_tied = row.n_pairs - row.conc - row.disc - row.ties_x - row.ties_y
    assert both_tied >= 0
    # n_pairs is exactly n*(n-1)/2 of the daily relation.
    n_days = spearman_daily(spark, sf_dir).collect()[0].n_days
    assert row.n_pairs == n_days * (n_days - 1) // 2


def test_kendall_leq_spearman_in_magnitude(spark, sf_dir):
    # For monotone-ish bivariate data |tau| <= |rho| in practice
    # (tau ~ 2/3 rho for mild dependence); a gross violation signals a
    # broken pair census or rank computation.
    rho = spearman_daily(spark, sf_dir).collect()[0].rho
    tau = kendall_tau_daily(spark, sf_dir).collect()[0].tau_b
    assert abs(tau) <= abs(rho) + 0.05


def test_cramers_v_range_and_df(spark, sf_dir):
    row = cramers_v(spark, sf_dir).collect()[0]
    assert row.n_rows_cat == 5 and row.n_cols_cat == 3
    assert row.chi2 >= 0.0
    assert 0.0 <= row.cramers_v <= 1.0
    # priority and status are near-independent in TPC-H-shaped data:
    # the effect size must be small even when chi2 is "significant".
    assert row.cramers_v < 0.2


def test_column_entropy_bounds(spark, sf_dir):
    rows = {r.col: r for r in column_entropy(spark, sf_dir).collect()}
    assert set(rows) == {"o_orderpriority", "o_orderstatus", "c_mktsegment"}
    for r in rows.values():
        assert r.n_distinct >= 3
        assert 0.0 <= r.entropy_nats
        # H <= ln(k), so normalized entropy lives in [0, 1].
        assert 0.0 <= r.norm_entropy <= 1.0
        assert 1.0 / r.n_distinct <= r.modal_share <= 1.0
    # priority is uniform-ish (5 equal classes) → high normalized
    # entropy; status is dominated by F/O → lower than priority.
    assert rows["o_orderpriority"].norm_entropy > 0.99
    assert (
        rows["o_orderstatus"].norm_entropy
        < rows["o_orderpriority"].norm_entropy
    )


def test_rank_windows_run_on_the_daily_aggregate(spark, sf_dir):
    # The global rank windows are driver-scale BY CONSTRUCTION: they
    # must sit above the date groupBy (aggregate first, window second),
    # never over the raw orders scan. A plan where Window appears
    # below the first HashAggregate would re-introduce a full-table
    # global sort.
    plan = spearman_daily(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    first_agg = plan.find("HashAggregate")
    first_window = plan.find("Window")
    assert first_agg != -1 and first_window != -1
    # executedPlan prints top-down: the final moment aggregate comes
    # first, then Window, then the date groupBy aggregates below it.
    assert plan.find("HashAggregate", first_window) != -1, (
        "no aggregate below the window: rank ran on the raw scan"
    )


def test_cramers_v_broadcasts_margins(spark, sf_dir):
    plan = cramers_v(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "contingency margins must broadcast, not shuffle"
    )
