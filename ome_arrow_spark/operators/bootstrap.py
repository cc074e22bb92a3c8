"""Distributed Poisson bootstrap (Chamandy et al., "Estimating
Uncertainty for Massive Data Streams") as a reusable operator.

The classical bootstrap needs a global resample of n indices per
replicate — undistributable. The Poisson bootstrap gives every row an
independent Poisson(1) weight per replicate, so B resamples are one
pass: explode B replicate ids per row (inside whole-stage codegen),
weight by the Poisson(1) inverse CDF of a per-(row, replicate)
uniform, and map-side combine reduces the shuffle to B rows per task.

Two uniform sources, same contract (the ANN/kNN-join mode pattern):

- ``mode="md5"`` — the cross-engine ORACLE mode: the 13-hex-char md5
  parse (exact in a double's 2^52) that DuckDB replays bit-for-bit.
  This is what the registered ``poisson_bootstrap_ci`` query pins —
  but md5-of-concat-string costs ~270 s for the 300M replicate rows
  of sf1 (measured, PLANS.md): hex-string allocation per row.
- ``mode="xxhash"`` — the PRODUCTION mode: ``xxhash64`` straight on
  the (key, replicate) columns, no string materialization, staying in
  codegen; paired with double accumulation (``exact=False``). Same
  replayability within Spark; measured 271 s → 13.1 s at sf1 (20.7×).
  The hash swap alone is only 2.3× — the dominant cost was the
  decimal(20,9) accumulator (>18-digit precision falls off Spark's
  long-backed decimal onto per-row BigDecimals), which only the
  oracle mode needs.

The statistic contract is identical; only the resample RNG differs —
both are valid Poisson bootstraps, so the CIs agree in distribution
(pinned structurally in tests/test_bootstrap_op.py, and the md5 mode
is pinned ROW-EQUAL to the registered gate query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Poisson(1) CDF thresholds: P(X<=k) for k=0..5; weights cap at 6.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)

_TWO_52 = float(1 << 52)


def _uniform(key: Column, rep: Column, mode: str) -> Column:
    if mode == "md5":
        return (
            F.conv(F.substring(F.md5(F.concat_ws(":", key, rep)), 1, 13), 16, 10)
            .cast("bigint")
            .cast("double")
            / F.lit(_TWO_52)
        )
    if mode == "xxhash":
        # pmod folds the signed 64-bit hash into [0, 2^52)
        return (
            F.pmod(F.xxhash64(key, rep), F.lit(1 << 52)).cast("double")
            / F.lit(_TWO_52)
        )
    raise ValueError(f"unknown uniform mode: {mode!r}")


def poisson_weight(uni: Column) -> Column:
    """Poisson(1) inverse CDF of a uniform, capped at 6."""
    w = F.when(uni < _POISSON1_CDF[0], 0)
    for k, p in enumerate(_POISSON1_CDF[1:], start=1):
        w = w.when(uni < p, k)
    return w.otherwise(6)


def bootstrap_replicate_means(
    df: DataFrame,
    key_col: str,
    value_col: str,
    b: int = 200,
    mode: str = "xxhash",
    exact: bool | None = None,
) -> DataFrame:
    """B replicate means of ``value_col``: one row per replicate
    ``(r, mean_r)``.

    ``exact`` controls the accumulator: True → round-9
    decimal(20,9) sums (order-independent, cross-engine exact — but
    >18-digit precision is BigDecimal-backed, the dominant cost at
    300M replicate rows); False → plain double sums (the production
    default: a bootstrap CI rounded to 6 places is indifferent to
    float summation order). Defaults to exact iff ``mode="md5"`` so
    the oracle mode matches the registered gate query bit-for-bit.
    """
    if exact is None:
        exact = mode == "md5"
    spark = df.sparkSession
    v = (
        F.round(value_col, 9).cast("decimal(20,9)")
        if exact
        else F.col(value_col).cast("double")
    )
    t = df.select(F.col(key_col).alias("k"), v.alias("v"))
    reps = spark.range(b).select(F.col("id").cast("int").alias("r"))
    u = t.crossJoin(F.broadcast(reps))
    wt = poisson_weight(_uniform(F.col("k"), F.col("r"), mode))
    return (
        u.select("r", "v", wt.alias("wt"))
        .groupBy("r")
        .agg(
            (
                F.sum(F.col("v") * F.col("wt")).cast("double")
                / F.sum("wt").cast("double")
            ).alias("mean_r")
        )
    )


def bootstrap_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    b: int = 200,
    mode: str = "xxhash",
    exact: bool | None = None,
    lo_rank: int | None = None,
    hi_rank: int | None = None,
) -> DataFrame:
    """One-row 95% CI of the mean: (b_replicates, point_est, ci_lo,
    ci_hi). CI bounds are exact order statistics of the replicate
    means (default ranks 0.025·b and 0.975·b, i.e. 5/195 at b=200 —
    a symmetric 2.5%/2.5% interval, matching the registered gate
    query; ADVICE r10 fixed the old 0.98·b upper rank mislabel)."""
    if exact is None:
        exact = mode == "md5"
    lo = lo_rank if lo_rank is not None else max(1, round(0.025 * b))
    hi = hi_rank if hi_rank is not None else min(b, round(0.975 * b))
    est = bootstrap_replicate_means(df, key_col, value_col, b, mode, exact)
    rk = est.select(
        "mean_r",
        F.row_number().over(Window.orderBy("mean_r", "r")).alias("rn"),
    )
    ci = rk.agg(
        F.round(F.max(F.when(F.col("rn") == lo, F.col("mean_r"))), 6).alias(
            "ci_lo"
        ),
        F.round(F.max(F.when(F.col("rn") == hi, F.col("mean_r"))), 6).alias(
            "ci_hi"
        ),
    )
    pv = (
        F.round(value_col, 9).cast("decimal(20,9)")
        if exact
        else F.col(value_col).cast("double")
    )
    pt = df.select(pv.alias("v")).agg(
        (F.sum("v").cast("double") / F.count("*")).alias("mean_all")
    )
    return ci.crossJoin(F.broadcast(pt)).select(
        F.lit(b).cast("bigint").alias("b_replicates"),
        F.round(F.col("mean_all"), 6).alias("point_est"),
        "ci_lo",
        "ci_hi",
    )
