"""As-of join: for each left row, attach the latest right row whose time
is at or before the left row's time, matched on an equality key.

The reference has no such operator (SURVEY.md §2C); this is the
Spark-scalable formulation: union both sides tagged, one window pass per
key ordered by time, then ``last(..., ignorenulls=True)`` carries the
most recent right-side values forward onto left rows.

Why not the naive ``JOIN ... ON key = key AND r.time <= l.time`` +
``row_number() = 1``? That range join produces |left| × |matching
right| intermediate rows before the filter — quadratic blowup per key at
100 TB. The union+window form shuffles each input exactly once on the
key, keeps the intermediate linear in |left| + |right|, and sorts
locally per key.

Tie-breaking: right rows at the same timestamp as a left row are
*included* (at-or-before semantics); among right rows with identical
times the one with the largest tiebreaker column wins (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    value_aliases: list[str] | None = None,
    keep: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: latest ``right`` row with ``right_time <=
    left_time`` (``direction="backward"``, default) or earliest right
    row with ``right_time >= left_time`` (``direction="forward"``) per
    ``left_on == right_on`` key; NULL values when no right row
    qualifies.

    ``right_values`` are the columns to carry over; ``value_aliases``
    renames them in the output; ``keep`` selects the left columns to
    retain (default: all). Both directions are the same one-shuffle
    union+window plan — forward just reverses the sort, so the carried
    ``last()`` is the nearest *following* right row. Tie among
    equal-time right rows: backward keeps the max first-value column,
    forward the min (both deterministic).

    ``tolerance_seconds`` (pandas ``merge_asof`` semantics): a matched
    right row counts only when |right_time − left_time| ≤ tolerance;
    otherwise the carried values are NULL — the stale-quote guard of
    financial as-of joins.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if value_aliases is None:
        value_aliases = right_values
    if keep is None:
        keep = [c for c in left.columns]

    key, ts = "__asof_key", "__asof_ts"
    side = "__asof_side"  # 0 = right (sorts first at equal ts), 1 = left

    lhs = left.select(
        F.col(left_on).alias(key),
        F.col(left_time).cast("timestamp").alias(ts),
        F.lit(1).alias(side),
        *[F.col(c) for c in keep],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{i}") for i, c in enumerate(right_values)],
    )
    rhs = right.select(
        F.col(right_on).alias(key),
        F.col(right_time).cast("timestamp").alias(ts),
        F.lit(0).alias(side),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in keep],
        *[F.col(c).alias(f"__v_{i}") for i, c in enumerate(right_values)],
    )

    # Order: time asc (backward) / desc (forward); at equal times right
    # rows before left rows (so an event sees same-instant orders);
    # among equal-time right rows the first right_value column breaks
    # ties — last() picks the max (backward) / min (forward).
    if direction == "backward":
        order = [F.col(ts).asc(), F.col(side).asc(), F.col("__v_0").asc_nulls_first()]
    else:
        order = [F.col(ts).desc(), F.col(side).asc(), F.col("__v_0").desc_nulls_first()]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    unioned = lhs.unionByName(rhs)
    # the matched right row's OWN timestamp rides along for tolerance
    unioned = unioned.withColumn(
        "__v_mts", F.when(F.col(side) == 0, F.col(ts))
    )
    carried = unioned.select(
        F.col(key),
        F.col(side),
        F.col(ts),
        *[F.col(c) for c in keep],
        F.last(F.col("__v_mts"), ignorenulls=True).over(w).alias("__mts"),
        *[
            F.last(F.col(f"__v_{i}"), ignorenulls=True).over(w).alias(a)
            for i, a in enumerate(value_aliases)
        ],
    )
    out = carried.filter(F.col(side) == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.abs(
                F.col(ts).cast("double") - F.col("__mts").cast("double")
            )
            <= F.lit(float(tolerance_seconds))
        )
        out = out.select(
            *keep,
            *[
                F.when(in_tol, F.col(a)).alias(a)
                for a in value_aliases
            ],
        )
        return out
    return out.select(*keep, *value_aliases)
