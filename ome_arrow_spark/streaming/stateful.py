"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2C: the escape hatch for operators Spark's built-in
windows can't express).

``user_running_stats`` keeps per-user state (event count, value sum,
last seen ts) across micro-batches and emits the updated aggregate per
user each batch. With AvailableNow it degenerates to one batch —
identical output to a batch group-by, which is exactly what the DuckDB
oracle checks; against a live source, state persists in the state
store, bounded by the watermark."""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_ts timestamp"
STATE_SCHEMA = "n long, s double, last_ts timestamp"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        # deterministic accumulation: sort by event ts before folding
        pdf = pdf.sort_values("ts")
        s = float(s + pdf["value"].sum())
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None or mx > last_ts else last_ts
    state.update((n, s, last_ts))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "sum_value": s, "last_ts": last_ts}]
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last timestamp) with explicit
    state. Scale: state is partitioned by user_id across the state
    store; each micro-batch touches only users present in the batch."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
