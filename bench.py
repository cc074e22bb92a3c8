"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.

Each query is forced with a cheap count-style action (the driver-facing
queries return DataFrames; we avoid collecting wide results)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ome_arrow_spark.session import get_spark
from ome_arrow_spark import suite
from ome_arrow_spark import suite_llm, suite_ome, suite_streaming  # noqa: F401  (register queries)

# Headline set: one per operator family, weighted toward shuffle-heavy ops.
BENCH_QUERIES = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "join_left_order_counts",
    "agg_distinct",
    "agg_rollup",
    "window_rank",
    "window_analytic",
    "sort_topk",
    "json_events",
    "asof_events_orders",
    # LLM / training-data ops
    "text_stats",
    "dedup_exact",
    "minhash_signatures",
    "neardup_lsh",
    "knn_cosine",
    # OME format half (synthesized images; exercises HOF pixel exprs)
    "ome_slice_crop",
    "ome_multiscale",
    # streaming (AvailableNow micro-batch end-to-end)
    "stream_tumbling",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("ome-arrow-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = suite.queries()

    # Warm the JVM + parquet footers once with a trivial action.
    registry["q1_pricing_summary"](spark, sf_dir).count()

    times: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = registry.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        times[name] = round(dt, 4)
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "suite_total_wall",
                "value": round(total, 4),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
