"""Measure the partition-policy claims instead of deriving them.

Sweeps at the largest local fixture (sf1: lineitem ~6M rows, ~100 MB
zstd parquet ≈ 600 MB decoded):

1. ``spark.sql.files.maxPartitionBytes`` — input-split sizing. At local
   fixture sizes Spark's parallelism floor (``files.minPartitionNum``
   defaults to defaultParallelism) hides the knob — every setting gives
   ~32 splits. We measure BOTH regimes: floor on (the local default)
   and floor off (``minPartitionNum=1``), where the knob binds exactly
   as it does at cluster scale (file bytes >> cores): a 128m/512m
   policy collapses a 100 MB file to one split and starves 31 of 32
   cores. That floor-off column is the 100 TB-relevant one.
2. ``spark.sql.shuffle.partitions`` with AQE OFF vs ON — the claim
   behind cluster_defaults: a misconfigured static value costs real
   wall time; AQE's runtime coalescing flattens the curve, which is why
   the production posture pins AQE on and treats the static number as a
   ceiling, not a target.

Also records the incidental finding that motivated the 8g driver pin:
with the default 1g driver, AQE's broadcast conversion of the sf1
orders build side OOMs the driver (SparkFatalException) — the
documented failure mode of undersized drivers + runtime broadcast.

All confs used are runtime-settable, so ONE session serves every cell
(driver memory is pinned at JVM launch). Emits one JSON document on
stdout and a markdown table on stderr for PLANS.md.

Usage: python tools/partition_sweep.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scan_agg(spark, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            F.avg("l_discount"),
            F.count("*"),
        )
        .collect()
    )


def _join_agg(spark, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            F.countDistinct("o_custkey"),
        )
        .collect()
    )


def _best_of(fn, repeats):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".local_testdata",
        "sf1",
    )
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    out: dict = {"sf_dir": sf_dir, "cores": 32, "repeats": repeats}

    # ---- sweep 1: input split size ------------------------------------
    split_rows = []
    for floor_on in (True, False):
        if floor_on:
            spark.conf.unset("spark.sql.files.minPartitionNum")
        else:
            spark.conf.set("spark.sql.files.minPartitionNum", "1")
        for mpb in ("8m", "32m", "128m", "512m"):
            spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
            n_splits = spark.read.parquet(
                os.path.join(sf_dir, "lineitem.parquet")
            ).rdd.getNumPartitions()
            row = {
                "parallelism_floor": floor_on,
                "maxPartitionBytes": mpb,
                "lineitem_splits": n_splits,
                "scan_agg_s": _best_of(lambda: _scan_agg(spark, sf_dir), repeats),
            }
            split_rows.append(row)
            print(f"# splits {row}", file=sys.stderr)
    out["input_split_sweep"] = split_rows
    spark.conf.unset("spark.sql.files.minPartitionNum")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")

    # ---- sweep 2: shuffle partitions, AQE off vs on -------------------
    shuf_rows = []
    for aqe in ("false", "true"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", aqe)
        for sp in (4, 32, 1024):
            spark.conf.set("spark.sql.shuffle.partitions", str(sp))
            row = {
                "aqe": aqe == "true",
                "shuffle_partitions": sp,
                "join_agg_s": _best_of(lambda: _join_agg(spark, sf_dir), repeats),
            }
            shuf_rows.append(row)
            print(f"# shuffle {row}", file=sys.stderr)
    out["shuffle_sweep"] = shuf_rows

    # markdown for the docs
    md = [
        "| maxPartitionBytes | splits (floor on) | s | splits (floor off) | s |",
        "|---|---|---|---|---|",
    ]
    for mpb in ("8m", "32m", "128m", "512m"):
        on = next(
            r
            for r in split_rows
            if r["parallelism_floor"] and r["maxPartitionBytes"] == mpb
        )
        off = next(
            r
            for r in split_rows
            if not r["parallelism_floor"] and r["maxPartitionBytes"] == mpb
        )
        md.append(
            f"| {mpb} | {on['lineitem_splits']} | {on['scan_agg_s']} |"
            f" {off['lineitem_splits']} | {off['scan_agg_s']} |"
        )
    md += [
        "",
        "| shuffle.partitions | AQE off (s) | AQE on (s) |",
        "|---|---|---|",
    ]
    for sp in (4, 32, 1024):
        off = next(
            r for r in shuf_rows if not r["aqe"] and r["shuffle_partitions"] == sp
        )
        on = next(
            r for r in shuf_rows if r["aqe"] and r["shuffle_partitions"] == sp
        )
        md.append(f"| {sp} | {off['join_agg_s']} | {on['join_agg_s']} |")
    print("\n".join(md), file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
