"""knn_join_lsh candidate-volume scaling table (VERDICT r9 #1 "Done =
... a PLANS.md entry showing knn_join_lsh candidate counts
sub-quadratic at sf1, mirroring the lsh_skew table").

For each fixture SF, runs the sizing the operator's data-derived
defaults pick (knn_join_planes, target_bucket=256) on the embeddings
self-join and records measured candidate pairs against the n²/2
ceiling and the n·tables·target_bucket linear model.

Usage: python tools/knn_join_scale.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".local_testdata", "sf1"),
    ]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ome_arrow_spark.operators.similarity import (
        knn_join_candidates,
        knn_join_planes,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("| sf_dir | n | planes | buckets/table | candidate pairs | "
          "n*n/2 ceiling | ratio | pairs / (n*tables*256) |")
    print("|---|---|---|---|---|---|---|---|")
    for d in dirs:
        p = os.path.join(d, "embeddings.parquet")
        if not os.path.exists(p):
            continue
        emb = spark.read.parquet(p)
        left = emb.select(F.col("vec_id").alias("qid"), "embedding")
        right = emb.select(F.col("vec_id").alias("cid"), "embedding")
        n = emb.count()
        planes = knn_join_planes(n)
        cand = knn_join_candidates(left, right, n_planes=planes).count()
        ceil_ = n * n // 2
        lin = n * 8 * 256
        print(
            f"| {os.path.basename(d.rstrip('/'))} | {n} | {planes} | "
            f"{2**planes} | {cand} | {ceil_} | {cand/ceil_:.4f} | "
            f"{cand/lin:.3f} |"
        )


if __name__ == "__main__":
    main()
