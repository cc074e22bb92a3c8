"""Per-shard-parallel IVF build at 1M vectors (VERDICT r11 "Next
round" #1 — the last 100 TB ANN claim resting on prose).

The corpus-scale build story in PLANS.md: train ONE shared codebook on
a fixed sample, build every shard's inverted lists INDEPENDENTLY with
it (embarrassingly parallel — no cross-shard communication), then
union-probe searches across shard indexes.  This tool measures it on
the 1M fixture:

1. shared codebook: one ``train_centroids`` on a 262k sample (paid ONCE
   regardless of shard count);
2. shard builds: assignment + range-clustered write per shard —
   sequential walls (the per-shard cost a cluster node would pay) AND
   4-thread concurrent wall (upper-bounded here by the shared 32-core
   box; on a cluster the shards live on disjoint executors);
3. ``ivf_sharded_search`` union-probe recall@10 vs the numpy
   brute-force oracle — must match the monolith's 1.00.

Prints ONE JSON line; optionally writes it to a stamp file.

Usage: python tools/ann_shard_build.py [n_vectors] [n_shards] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_vectors = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.scheduler.mode", "FAIR")
        .appName("ann_shard_build")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import _recall_at10, make_ann_fixture
    from ome_arrow_spark.operators import ann_index as AI
    from ome_arrow_spark.operators import quantizer as QZ

    d = tempfile.mkdtemp(prefix="ann_shard_")
    out: dict[str, object] = {
        "n_vectors": n_vectors,
        "n_shards": n_shards,
    }
    try:
        t0 = time.perf_counter()
        corpus_path, q_rows, truth = make_ann_fixture(d, n_vectors=n_vectors)
        out["fixture_wall"] = round(time.perf_counter() - t0, 2)
        corpus = spark.read.parquet(corpus_path)
        queries = spark.createDataFrame(
            q_rows, "qid long, embedding array<float>"
        )

        nc = 1024 if n_vectors >= 500_000 else 64
        out["centroids"] = nc

        # ---- 1. shared codebook: trained ONCE on a fixed sample ----
        t0 = time.perf_counter()
        cents = QZ.train_centroids(
            corpus, "embedding", nc, sample_size=262_144
        )
        out["codebook_train_wall"] = round(time.perf_counter() - t0, 2)

        # ---- 2. shard builds with the shared codebook --------------
        shards = [
            corpus.filter(F.pmod(F.xxhash64("cid"), n_shards) == i)
            for i in range(n_shards)
        ]
        tables = [os.path.join(d, f"ivf_shard{i}") for i in range(n_shards)]

        def build(i: int) -> float:
            t = time.perf_counter()
            AI.build_ivf_index(
                spark, shards[i], tables[i], centroids=cents,
            )
            return round(time.perf_counter() - t, 2)

        # sequential: the per-shard cost (what ONE cluster node pays)
        seq_walls = [build(i) for i in range(n_shards)]
        out["shard_build_walls_sequential"] = seq_walls
        out["shard_build_total_sequential"] = round(sum(seq_walls), 2)

        # concurrent: all shards at once from one session (FAIR pools;
        # on this box they share 32 cores, so the wall lower-bounds at
        # total/|cores-saturated|; on a cluster each shard has its own
        # executors and the wall is max(per-shard))
        for t in tables:
            shutil.rmtree(t, ignore_errors=True)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_shards) as ex:
            conc_walls = list(ex.map(build, range(n_shards)))
        out["shard_build_walls_concurrent"] = conc_walls
        out["shard_build_wall_concurrent"] = round(
            time.perf_counter() - t0, 2
        )

        # ---- 3. union-probe search across shard indexes ------------
        n_probe = max(8, nc // 16)
        out["n_probe"] = n_probe
        t0 = time.perf_counter()
        rows = AI.ivf_sharded_search(
            spark, tables, queries, k=10, n_probe=n_probe
        ).collect()
        out["sharded_search_wall"] = round(time.perf_counter() - t0, 2)
        out["sharded_recall_at10"] = round(_recall_at10(rows, truth), 4)

        line = json.dumps(out)
        print(line)
        if out_path:
            with open(out_path, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
