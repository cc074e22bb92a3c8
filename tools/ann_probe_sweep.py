"""Sharded-ANN probe-depth sweep (VERDICT r12 "Next round" #1 — the
last unmeasured claim in the ANN stack: the search-side sharding tax).

r12 measured union-probe search over 4 shards at n_probe=64/shard at
22.5 s vs the monolith's 6.3 s (recall@10 = 1.00 both).  Two levers,
both measured here on the same fixture/codebook:

1. the FUSED plan (ann_index.py ``ivf_sharded_search``, rewritten r13):
   prune every shard's manifest, read the union of live files in ONE
   scan, score once, ONE global top-k window — instead of per-shard
   search + merge (shards× scans, shards+1 windows).  With one shared
   codebook the probed lists partition the same scored volume as the
   monolith's, so the fused sharded search should cost the monolith's
   wall plus ``shards`` manifest lookups;
2. probe depth: sweep n_probe ∈ {16, 24, 32, 64} on BOTH the monolith
   and the sharded index (same codebook → same probed list ids → same
   scored candidate set on both sides), stamping wall + recall@10 per
   point.  A shared-codebook shard holds 1/shards of every list, so
   per-shard probe depth is NOT an independent recall knob — n_probe
   picks WHICH lists are scored, identical across shards; what the
   sweep shows is where recall saturates, i.e. how shallow the probe
   (and the wall) can go.

r14 adds the ``--distinct-codebooks`` block (VERDICT r13 "What's
missing" #2: the general grouped-by-codebook path was unit-gated only):
each shard trains its OWN codebook on its slice — the realistic
independent-rebuild / incremental-growth regime — with
``max(64, centroids // shards)`` centroids per shard so per-list
granularity matches the monolith's.  ``ivf_sharded_search`` then takes
the grouped path: one fused scan PER distinct codebook — ~shards× the
scored volume at the same n_probe (each group probes its own n_probe
lists), which also buys recall.  Measured at 1M/4 shards (r14 stamp):
walls 6.3/6.1/7.1 s at n_probe 16/32/64 vs the shared-codebook fused
search's 3.9/5.0/6.3 — only ~1.4-1.6×, NOT shards×, because each
group's scan covers 1/shards of the rows; and per-shard codebooks
reach recall@10 = 1.00 already at n_probe=16 (the 4×16-list scored
volume ≈ the monolith's 64-probe volume, with probes adapted to each
shard's own distribution).

Prints ONE JSON line; optionally writes it to a stamp file.

Usage: python tools/ann_probe_sweep.py [n_vectors] [n_shards] [out_json]
           [--distinct-codebooks]
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
    args = [a for a in sys.argv[1:] if a != "--distinct-codebooks"]
    distinct = "--distinct-codebooks" in sys.argv[1:]
    n_vectors = int(args[0]) if len(args) > 0 else 1_000_000
    n_shards = int(args[1]) if len(args) > 1 else 4
    out_path = args[2] if len(args) > 2 else None

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
        .appName("ann_probe_sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import _recall_at10, make_ann_fixture
    from ome_arrow_spark.operators import ann_index as AI
    from ome_arrow_spark.operators import quantizer as QZ

    d = tempfile.mkdtemp(prefix="ann_sweep_")
    out: dict[str, object] = {"n_vectors": n_vectors, "n_shards": n_shards}
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

        t0 = time.perf_counter()
        cents = QZ.train_centroids(corpus, "embedding", nc, sample_size=262_144)
        out["codebook_train_wall"] = round(time.perf_counter() - t0, 2)

        # monolith + shards from the SAME codebook (assignment
        # arithmetic identical both sides → result-identical searches)
        mono_t = os.path.join(d, "ivf_mono")
        t0 = time.perf_counter()
        AI.build_ivf_index(spark, corpus, mono_t, centroids=cents)
        out["monolith_build_wall"] = round(time.perf_counter() - t0, 2)

        tables = [os.path.join(d, f"ivf_shard{i}") for i in range(n_shards)]

        def build(i: int) -> None:
            AI.build_ivf_index(
                spark,
                corpus.filter(F.pmod(F.xxhash64("cid"), n_shards) == i),
                tables[i],
                centroids=cents,
            )

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_shards) as ex:
            list(ex.map(build, range(n_shards)))
        out["shard_build_wall_concurrent"] = round(time.perf_counter() - t0, 2)

        sweep = []
        for n_probe in (16, 24, 32, 64):
            point: dict[str, object] = {"n_probe": n_probe}
            t0 = time.perf_counter()
            rows = AI.ivf_index_search(
                spark, mono_t, queries, k=10, n_probe=n_probe
            ).collect()
            point["monolith_search_wall"] = round(time.perf_counter() - t0, 2)
            point["monolith_recall_at10"] = round(_recall_at10(rows, truth), 4)
            t0 = time.perf_counter()
            srows = AI.ivf_sharded_search(
                spark, tables, queries, k=10, n_probe=n_probe
            ).collect()
            point["sharded_search_wall"] = round(time.perf_counter() - t0, 2)
            point["sharded_recall_at10"] = round(_recall_at10(srows, truth), 4)
            # fused-plan exactness: sharded == monolith row for row
            point["results_identical"] = sorted(map(tuple, srows)) == sorted(
                map(tuple, rows)
            )
            sweep.append(point)
        out["sweep"] = sweep

        if distinct:
            # each shard trains its OWN codebook on its slice — the
            # independent-rebuild regime; per-shard centroid budget
            # keeps list granularity at the monolith's (~n/nc rows)
            nc_shard = max(64, nc // n_shards)
            out["distinct_centroids_per_shard"] = nc_shard
            dtables = [
                os.path.join(d, f"ivf_own{i}") for i in range(n_shards)
            ]

            def build_own(i: int) -> None:
                part = corpus.filter(
                    F.pmod(F.xxhash64("cid"), n_shards) == i
                )
                own = QZ.train_centroids(
                    part, "embedding", nc_shard,
                    sample_size=262_144 // n_shards,
                )
                AI.build_ivf_index(spark, part, dtables[i], centroids=own)

            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=n_shards) as ex:
                list(ex.map(build_own, range(n_shards)))
            out["distinct_build_wall_concurrent"] = round(
                time.perf_counter() - t0, 2
            )

            dsweep = []
            for n_probe in (16, 32, 64):
                dpoint: dict[str, object] = {"n_probe": n_probe}
                t0 = time.perf_counter()
                drows = AI.ivf_sharded_search(
                    spark, dtables, queries, k=10, n_probe=n_probe
                ).collect()
                dpoint["sharded_search_wall"] = round(
                    time.perf_counter() - t0, 2
                )
                dpoint["sharded_recall_at10"] = round(
                    _recall_at10(drows, truth), 4
                )
                dsweep.append(dpoint)
            out["distinct_sweep"] = dsweep

        line = json.dumps(out)
        print(line)
        if out_path:
            with open(out_path, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
