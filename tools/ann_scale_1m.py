"""ANN evidence at 1M vectors (VERDICT r10 "Next round" #3).

Extends bench.py's 100k `bench_ann` one order of magnitude for the two
scale-path index types (IVF, IVFPQ): build wall, search wall,
recall@10 vs a numpy brute-force oracle, and index file / manifest
counts.  Standalone metrics — deliberately NOT part of bench.py's
suite_total so the r1-comparable headline stays clean.

Usage: python tools/ann_scale_1m.py [n_vectors] [out_json]
Defaults: 1_000_000 vectors, prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_vectors = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("ann_scale_1m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import _recall_at10, make_ann_fixture
    from ome_arrow_spark.operators import ann_index as AI
    from ome_arrow_spark.operators import pq_index as PQ

    d = tempfile.mkdtemp(prefix="ann_1m_")
    out: dict[str, float] = {"n_vectors": float(n_vectors)}
    try:
        t0 = time.perf_counter()
        corpus_path, q_rows, truth = make_ann_fixture(d, n_vectors=n_vectors)
        out["fixture_wall"] = round(time.perf_counter() - t0, 2)
        corpus = spark.read.parquet(corpus_path)
        queries = spark.createDataFrame(
            q_rows, "qid long, embedding array<float>"
        )

        def files_of(table: str) -> int:
            return len(glob.glob(os.path.join(table, "part-*.parquet")))

        def manifest_rows(table: str) -> int:
            return len(glob.glob(os.path.join(table, "_ome_log", "*.json")))

        # ---- IVF: sqrt(n)-ish centroid count (1024 at 1M) ----------
        nc = 1024 if n_vectors >= 500_000 else 64
        ivf_t = os.path.join(d, "ivf")
        t0 = time.perf_counter()
        AI.build_ivf_index(
            spark, corpus, ivf_t, n_centroids=nc, train="sample",
            sample_size=262_144,
        )
        out["ivf_build_wall"] = round(time.perf_counter() - t0, 2)
        out["ivf_centroids"] = float(nc)
        out["ivf_files"] = float(files_of(ivf_t))
        out["ivf_manifest_actions"] = float(manifest_rows(ivf_t))
        # probe scaled with centroid count (keep ~1/16 of lists probed,
        # a slightly deeper probe than the 100k point's 8/64 = 1/8)
        n_probe = max(8, nc // 16)
        out["ivf_n_probe"] = float(n_probe)
        t0 = time.perf_counter()
        rows = AI.ivf_index_search(
            spark, ivf_t, queries, k=10, n_probe=n_probe
        ).collect()
        out["ivf_search_wall"] = round(time.perf_counter() - t0, 2)
        out["ivf_recall_at10"] = round(_recall_at10(rows, truth), 4)

        # ---- IVFPQ: same coarse quantizer + 8x256 codebooks --------
        ivfpq_t = os.path.join(d, "ivfpq")
        t0 = time.perf_counter()
        PQ.build_ivfpq_index(
            spark, corpus, ivfpq_t, n_centroids=nc, m=8, k=256,
            train="sample", sample_size=262_144,
        )
        out["ivfpq_build_wall"] = round(time.perf_counter() - t0, 2)
        out["ivfpq_files"] = float(files_of(ivfpq_t))
        out["ivfpq_manifest_actions"] = float(manifest_rows(ivfpq_t))
        # 4% re-rank pool — the measured recall knob (PLANS.md curve)
        cand = max(200, n_vectors // 25)
        out["ivfpq_rerank_candidates"] = float(cand)
        t0 = time.perf_counter()
        rows = PQ.ivfpq_rerank_search(
            spark, ivfpq_t, queries, corpus, topk=10, candidates=cand,
            n_probe=n_probe,
        ).collect()
        out["ivfpq_search_wall"] = round(time.perf_counter() - t0, 2)
        out["ivfpq_recall_at10"] = round(_recall_at10(rows, truth), 4)

        line = json.dumps(out)
        print(line)
        if out_path:
            with open(out_path, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
