"""knn_join_lsh recall-vs-cost sweep (r13 follow-on to
tools/bigsf_verify.py, which measured recall@2-vs-exact = 0.44 at sf1
under the default n_tables=8).

The kNN-join's LSH recall is a data-and-parameter property, not a
correctness property (the driver gate proves emitted == exact top-k
over the candidate relation); this tool turns the quality knob into a
measured curve: for n_tables in {8, 16, 32}, rerun the operator on a
fixed 500-query left sample (per-qid results are independent — planes
and bucket allow-lists derive from the right side), score recall@2
against an exact numpy brute force over the FULL right side, and
record the candidate volume the extra tables buy it with.  Candidate
volume stays LINEAR in |left| at every point (bound 2·n·tables·256 —
the same gate the registered query asserts).

Usage: python tools/knn_recall_sweep.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.local_testdata/sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ome_arrow_spark.operators.similarity import (
        knn_join_candidates,
        knn_join_lsh as KJ,
    )
    from ome_arrow_spark.suite import _t

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("knn_recall_sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = _t(spark, sf_dir, "embeddings")
    left = emb.filter(F.col("vec_id") % 4 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    right = emb.filter(F.col("vec_id") % 4 != 0).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    sample_q = left.orderBy(F.md5(F.col("qid").cast("string"))).limit(500)
    q_rows = sample_q.collect()
    r_rows = right.collect()
    rid = np.array([r["cid"] for r in r_rows])
    rmat = np.array([r["embedding"] for r in r_rows], dtype=np.float64)
    rnorm = np.linalg.norm(rmat, axis=1)

    exact_ids = {}
    for qr in q_rows:
        qv = np.array(qr["embedding"], dtype=np.float64)
        cos_r = np.round((rmat @ qv) / (rnorm * np.linalg.norm(qv)), 6)
        order = sorted(range(len(rid)), key=lambda i: (-cos_r[i], rid[i]))
        exact_ids[qr["qid"]] = {int(rid[i]) for i in order[:2]}

    from ome_arrow_spark.operators.similarity import (
        knn_join_candidate_census,
        knn_join_planes,
        knn_join_tables,
    )

    # seed_mode xxhash = the production default (Arrow-batched matmul
    # signatures); recall is a property of the random hyperplanes, not
    # of which deterministic seed family draws them, and md5's in-plan
    # string fold is ~100× slower at the sf10 × 117-table point this
    # sweep exists to measure.  (r13's stamp used md5 at sf0.01/sf1 —
    # the 8/16/32-table recalls reproduce within sampling noise.)
    seed_mode = os.environ.get("KNN_SWEEP_SEED_MODE", "xxhash")
    n_left_full = left.count()
    planes = knn_join_planes(len(r_rows))
    derived = knn_join_tables(planes)
    table_points = sorted({8, 16, 32, derived})

    out = {"sf_dir": sf_dir, "n_right": len(r_rows),
           "n_left_full": n_left_full, "n_planes": planes,
           "derived_n_tables": derived, "seed_mode": seed_mode,
           "queries_sampled": len(q_rows), "sweep": []}
    for n_tables in table_points:
        t0 = time.perf_counter()
        cand = knn_join_candidates(
            sample_q, right, seed_mode=seed_mode, n_tables=n_tables
        ).persist()
        n_cand = cand.count()
        got = KJ(
            sample_q, right, k=2, seed_mode=seed_mode, n_tables=n_tables,
            candidates=cand,
        ).collect()
        cand.unpersist()
        wall = round(time.perf_counter() - t0, 2)
        hits = sum(1 for r in got if r["cid"] in exact_ids[r["qid"]])
        # FULL-left linearity evidence WITHOUT the pair shuffle: the
        # pre-dedup bucket-product census upper-bounds the deduped
        # candidate count the operator would materialize at this point
        t0 = time.perf_counter()
        census = knn_join_candidate_census(
            left, right, seed_mode=seed_mode, n_tables=n_tables
        )
        census_wall = round(time.perf_counter() - t0, 2)
        bound = 2 * n_left_full * n_tables * 256
        point = {
            "n_tables": n_tables,
            "derived_default": n_tables == derived,
            "sample_candidates": n_cand,
            "cand_per_query": round(n_cand / len(q_rows), 1),
            "recall_at2": round(hits / (2 * len(q_rows)), 4),
            "wall": wall,
            "full_left_census_predup": census,
            "full_left_linear_bound": bound,
            "census_within_bound": census <= bound,
            "census_wall": census_wall,
        }
        out["sweep"].append(point)
        print(json.dumps(point), flush=True)

    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
