"""Measure MinHash-LSH bucket skew and candidate-pair growth (VERDICT r8
item 5: "sf1 LSH posture").

`sf1_neardup_lsh` is the heaviest sf1 bench row (~10 s); the scale risk
of any LSH design is bucket skew — one boilerplate band bucket of B docs
emits B(B-1)/2 candidate pairs, so quadratic blowup hides inside a
"linear" pipeline. This tool measures, per scale factor, on the SAME
corpus the bench row runs (`_mutated_docs`: doc_id%5==0 docs plus a
1-token-shifted twin per doc):

1. the band-bucket size distribution (count of buckets at each size,
   plus the max bucket),
2. raw candidate pairs sum(B*(B-1)/2) vs pairs surviving the
   ``max_bucket`` cap the production operator applies,
3. pairs-per-doc — the sub-quadratic yardstick: if candidate pairs grow
   ~linearly with corpus size this ratio stays flat; quadratic blowup
   makes it grow with n.

Everything is computed with ONE aggregation over the band keys (no pair
materialization), so the tool itself is safe at any corpus size.

Usage: python tools/lsh_skew.py [sf_dir ...]
Emits one JSON line per sf_dir on stdout and a markdown block on stderr
for PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ome_arrow_spark.operators import dedup as DD  # noqa: E402
from ome_arrow_spark.session import get_spark  # noqa: E402
from ome_arrow_spark.suite_llm import _mutated_docs  # noqa: E402

BANDS: tuple[tuple[str, ...], ...] = (("mh0", "mh1"), ("mh2", "mh3"))
MAX_BUCKET = 1000  # the production lsh_candidates default


def analyze(spark, sf_dir: str) -> dict:
    docs = _mutated_docs(spark, sf_dir)
    n_docs = docs.count()
    sig = DD.minhash_signatures(docs)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws("|", *[F.col(c) for c in cols]).alias("band_key"),
            )
            for bi, cols in enumerate(BANDS)
        ]
    )
    bucket_sizes = (
        sig.select(F.explode(band_structs).alias("bk"))
        .groupBy("bk.band", "bk.band_key")
        .agg(F.count("*").alias("b"))
    )
    # One aggregation: distribution + pair sums, no pair rows created.
    pairs = (F.col("b") * (F.col("b") - 1) / 2).cast("long")
    stats = bucket_sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("b").alias("max_bucket"),
        F.sum(pairs).alias("pairs_raw"),
        F.sum(F.when(F.col("b") <= MAX_BUCKET, pairs).otherwise(0)).alias(
            "pairs_capped"
        ),
        F.sum(F.when(F.col("b") >= 2, 1).otherwise(0)).alias("buckets_ge2"),
    ).first()
    hist = {
        int(r["b"]): int(r["n"])
        for r in bucket_sizes.groupBy("b")
        .agg(F.count("*").alias("n"))
        .orderBy("b")
        .collect()
    }  # bounded: #distinct bucket sizes ≤ max bucket size (≤ a few dozen)
    return {
        "sf_dir": sf_dir,
        "n_docs": int(n_docs),
        "n_buckets": int(stats["n_buckets"]),
        "buckets_ge2": int(stats["buckets_ge2"]),
        "max_bucket": int(stats["max_bucket"]),
        "pairs_raw": int(stats["pairs_raw"]),
        "pairs_capped": int(stats["pairs_capped"]),
        "pairs_per_doc": round(stats["pairs_capped"] / max(n_docs, 1), 4),
        "bucket_size_hist": hist,
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("lsh-skew")
    rows = []
    for d in dirs:
        r = analyze(spark, d)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print("\n| corpus | docs | buckets≥2 | max bucket | pairs (raw) | "
          "pairs (capped) | pairs/doc |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(
            f"| {os.path.basename(r['sf_dir'].rstrip('/'))} | {r['n_docs']} "
            f"| {r['buckets_ge2']} | {r['max_bucket']} | {r['pairs_raw']} "
            f"| {r['pairs_capped']} | {r['pairs_per_doc']} |",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
