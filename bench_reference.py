"""Head-to-head vs the reference implementation at the same data scale
(BASELINE target: match-or-beat single-node throughput).

Workload: N OME images persisted as parquet → crop+keep-list slice →
per-image pixel sums. Both sides run the full pipeline from disk:

* reference: its eager path — read parquet, rebuild Python records
  (what from_ome_parquet does: pq.read_table + as_py, ingest.py:864-916),
  then ``slice_ome_arrow`` per record (transform.py), then sum. The
  reference package is imported read-only from /root/reference (pure
  numpy/pyarrow modules only) with a shim for its generated
  ``_version`` module; no reference code is copied.
* engine: spark.read.parquet → slice_images (one Catalyst expression)
  → plane_stats → collect, on local[32].

Results are asserted identical. Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import types

import numpy as np
import pyarrow.parquet as pq

N_IMAGES = 64
SHAPE = (1, 3, 5, 167, 439)  # multi-channel-z golden shape ≈ 1.1 Mpx
CROP = (100, 150, 30, 90)
KEEP_C = [0, 2]
KEEP_Z = [1, 3, 4]


def load_reference():
    sys.path.insert(0, "/root/reference/src")
    pkg = types.ModuleType("ome_arrow")
    pkg.__path__ = ["/root/reference/src/ome_arrow"]
    ver = types.ModuleType("ome_arrow._version")
    ver.version = ver.__version__ = "0.0.0-bench"
    sys.modules.setdefault("ome_arrow", pkg)
    sys.modules.setdefault("ome_arrow._version", ver)
    import ome_arrow.transform as ref_transform  # noqa: E402
    import ome_arrow.utils as ref_utils  # noqa: E402

    return ref_transform, ref_utils


def make_records(n: int):
    from ome_arrow_spark import synth

    recs = []
    for i in range(n):
        r = synth.golden_record(f"img{i:03d}", *SHAPE)
        r["planes"] = [
            {**p, "pixels": np.ascontiguousarray(p["pixels"], dtype=np.int32)}
            for p in r["planes"]
        ]
        recs.append(r)
    return recs


def main() -> None:
    from ome_arrow_spark.operators.slice_op import slice_images
    from ome_arrow_spark.operators.views import plane_stats
    from ome_arrow_spark.session import get_spark
    from ome_arrow_spark.sources.ome_parquet import (
        spark_table_from_records,
        write_ome_parquet,
    )

    ref_transform, _ = load_reference()
    x0, x1, y0, y1 = CROP

    spark = get_spark("bench-reference")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_ref_")
    table_path = f"{tmp}/images"
    try:
        records = make_records(N_IMAGES)
        write_ome_parquet(
            spark_table_from_records(spark, records),
            table_path,
            mode="overwrite",
            target_rows_per_file=4,
        )
        del records
        spark.range(10).count()  # warm scheduler

        # --- reference pipeline: eager read + per-record Python slice ---
        t0 = time.perf_counter()
        ref_sums = {}
        tbl = pq.read_table(table_path)
        for i in range(tbl.num_rows):
            rec = tbl.column("ome_arrow")[i].as_py()  # ingest.py:916 semantics
            sliced = ref_transform.slice_ome_arrow(
                rec, x_min=x0, x_max=x1, y_min=y0, y_max=y1,
                c_indices=KEEP_C, z_indices=KEEP_Z,
            ).as_py()
            ref_sums[rec["id"]] = sum(sum(p["pixels"]) for p in sliced["planes"])
        ref_s = time.perf_counter() - t0

        # --- engine pipeline: scan → slice expression → per-image sums,
        # computed INLINE over the sliced struct (single projection, no
        # explode: the right plan for a per-image reduction) ---
        from pyspark.sql import functions as SF

        t0 = time.perf_counter()
        imgs = spark.read.parquet(table_path)
        sliced = slice_images(
            imgs, x0, x1, y0, y1, c_indices=KEEP_C, z_indices=KEEP_Z, validate=False
        )
        got = sliced.select(
            SF.col("ome_arrow.id").alias("image_id"),
            SF.expr(
                "aggregate(ome_arrow.planes, 0L, "
                "(a, p) -> a + aggregate(p.pixels, 0L, (x, v) -> x + v))"
            ).alias("px_sum"),
        ).collect()
        spark_s = time.perf_counter() - t0
        spark_sums = {r["image_id"]: r["px_sum"] for r in got}
        assert spark_sums == ref_sums, "slice results diverge from reference"

        # secondary: the naive explode-then-aggregate plan (what a user
        # gets without thinking about plan shape) — reported for honesty
        t0 = time.perf_counter()
        plane_stats(sliced).groupBy("image_id").sum("px_sum").collect()
        spark_explode_s = time.perf_counter() - t0

        # --- catalog query head-to-head: per-image shape/type summary.
        # The reference must eager-read every record (pixels included —
        # pq.read_table + as_py is its only parquet path) before
        # utils.describe_ome_arrow can report shapes; the engine's
        # describe is a nested-field projection that never touches
        # `planes` (nestedSchemaPruning) — the reason to store images
        # in a queryable table at all. Summaries asserted identical.
        _, ref_utils = load_reference()
        t0 = time.perf_counter()
        tbl2 = pq.read_table(table_path)
        ref_desc = {}
        for i in range(tbl2.num_rows):
            rec = tbl2.column("ome_arrow")[i].as_py()
            ref_desc[rec["id"]] = ref_utils.describe_ome_arrow(rec)["summary"]
        ref_describe_s = time.perf_counter() - t0

        from ome_arrow_spark.operators.describe import describe

        t0 = time.perf_counter()
        got_desc = {
            r["image_id"]: r["summary"]
            for r in describe(spark.read.parquet(table_path))
            .select("image_id", "summary")
            .collect()
        }
        engine_describe_s = time.perf_counter() - t0
        assert got_desc == ref_desc, "describe summaries diverge from reference"

        print(
            json.dumps(
                {
                    "images": N_IMAGES,
                    "pixels_per_image": int(np.prod(SHAPE)),
                    "reference_pipeline_s": round(ref_s, 3),
                    "engine_pipeline_s": round(spark_s, 3),
                    "engine_explode_plan_s": round(spark_explode_s, 3),
                    "speedup": round(ref_s / spark_s, 2),
                    "reference_describe_s": round(ref_describe_s, 3),
                    "engine_describe_s": round(engine_describe_s, 3),
                    "describe_speedup": round(ref_describe_s / engine_describe_s, 2),
                    "results_match": True,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
