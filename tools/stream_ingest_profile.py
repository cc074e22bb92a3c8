"""Streaming-ingest throughput profile (VERDICT r10 Next-round #5).

Decomposes `stream_ingest_steady_200`'s wall into its three levers:

  * sink strategy  — per-batch MERGE (`upsert_ome_table`: manifest
    prune + anti-join rewrite of overlapping files) vs idempotent
    blind APPEND (`append_ome_table`: O(new-data) write + one log
    commit, exactly-once via the txnAppId/txnVersion contract);
  * micro-batch size — `maxFilesPerTrigger` in {25, 50, 100, 200}
    (200 images fixed, so batches = 200/fpt);
  * the decode floor — the same 200 images through the BATCH reader
    (`from_tiff_dir` + count), no streaming engine, no commits.

Prints one table row per (sink, fpt) cell: wall seconds, img/s, and
per-batch overhead versus the decode floor ((wall - floor) / batches).
The floor row shows what the micro-batch machinery itself costs; the
merge-vs-append delta shows what the MERGE read-side costs.

Usage: python tools/stream_ingest_profile.py [n_images] [side]

Process mode (VERDICT r12 Next-round #4 — the independent-driver
regime PLANS.md r12 predicted scales linearly where same-driver
threads bought only 1.59x):

    python tools/stream_ingest_profile.py --processes N [n_images] [side]

launches N SEPARATE python processes (each its own JVM driver — the
one-spark-submit-per-shard cluster posture), each ingesting a
disjoint directory shard through the append sink.  Reports each
worker's stream wall (session startup excluded), the aggregate img/s
over max(worker walls), and the scaling factor vs one process.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(shard_dir: str, n_expected: int) -> None:
    """Child-process entry: own SparkSession, stream the shard into an
    append-sink table, print the stream wall (startup excluded)."""
    from pyspark.sql import SparkSession

    from ome_arrow_spark.sources import table_log as tl
    from ome_arrow_spark.sources.tiff import from_tiff_stream
    from ome_arrow_spark.streaming.events import run_foreach_batch

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName(f"sprof-worker-{os.path.basename(shard_dir)}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    table = tempfile.mkdtemp(prefix="sprof_ptbl_") + "/t"

    def sink_fn(batch_df, batch_id):
        # no isEmpty() guard (r14 shipped sink config)
        if tl.current_version(table) is None:
            tl.create_ome_table(
                spark, batch_df, table, txn_app="sprofp", txn_batch=batch_id
            )
        else:
            tl.append_ome_table(
                spark, batch_df, table, txn_app="sprofp", txn_batch=batch_id
            )

    t0 = time.time()
    run_foreach_batch(
        from_tiff_stream(
            spark, shard_dir, glob="*.ftif", max_files_per_trigger=25
        ),
        sink_fn,
        output_mode="append",
    )
    wall = time.time() - t0
    n = tl.read_ome_table(spark, table).count()
    shutil.rmtree(os.path.dirname(table), ignore_errors=True)
    assert n == n_expected, f"worker {shard_dir}: {n}/{n_expected}"
    print(f"WORKER_WALL {wall:.3f}", flush=True)
    spark.stop()


def _processes_main(n_procs: int, n_images: int, side: int) -> None:
    import numpy as np

    from ome_arrow_spark.sources.tiff import encode_ftif

    src = tempfile.mkdtemp(prefix="sprofp_src_")
    base = (np.arange(side * side, dtype=np.int64) % 65536).reshape(
        1, 1, 1, side, side
    )
    for i in range(n_images):
        blob = encode_ftif((base + i) % 65536, image_id=f"img{i:04d}")
        with open(os.path.join(src, f"img{i:04d}.ftif"), "wb") as f:
            f.write(blob)

    print(f"{'procs':>5} {'files/proc':>10} {'max_wall_s':>10} "
          f"{'agg img/s':>9} {'x single':>8}")
    single = None
    try:
        for n in ([1, n_procs] if n_procs > 1 else [1]):
            shard_dirs = [
                tempfile.mkdtemp(prefix=f"sprofp_shard{i}_") for i in range(n)
            ]
            for j, fname in enumerate(sorted(os.listdir(src))):
                os.link(
                    os.path.join(src, fname),
                    os.path.join(shard_dirs[j % n], fname),
                )
            per = [
                len(os.listdir(d)) for d in shard_dirs
            ]
            procs = [
                subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__),
                     "--worker", shard_dirs[i], str(per[i])],
                    stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                    text=True,
                )
                for i in range(n)
            ]
            walls = []
            for p in procs:
                out, _ = p.communicate()
                assert p.returncode == 0, f"worker rc={p.returncode}"
                walls.append(
                    float(
                        [ln for ln in out.splitlines()
                         if ln.startswith("WORKER_WALL")][0].split()[1]
                    )
                )
            for d in shard_dirs:
                shutil.rmtree(d, ignore_errors=True)
            agg_wall = max(walls)
            rate = n_images / agg_wall
            if single is None:
                single = rate
            print(
                f"{n:>5} {n_images // n:>10} {agg_wall:>10.3f} "
                f"{rate:>9.1f} {rate / single:>8.2f}  walls={walls}"
            )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], int(sys.argv[3]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--processes":
        _processes_main(
            int(sys.argv[2]),
            int(sys.argv[3]) if len(sys.argv) > 3 else 200,
            int(sys.argv[4]) if len(sys.argv) > 4 else 256,
        )
        return
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import numpy as np
    from pyspark.sql import SparkSession

    from ome_arrow_spark.sources import table_log as tl
    from ome_arrow_spark.sources.tiff import (
        encode_ftif,
        from_tiff_dir,
        from_tiff_stream,
    )
    from ome_arrow_spark.streaming.events import run_foreach_batch

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("stream-ingest-profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = tempfile.mkdtemp(prefix="sprof_src_")
    base = (np.arange(side * side, dtype=np.int64) % 65536).reshape(1, 1, 1, side, side)
    for i in range(n_images):
        blob = encode_ftif((base + i) % 65536, image_id=f"img{i:04d}")
        with open(os.path.join(src, f"img{i:04d}.ftif"), "wb") as f:
            f.write(blob)

    # decode floor: the batch reader over the same files, no streaming.
    def batch_floor() -> float:
        t0 = time.time()
        assert from_tiff_dir(spark, src, glob="*.ftif").count() == n_images
        return time.time() - t0

    floors = [batch_floor() for _ in range(3)]
    floor = min(floors)
    print(f"decode_floor: {floor:.3f}s  ({n_images / floor:.1f} img/s)  runs={['%.3f' % f for f in floors]}")

    def run_stream(sink: str, fpt: int) -> float:
        table = tempfile.mkdtemp(prefix="sprof_tbl_") + "/t"
        try:
            def merge(batch_df, batch_id):
                # no isEmpty() guard (r14 shipped sink config)
                if tl.current_version(table) is None:
                    tl.create_ome_table(spark, batch_df, table)
                elif sink == "merge":
                    tl.upsert_ome_table(spark, batch_df, table)
                else:
                    tl.append_ome_table(
                        spark, batch_df, table,
                        txn_app="sprof", txn_batch=batch_id,
                    )

            t0 = time.time()
            run_foreach_batch(
                from_tiff_stream(spark, src, glob="*.ftif", max_files_per_trigger=fpt),
                merge,
                output_mode="append",
            )
            dt = time.time() - t0
            n = tl.read_ome_table(spark, table).count()
            assert n == n_images, f"{sink}/fpt={fpt}: {n}/{n_images}"
            return dt
        finally:
            shutil.rmtree(os.path.dirname(table), ignore_errors=True)

    print(f"{'sink':>7} {'fpt':>4} {'batches':>7} {'wall_s':>7} {'img/s':>7} {'overhead/batch_s':>17}")
    for sink in ("merge", "append"):
        for fpt in (25, 50, 100, 200):
            batches = (n_images + fpt - 1) // fpt
            wall = min(run_stream(sink, fpt) for _ in range(2))
            per_batch = (wall - floor) / batches
            print(
                f"{sink:>7} {fpt:>4} {batches:>7} {wall:>7.3f} "
                f"{n_images / wall:>7.1f} {per_batch:>17.3f}"
            )

    # ---- multi-stream sharded ingest (VERDICT r11 Next-round #5) ----
    # The ~1.4 s/trigger floor is per-STREAM engine overhead (micro-
    # batch planning + Python worker round-trips), serialized within a
    # stream but independent ACROSS streams. N concurrent streams over
    # disjoint directory shards — each with its own source, checkpoint,
    # append-sink table — overlap their floors, so aggregate img/s
    # should scale ≈ N × single-stream until the box's cores saturate.
    # (On a cluster each stream is just a separate job; nothing below
    # is local-mode-specific except the shared 32 cores.)
    from concurrent.futures import ThreadPoolExecutor

    def run_multi(n_streams: int, fpt: int) -> float:
        shard_dirs = []
        for i in range(n_streams):
            sd = tempfile.mkdtemp(prefix=f"sprof_shard{i}_")
            shard_dirs.append(sd)
        for j, fname in enumerate(sorted(os.listdir(src))):
            os.link(
                os.path.join(src, fname),
                os.path.join(shard_dirs[j % n_streams], fname),
            )
        tables = [
            tempfile.mkdtemp(prefix=f"sprof_mtbl{i}_") + "/t"
            for i in range(n_streams)
        ]

        def one(i: int) -> None:
            def sink_fn(batch_df, batch_id):
                # no isEmpty() guard (r14 shipped sink config)
                if tl.current_version(tables[i]) is None:
                    tl.create_ome_table(
                        spark, batch_df, tables[i],
                        txn_app=f"sprof{i}", txn_batch=batch_id,
                    )
                else:
                    tl.append_ome_table(
                        spark, batch_df, tables[i],
                        txn_app=f"sprof{i}", txn_batch=batch_id,
                    )

            run_foreach_batch(
                from_tiff_stream(
                    spark, shard_dirs[i], glob="*.ftif",
                    max_files_per_trigger=fpt,
                ),
                sink_fn,
                output_mode="append",
            )

        try:
            t0 = time.time()
            with ThreadPoolExecutor(max_workers=n_streams) as ex:
                list(ex.map(one, range(n_streams)))
            dt = time.time() - t0
            total = sum(
                tl.read_ome_table(spark, t).count() for t in tables
            )
            assert total == n_images, f"multi({n_streams}): {total}/{n_images}"
            return dt
        finally:
            for p in shard_dirs:
                shutil.rmtree(p, ignore_errors=True)
            for t in tables:
                shutil.rmtree(os.path.dirname(t), ignore_errors=True)

    fpt = 25
    print(f"\n{'streams':>7} {'fpt':>4} {'files/stream':>12} {'wall_s':>7} {'agg img/s':>9} {'x single':>8}")
    single = None
    for n_streams in (1, 2, 4):
        wall = min(run_multi(n_streams, fpt) for _ in range(2))
        rate = n_images / wall
        if single is None:
            single = rate
        print(
            f"{n_streams:>7} {fpt:>4} {n_images // n_streams:>12} "
            f"{wall:>7.3f} {rate:>9.1f} {rate / single:>8.2f}"
        )

    shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
