"""Streaming-ingest soak (VERDICT r8 item 6): a 5,000-image
rate-limited acquisition stream killed mid-batch AFTER the table commit
landed but BEFORE the checkpoint recorded the batch — the worst-case
crash window for a foreachBatch sink — then restarted to convergence.

What it proves, end to end, at 25× the unit-test scale
(tests/test_log_source.py covers the 150-row restart case):

* the binaryFile source log + idempotent image-id MERGE give
  exactly-once table contents across a crash that DID duplicate the
  side effect (the replayed batch re-upserts the same images),
* the commit log stays linear (one snapshot per applied batch, the
  replayed batch adds one more — no fork, no skipped version),
* vacuum(keep_versions=1, retention=0) after convergence leaves ZERO
  unreferenced files in the table directory: every crash/replay
  leftover is either referenced by the final snapshot or reclaimed.

The companion bench metric (stream_ingest_steady_200 in bench.py)
carries the steady-state img/s; this test carries the crash semantics.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from ome_arrow_spark.sources import table_log as tl
from ome_arrow_spark.sources.tiff import encode_ftif, from_tiff_stream
from ome_arrow_spark.streaming.events import run_foreach_batch

N_IMAGES = 5000
SIDE = 48
FILES_PER_TRIGGER = 500  # rate limit → 10 micro-batches
KILL_AT_BATCH = 3


@pytest.mark.heavy
def test_stream_soak_kill_mid_batch_converges_and_vacuums_clean(spark):
    src = tempfile.mkdtemp(prefix="soak_src_")
    root = tempfile.mkdtemp(prefix="soak_tbl_")
    table = os.path.join(root, "t")
    ckpt = os.path.join(root, "ckpt")
    try:
        base = (np.arange(SIDE * SIDE, dtype=np.int64) % 65536).reshape(
            1, 1, 1, SIDE, SIDE
        )
        for i in range(N_IMAGES):
            blob = encode_ftif((base + i) % 65536, image_id=f"img{i:05d}")
            with open(os.path.join(src, f"img{i:05d}.ftif"), "wb") as f:
                f.write(blob)

        def merge(kill_at):
            def fn(batch_df, batch_id):
                if batch_df.isEmpty():
                    return
                if tl.current_version(table) is None:
                    tl.create_ome_table(spark, batch_df, table)
                else:
                    tl.upsert_ome_table(spark, batch_df, table)
                # crash AFTER the table commit, BEFORE the streaming
                # checkpoint marks the batch done — the window where a
                # non-idempotent sink would double-ingest
                if batch_id == kill_at:
                    raise RuntimeError("injected mid-batch kill")

            return fn

        stream = lambda: from_tiff_stream(  # noqa: E731
            spark, src, glob="*.ftif",
            max_files_per_trigger=FILES_PER_TRIGGER,
        )
        with pytest.raises(Exception, match="injected mid-batch kill"):
            run_foreach_batch(
                stream(), merge(KILL_AT_BATCH), output_mode="append",
                checkpoint=ckpt,
            )
        v_crash = tl.current_version(table)
        # batches 0..KILL_AT_BATCH committed to the table before death
        assert v_crash == KILL_AT_BATCH
        n_crash = tl.read_ome_table(spark, table).count()
        assert n_crash == (KILL_AT_BATCH + 1) * FILES_PER_TRIGGER

        # restart from the same checkpoint: the killed batch replays
        # (duplicate side effect), MERGE absorbs it, stream drains
        run_foreach_batch(
            stream(), merge(kill_at=-1), output_mode="append",
            checkpoint=ckpt,
        )
        imgs = tl.read_ome_table(spark, table)
        assert imgs.count() == N_IMAGES
        assert (
            imgs.select(F.col("ome_arrow.id")).distinct().count() == N_IMAGES
        )
        # linear history: create + one upsert per micro-batch, with the
        # killed batch applied twice (once pre-crash, once on replay)
        n_batches = N_IMAGES // FILES_PER_TRIGGER
        assert tl.current_version(table) == n_batches  # 0..n_batches

        # sampled pixel parity across the whole id range
        got = {
            r["image_id"]: r["psum"]
            for r in imgs.select(
                F.col("ome_arrow.id").alias("image_id"),
                F.aggregate(
                    F.element_at("ome_arrow.planes", 1).pixels,
                    F.lit(0).cast("long"),
                    lambda a, v: a + v,
                ).alias("psum"),
            )
            .filter(F.col("image_id").isin(
                ["img00000", "img00499", "img01750", "img04999"]
            ))
            .collect()
        }
        for i in (0, 499, 1750, 4999):
            want = int(((base.ravel() + i) % 65536).sum())
            assert got[f"img{i:05d}"] == want, i

        # idempotent drain: nothing new → no new commit
        run_foreach_batch(
            stream(), merge(kill_at=-1), output_mode="append",
            checkpoint=ckpt,
        )
        assert tl.current_version(table) == n_batches

        # vacuum to the latest snapshot only: afterwards, the table dir
        # holds exactly the referenced data files (zero orphans — the
        # crash/replay rewrites are all reclaimed) and reads intact
        tl.vacuum_table(table, keep_versions=1, retention_seconds=0.0)
        referenced = set(
            _resolve_final_files(table)
        )
        on_disk = {
            name for name in os.listdir(table) if name != tl.LOG_DIR
        }
        assert on_disk == referenced
        assert tl.read_ome_table(spark, table).count() == N_IMAGES
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)


def _resolve_final_files(table: str) -> list[str]:
    snap = tl._resolve_snapshot(table, tl.current_version(table))
    return list(snap["files"])
