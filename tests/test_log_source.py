"""The commit-log Python DataSource (streaming/log_source.py): batch
reads plan from the manifest and apply deletion vectors by
executor-local position masking; streaming reads use commit versions
as offsets — exactly-once across restarts via the checkpoint, an
append-only guard, and Delta-style ignoreChanges re-emission."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ome_arrow_spark.sources import table_log as tl
from ome_arrow_spark.streaming import log_source


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "tbl"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _run(spark, t, out, ckpt, **opts):
    reader = spark.readStream.format("ome_table_log").option("path", t)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


class TestBatchSource:
    def test_batch_read_applies_dv_by_position_mask(self, spark, dirs):
        t, _, _ = dirs
        log_source.register(spark)
        tl.create_table(spark, _df(spark, 0, 100).repartition(3), t)
        tl.delete_from_table(spark, t, "k < 10", mode="dv")
        got = spark.read.format("ome_table_log").option("path", t).load()
        assert got.count() == 90
        assert sorted(r["k"] for r in got.collect()) == list(range(10, 100))
        # no join in the plan: DVs were applied inside the scan
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan

    def test_batch_matches_dataframe_reader(self, spark, dirs):
        t, _, _ = dirs
        log_source.register(spark)
        tl.create_table(spark, _df(spark, 0, 500).repartition(4), t)
        tl.delete_from_table(spark, t, "k % 3 = 0", mode="dv")
        a = sorted(
            tuple(r)
            for r in spark.read.format("ome_table_log")
            .option("path", t).load().collect()
        )
        b = sorted(tuple(r) for r in tl.read_table(spark, t).collect())
        assert a == b


class TestStreamSource:
    @pytest.mark.heavy
    def test_initial_batch_appends_and_exactly_once_restart(
        self, spark, dirs
    ):
        t, out, ckpt = dirs
        log_source.register(spark)
        tl.create_table(spark, _df(spark, 0, 100).repartition(3), t)
        _run(spark, t, out, ckpt)
        assert spark.read.parquet(out).count() == 100
        tl.append_table(spark, _df(spark, 100, 130), t)
        tl.append_table(spark, _df(spark, 130, 150), t)
        _run(spark, t, out, ckpt)
        got = spark.read.parquet(out)
        assert got.count() == 150
        assert sorted(r["k"] for r in got.collect()) == list(range(150))
        # re-run with no new commits: nothing re-emitted
        _run(spark, t, out, ckpt)
        assert spark.read.parquet(out).count() == 150

    @pytest.mark.heavy
    def test_append_only_guard_and_ignore_changes(self, spark, dirs):
        t, out, ckpt = dirs
        log_source.register(spark)
        tl.create_table(spark, _df(spark, 0, 100).coalesce(1), t)
        _run(spark, t, out, ckpt)
        tl.upsert_table(
            spark,
            _df(spark, 0, 5).withColumn("v", F.lit(-1).cast("long")),
            t, key="k",
        )
        with pytest.raises(Exception, match="append-only"):
            _run(spark, t, out, ckpt)
        # ignoreChanges: the rewritten file re-emits whole (duplicates
        # possible, loss impossible — Delta's contract)
        _run(spark, t, out, ckpt, ignoreChanges="true")
        got = spark.read.parquet(out)
        assert got.count() == 200
        assert got.filter("v = -1").count() == 5

    @pytest.mark.heavy
    def test_start_version_skips_history(self, spark, dirs):
        t, out, ckpt = dirs
        log_source.register(spark)
        tl.create_table(spark, _df(spark, 0, 100), t)
        tl.append_table(spark, _df(spark, 100, 120), t)  # v1
        _run(spark, t, out, ckpt, startVersion="0")
        got = spark.read.parquet(out)
        assert sorted(r["k"] for r in got.collect()) == list(range(100, 120))

    def test_streamed_dv_files_mask_positions(self, spark, dirs):
        """A DV'd file present in the FIRST batch streams its live
        rows only."""
        t, out, ckpt = dirs
        log_source.register(spark)
        tl.create_table(spark, _df(spark, 0, 100).coalesce(1), t)
        tl.delete_from_table(spark, t, "k >= 90", mode="dv")
        # start after the delete commit: first batch = current snapshot
        _run(spark, t, out, ckpt)
        assert spark.read.parquet(out).count() == 90


class TestWriter:
    @pytest.mark.heavy
    def test_batch_write_create_append_overwrite_time_travel(
        self, spark, dirs
    ):
        t, _, _ = dirs
        log_source.register(spark)
        df = _df(spark, 0, 100)
        df.repartition(3).write.format("ome_table_log").option(
            "path", t
        ).mode("append").save()
        assert tl.current_version(t) == 0  # created the table
        assert tl.read_table(spark, t).count() == 100
        df.write.format("ome_table_log").option("path", t).mode(
            "append"
        ).save()
        assert tl.read_table(spark, t).count() == 200
        _df(spark, 0, 5).write.format("ome_table_log").option(
            "path", t
        ).mode("overwrite").save()
        assert tl.read_table(spark, t).count() == 5
        # the overwrite is one commit; prior snapshots stay readable
        assert [h["operation"] for h in tl.table_history(t)] == [
            "create", "append", "overwrite"
        ]
        assert tl.read_table(spark, t, version=1).count() == 200

    @pytest.mark.heavy
    def test_write_schema_mismatch_rejected(self, spark, dirs):
        t, _, _ = dirs
        log_source.register(spark)
        _df(spark, 0, 10).write.format("ome_table_log").option(
            "path", t
        ).mode("append").save()
        bad = spark.range(3).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("v")
        )
        with pytest.raises(Exception, match="schema mismatch"):
            bad.write.format("ome_table_log").option("path", t).mode(
                "append"
            ).save()

    @pytest.mark.heavy
    def test_stream_sink_txn_idempotence(self, spark, dirs, tmp_path):
        t, _, ckpt = dirs
        log_source.register(spark)
        src = str(tmp_path / "src")
        _df(spark, 0, 50).write.parquet(src)
        q = (
            spark.readStream.schema("k long, v long").parquet(src)
            .writeStream.format("ome_table_log").option("path", t)
            .option("txnAppId", "app1")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert tl.read_table(spark, t).count() == 50
        assert tl.table_properties(t)["txn.app1"] == "0"
        # a REPLAYED batch (same batchId) must be skipped, not doubled
        from ome_arrow_spark.streaming.log_source import _LogStreamWriter

        w = _LogStreamWriter(t, tl.read_table(spark, t).schema, "app1")
        msg = w.write(iter(_df(spark, 100, 110).collect()))
        w.commit([msg], batchId=0)
        assert tl.read_table(spark, t).count() == 50  # skipped
        # a NEW batch id lands
        msg = w.write(iter(_df(spark, 100, 110).collect()))
        w.commit([msg], batchId=1)
        assert tl.read_table(spark, t).count() == 60
        assert tl.table_properties(t)["txn.app1"] == "1"

    def test_sink_then_source_roundtrip(self, spark, dirs, tmp_path):
        """Write through the sink, stream back through the source."""
        t, out, ckpt = dirs
        log_source.register(spark)
        _df(spark, 0, 80).write.format("ome_table_log").option(
            "path", t
        ).mode("append").save()
        _run(spark, t, out, str(tmp_path / "ck2"))
        assert sorted(
            r["k"] for r in spark.read.parquet(out).collect()
        ) == list(range(80))


def test_source_streams_nested_ome_schema(spark, tmp_path):
    """The deeply nested OME struct (arrays of structs of arrays)
    round-trips through the DataSource's Arrow path."""
    from ome_arrow_spark import synth
    from ome_arrow_spark.sources.table_log import create_ome_table

    log_source.register(spark)
    t = str(tmp_path / "ome")
    imgs = synth.golden_images_df(spark, ids=["z-series", "single-channel"])
    create_ome_table(spark, imgs, t)
    got = spark.read.format("ome_table_log").option("path", t).load()
    want = tl.read_table(spark, t)
    assert got.schema == want.schema
    a = {r["image_id"]: r for r in got.collect()}
    b = {r["image_id"]: r for r in want.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == b[k]
