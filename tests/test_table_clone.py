"""clone_table: Delta CREATE TABLE ... [SHALLOW|DEEP] CLONE semantics
over the commit log — version-pinned snapshots, zero-copy shallow
references (absolute paths pass through every path-resolving read),
copy-on-write independence, and the documented source-vacuum caveat."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ome_arrow_spark.sources import table_log as tl


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )


def _rows(spark, t):
    return sorted(tuple(r) for r in tl.read_table(spark, t).collect())


def _parquet_files(d):
    return [n for n in os.listdir(d) if n.endswith(".parquet")]


@pytest.fixture()
def src(spark, tmp_path):
    t = str(tmp_path / "src")
    tl.create_table(spark, _df(spark, 0, 100).repartition(3), t)  # v0
    tl.append_table(spark, _df(spark, 100, 150), t)  # v1
    return t


class TestDeepClone:
    def test_deep_clone_equals_source_and_evolves_independently(
        self, spark, src, tmp_path
    ):
        c = str(tmp_path / "deep")
        assert tl.clone_table(spark, src, c) == 0
        assert _rows(spark, c) == _rows(spark, src)
        # stats/blooms/properties carried: pruning works immediately
        assert tl.table_properties(c)["clone.shallow"] == "false"
        # clone gains rows, source does not (and vice versa)
        tl.append_table(spark, _df(spark, 150, 160), c)
        assert tl.read_table(spark, c).count() == 160
        assert tl.read_table(spark, src).count() == 150
        tl.append_table(spark, _df(spark, 900, 905), src)
        assert tl.read_table(spark, c).count() == 160

    def test_clone_version_as_of(self, spark, src, tmp_path):
        c = str(tmp_path / "v0clone")
        tl.clone_table(spark, src, c, version=0)
        assert tl.read_table(spark, c).count() == 100
        assert tl.table_properties(c)["clone.sourceVersion"] == "0"

    def test_clone_refuses_existing_target(self, spark, src, tmp_path):
        c = str(tmp_path / "dup")
        tl.clone_table(spark, src, c)
        with pytest.raises(tl.TableLogError, match="already exists"):
            tl.clone_table(spark, src, c)


class TestShallowClone:
    def test_zero_copy_then_copy_on_write(self, spark, src, tmp_path):
        c = str(tmp_path / "shallow")
        tl.clone_table(spark, src, c, shallow=True)
        # zero data movement: no parquet in the clone dir
        assert _parquet_files(c) == []
        assert _rows(spark, c) == _rows(spark, src)
        # COW: an upsert on the clone writes local files and leaves
        # the source byte-identical
        before = set(_parquet_files(src))
        tl.upsert_table(
            spark,
            _df(spark, 0, 5).withColumn("v", F.lit(-1).cast("long")),
            c,
            key="k",
        )
        assert set(_parquet_files(src)) == before
        assert tl.read_table(spark, c).filter("v = -1").count() == 5
        assert tl.read_table(spark, src).filter("v = -1").count() == 0

    def test_clone_vacuum_never_touches_source(self, spark, src, tmp_path):
        c = str(tmp_path / "shv")
        tl.clone_table(spark, src, c, shallow=True)
        tl.upsert_table(
            spark,
            _df(spark, 0, 5).withColumn("v", F.lit(-1).cast("long")),
            c,
            key="k",
        )
        before = set(_parquet_files(src))
        tl.vacuum_table(c, keep_versions=1, retention_seconds=0.0)
        assert set(_parquet_files(src)) == before
        assert tl.read_table(spark, c).count() == 150

    def test_source_vacuum_breaks_shallow_clone_documented(
        self, spark, src, tmp_path
    ):
        c = str(tmp_path / "shb")
        tl.clone_table(spark, src, c, version=0, shallow=True)
        # source compacts + vacuums: v0's files are reclaimed
        tl.compact_table(spark, src)
        tl.vacuum_table(src, keep_versions=1, retention_seconds=0.0)
        with pytest.raises(Exception):
            tl.read_table(spark, c).count()

    def test_shallow_clone_carries_deletion_vectors(
        self, spark, src, tmp_path
    ):
        tl.delete_from_table(spark, src, "k < 10", mode="dv")
        c = str(tmp_path / "shdv")
        tl.clone_table(spark, src, c, shallow=True)
        got = sorted(r["k"] for r in tl.read_table(spark, c).collect())
        assert got == list(range(10, 150))
        # sidecar was copied locally: deleting the SOURCE sidecar via
        # source vacuum of later versions must not affect the clone
        assert os.path.isdir(os.path.join(c, tl.DV_DIR))

    def test_deep_clone_of_shallow_clone_rematerializes(
        self, spark, src, tmp_path
    ):
        sh = str(tmp_path / "sh")
        dp = str(tmp_path / "dp")
        tl.clone_table(spark, src, sh, shallow=True)
        tl.clone_table(spark, sh, dp)  # deep re-materialization
        assert len(_parquet_files(dp)) > 0
        assert _rows(spark, dp) == _rows(spark, src)
        # now fully independent of BOTH ancestors
        tl.compact_table(spark, src)
        tl.vacuum_table(src, keep_versions=1, retention_seconds=0.0)
        assert tl.read_table(spark, dp).count() == 150
