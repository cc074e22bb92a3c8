"""Deletion vectors (sources/table_log.py): DELETE as a positions
sidecar instead of a file rewrite — the Delta Lake DV shape.  Every
reader (snapshot read, MERGE, CDF, incremental aggregates, compaction,
OME point lookups) must see DV'd rows as gone; physical data files
must NOT be rewritten by the delete itself."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ome_arrow_spark.sources import table_log as tl


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _base(spark, n=1000):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("row-"), F.format_string("%06d", F.col("id"))).alias(
            "s"
        ),
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def _live_paths(tdir):
    return set(tl._resolve_snapshot(tdir)["files"])


class TestDvDelete:
    def test_dv_delete_reads_like_rewrite_without_rewriting(
        self, spark, tdir
    ):
        tl.create_table(spark, _base(spark).repartition(4), tdir)
        before = _live_paths(tdir)
        v = tl.delete_from_table(spark, tdir, "k % 7 = 0", mode="dv")
        assert v == 1
        # no data file was added or removed — same physical set
        assert _live_paths(tdir) == before
        got = _sorted(tl.read_table(spark, tdir))
        want = _sorted(_base(spark).filter("NOT (k % 7 = 0)"))
        assert got == want
        # manifest carries the vectors; cardinalities sum to matches
        snap = tl._resolve_snapshot(tdir)
        cards = [
            a["dv"]["cardinality"]
            for a in snap["files"].values()
            if a.get("dv")
        ]
        assert sum(cards) == 1000 // 7 + 1
        for a in snap["files"].values():
            if a.get("dv"):
                assert os.path.exists(os.path.join(tdir, a["dv"]["path"]))

    def test_second_dv_delete_merges_positions(self, spark, tdir):
        tl.create_table(spark, _base(spark).repartition(2), tdir)
        tl.delete_from_table(spark, tdir, "k < 100", mode="dv")
        tl.delete_from_table(spark, tdir, "k >= 900", mode="dv")
        assert _sorted(tl.read_table(spark, tdir)) == _sorted(
            _base(spark).filter("k >= 100 AND k < 900")
        )
        det = tl.table_details(tdir)
        assert det["deleted_rows"] == 200
        assert det["total_rows"] == 800

    def test_overlapping_deletes_do_not_double_count(self, spark, tdir):
        tl.create_table(spark, _base(spark).coalesce(1), tdir)
        tl.delete_from_table(spark, tdir, "k < 200", mode="dv")
        tl.delete_from_table(spark, tdir, "k < 300", mode="dv")
        det = tl.table_details(tdir)
        assert det["deleted_rows"] == 300
        assert tl.read_table(spark, tdir).count() == 700

    def test_full_file_delete_removes_file(self, spark, tdir):
        # a vector covering every row of a file removes the file
        # outright — no sidecar survives for it
        tl.create_table(
            spark, _base(spark).repartitionByRange(2, "k"), tdir
        )
        snap0 = tl._resolve_snapshot(tdir)
        # delete everything below the second file's min: exactly the
        # first range file dies, the second is pruned away untouched
        cut = max(
            a["columns"]["k"]["min"] for a in snap0["files"].values()
        )
        tl.delete_from_table(
            spark, tdir, f"k < {cut}", prune_predicates=[("k", "<", cut)],
            mode="dv",
        )
        after = _live_paths(tdir)
        assert len(after) == len(snap0["files"]) - 1
        snap = tl._resolve_snapshot(tdir)
        assert not any(a.get("dv") for a in snap["files"].values())
        assert tl.read_table(spark, tdir).count() == 1000 - cut

    def test_prune_predicates_skip_untouched_files(self, spark, tdir):
        tl.create_table(
            spark, _base(spark).repartitionByRange(4, "k"), tdir
        )
        tl.delete_from_table(
            spark, tdir, "k >= 900", prune_predicates=[("k", ">=", 900)],
            mode="dv",
        )
        snap = tl._resolve_snapshot(tdir)
        dvd = [p for p, a in snap["files"].items() if a.get("dv")]
        # only range files overlapping [900, 999] carry a vector;
        # the lower ranges were never touched
        assert dvd and len(dvd) < len(snap["files"])
        assert tl.read_table(spark, tdir).count() == 900

    def test_time_travel_sees_pre_delete_rows(self, spark, tdir):
        tl.create_table(spark, _base(spark, 100), tdir)
        tl.delete_from_table(spark, tdir, "k < 50", mode="dv")
        assert tl.read_table(spark, tdir, version=0).count() == 100
        assert tl.read_table(spark, tdir, version=1).count() == 50

    def test_bad_mode_raises(self, spark, tdir):
        tl.create_table(spark, _base(spark, 10), tdir)
        with pytest.raises(tl.TableLogError, match="mode"):
            tl.delete_from_table(spark, tdir, "k = 1", mode="nope")


class TestDvInteractions:
    def test_merge_does_not_resurrect_dv_deleted_rows(self, spark, tdir):
        tl.create_table(spark, _base(spark).repartition(2), tdir)
        tl.delete_from_table(spark, tdir, "k % 2 = 0", mode="dv")
        ups = spark.range(0, 10).select(
            F.col("id").alias("k"),
            F.lit(-1).cast("long").alias("v"),
            F.lit("upd").alias("s"),
        )
        tl.upsert_table(spark, ups, tdir, key="k")
        got = tl.read_table(spark, tdir)
        # keys 0..9 all present again (upsert inserts them), but the
        # OTHER even keys stay deleted
        assert got.filter("k < 10").count() == 10
        assert got.filter("k >= 10 AND k % 2 = 0").count() == 0
        # upsert rewrote the touched files → their vectors are gone
        snap = tl._resolve_snapshot(tdir)
        assert not any(a.get("dv") for a in snap["files"].values())

    def test_compact_materializes_vectors(self, spark, tdir):
        tl.create_table(spark, _base(spark).repartition(4), tdir)
        tl.delete_from_table(spark, tdir, "k % 3 = 0", mode="dv")
        want = _sorted(tl.read_table(spark, tdir))
        v = tl.compact_table(spark, tdir)
        assert v == 2
        snap = tl._resolve_snapshot(tdir)
        assert not any(a.get("dv") for a in snap["files"].values())
        assert _sorted(tl.read_table(spark, tdir)) == want
        det = tl.table_details(tdir)
        assert det["deleted_rows"] == 0
        assert det["total_rows"] == 1000 - 334

    def test_change_feed_emits_dv_deletes(self, spark, tdir):
        tl.create_table(spark, _base(spark, 100), tdir)
        tl.delete_from_table(spark, tdir, "k < 10", mode="dv")
        ch = tl.table_changes(spark, tdir, 0, 1)
        rows = ch.collect()
        assert all(r["_change_type"] == "delete" for r in rows)
        assert sorted(r["k"] for r in rows) == list(range(10))

    def test_incremental_agg_delta_nets_dv_deletes(self, spark, tdir):
        tl.create_table(spark, _base(spark, 100), tdir)
        tl.delete_from_table(spark, tdir, "k >= 90", mode="dv")
        d = tl.incremental_agg_delta(
            spark, tdir, 0, 1, group_cols=[], sum_cols={"v": "v"}
        ).collect()[0]
        assert d["d_count"] == -10
        assert d["d_v"] == -float(sum(2 * k for k in range(90, 100)))

    def test_vacuum_sidecar_lifecycle(self, spark, tdir):
        tl.create_table(spark, _base(spark).coalesce(1), tdir)
        tl.delete_from_table(spark, tdir, "k = 1", mode="dv")
        tl.delete_from_table(spark, tdir, "k = 2", mode="dv")  # supersedes
        # keep the last 2 versions: v1's sidecar is still referenced
        gone = tl.vacuum_table(tdir, keep_versions=2, retention_seconds=0)
        assert not any(g.startswith(tl.DV_DIR) for g in gone)
        # keep only the head: v1's superseded sidecar is reclaimed
        gone = tl.vacuum_table(tdir, keep_versions=1, retention_seconds=0)
        assert sum(1 for g in gone if g.startswith(tl.DV_DIR)) == 1
        snap = tl._resolve_snapshot(tdir)
        (dv,) = [
            a["dv"]["path"] for a in snap["files"].values() if a.get("dv")
        ]
        assert os.path.exists(os.path.join(tdir, dv))
        assert tl.read_table(spark, tdir).count() == 998

    def test_checkpoint_preserves_dv_state(self, spark, tdir):
        tl.create_table(spark, _base(spark, 100).coalesce(1), tdir)
        tl.delete_from_table(spark, tdir, "k = 5", mode="dv")
        for i in range(tl.CHECKPOINT_EVERY):
            tl.set_table_properties(tdir, {f"p{i}": "x"})
        assert os.path.exists(
            tl._checkpoint_file(tdir, tl.CHECKPOINT_EVERY)
        )
        assert tl.read_table(spark, tdir).count() == 99

    def test_delete_keys_applies_existing_dv(self, spark, tdir):
        tl.create_table(spark, _base(spark, 100).coalesce(1), tdir)
        tl.delete_from_table(spark, tdir, "k < 10", mode="dv")
        keys = spark.range(5, 15).select(F.col("id").alias("k"))
        tl.delete_keys_from_table(spark, tdir, keys, key="k")
        got = sorted(r["k"] for r in tl.read_table(spark, tdir).collect())
        assert got == list(range(15, 100))

    def test_delete_keys_dv_mode(self, spark, tdir):
        tl.create_table(
            spark, _base(spark).repartitionByRange(4, "k"), tdir
        )
        before = _live_paths(tdir)
        keys = spark.range(100, 150).select(F.col("id").alias("k"))
        tl.delete_keys_from_table(spark, tdir, keys, key="k", mode="dv")
        assert _live_paths(tdir) == before  # nothing rewritten
        got = sorted(r["k"] for r in tl.read_table(spark, tdir).collect())
        assert got == list(range(100)) + list(range(150, 1000))
        snap = tl._resolve_snapshot(tdir)
        dvd = [p for p, a in snap["files"].items() if a.get("dv")]
        # only range files overlapping [100, 149] carry a vector
        assert dvd and len(dvd) < len(snap["files"])
        assert tl.table_details(tdir)["deleted_rows"] == 50

    def test_delete_keys_dv_then_predicate_dv_merge(self, spark, tdir):
        tl.create_table(spark, _base(spark, 100).coalesce(1), tdir)
        keys = spark.range(0, 10).select(F.col("id").alias("k"))
        tl.delete_keys_from_table(spark, tdir, keys, key="k", mode="dv")
        tl.delete_from_table(spark, tdir, "k >= 95", mode="dv")
        assert tl.read_table(spark, tdir).count() == 85
        assert tl.table_details(tdir)["deleted_rows"] == 15

    def test_executor_side_dv_decode_path(self, spark, tdir, monkeypatch):
        """Above the driver-load cap the sidecars decode on executors;
        results must be identical."""
        tl.create_table(spark, _base(spark).repartition(3), tdir)
        tl.delete_from_table(spark, tdir, "k % 5 = 0", mode="dv")
        want = _sorted(tl.read_table(spark, tdir))
        monkeypatch.setattr(tl, "_DV_DRIVER_LOAD_CAP", 0)
        assert _sorted(tl.read_table(spark, tdir)) == want
        assert tl.read_table(spark, tdir).count() == 800

    @pytest.mark.heavy
    def test_changes_by_version_attribution(self, spark, tdir):
        tl.create_table(spark, _base(spark, 100).coalesce(1), tdir)
        tl.delete_from_table(spark, tdir, "k < 5", mode="dv")     # v1
        tl.delete_from_table(spark, tdir, "k >= 95", mode="dv")   # v2
        ch = tl.table_changes_by_version(spark, tdir, 0, 2).collect()
        by_ver = {}
        for r in ch:
            by_ver.setdefault(r["_commit_version"], []).append(
                (r["_change_type"], r["k"])
            )
        assert sorted(by_ver[1]) == [("delete", k) for k in range(5)]
        assert sorted(by_ver[2]) == [("delete", k) for k in range(95, 100)]
        # empty range -> empty frame with the CDF schema
        empty = tl.table_changes_by_version(spark, tdir, 2, 2)
        assert empty.count() == 0
        assert "_commit_version" in empty.columns

    def test_dv_delete_with_no_matches_is_a_noop_commit(self, spark, tdir):
        tl.create_table(spark, _base(spark, 50), tdir)
        v = tl.delete_from_table(spark, tdir, "k > 1000", mode="dv")
        assert v == 1
        assert tl.read_table(spark, tdir).count() == 50
        snap = tl._resolve_snapshot(tdir)
        assert not any(a.get("dv") for a in snap["files"].values())

    def test_dv_after_schema_evolution(self, spark, tdir):
        tl.create_table(spark, _base(spark, 100).coalesce(1), tdir)
        tl.add_table_column(spark, tdir, "extra", "long")
        tl.delete_from_table(spark, tdir, "k < 10", mode="dv")
        got = tl.read_table(spark, tdir)
        assert got.count() == 90
        assert got.filter(F.col("extra").isNull()).count() == 90
