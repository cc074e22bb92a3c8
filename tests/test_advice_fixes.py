"""Regression tests for the round-9 advice punch list: table-log and
log-source edge cases (vacuumed DV sidecars vs restore, partial
conditional-put version files, temporal/decimal key-delete pruning,
pre-`ts` stale-txn aging, stream offsets on a not-yet-created table)."""

from __future__ import annotations

import json
import os
import threading
import time
import uuid

import pytest
from pyspark.sql import functions as F

from ome_arrow_spark.sources import table_log as tl


def _base(spark, n=100):
    return spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


class TestRestoreDvGuard:
    @pytest.mark.heavy
    def test_restore_refuses_vacuumed_dv_sidecar(self, spark, tdir):
        """v1's DV sidecar is superseded at v2; vacuum(keep=1) reclaims
        it, so restore to v1 must refuse instead of committing a
        manifest whose reads would FileNotFoundError in _read_dv."""
        tl.create_table(spark, _base(spark).coalesce(1), tdir)
        tl.delete_from_table(spark, tdir, "k < 10", mode="dv")  # v1
        tl.delete_from_table(spark, tdir, "k < 20", mode="dv")  # v2
        v1_dv = next(
            a["dv"]["path"]
            for a in tl._resolve_snapshot(tdir, 1)["files"].values()
            if a.get("dv")
        )
        tl.vacuum_table(tdir, keep_versions=1, retention_seconds=0)
        assert not os.path.exists(os.path.join(tdir, v1_dv))
        with pytest.raises(tl.TableLogError, match="vacuumed"):
            tl.restore_table(spark, tdir, version=1)
        # restore to the retained snapshot's state still works: v2 IS
        # current, so assert the guard names the sidecar, not the data
        assert tl.read_table(spark, tdir).count() == 80


class TestPartialVersionFile:
    def test_old_corrupt_version_file_fails_fast(self, spark, tdir):
        tl.create_table(spark, _base(spark, 10), tdir)
        p = tl._version_file(tdir, 1)
        open(p, "w").close()  # zero-length, as a crashed O_EXCL writer
        os.utime(p, (time.time() - 3600, time.time() - 3600))
        with pytest.raises(tl.TableLogError, match="grace window"):
            tl._read_entry(tdir, 1)

    def test_inflight_conditional_put_read_waits(self, spark, tdir):
        """A reader that races the conditional-put window (file created,
        payload not yet written) retries and sees the full entry."""
        tl.create_table(spark, _base(spark, 10), tdir)
        p = tl._version_file(tdir, 1)
        payload = json.dumps(
            {"version": 1, "operation": "append", "actions": []}
        ).encode()
        fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)

        def finish():
            time.sleep(0.3)
            os.write(fd, payload)
            os.close(fd)

        t = threading.Thread(target=finish)
        t.start()
        try:
            assert tl._read_entry(tdir, 1)["operation"] == "append"
        finally:
            t.join()


class TestTemporalKeyDelete:
    @pytest.mark.heavy
    def test_delete_keys_date_key_prunes_and_deletes(self, spark, tdir):
        df = spark.range(0, 100).select(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("day"),
            F.col("id").alias("v"),
        )
        tl.create_table(spark, df.repartitionByRange(4, "day"), tdir)
        keys = spark.range(10, 20).select(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("day")
        )
        tl.delete_keys_from_table(spark, tdir, keys, key="day")
        assert tl.read_table(spark, tdir).count() == 90
        # stats pruning engaged: ranged files outside [01-11, 01-20]
        # are carried by reference (their adds reappear verbatim)
        entry = tl._read_entry(tdir, 1)
        removed = [a for a in entry["actions"] if "remove" in a]
        assert 0 < len(removed) < 4

    def test_delete_keys_timestamp_key(self, spark, tdir):
        df = spark.range(0, 50).select(
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(hours=F.col("id").cast("int"))).alias("ts"),
            F.col("id").alias("v"),
        )
        tl.create_table(spark, df.repartitionByRange(2, "ts"), tdir)
        keys = df.filter("v < 5").select("ts")
        tl.delete_keys_from_table(spark, tdir, keys, key="ts", mode="dv")
        assert tl.read_table(spark, tdir).count() == 45

    def test_delete_keys_decimal_key(self, spark, tdir):
        """Decimal stats are float-widened in the manifest; the range
        join must compare in double space, not cast float→decimal.
        (pyarrow may refuse decimal footer stats → statless fallback;
        inject manifest stats to pin the decimal compare path.)"""
        import math

        import pyarrow.parquet as pq

        df = spark.range(0, 60).select(
            (F.col("id").cast("decimal(10,2)") / 4).alias("d"),
            F.col("id").alias("v"),
        )
        tl.create_table(spark, df.repartitionByRange(3, "d"), tdir)
        p = tl._version_file(tdir, 0)
        entry = json.load(open(p))
        for a in entry["actions"]:
            add = a.get("add")
            if not add:
                continue
            col = pq.read_table(
                os.path.join(tdir, add["path"]), columns=["d"]
            )["d"].to_pylist()
            add.setdefault("columns", {})["d"] = {
                "min": math.nextafter(float(min(col)), -math.inf),
                "max": math.nextafter(float(max(col)), math.inf),
                "nulls": 0,
            }
        json.dump(entry, open(p, "w"), separators=(",", ":"))
        keys = df.filter("v < 20").select("d")
        tl.delete_keys_from_table(spark, tdir, keys, key="d")
        assert tl.read_table(spark, tdir).count() == 40
        # pruning engaged: the high-range file was carried by reference
        removed = [
            a for a in tl._read_entry(tdir, 1)["actions"] if "remove" in a
        ]
        assert 0 < len(removed) < 3


class TestStaleTxnWithoutTs:
    def test_pre_ts_entry_ages_by_file_mtime(self, spark, tmp_path):
        ta = str(tmp_path / "a")
        tb = str(tmp_path / "b")
        tl.create_table(spark, _base(spark, 10), ta)
        tl.create_table(spark, _base(spark, 10), tb)
        batch = spark.range(100, 103).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        adds = tl._write_data_files(batch, os.path.abspath(tb), 1, ())
        cv = 1
        entry = {
            "version": 1,
            "operation": "txn_append",
            "actions": [{"add": a} for a in adds],
            "txn": {
                "id": uuid.uuid4().hex,
                "role": "participant",
                "coordinator": os.path.abspath(ta),
                "coordinator_version": cv,
            },
        }
        # write the version file WITHOUT a ts field (pre-ts format)
        p = tl._version_file(tb, 1)
        with open(p, "w") as f:
            json.dump(entry, f, separators=(",", ":"))
        old = time.time() - 7200
        os.utime(p, (old, old))
        # mtime fallback lets the reaper see the 2h age and abort it
        assert tl.finalize_stale_txns(tb, max_age_s=3600) == 1
        assert tl.read_table(spark, tb).count() == 10
        assert tl._read_entry(ta, cv)["operation"] == "txn_abort"


class TestEmptyTableStream:
    def test_stream_offsets_on_missing_table(self, tmp_path):
        from ome_arrow_spark.streaming.log_source import _LogStreamReader

        r = _LogStreamReader(
            str(tmp_path / "nothere"), schema_json="{}",
            ignore_changes=False, start_version=None,
        )
        assert r.initialOffset() == {"version": -1}
        assert r.latestOffset() == {"version": -1}
        assert r.partitions({"version": -1}, {"version": -1}) == []

    def test_stream_picks_up_table_created_later(self, spark, tmp_path):
        from ome_arrow_spark.streaming.log_source import _LogStreamReader

        t = str(tmp_path / "late")
        r = _LogStreamReader(
            t, schema_json="{}", ignore_changes=False, start_version=None
        )
        start = r.initialOffset()
        assert start == {"version": -1}
        tl.create_table(spark, _base(spark, 5), t)
        end = r.latestOffset()
        assert end == {"version": 0}
        parts = r.partitions(start, end)
        assert len(parts) >= 1  # first batch = whole table at v0
