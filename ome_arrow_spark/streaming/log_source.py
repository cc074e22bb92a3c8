"""The commit-log table as a first-class Spark data source — batch AND
Structured Streaming — via the Spark 4 Python DataSource API.

    spark.dataSource.register(OmeTableLogDataSource)
    spark.read.format("ome_table_log").option("path", t).load()
    spark.readStream.format("ome_table_log").option("path", t).load()

Batch: one input partition per live manifest file (the manifest IS the
planner — no directory listing), read executor-side with pyarrow as
Arrow RecordBatches.  A file's deletion vector is applied INSIDE its
partition by masking row positions against the sidecar — no join at
all, the Delta-reader shape (the DataFrame path in table_log._scan
uses a broadcast anti-join instead because it cannot reach into the
scan; this source can).

Streaming: offsets are commit VERSIONS.  Each micro-batch covers the
net-added files of ``(start, end]`` — one partition per added file —
so a K-commit batch reads the K commits' churn, never the table.  The
source is append-only by contract: a version range that removes or
re-adds files (upsert/delete/compact churn) raises unless
``ignoreChanges`` is set, in which case rewritten files are RE-EMITTED
whole (same semantics as Delta's ``ignoreChanges``: downstream may see
duplicates, never loss of NEW rows).  Offset commits give the usual
Structured Streaming exactly-once-per-version guarantee across
restarts via the checkpoint.

Reference context: the reference library has no streaming at all; this
closes the "stream new images as they land in the table" loop the
engine's OME ingest queries already exercise from the write side.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _FilePartition(InputPartition):
    def __init__(self, table: str, rel_path: str, dv_rel: str | None):
        self.table = table
        self.rel_path = rel_path
        self.dv_rel = dv_rel


def _read_file_arrow(table: str, rel_path: str, dv_rel: str | None,
                     columns: list[str]):
    """Executor-side: one manifest file → Arrow batches, deletion
    vector applied by position mask (no join)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ome_arrow_spark.sources.table_log import _read_dv

    tbl = pq.read_table(os.path.join(table, rel_path), columns=columns)
    if dv_rel is not None:
        deleted = _read_dv(table, dv_rel)
        mask = np.ones(tbl.num_rows, dtype=bool)
        idx = deleted[deleted < tbl.num_rows].astype("int64")
        mask[idx] = False
        tbl = tbl.filter(mask)
    yield from tbl.to_batches()


class _LogBatchReader(DataSourceReader):
    def __init__(self, table: str, schema_names: list[str]):
        self.table = table
        self.schema_names = schema_names

    def partitions(self):
        from ome_arrow_spark.sources import table_log as tl

        snap = tl._resolve_snapshot(self.table)
        return [
            _FilePartition(
                self.table, p, (a.get("dv") or {}).get("path")
            )
            for p, a in sorted(snap["files"].items())
        ]

    def read(self, partition: _FilePartition):
        yield from _read_file_arrow(
            partition.table, partition.rel_path, partition.dv_rel,
            self.schema_names,
        )


class _LogStreamReader(DataSourceStreamReader):
    def __init__(self, table: str, schema_names: list[str],
                 ignore_changes: bool, start_version: int | None):
        self.table = table
        self.schema_names = schema_names
        self.ignore_changes = ignore_changes
        self.start_version = start_version

    def initialOffset(self) -> dict:
        # default: the whole current table is the first batch
        # (start_version=N begins after version N instead)
        from ome_arrow_spark.sources import table_log as tl

        if self.start_version is not None:
            return {"version": int(self.start_version)}
        first = tl._list_versions(self.table)[0]
        return {"version": first - 1}

    def latestOffset(self) -> dict:
        from ome_arrow_spark.sources import table_log as tl

        return {"version": int(tl.current_version(self.table))}

    def partitions(self, start: dict, end: dict):
        from ome_arrow_spark.sources import table_log as tl

        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return []
        snap = tl._resolve_snapshot(self.table, hi)
        if lo < 0:
            added = sorted(snap["files"])
            removed: list[str] = []
        else:
            added, removed = tl.version_delta_files(self.table, lo, hi)
        if removed and not self.ignore_changes:
            raise tl.TableLogError(
                f"versions ({lo}, {hi}] rewrite or remove files — the "
                "stream source is append-only; set ignoreChanges to "
                "re-emit rewritten files instead (downstream may then "
                "see duplicates, never lose NEW rows — Delta's "
                "ignoreChanges contract)"
            )
        return [
            _FilePartition(
                self.table, p,
                (snap["files"][p].get("dv") or {}).get("path"),
            )
            for p in added
            if p in snap["files"]  # added-then-vacuumed guard
        ]

    def read(self, partition: _FilePartition):
        yield from _read_file_arrow(
            partition.table, partition.rel_path, partition.dv_rel,
            self.schema_names,
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint


class OmeTableLogDataSource(DataSource):
    """``format("ome_table_log")`` — options: ``path`` (required),
    ``ignoreChanges`` ("true"/"false"), ``startVersion`` (stream
    starts AFTER this version; default: whole table first)."""

    @classmethod
    def name(cls) -> str:
        return "ome_table_log"

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("ome_table_log requires option 'path'")
        return os.path.abspath(path)

    def schema(self):
        from ome_arrow_spark.sources import table_log as tl

        snap = tl._resolve_snapshot(self._table())
        return T.StructType.fromJson(json.loads(snap["schema"]))

    def _names(self) -> list[str]:
        return [f.name for f in self.schema().fields]

    def reader(self, schema) -> DataSourceReader:
        return _LogBatchReader(self._table(), self._names())

    def streamReader(self, schema) -> DataSourceStreamReader:
        opt = {k.lower(): v for k, v in self.options.items()}
        sv = opt.get("startversion")
        return _LogStreamReader(
            self._table(),
            self._names(),
            str(opt.get("ignorechanges", "false")).lower() == "true",
            int(sv) if sv is not None else None,
        )


def register(spark) -> None:
    spark.dataSource.register(OmeTableLogDataSource)
