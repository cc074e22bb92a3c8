"""Atomic transaction-log table format over plain parquet.

The reference keeps one parquet file per image and delegates table
semantics to the filesystem (export.py:377-422); this engine's
``upsert_ome_parquet`` / ``compact_ome_parquet`` (ome_parquet.py)
upgraded that to crash-safe staged-swap MERGE-by-rewrite.  This module
closes the remaining gap (README "Table format" design note) with a
self-contained Delta/Iceberg-style commit log — no external library —
so table mutations are **atomic**, readers get **snapshot isolation**
and **time travel**, and scans get **manifest-based file skipping**
instead of directory listing:

* ``_ome_log/{version:020d}.json`` — one JSON commit per version with
  ``add`` / ``remove`` file actions.  Commits are published with an
  atomic hard-link (``os.link`` fails with EEXIST if the version is
  taken), which is exactly optimistic concurrency control: two racing
  writers serialize, the loser raises :class:`ConcurrentCommit` and
  can retry on the new snapshot.  On an object store this maps to a
  conditional PUT (S3 ``If-None-Match``) or a commit service — the
  protocol is unchanged.
* Data files are immutable and uniquely named
  (``part-{version}-{seq}-{token}.parquet``); a "delete" is a log
  action, not an ``unlink``, so every historical snapshot stays
  readable until :func:`vacuum_table` reclaims unreferenced files.
* Each ``add`` carries row count, byte size, and per-column min/max /
  null-count harvested from the parquet **footer** (no data scan).
  :func:`read_table` prunes files against a predicate before Spark
  ever lists them — at 100 TB on object storage this manifest pruning
  is the single biggest scan-planning win (no O(files) LIST, no
  footer fetch for skipped files).
* Every ``CHECKPOINT_EVERY``-th commit also writes a checkpoint (the
  fully-replayed live-file set), so snapshot resolution reads one
  checkpoint + a bounded log suffix instead of replaying the whole
  history — commit count no longer degrades planning.

MERGE (:func:`upsert_table`) rewrites only the files whose key
min/max range can contain an update key; untouched files are carried
by reference.  That is the Delta ``MERGE INTO`` file-pruning shape:
cost scales with the touched fraction of the table, not table size.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Any, Iterable, Sequence

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_DIR = "_ome_log"
CHECKPOINT_EVERY = 10
# Columns of these Spark types get min/max stats in the manifest.
_STATS_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
    T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType,
    T.BooleanType,
)


class ConcurrentCommit(RuntimeError):
    """Another writer committed this version first — reload and retry."""


class TableLogError(RuntimeError):
    pass


def retry_on_conflict(fn, attempts: int = 3):
    """Optimistic-concurrency retry loop: every write op re-resolves
    the snapshot on entry, so re-invoking it after a
    :class:`ConcurrentCommit` recomputes against the winner's state and
    claims the next version — e.g.
    ``retry_on_conflict(lambda: append_table(spark, df, t))``."""
    for i in range(attempts):
        try:
            return fn()
        except ConcurrentCommit:
            if i == attempts - 1:
                raise


# ---------------------------------------------------------------------------
# Commit protocol
# ---------------------------------------------------------------------------


def _log_path(table: str) -> str:
    return os.path.join(os.path.abspath(table), LOG_DIR)


def _version_file(table: str, version: int) -> str:
    return os.path.join(_log_path(table), f"{version:020d}.json")


def _checkpoint_file(table: str, version: int) -> str:
    return os.path.join(_log_path(table), f"{version:020d}.checkpoint.json")


def _list_versions(table: str) -> list[int]:
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        if name.endswith(".json") and not name.endswith(".checkpoint.json"):
            stem = name[: -len(".json")]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


def current_version(table: str) -> int | None:
    versions = _list_versions(table)
    return versions[-1] if versions else None


class Committer:
    """Pluggable commit-file publish protocol.

    A table-log commit is ONE create-if-absent publish of the version
    file: exactly one of N racing writers may succeed, every loser must
    raise :class:`ConcurrentCommit`.  Everything above this seam
    (manifest pruning, MERGE, time travel, checkpoints) is
    storage-agnostic; only this primitive is storage-specific:

    * POSIX / HDFS / NFSv4: :class:`HardLinkCommitter` (default) —
      ``os.link`` is atomic create-if-absent.
    * S3 / GCS / ABFS: subclass with a real **conditional PUT**
      (S3 ``If-None-Match: *``, GCS ``x-goog-if-generation-match: 0``,
      ABFS ``If-None-Match: *`` ETag precondition).
      :class:`ConditionalPutCommitter` is the local twin of that
      primitive (single ``O_CREAT|O_EXCL`` create of the final object,
      no temp name) so the protocol is exercised in its object-store
      shape in tests.
    * Stores with only last-writer-wins PUT: a write-then-read-back
      scheme can *detect* a lost race after the fact but cannot prevent
      a brief window where the loser's bytes are visible —
      :class:`tests.test_table_log_property.PlainPutCommitter` injects
      exactly that backend to prove the suite detects the broken
      protocol.  Production object-store deployments should use a
      conditional PUT or an external commit service, never plain PUT.
    """

    def put_if_absent(self, path: str, data: bytes) -> None:
        """Publish ``data`` at ``path`` iff ``path`` does not exist;
        raise :class:`ConcurrentCommit` if it does."""
        raise NotImplementedError


class HardLinkCommitter(Committer):
    """Default POSIX committer: write+fsync a temp name, then hard-link
    to the final name.  ``os.link`` is atomic and fails with EEXIST
    when the version was taken by a racing writer."""

    def put_if_absent(self, path: str, data: bytes) -> None:
        tmp = os.path.join(os.path.dirname(path), f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise ConcurrentCommit(
                f"version file {os.path.basename(path)} already committed"
            ) from None
        finally:
            os.unlink(tmp)


class ConditionalPutCommitter(Committer):
    """Object-store-shaped committer: ONE conditional create of the
    final object, no temp name, no rename.  ``O_CREAT|O_EXCL`` is the
    POSIX twin of S3 ``PUT If-None-Match: *`` / GCS
    ``if-generation-match=0``; a real object-store subclass replaces
    the body with that HTTP call and the rest of the format is
    untouched.

    Local-emulation caveat: unlike a real object-store PUT (atomic
    whole-object) or the HardLinkCommitter (publishes fully-written
    bytes), create-exclusive-then-write briefly exposes an
    empty/partial version file to concurrent readers — ``_read_entry``
    absorbs that window by treating young undecodable version files as
    still-in-flight and retrying.  A writer that CRASHES between create
    and write leaves the slot poisoned; that failure mode cannot occur
    with the (default, production-local) HardLinkCommitter, and the
    object-store subclass inherits atomicity from the store."""

    def put_if_absent(self, path: str, data: bytes) -> None:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            raise ConcurrentCommit(
                f"version file {os.path.basename(path)} already committed"
            ) from None
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())


_COMMITTER: Committer = HardLinkCommitter()


def set_committer(committer: Committer | None) -> Committer:
    """Install the commit publish protocol (None → POSIX default);
    returns the previous committer so tests can restore it."""
    global _COMMITTER
    prev = _COMMITTER
    _COMMITTER = committer if committer is not None else HardLinkCommitter()
    return prev


def _commit(table: str, version: int, entry: dict[str, Any]) -> None:
    log = _log_path(table)
    os.makedirs(log, exist_ok=True)
    entry.setdefault("ts", time.time())  # commit time: timestamp travel
    payload = json.dumps(entry, separators=(",", ":")).encode()
    _COMMITTER.put_if_absent(_version_file(table, version), payload)
    if version % CHECKPOINT_EVERY == 0 and version > 0:
        # Checkpoints are derived state: best-effort, never raced over
        # (a duplicate write produces identical content).
        snap = _resolve_snapshot(table, version, _replay=True)
        if snap.pop("pending_txn_versions", None):
            # a cross-table txn in range is still pending: its entries'
            # visibility may flip, so baking this resolution would be
            # wrong.  Defer — the next boundary after finalization
            # checkpoints normally.
            return
        with open(_checkpoint_file(table, version) + ".tmp", "w") as f:
            json.dump(snap, f, separators=(",", ":"))
        os.replace(
            _checkpoint_file(table, version) + ".tmp",
            _checkpoint_file(table, version),
        )


# How long a zero-length/undecodable version file is presumed to be a
# ConditionalPutCommitter write still in flight (created O_EXCL, payload
# not yet flushed) before _read_entry declares the slot corrupt.
_INFLIGHT_GRACE_S = 5.0


def _read_entry(table: str, version: int) -> dict[str, Any]:
    path = _version_file(table, version)
    deadline = time.time() + _INFLIGHT_GRACE_S
    while True:
        with open(path) as f:
            raw = f.read()
        if raw:
            try:
                return json.loads(raw)
            except ValueError:
                pass
        # Empty or truncated: a conditional-put writer may be between
        # create and write.  Age-gate on mtime so an old corrupt file
        # fails fast instead of sleeping the full grace window.
        try:
            age = time.time() - os.path.getmtime(path)
        except OSError:
            age = 0.0
        if age > _INFLIGHT_GRACE_S or time.time() > deadline:
            raise TableLogError(
                f"version file {os.path.basename(path)} of {table} is "
                "empty/undecodable past the in-flight grace window — "
                "likely a committer that crashed between create and "
                "write; restore it from a replica or remove the file "
                "to recommit the slot"
            )
        time.sleep(0.05)


# ---------------------------------------------------------------------------
# Cross-table transactions
# ---------------------------------------------------------------------------
# All-or-nothing commits across N log tables WITHOUT a central catalog,
# built from the same put_if_absent primitive as single-table commits.
# The shape (the use case is a table and its derived index staying
# snapshot-consistent):
#
#   1. every table except the first stages a PARTICIPANT entry at its
#      own next version, carrying ``txn = {id, coordinator,
#      coordinator_version}``;
#   2. the first table (the COORDINATOR) then commits normally — ONE
#      put_if_absent — with the same txn id in its entry.
#
# That single coordinator commit is the atomic visibility flip:
# a participant entry is EFFECTIVE iff the coordinator's version slot
# holds an entry with the matching txn id.  If the slot is empty the
# txn is PENDING (participant entries resolve to no-ops); once any
# OTHER entry takes the slot — a racing writer, or the abort helper —
# the txn is ABORTED permanently and deterministically.  There are no
# separate marker files and no mutable state: finalization is decided
# by whichever commit wins the coordinator slot.
#
# Consequences, by design:
# * resolution of a PENDING participant entry can change exactly once
#   (to committed or aborted) when the coordinator slot fills; time
#   travel / CDF over a still-pending range is therefore unstable
#   until finalization.  Checkpoints never bake pending entries —
#   _commit defers the checkpoint while any entry in range is pending.
# * coordinator slot contention aborts the txn (standard OCC) — the
#   committer retries with a fresh txn id and freshly staged
#   participant entries; the aborted slots stay as permanent no-ops.
# * vacuum retains files referenced by pending entries (it walks raw
#   log entries, not resolved snapshots), so a late commit never
#   resurrects deleted data files.

_TXN_OP = "txn_append"

# Catalog seam: participant entries reference their coordinator by the
# path that was current at commit time.  In a relocating deployment
# (table trees moved, mounted elsewhere, or addressed through a real
# catalog), install a resolver that maps that stored reference to the
# coordinator's CURRENT location; with no resolver the reference is
# used as a filesystem path directly (the single-host default).
_TABLE_RESOLVER: Any = None


def set_table_resolver(fn) -> Any:
    """Install ``fn(ref: str) -> str | None`` to translate stored
    coordinator references (e.g. old paths or catalog identifiers) to
    current table paths.  Returning ``None`` falls back to the stored
    reference verbatim.  Returns the previous resolver so tests can
    restore it."""
    global _TABLE_RESOLVER
    prev = _TABLE_RESOLVER
    _TABLE_RESOLVER = fn
    return prev


def _resolve_table_ref(ref: str) -> str:
    if _TABLE_RESOLVER is not None:
        p = _TABLE_RESOLVER(ref)
        if p:
            return p
    return ref


def _txn_state(txn: dict[str, Any], cache: dict | None = None) -> str:
    """'committed' | 'aborted' | 'pending' for a participant entry's
    transaction reference, resolved from the coordinator version slot
    (the stored coordinator reference goes through the catalog seam —
    :func:`set_table_resolver` — so relocated coordinators still
    finalize their participants)."""
    coord = _resolve_table_ref(txn["coordinator"])
    key = (coord, int(txn["coordinator_version"]))
    if cache is not None and key in cache:
        coord_entry = cache[key]
    else:
        try:
            coord_entry = _read_entry(coord,
                                      int(txn["coordinator_version"]))
        except FileNotFoundError:
            coord_entry = None
        if cache is not None:
            cache[key] = coord_entry
    if coord_entry is None:
        return "pending"
    if (coord_entry.get("txn") or {}).get("id") == txn["id"]:
        return "committed"
    return "aborted"


def _stage_participant(
    table: str,
    adds: list[dict[str, Any]],
    txn: dict[str, Any],
    commit_attempts: int,
) -> int:
    """Publish a participant append entry at the table's next version
    (its own slot contention retries like a blind append — the txn
    reference is independent of the participant's version number)."""
    for attempt in range(commit_attempts):
        version = _resolve_snapshot(table)["version"] + 1
        entry = {
            "version": version,
            "operation": _TXN_OP,
            "actions": [{"add": a} for a in adds],
            "txn": {**txn, "role": "participant"},
        }
        try:
            _commit(table, version, entry)
            return version
        except ConcurrentCommit:
            if attempt == commit_attempts - 1:
                raise
    raise AssertionError("unreachable")


def atomic_multi_append(
    spark: SparkSession,
    appends: Sequence[tuple[str, DataFrame]],
    commit_attempts: int = 20,
    txn_app: str | None = None,
    txn_batch: int | None = None,
) -> dict[str, int]:
    """All-or-nothing append across ``len(appends) >= 2`` log tables.
    Returns {table: committed version} ({} when a replay is skipped).
    Appends are blind (the new files never depend on the snapshot
    read), so retries re-reference the SAME data files at fresh
    versions — no rewrite under contention.  The first table
    coordinates (see section comment).

    ``txn_app``/``txn_batch`` give Delta's idempotent-writes contract
    for streaming foreachBatch sinks: the coordinator records
    ``txn.<app> = batch`` in its properties, and a replayed batch
    (restart after commit, before checkpoint advance) is detected
    there and skipped BEFORE any data file lands.  One check suffices
    for every table because visibility is atomic — the participants'
    entries flip with the same coordinator slot the property rides
    on."""
    if len(appends) < 2:
        raise TableLogError("atomic_multi_append needs >= 2 tables")
    appends = [(os.path.abspath(t), df) for t, df in appends]
    if txn_app is not None:
        if txn_batch is None:
            raise TableLogError("txn_app requires txn_batch")
        prev = _resolve_snapshot(appends[0][0])["properties"].get(
            f"txn.{txn_app}"
        )
        if prev is not None and int(prev) >= int(txn_batch):
            return {}
    seen = set()
    for t, _ in appends:
        if t in seen:
            raise TableLogError(f"duplicate table in transaction: {t}")
        seen.add(t)
    # data files land once; only commit entries retry
    adds_by_table: dict[str, list[dict[str, Any]]] = {}
    for t, df in appends:
        snap = _resolve_snapshot(t)
        _check_schema(df, snap, t)
        _enforce_constraints(df, snap, t)
        adds_by_table[t] = _write_data_files(
            df, t, snap["version"] + 1, _bloom_cols(snap)
        )
    coord, coord_df = appends[0]
    for attempt in range(commit_attempts):
        txn_id = uuid.uuid4().hex
        coord_version = _resolve_snapshot(coord)["version"] + 1
        txn_ref = {
            "id": txn_id,
            "coordinator": coord,
            "coordinator_version": coord_version,
        }
        staged = {
            t: _stage_participant(
                t, adds_by_table[t], txn_ref, commit_attempts
            )
            for t, _ in appends[1:]
        }
        coord_entry = {
            "version": coord_version,
            "operation": _TXN_OP,
            "actions": [{"add": a} for a in adds_by_table[coord]],
            "txn": {
                "id": txn_id,
                "role": "coordinator",
                "participants": [[t, v] for t, v in staged.items()],
            },
        }
        if txn_app is not None:
            coord_entry["properties"] = {f"txn.{txn_app}": str(txn_batch)}
        try:
            _commit(coord, coord_version, coord_entry)
            return {coord: coord_version, **staged}
        except ConcurrentCommit:
            # slot lost -> txn aborted (staged entries are now
            # permanent no-ops); retry with a fresh identity
            if attempt == commit_attempts - 1:
                raise
    raise AssertionError("unreachable")


def finalize_stale_txns(table: str, max_age_s: float = 3600.0) -> int:
    """Maintenance: force a decision on transactions left pending by a
    crashed committer.  For each pending participant entry older than
    ``max_age_s``, try to take the coordinator slot with an explicit
    no-op abort entry — if a racing (slow) committer gets there first,
    the txn commits instead; either way it is finalized.  Returns the
    number of transactions finalized by this call."""
    now = time.time()
    cache: dict = {}
    done = 0
    for v in _list_versions(table):
        e = _read_entry(table, v)
        txn = e.get("txn")
        if not txn or txn.get("role") != "participant":
            continue
        if _txn_state(txn, cache) != "pending":
            continue
        ts = e.get("ts")
        if ts is None:
            # entries committed before the 'ts' field existed: fall
            # back to the version file's mtime (as version_at_timestamp
            # does) so they age out instead of pinning files forever
            try:
                ts = os.path.getmtime(_version_file(table, v))
            except OSError:
                ts = now
        age = now - float(ts)
        if age < max_age_s:
            continue
        cv = int(txn["coordinator_version"])
        coord = _resolve_table_ref(txn["coordinator"])
        try:
            _commit(
                coord,
                cv,
                {
                    "version": cv,
                    "operation": "txn_abort",
                    "actions": [],
                    "txn": {"id": f"abort-{uuid.uuid4().hex}",
                            "role": "abort"},
                },
            )
        except ConcurrentCommit:
            pass  # someone finalized it — equally done
        cache.pop((coord, cv), None)
        done += 1
    return done


# ---------------------------------------------------------------------------
# Deletion vectors
# ---------------------------------------------------------------------------
# A soft delete attaches a sidecar of deleted ROW POSITIONS to a data
# file instead of rewriting it: the commit re-adds the same path with a
# ``dv`` field (``{"path": sidecar, "cardinality": n}``), which
# replaces the prior add during snapshot resolution.  At 100 TB this
# is the difference between a point DELETE costing O(matched rows) of
# sidecar bytes and costing a rewrite of every touched 128 MB file
# (Delta Lake's deletion-vector feature has the same shape).  File
# stats stay valid for pruning — deleted rows can only make them
# conservative.  Readers drop DV positions with a broadcast anti-join
# on (file, row_index) against the (small, maintenance-bounded)
# position set; compaction rewrites DV'd files, materializing the
# deletes and clearing the vectors.

DV_DIR = "deletion_vectors"
_DV_MAGIC = b"OADV1\n"
# Above this many total deleted positions the read path decodes
# sidecars on the executors instead of the driver.
_DV_DRIVER_LOAD_CAP = 2_000_000


def _dv_encode(positions) -> bytes:
    """Sidecar bytes: magic, uint64 count, sorted uint64 positions
    (little-endian).  A production object-store format would use a
    roaring bitmap; the manifest contract (path + cardinality) is
    format-agnostic."""
    import numpy as np

    pos = np.unique(np.asarray(positions, dtype=np.uint64))
    return _DV_MAGIC + len(pos).to_bytes(8, "little") + pos.astype(
        "<u8"
    ).tobytes()


def _dv_decode(data: bytes):
    import numpy as np

    if data[: len(_DV_MAGIC)] != _DV_MAGIC:
        raise TableLogError("bad deletion-vector sidecar magic")
    n = int.from_bytes(data[len(_DV_MAGIC):len(_DV_MAGIC) + 8], "little")
    return np.frombuffer(data, dtype="<u8", offset=len(_DV_MAGIC) + 8,
                         count=n)


def _read_dv(table: str, rel_path: str):
    with open(os.path.join(table, rel_path), "rb") as f:
        return _dv_decode(f.read())


def _scan(
    spark: SparkSession,
    table: str,
    files: dict[str, dict[str, Any]],
    paths: Sequence[str],
    schema: T.StructType,
) -> DataFrame:
    """DV-aware scan of ``paths`` (manifest-relative): files without a
    deletion vector are read as a plain pruned parquet scan; files
    WITH one are read carrying ``_metadata.(file_name, row_index)``
    and anti-joined against their deleted positions.  The DV side is
    broadcast — its volume is deletes-since-last-compaction, which the
    maintenance policy bounds (compaction always rewrites DV'd files,
    clearing the vectors)."""
    plain = [p for p in paths if not files.get(p, {}).get("dv")]
    dvd = [p for p in paths if files.get(p, {}).get("dv")]
    parts: list[DataFrame] = []
    if plain:
        parts.append(
            spark.read.schema(schema).parquet(
                *[os.path.join(table, p) for p in plain]
            )
        )
    if dvd:
        total_card = sum(
            files[p]["dv"].get("cardinality", 0) for p in dvd
        )
        small = total_card <= _DV_DRIVER_LOAD_CAP
        if small:
            import pandas as pd

            chunks = []
            for p in dvd:
                pos = _read_dv(table, files[p]["dv"]["path"])
                chunks.append(
                    pd.DataFrame(
                        {
                            "__dv_file": os.path.basename(p),
                            "__dv_pos": pos.astype("int64"),
                        }
                    )
                )
            dv_df = spark.createDataFrame(
                pd.concat(chunks, ignore_index=True),
                "__dv_file string, __dv_pos long",
            )
        else:
            # large vectors: decode the sidecars ON the executors —
            # the driver never holds the position lists (manifest
            # cardinalities are known, so the split is free)
            abs_table = os.path.abspath(table)
            pairs = [
                (os.path.basename(p), files[p]["dv"]["path"]) for p in dvd
            ]

            def _decode_dv(rows):
                import pandas as pd

                for pdf in rows:
                    for fname, rel in zip(pdf["f"], pdf["rel"]):
                        pos = _read_dv(abs_table, rel)
                        yield pd.DataFrame(
                            {
                                "__dv_file": fname,
                                "__dv_pos": pos.astype("int64"),
                            }
                        )

            dv_df = (
                spark.createDataFrame(pairs, "f string, rel string")
                .repartition(min(len(pairs), 64))
                .mapInPandas(_decode_dv, "__dv_file string, __dv_pos long")
            )
        # small vectors broadcast (the common case: deletes since the
        # last compaction); huge ones skip the hint so AQE can fall
        # back to a shuffled anti-join instead of OOMing the driver
        dv_side = F.broadcast(dv_df) if small else dv_df
        df = (
            spark.read.schema(schema)
            .parquet(*[os.path.join(table, p) for p in dvd])
            .withColumn("__dv_file", F.col("_metadata.file_name"))
            .withColumn("__dv_pos", F.col("_metadata.row_index"))
            .join(dv_side, ["__dv_file", "__dv_pos"], "left_anti")
            .drop("__dv_file", "__dv_pos")
        )
        parts.append(df.select([f.name for f in schema.fields]))
    if not parts:
        return spark.createDataFrame([], schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _resolve_snapshot(
    table: str, version: int | None = None, _replay: bool = False
) -> dict[str, Any]:
    """Live state at ``version`` (default: latest): schema JSON, table
    properties, and the live ``add`` actions keyed by relative path.
    Reads the newest checkpoint ≤ version and replays only the log
    suffix, so resolution cost is bounded by ``CHECKPOINT_EVERY``."""
    versions = _list_versions(table)
    if not versions:
        raise TableLogError(f"not a log table (no {LOG_DIR}): {table}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise TableLogError(f"version {version} does not exist in {table}")

    start = 0
    state: dict[str, Any] = {"schema": None, "properties": {}, "files": {}}
    if not _replay:
        for v in sorted(versions, reverse=True):
            if v <= version and os.path.exists(_checkpoint_file(table, v)):
                with open(_checkpoint_file(table, v)) as f:
                    state = json.load(f)
                start = v + 1
                break
    txn_cache: dict = {}
    pending: list[int] = []
    for v in versions:
        if v < start or v > version:
            continue
        entry = _read_entry(table, v)
        txn = entry.get("txn")
        if txn and txn.get("role") == "participant":
            # cross-table txn: effective iff the coordinator slot holds
            # the matching txn id (see the transactions section)
            st = _txn_state(txn, txn_cache)
            if st == "aborted":
                continue
            if st == "pending":
                pending.append(v)
                continue
        if entry.get("schema"):
            state["schema"] = entry["schema"]
        if entry.get("properties"):
            state["properties"].update(entry["properties"])
        for action in entry["actions"]:
            if "add" in action:
                state["files"][action["add"]["path"]] = action["add"]
            elif "remove" in action:
                state["files"].pop(action["remove"]["path"], None)
    state["version"] = version
    if pending:
        # surfaced so _commit defers checkpoints over unstable ranges;
        # never written to disk (checkpoints are skipped while set)
        state["pending_txn_versions"] = pending
    return state


def version_at_timestamp(table: str, ts: float) -> int:
    """Latest version whose commit time is ≤ ``ts`` — Delta's
    ``TIMESTAMP AS OF`` resolution rule.  Commits written before this
    field existed fall back to the version file's mtime."""
    best = None
    for v in _list_versions(table):
        e = _read_entry(table, v)
        cts = e.get("ts")
        if cts is None:
            try:
                cts = os.path.getmtime(_version_file(table, v))
            except OSError:
                continue
        if cts <= ts:
            best = v
    if best is None:
        raise TableLogError(
            f"no commit at or before timestamp {ts} in {table}"
        )
    return best


def table_history(table: str) -> list[dict[str, Any]]:
    """One row per commit: version, timestamp, operation, counts."""
    out = []
    for v in _list_versions(table):
        e = _read_entry(table, v)
        adds = sum(1 for a in e["actions"] if "add" in a)
        removes = sum(1 for a in e["actions"] if "remove" in a)
        out.append(
            {
                "version": v,
                "ts": e.get("ts"),
                "operation": e.get("operation", "unknown"),
                "added_files": adds,
                "removed_files": removes,
                "added_rows": sum(
                    a["add"].get("rows", 0) for a in e["actions"] if "add" in a
                ),
            }
        )
    return out


def table_properties(table: str) -> dict[str, str]:
    return dict(_resolve_snapshot(table)["properties"])


# ---------------------------------------------------------------------------
# Bloom filters (point-lookup file skipping)
# ---------------------------------------------------------------------------

_BLOOM_M = 8192  # bits per file per column (1 KiB serialized)
_BLOOM_K = 6
BLOOM_PROP = "table.bloom.columns"


def _bloom_hashes(v: Any) -> tuple[int, int] | None:
    """Two stable 64-bit hashes (double hashing h1 + i*h2).  Python's
    ``hash()`` is per-process randomized for str, so never used."""
    if v is None:
        return None
    if isinstance(v, bool) or not isinstance(v, (int, str, bytes)):
        return None
    if isinstance(v, int):
        x = v & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        y = (v & 0xFFFFFFFFFFFFFFFF) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF
        y ^= y >> 29
        return x, y | 1
    data = v.encode() if isinstance(v, str) else v
    import hashlib

    d = hashlib.blake2b(data, digest_size=16).digest()
    return (
        int.from_bytes(d[:8], "little"),
        int.from_bytes(d[8:], "little") | 1,
    )


def _build_bloom(values) -> str | None:
    """Values → base64 bitset, or None when any value is unhashable
    (absent bloom = conservative keep, never a wrong skip)."""
    import base64

    bits = bytearray(_BLOOM_M // 8)
    for v in values:
        hs = _bloom_hashes(v)
        if hs is None:
            if v is None:
                continue  # nulls never probed (stats carry null counts)
            return None
        h1, h2 = hs
        for i in range(_BLOOM_K):
            pos = (h1 + i * h2) % _BLOOM_M
            bits[pos >> 3] |= 1 << (pos & 7)
    return base64.b64encode(bytes(bits)).decode()


def _bloom_might_contain(b64: str, v: Any) -> bool:
    import base64

    hs = _bloom_hashes(v)
    if hs is None:
        return True
    bits = base64.b64decode(b64)
    h1, h2 = hs
    for i in range(_BLOOM_K):
        pos = (h1 + i * h2) % _BLOOM_M
        if not bits[pos >> 3] & (1 << (pos & 7)):
            return False
    return True


# ---------------------------------------------------------------------------
# Data-file writing + footer stats
# ---------------------------------------------------------------------------


def _stats_columns(schema: T.StructType) -> list[str]:
    return [
        f.name for f in schema.fields if isinstance(f.dataType, _STATS_TYPES)
    ]


def _json_safe(v: Any, direction: int = 0) -> Any:
    """JSON-encodable stat value.  Dates/timestamps become ISO strings
    (lexicographic order == temporal order, so pruning literals are
    ISO strings too); decimals become floats widened OUTWARD by one
    ulp in ``direction`` (-1 for a min, +1 for a max) so the stored
    range remains a valid bound after rounding."""
    import datetime
    import decimal
    import math

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return math.nextafter(f, direction * math.inf) if direction else f
    if isinstance(v, bytes):
        return None  # binary min/max not useful for pruning
    return v


def _footer_stats(path: str, columns: Sequence[str]) -> dict[str, Any]:
    """Per-file stats from the parquet footer only — no data pages are
    read.  (On a cluster these would be harvested executor-side during
    the write and shipped back through the commit — the numbers are
    identical because they come from the same footers.)"""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    names = {c: i for i, c in enumerate(pf.schema_arrow.names)}
    stats: dict[str, dict[str, Any]] = {}
    for col in columns:
        idx = names.get(col)
        if idx is None:
            continue
        mins, maxs, nulls = [], [], 0
        ok = True
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx).statistics
            try:
                if s is None or not s.has_min_max:
                    ok = False
                    break
                mins.append(s.min)
                maxs.append(s.max)
            except NotImplementedError:
                # pyarrow can't materialize min/max for some logical
                # types (e.g. certain decimals): degrade to statless —
                # the file is simply never pruned on this column
                ok = False
                break
            nulls += s.null_count or 0
        if ok and mins:
            stats[col] = {
                "min": _json_safe(min(mins), -1),
                "max": _json_safe(max(maxs), +1),
                "nulls": nulls,
            }
    return {
        "rows": md.num_rows,
        "bytes": os.path.getsize(path),
        "columns": stats,
    }


def _write_data_files(
    df: DataFrame,
    table: str,
    version: int,
    bloom_columns: Sequence[str] = (),
) -> list[dict[str, Any]]:
    """Write ``df`` as immutable uniquely-named parquet files inside
    the table directory and return their ``add`` actions.  The Spark
    job lands in a staging dir first; files are then renamed in (same
    filesystem, so renames are metadata-only).  A crash before commit
    leaves only unreferenced files, which vacuum reclaims — readers
    are never exposed to a partial write."""
    table = os.path.abspath(table)
    os.makedirs(table, exist_ok=True)
    token = uuid.uuid4().hex[:12]
    staging = os.path.join(table, f".staging-{token}")
    df.write.mode("overwrite").option("compression", "zstd").parquet(staging)
    cols = _stats_columns(df.schema)
    bc_present = [
        bc for bc in bloom_columns
        if bc in {f.name for f in df.schema.fields}
    ]
    try:
        parts = sorted(
            n for n in os.listdir(staging) if n.endswith(".parquet")
        )
        finals = []
        for i, name in enumerate(parts):
            final = f"part-{version:08d}-{i:05d}-{token}.parquet"
            os.rename(os.path.join(staging, name), os.path.join(table, final))
            finals.append(final)
        # Manifest stats: a footer read + (for bloom columns) a
        # one-column read per file.  Past a handful of files this is
        # driver-bound work, so fan it out as a Spark job over the file
        # list — the executors return only the small stat dicts
        # (exactly how a cluster harvests write-side stats; same bytes
        # either way because both paths read the same footers).
        if len(finals) > _DISTRIBUTED_STATS_THRESHOLD:
            sc = df.sparkSession.sparkContext
            adds = (
                sc.parallelize(finals, min(len(finals), 64))
                .map(
                    lambda fn, _t=table, _c=tuple(cols), _b=tuple(bc_present):
                        _file_add_action(_t, fn, _c, _b)
                )
                .collect()
            )
            adds.sort(key=lambda a: a["path"])
        else:
            adds = [
                _file_add_action(table, fn, tuple(cols), tuple(bc_present))
                for fn in finals
            ]
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return adds


_DISTRIBUTED_STATS_THRESHOLD = 32


def _file_add_action(
    table: str,
    final: str,
    cols: Sequence[str],
    bloom_columns: Sequence[str],
) -> dict[str, Any]:
    """One file's complete ``add`` action (footer stats + blooms) —
    pure function of the file, safe to evaluate on any executor."""
    full = os.path.join(table, final)
    add = {"path": final, **_footer_stats(full, list(cols))}
    blooms = {}
    for bc in bloom_columns:
        vals = pq.read_table(full, columns=[bc]).column(0).to_pylist()
        b = _build_bloom(vals)
        if b is not None:
            blooms[bc] = {"m": _BLOOM_M, "k": _BLOOM_K, "bits": b}
    if blooms:
        add["bloom"] = blooms
    return add


def _check_schema(df: DataFrame, snap: dict[str, Any], table: str) -> None:
    want = T.StructType.fromJson(json.loads(snap["schema"]))
    got = df.schema
    if {(f.name, f.dataType.simpleString()) for f in want.fields} != {
        (f.name, f.dataType.simpleString()) for f in got.fields
    }:
        raise TableLogError(
            f"schema mismatch writing to {table}: table has "
            f"{want.simpleString()}, dataframe has {got.simpleString()}"
        )


# ---------------------------------------------------------------------------
# Write operations
# ---------------------------------------------------------------------------


def create_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    properties: dict[str, str] | None = None,
    overwrite: bool = False,
    bloom_columns: Sequence[str] | None = None,
    txn_app: str | None = None,
    txn_batch: int | None = None,
) -> int:
    """Commit version 0: data files + schema + table properties (the
    idiomatic carrier for the reference's ``ome.arrow.type/version``
    parquet key-value tags, export.py:405-414, at table scale).
    ``bloom_columns`` become a table property: every data file written
    by any later operation carries a per-file Bloom filter on them, so
    point lookups and MERGEs on high-cardinality keys skip files whose
    key RANGE overlaps but whose key SET provably misses — min/max
    stats alone cannot do that on uuid-like keys.

    ``txn_app``/``txn_batch`` record ``txn.<app> = batch`` in the v0
    properties — Delta's idempotent-writes contract applies to the
    INITIAL write too (txnAppId/txnVersion on the creating commit), so
    a streaming ``foreachBatch`` sink whose batch 0 creates the table
    can have a batch-0 replay (restart after commit, before checkpoint
    advance) detected and skipped by :func:`append_table`'s check."""
    if (txn_app is None) != (txn_batch is None):
        raise TableLogError("txn_app and txn_batch go together")
    if current_version(table) is not None:
        if not overwrite:
            raise TableLogError(f"table already exists: {table}")
        shutil.rmtree(table, ignore_errors=True)
    props = dict(properties or {})
    if txn_app is not None:
        props[f"txn.{txn_app}"] = str(txn_batch)
    if bloom_columns:
        props[BLOOM_PROP] = json.dumps(sorted(bloom_columns))
    adds = _write_data_files(df, table, 0, bloom_columns or ())
    _commit(
        table,
        0,
        {
            "version": 0,
            "operation": "create",
            "schema": df.schema.json(),
            "properties": props,
            "actions": [{"add": a} for a in adds],
        },
    )
    return 0


def _bloom_cols(snap: dict[str, Any]) -> tuple[str, ...]:
    raw = snap.get("properties", {}).get(BLOOM_PROP)
    return tuple(json.loads(raw)) if raw else ()


def append_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    commit_attempts: int = 20,
    txn_app: str | None = None,
    txn_batch: int | None = None,
) -> int:
    """Atomic append: new files + one commit; never rewrites data.

    Appends are READ-INDEPENDENT: the new files don't depend on the
    snapshot they were computed against, so a lost commit race is
    resolved by re-reading the head and re-committing the SAME file
    actions at the next version — no data rewrite, no starvation under
    contention (Delta's blind-append conflict rule).  Schema and
    constraints are re-validated against each fresh head in case a
    concurrent commit evolved them.

    ``txn_app``/``txn_batch`` give Delta's idempotent-writes contract
    (``txnAppId``/``txnVersion``) for streaming ``foreachBatch``
    sinks: the table records ``txn.<app> = batch`` in its properties
    inside the SAME commit as the data, so a replayed micro-batch
    (restart after commit, before checkpoint advance) is detected and
    skipped BEFORE any data file lands.  Returns the current version
    unchanged on a skipped replay.  This makes plain appends an
    exactly-once sink for append-only streams at O(new-data) cost —
    the MERGE (upsert) sink is only needed when arriving keys can
    COLLIDE with stored rows."""
    if (txn_app is None) != (txn_batch is None):
        raise TableLogError("txn_app and txn_batch go together")
    snap = _resolve_snapshot(table)
    if txn_app is not None:
        prev = snap["properties"].get(f"txn.{txn_app}")
        if prev is not None and int(prev) >= int(txn_batch):
            return snap["version"]
    _check_schema(df, snap, table)
    _enforce_constraints(df, snap, table)
    version = snap["version"] + 1
    adds = _write_data_files(df, table, version, _bloom_cols(snap))
    entry = {
        "operation": "append",
        "actions": [{"add": a} for a in adds],
    }
    if txn_app is not None:
        entry["properties"] = {f"txn.{txn_app}": str(txn_batch)}
    for attempt in range(commit_attempts):
        try:
            _commit(table, version, {"version": version, **entry})
            return version
        except ConcurrentCommit:
            if attempt == commit_attempts - 1:
                raise
            prev_snap = snap
            snap = _resolve_snapshot(table)
            if txn_app is not None:
                prev = snap["properties"].get(f"txn.{txn_app}")
                if prev is not None and int(prev) >= int(txn_batch):
                    # a concurrent writer (replay race) landed this
                    # batch: the staged files become permanent no-ops
                    return snap["version"]
            _check_schema(df, snap, table)
            if snap["properties"] != prev_snap["properties"]:
                _enforce_constraints(df, snap, table)
            version = snap["version"] + 1
    raise AssertionError("unreachable")


def upsert_table(
    spark: SparkSession,
    updates: DataFrame,
    table: str,
    key: str,
    order_by: str | Sequence[str] | None = None,
    cluster_by: str | None = None,
) -> int:
    """MERGE by key with manifest pruning: only files whose footer
    ``[min,max]`` range on ``key`` can contain an update key are
    rewritten (kept-rows anti-join ∪ updates); every other file is
    carried by reference.  Over-selection is harmless (non-matching
    rows survive the anti-join); under-selection cannot happen because
    any matching key is inside its file's min/max.  Cost scales with
    the touched fraction of the table, not table size — the Delta
    ``MERGE INTO`` shape (README design note, item 1).

    ``order_by`` makes the merge CONDITIONAL (Delta ``WHEN MATCHED AND
    s.ord > t.ord``): per key, the row with the greatest ``order_by``
    tuple wins, update rows beating existing rows on exact ties.  With
    it, out-of-order update batches (late CDC events, replayed
    micro-batches) converge to the same final state regardless of
    arrival order — the idempotence streaming ``foreachBatch`` sinks
    need.  The update batch must be key-unique either way.

    ``cluster_by`` overrides which column the REWRITTEN files are
    range-clustered on (default: the merge key).  Tables whose scan
    pruning rides a different column than the merge key — e.g. an IVF
    index merged by vector id but probed by centroid — keep their
    read-side clustering through maintenance."""
    snap = _resolve_snapshot(table)
    _check_schema(updates, snap, table)
    _enforce_constraints(updates, snap, table)
    version = snap["version"] + 1

    bounds = updates.agg(
        F.min(key).alias("lo"), F.max(key).alias("hi")
    ).collect()[0]
    # Same encoding as the stored stats, so comparisons are type-safe.
    lo, hi = _json_safe(bounds["lo"], -1), _json_safe(bounds["hi"], +1)

    touched: list[str] = []
    carried: list[str] = []
    for path, add in snap["files"].items():
        st = add.get("columns", {}).get(key)
        if lo is None:  # empty updates: nothing can match
            carried.append(path)
        elif st is None or st["min"] is None:
            touched.append(path)  # no stats → must assume overlap
        elif st["max"] < lo or st["min"] > hi:
            carried.append(path)
        else:
            touched.append(path)

    # Bloom phase: range overlap is a weak test on high-cardinality
    # keys (every file of uuid-like ids spans the whole key space).
    # When the update batch is small enough to enumerate and the table
    # carries blooms on the key, drop candidates whose bloom rejects
    # EVERY update key — a wrong drop is impossible (blooms have no
    # false negatives), a false positive just rewrites one extra file.
    _BLOOM_KEY_CAP = 10_000
    if key in _bloom_cols(snap) and touched:
        bloomed = [
            p for p in touched if snap["files"][p].get("bloom", {}).get(key)
        ]
        if bloomed:
            ukeys = [
                r[0]
                for r in updates.select(key)
                .distinct()
                .limit(_BLOOM_KEY_CAP + 1)
                .collect()
            ]
            if len(ukeys) <= _BLOOM_KEY_CAP:
                for p in bloomed:
                    bits = snap["files"][p]["bloom"][key]["bits"]
                    if not any(_bloom_might_contain(bits, k) for k in ukeys):
                        touched.remove(p)
                        carried.append(p)

    actions: list[dict[str, Any]] = []
    if touched:
        existing = _scan(
            spark,
            table,
            snap["files"],
            touched,
            T.StructType.fromJson(json.loads(snap["schema"])),
        )
        if order_by is None:
            kept = existing.join(
                updates.select(F.col(key).alias("__uk")).distinct(),
                existing[key] == F.col("__uk"),
                "left_anti",
            )
            merged = kept.unionByName(updates)
        else:
            from pyspark.sql.window import Window

            ords = [order_by] if isinstance(order_by, str) else list(order_by)
            staged = existing.withColumn("__src", F.lit(0)).unionByName(
                updates.withColumn("__src", F.lit(1))
            )
            w = Window.partitionBy(key).orderBy(
                *[F.col(c).desc() for c in ords], F.col("__src").desc()
            )
            merged = (
                staged.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", "__src")
            )
    else:
        merged = updates
    if lo is not None or touched:
        # Rewrite range-clustered on the merge key: the touched files'
        # replacements keep tight key min/max (and Bloom) stats, so the
        # NEXT merge prunes as well as this one did — without this,
        # every upsert would progressively destroy the clustering that
        # makes manifest pruning work.  Sized to the churned bytes,
        # ~128 MB per output file.
        touched_bytes = sum(
            snap["files"][p].get("bytes", 0) for p in touched
        )
        n_out = max(1, -(-touched_bytes // (128 * 1024 * 1024)))
        merged = merged.repartitionByRange(n_out, cluster_by or key)
        adds = _write_data_files(merged, table, version, _bloom_cols(snap))
        actions += [{"add": a} for a in adds]
        actions += [{"remove": {"path": p}} for p in touched]
    _commit(
        table,
        version,
        {"version": version, "operation": "upsert", "actions": actions},
    )
    return version


def delete_from_table(
    spark: SparkSession,
    table: str,
    predicate: str,
    prune_predicates: Iterable[tuple[str, str, Any]] | None = None,
    mode: str = "rewrite",
) -> int:
    """Delete rows matching a SQL ``predicate``.  When the caller also
    supplies the predicate's stats-checkable conjuncts as
    ``prune_predicates`` (same ``(col, op, literal)`` form as
    :func:`read_table`), files whose footer stats prove they contain
    NO matching row are carried by reference untouched; only the
    surviving candidates are touched.  Literal encoding follows
    :func:`read_table` (datetime or ISO string both accepted).

    ``mode="rewrite"`` (default) rewrites the touched files with the
    predicate inverted — the right move when the deleted fraction is
    large.  ``mode="dv"`` writes DELETION VECTORS instead: each
    touched file gets a sidecar of deleted row positions and is
    re-added in place — a point delete then costs O(matched rows) of
    sidecar bytes, not a rewrite of every touched 128 MB file.  A file
    whose every row is deleted is removed outright (no sidecar).
    Sidecars are written executor-side (one task per touched file,
    merging any existing vector); only per-file (path, cardinality)
    rows reach the driver.  :func:`compact_table` rewrites DV'd files,
    materializing the deletes."""
    if mode not in ("rewrite", "dv"):
        raise TableLogError(f"delete mode must be 'rewrite' or 'dv': {mode!r}")
    snap = _resolve_snapshot(table)
    version = snap["version"] + 1
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    touched = _prune(snap["files"], prune_predicates)
    actions: list[dict[str, Any]] = []
    if touched and mode == "dv":
        schema_full = T.StructType.fromJson(json.loads(snap["schema"]))
        matches = (
            spark.read.schema(schema_full)
            .parquet(*[os.path.join(table, p) for p in touched])
            .filter(predicate)
            .select(
                F.col("_metadata.file_name").alias("__dv_file"),
                F.col("_metadata.row_index").alias("__dv_pos"),
            )
        )
        actions = _dv_delete_actions(
            spark, table, snap, touched, matches, version
        )
    elif touched:
        existing = _scan(spark, table, snap["files"], touched, schema)
        remaining = existing.filter(f"NOT ({predicate})")
        adds = _write_data_files(remaining, table, version, _bloom_cols(snap))
        actions += [{"add": a} for a in adds]
        actions += [{"remove": {"path": p}} for p in touched]
    _commit(
        table,
        version,
        {"version": version, "operation": "delete", "actions": actions},
    )
    return version


def _dv_delete_actions(
    spark: SparkSession,
    table: str,
    snap: dict[str, Any],
    touched: list[str],
    matches: DataFrame,
    version: int,
) -> list[dict[str, Any]]:
    """Commit actions for a deletion-vector delete.  ``matches`` is a
    ``(__dv_file, __dv_pos)`` DataFrame of PHYSICAL row positions to
    delete (already-deleted rows may re-match; the position union
    dedups).  Writes one merged sidecar per file executor-side and
    re-adds each file in place with its new vector — or removes it
    when the vector covers every row."""
    abs_table = os.path.abspath(table)
    os.makedirs(os.path.join(abs_table, DV_DIR), exist_ok=True)
    token = uuid.uuid4().hex[:12]
    existing_dv = {
        os.path.basename(p): snap["files"][p]["dv"]["path"]
        for p in touched
        if snap["files"][p].get("dv")
    }

    def _write_sidecars(key, pdf):
        import hashlib

        import numpy as np
        import pandas as pd

        fname = key[0]
        pos = pdf["__dv_pos"].to_numpy(dtype=np.uint64)
        prior = existing_dv.get(fname)
        if prior is not None:
            pos = np.concatenate([pos, _read_dv(abs_table, prior)])
        data = _dv_encode(pos)
        card = int.from_bytes(data[len(_DV_MAGIC):len(_DV_MAGIC) + 8],
                              "little")
        digest = hashlib.md5(fname.encode()).hexdigest()[:12]
        rel = f"{DV_DIR}/dv-{version:08d}-{token}-{digest}.bin"
        with open(os.path.join(abs_table, rel), "wb") as f:
            f.write(data)
        return pd.DataFrame(
            {"file": [fname], "dv": [rel], "card": [card]}
        )

    written = (
        matches.groupBy("__dv_file")
        .applyInPandas(_write_sidecars, "file string, dv string, card long")
        .collect()
    )
    actions: list[dict[str, Any]] = []
    for r in written:
        add = dict(snap["files"][r["file"]])
        rows = add.get("rows")
        if rows is not None and r["card"] >= rows:
            actions.append({"remove": {"path": r["file"]}})
        else:
            add["dv"] = {"path": r["dv"], "cardinality": r["card"]}
            actions.append({"add": add})
    return actions


def delete_keys_from_table(
    spark: SparkSession,
    table: str,
    keys: DataFrame,
    key: str,
    mode: str = "rewrite",
) -> int:
    """Delete every row whose ``key`` appears in the (arbitrarily
    large) ``keys`` DataFrame — the driver-bounded twin of
    :func:`delete_from_table` for set-membership predicates.
    ``mode="dv"`` writes deletion vectors instead of rewriting the
    touched files (matched positions come from a LEFT SEMI join
    against the key set) — the shape of a GDPR-style point delete at
    100 TB: the cost is the matched rows' positions, not a rewrite of
    every file that contains one key.

    Nothing about the key set ever reaches the driver:

    * file candidacy is decided by joining the manifest's per-file
      ``(min, max)`` stats ranges (driver metadata, O(files)) against
      the keys **distributively**; only the O(touched-files) path list
      is collected,
    * the rewrite is a ``LEFT ANTI`` join of the touched files against
      the keys — no ``IN (...)`` literal list, no ``collect()`` of ids.

    Files whose stats range provably contains no key are carried by
    reference untouched, so cost still scales with the touched
    fraction.  (Files with no stats for ``key`` are conservatively
    rewritten.)"""
    if mode not in ("rewrite", "dv"):
        raise TableLogError(f"delete mode must be 'rewrite' or 'dv': {mode!r}")
    snap = _resolve_snapshot(table)
    version = snap["version"] + 1
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    kdf = keys.select(F.col(key).alias("_del_key")).distinct()
    ranged, statless = [], []
    for p, a in snap["files"].items():
        st = a.get("columns", {}).get(key)
        if st is not None and st["min"] is not None and st["max"] is not None:
            ranged.append((p, st["min"], st["max"]))
        else:
            statless.append(p)
    touched = list(statless)
    if ranged:
        key_dt = schema[key].dataType
        cmp_key = F.col("_del_key")
        if isinstance(
            key_dt, (T.DateType, T.TimestampType, T.TimestampNTZType)
        ):
            # _stats stores temporal min/max as ISO strings
            # (_json_safe); build the ranges as strings and cast back —
            # exact, since ISO lexicographic order == temporal order.
            ranges_df = spark.createDataFrame(
                [(p, str(lo), str(hi)) for p, lo, hi in ranged],
                "_path string, _lo string, _hi string",
            ).select(
                "_path",
                F.col("_lo").cast(key_dt).alias("_lo"),
                F.col("_hi").cast(key_dt).alias("_hi"),
            )
        elif isinstance(key_dt, T.DecimalType):
            # decimal stats are stored as floats widened outward by one
            # ulp; compare in double space (monotone rounding keeps the
            # bound conservative) instead of casting float→decimal.
            ranges_df = spark.createDataFrame(
                [(p, float(lo), float(hi)) for p, lo, hi in ranged],
                "_path string, _lo double, _hi double",
            )
            cmp_key = F.col("_del_key").cast("double")
        else:
            key_type = key_dt.simpleString()
            ranges_df = spark.createDataFrame(
                ranged, f"_path string, _lo {key_type}, _hi {key_type}"
            )
        touched += [
            r["_path"]
            for r in F.broadcast(ranges_df)
            .join(
                kdf,
                (cmp_key >= F.col("_lo")) & (cmp_key <= F.col("_hi")),
                "left_semi",
            )
            .select("_path")
            .collect()
        ]
    actions: list[dict[str, Any]] = []
    if touched and mode == "dv":
        raw = spark.read.schema(schema).parquet(
            *[os.path.join(table, p) for p in touched]
        ).select(
            F.col(key).alias("__dv_key"),
            F.col("_metadata.file_name").alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        )
        matches = raw.join(
            kdf, raw["__dv_key"] == kdf["_del_key"], "left_semi"
        ).select("__dv_file", "__dv_pos")
        actions = _dv_delete_actions(
            spark, table, snap, touched, matches, version
        )
    elif touched:
        existing = _scan(spark, table, snap["files"], touched, schema)
        remaining = existing.join(
            kdf, existing[key] == kdf["_del_key"], "left_anti"
        )
        adds = _write_data_files(remaining, table, version, _bloom_cols(snap))
        actions += [{"add": a} for a in adds]
        actions += [{"remove": {"path": p}} for p in touched]
    _commit(
        table,
        version,
        {"version": version, "operation": "delete", "actions": actions},
    )
    return version


def compact_table(
    spark: SparkSession,
    table: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_file_bytes: int | None = None,
) -> int:
    """Small-file compaction as a metadata swap: rewrite ONLY files
    under ``small_file_bytes`` (default: under ``target_bytes``, the
    Delta ``OPTIMIZE`` rule) into ~``target_bytes`` files; files
    already at target size are carried by reference — at 100 TB a
    compaction that rewrites the whole table would be the bug, not the
    maintenance.  Commit is remove(small)+add(new); readers on older
    snapshots are unaffected (old files stay until vacuum).  Returns
    the new version, or the current one unchanged when nothing
    qualifies."""
    snap = _resolve_snapshot(table)
    version = snap["version"] + 1
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    threshold = target_bytes if small_file_bytes is None else small_file_bytes
    # DV'd files always qualify: compaction is where deletion vectors
    # are materialized (rows dropped for real, sidecar retired).
    files = [
        p for p, a in snap["files"].items()
        if a.get("bytes", 0) < threshold or a.get("dv")
    ]
    if len(files) < 2 and not any(
        snap["files"][p].get("dv") for p in files
    ):  # nothing to gain from rewriting 0-1 DV-free files
        return snap["version"]
    total = sum(snap["files"][p].get("bytes", 0) for p in files)
    n = max(1, -(-total // target_bytes))
    df = _scan(spark, table, snap["files"], files, schema)
    adds = _write_data_files(df.repartition(n), table, version, _bloom_cols(snap))
    _commit(
        table,
        version,
        {
            "version": version,
            "operation": "compact",
            "actions": [{"add": a} for a in adds]
            + [{"remove": {"path": p}} for p in files],
        },
    )
    return version


def table_changes(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level change feed between two snapshots — Delta's
    ``table_changes`` semantics derived from the log's file-level
    deltas: rows present only in the newer snapshot are ``insert``,
    rows present only in the older one are ``delete`` (an update
    appears as its delete+insert pair).  Multiset semantics
    (``exceptAll``), so duplicate rows are counted, not collapsed.

    Scan cost note: both endpoint snapshots read only files that
    CHANGED between the versions — files carried by reference in both
    snapshots cancel out, so they are dropped from both sides before
    the exceptAll rather than scanned.  A file's identity here is
    (path, deletion-vector): a DV-only delete re-adds the same path
    with a new vector, so the file lands on BOTH sides — old live rows
    minus new live rows is exactly the newly-deleted set."""
    snap_new = _resolve_snapshot(table, to_version)
    snap_old = _resolve_snapshot(table, from_version)
    schema = T.StructType.fromJson(json.loads(snap_new["schema"]))
    old_ids = {
        p: a.get("dv", {}).get("path") for p, a in snap_old["files"].items()
    }
    new_ids = {
        p: a.get("dv", {}).get("path") for p, a in snap_new["files"].items()
    }
    _ABSENT = object()
    only_old = sorted(
        p for p, d in old_ids.items() if new_ids.get(p, _ABSENT) != d
    )
    only_new = sorted(
        p for p, d in new_ids.items() if old_ids.get(p, _ABSENT) != d
    )
    cols = [f.name for f in schema.fields]

    def _read(paths, snap):
        if not paths:
            return spark.createDataFrame([], schema)
        s = T.StructType.fromJson(json.loads(snap["schema"]))
        df = _scan(spark, table, snap["files"], paths, s)
        # schema evolution: align older snapshots to the new schema
        for f in schema.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df.select(cols)

    new_rows = _read(only_new, snap_new)
    old_rows = _read(only_old, snap_old)
    inserts = new_rows.exceptAll(old_rows).withColumn(
        "_change_type", F.lit("insert")
    )
    deletes = old_rows.exceptAll(new_rows).withColumn(
        "_change_type", F.lit("delete")
    )
    return inserts.unionByName(deletes)


def table_changes_by_version(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Per-commit change feed — :func:`table_changes` with Delta's
    ``_commit_version`` attribution: one endpoint diff per consecutive
    version pair in ``(from_version, to_version]``, unioned.  Costs
    one changed-files diff per commit (each scans only that commit's
    churn), so a K-commit feed over an N-file table reads the K
    commits' touched files, never N."""
    versions = [
        v for v in _list_versions(table)
        if v >= from_version
        and (to_version is None or v <= to_version)
    ]
    if len(versions) < 2:
        snap = _resolve_snapshot(table, from_version)
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        empty = T.StructType(
            schema.fields
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )
        return spark.createDataFrame([], empty)
    out = None
    for lo, hi in zip(versions, versions[1:]):
        part = table_changes(spark, table, lo, hi).withColumn(
            "_commit_version", F.lit(hi).cast("long")
        )
        out = part if out is None else out.unionByName(part)
    return out


def recluster_table(
    spark: SparkSession,
    table: str,
    by: str,
    n_files: int,
) -> int:
    """Full rewrite range-clustered on ``by`` into ``n_files``
    contiguous ranges — the maintenance move for tables whose READ
    pruning rides a clustering column that incremental MERGEs slowly
    fragment (inverted indexes, IVF lists).  One commit of
    remove-all + add-new; older snapshots stay readable until vacuum.
    Unlike :func:`compact_table` (which bin-packs small files with no
    ordering), this RESTORES per-file min/max tightness on ``by``."""
    snap = _resolve_snapshot(table)
    version = snap["version"] + 1
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    files = list(snap["files"])
    if not files:
        return snap["version"]
    df = _scan(spark, table, snap["files"], files, schema)
    adds = _write_data_files(
        df.repartitionByRange(max(1, n_files), by),
        table,
        version,
        _bloom_cols(snap),
    )
    _commit(
        table,
        version,
        {
            "version": version,
            "operation": "recluster",
            "actions": [{"add": a} for a in adds]
            + [{"remove": {"path": p}} for p in files],
        },
    )
    return version


# ---------------------------------------------------------------------------
# Read path
# ---------------------------------------------------------------------------

_OPS = ("<=", ">=", "=", "<", ">")


def _prune(
    files: dict[str, dict[str, Any]],
    predicates: Iterable[tuple[str, str, Any]] | None,
) -> list[str]:
    """Manifest file skipping: drop a file only when its footer stats
    (or, for equality, its per-file Bloom filter) PROVE no row can
    satisfy an AND-ed ``(column, op, literal)`` conjunct; missing
    stats/bloom keep the file (conservative).

    Literals are coerced through the same ``_json_safe`` encoding the
    stats were stored with (date/datetime → ISO string), so callers
    may pass either a ``datetime`` object or its ISO string.  A
    literal that still cannot be ordered against a stored stat (e.g.
    int vs string-column stats) conservatively KEEPS the file rather
    than raising."""
    if not predicates:
        return list(files)
    out = []
    for path, add in files.items():
        keep = True
        for col, op, lit in predicates:
            if op not in _OPS:
                raise TableLogError(f"unsupported prune op: {op}")
            lit = _json_safe(lit)
            st = add.get("columns", {}).get(col)
            if st is not None and st["min"] is not None and st["max"] is not None:
                lo, hi = st["min"], st["max"]
                try:
                    if (
                        (op == "=" and (lit < lo or lit > hi))
                        or (op in ("<", "<=") and (lo > lit or (op == "<" and lo == lit)))
                        or (op in (">", ">=") and (hi < lit or (op == ">" and hi == lit)))
                    ):
                        keep = False
                        break
                except TypeError:
                    pass  # incomparable literal/stat types: keep the file
            if op == "=":
                bl = add.get("bloom", {}).get(col)
                if bl is not None and not _bloom_might_contain(bl["bits"], lit):
                    keep = False
                    break
        if keep:
            out.append(path)
    return out


def read_table(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    predicates: Iterable[tuple[str, str, Any]] | None = None,
    timestamp: float | None = None,
) -> DataFrame:
    """Snapshot read (optionally time-traveled to ``version``, or to
    the latest commit at or before ``timestamp`` — Delta's
    ``TIMESTAMP AS OF``) with manifest pruning.  The returned plan scans ONLY the surviving
    files — Spark never lists the directory, so planning cost is
    O(log suffix), not O(files).  Each ``(column, op, literal)``
    predicate both PRUNES files via manifest stats/blooms and is
    applied as a row filter on the scan (where Catalyst additionally
    pushes it into parquet row-group pruning) — callers get complete
    predicate semantics from one argument.  Date/timestamp literals
    may be passed as ``datetime`` objects or ISO strings — pruning
    coerces them to the manifest's ISO encoding either way."""
    if timestamp is not None:
        if version is not None:
            raise TableLogError("pass version OR timestamp, not both")
        version = version_at_timestamp(table, timestamp)
    snap = _resolve_snapshot(table, version)
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    preds = list(predicates) if predicates else []
    live = _prune(snap["files"], preds)
    df = _scan(spark, table, snap["files"], live, schema)
    _OP_FN = {
        "=": lambda c, v: c == v, "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v, ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
    }
    for col, op, lit in preds:
        df = df.filter(_OP_FN[op](F.col(col), F.lit(lit)))
    return df


def pruned_file_count(
    table: str,
    predicates: Iterable[tuple[str, str, Any]] | None = None,
    version: int | None = None,
) -> tuple[int, int]:
    """(surviving, total) live-file counts for a predicate — the
    observable for pruning tests and skew/cost reports."""
    snap = _resolve_snapshot(table, version)
    return len(_prune(snap["files"], predicates)), len(snap["files"])


CONSTRAINT_PROP_PREFIX = "table.constraint."


def set_table_properties(table: str, props: dict[str, str]) -> int:
    """Commit a metadata-only version merging ``props`` into the table
    properties (later commits win key-by-key, like Delta's ``ALTER
    TABLE SET TBLPROPERTIES``).  Data files are untouched."""
    snap = _resolve_snapshot(table)
    version = snap["version"] + 1
    _commit(
        table,
        version,
        {
            "version": version,
            "operation": "set_properties",
            "properties": dict(props),
            "actions": [],
        },
    )
    return version


def add_table_constraint(
    spark: SparkSession, table: str, name: str, expr: str
) -> int:
    """Delta-style CHECK constraint: a SQL boolean expression every row
    of every FUTURE write must satisfy (existing rows are validated
    once, here and now).  Stored as a table property; enforced by
    :func:`_enforce_constraints` before any data lands, so a violating
    batch commits nothing."""
    snap = _resolve_snapshot(table)
    key = CONSTRAINT_PROP_PREFIX + name
    if key in snap["properties"]:
        raise TableLogError(f"constraint already exists: {name}")
    current = read_table(spark, table)
    bad = current.filter(f"NOT ({expr})").count()
    if bad:
        raise TableLogError(
            f"cannot add constraint {name!r}: {bad} existing rows violate ({expr})"
        )
    version = snap["version"] + 1
    _commit(
        table,
        version,
        {
            "version": version,
            "operation": "add_constraint",
            "properties": {key: expr},
            "actions": [],
        },
    )
    return version


def _enforce_constraints(df: DataFrame, snap: dict[str, Any], table: str) -> None:
    """One validation pass over the incoming batch BEFORE any file is
    written — a violation aborts with zero on-disk effects.  (The extra
    scan is the price of write-time guarantees; Delta pays the same.)"""
    checks = {
        k[len(CONSTRAINT_PROP_PREFIX):]: v
        for k, v in snap.get("properties", {}).items()
        if k.startswith(CONSTRAINT_PROP_PREFIX)
    }
    if not checks:
        return
    combined = " AND ".join(f"({v})" for v in checks.values())
    bad = df.filter(f"NOT ({combined})").count()
    if bad:
        raise TableLogError(
            f"write to {table} violates constraint(s) "
            f"{sorted(checks)}: {bad} row(s) rejected"
        )


def add_table_column(
    spark: SparkSession,
    table: str,
    name: str,
    ddl_type: str,
) -> int:
    """Metadata-only schema evolution: ADD COLUMN commits a new schema
    and touches ZERO data files.  Readers apply the snapshot schema to
    every live file; parquet files written before the evolution simply
    lack the column and Spark's schema-on-read fills it with null —
    so the commit is O(1) regardless of table size, exactly the
    Delta/Iceberg ``ALTER TABLE ADD COLUMN`` contract.  Writes after
    the evolution must carry the new column (schema check unchanged);
    time travel before it sees the old schema, because snapshot
    resolution replays schema updates in commit order."""
    snap = _resolve_snapshot(table)
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    if name in schema.fieldNames():
        raise TableLogError(f"column already exists: {name}")
    new_schema = T.StructType(
        schema.fields + list(T.StructType.fromDDL(f"`{name}` {ddl_type}").fields)
    )
    version = snap["version"] + 1
    _commit(
        table,
        version,
        {
            "version": version,
            "operation": "add_column",
            "schema": new_schema.json(),
            "actions": [],
        },
    )
    return version


def optimize_table(
    spark: SparkSession,
    table: str,
    zorder_by: Sequence[str] | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    bits_per_col: int = 8,
) -> int:
    """Compaction with optional multi-column Z-ORDER clustering.

    Min/max file skipping only works on columns the file layout is
    sorted by; a table range-partitioned on ``a`` prunes nothing for a
    predicate on ``b``.  Z-ordering interleaves the bits of
    quantile-bucketed column ranks into one clustering key, so files
    end up tight on EVERY listed column at once and the same footer
    min/max stats prune multi-dimensionally — the Delta ``OPTIMIZE
    ZORDER BY`` shape.

    Scale notes: bucket boundaries come from ``approxQuantile`` (one
    pass, driver gets ``2^bits_per_col`` floats per column — never
    data); the z-value is a pure Catalyst bit-weave expression; the
    rewrite is one ``repartitionByRange`` shuffle on the z-value plus
    a within-partition sort.  No global single-partition window
    anywhere (``ntile`` over the whole table would be one)."""
    snap = _resolve_snapshot(table)
    version = snap["version"] + 1
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    files = list(snap["files"])
    df = _scan(spark, table, snap["files"], files, schema)
    total = sum(a.get("bytes", 0) for a in snap["files"].values())
    n = max(1, -(-total // target_bytes))
    if zorder_by:
        numeric = (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType,
        )
        for col in zorder_by:
            if col not in schema.fieldNames() or not isinstance(
                schema[col].dataType, numeric
            ):
                raise TableLogError(
                    f"zorder_by column {col!r} must be a numeric table "
                    "column (quantile bucketing); cluster strings via a "
                    "numeric surrogate (e.g. xxhash64) or plain "
                    "repartitionByRange before create"
                )
        n_buckets = 1 << bits_per_col
        # quantile boundaries → equal-population buckets even on
        # skewed columns (plain min/max scaling would collapse); the
        # multi-column list form runs ONE Greenwald-Khanna job for all
        # zorder columns instead of one scan per column
        all_qs = df.stat.approxQuantile(
            list(zorder_by),
            [i / n_buckets for i in range(1, n_buckets)],
            0.001,
        )
        zcols = []
        for col, qs in zip(zorder_by, all_qs):
            bucket = F.lit(0)
            for b in qs:  # rank = #boundaries below the value
                bucket = bucket + F.when(F.col(col) > F.lit(b), 1).otherwise(0)
            zcols.append(bucket.cast("long"))
        weave = F.lit(0).cast("long")
        for bit in range(bits_per_col):
            for ci, zc in enumerate(zcols):
                weave = weave.bitwiseOR(
                    F.shiftleft(
                        F.shiftright(zc, bit).bitwiseAND(F.lit(1)),
                        bit * len(zcols) + ci,
                    )
                )
        clustered = (
            df.withColumn("__z", weave)
            .repartitionByRange(max(n, 2), "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        clustered = df.repartition(n)
    adds = _write_data_files(clustered, table, version, _bloom_cols(snap))
    _commit(
        table,
        version,
        {
            "version": version,
            "operation": "zorder" if zorder_by else "compact",
            "actions": [{"add": a} for a in adds]
            + [{"remove": {"path": p}} for p in files],
        },
    )
    return version


# ---------------------------------------------------------------------------
# Incremental view maintenance
# ---------------------------------------------------------------------------


def version_delta_files(
    table: str, from_version: int, to_version: int
) -> tuple[list[str], list[str]]:
    """Net (added, removed) data files between the two snapshots.  A
    file both added and removed inside the range cancels to nothing; a
    removed file that predates the range lands in ``removed`` (it is
    still on disk until vacuum, which is exactly why vacuum retention
    must cover the refresh horizon).  File identity is (path,
    deletion-vector): a DV-only delete re-adds the same path with a
    new vector, so the file appears on BOTH sides — its new live rows
    count positive and its old live rows negative, netting to exactly
    the deleted rows."""
    versions = _list_versions(table)
    if from_version not in versions or to_version not in versions:
        raise TableLogError(
            f"delta range ({from_version}, {to_version}] not in log"
        )
    snap_old = _resolve_snapshot(table, from_version)
    snap_new = _resolve_snapshot(table, to_version)
    old_ids = {
        p: a.get("dv", {}).get("path") for p, a in snap_old["files"].items()
    }
    new_ids = {
        p: a.get("dv", {}).get("path") for p, a in snap_new["files"].items()
    }
    _ABSENT = object()
    added = sorted(
        p for p, d in new_ids.items() if old_ids.get(p, _ABSENT) != d
    )
    removed = sorted(
        p for p, d in old_ids.items() if new_ids.get(p, _ABSENT) != d
    )
    return added, removed


def incremental_agg_delta(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int,
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
    decimal_out: bool = False,
) -> DataFrame:
    """Delta of associative aggregates (COUNT + SUMs) between two
    snapshots, computed from CHANGED FILES ONLY: rows in net-added
    files count positive, rows in net-removed files negative.  Because
    every mutation is expressed as file adds/removes, ``old state +
    this delta == full recompute`` for ANY operation mix
    (append/upsert/delete/compact — compaction's adds and removes
    cancel row-for-row).  Refresh cost scales with the churned
    fraction of the table, not table size — the materialized-view
    maintenance story at 100 TB.  Returns one row per group:
    ``d_count`` plus ``d_<alias>`` per requested sum."""
    snap = _resolve_snapshot(table, to_version)
    snap_from = _resolve_snapshot(table, from_version)
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    added, removed = version_delta_files(table, from_version, to_version)

    def _signed(paths: list[str], sign: int) -> DataFrame | None:
        if not paths:
            return None
        # positive side reads with the NEW snapshot's deletion vectors,
        # negative with the OLD — a DV-only delete thus nets to exactly
        # -1 × (newly deleted rows)
        files = (snap if sign > 0 else snap_from)["files"]
        df = _scan(spark, table, files, paths, schema)
        return df.withColumn("__sign", F.lit(sign))

    parts = [d for d in (_signed(added, 1), _signed(removed, -1)) if d is not None]
    if not parts:
        empty = T.StructType(
            [schema[c] for c in group_cols]
            + [T.StructField("d_count", T.LongType())]
            + [T.StructField(f"d_{a}", T.DoubleType()) for a in sum_cols]
        )
        return spark.createDataFrame([], empty)
    staged = parts[0]
    for p in parts[1:]:
        staged = staged.unionByName(p)
    def _out(c):  # decimal_out lets callers defer the double cast so
        return c if decimal_out else c.cast("double")  # state+delta adds stay exact

    aggs = [F.sum("__sign").cast("long").alias("d_count")] + [
        _out(F.sum(F.col(col).cast("decimal(30,6)") * F.col("__sign"))).alias(
            f"d_{alias}"
        )
        for alias, col in sum_cols.items()
    ]
    return staged.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# OME images on the log
# ---------------------------------------------------------------------------


def create_ome_table(
    spark: SparkSession,
    images: DataFrame,
    table: str,
    column: str = "ome_arrow",
    overwrite: bool = False,
    txn_app: str | None = None,
    txn_batch: int | None = None,
) -> int:
    """OME images table on the commit log.  The reference's
    ``ome.arrow.type``/``ome.arrow.version`` parquet file tags
    (export.py:405-414) ride as TABLE PROPERTIES — set once in the
    log, survive every rewrite, no per-file sidecar.  ``image_id`` is
    lifted to a top-level column so the manifest carries min/max id
    stats AND a per-file Bloom filter, so :func:`upsert_ome_table`
    merges and :func:`read_ome_table` point lookups touch only files
    that can actually contain the ids (id strings are
    high-cardinality, where range stats alone prune poorly)."""
    from ome_arrow_spark.meta import (
        META_KEY_TYPE,
        META_KEY_VERSION,
        OME_ARROW_TYPE,
        OME_ARROW_VERSION,
    )

    flat = images.select(
        F.col(f"{column}.id").alias("image_id"), F.col(column)
    )
    return create_table(
        spark,
        flat,
        table,
        properties={
            META_KEY_TYPE: OME_ARROW_TYPE,
            META_KEY_VERSION: OME_ARROW_VERSION,
        },
        overwrite=overwrite,
        bloom_columns=["image_id"],
        txn_app=txn_app,
        txn_batch=txn_batch,
    )


def upsert_ome_table(
    spark: SparkSession,
    updates: DataFrame,
    table: str,
    column: str = "ome_arrow",
) -> int:
    flat = updates.select(
        F.col(f"{column}.id").alias("image_id"), F.col(column)
    )
    # Materialize the batch ONCE (r14): upsert_table evaluates its
    # updates relation up to three times (key-bounds agg, bloom-key
    # probe, rewrite), and in the streaming foreachBatch sink each
    # evaluation re-runs the image DECODE plan — measured ~0.9 s of
    # scan + Python-worker job overhead per extra pass at 50-image
    # batches.  A micro-batch is O(new-data) by contract, so one
    # eager local materialization is bounded at any scale (the same
    # source-materialization a Delta MERGE performs).
    return upsert_table(
        spark, flat.localCheckpoint(eager=True), table, key="image_id"
    )


def append_ome_table(
    spark: SparkSession,
    images: DataFrame,
    table: str,
    column: str = "ome_arrow",
    txn_app: str | None = None,
    txn_batch: int | None = None,
) -> int:
    """Append-only twin of :func:`upsert_ome_table` for acquisition
    streams whose image ids are NEW by construction (a microscope
    never re-drops a file): O(new-data) per micro-batch — no manifest
    prune, no anti-join rewrite — with exactly-once via the
    ``txn_app``/``txn_batch`` idempotent-writes contract instead of
    the merge key."""
    flat = images.select(
        F.col(f"{column}.id").alias("image_id"), F.col(column)
    )
    return append_table(
        spark, flat, table, txn_app=txn_app, txn_batch=txn_batch
    )


def read_ome_table(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    image_ids: Sequence[str] | None = None,
    column: str = "ome_arrow",
) -> DataFrame:
    """Snapshot read of the images table; an ``image_ids`` point-lookup
    list prunes files per id (range stats + Bloom filters, OR-ed
    across ids) before the scan — a k-image lookup on a million-image
    table reads k files, not the table."""
    if not image_ids:
        return read_table(spark, table, version=version).select(column)
    snap = _resolve_snapshot(table, version)
    live: set[str] = set()
    for iid in image_ids:
        live.update(_prune(snap["files"], [("image_id", "=", iid)]))
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    df = _scan(spark, table, snap["files"], sorted(live), schema)
    return df.filter(F.col("image_id").isin(list(image_ids))).select(column)


def restore_table(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    timestamp: float | None = None,
) -> int:
    """Delta ``RESTORE TABLE ... TO VERSION/TIMESTAMP AS OF``: commit a
    NEW version whose live file set (with deletion vectors), schema and
    properties equal the target snapshot's — a metadata-only roll-back
    that rewrites nothing and keeps the full history intact (the
    un-done versions stay time-travelable until vacuum).  Restoring to
    the current version is a no-op commit-free return."""
    if timestamp is not None:
        if version is not None:
            raise TableLogError("pass version OR timestamp, not both")
        version = version_at_timestamp(table, timestamp)
    if version is None:
        raise TableLogError("restore_table needs a version or timestamp")
    cur = _resolve_snapshot(table)
    if version == cur["version"]:
        return version
    target = _resolve_snapshot(table, version)
    # Check deletion-vector sidecars alongside data files: vacuum
    # retains only DVs referenced by the kept snapshots, so restoring
    # past it would otherwise commit a manifest whose _read_dv fails
    # on every read of the DV'd file.
    needed = list(target["files"]) + [
        a["dv"]["path"] for a in target["files"].values() if a.get("dv")
    ]
    missing = [
        p for p in needed if not os.path.exists(os.path.join(table, p))
    ]
    if missing:
        raise TableLogError(
            f"cannot restore {table} to v{version}: {len(missing)} "
            f"file(s) already vacuumed (e.g. {missing[0]})"
        )
    new_version = cur["version"] + 1
    _ABSENT = object()
    cur_ids = {
        p: a.get("dv", {}).get("path") for p, a in cur["files"].items()
    }
    tgt_ids = {
        p: a.get("dv", {}).get("path") for p, a in target["files"].items()
    }
    actions: list[dict[str, Any]] = [
        {"add": target["files"][p]}
        for p, d in tgt_ids.items()
        if cur_ids.get(p, _ABSENT) != d
    ] + [
        {"remove": {"path": p}}
        for p in cur_ids
        if p not in tgt_ids
    ]
    entry: dict[str, Any] = {
        "version": new_version,
        "operation": "restore",
        "actions": actions,
    }
    if target["schema"] != cur["schema"]:
        entry["schema"] = target["schema"]
    if target["properties"] != cur["properties"]:
        # properties merge key-by-key; explicit None would not delete,
        # so restore overwrites changed/added keys to the target values
        entry["properties"] = target["properties"]
    _commit(table, new_version, entry)
    return new_version


def sync_table(
    spark: SparkSession,
    source: DataFrame,
    table: str,
    key: str,
    scope: str | None = None,
    prune_predicates: Iterable[tuple[str, str, Any]] | None = None,
) -> int:
    """Full three-clause MERGE — Delta\'s ``WHEN MATCHED UPDATE SET * /
    WHEN NOT MATCHED INSERT * / WHEN NOT MATCHED BY SOURCE DELETE``
    with every clause unconditional, i.e. SYNC: after the commit the
    table\'s content INSIDE ``scope`` is exactly ``source``; rows
    outside ``scope`` are untouched, and files whose footer stats
    prove them scope-free (via ``prune_predicates``) are carried by
    reference without a read.  With ``scope=None`` the whole table is
    the domain (a transactional overwrite).

    Because all three clauses are unconditional the rewrite is a
    wholesale replacement of the in-scope slice — no per-key
    reconciliation join is needed for the DATA; the ``key`` join runs
    only to report (updated, inserted, deleted) counts in the commit
    entry.  Source rows must satisfy ``scope`` (validated; one row
    outside would silently escape its own deletion domain on the next
    sync).  Cost scales with the scope\'s touched files, not table
    size — the same pruning contract as MERGE/DELETE."""
    snap = _resolve_snapshot(table)
    _check_schema(source, snap, table)
    _enforce_constraints(source, snap, table)
    version = snap["version"] + 1
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    cols = [f.name for f in schema.fields]
    if scope:
        bad = source.filter(f"NOT ({scope})").limit(1).count()
        if bad:
            raise TableLogError(
                f"sync_table: source rows violate scope {scope!r}"
            )
    touched = _prune(snap["files"], prune_predicates)
    existing = (
        _scan(spark, table, snap["files"], touched, schema)
        if touched
        else spark.createDataFrame([], schema)
    )
    in_scope = existing.filter(scope) if scope else existing
    keep = existing.filter(f"NOT ({scope})") if scope else None
    src = source.select(cols)
    # commit-entry stats via the key join (metadata only)
    old_keys = in_scope.select(F.col(key).alias("__k")).distinct()
    new_keys = src.select(F.col(key).alias("__k")).distinct()
    n_upd = new_keys.join(old_keys, "__k").count()
    n_ins = new_keys.join(old_keys, "__k", "left_anti").count()
    n_del = old_keys.join(new_keys, "__k", "left_anti").count()
    new_content = keep.unionByName(src) if keep is not None else src
    adds = _write_data_files(new_content, table, version, _bloom_cols(snap))
    actions = [{"add": a} for a in adds]
    actions += [{"remove": {"path": p}} for p in touched]
    _commit(
        table,
        version,
        {
            "version": version,
            "operation": "sync",
            "stats": {"updated": n_upd, "inserted": n_ins,
                      "deleted": n_del},
            "actions": actions,
        },
    )
    return version


def clone_table(
    spark: SparkSession,
    source: str,
    target: str,
    version: int | None = None,
    timestamp: float | None = None,
    shallow: bool = False,
) -> int:
    """Delta ``CREATE TABLE ... [SHALLOW|DEEP] CLONE src [VERSION AS
    OF v]``: commit the target's version 0 with the source snapshot's
    schema, properties, per-file stats and Blooms.

    DEEP (default) copies the data files into the clone — a fully
    independent table.  SHALLOW references the source's data files by
    ABSOLUTE path: zero data movement, instant, and copy-on-write —
    any later upsert/delete/compact on the clone writes NEW local
    files and merely drops the absolute references from its manifest,
    never touching the source.  Every path-resolving read goes through
    ``os.path.join(table, p)``, which passes absolute paths through
    unchanged, and vacuum only considers ``os.listdir`` names, so a
    clone's vacuum can never reclaim source data.  Deletion-vector
    sidecars are tiny and are copied locally in BOTH modes, so DV'd
    reads resolve inside the clone.

    The Delta caveat carries over: vacuuming the SOURCE reclaims files
    a shallow clone still references (reads then fail file-not-found);
    deep-clone or re-clone before vacuuming a shared source.  Cloning
    a shallow clone deep re-materializes the referenced bytes locally
    (absolute references are copied in under their base names)."""
    import copy as _copy

    if timestamp is not None:
        if version is not None:
            raise TableLogError("pass version OR timestamp, not both")
        version = version_at_timestamp(source, timestamp)
    if current_version(target) is not None:
        raise TableLogError(f"table already exists: {target}")
    snap = _resolve_snapshot(source, version)
    abs_src = os.path.abspath(source)
    abs_tgt = os.path.abspath(target)
    os.makedirs(abs_tgt, exist_ok=True)
    actions: list[dict[str, Any]] = []
    for rel, add in snap["files"].items():
        add = _copy.deepcopy(add)
        dv = add.get("dv")
        if dv:
            os.makedirs(os.path.join(abs_tgt, DV_DIR), exist_ok=True)
            shutil.copy2(
                os.path.join(abs_src, dv["path"]),
                os.path.join(abs_tgt, dv["path"]),
            )
        if shallow:
            add["path"] = os.path.join(abs_src, rel)
        else:
            local = os.path.basename(rel) if os.path.isabs(rel) else rel
            shutil.copy2(
                os.path.join(abs_src, rel), os.path.join(abs_tgt, local)
            )
            add["path"] = local
        actions.append({"add": add})
    props = dict(snap["properties"])
    props.update(
        {
            "clone.source": abs_src,
            "clone.sourceVersion": str(snap["version"]),
            "clone.shallow": "true" if shallow else "false",
        }
    )
    _commit(
        target,
        0,
        {
            "version": 0,
            "operation": "clone",
            "schema": snap["schema"],
            "properties": props,
            "actions": actions,
        },
    )
    return 0


def vacuum_table(
    table: str,
    keep_versions: int = 1,
    dry_run: bool = False,
    retention_seconds: float = 3600.0,
) -> list[str]:
    """Reclaim data files referenced by NO retained snapshot (the last
    ``keep_versions`` versions stay readable; earlier time travel is
    given up).  Orphans from crashed pre-commit writes are removed by
    the same sweep.  ``dry_run=True`` only REPORTS what would go —
    nothing is touched.  Returns the (to-be-)deleted file names.

    ``retention_seconds`` guards the race Delta Lake's
    VACUUM retention check guards: a concurrent writer renames data
    files into the table dir BEFORE its commit lands, so an
    unreferenced file younger than the window may belong to an
    in-flight commit and is kept.  Pass ``0`` only when no concurrent
    writers exist (e.g. tests)."""
    table = os.path.abspath(table)
    versions = _list_versions(table)
    if not versions:
        raise TableLogError(f"not a log table: {table}")
    keep = versions[-max(1, keep_versions):]
    referenced: set[str] = set()
    referenced_dv: set[str] = set()
    for v in keep:
        snap_files = _resolve_snapshot(table, v)["files"]
        referenced.update(snap_files)
        referenced_dv.update(
            a["dv"]["path"] for a in snap_files.values() if a.get("dv")
        )
    # PENDING cross-table-txn entries resolve to no-ops today but may
    # commit later — their files must survive vacuum at ANY version
    # (resolution replays the whole log).  finalize_stale_txns bounds
    # how long this can hold files.
    txn_cache: dict = {}
    for v in versions:
        e = _read_entry(table, v)
        txn = e.get("txn")
        if (
            txn
            and txn.get("role") == "participant"
            and _txn_state(txn, txn_cache) == "pending"
        ):
            referenced.update(
                a["add"]["path"] for a in e["actions"] if "add" in a
            )
    cutoff = time.time() - max(0.0, retention_seconds)
    deleted = []
    for name in os.listdir(table):
        if name == LOG_DIR or name in referenced:
            continue
        full = os.path.join(table, name)
        try:
            if os.path.getmtime(full) > cutoff:
                continue  # possibly an in-flight writer's file — keep
        except OSError:
            continue  # raced a concurrent delete/rename — skip
        if name.startswith(".staging-"):
            if not dry_run:
                shutil.rmtree(full, ignore_errors=True)
            deleted.append(name)
        elif name.endswith(".parquet"):
            if not dry_run:
                try:
                    os.unlink(full)
                except FileNotFoundError:
                    continue
            deleted.append(name)
    # deletion-vector sidecars referenced by no retained snapshot
    # (superseded vectors, vectors of removed files, crash orphans)
    dv_dir = os.path.join(table, DV_DIR)
    if os.path.isdir(dv_dir):
        for name in os.listdir(dv_dir):
            rel = f"{DV_DIR}/{name}"
            full = os.path.join(table, rel)
            if rel in referenced_dv:
                continue
            try:
                if os.path.getmtime(full) > cutoff:
                    continue  # possibly an in-flight delete's sidecar
            except OSError:
                continue
            if not dry_run:
                try:
                    os.unlink(full)
                except FileNotFoundError:
                    continue
            deleted.append(rel)
    return sorted(deleted)


def table_details(table: str) -> dict[str, Any]:
    """One-call observability: current version, live file count/bytes/
    rows, total versions, properties, constraint and bloom config —
    everything an operator dashboards about a table, from the manifest
    alone (no data scan)."""
    snap = _resolve_snapshot(table)
    files = snap["files"]
    props = snap["properties"]
    return {
        "version": snap["version"],
        "num_versions": len(_list_versions(table)),
        "num_files": len(files),
        "total_bytes": sum(a.get("bytes", 0) for a in files.values()),
        # live rows: physical row counts minus deletion-vector
        # cardinalities (a file's "rows" stat stays physical so the
        # full-file-deleted check and history stay meaningful)
        "total_rows": sum(
            a.get("rows", 0) - a.get("dv", {}).get("cardinality", 0)
            for a in files.values()
        ),
        "deleted_rows": sum(
            a.get("dv", {}).get("cardinality", 0) for a in files.values()
        ),
        "dv_files": sum(1 for a in files.values() if a.get("dv")),
        "properties": {
            k: v for k, v in props.items()
            if not k.startswith(CONSTRAINT_PROP_PREFIX) and k != BLOOM_PROP
        },
        "constraints": {
            k[len(CONSTRAINT_PROP_PREFIX):]: v
            for k, v in props.items()
            if k.startswith(CONSTRAINT_PROP_PREFIX)
        },
        "bloom_columns": list(_bloom_cols(snap)),
        "stats_columns": sorted(
            {c for a in files.values() for c in a.get("columns", {})}
        ),
    }
