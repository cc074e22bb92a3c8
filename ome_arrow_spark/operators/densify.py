"""Densify (reference K1 ``to_numpy`` export.py:14-113): planes →
dense (T, C, Z, Y, X) ndarray, zero-initialized, scattered by (t,c,z),
with the reference's strictness/clamp options.

Two tiers:
* ``record_to_numpy`` — one record on the driver (parity with the
  reference's eager API; used by export sinks and viewers).
* ``densify_to_files`` — distributed: each image row becomes one tensor
  inside an ``applyInPandas``/foreachPartition task writing .npy files;
  executors hold one image at a time, never the table.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def record_to_numpy(
    record: dict[str, Any],
    dtype=np.uint16,
    strict: bool = True,
    clamp: bool = False,
) -> np.ndarray:
    """Reference semantics (export.py:64-111): zeros-init, bounds-check
    plane keys, strict length check (or pad/truncate), optional clamp
    to dtype range, last-write-wins scatter."""
    pm = record["pixels_meta"]
    t, c, z = pm["size_t"], pm["size_c"], pm["size_z"]
    y, x = pm["size_y"], pm["size_x"]
    out = np.zeros((t, c, z, y, x), dtype=dtype)
    expected = x * y
    info = np.iinfo(dtype) if np.issubdtype(dtype, np.integer) else None
    for p in record["planes"] or []:
        ti, ci, zi = p["t"], p["c"], p["z"]
        if not (0 <= ti < t and 0 <= ci < c and 0 <= zi < z):
            raise IndexError(f"plane key ({ti},{ci},{zi}) out of bounds")
        px = np.asarray(p["pixels"])
        if px.size != expected:
            if strict:
                raise ValueError(f"plane has {px.size} pixels; expected {expected}")
            px = np.pad(px, (0, max(0, expected - px.size)))[:expected]
        if clamp and info is not None:
            px = np.clip(px, info.min, info.max)
        out[ti, ci, zi] = px.astype(dtype, copy=False).reshape(y, x)
    return out


def densify_to_files(
    images: DataFrame,
    out_dir: str,
    column: str = "ome_arrow",
    dtype_name: str = "uint16",
    strict: bool = True,
) -> list[str]:
    """Write one ``{image_id}.npy`` dense tensor per image, in
    parallel on the executors (one task per partition; images are
    independent). Returns the written paths.

    .. warning::
        ``out_dir`` is opened with plain ``os`` paths *on the executors*,
        so on a multi-node cluster it must be a shared filesystem (NFS,
        Lustre, a FUSE-mounted object store) visible at the same path on
        every executor AND the driver — otherwise the .npy files land on
        executor-local disks and the returned paths are not
        driver-accessible. Works unconditionally in local mode. For
        object stores, swap ``np.save`` for an fsspec/boto client write
        inside ``_write``; the Spark-side plan is unchanged.
    """
    os.makedirs(out_dir, exist_ok=True)
    dtype = np.dtype(dtype_name)

    def _write(rows):
        for row in rows:
            rec = row[column].asDict(recursive=True)
            arr = record_to_numpy(rec, dtype=dtype, strict=strict)
            path = os.path.join(out_dir, f"{rec['id']}.npy")
            np.save(path, arr)
            yield (rec["id"], path)

    pair = images.select(column).rdd.mapPartitions(_write).collect()
    return [p for _, p in pair]
