"""OME-Zarr source/sink (reference S4 ``from_ome_zarr``
ingest.py:695-811 and K4 ``to_ome_zarr`` export.py:231-374).

A zarr store is a DIRECTORY (attrs JSON + chunk files), so ingest is
manifest-based, not ``binaryFile``: a DataFrame of store paths fans out
to executors which each open one store locally (shared filesystem /
object store mount — the standard cluster layout for NGFF).

Codec gating: the real NGFF decode needs the ``zarr`` package (absent
here) and raises ``NotImplementedError``; the FZARR test store (a
directory with ``header.json`` + one little-endian uint16 ``.bin`` per
plane) keeps every Spark-side piece — manifest fan-out, per-store
decode, schema, assembly — real and tested.

The sink writes FZARR stores with an NGFF-style multiscale pyramid:
level k halves Y and X by mean-pooling (see operators/multiscale.py for
the query-side LOD operator; export.py:316-337 computes the same
shapes)."""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Any, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ome_arrow_spark.meta import ome_arrow_struct
from ome_arrow_spark.sources.numpy_ingest import from_numpy

try:  # pragma: no cover
    import zarr  # type: ignore

    HAVE_ZARR = True
except ImportError:
    zarr = None
    HAVE_ZARR = False

FZARR_HEADER = "header.json"


def write_fzarr_store(
    path: str,
    vol: np.ndarray,
    *,
    image_id: str,
    name: str | None = None,
    channel_names: list[str] | None = None,
    multiscale_levels: int = 1,
    downscale_spatial_by: int = 2,
) -> None:
    """Write one FZARR store: level-0 planes plus mean-pooled pyramid
    levels (shape halving mirrors export.py:316-337)."""
    vol = np.asarray(vol)
    if vol.ndim != 5:
        raise ValueError("write_fzarr_store expects (T,C,Z,Y,X)")
    os.makedirs(path, exist_ok=True)
    t, c, z, y, x = vol.shape
    levels = []
    cur = np.clip(vol, 0, 65535).astype(np.int64)
    for lvl in range(multiscale_levels):
        ly, lx = cur.shape[-2], cur.shape[-1]
        levels.append([int(s) for s in cur.shape])
        lv_dir = os.path.join(path, str(lvl))
        os.makedirs(lv_dir, exist_ok=True)
        for ti in range(t):
            for ci in range(c):
                for zi in range(z):
                    blob = cur[ti, ci, zi].astype("<u2").tobytes()
                    with open(os.path.join(lv_dir, f"{ti}.{ci}.{zi}.bin"), "wb") as f:
                        f.write(blob)
        if lvl + 1 < multiscale_levels:
            f_ = downscale_spatial_by
            ny, nx = ly // f_, lx // f_
            cur = (
                cur[..., : ny * f_, : nx * f_]
                .reshape(*cur.shape[:-2], ny, f_, nx, f_)
                .sum(axis=(-3, -1))
                // (f_ * f_)
            )
    header = {
        "id": image_id,
        "name": name or image_id,
        "channel_names": channel_names,
        "levels": levels,
        "downscale": downscale_spatial_by,
    }
    with open(os.path.join(path, FZARR_HEADER), "w") as f:
        json.dump(header, f)


def decode_store(store_path: str, level: int = 0) -> dict[str, Any]:
    """One store directory → OME-Arrow record dict."""
    hdr_path = os.path.join(store_path, FZARR_HEADER)
    if os.path.exists(hdr_path):
        with open(hdr_path) as f:
            header = json.load(f)
        shape = header["levels"][level]
        t, c, z, y, x = shape
        vol = np.zeros((t, c, z, y, x), dtype=np.int32)
        lv_dir = os.path.join(store_path, str(level))
        for ti in range(t):
            for ci in range(c):
                for zi in range(z):
                    p = os.path.join(lv_dir, f"{ti}.{ci}.{zi}.bin")
                    vol[ti, ci, zi] = (
                        np.frombuffer(open(p, "rb").read(), dtype="<u2")
                        .reshape(y, x)
                        .astype(np.int32)
                    )
        return from_numpy(
            vol,
            dim_order="TCZYX",
            image_id=header["id"],
            name=header.get("name"),
            channel_names=header.get("channel_names"),
            acquisition_datetime=datetime(2025, 1, 1),
        )
    if HAVE_ZARR:  # pragma: no cover - real NGFF path
        grp = zarr.open_group(store_path, mode="r")
        arr = np.asarray(grp[str(level)])
        while arr.ndim < 5:
            arr = arr[np.newaxis, ...]
        return from_numpy(arr, dim_order="TCZYX", image_id=os.path.basename(store_path))
    raise NotImplementedError(
        f"Cannot decode {store_path!r}: the zarr package is not installed and "
        "this is not an FZARR test store. Install zarr for real NGFF stores — "
        "the manifest fan-out is identical."
    )


def from_zarr_manifest(
    spark: SparkSession,
    store_paths: list[str],
    level: int = 0,
    column: str = "ome_arrow",
) -> DataFrame:
    """Manifest-parallel ingest: one store per task row. Contrast S3's
    binaryFile path — directories can't stream as single blobs, so the
    manifest IS the scan."""
    from pyspark.sql.types import StructField, StructType

    manifest = spark.createDataFrame(
        [(os.path.abspath(p),) for p in store_paths], "store_path string"
    ).repartition(min(len(store_paths), 64))
    schema = StructType([StructField(column, ome_arrow_struct())])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for sp in pdf["store_path"]:
                rec = decode_store(sp, level)
                rec["planes"] = [
                    {**p, "pixels": np.asarray(p["pixels"]).tolist()}
                    for p in rec["planes"]
                ]
                recs.append(rec)
            yield pd.DataFrame({column: recs})

    return manifest.mapInPandas(decode, schema=schema)


def to_zarr_dir(
    images: DataFrame,
    out_dir: str,
    column: str = "ome_arrow",
    multiscale_levels: int = 1,
    downscale_spatial_by: int = 2,
    use_real_zarr: bool | None = None,
) -> list[str]:
    """One store per image, written from executors."""
    from ome_arrow_spark.operators.densify import record_to_numpy

    if use_real_zarr is None:
        use_real_zarr = HAVE_ZARR
    if use_real_zarr and not HAVE_ZARR:
        raise NotImplementedError("zarr not installed; cannot write real NGFF stores")
    os.makedirs(out_dir, exist_ok=True)

    def _write(rows):
        for row in rows:
            rec = row[column].asDict(recursive=True)
            vol = record_to_numpy(rec)
            store = os.path.join(out_dir, f"{rec['id']}.zarr")
            names = [c["name"] for c in rec["pixels_meta"]["channels"]]
            write_fzarr_store(
                store,
                vol,
                image_id=rec["id"],
                name=rec["name"],
                channel_names=names,
                multiscale_levels=multiscale_levels,
                downscale_spatial_by=downscale_spatial_by,
            )
            yield store

    return images.select(column).rdd.mapPartitions(_write).collect()
