"""Minimal pure-Python Zarr v2 + OME-NGFF 0.4 store codec.

Real, spec-conformant stores with stdlib only (``json`` + ``zlib``):
any zarr/ome-zarr client opens what this writes, and this reads what
zarr-python writes for the baseline feature set — C-order arrays,
``zlib``/``gzip``/raw chunk compression, ``.``- or ``/``-separated
chunk keys, edge-chunk padding, group + array metadata, NGFF
``multiscales`` axes/datasets attrs (reference export.py:231-374 emits
the same layout via the zarr package; blosc/zstd-compressed or
sharded/v3 stores still gate on the real libraries upstream).
"""

from __future__ import annotations

import gzip
import json
import os
import zlib
from typing import Any

import numpy as np

ZARRAY = ".zarray"
ZGROUP = ".zgroup"
ZATTRS = ".zattrs"

SUPPORTED_COMPRESSORS = (None, "zlib", "gzip")


def _compress(blob: bytes, compressor: dict[str, Any] | None) -> bytes:
    if compressor is None:
        return blob
    cid, level = compressor.get("id"), int(compressor.get("level", 1))
    if cid == "zlib":
        return zlib.compress(blob, level)
    if cid == "gzip":
        return gzip.compress(blob, compresslevel=level)
    raise NotImplementedError(
        f"zarr compressor {cid!r} needs the real zarr/numcodecs packages "
        f"(built-in subset: {SUPPORTED_COMPRESSORS})"
    )


def _decompress(blob: bytes, compressor: dict[str, Any] | None) -> bytes:
    if compressor is None:
        return blob
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.decompress(blob)
    if cid == "gzip":
        return gzip.decompress(blob)
    raise NotImplementedError(
        f"zarr compressor {cid!r} needs the real zarr/numcodecs packages "
        f"(built-in subset: {SUPPORTED_COMPRESSORS})"
    )


def write_zarr_array(
    path: str,
    arr: np.ndarray,
    chunks: tuple[int, ...] | None = None,
    compressor: str | None = "zlib",
    compression_level: int = 1,
    dimension_separator: str = ".",
    fill_value: int = 0,
) -> None:
    """Write one Zarr v2 array directory (``.zarray`` + chunk files).
    Edge chunks are padded to full chunk shape with ``fill_value`` per
    the spec."""
    if compressor not in SUPPORTED_COMPRESSORS:
        raise NotImplementedError(
            f"compressor {compressor!r} not in built-in subset {SUPPORTED_COMPRESSORS}"
        )
    arr = np.ascontiguousarray(arr)
    if chunks is None:
        # one chunk per trailing-2D plane: matches how planes are read
        chunks = (1,) * (arr.ndim - 2) + arr.shape[-2:]
    chunks = tuple(int(min(c, s)) for c, s in zip(chunks, arr.shape))
    comp = (
        None
        if compressor is None
        else {"id": compressor, "level": int(compression_level)}
    )
    meta = {
        "zarr_format": 2,
        "shape": [int(s) for s in arr.shape],
        "chunks": [int(c) for c in chunks],
        "dtype": arr.dtype.str,
        "compressor": comp,
        "fill_value": fill_value,
        "order": "C",
        "filters": None,
        "dimension_separator": dimension_separator,
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ZARRAY), "w") as f:
        json.dump(meta, f, indent=1)
    grid = [range(0, s, c) for s, c in zip(arr.shape, chunks)]
    idx: list[int] = [0] * arr.ndim

    def _write_chunks(dim: int, starts: list[int]) -> None:
        if dim == arr.ndim:
            sl = tuple(
                slice(st, min(st + c, s))
                for st, c, s in zip(starts, chunks, arr.shape)
            )
            block = arr[sl]
            if block.shape != chunks:  # pad edge chunk to full size
                full = np.full(chunks, fill_value, dtype=arr.dtype)
                full[tuple(slice(0, e) for e in block.shape)] = block
                block = full
            key = dimension_separator.join(str(i) for i in idx)
            blob = _compress(np.ascontiguousarray(block).tobytes(), comp)
            subdir = os.path.join(path, *key.split("/")[:-1]) if "/" in key else path
            os.makedirs(subdir, exist_ok=True)
            with open(os.path.join(path, *key.split("/")), "wb") as f:
                f.write(blob)
            return
        for i, st in enumerate(grid[dim]):
            idx[dim] = i
            _write_chunks(dim + 1, starts + [st])

    _write_chunks(0, [])


def read_zarr_array(path: str) -> np.ndarray:
    """Read a Zarr v2 array directory written by this module or by
    zarr-python (baseline subset: C-order, no filters, raw/zlib/gzip)."""
    with open(os.path.join(path, ZARRAY)) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 2:
        raise NotImplementedError("only zarr v2 arrays decode built-in")
    if meta.get("order", "C") != "C" or meta.get("filters"):
        raise NotImplementedError("F-order/filtered zarr arrays need the zarr package")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    comp = meta.get("compressor")
    sep = meta.get("dimension_separator", ".")
    fill = meta.get("fill_value", 0) or 0
    out = np.full(shape, fill, dtype=dtype)
    grid = [range(0, s, c) for s, c in zip(shape, chunks)]
    idx: list[int] = [0] * len(shape)

    def _read(dim: int, starts: list[int]) -> None:
        if dim == len(shape):
            key = sep.join(str(i) for i in idx)
            p = os.path.join(path, *key.split("/")) if sep == "/" else os.path.join(path, key)
            if not os.path.exists(p):
                return  # missing chunk = fill_value per spec
            raw = _decompress(open(p, "rb").read(), comp)
            block = np.frombuffer(raw, dtype=dtype).reshape(chunks)
            sl = tuple(
                slice(st, min(st + c, s)) for st, c, s in zip(starts, chunks, shape)
            )
            out[sl] = block[tuple(slice(0, x.stop - x.start) for x in sl)]
            return
        for i, st in enumerate(grid[dim]):
            idx[dim] = i
            _read(dim + 1, starts + [st])

    _read(0, [])
    return out


NGFF_AXES = [
    {"name": "t", "type": "time"},
    {"name": "c", "type": "channel"},
    {"name": "z", "type": "space"},
    {"name": "y", "type": "space"},
    {"name": "x", "type": "space"},
]


def write_ngff_store(
    path: str,
    levels: list[np.ndarray],
    *,
    image_id: str,
    name: str | None = None,
    channel_names: list[str] | None = None,
    downscale: int = 2,
    compressor: str | None = "zlib",
    compression_level: int = 1,
    chunks: tuple[int, ...] | None = None,
) -> None:
    """OME-NGFF 0.4 multiscale group: ``.zgroup`` + ``multiscales``
    attrs + one v2 array per pyramid level (datasets "0", "1", …).
    ``omero.channels`` carries channel labels like the reference's
    export (export.py:231-374)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ZGROUP), "w") as f:
        json.dump({"zarr_format": 2}, f)
    datasets = []
    for i, lv in enumerate(levels):
        s = float(downscale**i)
        datasets.append(
            {
                "path": str(i),
                "coordinateTransformations": [
                    {"type": "scale", "scale": [1.0, 1.0, 1.0, s, s]}
                ],
            }
        )
        write_zarr_array(
            os.path.join(path, str(i)),
            lv,
            chunks=chunks,
            compressor=compressor,
            compression_level=compression_level,
        )
    attrs: dict[str, Any] = {
        "multiscales": [
            {
                "version": "0.4",
                "name": name or image_id,
                "axes": NGFF_AXES,
                "datasets": datasets,
            }
        ],
        "ome_arrow": {"id": image_id, "name": name or image_id},
    }
    if channel_names:
        attrs["omero"] = {
            "channels": [{"label": cn} for cn in channel_names]
        }
    with open(os.path.join(path, ZATTRS), "w") as f:
        json.dump(attrs, f, indent=1)


def read_ngff_attrs(path: str) -> dict[str, Any]:
    p = os.path.join(path, ZATTRS)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def is_zarr_v2_store(path: str) -> bool:
    return os.path.exists(os.path.join(path, ZGROUP)) or os.path.exists(
        os.path.join(path, ZARRAY)
    )
