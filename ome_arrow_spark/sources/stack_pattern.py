"""Bio-Formats-style filename-pattern stack ingest (reference S6
``from_stack_pattern_path``, ingest.py:403-692).

Grammar (matched behavior, fresh implementation):

* ``<...>`` tokens expand to choices: numeric range ``a-b[:step]`` with
  zero-padding to the wider bound (ingest.py:436-451), or a comma list
  (numeric or literal names).
* The token's dimension comes from the immediately preceding letters:
  c/ch/w/wavelength→C, t/tl/tp/timepoint→T, z/zs/sec/fp/focal→Z,
  s/sp/series→S (ingest.py:418-434); S remaps via ``map_series_to``
  (default T); unrecognized → ``default_dim_for_unspecified``.
* A file's (t,c,z) indices are the POSITIONS of its token values in
  each choices list, not the numeric values (ingest.py:498-511).
* A non-numeric C token's choices become channel names
  (ingest.py:519-524).
* No ``<>`` at all → the string is a regex; matching files sort by
  name and enumerate as Z (ingest.py:527-529).
* Sizes are max(index)+1 over matched files; missing combos zero-fill
  (ingest.py:534-536, 584-589).
* A file holding a Z-stack (T=C=1, Z>1) spills planes from its base z
  (ingest.py:629-645); multi-T/C pages in one file are rejected
  (ingest.py:646-655).

Distributed shape: pattern expansion is a driver-side compile against
one directory listing (O(#choices) + O(#files), no file I/O); the
pixel work — decode, shape checks, zero-fill, assembly — runs on
executors: binaryFile scan of exactly the matched files, a
(path→t,c,z) manifest joined in, mapInPandas decode to plane rows,
dims-frame LEFT JOIN zero-fill, and a sorted collect into one record
row. Note one deliberate divergence: when an in-file Z-stack bumps
size_z, we zero-fill the FULL (t,c,z) cross product of the final
sizes; the reference only fills combos visited before the bump
(a loop-ordering artifact).
"""

from __future__ import annotations

import itertools
import os
import re
from typing import Any, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ome_arrow_spark.meta import OME_ARROW_TYPE, OME_ARROW_VERSION, ome_arrow_struct

DIM_TOKENS = {
    "C": {"c", "ch", "w", "wavelength"},
    "T": {"t", "tl", "tp", "timepoint"},
    "Z": {"z", "zs", "sec", "fp", "focal", "focalplane"},
    "S": {"s", "sp", "series"},
}
_NUM_RANGE = re.compile(r"^(?P<a>\d+)\-(?P<b>\d+)(?::(?P<step>\d+))?$")


def _detect_dim(before: str) -> str | None:
    m = re.search(r"([A-Za-z]+)$", before)
    if not m:
        return None
    tok = m.group(1).lower()
    for dim, names in DIM_TOKENS.items():
        if tok in names:
            return dim
    return None


def _expand_token(raw: str) -> tuple[list[str], bool]:
    raw = raw.strip()
    if "," in raw and not _NUM_RANGE.match(raw):
        parts = [p.strip() for p in raw.split(",")]
        return parts, all(p.isdigit() for p in parts)
    m = _NUM_RANGE.match(raw)
    if m:
        a, b = m.group("a"), m.group("b")
        step = int(m.group("step") or "1")
        if int(b) < int(a):
            raise ValueError(f"Inverted range not supported: <{raw}>")
        width = max(len(a), len(b))
        return [str(v).zfill(width) for v in range(int(a), int(b) + 1, step)], True
    return [raw], raw.isdigit()


def parse_pattern(pattern: str) -> tuple[str, list[dict[str, Any]]]:
    """Pattern string → (format template, placeholder descriptors)."""
    out: list[str] = []
    placeholders: list[dict[str, Any]] = []
    i = 0
    while i < len(pattern):
        if pattern[i] == "<":
            j = pattern.find(">", i + 1)
            if j == -1:
                raise ValueError("Unclosed '<' in pattern.")
            raw = pattern[i + 1 : j]
            choices, is_num = _expand_token(raw)
            placeholders.append(
                {
                    "dim": _detect_dim("".join(out)) or "?",
                    "choices": choices,
                    "is_numeric": is_num,
                }
            )
            out.append(f"{{{len(placeholders) - 1}}}")
            i = j + 1
        else:
            out.append(pattern[i])
            i += 1
    return "".join(out), placeholders


def expand_matches(
    folder: str,
    pattern: str,
    default_dim_for_unspecified: str = "C",
    map_series_to: str | None = "T",
) -> tuple[dict[tuple[int, int, int], str], list[str] | None]:
    """Driver-side compile: (t,c,z) → existing file path, plus literal
    channel names if a non-numeric C token provided them."""
    listing = set(os.listdir(folder)) if os.path.isdir(folder) else set()
    matched: dict[tuple[int, int, int], str] = {}
    literal_channels: list[str] | None = None

    if "<" in pattern and ">" in pattern:
        template, placeholders = parse_pattern(pattern)
        for ph in placeholders:
            if ph["dim"] == "?":
                ph["dim"] = default_dim_for_unspecified.upper()
        for combo in itertools.product(*[ph["choices"] for ph in placeholders]):
            fname = template.format(*combo)
            if fname not in listing:
                continue
            t = c = z = 0
            for ph, val in zip(placeholders, combo):
                idx = ph["choices"].index(val)
                dim = ph["dim"]
                if dim == "S":
                    if not map_series_to:
                        raise ValueError("Encountered 'series' but map_series_to=None")
                    dim = map_series_to.upper()
                if dim == "T":
                    t = idx
                elif dim == "C":
                    c = idx
                elif dim == "Z":
                    z = idx
            if literal_channels is None:
                for ph in placeholders:
                    dim_eff = ph["dim"] if ph["dim"] != "S" else (map_series_to or "S")
                    if dim_eff == "C" and not ph["is_numeric"]:
                        literal_channels = list(ph["choices"])
                        break
            matched[(t, c, z)] = os.path.join(folder, fname)
    else:
        rx = re.compile(pattern)
        for z, fname in enumerate(sorted(f for f in listing if rx.fullmatch(f))):
            matched[(0, 0, z)] = os.path.join(folder, fname)

    if not matched:
        raise FileNotFoundError(f"No files matched pattern: {pattern!r} in {folder}")
    return matched, literal_channels


def from_stack_pattern(
    spark: SparkSession,
    pattern_path: str,
    default_dim_for_unspecified: str = "C",
    map_series_to: str | None = "T",
    clamp_to_uint16: bool = True,
    channel_names: list[str] | None = None,
    image_id: str | None = None,
    name: str | None = None,
    column: str = "ome_arrow",
) -> DataFrame:
    """Assemble ONE image from a filename-pattern stack, distributed:
    every matched file decodes in parallel on the executors."""
    folder, line = os.path.split(pattern_path)
    matched, literal_channels = expand_matches(
        folder or ".", line, default_dim_for_unspecified, map_series_to
    )
    size_t = max(k[0] for k in matched) + 1
    size_c = max(k[1] for k in matched) + 1
    size_z0 = max(k[2] for k in matched) + 1

    if channel_names and len(channel_names) != size_c:
        raise ValueError(
            f"channel_names length {len(channel_names)} != size_c {size_c}"
        )

    manifest = spark.createDataFrame(
        [Row(path=os.path.abspath(p), t=k[0], c=k[1], z=k[2]) for k, p in matched.items()]
    )
    bin_df = (
        spark.read.format("binaryFile")
        .load(sorted(os.path.abspath(p) for p in matched.values()))
        .select(F.regexp_replace("path", "^file:", "").alias("path"), "content")
    )
    files = bin_df.join(manifest, "path")

    clamp = bool(clamp_to_uint16)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ome_arrow_spark.sources.tiff import decode_volume_bytes

        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for path, blob, t, c, z in zip(
                pdf["path"], pdf["content"], pdf["t"], pdf["c"], pdf["z"]
            ):
                vol, _, _, _ = decode_volume_bytes(path, bytes(blob))
                tn, cn, zn, yy, xx = vol.shape
                if tn > 1 or cn > 1:
                    raise ValueError(
                        f"{os.path.basename(path)} contains multiple pages across "
                        f"T/C={tn},{cn}; only Z>1 with T=C=1 is supported inside "
                        "one file. Express T/C via the filename pattern."
                    )
                v = np.clip(vol, 0, 65535).astype(np.int32) if clamp else vol.astype(np.int32)
                for zl in range(zn):
                    rows.append(
                        {
                            "t": int(t),
                            "c": int(c),
                            "z": int(z) + zl,
                            "size_y": yy,
                            "size_x": xx,
                            "pixels": v[0, 0, zl].ravel().tolist(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["t", "c", "z", "size_y", "size_x", "pixels"]
            )

    plane_schema = (
        "t int, c int, z int, size_y int, size_x int, pixels array<int>"
    )
    planes = files.mapInPandas(decode, schema=plane_schema).cache()

    # shape probe + consistency + final z size — one aggregate pass
    probe = planes.agg(
        F.countDistinct("size_y", "size_x").alias("n_shapes"),
        F.first("size_y").alias("size_y"),
        F.first("size_x").alias("size_x"),
        (F.max("z") + 1).alias("size_z_data"),
    ).first()
    if probe["n_shapes"] != 1:
        planes.unpersist()
        raise ValueError("Shape mismatch across stack files")
    size_y, size_x = probe["size_y"], probe["size_x"]
    size_z = max(size_z0, probe["size_z_data"])

    if not channel_names:
        channel_names = literal_channels or [f"C{i}" for i in range(size_c)]

    # dense dims frame LEFT JOIN → zero-fill (ingest.py:584-589)
    dims = (
        spark.range(size_t)
        .withColumnRenamed("id", "t")
        .crossJoin(spark.range(size_c).withColumnRenamed("id", "c"))
        .crossJoin(spark.range(size_z).withColumnRenamed("id", "z"))
        .select(
            F.col("t").cast("int"), F.col("c").cast("int"), F.col("z").cast("int")
        )
    )
    dense = dims.join(planes.select("t", "c", "z", "pixels"), ["t", "c", "z"], "left").select(
        "t",
        "c",
        "z",
        F.coalesce(F.col("pixels"), F.array_repeat(F.lit(0), size_x * size_y)).alias(
            "pixels"
        ),
    )

    # single-record assembly: sorted struct collect (t-major like
    # ingest.py:581-583), then canonical field order — built with lit()
    # columns so arbitrary ids/names (regex chars, quotes) are safe
    from datetime import datetime

    stem = os.path.splitext(os.path.basename(pattern_path))[0]
    img_id = image_id or stem
    display_name = name or pattern_path
    dim_order = "XYZCT" if size_z > 1 else "XYCT"

    fl = lambda v: F.lit(float(v)).cast("float")  # noqa: E731
    channels_col = F.array(
        *[
            F.struct(
                F.lit(f"ch-{i}").alias("id"),
                F.lit(str(n)).alias("name"),
                fl(0.0).alias("emission_um"),
                fl(0.0).alias("excitation_um"),
                F.lit("Unknown").alias("illumination"),
                F.lit(4294967295).alias("color_rgba"),
            )
            for i, n in enumerate(channel_names)
        ]
    )
    pm_col = F.struct(
        F.lit(dim_order).alias("dimension_order"),
        F.lit("uint16").alias("type"),
        F.lit(size_x).cast("int").alias("size_x"),
        F.lit(size_y).cast("int").alias("size_y"),
        F.lit(size_z).cast("int").alias("size_z"),
        F.lit(size_c).cast("smallint").alias("size_c"),
        F.lit(size_t).cast("int").alias("size_t"),
        fl(1.0).alias("physical_size_x"),
        fl(1.0).alias("physical_size_y"),
        fl(1.0).alias("physical_size_z"),
        F.lit("µm").alias("physical_size_x_unit"),
        F.lit("µm").alias("physical_size_y_unit"),
        F.lit("µm").alias("physical_size_z_unit"),
        channels_col.alias("channels"),
    )
    planes_col = F.transform(
        F.col("planes_tcz"),
        lambda p: F.struct(
            p["z"].alias("z"),
            p["t"].alias("t"),
            p["c"].cast("smallint").alias("c"),
            p["pixels"].alias("pixels"),
        ),
    )
    ome_col = F.struct(
        F.lit(OME_ARROW_TYPE).alias("type"),
        F.lit(OME_ARROW_VERSION).alias("version"),
        F.lit(img_id).alias("id"),
        F.lit(display_name).alias("name"),
        F.lit(datetime(2025, 1, 1)).alias("acquisition_datetime"),
        pm_col.alias("pixels_meta"),
        planes_col.alias("planes"),
        F.lit(None).cast("string").alias("masks"),
    )
    return dense.agg(
        F.sort_array(F.collect_list(F.struct("t", "c", "z", "pixels"))).alias(
            "planes_tcz"
        )
    ).select(ome_col.alias(column))
