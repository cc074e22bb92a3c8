"""``slice`` (reference T1, transform.py:14-182) — crop + dimension
filter + reindex — as a single pure-SQL nested projection.

The reference deserializes EVERY pixel of every plane into Python
objects per slice call (transform.py:49); here the whole operation is
one Catalyst expression over the struct column: the crop runs as
higher-order array functions inside whole-stage codegen, untouched
planes are pruned, and nothing leaves the JVM. Semantics matched:

* half-open crop bounds, validated (transform.py:57-61);
* keep-lists defaulted to all, deduped, sorted, out-of-range dropped
  (transform.py:64-75);
* old→new dense reindex per dimension (transform.py:77-80);
* last-write-wins on duplicate (t,c,z) planes (transform.py:94-99);
* zero-fill of missing kept planes when ``fill_missing`` else drop
  (transform.py:119-130);
* channels filtered + reindexed, id rewritten to ``ch-{new}``, minimal
  entries synthesized when the channel list length mismatches size_c
  (transform.py:143-159);
* sizes rewritten, dimension_order untouched (transform.py:161-175).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keep_expr(provided: list[int] | None, size_ref: str) -> str:
    """SQL array of kept (old) indices: sorted, deduped, in-range."""
    if provided is None:
        return f"sequence(0, int({size_ref}) - 1)"
    vals = sorted(set(int(i) for i in provided))
    arr = "array(" + ", ".join(str(v) for v in vals) + ")" if vals else "array()"
    return f"filter(cast({arr} as array<int>), __i -> __i >= 0 AND __i < int({size_ref}))"


def slice_images(
    images: DataFrame,
    x_min: int,
    x_max: int,
    y_min: int,
    y_max: int,
    t_indices: list[int] | None = None,
    c_indices: list[int] | None = None,
    z_indices: list[int] | None = None,
    fill_missing: bool = True,
    column: str = "ome_arrow",
    validate: bool = True,
) -> DataFrame:
    """Slice every image in the table; returns a table of the same
    shape with the struct column rewritten."""
    if not (0 <= x_min < x_max and 0 <= y_min < y_max):
        raise ValueError(f"Invalid crop window x=[{x_min},{x_max}) y=[{y_min},{y_max})")

    if validate:
        # One metadata-only scan (nested pruning: reads just size_x/size_y)
        # replaces the reference's per-record raise (transform.py:57-61).
        bad = images.filter(
            (F.col(f"{column}.pixels_meta.size_x") < x_max)
            | (F.col(f"{column}.pixels_meta.size_y") < y_max)
        ).count()
        if bad:
            raise ValueError(
                f"{bad} image(s) smaller than crop window x_max={x_max}, y_max={y_max}"
            )

    c_ = column
    pm = f"{c_}.pixels_meta"
    new_w, new_h = x_max - x_min, y_max - y_min

    kt = _keep_expr(t_indices, f"{pm}.size_t")
    kc = _keep_expr(c_indices, f"{pm}.size_c")
    kz = _keep_expr(z_indices, f"{pm}.size_z")

    # crop of a bound plane element `e.m`: rows y_min..y_max-1, 1-based slice
    crop = (
        f"flatten(transform(sequence({y_min}, {y_max - 1}), "
        f"__y -> slice(__e.m.pixels, __y * int({pm}.size_x) + {x_min} + 1, {new_w})))"
    )
    fill = f"array_repeat(0, {new_w * new_h})" if fill_missing else "cast(null as array<int>)"

    # t-major cross product of kept combos (transform.py:114-118 order),
    # inner transform binds the matched plane once (last-write-wins pick).
    combos = (
        f"flatten(transform({kt}, __t -> "
        f"flatten(transform({kc}, __c -> "
        f"transform({kz}, __z -> named_struct('t', __t, 'c', __c, 'z', __z))))))"
    )
    bound = (
        f"transform({combos}, __k -> named_struct("
        f"'k', __k, "
        f"'m', element_at(filter({c_}.planes, "
        f"__p -> int(__p.t) = __k.t AND int(__p.c) = __k.c AND int(__p.z) = __k.z), -1)))"
    )
    new_planes = (
        f"filter(transform({bound}, __e -> named_struct("
        f"'z', cast(array_position({kz}, __e.k.z) - 1 as int), "
        f"'t', cast(array_position({kt}, __e.k.t) - 1 as int), "
        f"'c', cast(array_position({kc}, __e.k.c) - 1 as smallint), "
        f"'pixels', if(__e.m IS NOT NULL, {crop}, {fill}))), "
        f"__q -> __q.pixels IS NOT NULL)"
    )

    # channels: synthesize minimal entries on length mismatch
    # (transform.py:146-150: only id/name/color_rgba set, rest NULL),
    # then reindex kept ones with id rewritten to ch-{new}.
    ch_src = (
        f"if(size({pm}.channels) = int({pm}.size_c), {pm}.channels, "
        f"transform(sequence(0, int({pm}.size_c) - 1), __i -> named_struct("
        f"'id', concat('ch-', __i), 'name', concat('C', __i), "
        f"'emission_um', cast(null as float), 'excitation_um', cast(null as float), "
        f"'illumination', cast(null as string), 'color_rgba', cast(4294967295 as bigint))))"
    )
    new_channels = (
        f"transform({kc}, __oc -> named_struct("
        f"'id', concat('ch-', cast(array_position({kc}, __oc) - 1 as int)), "
        f"'name', coalesce(element_at({ch_src}, __oc + 1).name, "
        f"concat('C', cast(array_position({kc}, __oc) - 1 as int))), "
        f"'emission_um', element_at({ch_src}, __oc + 1).emission_um, "
        f"'excitation_um', element_at({ch_src}, __oc + 1).excitation_um, "
        f"'illumination', element_at({ch_src}, __oc + 1).illumination, "
        f"'color_rgba', element_at({ch_src}, __oc + 1).color_rgba))"
    )

    new_pm = (
        f"named_struct("
        f"'dimension_order', {pm}.dimension_order, "
        f"'type', {pm}.type, "
        f"'size_x', {new_w}, "
        f"'size_y', {new_h}, "
        f"'size_z', size({kz}), "
        f"'size_c', cast(size({kc}) as smallint), "
        f"'size_t', size({kt}), "
        f"'physical_size_x', {pm}.physical_size_x, "
        f"'physical_size_y', {pm}.physical_size_y, "
        f"'physical_size_z', {pm}.physical_size_z, "
        f"'physical_size_x_unit', {pm}.physical_size_x_unit, "
        f"'physical_size_y_unit', {pm}.physical_size_y_unit, "
        f"'physical_size_z_unit', {pm}.physical_size_z_unit, "
        f"'channels', {new_channels})"
    )

    new_struct = (
        f"named_struct("
        f"'type', {c_}.type, "
        f"'version', {c_}.version, "
        f"'id', {c_}.id, "
        f"'name', {c_}.name, "
        f"'acquisition_datetime', {c_}.acquisition_datetime, "
        f"'pixels_meta', {new_pm}, "
        f"'planes', {new_planes}, "
        f"'masks', {c_}.masks)"
    )

    other = [c for c in images.columns if c != column]
    return images.select(*other, F.expr(new_struct).alias(column))
