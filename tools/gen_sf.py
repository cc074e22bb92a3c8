"""Deterministic scale-up generator for local sf1+ validation fixtures.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md). Scale validation
(VERDICT r7 "Next round" #1) needs a sf1.0 regime; with no network the
DuckDB tpch extension can't dgen, so we scale the driver's own sf0.1
tables by key-shifted replication:

- copy 0 is the driver's data verbatim; copies 1..k-1 shift every
  surrogate key by ``copy * (max_key + 1)`` so referential integrity
  (orders→customer, lineitem→orders/part/supplier, events→user) is
  preserved exactly and join fan-outs match the original distribution.
- timestamps shift by ``copy`` days and text/doc ids get a per-copy
  tag, so the scaled corpus is not a degenerate pile of exact
  duplicates (dedup queries still see realistic near-dup structure:
  each doc has k-1 near-twins — the dup-heavy regime a crawl corpus
  actually has).
- region/nation are dimension tables at fixed TPC-H cardinality (5/25)
  and are copied verbatim.

Correctness at sf1 is still Spark-vs-DuckDB on the SAME files, so the
gate semantics are unchanged; only the data volume grows.

Usage: python tools/gen_sf.py [k] [src_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /root/repo/.local_testdata/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: per-table (key column -> stride source) key-shift spec; stride is
#: max(key)+1 computed from the SOURCE table so FK and PK shift in sync.
KEY_SHIFTS = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {
        "o_orderkey": "orders.o_orderkey",
        "o_custkey": "customer.c_custkey",
    },
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {
        "event_id": "events.event_id",
        "user_id": "events.user_id",
    },
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}

TS_SHIFT_COLS = {"orders": ["o_orderdate"], "events": ["ts"]}

#: Name columns that act as deterministic tie-breakers in ORDER BY /
#: LIMIT queries (e.g. q21's ``ORDER BY numwait DESC, s_name``) — a
#: verbatim copy would create 10-way ties and make the LIMIT cut
#: engine-dependent, so copies get a unique suffix.
UNIQUE_SUFFIX_COLS = {
    "customer": ["c_name"],
    "supplier": ["s_name"],
    "part": ["p_name"],
}


def _strides(src_dir: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for spec in KEY_SHIFTS.values():
        for ref in spec.values():
            if ref in out:
                continue
            tbl, col = ref.split(".")
            t = pq.read_table(os.path.join(src_dir, f"{tbl}.parquet"), columns=[col])
            out[ref] = int(pc.max(t[col]).as_py()) + 1
    return out


def _shift_copy(name: str, base: pa.Table, copy: int, strides: dict[str, int]) -> pa.Table:
    t = base
    for col, ref in KEY_SHIFTS.get(name, {}).items():
        idx = t.schema.get_field_index(col)
        shifted = pc.add(t[col], pa.scalar(copy * strides[ref], type=t[col].type))
        t = t.set_column(idx, t.schema.field(idx), shifted)
    for col in TS_SHIFT_COLS.get(name, []):
        idx = t.schema.get_field_index(col)
        arr = t[col].combine_chunks()
        shifted = pc.add(arr.cast(pa.int64()), copy * 86_400_000_000).cast(arr.type)
        t = t.set_column(idx, t.schema.field(idx), shifted)
    if copy:
        for col in UNIQUE_SUFFIX_COLS.get(name, []):
            idx = t.schema.get_field_index(col)
            suffixed = pc.binary_join_element_wise(
                t[col].cast(pa.string()), pa.scalar(f"#x{copy}"), ""
            )
            t = t.set_column(idx, t.schema.field(idx), suffixed.cast(t[col].type))
    if name == "documents" and copy:
        idx = t.schema.get_field_index("text")
        txt = pc.binary_join_element_wise(
            t["text"].cast(pa.string()), pa.scalar(f" copytag{copy}"), ""
        )
        t = t.set_column(idx, t.schema.field(idx), txt.cast(t["text"].type))
        nidx = t.schema.get_field_index("n_chars")
        nc = pc.add(t["n_chars"], len(f" copytag{copy}")).cast(t["n_chars"].type)
        t = t.set_column(nidx, t.schema.field(nidx), nc)
    if name == "embeddings" and copy:
        # Tiny deterministic first-component nudge: breaks exact-tie
        # degeneracy between copies without moving neighborhoods.
        emb = t["embedding"].combine_chunks()
        vals = emb.values.to_numpy(zero_copy_only=False).copy()
        off = emb.offsets.to_numpy(zero_copy_only=False)
        vals[off[:-1]] = vals[off[:-1]] + np.float32(copy * 1e-5)
        new = pa.ListArray.from_arrays(emb.offsets, pa.array(vals, type=emb.values.type))
        idx = t.schema.get_field_index("embedding")
        t = t.set_column(idx, t.schema.field(idx), new.cast(t["embedding"].type))
    return t


def generate(k: int, src_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    strides = _strides(src_dir)
    for name in TABLES:
        src = os.path.join(src_dir, f"{name}.parquet")
        base = pq.read_table(src)
        if name in ("region", "nation"):
            pq.write_table(base, os.path.join(out_dir, f"{name}.parquet"))
            print(f"{name}: {base.num_rows} rows (verbatim)")
            continue
        copies = [_shift_copy(name, base, c, strides) for c in range(k)]
        out = pa.concat_tables(copies)
        pq.write_table(
            out,
            os.path.join(out_dir, f"{name}.parquet"),
            row_group_size=1 << 20,
            compression="zstd",
        )
        print(f"{name}: {out.num_rows} rows ({k}x)")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.local_testdata/sf1"
    generate(k, src, out)
