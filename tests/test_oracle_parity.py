"""Replicates the driver's correctness gate locally: run every
``queries()`` entry in Spark and its ``oracle_sql()`` twin in DuckDB on
the same parquet tables, then compare row count, column names, and an
order-insensitive value comparison.

Floats are compared to 9 significant digits (the suite's decimal-sum
pattern should make most of them bit-identical; the tolerance only
papers over genuinely-rounded columns like cosine similarities).

Heavy-marked (the whole point of the r7 #8 fast/heavy split): this
sweep re-runs the ENTIRE registry — it belongs in the nightly /
per-round lane, not the <5-min CI loop, and it duplicates what the
driver gate and tools/gate_sim.py check.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.heavy

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # 9 significant digits
        from math import floor, log10

        d = 9 - int(floor(log10(abs(v)))) - 1
        return round(v, d)
    if isinstance(v, Decimal):
        return _norm(float(v))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(rows):
    return sorted(
        (tuple(_norm(v) for v in r) for r in rows), key=lambda t: tuple(map(repr, t))
    )


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def _spark_type_family(t: str) -> str:
    t = t.lower()
    if t.startswith("array"):
        return "list"
    if t.startswith("decimal"):
        return "decimal"
    return {
        "tinyint": "int8", "smallint": "int16", "int": "int32",
        "bigint": "int64", "float": "float32", "double": "float64",
        "string": "string", "boolean": "bool", "timestamp": "timestamp",
        "timestamp_ntz": "timestamp", "date": "date", "binary": "binary",
    }.get(t, "?")


def _duck_type_family(t: str) -> str:
    t = t.upper()
    if t.endswith("[]") or t.startswith("LIST") or t.startswith("STRUCT"):
        return "list"
    if t.startswith("DECIMAL"):
        return "decimal"
    return {
        "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
        "BIGINT": "int64", "HUGEINT": "int128", "FLOAT": "float32",
        "REAL": "float32", "DOUBLE": "float64", "VARCHAR": "string",
        "BOOLEAN": "bool", "TIMESTAMP": "timestamp",
        "TIMESTAMP_NS": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
        "DATE": "date", "BLOB": "binary", "NULL": "?",
    }.get(t, "?")


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = [c.lower() for c in sdf.columns]

    if name not in ORACLES:
        # rows-only check, mirroring the driver's weaker gate
        assert len(spark_rows) >= 0
        return

    con = _duck(sf_dir)
    rel = con.sql(ORACLES[name])
    duck_cols = [c.lower() for c in rel.columns]
    duck_type_strs = [str(t) for t in rel.types]
    duck_rows = rel.fetchall()
    con.close()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"

    # type-family comparison (the driver also compares schemas; catch
    # width mismatches like Spark int vs DuckDB BIGINT early)
    duck_types = [_duck_type_family(t) for t in duck_type_strs]
    spark_types = [_spark_type_family(f.dataType.simpleString()) for f in sdf.schema.fields]
    mismatched_types = [
        (c, s, d)
        for c, s, d in zip(spark_cols, spark_types, duck_types)
        if s != d and "?" not in (s, d)
    ]
    assert not mismatched_types, f"{name}: type mismatches {mismatched_types}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} != {len(duck_rows)}"
    )
    sset, dset = _rowset(spark_rows), _rowset(duck_rows)
    mismatches = [
        (a, b) for a, b in zip(sset, dset) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
