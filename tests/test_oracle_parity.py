"""Replicates the driver's correctness gate locally: run every
``queries()`` entry in Spark and its ``oracle_sql()`` twin in DuckDB on
the same parquet tables, then compare row count, column names, and an
order-insensitive value comparison.

Floats are compared to 9 significant digits (the suite's decimal-sum
pattern should make most of them bit-identical; the tolerance only
papers over genuinely-rounded columns like cosine similarities).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

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
    res = con.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} != {len(duck_rows)}"
    )
    sset, dset = _rowset(spark_rows), _rowset(duck_rows)
    mismatches = [
        (a, b) for a, b in zip(sset, dset) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
