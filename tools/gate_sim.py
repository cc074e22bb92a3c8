"""Driver correctness-gate simulator (stricter than tests/test_oracle_parity).

Runs the first N registered queries in Spark and their DuckDB oracles at
a given sf_dir and compares sorted row tuples BIT-EXACTLY (floats via
repr), approximating the driver's value-hash. Reports per-query status.

Usage: python tools/gate_sim.py [N] [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_exact(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_exact(x) for x in v)
    return v


def _rowset(rows):
    return sorted(
        (tuple(_norm_exact(v) for v in r) for r in rows),
        key=lambda t: tuple(map(repr, t)),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(qs)[:n]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    exact = close = rows_only = fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = [f.name for f in sdf.schema.fields]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL   {name}: spark error {exc}")
            fail += 1
            continue
        if name not in oracles:
            print(f"ROWS   {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            orows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL   {name}: oracle error {exc}")
            fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL   {name}: cols {scols} vs {ocols}")
            fail += 1
            continue
        # align column order by sorted name, like the driver
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        sset = _rowset([tuple(r[i] for i in sidx) for r in srows])
        oset = _rowset([tuple(r[i] for i in oidx) for r in orows])
        if sset == oset:
            print(f"EXACT  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            exact += 1
            continue
        if len(sset) != len(oset):
            print(f"FAIL   {name}: rows {len(sset)} vs {len(oset)}")
            fail += 1
            continue
        # find first differing value for diagnosis
        diff = None
        for a, b in zip(sset, oset):
            if a != b:
                for ca, cb, cn in zip(a, b, sorted(scols)):
                    if ca != cb:
                        diff = (cn, ca, cb)
                        break
                break
        print(f"CLOSE  {name}: rows match, value diff {diff}")
        close += 1
    print(
        f"\nSUMMARY exact={exact} close={close} rows_only={rows_only} fail={fail} "
        f"of {len(names)}"
    )


if __name__ == "__main__":
    main()
