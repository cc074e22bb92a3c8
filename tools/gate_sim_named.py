"""Named-query variant of gate_sim: same bit-exact compare, but runs an
explicit list of registry names instead of the first N.

Usage: python tools/gate_sim_named.py sf_dir name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gate_sim import TABLES, _rowset  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

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

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    fail = 0
    for name in names:
        if name not in qs:
            print(f"FAIL   {name}: not registered")
            fail += 1
            continue
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
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        sset = _rowset([tuple(r[i] for i in sidx) for r in srows])
        oset = _rowset([tuple(r[i] for i in oidx) for r in orows])
        if sset == oset:
            print(f"EXACT  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            continue
        fail += 1
        if len(sset) != len(oset):
            print(f"FAIL   {name}: rows {len(sset)} vs {len(oset)}")
            continue
        for a, b in zip(sset, oset):
            if a != b:
                print(f"FAIL   {name}: first diff\n  spark  {a}\n  oracle {b}")
                break

    print(f"done: {len(names) - fail}/{len(names)} exact-or-rows")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
