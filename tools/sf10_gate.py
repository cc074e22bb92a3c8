"""sf10 spot-scale gate (VERDICT r11 "Next round" #2): the strongest
100x-design evidence a single box can produce.

Runs a flagship query list at one or more sf_dirs (typically the
driver's sf0.1, the local sf1, and the local sf10 — 1000x data range),
recording Spark wall seconds and, where the DuckDB oracle is feasible
at that volume, bit-exactness.  A plan that survives 100 TB must show
walls that scale ~linearly in rows here — any super-linear jump is
a plan bug (a pairwise blow-up, a single-partition sort) that bigger
hardware will NOT fix.

Usage:
  python tools/sf10_gate.py [out_json] [sf_dir ...]
Defaults: PLANS-stamp to stdout; sf_dirs = sf0.1, .local_testdata/sf1,
.local_testdata/sf10.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gate_sim import TABLES, _rowset  # noqa: E402

#: flagships: relational aggs, window/equidepth, dedup/LSH, ANN join,
#: stats — one per plan family whose scale posture VERDICT graded.
QUERIES = [
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "dedup_exact",
    "equidepth_continuous",
    "equidepth_string",
    "auc_roc",
    "histogram_equidepth_scale",
    "text_stats",
    "dsir_resample",
    "neardup_lsh",
    "knn_join_lsh",
]

#: queries whose DuckDB oracle is infeasible-or-pointless at sf10 on
#: this box (recursive-CTE / pairwise-verify oracles): walls only.
ORACLE_SKIP_AT = {
    "neardup_lsh": 6_000_000,     # recursive component CTE
    "knn_join_lsh": 6_000_000,    # pairwise verify oracle
    "auc_roc": 60_000_000,        # 15M-row global window is fine, 150M not
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    sf_dirs = sys.argv[2:] or [
        "/root/testdata/sf0.1",
        "/root/repo/.local_testdata/sf1",
        "/root/repo/.local_testdata/sf10",
    ]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("sf10_gate")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    results: dict[str, dict[str, dict[str, object]]] = {}
    for sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}: missing")
            continue
        tag = os.path.basename(sf_dir.rstrip("/"))
        results[tag] = {}
        con = duckdb.connect()
        lineitem_rows = 0
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
                if t == "lineitem":
                    lineitem_rows = con.sql(
                        "SELECT COUNT(*) FROM lineitem"
                    ).fetchone()[0]
        for name in QUERIES:
            if name not in qs:
                continue
            rec: dict[str, object] = {}
            t0 = time.perf_counter()
            try:
                sdf = qs[name](spark, sf_dir)
                scols = [f.name for f in sdf.schema.fields]
                srows = [tuple(r) for r in sdf.collect()]
                rec["spark_wall"] = round(time.perf_counter() - t0, 2)
                rec["rows"] = len(srows)
            except Exception as exc:  # noqa: BLE001
                rec["error"] = str(exc)[:200]
                results[tag][name] = rec
                print(f"{tag:>6} {name:<28} ERROR {rec['error'][:80]}")
                continue
            skip_at = ORACLE_SKIP_AT.get(name)
            if name in oracles and (
                skip_at is None or lineitem_rows < skip_at
            ):
                t0 = time.perf_counter()
                try:
                    rel = con.sql(oracles[name])
                    ocols = list(rel.columns)
                    orows = rel.fetchall()
                    rec["oracle_wall"] = round(time.perf_counter() - t0, 2)
                    sidx = [scols.index(c) for c in sorted(scols)]
                    oidx = [ocols.index(c) for c in sorted(ocols)]
                    sset = _rowset([tuple(r[i] for i in sidx) for r in srows])
                    oset = _rowset([tuple(r[i] for i in oidx) for r in orows])
                    rec["exact"] = sset == oset
                except Exception as exc:  # noqa: BLE001
                    rec["oracle_error"] = str(exc)[:200]
            results[tag][name] = rec
            status = (
                "EXACT" if rec.get("exact")
                else ("DIFF!" if rec.get("exact") is False else "rows ")
            )
            print(
                f"{tag:>6} {name:<28} {status} {rec['spark_wall']:>8.2f}s "
                f"{rec['rows']:>8} rows"
            )

    line = json.dumps(results)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
