"""Prove the engine degrades gracefully under memory pressure: run the
shuffle-heaviest query shapes at sf1 in a JVM with a deliberately tiny
heap and execution-memory fraction, verify results stay BIT-EXACT
against DuckDB, and count the spill events Spark logs while doing it.

The claim being tested is the brief's "spill-aware" requirement: a
100 TB run WILL exceed executor memory in some stage — the engine must
produce the same answer out of ExternalSorter/UnsafeExternalSorter
spill files, not OOM and not drift. Correctness under spill is the
point; the spill-event count is evidence the pressure was real, not
that the workload happened to fit.

Run:  python tools/spill_check.py [sf_dir] [heap_mb] [mem_fraction]
Emits one JSON line: per-query exactness + spill event counts.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, tempfile
from pyspark.sql import SparkSession, functions as F

sf_dir = sys.argv[1]
mem_fraction = sys.argv[2] if len(sys.argv) > 2 else "0.15"
evdir = tempfile.mkdtemp(prefix="spill_ev_")
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", evdir)
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.rolling.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")   # big partitions -> pressure
    .config("spark.memory.fraction", mem_fraction)  # starve execution memory
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    # broadcasts need build-side heap this harness deliberately lacks
    # (the sf1 orders broadcast OOMs a <1g driver — reproduced in
    # tools/partition_sweep.py); a memory-constrained deployment turns
    # them off and lets sort-merge spill, which is the path under test
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("INFO")  # spill messages are INFO-level

li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
o = spark.read.parquet(f"{sf_dir}/orders.parquet")

out = {}

# q1 shape: wide hash aggregate over the full fact table
q1 = (
    li.filter(F.col("l_shipdate") <= "1998-09-02")
    .groupBy("l_returnflag", "l_linestatus")
    .agg(
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("sum_qty"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
        ).cast("double").alias("sum_disc"),
        F.count("*").alias("n"),
    )
    .orderBy("l_returnflag", "l_linestatus")
)
out["q1"] = [[str(v) for v in r] for r in q1.collect()]

# global sort of the whole fact table (ExternalSorter territory)
srt = (
    li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
    .select("l_orderkey", "l_linenumber", "l_extendedprice")
    .limit(20)
)
out["sort20"] = [[str(v) for v in r] for r in srt.collect()]

# fact-fact join + countDistinct (hash join build sides under pressure)
j = (
    li.join(o, li.l_orderkey == o.o_orderkey)
    .groupBy("o_orderpriority")
    .agg(
        F.count("*").alias("n"),
        F.countDistinct("o_custkey").alias("nd"),
    )
    .orderBy("o_orderpriority")
)
out["join"] = [[str(v) for v in r] for r in j.collect()]

spark.stop()
mem = disk = 0
paths = []
for root, _dirs, names in os.walk(evdir):
    paths += [os.path.join(root, n) for n in names
              if not n.startswith(".")]
for path in paths:
    with open(path, errors="ignore") as f:
        for line in f:
            if '"Memory Bytes Spilled"' not in line:
                continue
            ev = json.loads(line)
            tm = ev.get("Task Metrics") or {}
            mem += tm.get("Memory Bytes Spilled", 0)
            disk += tm.get("Disk Bytes Spilled", 0)
out["memory_bytes_spilled"] = mem
out["disk_bytes_spilled"] = disk
print("RESULT_JSON:" + json.dumps(out))
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".local_testdata", "sf1"
    )
    heap_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 700
    mem_fraction = sys.argv[3] if len(sys.argv) > 3 else "0.15"

    env = dict(os.environ)
    env["PYSPARK_SUBMIT_ARGS"] = (
        f"--driver-memory {heap_mb}m pyspark-shell"
    )
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER, sf_dir, mem_fraction],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=1800,
    )
    if proc.returncode != 0:
        print(proc.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"worker failed rc={proc.returncode}")
    open("/tmp/spill_worker_stderr.log", "w").write(proc.stderr)
    m = re.search(r"RESULT_JSON:(\{.*\})", proc.stdout)
    results = json.loads(m.group(1))
    mem_spilled = results.pop("memory_bytes_spilled")
    disk_spilled = results.pop("disk_bytes_spilled")

    # DuckDB ground truth
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    truth = {}
    truth["q1"] = [
        [str(v) for v in r]
        for r in con.execute(
            """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE),
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(30,6))) AS DOUBLE),
                   COUNT(*)
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
            """
        ).fetchall()
    ]
    truth["sort20"] = [
        [str(v) for v in r]
        for r in con.execute(
            """
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20
            """
        ).fetchall()
    ]
    truth["join"] = [
        [str(v) for v in r]
        for r in con.execute(
            """
            SELECT o_orderpriority, COUNT(*), COUNT(DISTINCT o_custkey)
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
            """
        ).fetchall()
    ]

    report = {
        "heap_mb": heap_mb,
        "memory_fraction": mem_fraction,
        "sf_dir": sf_dir,
        "memory_bytes_spilled": mem_spilled,
        "disk_bytes_spilled": disk_spilled,
    }
    for k in results:
        report[f"{k}_exact"] = results[k] == truth[k]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
