"""Dump explain("formatted") for named registered queries to files.

Usage: python tools/explain_dump.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query, at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Used to capture the
plans/r14/<query>_{before,after}.txt evidence files.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ome_arrow_spark.session import get_spark
from ome_arrow_spark import suite
from ome_arrow_spark import (  # noqa: F401  (register queries)
    suite_analytics,
    suite_llm,
    suite_ome,
    suite_streaming,
)


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = suite.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = registry[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
