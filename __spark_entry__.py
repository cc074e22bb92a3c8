"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator suite from
``ome_arrow_spark.suite`` (one entry per SURVEY.md §2 operator, each
with a DuckDB-runnable ANSI-SQL twin unless non-SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from ome_arrow_spark import suite
from ome_arrow_spark import suite_ome  # noqa: F401  (registers OME queries)
from ome_arrow_spark import suite_llm  # noqa: F401  (registers LLM-ops queries)
from ome_arrow_spark import suite_streaming  # noqa: F401  (registers streaming queries)
from ome_arrow_spark import suite_tpch  # noqa: F401  (registers TPC-H-shape queries)
from ome_arrow_spark import suite_analytics  # noqa: F401  (registers analytics queries)
from ome_arrow_spark import suite_formats  # noqa: F401  (registers format/merge queries)
from ome_arrow_spark.session import tune_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-style pricing
    summary (scan → pushed filter → partial+final hash agg → sort)."""
    tune_session(spark)
    return suite.q1_pricing_summary(spark, "/root/testdata/sf0.001").orderBy(
        "l_returnflag", "l_linestatus"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (omitted for
    non-SQL-expressible ops — driver does a rows-only check)."""
    return suite.oracle_sql()
