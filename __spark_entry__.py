"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``projet_data_engineering_spark`` — operators register
themselves with ``registry.query`` (one entry per SURVEY.md §2 line, plus the
north-star dedup / similarity / text-analysis / streaming families).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projet_data_engineering_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary (the reference's dashboard
    KPI pattern — filter → groupBy → multi-aggregate) on sf0.001."""
    from projet_data_engineering_spark.operators.relational import q_tpch_q1

    return q_tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star)."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; non-SQL-expressible ops (BM25 scoring)
    are omitted → driver records rows-only checks."""
    return registry.all_oracles()
