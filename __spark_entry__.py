"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (hourly cross-sectional entropy rollup) on
                 /root/testdata/sf0.001.
queries()      — implemented operators from SURVEY.md §2 (Spark side).
oracle_sql()   — DuckDB-equivalent ANSI SQL for each query (same column
                 names/rounding); non-SQL-expressible ops omitted.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sequenzo_spark.driver_queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["xsect_entropy_hourly"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
