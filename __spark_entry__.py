"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`linear_kdtree_spark.entry` — every implemented
operator from SURVEY.md §2 is exposed as a (spark, sf_dir) → DataFrame
callable with a matching DuckDB-runnable ANSI-SQL oracle.
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from linear_kdtree_spark import entry as _entry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _entry.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _entry.queries()


def oracle_sql() -> dict[str, str]:
    return _entry.oracle_sql()
