"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``mmlspark_spark.plans.catalog`` — the query registry
where every implemented operator from SURVEY.md §2 is exposed as a
(spark, sf_dir) -> DataFrame callable with (where SQL-expressible) a
DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mmlspark_spark.plans import catalog as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return _catalog.CATALOG["tpch_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
