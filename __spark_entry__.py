"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in the engine package
(``big_data_movie_recommendation_and_customer_segmentation_spark``);
this file is only the registry surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_movie_recommendation_and_customer_segmentation_spark.plans import (  # noqa: E402
    ORACLE_REGISTRY,
    QUERY_REGISTRY,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERY_REGISTRY["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERY_REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (subset of queries();
    non-SQL-expressible ops are checked rows-only by the driver)."""
    return dict(ORACLE_REGISTRY)
