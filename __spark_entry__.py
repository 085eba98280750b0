"""Driver contract for the spark-graft builder (PySpark target).

Delegates to disco_crawl_spark.queries — one entry per implemented operator
from SURVEY.md §2 plus the training-data operators (dedup / similarity /
text analysis), each with a DuckDB oracle where ANSI SQL can express it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from disco_crawl_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
