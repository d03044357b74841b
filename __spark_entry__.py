"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl over a pages corpus derived
deterministically from the sf0.001 documents table. ``queries()`` /
``oracle_sql()`` expose every SQL-expressible operator from SURVEY.md §2 plus
the training-data pipeline; definitions live in
crusty_core_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crusty_core_spark.entry_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl a corpus derived from sf0.001 documents; returns the
    fetch_log (crawl ordering, actions, titles)."""
    fn, _ = QUERIES["q30_crawl_fetch_log"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None
    }
