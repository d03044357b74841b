"""Streaming consumption of crawl output — the JobUpdate-stream analogue.

The reference streams one JobUpdate per processed task to the consumer over
a channel (main/src/crawler.rs:252-269 blocking iterator; the
find_duplicate_titles example consumes it concurrently,
main/examples/find_duplicate_titles/main.rs:80-127). In the Spark engine the
stream IS the fetch_log table: each iteration appends one immutable parquet
dir, so Structured Streaming's file source tails it naturally.

``fetch_log_stream`` returns a streaming DataFrame over the fetch_log data
directory; consumers attach ordinary streaming sinks/aggregations
(e.g. the duplicate-titles aggregation below) and run concurrently with the
crawl loop — same decoupling as the reference's channel, minus the shared
process.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crusty_core_spark.plans import schemas as S


def fetch_log_stream(spark: SparkSession, workdir: str) -> DataFrame:
    """readStream over the engine's fetch_log data dirs (file source tails
    new parquet files as iterations append them)."""
    path = os.path.join(workdir, "fetch_log")
    return (
        spark.readStream.schema(S.FETCH_LOG)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def duplicate_titles(updates: DataFrame, min_count: int = 2) -> DataFrame:
    """The find_duplicate_titles example as a (streaming-capable) aggregation
    (reference main/examples/find_duplicate_titles/main.rs:34-42): titles seen
    on ≥ min_count distinct URLs."""
    return (
        updates.filter(F.col("title").isNotNull())
        .groupBy("title")
        .agg(
            F.approx_count_distinct("url").alias("n_urls"),
            F.min("url").alias("first_url"),
        )
        .filter(F.col("n_urls") >= min_count)
    )
