"""SparkSession factory tuned for the crawl engine.

Local-mode defaults are sized for the sandbox (local[32], 128 GiB); the same
builder settings apply unchanged on a multi-executor cluster via
``spark-submit --py-files`` (see scripts/submit.sh) — AQE, Arrow, and adaptive
skew-join handling are cluster-side features, not local-mode hacks.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crusty_core_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    if shuffle_partitions is None:
        # match parallelism in local mode instead of the 200 default
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(int(n), 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Reducer-locality preferences poison cache locality for this
        # engine's hot path: the per-iteration fetch SMJ zips a tiny
        # shuffled frontier with the big cached pages table, and with
        # reduceLocality on (default) the shuffle side's reducer prefs
        # override the cache's executor-level placement — measured on a
        # 4-executor local-cluster, ALL 16 join tasks ran NODE_LOCAL and
        # re-streamed the full 4.3 GB cache across process boundaries
        # every iteration (run 7.0 s / cpu 0.9 s per task, blocked on the
        # block manager). With it off the cache's ExecutorCacheTaskLocation
        # is the only preference and the scan is PROCESS_LOCAL: the same
        # stage dropped 8.6 s -> 2.4 s. Iteration shuffles here are KB-MB
        # (frontier rows); the cache is GB — locality must follow the cache.
        .config("spark.shuffle.reduceLocality.enabled", "false")
    )
    ev = os.environ.get("SPARK_GRAFT_EVENTLOG")
    if ev:
        # diagnostic: per-task timing evidence for the scaling benches
        os.makedirs(ev, exist_ok=True)
        b = (b.config("spark.eventLog.enabled", "true")
              .config("spark.eventLog.dir", "file://" + ev))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
