"""crusty_core_spark — a from-scratch PySpark-native web-crawl analytics engine.

Re-expresses the crawl-loop semantics of the reference crawler library
(let4be/crusty-core, Rust — see /root/reference) as an idiomatic Spark
batch-synchronous iteration over columnar tables:

- ``frontier``      — the URL work queue (priority-queue DataFrame keyed by
                      (host_hash, next_fetch_ts)); reference: the per-job flume
                      task channel (main/src/task_scheduler.rs:20).
- ``url_seen``      — exact dedup set + Bloom shard prefilter; reference:
                      shared HashSet (main/src/task_filters.rs:181-211).
- ``robots``        — per-host parsed robots rules dim table; reference:
                      ctx.shared handoff (main/src/task_filters.rs:215-295).
- ``pages``         — Common-Crawl-style input table (url, warc_ts, html,
                      text, lang); "fetch" = an equi-join against it.
- ``fetch_log``     — one row per processed URL per iteration; reference:
                      the JobUpdate stream (main/src/types.rs:337-341).
- ``lineage`` / ``metrics`` — per-partition provenance and counters.

Everything is DataFrame ops + vectorized pandas/Arrow UDFs; no per-row
Python UDFs, no RDDs, no custom Catalyst extensions.
"""

__version__ = "0.1.0"

from crusty_core_spark.config import CrawlConfig  # noqa: F401
