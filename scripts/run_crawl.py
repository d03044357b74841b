"""spark-submit entry point for the crawl engine (north_rule deployment path).

Usage:
    scripts/package.sh   # builds dist/crusty_core_spark.zip
    spark-submit --py-files dist/crusty_core_spark.zip scripts/run_crawl.py \
        --pages /path/to/pages_parquet --workdir /path/to/state \
        --seeds /path/to/seeds_parquet [--resume] [--max-iterations N]

On a cluster, --pages points at the Common-Crawl-style Iceberg/parquet table
(url, warc_ts, html, text, lang [+ fetch columns]); seeds is a parquet of
(job_id, seed_url). The same script runs unchanged at any executor count —
partitioning is config, not code.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--seeds")
    ap.add_argument("--hosts", help="optional DNS dim table parquet (host, addrs)")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-iterations", type=int, default=None)
    ap.add_argument("--config-json", default="{}",
                    help='CrawlConfig overrides, e.g. \'{"page_budget": 100}\'')
    args = ap.parse_args()

    from crusty_core_spark.config import CrawlConfig
    from crusty_core_spark.plans.engine import CrawlEngine

    spark = SparkSession.builder.appName("crusty_core_spark.crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    pages = spark.read.parquet(args.pages)
    hosts = spark.read.parquet(args.hosts) if args.hosts else None

    if args.resume:
        eng = CrawlEngine.resume(spark, pages, args.workdir, hosts=hosts)
    else:
        cfg = CrawlConfig(**json.loads(args.config_json))
        eng = CrawlEngine(spark, pages, args.workdir, cfg, hosts=hosts)
        seeds = spark.read.parquet(args.seeds)
        eng.seed(seeds)

    stats = eng.run(max_iterations=args.max_iterations)
    print(json.dumps({
        "stats": stats,
        "fetch_log_rows": eng.io.read("fetch_log").count(),
        "url_seen": eng.url_seen_df().count(),
    }))


if __name__ == "__main__":
    main()
