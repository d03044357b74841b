"""Round-6 optimization harness — NOT the frozen bench.py.

Three modes:
  python bench_extra.py queries [names...]   noop-sink isolated per-query
                                             timing (guide §1.4) + formatted
                                             plans written to plans/r06/
  python bench_extra.py crawl               the exact bench.py crawl, with
                                             SPARK_CRAWL_PROFILE stage marks
                                             and an optional cProfile dump
  python bench_extra.py crawl-prof          same + cProfile of the run loop

Numbers from this file are cited in OPTIMIZATION_r06.md; the driver's
measurement remains the frozen bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")


def get_session():
    from crusty_core_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                     shuffle_partitions=int(cpus))


def run_queries(names, tag="", repeats=3):
    from crusty_core_spark.entry_queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session()
    os.makedirs(PLANS_DIR, exist_ok=True)
    # one warmup action so q01 isn't charged JVM/codegen warmup here —
    # bench.py timings still include it; this mode isolates per-query cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        fn, _ = QUERIES[name]
        df = fn(spark, sf_dir)
        if tag:
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"{name}: {times}", flush=True)
    print({k: min(v) for k, v in out.items()})
    return out


def run_crawl(profile=False):
    import shutil
    import tempfile

    from crusty_core_spark.config import CrawlConfig
    from crusty_core_spark.plans.engine import CrawlEngine
    from crusty_core_spark.sources.datagen import (
        CorpusSpec,
        gen_pages_spark,
        host_name,
    )

    spark = get_session()
    n_hosts = int(os.environ.get("BENCH_HOSTS", "1200"))
    spec = CorpusSpec(
        n_hosts=n_hosts,
        base_pages_per_host=int(os.environ.get("BENCH_PAGES_PER_HOST", "40")),
        links_per_page=20,
        words_per_page=400,
        zipf_hot_host_factor=20,
        seed=42,
    )
    tmp = tempfile.mkdtemp(prefix="bench_extra_crawl_", dir="/dev/shm")
    pages_path = os.path.join(tmp, "pages")
    gen_pages_spark(spark, spec).write.mode("overwrite").parquet(pages_path)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pages = (spark.read.parquet(pages_path)
             .repartition(n_part, "url").sortWithinPartitions("url").persist())
    pages.count()
    seeds = [(j, f"http://{host_name(spec, j)}/") for j in range(n_hosts)]

    import pyarrow.parquet as pq

    corpus = pq.read_table(
        pages_path,
        columns=["url", "html", "status", "location", "content_type",
                 "content_encoding"],
    ).to_pandas()
    url_index = {u: i for i, u in enumerate(corpus["url"].tolist())}

    def fetcher(urls):
        rows = [url_index[u] for u in urls if u in url_index]
        return corpus.iloc[rows]

    warm = CrawlEngine(spark, pages, os.path.join(tmp, "wd_warm"),
                       CrawlConfig(), fetcher=fetcher)
    warm.seed(seeds[:200])
    warm.run(max_iterations=3)

    runs = []
    for i in range(2):
        eng = CrawlEngine(
            spark, pages, os.path.join(tmp, f"wd{i}"),
            CrawlConfig(fetch_log_detail=False, sched_log_detail=False,
                        local_iter_threshold="auto"),
            fetcher=fetcher,
        )
        prof = None
        if profile and i == 1:
            import cProfile

            prof = cProfile.Profile()
            prof.enable()
        t0 = time.time()
        eng.seed(seeds)
        stats = eng.run(max_iterations=int(os.environ.get("BENCH_MAX_ITERS",
                                                          "8")))
        wall = time.time() - t0
        if prof is not None:
            prof.disable()
            prof.dump_stats("/tmp/crawl_profile.out")
            import pstats

            pstats.Stats(prof).sort_stats("cumulative").print_stats(40)
        processed = eng.io.read("fetch_log").count()
        runs.append((round(wall, 2), stats["iterations"], processed))
        print(f"run {i}: wall={wall:.2f}s iters={stats['iterations']} "
              f"processed={processed} urls/s={processed / wall:.0f}",
              flush=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return runs


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        names = sys.argv[2:] or [
            "q01_pricing_summary", "q03_nation_revenue",
            "q04_politeness_rank", "q06_running_counter",
            "q07_exact_dedup_groups", "q08_anti_join_unseen",
            "q12_lang_id", "q14_simhash", "q16_lsh_candidate_pairs",
            "q17_ngram_jaccard", "q18_ann_cosine_topk", "q33_ann_ivf_probe",
        ]
        tag = os.environ.get("PLAN_TAG", "")
        run_queries(names, tag=tag)
    elif mode == "crawl":
        run_crawl(profile=False)
    elif mode == "crawl-prof":
        run_crawl(profile=True)
