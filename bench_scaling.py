"""Scaling-efficiency evidence (BASELINE.json north_rule, sandbox form).

The rule's two-cluster criterion (N vs 4N executors, efficiency ≥ 0.8)
cannot use a real cluster in this sandbox, so the same job runs at two
parallelism levels — local[8] and local[32] — over the SAME pre-generated
corpus, in separate JVMs. Efficiency = (rate_32 / rate_8) / 4.

Usage: python bench_scaling.py [n_hosts] [pages_per_host] [max_iters]
Writes BENCH_SCALING.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import sys, json, time
sys.path.insert(0, "/root/repo")
from crusty_core_spark.session import get_spark
from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.plans.engine import CrawlEngine
from crusty_core_spark.sources.datagen import CorpusSpec, host_name

cpus, pages_path, wd, n_hosts, max_iters = sys.argv[1:6]
spark = get_spark(app_name="scale%s" % cpus, master="local[%s]" % cpus,
                  shuffle_partitions=int(cpus))
pages = spark.read.parquet(pages_path).repartition(int(cpus), "url").persist()
pages.count()  # materialize the cache before timing starts
spec = CorpusSpec(n_hosts=int(n_hosts), base_pages_per_host=0)  # names only
seeds = [(j, "http://%s/" % host_name(spec, j)) for j in range(int(n_hosts))]

# warm run (JIT/codegen warmup — BASELINE.md protocol: timed runs are warm):
# same job shape on a 200-host slice, untimed
warm = CrawlEngine(spark, pages, wd + "_warm", CrawlConfig())
warm.seed(seeds[:200])
warm.run(max_iterations=3)

eng = CrawlEngine(spark, pages, wd, CrawlConfig(fetch_log_detail=False))
t0 = time.time()
eng.seed(seeds)
eng.run(max_iterations=int(max_iters))
wall = time.time() - t0
processed = eng.io.read("fetch_log").count()
seen = eng.io.read("url_seen").count()
print("RESULT " + json.dumps({
    "cpus": int(cpus), "wall_sec": round(wall, 2),
    "urls_processed": processed, "url_seen": seen,
    "urls_per_sec": round(processed / wall, 2)}))
"""


def run_level(cpus: int, pages_path: str, n_hosts: int, max_iters: int) -> dict:
    wd = tempfile.mkdtemp(prefix=f"scale_{cpus}_")
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), pages_path, wd,
         str(n_hosts), str(max_iters)],
        capture_output=True, text=True, timeout=3000,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run at {cpus} cpus failed:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-3000:]}")


def main():
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    ppg = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    max_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from crusty_core_spark.session import get_spark
    from crusty_core_spark.sources.datagen import CorpusSpec, gen_pages_spark

    tmp = tempfile.mkdtemp(prefix="scale_corpus_")
    pages_path = os.path.join(tmp, "pages")
    spec = CorpusSpec(n_hosts=n_hosts, base_pages_per_host=ppg,
                      links_per_page=20, words_per_page=400,
                      zipf_hot_host_factor=20, seed=42)
    spark = get_spark(app_name="scale_gen", master="local[32]",
                      shuffle_partitions=32)
    gen_pages_spark(spark, spec).write.mode("overwrite").parquet(pages_path)
    n_pages = spark.read.parquet(pages_path).count()
    spark.stop()

    r8 = run_level(8, pages_path, n_hosts, max_iters)
    r32 = run_level(32, pages_path, n_hosts, max_iters)
    assert r8["urls_processed"] == r32["urls_processed"], (
        "correctness gate: both levels must process the identical crawl"
    )
    assert r8["url_seen"] == r32["url_seen"]
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4
    result = {
        "corpus_pages": n_pages,
        "n_hosts": n_hosts,
        "N": r8,
        "4N": r32,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
