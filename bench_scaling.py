"""Scaling-efficiency evidence (BASELINE.json north_rule, sandbox form).

The rule's two-cluster criterion (N vs 4N executors, efficiency >= 0.8)
cannot use a real cluster in this sandbox, so the same job runs at two
EXECUTOR COUNTS on one machine: ``local-cluster[1,4,M]`` (one 4-core
executor, pinned to 4 vCPUs) vs ``local-cluster[4,4,M]`` (four 4-core
executors, pinned to 16 vCPUs). Efficiency = (median_rate_4N /
median_rate_N) / 4.

Why executor-count topology and not ``local[4]`` vs ``local[16]``: clusters
scale by ADDING executors of a fixed size, not by growing one JVM — and a
single JVM is itself a confound. Measured on this VM with the extract stage
in isolation: one 16-thread JVM does 16.7k pages/s where two disjoint
8-thread JVMs do 21.5k combined (+29%) and the pure-python kernel scales at
0.93 efficiency — i.e. ``local[16]`` charges intra-JVM contention (Arrow
allocator, GC, scheduler locks) to the engine. Per-executor resources are
IDENTICAL at both levels (4 cores, same heap), so the ratio isolates what
the rule actually asks about: cross-executor scale-out (shuffle over RPC,
broadcast distribution, driver coordination).

Methodology notes (each item is load-bearing for honest numbers):
- **taskset pinning**: the N level is pinned to 4 physical CPUs, the 4N
  level to 16 (executor JVMs and python workers inherit the affinity).
  Unpinned, GC/Python/compression threads would borrow the whole 32-core
  box and inflate the small level. Beyond 16 vCPUs this VM's parallel
  scaling collapses for reasons outside the engine (host oversubscription:
  a pure-python microbenchmark scales 3.55x from 4->16 pinned vCPUs but
  only 1.43x from 16->32), so 4-vs-16 is the honest "N vs 4N cores" pair.
- **tmpfs I/O**: corpus, engine tables, and spark.local.dir live on
  /dev/shm — the sandbox's /tmp is a virtual disk with high run-to-run
  variance that would otherwise dominate the comparison.
- **full-size warmup**: each level runs ONE UNTIMED full-size crawl first.
  A thin warmup leaves the distributed plan's JIT/codegen cold, and the
  first timed run then pays ~2x (measured: cold 3.2k urls/s vs warm 6.9-8.9k
  at 16 vCPUs) — charging JIT to the small level skews the ratio.
- **medians + steal accounting**: N_RUNS timed runs per level; the median
  rate is reported. The hypervisor steals CPU in bursts (identical
  back-to-back runs swing +-50%); per-run steal jiffies from /proc/stat are
  recorded so outliers are explainable. The best-run ratio is reported
  alongside the median ratio.
- **correctness gate**: both levels must produce the identical crawl
  (urls_processed and url_seen equality is asserted per run).

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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SHM = "/dev/shm/crusty_bench"

# single source of truth for the executor topology — the runner's master
# string, executor memory, AND the recorded topology label all derive from
# these (committed artifacts must be reproducible from the script at HEAD)
EXEC_CORES = 4
EXEC_MEM_MB = 16384   # local-cluster worker memory (MB)
EXEC_HEAP_MB = 14336  # spark.executor.memory — headroom below worker mem

RUNNER = r"""
import sys, json, time, tempfile, os
sys.path.insert(0, "/root/repo")
from crusty_core_spark.session import get_spark
from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.plans.engine import CrawlEngine
from crusty_core_spark.sources.datagen import CorpusSpec, host_name

n_exec, pages_path, shm, n_hosts, max_iters, n_runs = sys.argv[1:7]
exec_cores = int(os.environ["SCALE_EXEC_CORES"])
exec_mem_mb = int(os.environ["SCALE_EXEC_MEM_MB"])
exec_heap_mb = int(os.environ["SCALE_EXEC_HEAP_MB"])
cores = int(n_exec) * exec_cores
spark = get_spark(
    app_name="scale%sx%s" % (n_exec, exec_cores),
    master="local-cluster[%s,%s,%s]" % (n_exec, exec_cores, exec_mem_mb),
    # MUST equal the pages cache's partition count: the fetch equi-join then
    # reuses the cached HashPartitioning(url) and only the thin ready side
    # shuffles per iteration — mismatched counts would re-shuffle the whole
    # pages table through executor RPC every iteration
    shuffle_partitions=cores,
    extra_conf={
        "spark.local.dir": shm + "/spark_local%s" % n_exec,
        "spark.executor.memory": "%sm" % exec_heap_mb,
        "spark.executorEnv.PYTHONPATH": "/root/repo",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    },
)
# hash-partitioned AND sorted on the join key (the Iceberg sorted-bucket
# layout): the per-iteration fetch SMJ then needs neither an exchange nor
# a sort on the pages side — only the thin ready side moves
pages = (spark.read.parquet(pages_path)
         .repartition(cores, "url").sortWithinPartitions("url").persist())
pages.count()  # materialize the cache before timing starts
spec = CorpusSpec(n_hosts=int(n_hosts), base_pages_per_host=0)  # names only
seeds = [(j, "http://%s/" % host_name(spec, j)) for j in range(int(n_hosts))]


def steal_jiffies():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def one_run(wd):
    eng = CrawlEngine(spark, pages, wd,
                      CrawlConfig(fetch_log_detail=False,
                                  sched_log_detail=False))
    s0 = steal_jiffies()
    t0 = time.time()
    eng.seed(seeds)
    eng.run(max_iterations=int(max_iters))
    wall = time.time() - t0
    steal = steal_jiffies() - s0
    n = eng.io.read("fetch_log").count()
    seen = eng.url_seen_df().count()
    return wall, n, seen, steal


# ONE UNTIMED FULL-SIZE warmup: JIT/codegen for the actual distributed
# plan at the actual data scale (a thin warmup leaves the first timed run
# ~2x slow on plan JIT — see module docstring)
one_run(tempfile.mkdtemp(dir=shm, prefix="warm%s_" % n_exec))

runs = []
for i in range(int(n_runs)):
    wd = tempfile.mkdtemp(dir=shm, prefix="scale%s_r%d_" % (n_exec, i))
    wall, n, seen, steal = one_run(wd)
    runs.append({"wall_sec": round(wall, 2), "urls_processed": n,
                 "url_seen": seen, "urls_per_sec": round(n / wall, 2),
                 "steal_jiffies": steal})
    print("RUN " + json.dumps(runs[-1]), flush=True)
print("RESULT " + json.dumps({"executors": int(n_exec), "runs": runs}))
"""


def run_level(n_exec: int, cpu_list: str, pages_path: str, n_hosts: int,
              max_iters: int, n_runs: int) -> dict:
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-c", RUNNER,
         str(n_exec), pages_path, SHM, str(n_hosts), str(max_iters),
         str(n_runs)],
        capture_output=True, text=True, timeout=5400,
        env={**os.environ,
             "SCALE_EXEC_CORES": str(EXEC_CORES),
             "SCALE_EXEC_MEM_MB": str(EXEC_MEM_MB),
             "SCALE_EXEC_HEAP_MB": str(EXEC_HEAP_MB)},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run at {n_exec} executors failed:\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


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

    r1 = run_level(1, "0-3", pages_path, n_hosts, max_iters, n_runs)
    r4 = run_level(4, "0-15", pages_path, n_hosts, max_iters, n_runs)

    for a, b in zip(r1["runs"], r4["runs"]):
        assert a["urls_processed"] == b["urls_processed"], "crawl mismatch"
        assert a["url_seen"] == b["url_seen"]

    med1 = statistics.median(r["urls_per_sec"] for r in r1["runs"])
    med4 = statistics.median(r["urls_per_sec"] for r in r4["runs"])
    best1 = max(r["urls_per_sec"] for r in r1["runs"])
    best4 = max(r["urls_per_sec"] for r in r4["runs"])
    eff = (med4 / med1) / 4
    result = {
        "corpus_pages": n_pages,
        "n_hosts": n_hosts,
        "topology": (
            "local-cluster[1,%d,%d] (N=1 executor x %d cores, taskset 0-3) "
            "vs local-cluster[4,%d,%d] (4N=4 executors x %d cores, taskset "
            "0-15); spark.executor.memory=%dm; identical per-executor "
            "resources" % (EXEC_CORES, EXEC_MEM_MB, EXEC_CORES,
                           EXEC_CORES, EXEC_MEM_MB, EXEC_CORES,
                           EXEC_HEAP_MB)
        ),
        "methodology": "taskset-pinned CPUs, tmpfs I/O, full-size untimed "
                       "warmup per level, median of %d runs, per-run steal "
                       "jiffies recorded" % n_runs,
        "N": {"executors": 1, "cores": EXEC_CORES,
              "median_urls_per_sec": med1,
              "best_urls_per_sec": best1, "runs": r1["runs"]},
        "4N": {"executors": 4, "cores": 4 * EXEC_CORES,
               "median_urls_per_sec": med4,
               "best_urls_per_sec": best4, "runs": r4["runs"]},
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_best": round((best4 / best1) / 4, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "hardware_context": (
            "single-VM sandbox: a pure-python multiprocessing microbenchmark "
            "(html extraction kernel) scales 3.55x from 4 to 16 pinned vCPUs "
            "(0.89 efficiency ceiling); beyond 16 vCPUs host oversubscription "
            "flattens the curve (16->32 only 1.43x). The N and 4N levels here "
            "share one memory/IPC subsystem, which a real multi-node cluster "
            "does not; the hypervisor steals CPU in bursts (recorded per "
            "run)."
        ),
    }
    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(SHM, ignore_errors=True)


if __name__ == "__main__":
    main()
