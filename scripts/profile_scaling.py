"""Per-phase N-vs-4N profile probe (diagnostic, not the official bench).

Runs the bench_scaling crawl at both executor topologies with
SPARK_CRAWL_PROFILE=2 (deep barriers) and prints the per-iteration phase
deltas side by side, so optimization targets the measured laggards
(BENCH.md round-2 profile: fetch+classify 1.55x, commit 1.50x).

Usage: python scripts/profile_scaling.py [n_hosts] [ppg] [max_iters]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from bench_scaling import EXEC_CORES, EXEC_HEAP_MB, EXEC_MEM_MB  # noqa: E402

SHM = "/dev/shm/crusty_prof"

RUNNER = r"""
import sys, json, time, tempfile, os
sys.path.insert(0, "/root/repo")
from crusty_core_spark.session import get_spark
from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.plans.engine import CrawlEngine
from crusty_core_spark.sources.datagen import CorpusSpec, host_name

n_exec, pages_path, shm, n_hosts, max_iters = sys.argv[1:6]
exec_cores = int(os.environ["SCALE_EXEC_CORES"])
cores = int(n_exec) * exec_cores
spark = get_spark(
    app_name="prof%sx%s" % (n_exec, exec_cores),
    master="local-cluster[%s,%s,%s]" % (
        n_exec, exec_cores, os.environ["SCALE_EXEC_MEM_MB"]),
    shuffle_partitions=cores,
    extra_conf={
        "spark.local.dir": shm + "/spark_local%s" % n_exec,
        "spark.executor.memory": "%sm" % os.environ["SCALE_EXEC_HEAP_MB"],
        "spark.executorEnv.PYTHONPATH": "/root/repo",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    },
)
pages = (spark.read.parquet(pages_path)
         .repartition(cores, "url").sortWithinPartitions("url").persist())
pages.count()
spec = CorpusSpec(n_hosts=int(n_hosts), base_pages_per_host=0)
seeds = [(j, "http://%s/" % host_name(spec, j)) for j in range(int(n_hosts))]


def one_run(wd, tag):
    eng = CrawlEngine(spark, pages, wd,
                      CrawlConfig(fetch_log_detail=False,
                                  sched_log_detail=False))
    t0 = time.time()
    eng.seed(seeds)
    eng.run(max_iterations=int(max_iters))
    print("WALL %s %.2f" % (tag, time.time() - t0), flush=True)


# warmup (untimed, profile off for speed)
os.environ["SPARK_CRAWL_PROFILE"] = "0"
one_run(tempfile.mkdtemp(dir=shm, prefix="warm%s_" % n_exec), "warm")
# PROFILE=2 (default): deep barriers — exact per-phase walls, but the
# barriers serialize the plan. PROFILE=1: production plan with coarse
# marks (wave1/commit) — the walls that actually make up the bench.
os.environ["SPARK_CRAWL_PROFILE"] = os.environ.get("PROF_LEVEL", "2")
one_run(tempfile.mkdtemp(dir=shm, prefix="prof%s_" % n_exec), "timed")
"""


def run_level(n_exec: int, cpu_list: str, pages_path: str, n_hosts: int,
              max_iters: int) -> str:
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-c", RUNNER,
         str(n_exec), pages_path, SHM, str(n_hosts), str(max_iters)],
        capture_output=True, text=True, timeout=5400,
        env={**os.environ,
             "SCALE_EXEC_CORES": str(EXEC_CORES),
             "SCALE_EXEC_MEM_MB": str(EXEC_MEM_MB),
             "SCALE_EXEC_HEAP_MB": str(EXEC_HEAP_MB)},
    )
    lines = [ln for ln in out.stdout.splitlines()
             if ln.startswith(("[profile]", "[commit]", "WALL", "[local"))]
    if not any(ln.startswith("WALL timed") for ln in lines):
        raise RuntimeError(f"level {n_exec} failed:\n{out.stdout[-2000:]}\n"
                           f"{out.stderr[-3000:]}")
    return "\n".join(lines)


def main():
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    ppg = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    max_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from crusty_core_spark.session import get_spark
    from crusty_core_spark.sources.datagen import CorpusSpec, gen_pages_spark

    shutil.rmtree(SHM, ignore_errors=True)
    os.makedirs(SHM, exist_ok=True)
    pages_path = os.path.join(SHM, "pages")
    spec = CorpusSpec(n_hosts=n_hosts, base_pages_per_host=ppg,
                      links_per_page=20, words_per_page=400,
                      zipf_hot_host_factor=20, seed=42)
    spark = get_spark(app_name="prof_gen", master="local[32]",
                      shuffle_partitions=32)
    gen_pages_spark(spark, spec).write.mode("overwrite").parquet(pages_path)
    n_pages = spark.read.parquet(pages_path).count()
    spark.stop()
    print(f"corpus: {n_pages} pages / {n_hosts} hosts", flush=True)

    for n_exec, cpus in ((1, "0-3"), (4, "0-15")):
        print(f"\n===== {n_exec} executor(s) x {EXEC_CORES} cores "
              f"(taskset {cpus}) =====", flush=True)
        print(run_level(n_exec, cpus, pages_path, n_hosts, max_iters),
              flush=True)
    shutil.rmtree(SHM, ignore_errors=True)


if __name__ == "__main__":
    main()
