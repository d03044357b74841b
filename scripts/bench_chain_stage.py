"""Isolate the chain cogroup stage: time run_chain_stage on a dumped
iter-3 input at N vs 4N executor topologies.

Phase 1 (local[16]): generate the profile corpus, run the crawl with
SPARK_CRAWL_DUMP_CHAIN so each iteration's chain_input/job_state land on
tmpfs. Phase 2: for each topology, read the dumped frames and time ONLY
chain_out.count() (warmup + 3 timed reps), plus a per-bucket row histogram
so skew is visible.

Usage: python scripts/bench_chain_stage.py [n_hosts] [ppg] [iter]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from bench_scaling import EXEC_CORES, EXEC_HEAP_MB, EXEC_MEM_MB  # noqa: E402

SHM = "/dev/shm/crusty_chainbench"

RUNNER = r"""
import sys, time, os
sys.path.insert(0, "/root/repo")
from crusty_core_spark.session import get_spark
from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.operators.chain_stage import run_chain_stage

n_exec, shm, it = sys.argv[1:4]
exec_cores = int(os.environ["SCALE_EXEC_CORES"])
cores = int(n_exec) * exec_cores
spark = get_spark(
    app_name="chain%sx%s" % (n_exec, exec_cores),
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
ci = spark.read.parquet("%s/dump/chain_input_it%s" % (shm, it)).persist()
js = spark.read.parquet("%s/dump/job_state_it%s" % (shm, it)).persist()
print("ROWS ci=%d js=%d" % (ci.count(), js.count()), flush=True)
cfg = CrawlConfig(fetch_log_detail=False, sched_log_detail=False)
trivial = os.environ.get("CHAINBENCH_TRIVIAL")
if trivial:
    # no-op fold: isolates the cogroup exchange + Arrow crossing floor
    # from the fold compute (the VERDICT r4 #2 target metric)
    import pandas as pd
    import crusty_core_spark.operators.chain_stage as CS

    def _noop(cfg_, filters=(), drain=False):
        def fn(key, left, right):
            return pd.DataFrame(
                {c: [] for c in CS.CHAIN_OUT_COLS})
        return fn
    CS_make = CS.make_chain_fn
    CS.make_chain_fn = _noop
for rep in range(4):
    t0 = time.time()
    n = run_chain_stage(ci, js, cfg).count()
    tag = "warm" if rep == 0 else "timed"
    print("CHAIN%s %s n_exec=%s rep=%d out=%d wall=%.2f"
          % ("-TRIVIAL" if trivial else "", tag, n_exec, rep, n,
             time.time() - t0), flush=True)
spark.stop()
"""


def main():
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    ppg = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    it = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    if not os.path.exists(f"{SHM}/dump/chain_input_it{it}"):
        shutil.rmtree(SHM, ignore_errors=True)
        os.makedirs(f"{SHM}/dump", exist_ok=True)
        import tempfile

        from crusty_core_spark.config import CrawlConfig
        from crusty_core_spark.plans.engine import CrawlEngine
        from crusty_core_spark.session import get_spark
        from crusty_core_spark.sources.datagen import (
            CorpusSpec, gen_pages_spark, host_name,
        )

        os.environ["SPARK_CRAWL_DUMP_CHAIN"] = f"{SHM}/dump"
        spec = CorpusSpec(n_hosts=n_hosts, base_pages_per_host=ppg,
                          links_per_page=20, words_per_page=400,
                          zipf_hot_host_factor=20, seed=42)
        spark = get_spark(app_name="chain_gen", master="local[16]",
                          shuffle_partitions=16)
        pages = gen_pages_spark(spark, spec).persist()
        print(f"corpus: {pages.count()} pages", flush=True)
        eng = CrawlEngine(
            spark, pages, tempfile.mkdtemp(dir=SHM, prefix="wd_"),
            CrawlConfig(fetch_log_detail=False, sched_log_detail=False))
        eng.seed([(j, "http://%s/" % host_name(spec, j))
                  for j in range(n_hosts)])
        eng.run(max_iterations=it + 1)
        spark.stop()
        del os.environ["SPARK_CRAWL_DUMP_CHAIN"]

    # bucket histogram (rows per cogroup key) — is the fold skewed?
    import duckdb
    from crusty_core_spark.operators.chain_stage import N_JOB_BUCKETS

    con = duckdb.connect()
    hist = con.execute(
        f"""SELECT job_id % {N_JOB_BUCKETS} AS b, count(*) AS n
        FROM read_parquet('{SHM}/dump/chain_input_it{it}/*.parquet')
        GROUP BY b ORDER BY n DESC LIMIT 8"""
    ).fetchall()
    tot = con.execute(
        f"SELECT count(*) FROM read_parquet('{SHM}/dump/chain_input_it{it}/*.parquet')"
    ).fetchone()[0]
    print(f"chain_input rows={tot}; top buckets (of {N_JOB_BUCKETS}): {hist}",
          flush=True)
    hot = con.execute(
        f"""SELECT job_id, count(*) AS n
        FROM read_parquet('{SHM}/dump/chain_input_it{it}/*.parquet')
        GROUP BY job_id ORDER BY n DESC LIMIT 5"""
    ).fetchall()
    print(f"hottest jobs: {hot}", flush=True)

    for n_exec, cpus in ((1, "0-3"), (4, "0-15")):
        print(f"===== {n_exec} executor(s) (taskset {cpus}) =====", flush=True)
        out = subprocess.run(
            ["taskset", "-c", cpus, sys.executable, "-c", RUNNER,
             str(n_exec), SHM, str(it)],
            capture_output=True, text=True, timeout=3600,
            env={**os.environ,
                 "SCALE_EXEC_CORES": str(EXEC_CORES),
                 "SCALE_EXEC_MEM_MB": str(EXEC_MEM_MB),
                 "SCALE_EXEC_HEAP_MB": str(EXEC_HEAP_MB)},
        )
        for ln in out.stdout.splitlines():
            if ln.startswith(("ROWS", "CHAIN")):
                print(ln, flush=True)
        if "CHAIN timed" not in out.stdout:
            print(out.stdout[-1500:])
            print(out.stderr[-2500:])


if __name__ == "__main__":
    main()
