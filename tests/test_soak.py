"""Long-crawl maintenance soak (VERDICT r3 #5): 100+ thin politeness
iterations with compaction + snapshot/checkpoint expiry + orphan GC active.

Asserts the lifecycle invariants a multi-day crawl depends on:
- on-disk parquet file count stays FLAT (no per-iteration growth trend),
- the manifest and checkpoint set stay bounded,
- a mid-soak kill/resume replays the identical crawl,
- per-iteration wall time has no growth trend (loose bound — wall noise on
  a shared VM is real; the hard flatness evidence is the file counts).
"""

from __future__ import annotations

import os

from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.plans.engine import CrawlEngine
from crusty_core_spark.sources.datagen import CorpusSpec, gen_corpus

from tests.conftest import pages_df


def _parquet_files(wd: str) -> int:
    return sum(
        1
        for dirpath, _dirs, names in os.walk(wd)
        for n in names
        if n.endswith(".parquet")
    )


def _cfg():
    # politeness mode with concurrency 1 → one page per host per iteration
    # → a long thin crawl; tight compaction + retention so the lifecycle
    # machinery fires constantly
    return CrawlConfig(
        delay_ms=1000,
        concurrency_per_host=1,
        compact_max_files=4,
        snapshot_keep=4,
        max_iterations=200,
        page_budget=None,
        links_per_page_budget=None,
    )


def test_long_crawl_soak_flat(spark, workdir):
    spec = CorpusSpec(n_hosts=2, base_pages_per_host=110, seed=5,
                      links_per_page=4)
    rows, seeds = gen_corpus(spec)

    import time

    eng = CrawlEngine(spark, pages_df(spark, rows), workdir + "/soak", _cfg())
    eng.seed(seeds)
    files_at: dict[int, int] = {}
    walls: list[float] = []
    it = 0
    while eng.pending_count() > 0 and it < 200:
        t0 = time.time()
        eng.step()
        walls.append(time.time() - t0)
        it += 1
        if it % 25 == 0:
            files_at[it] = _parquet_files(workdir + "/soak")
    eng.flush_metrics()
    assert it >= 100, f"soak too short: {it} iterations"

    # --- file counts FLAT: the second half of the crawl must not grow the
    # on-disk file population (compaction + orphan GC keep it bounded)
    counts = [files_at[k] for k in sorted(files_at)]
    assert max(counts[len(counts) // 2:]) <= max(counts[: len(counts) // 2]) + 10, counts

    # --- manifest bounded: each table retains <= snapshot_keep snapshots,
    # checkpoint set <= keep+1
    for name, t in eng.io._manifest["tables"].items():
        assert len(t["snapshots"]) <= 4 + 1, (name, len(t["snapshots"]))
    assert len(eng.io.list_checkpoints()) <= 5

    # --- wall flatness (loose: shared-VM noise is real): median of the
    # last 30 thin iterations within 3x of the first 30's median
    import statistics

    first, last = walls[5:35], walls[-30:]
    assert statistics.median(last) <= 3 * statistics.median(first) + 0.25, (
        statistics.median(first), statistics.median(last)
    )


def test_soak_kill_resume_identical(spark, workdir):
    """Kill at iteration 60 of the same soak (past several compaction/
    expiry/GC rounds) and resume: the finished crawl must be identical to
    an uninterrupted one."""
    spec = CorpusSpec(n_hosts=2, base_pages_per_host=60, seed=5,
                      links_per_page=4)
    rows, seeds = gen_corpus(spec)

    base = CrawlEngine(spark, pages_df(spark, rows), workdir + "/base", _cfg())
    base.seed(seeds)
    base.run()

    eng = CrawlEngine(spark, pages_df(spark, rows), workdir + "/kill", _cfg())
    eng.seed(seeds)
    for _ in range(60):
        if eng.pending_count() == 0:
            break
        eng.step()
    # "kill": drop the object, resume from the last checkpoint
    res = CrawlEngine.resume(spark, pages_df(spark, rows), workdir + "/kill")
    res.run()

    def state(e):
        log = sorted(
            tuple(r) for r in e.io.read("fetch_log").select(
                "iter", "job_id", "task_seq", "url", "action"
            ).collect()
        )
        seen = sorted(
            (r["job_id"], r["url"]) for r in e.url_seen_df().collect()
        )
        return log, seen

    assert state(base) == state(res)
