"""Crawl configuration.

Field defaults mirror the reference's defaults so that fixtures generated in
the deterministic regime line up:

- per-host concurrency 2        (reference main/src/config.rs:327)
- politeness delay 1000 ms      (reference main/src/config.rs:329-330; we use
                                 deterministic iteration ticks, no jitter)
- max_response_size 2 MiB       (reference main/src/config.rs:339)
- page_budget 50 / job          (reference main/src/crawler.rs:31)
- links_per_page_budget 50      (reference main/src/crawler.rs:32)
- max_level 10                  (reference main/src/crawler.rs:33)
- max_redirect 5                (reference main/src/crawler.rs:28)
- accepted content types        (reference main/src/crawler.rs:33,145-158)
- www_allow True                (reference main/src/crawler.rs:30)
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class CrawlConfig:
    # politeness / scheduling
    concurrency_per_host: int = 2
    delay_ms: int = 0  # 0 in the deterministic fixture regime
    # filters / budgets
    page_budget: int | None = 50
    links_per_page_budget: int | None = 50
    max_level: int | None = 10
    max_redirect: int = 5
    max_response_size: int = 2 * 1024 * 1024
    accepted_content_types: tuple[str, ...] = ("text/html", "text/plain")
    robots_txt: bool = True
    www_allow: bool = True
    user_agent: str = "spark-crawl/0"
    #: custom request headers sent with every fetch (reference
    #: CrawlingSettings.custom_headers, main/src/config.rs:305-312 —
    #: HashMap<String, Vec<String>>): (name, value) pairs, a name may
    #: repeat (multi-valued). Each pair adds one ``k: v\r\n`` line to the
    #: simulated request head and thus to write_size.
    custom_headers: tuple[tuple[str, str], ...] = ()
    #: soft-timeout drain (task_scheduler.rs:134-157): after this many
    #: iterations the crawl stops EXPANDING (no parse/schedule of new links)
    #: but keeps draining already-scheduled tasks; None = no soft timeout
    soft_timeout_iters: int | None = None
    # live-fetch client timeouts (operators/fetcher.UrllibFetcher), mirroring
    # the reference's NetworkingProfile.connect_timeout (config.rs:186,225 —
    # 5 s) and CrawlingSettings.status_timeout / load_timeout
    # (config.rs:304-305,334-335 — 5 s / 10 s)
    connect_timeout_ms: int = 5_000
    status_timeout_ms: int = 5_000
    load_timeout_ms: int = 10_000
    #: straggler tolerance for the live point-fetch stage (pages=None):
    #: a wall deadline per fetch batch — URLs whose fetch hasn't finished
    #: when it expires are NOT errors; they carry over to the next
    #: iteration's pending frontier (wait_iters keeps counting) and are
    #: then fetched deadline-exempt, so every URL still gets its full
    #: per-task timeout budget eventually. The reference's async per-domain
    #: workers never let one slow host stall other domains
    #: (task_processor.rs:362-398); this is the BSP analogue. None = off
    #: (an iteration waits out its slowest fetch, bounded by the per-task
    #: timeouts). Ignored in pages-join mode, which has no live network.
    fetch_deadline_ms: int | None = None
    # engine
    max_iterations: int = 1000
    use_bloom: bool = True  # Bloom-shard prefilter in front of the exact set
    n_bloom_shards: int = 64
    bloom_bits_per_shard: int = 1 << 20  # 128 KiB per shard at test scale
    bloom_num_hashes: int = 5
    #: pending-frontier size above which the politeness rank switches to the
    #: exact two-phase salted top-k (plans/engine.py step) so one hot
    #: domain's due set cannot pin a whole window partition on one task;
    #: 0/None disables the salted path
    hot_host_salt_threshold: int | None = 10_000
    #: include title/n_links on fetch_log rows (costs two joins per
    #: iteration); crawl ordering/actions are complete either way
    fetch_log_detail: bool = True
    #: thin-iteration fast path: when the pending frontier is at or under
    #: this many rows, the iteration runs driver-local (same kernels — chain
    #: bucket fold, extract/expand, canonicalize, xxhash64 Bloom — one small
    #: Spark job for the pages fetch-join, pyarrow table commits). Tail/thin
    #: iterations otherwise pay multi-stage Spark job latency for hundreds of
    #: rows — the same pathology a 1000-executor cluster has. 0/None disables;
    #: "auto" measures the crossover per session at engine construction
    #: (Spark job floor × local kernel throughput — see
    #: CrawlEngine._calibrate_threshold) instead of trusting a constant
    #: tuned to one machine's driver.
    local_iter_threshold: int | None | str = 20000
    #: fork-pool width for the driver-local path's parallel extract and
    #: per-bucket chain folds (plans/local_step.py). None → min(16, cpus).
    #: 1 disables multiprocessing (always serial kernels).
    local_workers: int | None = None
    #: per-candidate scheduling-decision rows in the chain log. True →
    #: full audit trail (one row per candidate per filter decision); False →
    #: per-bucket action counters only (the 5-10× larger candidate stream
    #: never crosses back out of the chain stage — the big-bench mode)
    sched_log_detail: bool = True
    #: size-triggered compaction for append-only tables (url_seen/chain/
    #: fetch_log/job_log): when a partition's (or an append table's) file
    #: count exceeds this, it is rewritten into one file (TableIO
    #: compact_partitions/compact_appends — the Iceberg rewrite_data_files
    #: analogue). Bounds the per-file open cost that would otherwise grow
    #: one file per touching iteration forever. 0/None disables.
    compact_max_files: int | None = 64
    #: retained history depth: each table keeps its newest N snapshots and
    #: the workdir keeps its newest N checkpoints; older manifest entries
    #: are expired and unreferenced data dirs deleted every iteration
    #: (TableIO expire_snapshots/expire_checkpoints — the Iceberg
    #: expire_snapshots + remove_orphan_files analogue). Without it the
    #: manifest grows O(iterations^2) and is rewritten per commit. Resume
    #: and rollback stay valid within the window. 0/None disables.
    snapshot_keep: int | None = 8
    seed: int = 42

    def resolved_local_workers(self) -> int:
        if self.local_workers is not None:
            return max(1, int(self.local_workers))
        import os

        try:  # respect CPU pinning (taskset) — not the box's total count
            n = len(os.sched_getaffinity(0))
        except AttributeError:
            n = os.cpu_count() or 8
        return min(16, n)

    def to_dict(self) -> dict:
        d = asdict(self)
        d["accepted_content_types"] = list(self.accepted_content_types)
        d["custom_headers"] = [list(p) for p in self.custom_headers]
        return d

    @staticmethod
    def from_dict(d: dict) -> "CrawlConfig":
        d = dict(d)
        d["accepted_content_types"] = tuple(d.get("accepted_content_types", ()))
        d["custom_headers"] = tuple(
            tuple(p) for p in d.get("custom_headers", ())
        )
        return CrawlConfig(**d)


#: The deterministic fixture regime (reference with concurrency=1, delay=0,
#: jitter=0 — the only regime where the reference's crawl order is
#: reproducible; see SURVEY.md §3.3).
FIXTURE_CONFIG = CrawlConfig(concurrency_per_host=1, delay_ms=0)
