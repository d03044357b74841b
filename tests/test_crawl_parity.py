"""End-to-end parity: Spark engine ≡ reference simulator.

The simulator (crusty_core_spark/simulator.py) implements the reference's
crawl semantics in its deterministic regime; the engine must reproduce its
crawl order, URL-seen sets, fetch actions and lineage EXACTLY (north_rule:
"matching the reference's crawl ordering and URL-seen set under the same
seed list + politeness budget").
"""

from __future__ import annotations

import pytest

from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.plans.engine import CrawlEngine
from crusty_core_spark.simulator import ReferenceSimulator
from crusty_core_spark.sources.datagen import CorpusSpec, gen_corpus

from tests.conftest import pages_df


def run_both(spark, workdir, spec: CorpusSpec, cfg: CrawlConfig,
             n_jobs: int | None = None):
    rows, seeds = gen_corpus(spec)
    if n_jobs is not None:
        seeds = seeds[:n_jobs]
    sim = ReferenceSimulator({r["url"]: r for r in rows}, seeds, cfg).run()

    eng = CrawlEngine(spark, pages_df(spark, rows), workdir, cfg)
    eng.seed(seeds)
    eng.run()
    return sim, eng


def crawl_order_engine(eng):
    rows = eng.io.read("fetch_log").collect()
    return sorted(
        (r.iter, r.job_id, r.task_seq, r.url, r.depth, r.redirect, r.marker,
         r.action)
        for r in rows
    )


def crawl_order_sim(sim):
    return sorted(
        (r["iter"], r["job_id"], r["task_seq"], r["url"], r["depth"],
         r["redirect"], r["marker"], r["action"])
        for r in sim.crawl_order
    )


def url_seen_engine(eng):
    out = {}
    for r in eng.url_seen_df().collect():
        out.setdefault(r.job_id, set()).add(r.url)
    return {j: sorted(v) for j, v in out.items()}


def assert_parity(sim, eng):
    assert crawl_order_engine(eng) == crawl_order_sim(sim)
    seen_e = url_seen_engine(eng)
    seen_s = {j: v for j, v in sim.url_seen.items() if v}
    assert seen_e == seen_s
    # lineage parity (url → seed/depth/discovered_by)
    lin_e = sorted(
        (r.job_id, r.url, r.seed_url, r.depth, r.discovered_by)
        for r in eng.lineage_df().collect()
    )
    lin_s = sorted(
        (r["job_id"], r["url"], r["seed_url"], r["depth"], r["discovered_by"])
        for r in sim.lineage
    )
    assert lin_e == lin_s


def test_parity_default_config(spark, workdir):
    """Multi-host corpus exercising redirects, robots modes, dedup, budgets."""
    spec = CorpusSpec(n_hosts=6, base_pages_per_host=14, seed=42)
    sim, eng = run_both(spark, workdir, spec, CrawlConfig())
    order = crawl_order_engine(eng)
    assert len(order) > 20
    assert_parity(sim, eng)


def test_parity_politeness(spark, workdir):
    """delay>0 → per-host per-iteration cap (window-rank ready selection)."""
    spec = CorpusSpec(n_hosts=3, base_pages_per_host=10, seed=7)
    cfg = CrawlConfig(delay_ms=1000, concurrency_per_host=2)
    sim, eng = run_both(spark, workdir, spec, cfg)
    assert_parity(sim, eng)
    # politeness invariant: ≤ k fetches per (job, host) per iteration
    from collections import Counter

    per_iter = Counter(
        (r[0], r[1]) for r in crawl_order_engine(eng)
    )  # (iter, job)
    assert max(per_iter.values()) <= cfg.concurrency_per_host


def test_parity_tight_budgets(spark, workdir):
    """Budget truncation: page budget + links-per-page + depth cutoff."""
    spec = CorpusSpec(n_hosts=4, base_pages_per_host=20, links_per_page=8,
                      seed=11)
    cfg = CrawlConfig(page_budget=7, links_per_page_budget=3, max_level=2)
    sim, eng = run_both(spark, workdir, spec, cfg)
    assert_parity(sim, eng)


def test_parity_no_robots(spark, workdir):
    spec = CorpusSpec(n_hosts=3, base_pages_per_host=10, seed=23)
    cfg = CrawlConfig(robots_txt=False)
    sim, eng = run_both(spark, workdir, spec, cfg)
    assert_parity(sim, eng)


def test_parity_salted_politeness(spark, workdir):
    """Hot-host skew: the salted two-phase politeness top-k (engine step,
    hot_host_salt_threshold) must select the bit-identical ready set as the
    plain window rank — parity vs the simulator on a zipf-skewed corpus,
    with the distributed path forced (local_iter_threshold=0) and the salt
    threshold at 1 so every iteration exercises the salted rank."""
    spec = CorpusSpec(n_hosts=4, base_pages_per_host=8,
                      zipf_hot_host_factor=6, seed=31)
    cfg = CrawlConfig(delay_ms=1000, concurrency_per_host=2,
                      hot_host_salt_threshold=1, local_iter_threshold=0)
    sim, eng = run_both(spark, workdir, spec, cfg)
    assert_parity(sim, eng)
