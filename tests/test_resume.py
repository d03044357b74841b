"""Kill/resume determinism (north_rule: a killed job resumes with identical
crawl ordering and URL-seen contents)."""

from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.plans.engine import CrawlEngine
from crusty_core_spark.sources.datagen import CorpusSpec, gen_corpus

from tests.conftest import pages_df


def _runs(spark, wd_full, wd_kill):
    spec = CorpusSpec(n_hosts=4, base_pages_per_host=12, seed=77)
    rows, seeds = gen_corpus(spec)
    pages = pages_df(spark, rows)
    cfg = CrawlConfig()

    full = CrawlEngine(spark, pages, wd_full, cfg)
    full.seed(seeds)
    full.run()

    part = CrawlEngine(spark, pages, wd_kill, cfg)
    part.seed(seeds)
    part.step()
    part.step()
    del part  # "kill": all in-memory state gone
    resumed = CrawlEngine.resume(spark, pages, wd_kill)
    assert resumed.cfg == cfg
    resumed.run()
    return full, resumed


def test_resume_identical(spark, workdir, tmp_path):
    full, resumed = _runs(spark, workdir, str(tmp_path / "kill"))

    def order(e):
        return sorted(
            (r.iter, r.job_id, r.task_seq, r.url, r.depth, r.action)
            for r in e.io.read("fetch_log").collect()
        )

    def seen(e):
        return sorted((r.job_id, r.url) for r in e.url_seen_df().collect())

    assert order(full) == order(resumed)
    assert seen(full) == seen(resumed)
    # metrics buffer also restored and flushed
    assert resumed.io.read("metrics").count() == full.io.read("metrics").count()
