"""User extension point: custom task filters in the chain
(reference CrawlingRules::with_task_filter, crawler.rs:84-93,137-139)."""

from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.plans.engine import CrawlEngine
from crusty_core_spark.sources.datagen import CorpusSpec, gen_corpus

from tests.conftest import pages_df


def test_custom_filter_applies(spark, workdir, tmp_path):
    # defined as a closure so cloudpickle ships it by value (a module-level
    # function in tests/ is pickled by reference and unimportable on workers)
    def skip_private(cand, st):
        """Skip any URL under /private/ (SelectiveTaskFilter-style predicate)."""
        return "skip" if "/private/" in cand.url else "accept"

    spec = CorpusSpec(n_hosts=4, base_pages_per_host=14, seed=42)
    rows, seeds = gen_corpus(spec)
    pages = pages_df(spark, rows)
    cfg = CrawlConfig(robots_txt=False)

    base = CrawlEngine(spark, pages, workdir, cfg)
    base.seed(seeds)
    base.run()
    base_urls = {r.url for r in base.url_seen_df().collect()}
    assert any("/private/" in u for u in base_urls)

    filt = CrawlEngine(spark, pages, str(tmp_path / "f"), cfg,
                       custom_task_filters=(skip_private,))
    filt.seed(seeds)
    filt.run()
    filt_urls = {r.url for r in filt.url_seen_df().collect()}
    assert not any("/private/" in u for u in filt_urls)
    # custom skips are observable in the scheduling log
    assert filt.sched_log_df().filter(
        "filter like 'custom:%'"
    ).count() > 0
    # budget interplay: a custom skip happens AFTER budget consumption
    # (crawler.rs:123-139 order) — jobs consume budget on custom-skipped
    # candidates exactly like on robots-skipped ones
    assert filt_urls.issubset(base_urls)
