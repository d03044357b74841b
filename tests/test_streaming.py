"""Streaming consumer over the crawl's fetch_log (JobUpdate-stream analogue)."""

import time

from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.plans.engine import CrawlEngine
from crusty_core_spark.sources.datagen import CorpusSpec, gen_corpus
from crusty_core_spark.streaming.stream import duplicate_titles, fetch_log_stream

from tests.conftest import pages_df


def test_fetch_log_streamable_and_dup_titles(spark, workdir):
    spec = CorpusSpec(n_hosts=3, base_pages_per_host=10, seed=5)
    rows, seeds = gen_corpus(spec)
    eng = CrawlEngine(spark, pages_df(spark, rows), workdir, CrawlConfig())
    eng.seed(seeds)
    eng.run(max_iterations=4)

    stream = fetch_log_stream(spark, workdir)
    assert stream.isStreaming
    agg = duplicate_titles(stream, min_count=1)
    q = (
        agg.writeStream.format("memory")
        .queryName("dup_titles_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dup_titles_test").collect()
    assert len(out) > 0
    # batch ground truth agrees
    batch = duplicate_titles(eng.io.read("fetch_log"), min_count=1).count()
    assert len(out) == batch
