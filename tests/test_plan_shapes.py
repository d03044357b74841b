"""Physical-plan regression pins for the expensive queries (VERDICT r3 #4).

Bench-to-bench timing noise on this VM repeatedly raised "did q16/q33
regress?" questions that plan audits then answered with "the plan is
unchanged". These tests pin the load-bearing plan shapes directly so a
future edit that silently degrades them fails fast, and timing noise stops
consuming review cycles:

- q16 (MinHash-LSH): the doc→signature relation is persisted (InMemoryScan
  appears on BOTH self-join sides — the signature subtree computes once,
  not inlined 2× into the join), the join is an equi-join on band_key, and
  there is no CartesianProduct / BroadcastNestedLoopJoin anywhere.
- q33 (IVF probe): the probe is an equi-join on bucket (broadcast of the
  tiny query side), never a cross join; exactly one scan of the big
  embeddings relation feeds the probe side.
- the crawl fetch join: pages-side scan is column-pruned to the 6 engine
  columns (no html over-read of non-engine columns like text/lang).
"""

import pandas as pd
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=60):
    rows = [
        (i, f"doc {i} " + " ".join(f"w{(i * 7 + j) % 13}" for j in range(12)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_plan_shape(spark):
    from crusty_core_spark.functions.dedup_fns import lsh_candidate_pairs

    df = _docs(spark)
    pairs = lsh_candidate_pairs(df, "doc_id", "text")
    plan = _plan(pairs)
    try:
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the persisted signature relation feeds BOTH self-join sides
        assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
        # banded self-join is an equi-join on the band key
        assert "band_key" in plan
        # sanity: still produces rows (the shape pin must not fork semantics)
        assert pairs.count() > 0
    finally:
        spark.catalog.clearCache()


def test_ivf_probe_plan_shape(spark):
    from crusty_core_spark.functions.vectors import ivf_probe_topk

    import numpy as np

    rng = np.random.RandomState(7)
    vecs = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(40),
                "embedding": [rng.rand(8).tolist() for _ in range(40)],
            }
        ),
        "vec_id long, embedding array<double>",
    )
    cents = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    queries = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = ivf_probe_topk(vecs, queries, cents, k=3)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    # the probe itself is an equi-join on bucket; the only nested-loop join
    # allowed is the tiny centroids×queries assignment (bounded by C×Q)
    assert "bucket" in plan
    assert "BroadcastHashJoin" in plan
    assert out.count() > 0


def test_fetch_join_column_pruning(spark):
    """The fetch equi-join must prune the pages scan to the engine columns:
    a pages table carrying fat non-engine columns (text, lang) must not
    read them (SURVEY scale note: a scan reading all columns for a 6-column
    join is wrong at 100 TB)."""
    import tempfile

    from crusty_core_spark.config import CrawlConfig
    from crusty_core_spark.plans.engine import PAGE_COLS, CrawlEngine

    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["http://a.example/"],
                "html": [b"<html></html>"],
                "status": [200],
                "location": [None],
                "content_type": ["text/html"],
                "content_encoding": [None],
                "text": ["fat column"],
                "lang": ["en"],
            }
        ),
        "url string, html binary, status int, location string, "
        "content_type string, content_encoding string, text string, "
        "lang string",
    )
    eng = CrawlEngine(
        spark, pages, tempfile.mkdtemp(prefix="planshape_"), CrawlConfig()
    )
    # engine constructor prunes to the engine columns before any join
    assert set(eng.pages.columns) == set(PAGE_COLS)
    ready = spark.createDataFrame(
        pd.DataFrame({"url": ["http://a.example/"], "resolve_failed": [False],
                      "target": ["Follow"]}),
        "url string, resolve_failed boolean, target string",
    )
    plan = _plan(eng._fetch_stage(ready))
    # neither fat column's attribute reference appears anywhere in the
    # physical plan — the scan never reads them
    assert "lang#" not in plan
    assert "text#" not in plan
