"""Hot-key (pathological skew) coverage for the politeness ready-selection.

The crawl-parity suite pins salted == plain semantics on a small zipf
corpus; this suite pins the PATHOLOGICAL regime the 100x-scale frontier
has — one host holding a deep due set — on the factored-out
plans/engine.politeness_select: exact selection equality between the
salted two-phase top-k and the plain window rank on a 60k-row one-host
frontier, the physical two-window plan shape, and the leftover-set
bookkeeping. Task-runtime balance at the 1M-row regime is measured by
scripts/bench_skew.py (BENCH.md note) — per-task timing needs the event
log, which the shared test session doesn't carry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.plans.engine import politeness_select


def _frontier(spark, hot_rows=60_000, cold_hosts=40):
    hot = spark.range(hot_rows).select(
        F.lit(0).alias("job_id"), F.col("id").alias("task_seq"),
        F.concat(F.lit("http://hot.example/p"),
                 F.col("id").cast("string")).alias("url"),
        F.lit("hot.example").alias("host"),
        F.lit(1).alias("depth"), F.lit(0).alias("redirect"),
        F.lit("Follow").alias("target"), F.lit(0).alias("marker"),
        F.lit("").alias("rel"), F.lit("").alias("alt"),
        F.lit("").alias("text"),
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).cast("long").alias("parent_seq"),
        (F.col("id") % 997).cast("int").alias("link_pos"),
        # mixed priorities so the (priority, task_seq) order is exercised
        (F.col("id") % 3).cast("int").alias("priority"),
        # a third of the hot rows are not yet due
        F.when(F.col("id") % 3 == 2, F.lit(9))
        .otherwise(F.lit(1)).cast("long").alias("next_fetch_iter"),
        F.lit(0).cast("long").alias("added_iter"),
    )
    cold = spark.range(cold_hosts * 5).select(
        (F.col("id") % cold_hosts + 1).alias("job_id"),
        F.col("id").alias("task_seq"),
        F.concat(F.lit("http://c"),
                 (F.col("id") % cold_hosts + 1).cast("string"),
                 F.lit(".example/p"),
                 F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("c"), (F.col("id") % cold_hosts + 1).cast("string"),
                 F.lit(".example")).alias("host"),
        F.lit(1).alias("depth"), F.lit(0).alias("redirect"),
        F.lit("Follow").alias("target"), F.lit(0).alias("marker"),
        F.lit("").alias("rel"), F.lit("").alias("alt"),
        F.lit("").alias("text"),
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).cast("long").alias("parent_seq"),
        (F.col("id") % 997).cast("int").alias("link_pos"),
        F.lit(0).alias("priority"),
        F.lit(1).cast("long").alias("next_fetch_iter"),
        F.lit(0).cast("long").alias("added_iter"),
    )
    return hot.unionByName(cold)


def test_salted_selection_identical_on_hot_frontier(spark):
    pending = _frontier(spark).persist()
    try:
        n = pending.count()
        cfg_s = CrawlConfig(delay_ms=1000, concurrency_per_host=3,
                            hot_host_salt_threshold=10)
        cfg_p = CrawlConfig(delay_ms=1000, concurrency_per_host=3,
                            hot_host_salt_threshold=None)
        ready_s, rem_s = politeness_select(pending, 1, cfg_s, n)
        ready_p, rem_p = politeness_select(pending, 1, cfg_p, n)
        sel_s = sorted(tuple(r) for r in ready_s.collect())
        sel_p = sorted(tuple(r) for r in ready_p.collect())
        assert sel_s == sel_p
        # top-3 per (job, host) by (priority, task_seq): the hot host's
        # due rows (id%3 != 2) sort priority-0 first (id%3==0), so the
        # top 3 are task_seq 0, 3, 6
        hot_sel = [t for t in sel_s if t[0] == 0]
        assert len(hot_sel) == 3
        assert [t[1] for t in hot_sel] == [0, 3, 6]
        # nothing lost: ready + remaining == pending, disjoint
        assert len(sel_s) + rem_s.count() == n
        assert rem_s.count() == rem_p.count()
        # the salted plan is the two-phase one: two window rank nodes vs
        # one in the plain plan (pin the physical rewrite)
        def n_windows(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            # AQE prints the final plan followed by "== Initial Plan ==";
            # count window nodes in the final section only
            plan = plan.split("== Initial Plan ==")[0]
            return sum(
                1 for ln in plan.splitlines()
                if ln.lstrip(" +-:*(0123456789)").startswith("Window [")
            )
        assert n_windows(ready_s) == 2
        assert n_windows(ready_p) == 1
    finally:
        pending.unpersist()
