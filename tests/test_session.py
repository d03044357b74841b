"""Guards for load-bearing SparkSession defaults (session.py)."""


def test_reduce_locality_disabled(spark):
    # With reduceLocality on (Spark default) the per-iteration fetch SMJ
    # schedules NODE_LOCAL on multi-executor topologies and re-streams the
    # whole cached pages table across process boundaries every iteration
    # (measured 8.6s -> 2.4s per iteration at 4 executors when disabled —
    # see BENCH.md round-3 change #5). A session built by get_spark must
    # keep it off.
    assert spark.conf.get("spark.shuffle.reduceLocality.enabled") == "false"


def test_adaptive_and_arrow_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    )
