"""Bloom-shard dedup properties: NO false negatives ever; flag equivalence
with the exact path."""

from pyspark.sql import functions as F

from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.operators import bloom
from crusty_core_spark.sources.tables import TableIO


def _df(spark, rows):
    return spark.createDataFrame(rows, "job_id long, url string, host string")


def test_no_false_negatives_and_backstop(spark, workdir):
    cfg = CrawlConfig(n_bloom_shards=8, bloom_bits_per_shard=1 << 14)
    io = TableIO(spark, workdir)
    seen_rows = [
        (j, f"http://h{j % 5}.x/p{i}", f"h{j % 5}.x")
        for j in range(3)
        for i in range(200)
    ]
    seen = _df(spark, seen_rows)
    bloom.update(seen, io, cfg)
    io.append_partitions(
        "url_seen",
        seen.select(
            "job_id", "url", F.lit(0).cast("long").alias("added_iter"),
            bloom.shard_id_col(F.col("host"), cfg.n_bloom_shards).alias("shard"),
        ),
        "shard",
    )

    cand_rows = seen_rows[::7] + [
        (j, f"http://h{j % 5}.x/new{i}", f"h{j % 5}.x")
        for j in range(3)
        for i in range(100)
    ]
    cands = _df(spark, cand_rows)

    probed = bloom.probe(cands, io, cfg)
    flags = {(r.job_id, r.url): r.maybe_seen for r in probed.collect()}
    truly_seen = set((j, u) for j, u, _ in seen_rows)
    for (j, u), maybe in flags.items():
        if (j, u) in truly_seen:
            assert maybe, f"FALSE NEGATIVE for {(j, u)}"

    # dedup_flag == exact-join ground truth (backstop kills false positives)
    stats: dict = {}
    flagged = bloom.dedup_flag(cands, io, cfg, stats=stats)
    got = {(r.job_id, r.url): r.seen_global for r in flagged.collect()}
    for (j, u), sg in got.items():
        assert sg == ((j, u) in truly_seen)
    # the exact backstop must have pruned its scan to the positive shards
    assert 0 < stats["dedup_shards_read"] <= cfg.n_bloom_shards
    assert stats["dedup_read_bytes"] > 0


def test_incremental_update_merges(spark, workdir):
    cfg = CrawlConfig(n_bloom_shards=4, bloom_bits_per_shard=1 << 12)
    io = TableIO(spark, workdir)
    bloom.update(_df(spark, [(1, "http://a.x/1", "a.x")]), io, cfg)
    bloom.update(_df(spark, [(1, "http://a.x/2", "a.x")]), io, cfg)
    probed = bloom.probe(
        _df(spark, [(1, "http://a.x/1", "a.x"), (1, "http://a.x/2", "a.x")]),
        io, cfg,
    )
    assert all(r.maybe_seen for r in probed.collect())
    shards = {r.shard_id: r.n_items for r in io.read(bloom.SHARDS_TABLE).collect()}
    assert sum(shards.values()) == 2


def test_update_leaves_untouched_shards_byte_identical(spark, workdir):
    """Partition-level shard commit: an update touching one host must not
    rewrite the other shards' files."""
    import os

    cfg = CrawlConfig(n_bloom_shards=8, bloom_bits_per_shard=1 << 12)
    io = TableIO(spark, workdir)
    many = _df(
        spark,
        [(1, f"http://h{i}.x/p", f"h{i}.x") for i in range(40)],
    )
    bloom.update(many, io, cfg)

    def files():
        out = {}
        base = os.path.join(workdir, bloom.SHARDS_TABLE)
        for dirpath, _, names in os.walk(base):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(dirpath, n)
                    out[os.path.relpath(p, base)] = (
                        os.path.getmtime(p), os.path.getsize(p)
                    )
        return out

    before = files()
    one = _df(spark, [(2, "http://h0.x/new", "h0.x")])
    bloom.update(one, io, cfg)
    after = files()
    for rel, meta in before.items():
        assert after[rel] == meta  # old files untouched (append-only dirs)
    # and the touched shard's probe still sees both generations
    probed = bloom.probe(
        _df(spark, [(2, "http://h0.x/new", "h0.x"),
                    (1, "http://h0.x/p", "h0.x")]),
        io, cfg,
    )
    assert all(r.maybe_seen for r in probed.collect())
