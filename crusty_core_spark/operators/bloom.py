"""Partitioned Bloom-filter URL-seen shards (north_star dedup fast path).

The reference keeps the seen-set as one in-process HashSet
(main/src/task_filters.rs:181-211). At a 10^10-URL frontier the exact set is
an Iceberg table — but anti-joining EVERY candidate against it each
iteration shuffles the full candidate volume. The Bloom shards cut that:

- ``url_seen_shards`` table: one row per shard — (shard_id, bitset binary,
  n_items). Sharding key = host-hash bucket, so a host's URLs live in one
  shard and candidate links (mostly same-host) co-partition with it.
- bit positions are computed JVM-side (xxhash64 with k salts — no Python in
  the hash path); the per-shard set/test runs in numpy inside
  cogroup-applyInPandas, one group per shard.
- probe semantics: maybe_seen=False is DEFINITELY unseen (Bloom guarantees
  no false negatives) → skips the exact join; maybe_seen=True falls through
  to the exact url_seen anti-join (the correctness backstop).

Why not ``df.stat.bloomFilter``: it builds driver-side, is not incrementally
mergeable across iterations, and cannot be selectively updated per shard.

Sizing: bits_per_shard=2^20 and n_shards=64 (defaults) hold ~10^6 URLs at
<1% false-positive with k=5; at 10^10 scale, n_shards scales out (2^14
shards × 16 MiB ≈ 256 GiB of bitset spread across the cluster — each
iteration touches only the shards whose hosts are active).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crusty_core_spark.sources.tables import TableIO

SHARDS_TABLE = "url_seen_shards"
SHARD_SCHEMA = "shard_id int, bitset binary, n_items long"


def shard_id_col(host: F.Column, n_shards: int) -> F.Column:
    return F.pmod(F.xxhash64(host), F.lit(n_shards)).cast("int")


def positions_col(job_id, url, num_hashes: int, n_bits: int) -> F.Column:
    """k bit positions per (job_id, url), computed JVM-side."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), job_id, url), F.lit(n_bits)).cast("long")
            for i in range(num_hashes)
        ]
    )


def _empty_bitset(n_bits: int) -> bytes:
    return bytes(n_bits // 8)


def probe(
    cands: DataFrame,
    io: TableIO,
    cfg,
    host_col: str = "host",
) -> DataFrame:
    """Adds a ``maybe_seen`` boolean column to ``cands``.

    One shuffle keyed by shard_id; each shard's bitset is loaded once per
    group and probed vectorized."""
    n_bits = cfg.bloom_bits_per_shard
    probe_in = cands.withColumn(
        "_shard", shard_id_col(F.col(host_col), cfg.n_bloom_shards)
    ).withColumn(
        "_pos", positions_col(F.col("job_id"), F.col("url"),
                              cfg.bloom_num_hashes, n_bits)
    )
    if not io.exists(SHARDS_TABLE):
        return cands.withColumn("maybe_seen", F.lit(False))
    shards = io.read(SHARDS_TABLE)
    out_schema = probe_in.drop("_shard", "_pos").schema.add("maybe_seen", "boolean")
    cols = [f.name for f in out_schema.fields]

    # fast path: shards small enough to broadcast → probe without a shuffle
    # (at 10^10 scale the shards outgrow this and the cogroup path below
    # co-partitions candidates with their shard instead)
    total_bytes = cfg.n_bloom_shards * (n_bits // 8)
    if total_bytes <= 64 * 1024 * 1024:
        blobs = {
            int(r["shard_id"]): np.frombuffer(bytes(r["bitset"]), dtype=np.uint8)
            for r in shards.collect()
        }
        bc = io.spark.sparkContext.broadcast(blobs)

        def probe_map(batches):
            local = bc.value
            for pdf in batches:
                flags = []
                for sid, pos in zip(pdf["_shard"].tolist(), pdf["_pos"]):
                    bits = local.get(int(sid))
                    if bits is None:
                        flags.append(False)
                        continue
                    p = np.asarray(pos, dtype=np.int64)
                    flags.append(bool(((bits[p >> 3] >> (p & 7)) & 1).all()))
                out = pdf.drop(columns=["_shard", "_pos"])
                out["maybe_seen"] = flags
                yield out[cols]

        return probe_in.mapInPandas(probe_map, schema=out_schema)

    def fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(columns=cols)
        if len(right) == 0:
            out = left.drop(columns=["_shard", "_pos"])
            out["maybe_seen"] = False
            return out[cols]
        bits = np.frombuffer(bytes(right.iloc[0]["bitset"]), dtype=np.uint8)
        flags = []
        for pos in left["_pos"]:
            p = np.asarray(pos, dtype=np.int64)
            flags.append(bool(((bits[p >> 3] >> (p & 7)) & 1).all()))
        out = left.drop(columns=["_shard", "_pos"])
        out["maybe_seen"] = flags
        return out[cols]

    return (
        probe_in.groupBy("_shard")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(fn, schema=out_schema)
    )


def update(
    accepted: DataFrame,
    io: TableIO,
    cfg,
    host_col: str = "host",
) -> None:
    """OR the accepted URLs' bits into their shards (incremental merge)."""
    n_bits = cfg.bloom_bits_per_shard
    upd = accepted.select(
        shard_id_col(F.col(host_col), cfg.n_bloom_shards).alias("shard_id"),
        positions_col(F.col("job_id"), F.col("url"),
                      cfg.bloom_num_hashes, n_bits).alias("_pos"),
    )
    if io.exists(SHARDS_TABLE):
        shards = io.read(SHARDS_TABLE)
    else:
        shards = io.spark.createDataFrame([], SHARD_SCHEMA)

    def fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        sid = int(key[0])
        if len(right):
            bits = np.frombuffer(
                bytes(right.iloc[0]["bitset"]), dtype=np.uint8
            ).copy()
            n = int(right.iloc[0]["n_items"])
        else:
            bits = np.zeros(n_bits // 8, dtype=np.uint8)
            n = 0
        for pos in left["_pos"]:
            p = np.asarray(pos, dtype=np.int64)
            np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
        return pd.DataFrame(
            [{"shard_id": sid, "bitset": bits.tobytes(), "n_items": n + len(left)}]
        )

    touched = (
        upd.groupBy("shard_id")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(fn, schema=SHARD_SCHEMA)
    )
    untouched = shards.join(
        upd.select(F.col("shard_id")).distinct(), "shard_id", "left_anti"
    )
    io.overwrite(SHARDS_TABLE, untouched.unionByName(touched))


def dedup_flag(
    cands: DataFrame,
    io: TableIO,
    cfg,
    url_seen: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """seen_global via Bloom prefilter + exact backstop.

    definitely-unseen rows (Bloom negative) skip the exact join entirely;
    only Bloom-positive rows probe the url_seen table."""
    probed = probe(cands, io, cfg, host_col)
    neg = probed.filter(~F.col("maybe_seen")).withColumn(
        "seen_global", F.lit(False)
    )
    pos = (
        probed.filter(F.col("maybe_seen"))
        .join(
            url_seen.select("job_id", "url", F.lit(True).alias("_hit")),
            on=["job_id", "url"],
            how="left",
        )
        .withColumn("seen_global", F.coalesce(F.col("_hit"), F.lit(False)))
        .drop("_hit")
    )
    return neg.unionByName(pos).drop("maybe_seen")
