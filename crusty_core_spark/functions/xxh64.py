"""Pure-Python xxHash64 matching Spark's ``F.xxhash64`` bit-for-bit.

The engine's Bloom dedup keys every shard id and bit position off
``F.xxhash64`` (operators/bloom.py) so the fast membership path stays
JVM-side. The driver-local iteration path (plans/engine.py `_step_local`)
must place the SAME urls in the SAME shards/bits without launching a Spark
job — so this module reimplements the public xxHash64 algorithm (Yann
Collet, BSD) with Spark's composition rules:

- the expression starts from seed 42 and folds each child value in turn,
  using the running hash as the seed for the next child;
- LongType  → XXH64 of the single 8-byte block (specialized ``hash_long``);
- IntegerType → specialized 4-byte path (``hash_int``);
- StringType → XXH64 over the UTF-8 bytes (little-endian word reads);
- null children are skipped.

Equivalence against the JVM implementation is pinned by
tests/test_fastpath.py::test_xxhash64_matches_spark.
"""

from __future__ import annotations

_M = (1 << 64) - 1  # u64 wrap

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: XXH64 of one 8-byte little-endian block."""
    value &= _M
    h = (seed + P5 + 8) & _M
    h ^= (_rotl((value * P2) & _M, 31) * P1) & _M
    h = ((_rotl(h, 27) * P1) + P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: specialized 4-byte path."""
    h = (seed + P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * P1) & _M
    h = ((_rotl(h, 23) * P2) + P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Spark XXH64.hashUnsafeBytes (the standard xxHash64 over a buffer)."""
    length = len(data)
    off = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while off + 32 <= length:
            for i, v in enumerate((v1, v2, v3, v4)):
                w = int.from_bytes(data[off + 8 * i : off + 8 * i + 8], "little")
                v = (v + w * P2) & _M
                v = (_rotl(v, 31) * P1) & _M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & _M, 31) * P1) & _M
            h = ((h * P1) + P4) & _M
    else:
        h = (seed + P5) & _M
    h = (h + length) & _M
    # 8-byte words of the tail
    while off + 8 <= length:
        w = int.from_bytes(data[off : off + 8], "little")
        h ^= (_rotl((w * P2) & _M, 31) * P1) & _M
        h = ((_rotl(h, 27) * P1) + P4) & _M
        off += 8
    # one 4-byte word
    if off + 4 <= length:
        w = int.from_bytes(data[off : off + 4], "little")
        h ^= (w * P1) & _M
        h = ((_rotl(h, 23) * P2) + P3) & _M
        off += 4
    # remaining bytes
    while off < length:
        h ^= (data[off] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        off += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*values, seed: int = 42) -> int:
    """``F.xxhash64(*cols)`` equivalent; returns the signed 64-bit result.

    Each value is folded left-to-right with the running hash as seed.
    Python ``int`` → Spark LongType, ``("int", i)`` tuple → IntegerType,
    ``str`` → StringType (UTF-8), ``bytes`` → BinaryType, None skipped —
    matching how the engine's Bloom expressions type their children."""
    h = seed & _M
    for v in values:
        if v is None:
            continue
        if isinstance(v, tuple) and v[0] == "int":
            h = hash_int(int(v[1]), h)
        elif isinstance(v, bool):
            raise TypeError("boolean children not needed/supported")
        elif isinstance(v, int):
            h = hash_long(v, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = hash_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported xxhash64 child: {type(v)}")
    return _to_signed(h)


def pmod(h: int, n: int) -> int:
    """Spark's pmod (non-negative modulus) over the signed hash."""
    return h % n if h >= 0 else (h % n + n) % n


def bloom_shard_id(host: str, n_shards: int) -> int:
    """Python twin of operators/bloom.shard_id_col."""
    return pmod(xxhash64(host), n_shards)


def bloom_positions(job_id: int, url: str, num_hashes: int, n_bits: int):
    """Python twin of operators/bloom.positions_col."""
    return [
        pmod(xxhash64(("int", i), job_id, url), n_bits)
        for i in range(num_hashes)
    ]
