"""Near-duplicate detection primitives for web-scale corpus curation.

All JVM-side Column expressions (array/lambda higher-order functions — no
Python crossing) with exact DuckDB-SQL twins for the oracle:

- word shingles (k-grams)
- MinHash signatures over md5-hashed shingles (a lexicographic min over
  md5(seed:shingle) hex digests is a valid min-hash family — md5 is identical
  across engines, which makes the oracle byte-exact)
- LSH banding: band key = md5 over the band's minhash slice; candidate pairs
  = docs sharing a band key
- SimHash (16-bit variant): per hex position of md5(token), majority vote of
  high/low nibble → a 16-char bitstring
- n-gram Jaccard similarity via explode + pair aggregation

Scale notes: the LSH pipeline is shuffle-shaped as
  explode(bands) → groupBy(band_key) → pair-join within buckets,
which is the standard way to avoid the O(n²) cross join; bucket sizes are
bounded by the band width. SimHash/MinHash signatures are computed in a
single projection over the tokens array (one pass, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crusty_core_spark.functions.text import tokens


# ---------------------------------------------------------------- shingles

def word_shingles(col: Column, k: int = 2) -> Column:
    """Distinct word k-grams, joined by a single space.

    Built by zipping k shifted slices of the token array — NOT by indexing
    the array inside a lambda: higher-order functions evaluate interpreted,
    and an ``element_at(tokens(col), i)`` in the lambda body re-runs the
    whole split() PER ELEMENT (measured ~10x the cost of the entire minhash
    stage). zip_with evaluates each operand once per row."""
    toks = tokens(col)
    if k == 1:
        return F.array_distinct(toks)
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.array_distinct(grams)


def word_shingles_sql(col: str, k: int = 2) -> str:
    toks = f"string_split_regex(trim({col}), '\\s+')"
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(k))
    return (
        f"list_distinct([{parts} FOR i IN generate_series(1, greatest("
        f"len(toks)-{k - 1}, 0))]) "
    ).replace("toks", toks)


# ---------------------------------------------------------------- minhash

def minhash_signature(shingles: Column, num_hashes: int = 8) -> Column:
    """Array of ``num_hashes`` lexicographic-min md5 digests."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s)))
            )
            for j in range(num_hashes)
        ]
    )


def minhash_signature_sql(shingles: str, num_hashes: int = 8) -> str:
    mins = ", ".join(
        f"list_aggregate([md5('{j}:' || s) FOR s IN {shingles}], 'min')"
        for j in range(num_hashes)
    )
    return f"[{mins}]"


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """One md5 key per band: md5(band_index : minhash slice)."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def lsh_band_keys_sql(signature: str, bands: int, rows_per_band: int) -> str:
    keys = ", ".join(
        "md5(concat_ws('|', '%d', %s))"
        % (b, ", ".join(f"{signature}[{b * rows_per_band + r + 1}]"
                        for r in range(rows_per_band)))
        for b in range(bands)
    )
    return f"[{keys}]"


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 2,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: (id_a < id_b) sharing ≥1 band key.

    Plan shape: projection (signature) → explode (bands) → shuffle on
    band_key → in-bucket self-join → distinct. No cross join anywhere.
    """
    rows_per_band = num_hashes // bands
    # Materialize the signature: without boundaries, CollapseProject
    # re-inlines the full shingle/minhash subtree into every element_at of
    # every band key AND both self-join sides — a Catalyst expression-tree
    # blowup (measured 80x slower). Stage 1 computes the shingle array once
    # (the repartition is an exchange boundary, so the 8 minhash lambdas
    # reference the stored `_sh` attribute instead of 8 inlined copies);
    # stage 2 persists doc->signature so the banded self-join computes the
    # signatures exactly once. At corpus scale the persisted relation is
    # ~50 bytes/doc (id + 8 md5 hex) — MEMORY_AND_DISK is safe.
    sig_df = (
        df.select(
            F.col(id_col).alias("doc"),
            word_shingles(F.col(text_col), k).alias("_sh"),
        )
        .repartition(F.col("doc"))
        .select(
            "doc",
            minhash_signature(F.col("_sh"), num_hashes).alias("sig"),
        )
        .persist()
    )
    banded = sig_df.select(
        "doc",
        F.explode(
            lsh_band_keys(F.col("sig"), bands, rows_per_band)
        ).alias("band_key"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, on="band_key")
        .filter(F.col("l.doc") < F.col("r.doc"))
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------- simhash

def simhash16(col: Column) -> Column:
    """16-bit SimHash as a bitstring: for hex position p of md5(token),
    bit_p = sign of Σ_tokens (+1 if hexdigit ≥ '8' else −1)."""
    toks = tokens(col)
    bits = []
    for p in range(1, 17):
        vote = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                F.substring(F.md5(t), p, 1).isin(*"89abcdef"), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        bits.append(F.when(vote > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def simhash16_sql(col: str = "text") -> str:
    toks = f"string_split_regex(trim({col}), '\\s+')"
    bits = []
    for p in range(1, 17):
        vote = (
            f"list_sum([CASE WHEN substr(md5(t), {p}, 1) IN "
            f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END "
            f"FOR t IN {toks}])"
        )
        bits.append(f"CASE WHEN {vote} > 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(bits) + ")"


# ---------------------------------------------------------------- jaccard

def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    k: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs within a blocking key.

    explode(shingles) → self-join on (block, shingle) → pair-count →
    |A∩B| / (|A|+|B|−|A∩B|). Blocking bounds the pair space; at corpus scale
    the block is an LSH bucket rather than a metadata column.
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.col(block_col).alias("blk"),
        F.size(word_shingles(F.col(text_col), k)).alias("n_sh"),
        F.explode(word_shingles(F.col(text_col), k)).alias("shingle"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on=["blk", "shingle"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.round(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_pairs_lsh(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 2,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard, computed ONLY for MinHash-LSH candidate pairs.

    The scale-correct composition: LSH banding bounds the pair space to
    near-duplicate candidates (sub-quadratic — no metadata-column blocking),
    then the exact Jaccard verifies each candidate. Plan shape:
    candidates (banded self-join) → join shingles of side a → join shingles
    of side b on (doc, shingle) → per-pair intersection count → filter.
    """
    cands = lsh_candidate_pairs(df, id_col, text_col, k, num_hashes, bands)
    cands.persist()  # ~16 bytes/pair; read by the shingle-joins' plan
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), k)).alias("shingle"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    # intersection counts over the exploded shingles; the per-doc shingle
    # counts are joined AFTERWARDS onto the (tiny) per-pair aggregate —
    # carrying n_sh through the exploded join measured ~30x slower
    inter = (
        cands.join(a, F.col("doc_a") == F.col("a.doc"))
        .join(
            b,
            (F.col("doc_b") == F.col("b.doc"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    counts = df.select(
        F.col(id_col).alias("doc"),
        F.size(word_shingles(F.col(text_col), k)).alias("n_sh"),
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    inter = (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc"))
        .join(cb, F.col("doc_b") == F.col("cb.doc"))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.col("ca.n_sh").alias("n_a"),
            F.col("cb.n_sh").alias("n_b"),
        )
    )
    jac = F.round(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
