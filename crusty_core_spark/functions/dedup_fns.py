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

# Spark-SQL *_expr twins of the Column builders below (same expression
# trees, parsed JVM-side in ONE py4j round trip). The Column versions cost
# hundreds-to-thousands of py4j round trips per call — each lambda in a
# higher-order function is its own JVM callback dance — which put 0.4-0.9 s
# of pure driver-side plan construction on the bench clock for q14/q16/q17
# (cProfile: 2,534 round trips for the 16 simhash votes alone). The _expr
# twins feed F.expr()/selectExpr() with the identical expression spelled as
# SQL text; results and physical plans are unchanged (lambda variable names
# aside), pinned by tests/test_expr_twins.py.


def tokens_expr(col: str) -> str:
    """Spark-SQL twin of text.tokens(col) for an expression string."""
    return (
        f"CASE WHEN length(trim({col})) = 0 "
        f"THEN cast(array() as array<string>) "
        f"ELSE split(trim({col}), '\\\\s+') END"
    )


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


def word_shingles_expr(col: str, k: int = 2) -> str:
    """Spark-SQL twin of word_shingles (same zip_with-of-slices tree)."""
    toks = tokens_expr(col)
    if k == 1:
        return f"array_distinct({toks})"
    m = f"greatest(size({toks}) - {k - 1}, 0)"
    grams = f"slice({toks}, 1, {m})"
    for j in range(1, k):
        grams = (
            f"zip_with({grams}, slice({toks}, {j + 1}, {m}), "
            f"(x, y) -> concat_ws(' ', x, y))"
        )
    return f"array_distinct({grams})"


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


def lsh_band_keys_expr(signature: str, bands: int, rows_per_band: int) -> str:
    """Spark-SQL twin of lsh_band_keys (same md5-over-concat_ws tree)."""
    keys = ", ".join(
        "md5(concat_ws('|', '%d', %s))"
        % (
            b,
            ", ".join(
                f"element_at({signature}, {b * rows_per_band + r + 1})"
                for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return f"array({keys})"


def lsh_band_keys_sql(signature: str, bands: int, rows_per_band: int) -> str:
    keys = ", ".join(
        "md5(concat_ws('|', '%d', %s))"
        % (b, ", ".join(f"{signature}[{b * rows_per_band + r + 1}]"
                        for r in range(rows_per_band)))
        for b in range(bands)
    )
    return f"[{keys}]"


def shingle_frame(
    df: DataFrame, id_col: str, text_col: str, k: int = 2
) -> DataFrame:
    """(doc, _sh) — per-doc distinct shingle arrays computed ABOVE a
    doc-hash exchange of the raw text. The repartition matters three ways:
    it stops CollapseProject from re-inlining the shingle subtree into
    every downstream consumer (a Catalyst expression-tree blowup, measured
    80x slower), it spreads the shingle/minhash/intersection work across
    the session's cores even when the input is a single unsplittable
    parquet row group (the sandbox layout — one scan task otherwise owns
    all expression work), and the exchange ships the raw text instead of
    the larger shingle arrays (isolated: signature materialization
    1.78 s → ~0.8 s cold with the shingling parallel)."""
    return df.selectExpr(
        f"{id_col} AS doc", f"{text_col} AS _t"
    ).repartition(F.col("doc")).selectExpr(
        "doc", f"{word_shingles_expr('_t', k)} AS _sh"
    )


def _lsh_pairs_from_shingles(
    sh_df: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """Banded candidate pairs from a (doc, _sh) frame; persists the tiny
    doc→signature relation so the banded self-join computes signatures
    exactly once (~50 bytes/doc — MEMORY_AND_DISK is safe at corpus
    scale).

    The signature is computed by EXPLODING the shingles and taking 8
    ``min(md5(j || ':' || s))`` aggregates, not by the higher-order
    ``array_min(transform(...))`` form: lambda functions evaluate
    interpreted (no whole-stage codegen), and the 8-hash transform over
    every shingle was the measured dominant cost of the LSH stage; the
    exploded aggregate runs the same md5s codegen-compiled (~4x the whole
    stage). Identical results: min() and array_min() share Spark's binary
    string ordering, explode_outer keeps empty shingle arrays as a null
    row whose md5(null)=null mins reproduce the all-null signature, and
    the groupBy rides the existing doc-hash partitioning (no extra
    exchange)."""
    rows_per_band = num_hashes // bands
    ex = sh_df.selectExpr("doc", "explode_outer(_sh) AS _s")
    sig_df = (
        ex.groupBy("doc")
        .agg(
            *[
                F.expr(f"min(md5(concat('{j}:', _s)))").alias(f"_m{j}")
                for j in range(num_hashes)
            ]
        )
        .selectExpr(
            "doc",
            "array(%s) AS sig"
            % ", ".join(f"_m{j}" for j in range(num_hashes)),
        )
        .persist()
    )
    banded = sig_df.selectExpr(
        "doc",
        "explode(%s) AS band_key"
        % lsh_band_keys_expr("sig", bands, rows_per_band),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, on="band_key")
        .filter(F.col("l.doc") < F.col("r.doc"))
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 2,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: (id_a < id_b) sharing ≥1 band key.

    Plan shape: projection (shingles) → exchange → projection (signature,
    persisted) → explode (bands) → shuffle on band_key → in-bucket
    self-join → distinct. No cross join anywhere.
    """
    return _lsh_pairs_from_shingles(
        shingle_frame(df, id_col, text_col, k), num_hashes, bands
    )


# ---------------------------------------------------------------- simhash

def token_md5s_expr(col: str) -> str:
    """Spark-SQL twin of token_md5s."""
    return f"transform({tokens_expr(col)}, t -> md5(t))"


def simhash16_from_hashes_expr(h: str) -> str:
    """Spark-SQL twin of simhash16_from_hashes (the 16 bit-vote
    aggregates were the single most py4j-expensive constructor in the
    bench: 2,534 round trips ≈ 0.55 s on the q14 clock)."""
    bits = []
    for p in range(1, 17):
        vote = (
            f"aggregate({h}, 0, (acc, t) -> acc + (CASE WHEN "
            f"substring(t, {p}, 1) IN "
            f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END))"
        )
        bits.append(f"CASE WHEN {vote} > 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(bits) + ")"


def token_md5s(col: Column) -> Column:
    """md5 per whitespace token — the shared input of the 16 simhash bit
    votes. Stage this behind an exchange boundary so each token is hashed
    ONCE instead of once per bit position (16x less md5 work), and the
    votes run on all cores instead of inside a single scan task."""
    return F.transform(tokens(col), lambda t: F.md5(t))


def simhash16_from_hashes(h: Column) -> Column:
    """simhash16 over a precomputed md5(token) array (see token_md5s);
    bit-identical to simhash16: substring(md5(t), p, 1) == substring(h, p, 1)."""
    bits = []
    for p in range(1, 17):
        vote = F.aggregate(
            h,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                F.substring(t, p, 1).isin(*"89abcdef"), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        bits.append(F.when(vote > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


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
    then the exact Jaccard verifies each candidate via a per-pair
    ``array_intersect`` over the docs' distinct-shingle arrays.

    One (doc, _sh) relation is computed once and persisted, feeding BOTH the
    signature/banding stage and the pair verification — the old shape
    recomputed the shingles three times and verified pairs through an
    exploded (doc, shingle) self-join, which shuffled every pair × every
    shingle (candidate_pairs × ~shingles_per_doc rows through two exchanges,
    the dominant cost of the query at every scale). Now the shingle array
    crosses one hash join per pair side and the intersection is a local
    O(|A|+|B|) hash probe per pair; shuffle volume is O(pairs), not
    O(pairs × shingles)."""
    sh_df = shingle_frame(df, id_col, text_col, k).persist()
    cands = _lsh_pairs_from_shingles(sh_df, num_hashes, bands)
    a = sh_df.selectExpr(
        "doc AS doc_a", "_sh AS _sh_a", "size(_sh) AS n_a"
    )
    b = sh_df.selectExpr(
        "doc AS doc_b", "_sh AS _sh_b", "size(_sh) AS n_b"
    )
    inter = (
        cands.join(a, on="doc_a")
        .join(b, on="doc_b")
        .withColumn(
            "n_inter", F.expr("size(array_intersect(_sh_a, _sh_b))")
        )
        # pairs with an empty intersection never surfaced from the old
        # exploded inner join — preserve that pair-set for any threshold
        .filter(F.col("n_inter") > 0)
    )
    jac = F.expr("round(n_inter / (n_a + n_b - n_inter), 6)")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
