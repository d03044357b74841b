"""The Spark-SQL *_expr twins must be byte-identical to the Column
builders they replaced on the timed query paths (round-6 py4j
optimization: one JVM parse instead of hundreds of round trips). Each
case evaluates BOTH forms over the same rows — including empty /
whitespace-only / single-token edge texts — and asserts row equality."""

import pytest
from pyspark.sql import functions as F

import crusty_core_spark.functions.dedup_fns as D
import crusty_core_spark.functions.text as TX

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "",
    "   ",
    "one",
    "a a a a a",
    "der und die das der und",
    "le la et les le",
    "punct, and. spaces   collapse\tok",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_tokens_expr_twin(spark, docs):
    a = docs.select("doc_id", TX.tokens(F.col("text")).alias("v"))
    b = docs.selectExpr("doc_id", f"{D.tokens_expr('text')} AS v")
    assert _rows(a) == _rows(b)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_word_shingles_expr_twin(spark, docs, k):
    a = docs.select(
        "doc_id", D.word_shingles(F.col("text"), k).alias("v")
    )
    b = docs.selectExpr(
        "doc_id", f"{D.word_shingles_expr('text', k)} AS v"
    )
    assert _rows(a) == _rows(b)


def test_token_md5s_and_simhash_expr_twins(spark, docs):
    a = docs.select(
        "doc_id", D.token_md5s(F.col("text")).alias("_h")
    ).select(
        "doc_id", D.simhash16_from_hashes(F.col("_h")).alias("v")
    )
    b = docs.selectExpr(
        "doc_id", f"{D.token_md5s_expr('text')} AS _h"
    ).selectExpr(
        "doc_id", f"{D.simhash16_from_hashes_expr('_h')} AS v"
    )
    assert _rows(a) == _rows(b)


def test_lsh_band_keys_expr_twin(spark, docs):
    sig = docs.select(
        "doc_id",
        D.minhash_signature(
            D.word_shingles(F.col("text"), 2), 8
        ).alias("sig"),
    )
    a = sig.select(
        "doc_id", D.lsh_band_keys(F.col("sig"), 4, 2).alias("v")
    )
    b = sig.selectExpr(
        "doc_id", f"{D.lsh_band_keys_expr('sig', 4, 2)} AS v"
    )
    assert _rows(a) == _rows(b)


def test_lang_score_expr_twin(spark, docs):
    for lang in sorted(TX.LANG_MARKERS):
        a = docs.select(
            "doc_id", TX.lang_score(F.col("text"), lang).alias("v")
        )
        b = docs.selectExpr(
            "doc_id", f"{TX.lang_score_expr('text', lang)} AS v"
        )
        assert _rows(a) == _rows(b), lang


def test_lang_id_from_scores_expr_twin(spark, docs):
    langs = sorted(TX.LANG_MARKERS)
    scored_a = docs.select(
        "doc_id",
        *[
            TX.lang_score(F.col("text"), lang).alias(f"_s_{lang}")
            for lang in langs
        ],
    )
    a = scored_a.select(
        "doc_id",
        TX.lang_id_from_scores(
            {lang: F.col(f"_s_{lang}") for lang in langs}
        ).alias("v"),
    )
    scored_b = docs.selectExpr(
        "doc_id",
        *[f"{TX.lang_score_expr('text', lang)} AS _s_{lang}" for lang in langs],
    )
    b = scored_b.selectExpr(
        "doc_id",
        "%s AS v"
        % TX.lang_id_from_scores_expr({lang: f"_s_{lang}" for lang in langs}),
    )
    assert _rows(a) == _rows(b)


VECS = [
    [0.1, 0.2, 0.3, 0.4],
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 0.0],
    [-1.5, 2.25, -3.125, 0.0625],
    [1e-7, 1e7, -1e-7, -1e7],
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(VECS)],
        "vec_id long, embedding array<float>",
    )


def test_vector_norm_dot_expr_twins(spark, vecs):
    import crusty_core_spark.functions.vectors as V

    a = vecs.select(
        "vec_id",
        V._norm(F.col("embedding")).alias("n"),
        V._dot(F.col("embedding"), F.col("embedding")).alias("d"),
    )
    b = vecs.selectExpr(
        "vec_id",
        f"{V._norm_sql('embedding')} AS n",
        f"{V._dot_sql('embedding', 'embedding')} AS d",
    )
    assert _rows(a) == _rows(b)


def test_cos_hoisted_expr_twin(spark, vecs):
    import crusty_core_spark.functions.vectors as V

    # zero vectors excluded: BOTH forms raise the same ANSI
    # DIVIDE_BY_ZERO on a zero norm (verified identical), but an
    # exception can't ride the row-equality assertion
    nz = vecs.where(F.expr("aggregate(embedding, 0.0D, (a, v) -> a + abs(v)) > 0"))
    two = nz.withColumnRenamed("embedding", "a").crossJoin(
        nz.selectExpr("vec_id AS vid2", "embedding AS b")
    )
    col = two.select(
        "vec_id", "vid2",
        F.round(
            V._cosine_hoisted(
                F.col("a"), F.col("b"),
                V._norm(F.col("a")), V._norm(F.col("b")),
            ),
            6,
        ).alias("c"),
    )
    txt = two.withColumn("_na", F.expr(V._norm_sql("a"))).withColumn(
        "_nb", F.expr(V._norm_sql("b"))
    ).selectExpr(
        "vec_id", "vid2",
        f"{V._cos_hoisted_sql('a', 'b', '_na', '_nb')} AS c",
    )
    assert _rows(col) == _rows(txt)
