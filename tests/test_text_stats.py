"""Text-analysis column expressions on hand-computed cases."""

from pyspark.sql import functions as F

from rabbittclust_spark.functions.text_stats import (
    bpe_token_count_expr,
    fingerprint_expr,
    lang_id_expr,
    quality_score_exprs,
    token_count_expr,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).collect()[0].v


def test_token_counts(spark):
    assert _one(spark, "a b  c", token_count_expr(F.col("text"))) == 3
    assert _one(spark, "", token_count_expr(F.col("text"))) == 0
    # "don't stop!" -> don + ' + t + stop + ! = 5 bpe tokens
    assert _one(spark, "don't stop!", bpe_token_count_expr(F.col("text"))) == 5


def test_quality_ratios(spark):
    cols = quality_score_exprs(F.col("text"))
    df = spark.createDataFrame([("ab, cd!",)], "text string")
    row = df.select(*[v.alias(k) for k, v in cols.items()]).collect()[0]
    assert row.n_chars == 7
    assert row.n_tokens == 2
    assert abs(row.punct_ratio - 2 / 7) < 1e-6
    assert abs(row.alpha_ratio - 4 / 7) < 1e-6


def test_stopword_ratio_counts_whole_words(spark):
    cols = quality_score_exprs(F.col("text"))
    df = spark.createDataFrame([("the theater is the best",)], "text string")
    row = df.select(cols["stopword_ratio"].alias("r"),
                    cols["n_tokens"].alias("n")).collect()[0]
    # "the" x2 + "is" -> 3 stopwords of 5 tokens ("theater" must not count)
    assert row.n == 5
    assert abs(row.r - 3 / 5) < 1e-6


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog is here",
                lang_id_expr(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist hier",
                lang_id_expr(F.col("text"))) == "de"
    assert _one(spark, "xyzzy plugh", lang_id_expr(F.col("text"))) == "und"
    # tie -> fixed order: en wins
    assert _one(spark, "the der", lang_id_expr(F.col("text"))) == "en"


def test_fingerprint_order_insensitive(spark):
    a = _one(spark, "b a c", fingerprint_expr(F.col("text")))
    b = _one(spark, "c b a a", fingerprint_expr(F.col("text")))
    c = _one(spark, "c b d", fingerprint_expr(F.col("text")))
    assert a == b
    assert a != c
