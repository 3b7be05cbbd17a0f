"""Adversarial inputs across the dedup suite: NULL text, empty strings,
unicode (CJK/emoji/RTL/combining), exact unicode duplicates, near-dup
unicode pairs, and docs below min_len."""

import pytest

from pyspark.sql import functions as F

from rabbittclust_spark.config import PipelineConfig
from rabbittclust_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)

CFG = PipelineConfig(min_len=10, shingle_k=4, exact_prededup=True)

CJK = "数据去重引擎使用最小哈希签名对网页文本进行聚类处理 " * 6
EMOJI = "🦀🚀 data pipelines 🦀🚀 need robust unicode handling 🎉 " * 6
RTL = "النص العربي للاختبار مع محتوى مكرر للتجميع والفهرسة " * 6
COMBINING = "étude répétée du traitement des données " * 6


@pytest.fixture(scope="module")
def nasty(spark):
    rows = [
        (0, None),                      # NULL text
        (1, ""),                        # empty
        (2, "tiny"),                    # below min_len
        (3, CJK),
        (4, CJK),                       # exact unicode duplicate of 3
        (5, CJK + " 结尾附加内容"),      # unicode near-dup of 3
        (6, EMOJI),
        (7, RTL),
        (8, COMBINING),
        (9, "plain ascii content that is long enough to be sketched " * 4),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_nulls_and_unicode(spark, nasty):
    got = {r.doc_id: r.canonical_id for r in exact_dedup(nasty).collect()}
    assert got[3] == got[4] == 3        # identical unicode groups
    assert got[5] == 5                   # near-dup is NOT exact
    assert len(got) == 10                # NULL/empty rows survive the operator


def test_minhash_dedup_nasty_corpus(spark, nasty):
    out = minhash_dedup(nasty, CFG)["assignments"]
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    # NULL text and below-min_len are dropped by the length filter
    # (exact-group canonicals that never get sketched drop out too)
    assert 0 not in got and 2 not in got
    assert got[3] == got[4] == got[5]    # exact + near unicode dups cluster
    # unrelated scripts stay separate
    assert len({got[6], got[7], got[8], got[9], got[3]}) == 5


def test_simhash_dedup_nasty_corpus(spark, nasty):
    out = simhash_dedup(nasty, CFG)
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got[3] == got[4]              # identical docs share the fingerprint
    assert 0 not in got and 2 not in got


def test_ngram_jaccard_handles_null_and_empty(spark, nasty):
    pairs = ngram_jaccard_pairs(nasty, n=3, min_jaccard=0.3)
    got = {(r.src, r.dst) for r in pairs.collect()}
    assert (3, 4) in got
    assert all(0 not in p and 1 not in p for p in got)


def test_text_stats_null_safe(spark, nasty):
    from rabbittclust_spark.functions.text_stats import (
        fingerprint_expr,
        lang_id_expr,
        token_count_expr,
    )
    out = nasty.select(
        "doc_id",
        token_count_expr(F.col("text")).alias("n"),
        lang_id_expr(F.col("text")).alias("lang"),
        fingerprint_expr(F.col("text")).alias("fp"),
    ).collect()
    assert len(out) == 10                # no row lost, no exception


def test_label_propagation_empty_edges(spark):
    from rabbittclust_spark.operators.leiden import label_propagation
    e = spark.createDataFrame([], "src long, dst long, dist double")
    assert label_propagation(e).count() == 0


def test_components_empty_and_self_loops(spark):
    from rabbittclust_spark.operators.components import connected_components
    e = spark.createDataFrame([(1, 1, 0.0), (2, 3, 0.0)],
                              "src long, dst long, dist double")
    got = {r.doc_id: r.cluster_id for r in connected_components(e).collect()}
    assert got == {2: 2, 3: 2}           # self-loop dropped, pair connected
