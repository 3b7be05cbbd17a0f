"""Dedup suite: exact, simhash, ngram-jaccard on hand-built cases."""

from pyspark.sql import functions as F

from rabbittclust_spark.config import PipelineConfig
from rabbittclust_spark.operators.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
    token_ngrams,
)

CFG = PipelineConfig(min_len=10)


def test_exact_dedup(spark):
    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "aaa")],
        "doc_id long, text string")
    got = {r.doc_id: r.canonical_id for r in exact_dedup(docs).collect()}
    assert got == {1: 1, 2: 2, 3: 1, 4: 4, 5: 1}


def test_simhash_dedup_exact_dups_cocluster(spark):
    t = "the quick brown fox jumps over the lazy dog " * 20
    u = t.replace("lazy", "hazy")  # tiny perturbation
    v = "completely different content about spark engines " * 20
    docs = spark.createDataFrame(
        [(1, t), (2, t), (3, u), (4, v)], "doc_id long, text string")
    got = {r.doc_id: r.cluster_id for r in simhash_dedup(docs, CFG).collect()}
    assert got[1] == got[2] == 1
    assert got[4] != got[1]


def test_minhash_dedup_sketch_df_hook(spark):
    """minhash_dedup(sketch_df=...) clusters from a SUPPLIED sketch table —
    the hash-agnostic entry the r7 driver oracle uses (md5-token bottom-s
    MinHash in, production probe/verify/threshold/CC path throughout).
    Docs 1 and 2 share an identical 8-value signature (sketch Jaccard 1 ->
    Mash dist 0); doc 3's signature is disjoint."""
    from rabbittclust_spark.operators.dedup import minhash_dedup

    docs = spark.createDataFrame(
        [(1, "alpha " * 10), (2, "bravo " * 10), (3, "delta " * 10)],
        "doc_id long, text string")
    sig_ab = list(range(1, 9))
    sk = spark.createDataFrame(
        [(1, 60, 8, sig_ab), (2, 60, 8, sig_ab),
         (3, 60, 8, list(range(101, 109)))],
        "doc_id long, len long, n int, sig array<long>")
    out = minhash_dedup(docs, CFG, sketch_df=sk)["assignments"]
    rows = {r["doc_id"]: (r["cluster_id"], r["is_rep"])
            for r in out.collect()}
    assert rows == {1: (1, True), 2: (1, False), 3: (3, True)}

    # banded mode requires band_keys on the supplied sketch
    import dataclasses

    import pytest as _pytest
    banded_cfg = dataclasses.replace(CFG, pair_mode="banded")
    with _pytest.raises(ValueError, match="band_keys"):
        minhash_dedup(docs, banded_cfg, sketch_df=sk)
    skb = sk.withColumn(
        "band_keys",
        F.transform(F.sequence(F.lit(0), F.lit(3)),
                    lambda i: F.md5(F.concat_ws(
                        ",", i.cast("string"),
                        F.element_at(F.col("sig"), i * 2 + 1).cast("string"),
                        F.element_at(F.col("sig"), i * 2 + 2).cast("string")))))
    outb = minhash_dedup(docs, banded_cfg, sketch_df=skb)["assignments"]
    rowsb = {r["doc_id"]: r["cluster_id"] for r in outb.collect()}
    assert rowsb == {1: 1, 2: 1, 3: 3}

    # and the default path (no sketch_df) still sketches from text
    assert minhash_dedup(docs, CFG)["assignments"].count() == 3


def test_token_ngrams():
    spark_df_rows = [(1, "a b c d")]
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    df = spark.createDataFrame(spark_df_rows, "doc_id long, text string")
    grams = sorted(r.gram for r in token_ngrams(df, 2).collect())
    assert grams == ["a b", "b c", "c d"]
    # short doc -> no n-grams, no crash
    df2 = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert token_ngrams(df2, 3).count() == 0


def test_ngram_jaccard_hand_case(spark):
    # doc1/doc2 share 2 of their 3-gram union
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x"), (3, "p q r s t")],
        "doc_id long, text string")
    rows = ngram_jaccard_pairs(docs, n=3, min_jaccard=0.1).collect()
    assert len(rows) == 1
    r = rows[0]
    # grams1 = {abc,bcd,cde}, grams2 = {abc,bcd,cdx}; common=2, union=4
    assert (r.src, r.dst, r.common) == (1, 2, 2)
    assert abs(r.jaccard - 0.5) < 1e-9


def test_greedy_containment_variant(spark):
    """cfg.containment_variant='greedy' applies -(1/k)*ln(2c/(1+c))
    (src/greedy.cpp:1245-1259); Spark expr == numpy twin == hand formula."""
    import dataclasses
    import math

    from rabbittclust_spark.functions.distances import (
        greedy_containment_distance_expr,
    )
    from rabbittclust_spark.functions.minhash import greedy_containment_distance

    rows = [(5, 10, 20), (10, 10, 30), (0, 10, 10), (3, 0, 7), (7, 7, 7)]
    df = spark.createDataFrame(rows, "common int, n1 int, n2 int")
    got = [r.d for r in df.select(
        greedy_containment_distance_expr(
            F.col("common"), F.col("n1"), F.col("n2"), 21).alias("d"))
        .collect()]
    for (common, n1, n2), g in zip(rows, got):
        assert abs(g - greedy_containment_distance(common, n1, n2, 21)) < 1e-12
    c = 5 / 10
    assert abs(got[0] - (-math.log(2 * c / (1 + c)) / 21)) < 1e-12
    assert got[1] == 0.0 and got[2] == 1.0 and got[3] == 1.0 and got[4] == 0.0

    # config plumbing: the variant is accepted and hashes differently
    from rabbittclust_spark.config import PipelineConfig

    base = PipelineConfig(containment=True)
    g = dataclasses.replace(base, containment_variant="greedy")
    assert g.config_hash() != base.config_hash()
    try:
        dataclasses.replace(base, containment_variant="bogus")
        raise AssertionError("bogus variant accepted")
    except ValueError:
        pass


def test_min_probe_common_parity(spark):
    """min_probe_common=2 (the verify-join scale lever for phrase-dense
    corpora) keeps assignments identical to the default on the standard
    fixture: real dup pairs share many bottom-B probe hashes, accidental
    candidates the filter drops share one."""
    import dataclasses

    from rabbittclust_spark.fixtures.webtext import WebtextParams, generate_pandas
    from rabbittclust_spark.operators.dedup import minhash_dedup

    corpus = generate_pandas(WebtextParams(
        num_clusters=8, members_per_cluster=5, num_singletons=10,
        num_short=2, hot_cluster_size=10))
    docs = spark.createDataFrame(corpus[["doc_id", "text"]])
    base = PipelineConfig(min_len=100)
    a1 = sorted((r.doc_id, r.cluster_id) for r in
                minhash_dedup(docs, base)["assignments"].collect())
    a2 = sorted((r.doc_id, r.cluster_id) for r in
                minhash_dedup(docs, dataclasses.replace(
                    base, min_probe_common=2))["assignments"].collect())
    assert a1 == a2 and len(a1) > 0


def test_ngram_cap_does_not_inflate_jaccard(spark):
    """ADVICE r3: the hot-gram cap may only shrink the intersection, never
    the denominator.  Two docs built from two DIFFERENT hot boilerplate
    blocks plus a tiny shared cold tail have true jaccard ~0.03; computing
    sizes AFTER the cap dropped the boilerplate from |A| and |B| too and
    reported jaccard 1.0 — a false-positive dup pair."""
    from rabbittclust_spark.operators.dedup import ngram_jaccard_pairs

    boiler_a = " ".join(f"wa{i}" for i in range(32))
    boiler_b = " ".join(f"wb{i}" for i in range(32))
    tail = "x0 x1 x2 x3"
    rows = [(0, f"{boiler_a} {tail}"), (1, f"{boiler_b} {tail}")]
    # 12-doc groups make every boilerplate gram hot at max_posting=5
    for i in range(2, 14):
        rows.append((i, f"{boiler_a} ja{i}0 ja{i}1"))
    for i in range(14, 26):
        rows.append((i, f"{boiler_b} jb{i}0 jb{i}1"))
    # an honest all-cold near-dup pair must still be reported
    rows.append((26, "p0 p1 p2 p3 p4 p5 p6 p7"))
    rows.append((27, "p0 p1 p2 p3 p4 p5 p6 q9"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.src, r.dst): r.jaccard
           for r in ngram_jaccard_pairs(docs, n=3, min_jaccard=0.4,
                                        max_posting=5).collect()}
    assert (0, 1) not in out          # capped boilerplate must not inflate
    assert (26, 27) in out            # cold near-dups unaffected
    # and with no cap, (0, 1) is correctly scored low, not reported
    uncapped = {(r.src, r.dst)
                for r in ngram_jaccard_pairs(docs, n=3, min_jaccard=0.4,
                                             max_posting=None).collect()}
    assert (0, 1) not in uncapped


def test_wminhash_fully_hot_group_recovered(spark):
    """ADVICE r3: a dup group larger than max_posting makes EVERY signature
    position hot; pure drop mode loses all posting rows and reports zero
    pairs for the group.  Star escalation with exact sig-zip agreement must
    recover anchor pairs spanning every member."""
    import dataclasses

    from rabbittclust_spark.config import PipelineConfig
    from rabbittclust_spark.operators.dedup import wminhash_pairs

    text = " ".join(f"tok{i % 40}" for i in range(200))
    rows = [(i, text) for i in range(25)]                 # identical group
    rows += [(100 + i, " ".join(f"u{100 + i}x{j}" for j in range(60)))
             for i in range(5)]                           # unrelated docs
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = dataclasses.replace(PipelineConfig(min_len=10, shingle_k=8),
                              max_posting=10, hot_hash_mode="star")
    out = wminhash_pairs(docs, cfg, num_samples=32, min_wjaccard=0.5)
    got = [(r.src, r.dst, r.agree) for r in out.collect()]
    covered = {d for s, _, _ in got for d in [s]} | {d for _, d, _ in got}
    assert set(range(25)) <= covered          # every member in some pair
    assert all(a == 32 for _, _, a in got)    # exact agreement, identical docs
    # drop mode documents the cliff: the group vanishes entirely
    out_drop = wminhash_pairs(docs, dataclasses.replace(
        cfg, hot_hash_mode="drop"), num_samples=32, min_wjaccard=0.5)
    assert out_drop.count() == 0
