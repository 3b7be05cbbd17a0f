"""Unit tests: SimHash fingerprints + block LSH (pigeonhole recall)."""

import random

from rabbittclust_spark.functions.simhash import hamming64, simhash64, simhash_blocks


def _doc(rng, n=2000):
    words = [f"w{i:03d}" for i in range(500)]
    return " ".join(rng.choices(words, k=n))


def test_identical_docs_zero_hamming():
    t = _doc(random.Random(0))
    assert simhash64(t, 21) == simhash64(t, 21)


def test_near_vs_far_hamming():
    rng = random.Random(1)
    t1 = _doc(rng)
    t2 = " ".join(t if rng.random() > 0.002 else "X" + t for t in t1.split())
    t3 = _doc(random.Random(2))
    near = hamming64(simhash64(t1, 21), simhash64(t2, 21))
    far = hamming64(simhash64(t1, 21), simhash64(t3, 21))
    assert near < far
    assert far > 10


def test_blocks_pigeonhole():
    """Pairs within hamming distance h share >= 1 of (h+1) blocks."""
    rng = random.Random(3)
    for _ in range(50):
        a = rng.getrandbits(64)
        # flip exactly 3 bits
        b = a
        for pos in rng.sample(range(64), 3):
            b ^= 1 << pos
        assert hamming64(a, b) <= 3
        ba, bb = simhash_blocks(a, 4), simhash_blocks(b, 4)
        assert len(set(ba) & set(bb)) >= 1


def test_blocks_cover_all_bits():
    a = (1 << 64) - 1
    blocks = simhash_blocks(a, 4)
    assert len(blocks) == 4
    # reconstructing widths: total bits covered == 64
    widths = [16, 16, 16, 16]
    for i, blk in enumerate(blocks):
        assert blk == (i << 56) | ((1 << widths[i]) - 1)


def test_block_exprs_match_python(spark):
    """JVM shift/mask block keys == functions.simhash.simhash_blocks."""
    import random as _random

    from pyspark.sql import functions as F

    from rabbittclust_spark.functions.simhash import simhash_block_exprs

    rng = _random.Random(11)
    vals = [rng.getrandbits(64) for _ in range(200)] + [0, (1 << 64) - 1]
    # store as signed int64 (Spark long) — unsigned view must still match
    signed = [v - (1 << 64) if v >= (1 << 63) else v for v in vals]
    df = spark.createDataFrame([(v,) for v in signed], "simhash long")
    for nb in (2, 4, 8):
        got = {r["simhash"]: r["blocks"] for r in df.select(
            "simhash",
            simhash_block_exprs(F.col("simhash"), nb).alias("blocks")).collect()}
        for u, s in zip(vals, signed):
            assert got[s] == simhash_blocks(u, nb), (u, nb)


def test_simhash_dedup_sketch_df_hook(spark):
    """simhash_dedup(sketch_df=...) clusters from SUPPLIED fingerprints —
    the hash-agnostic entry the r6 driver oracle uses (md5-token SimHash
    in, production block/verify/CC path throughout).  Fingerprints 0, 1,
    3 are mutually within hamming 3; -1 is ~64 bits from all of them."""
    from pyspark.sql import functions as F

    from rabbittclust_spark.config import PipelineConfig
    from rabbittclust_spark.operators.dedup import simhash_dedup

    docs = spark.createDataFrame(
        [(i, "x" * 200) for i in range(1, 5)], "doc_id long, text string")
    sk = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 3), (4, -1)], "doc_id long, simhash long")
    out = simhash_dedup(docs, PipelineConfig(min_len=20), sketch_df=sk)
    rows = {r["doc_id"]: (r["cluster_id"], r["is_rep"])
            for r in out.collect()}
    assert rows == {1: (1, True), 2: (1, False), 3: (1, False),
                    4: (4, True)}
    # and the default path (no sketch_df) still sketches from text
    out2 = simhash_dedup(docs, PipelineConfig(min_len=20))
    assert out2.count() == 4


def test_blocks_rejects_single_block():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        simhash_blocks(123, 1)


def test_simhash_hot_block_cap_star_recall(spark):
    """A hot block value (many near-identical fingerprints) above
    max_posting escalates via anchor-star with NO assignment change vs the
    uncapped run — the pigeonhole guarantee survives the cap for
    within-hamming_max hot groups."""
    import dataclasses

    from rabbittclust_spark.config import PipelineConfig
    from rabbittclust_spark.operators.dedup import simhash_dedup

    boiler = ("the same boilerplate navigation header footer text block " * 30)
    rows = [(i, boiler) for i in range(40)] + [
        (100 + i, f"totally unrelated document number {i} " * 40)
        for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = PipelineConfig(min_len=10)
    capped = dataclasses.replace(base, max_posting=10, hot_hash_mode="star")
    a1 = sorted((r.doc_id, r.cluster_id) for r in
                simhash_dedup(docs, base).collect())
    a2 = sorted((r.doc_id, r.cluster_id) for r in
                simhash_dedup(docs, capped).collect())
    assert a1 == a2
    # the 40 identical docs share one cluster in both
    boiler_clusters = {c for d, c in a1 if d < 100}
    assert len(boiler_clusters) == 1
