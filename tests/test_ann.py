"""Similarity search: brute-force top-k vs numpy, SRP-LSH recall."""

import numpy as np

from rabbittclust_spark.operators.ann import (
    brute_force_topk,
    embedding_neardup_pairs,
    srp_bucket_keys,
)


def _vectors(n=50, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    return base


def test_brute_force_matches_numpy(spark):
    vecs = _vectors()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    queries = df.where("vec_id < 3")
    got = brute_force_topk(df, queries, k=4, round_dp=None).collect()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(3):
        s = sims[q].copy()
        s[q] = -np.inf
        expected = np.argsort(-s, kind="stable")[:4]
        mine = [r.neighbor_id for r in sorted(
            (r for r in got if r.query_id == q), key=lambda r: r.rank)]
        assert mine == expected.tolist(), q


def test_neardup_pairs_planted(spark):
    rng = np.random.default_rng(9)
    base = rng.standard_normal((20, 16))
    dup = base[0] + 0.01 * rng.standard_normal(16)  # near-dup of vec 0
    vecs = np.vstack([base, dup])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    pairs = embedding_neardup_pairs(df, tau=0.99).collect()
    assert {(r.src, r.dst) for r in pairs} == {(0, 20)}


def test_srp_lsh_finds_planted_dup(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((100, 32))
    dup = base[0] + 0.001 * rng.standard_normal(32)
    vecs = np.vstack([base, dup])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    pairs = embedding_neardup_pairs(df, tau=0.99, use_lsh=True,
                                    num_planes=8, num_tables=8).collect()
    assert (0, 100) in {(r.src, r.dst) for r in pairs}
    # buckets deterministic across invocations
    k1 = {(r.vec_id, r.bucket) for r in srp_bucket_keys(
        df.select("vec_id", df.embedding.alias("vec"))).collect()}
    k2 = {(r.vec_id, r.bucket) for r in srp_bucket_keys(
        df.select("vec_id", df.embedding.alias("vec"))).collect()}
    assert k1 == k2
