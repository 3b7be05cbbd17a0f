"""Leiden-lite label propagation (src/leiden.cpp:295-471 surface):
Spark == single-process twin, planted-community recovery, determinism,
resolution knob."""

import random

import pytest

from rabbittclust_spark.operators.leiden import (
    label_propagation,
    label_propagation_reference,
)


def _planted_graph(seed=3, cliques=3, size=8, internal_d=0.05, bridge_d=0.85):
    """`cliques` dense groups (distance internal_d) + one weak bridge edge
    between consecutive groups + a little random noise."""
    rng = random.Random(seed)
    edges = []
    for c in range(cliques):
        base = c * size
        for i in range(size):
            for j in range(i + 1, size):
                edges.append((base + i, base + j, internal_d))
    for c in range(cliques - 1):
        edges.append((c * size, (c + 1) * size, bridge_d))
    for _ in range(5):
        u = rng.randrange(cliques * size)
        v = rng.randrange(cliques * size)
        if u != v:
            edges.append((min(u, v), max(u, v), 0.9))
    return edges


def _spark_communities(spark, edges, resolution=1.0, driver_cutoff=0):
    # driver_cutoff=0 forces the DISTRIBUTED iterations (the default driver
    # fast path is the reference twin itself, so testing it against the twin
    # would be vacuous)
    df = spark.createDataFrame(edges, "src long, dst long, dist double")
    out = label_propagation(df, resolution=resolution,
                            driver_cutoff=driver_cutoff)
    return {r.doc_id: r.community for r in out.collect()}


def test_driver_path_equals_distributed(spark):
    edges = _planted_graph(seed=9)
    dist = _spark_communities(spark, edges, driver_cutoff=0)
    drv = _spark_communities(spark, edges, driver_cutoff=2_000_000)
    assert drv == dist


def test_matches_reference_twin(spark):
    edges = _planted_graph()
    got = _spark_communities(spark, edges)
    ref = label_propagation_reference(edges)
    assert got == ref


def test_matches_reference_random_graph(spark):
    rng = random.Random(11)
    edges = []
    seen = set()
    for _ in range(120):
        u, v = rng.randrange(30), rng.randrange(30)
        if u == v or (min(u, v), max(u, v)) in seen:
            continue
        seen.add((min(u, v), max(u, v)))
        edges.append((min(u, v), max(u, v), round(rng.uniform(0.0, 1.0), 3)))
    got = _spark_communities(spark, edges)
    ref = label_propagation_reference(edges)
    assert got == ref


def test_recovers_planted_communities(spark):
    edges = _planted_graph()
    got = _spark_communities(spark, edges)
    # each clique lands in one community; cliques stay distinct
    comms = [ {got[c * 8 + i] for i in range(8)} for c in range(3) ]
    for cset in comms:
        assert len(cset) == 1, cset
    assert len({next(iter(c)) for c in comms}) == 3


def test_deterministic(spark):
    edges = _planted_graph(seed=4)
    assert _spark_communities(spark, edges) == _spark_communities(spark, edges)


@pytest.mark.parametrize("res_lo,res_hi", [(0.2, 30.0)])
def test_resolution_monotone(spark, res_lo, res_hi):
    """Higher resolution => at least as many (usually more) communities."""
    edges = _planted_graph()
    lo = len(set(_spark_communities(spark, edges, resolution=res_lo).values()))
    hi = len(set(_spark_communities(spark, edges, resolution=res_hi).values()))
    assert hi >= lo


def test_knn_cap(spark):
    from rabbittclust_spark.operators.leiden import knn_cap_edges

    # star: node 0 connected to 1..5 with increasing distance; 1-2 close pair
    edges = [(0, i, 0.1 * i) for i in range(1, 6)] + [(1, 2, 0.05)]
    df = spark.createDataFrame(edges, "src long, dst long, dist double")
    capped = {(r.src, r.dst) for r in knn_cap_edges(df, k=2).collect()}
    # node 0 keeps its 2 nearest (1, 2); far leaves (4, 5) keep their only
    # edge to 0 via the union rule; (0,3) is in 3's top-2 as its only edge
    assert (0, 1) in capped and (0, 2) in capped and (1, 2) in capped
    assert (0, 4) in capped and (0, 5) in capped and (0, 3) in capped
    # with k=1: node 0 keeps only (0,1); leaves keep their only edge
    capped1 = {(r.src, r.dst) for r in knn_cap_edges(df, k=1).collect()}
    assert (0, 1) in capped1 and (1, 2) in capped1
    assert (0, 2) not in capped1  # not in 0's top-1; 2's top-1 is (1,2)


def test_label_propagation_with_knn(spark):
    edges = _planted_graph()
    df = spark.createDataFrame(edges, "src long, dst long, dist double")
    out = label_propagation(df, resolution=1.0, knn=6)
    comms = {r.doc_id: r.community for r in out.collect()}
    # planted cliques still resolve under the cap
    for c in range(3):
        assert len({comms[c * 8 + i] for i in range(8)}) == 1


def test_knn_cap_duplicate_edges_collapse(spark):
    """Duplicate input edges for the same pair with different dist values
    must yield ONE output row (min dist), not double-weighted duplicates."""
    from rabbittclust_spark.operators.leiden import knn_cap_edges

    df = spark.createDataFrame(
        [(1, 2, 0.3), (2, 1, 0.1), (1, 2, 0.1), (2, 3, 0.2)],
        "src long, dst long, dist double")
    rows = knn_cap_edges(df, k=5).collect()
    pairs = [(r.src, r.dst) for r in rows]
    assert sorted(pairs) == [(1, 2), (2, 3)]
    assert {(r.src, r.dst): r.dist for r in rows}[(1, 2)] == 0.1


def test_reference_twin_vectorized_2m_edges():
    """The driver fast-path twin must handle driver_cutoff-scale graphs in
    seconds (numpy-vectorized), not minutes of per-row Python."""
    import time

    import numpy as np

    from rabbittclust_spark.operators.leiden import label_propagation_reference

    rng = np.random.default_rng(3)
    n_nodes, n_edges = 400_000, 2_000_000
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    d = rng.random(n_edges) * 0.5
    edges = list(zip(u.tolist(), v.tolist(), d.tolist()))
    t0 = time.time()
    labels = label_propagation_reference(edges, max_iter=5)
    wall = time.time() - t0
    assert len(labels) > 300_000
    assert wall < 60.0, f"vectorized twin took {wall:.1f}s on 2M edges"


def test_refine_communities_splits_disconnected(spark):
    """The Leiden guarantee (Traag et al. 2019): a label shared by two
    internally disconnected groups splits into per-component communities;
    members with no intra-community edge become singletons."""
    from rabbittclust_spark.operators.leiden import refine_communities

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (7, 7), (8, 7)],
        "doc_id long, community long")
    # community 1 has two parts {1,2} and {3,4} plus isolated 5; the 3-7
    # edge crosses communities and must NOT merge them; 7-8 stays whole
    edges = spark.createDataFrame(
        [(1, 2), (3, 4), (3, 7), (7, 8)], "src long, dst long")
    got = {r.doc_id: r.community
           for r in refine_communities(labels, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 7: 7, 8: 7}


def test_refine_communities_connected_noop(spark):
    """A connected community is only canonicalized (min-doc id), never
    split."""
    from rabbittclust_spark.operators.leiden import refine_communities

    labels = spark.createDataFrame(
        [(10, 12), (11, 12), (12, 12)], "doc_id long, community long")
    edges = spark.createDataFrame([(10, 11), (11, 12)], "src long, dst long")
    got = {r.doc_id: r.community
           for r in refine_communities(labels, edges).collect()}
    assert got == {10: 10, 11: 10, 12: 10}
