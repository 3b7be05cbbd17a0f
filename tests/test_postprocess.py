"""Postprocess: medoid collapse (src/cluster_postprocess.cpp:60-157
semantics), k-reps, local index, stats, formatter."""

import pandas as pd
from pyspark.sql import functions as F

from rabbittclust_spark.operators.postprocess import (
    assignments_from_components,
    cluster_local_index,
    cluster_stats,
    dedup_medoid_collapse,
    density_histogram,
    edge_length_stats,
    format_clusters_text,
    k_reps_per_cluster,
)


def _assignments(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    membership = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3)], "doc_id long, cluster_id long")
    return assignments_from_components(docs, membership)


def test_assignments_with_singletons(spark):
    got = {r.doc_id: (r.cluster_id, r.is_rep)
           for r in _assignments(spark).collect()}
    assert got == {0: (0, True), 1: (0, False), 2: (0, False),
                   3: (3, True), 4: (3, False), 5: (5, True)}


def test_cluster_local_index(spark):
    rows = cluster_local_index(_assignments(spark)).collect()
    got = {(r.cluster_id, r.doc_id): r.local_idx for r in rows}
    assert got[(0, 0)] == 0 and got[(0, 1)] == 1 and got[(0, 2)] == 2
    assert got[(3, 3)] == 0 and got[(3, 4)] == 1
    assert got[(5, 5)] == 0


def test_cluster_stats(spark):
    row = cluster_stats(_assignments(spark)).collect()[0]
    assert (row.num_clusters, row.max_size, row.num_singletons) == (3, 3, 1)


def test_medoid_collapse_tiebreaks(spark):
    """Medoid = min total dist; ties -> longer doc, then smaller id
    (src/cluster_postprocess.cpp:122-129)."""
    assignments = spark.createDataFrame(
        [(0, 0, True), (1, 0, False), (2, 0, False)],
        "doc_id long, cluster_id long, is_rep boolean")
    # 1 is the medoid: dist sums 0:0.03, 1:0.02, 2:0.03
    edges = spark.createDataFrame(
        [(0, 1, 0.01), (1, 2, 0.01), (0, 2, 0.02)],
        "src long, dst long, dist double")
    lens = spark.createDataFrame([(0, 100), (1, 100), (2, 100)],
                                 "doc_id long, len long")
    out = dedup_medoid_collapse(assignments, edges, lens, dedup_dist=0.05)
    got = {r.doc_id: (r.rep_id, r.is_dup_rep) for r in out.collect()}
    assert got[0] == (1, False) and got[1] == (1, True) and got[2] == (1, False)
    # tie on tot_dist -> longer doc wins
    edges2 = spark.createDataFrame(
        [(0, 1, 0.01)], "src long, dst long, dist double")
    lens2 = spark.createDataFrame([(0, 100), (1, 200)], "doc_id long, len long")
    assignments2 = spark.createDataFrame(
        [(0, 0, True), (1, 0, False)], "doc_id long, cluster_id long, is_rep boolean")
    out2 = dedup_medoid_collapse(assignments2, edges2, lens2, dedup_dist=0.05)
    got2 = {r.doc_id: r.rep_id for r in out2.collect()}
    assert got2 == {0: 1, 1: 1}  # doc 1 longer -> rep despite larger id


def test_k_reps_farthest_point(spark):
    assignments = spark.createDataFrame(
        [(i, 0, i == 0) for i in range(4)],
        "doc_id long, cluster_id long, is_rep boolean")
    edges = spark.createDataFrame(
        [(0, 1, 0.01), (0, 2, 0.04), (1, 2, 0.04), (0, 3, 0.02),
         (1, 3, 0.02), (2, 3, 0.03)],
        "src long, dst long, dist double")
    rows = k_reps_per_cluster(assignments, edges, k=2).collect()
    reps = sorted((r.rep_rank, r.rep_id) for r in rows)
    # start at 0; farthest from 0 is 2 (0.04)
    assert reps == [(0, 0), (1, 2)]


def test_histograms_and_stats(spark):
    edges = spark.createDataFrame(
        [(0, 1, 0.01), (0, 2, 0.02), (1, 2, 0.04)],
        "src long, dst long, dist double")
    dh = {(r.doc_id, r.bucket): (r.cnt, r.cum_cnt)
          for r in density_histogram(edges).collect()}
    assert dh[(0, 1)] == (1, 1) and dh[(0, 2)] == (1, 2)
    st = edge_length_stats(edges).collect()[0]
    assert st.n_edges == 3 and abs(st.median - 0.02) < 1e-9


def test_formatter():
    pdf = pd.DataFrame({
        "cluster_id": [0, 0, 3], "local_idx": [0, 1, 0],
        "doc_id": [0, 1, 3], "len": [10, 20, 30],
        "name": ["a", "b", "c"],
    })
    text = format_clusters_text(pdf)
    assert text.splitlines()[0] == "the cluster 0 is:"
    assert "\t1\t1\t20\tb" in text
    assert "the cluster 1 is:" in text  # renumbered output index
