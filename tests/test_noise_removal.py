"""--dense noise removal (src/MST.cpp:189-211 semantics)."""

from rabbittclust_spark.operators.postprocess import (
    assignments_from_components,
    remove_noise,
)


def test_low_density_member_removed(spark):
    # clique 0-1-2-3 (density 3 each) + pendant 4 attached by one edge
    edges = [(0, 1, .01), (0, 2, .01), (0, 3, .01), (1, 2, .01),
             (1, 3, .01), (2, 3, .01), (3, 4, .04)]
    e = spark.createDataFrame(edges, "src long, dst long, dist double")
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    membership = spark.createDataFrame(
        [(i, 0) for i in range(5)], "doc_id long, cluster_id long")
    assignments = assignments_from_components(docs, membership)
    out = {r.doc_id: r.cluster_id for r in remove_noise(assignments, e).collect()}
    # pendant 4 (density 1 <= min(2, Q1-1)=2) is noise; clique survives intact
    assert out[4] == -1
    assert out[0] == out[1] == out[2] == out[3] == 0
    assert out[5] == 5  # singleton untouched (cluster size <= 2 guard)


def test_small_clusters_not_flagged(spark):
    e = spark.createDataFrame([(0, 1, .01)], "src long, dst long, dist double")
    docs = spark.createDataFrame([(0,), (1,)], "doc_id long")
    membership = spark.createDataFrame([(0, 0), (1, 0)],
                                       "doc_id long, cluster_id long")
    assignments = assignments_from_components(docs, membership)
    out = {r.doc_id: r.cluster_id for r in remove_noise(assignments, e).collect()}
    assert out == {0: 0, 1: 0}
