"""DBSCAN over the thresholded edge graph (reference: src/dbscan.cpp).

The reference's DBSCAN (src/dbscan.cpp:725-1101) runs the classic
label-array + seed-queue expansion with region queries served by the same
inverted index the MST path uses.  Given the eps-neighborhood graph (our
``edges`` with dist <= eps — produced by any pair mode), DBSCAN factorizes
into pure DataFrame operations:

  core points     degree + 1 >= min_pts   (reference counts the point itself,
                                           src/dbscan.cpp:751 minPts includes self)
  clusters        connected components of the core-core subgraph
  border points   non-core with >= 1 core neighbor -> that core's cluster
                  (deterministic: the minimum core neighbor's cluster)
  noise           everything else -> cluster_id = -1
                  (src/dbscan.cpp:1102-1310 prints noise separately)

This is exactly DBSCAN's output up to the well-known border-point tie
(classic DBSCAN assigns a border to whichever core reached it first; we
break ties deterministically by minimum cluster id — order-free, unlike the
reference's queue order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rabbittclust_spark.operators.components import connected_components


def dbscan(docs: DataFrame, edges: DataFrame, eps: float, min_pts: int,
           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, cluster_id, role) with role in {core, border, noise};
    noise has cluster_id = -1."""
    e = edges.where(F.col("dist") <= eps).select("src", "dst")
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    degree = sym.groupBy("src").agg(F.count("*").alias("deg"))
    core = degree.where(F.col("deg") + 1 >= min_pts) \
        .select(F.col("src").alias("doc_id"))

    core_edges = (
        e.join(core.withColumnRenamed("doc_id", "src"), "src")
        .join(core.withColumnRenamed("doc_id", "dst"), "dst")
    )
    membership = connected_components(core_edges)
    core_assign = (
        core.join(membership, "doc_id", "left")
        .select("doc_id",
                F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
                F.lit("core").alias("role"))
    )
    # border: non-core adjacent to a core -> min core-neighbor's cluster
    border = (
        sym.withColumnRenamed("src", "doc_id").withColumnRenamed("dst", "nbr")
        .join(core_assign.select(F.col("doc_id").alias("nbr"),
                                 F.col("cluster_id").alias("nbr_cluster")), "nbr")
        .join(core.withColumnRenamed("doc_id", "doc_id"), "doc_id", "left_anti")
        .groupBy("doc_id").agg(F.min("nbr_cluster").alias("cluster_id"))
        .select("doc_id", "cluster_id", F.lit("border").alias("role"))
    )
    assigned = core_assign.unionByName(border)
    noise = (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(assigned.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.lit(-1).cast("long").alias("cluster_id"),
                F.lit("noise").alias("role"))
    )
    return assigned.unionByName(noise)
