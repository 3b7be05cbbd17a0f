"""Post-clustering operators: assignments, dedup-medoid collapse, k-reps,
histograms, cluster stats, and the CD-HIT-like text formatter.

Reference semantics:
- cluster result = list of clusters, first element = representative
  (src/greedy.cpp:854-867, src/MST.cpp:109-142)
- dedup-medoid collapse (--dedup-dist): within clusters, union-find over
  edges <= dedup_dist; per group pick medoid = min total distance, ties ->
  longer doc, then smaller id (src/cluster_postprocess.cpp:60-157, tie-break
  at :122-129)
- k reps per cluster: farthest-point selection (src/cluster_postprocess.cpp:184-327)
- density histogram: per-doc neighbor counts in 100 distance buckets
  (src/MST.cpp:342-369, DENSE_SPAN=100 src/common.hpp:26)
- ANI histogram: global 101 buckets of 100*(1-dist) (src/MST.cpp:362-368)
- edge-length stats: min/max/mean/quartiles/stddev (src/MST.cpp:1743-1818)
- cluster text sink format (src/MST_IO.cpp:72-134, README.md:199-248)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rabbittclust_spark.operators.components import connected_components


def assignments_from_components(docs: DataFrame, membership: DataFrame,
                                id_col: str = "doc_id") -> DataFrame:
    """Attach singletons: every doc gets cluster_id = component min or itself.

    Output: (doc_id, cluster_id, is_rep) — is_rep marks the canonical
    representative (minimum doc_id), the reference's "first element of the
    cluster" convention (src/MST_IO.cpp:90-131).
    """
    d = docs.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    out = (
        d.join(membership, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_rep", F.col("doc_id") == F.col("cluster_id"))
    )
    return out


def cluster_local_index(assignments: DataFrame) -> DataFrame:
    """Add the reference's "local index within cluster" output column
    (src/MST_IO.cpp:90-131): rep first, then by doc_id."""
    w = Window.partitionBy("cluster_id").orderBy(F.col("is_rep").desc(), F.col("doc_id"))
    return assignments.withColumn("local_idx", F.row_number().over(w) - 1)


def cluster_stats(assignments: DataFrame) -> DataFrame:
    """#clusters, largest, average size (src/leiden.cpp:455-460 analog)."""
    sizes = assignments.groupBy("cluster_id").agg(F.count("*").alias("size"))
    return sizes.agg(
        F.count("*").alias("num_clusters"),
        F.max("size").alias("max_size"),
        F.round(F.avg("size"), 6).alias("avg_size"),
        F.sum(F.when(F.col("size") == 1, 1).otherwise(0)).alias("num_singletons"),
    )


def repdb_stats(assignments: DataFrame, doc_lens: DataFrame | None = None) -> DataFrame:
    """RepDB --stats report (src/greedy.cpp:2656-2770 print_stats): one row of
    scale + cluster-size-distribution aggregates over a clustering.

    Columns mirror the reference report sections: [Scale] n_docs / n_reps
    (reps == clusters: one representative per cluster) / compression_pct =
    (1 - reps/docs)*100; [Cluster Size Distribution] min/max/mean/median +
    p90/p95/p99 (continuous percentiles — the report uses sorted-index
    picks) + singleton count; [Genome Coverage] rep-length coverage when
    ``doc_lens`` (doc_id, len) is supplied.  Pure partial-aggregable
    groupBy/agg — no windows, no collect."""
    sizes = assignments.groupBy("cluster_id").agg(F.count("*").alias("size"))
    stats = sizes.agg(
        F.sum("size").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_reps"),
        F.round((1.0 - F.count("*") / F.sum("size")) * 100.0, 6)
         .alias("compression_pct"),
        F.min("size").cast("long").alias("min_size"),
        F.max("size").cast("long").alias("max_size"),
        F.round(F.avg("size"), 6).alias("mean_size"),
        F.round(F.expr("percentile(size, 0.5)"), 6).alias("median_size"),
        F.round(F.expr("percentile(size, 0.9)"), 6).alias("p90_size"),
        F.round(F.expr("percentile(size, 0.95)"), 6).alias("p95_size"),
        F.round(F.expr("percentile(size, 0.99)"), 6).alias("p99_size"),
        F.sum(F.when(F.col("size") == 1, 1).otherwise(0)).cast("long")
         .alias("n_singletons"),
    )
    if doc_lens is None:
        return stats
    cov = (assignments.join(doc_lens, "doc_id")
           .agg(F.sum("len").cast("long").alias("total_len"),
                F.sum(F.when(F.col("is_rep"), F.col("len")).otherwise(0))
                 .cast("long").alias("rep_len")))
    return stats.crossJoin(cov).withColumn(
        "coverage_pct",
        F.round(F.when(F.col("total_len") > 0,
                       100.0 * F.col("rep_len") / F.col("total_len"))
                .otherwise(F.lit(0.0)), 6))


def dedup_medoid_collapse(assignments: DataFrame, edges: DataFrame,
                          doc_lens: DataFrame, dedup_dist: float) -> DataFrame:
    """Near-duplicate collapse at a tighter threshold
    (src/cluster_postprocess.cpp:60-157).

    Second CC over edges with dist <= dedup_dist -> dup groups; per group the
    representative (medoid) minimizes the sum of incident dup-edge distances,
    ties broken by longer doc then smaller id (:122-129).  Returns
    (doc_id, cluster_id, dup_group, rep_id, is_dup_rep).
    """
    tight = edges.where(F.col("dist") <= dedup_dist)
    groups = connected_components(tight)  # (doc_id, cluster_id=group min)
    groups = groups.withColumnRenamed("cluster_id", "dup_group")
    a = assignments.join(groups, "doc_id", "left").withColumn(
        "dup_group", F.coalesce(F.col("dup_group"), F.col("doc_id"))
    )
    # medoid score: sum of incident tight-edge distances within the group
    sym = tight.select(F.col("src").alias("doc_id"), "dist").union(
        tight.select(F.col("dst").alias("doc_id"), "dist")
    )
    scores = sym.groupBy("doc_id").agg(F.sum("dist").alias("tot_dist"))
    scored = (
        a.join(scores, "doc_id", "left")
        .withColumn("tot_dist", F.coalesce(F.col("tot_dist"), F.lit(0.0)))
        .join(doc_lens.select(F.col("doc_id"), F.col("len")), "doc_id", "left")
        .withColumn("len", F.coalesce(F.col("len"), F.lit(0)))
    )
    # medoid = argmin over (6dp-rounded score, -len, doc_id) via min_by — a
    # PARTIAL-AGGREGABLE aggregation, so a million-doc dup group is ordinary
    # combiner work instead of a single-partition window sort (skew-free at
    # scale).  Rounding the score first: float sums are order-dependent at
    # the 1e-15 level across partitions/engines, and the tie-break
    # (len desc, doc_id asc) must engage on true ties, not summation noise.
    # The ordering struct includes doc_id, so min_by never sees ties
    # (deterministic).
    ord_struct = F.struct(
        F.round(F.col("tot_dist"), 6).alias("s"),
        (-F.col("len")).alias("nl"),
        F.col("doc_id").alias("d"),
    )
    reps = scored.groupBy("dup_group").agg(
        F.min_by(F.col("doc_id"), ord_struct).alias("rep_id"))
    return (
        scored.join(reps, "dup_group")
        .select(
            "doc_id", "cluster_id", "dup_group", "rep_id",
            (F.col("doc_id") == F.col("rep_id")).alias("is_dup_rep"),
        )
    )


def k_reps_per_cluster(assignments: DataFrame, edges: DataFrame, k: int) -> DataFrame:
    """Up to k diverse representatives per cluster via farthest-point selection
    on the within-cluster distance graph (src/cluster_postprocess.cpp:184-327).

    Clusters are small after the threshold cut, so each group fits one
    applyInPandas call; missing pair distances are treated as 1.0.
    """
    sym = edges.select("src", "dst", "dist").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "dist")
    )
    ce = assignments.select("doc_id", "cluster_id").join(
        sym.withColumnRenamed("src", "doc_id"), "doc_id", "left"
    )

    def select_reps(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = pdf["cluster_id"].iloc[0]
        nodes = np.unique(pdf["doc_id"].to_numpy())
        dist = {}
        e = pdf.dropna(subset=["dst"])
        for s, d, w in zip(e["doc_id"].to_numpy(), e["dst"].to_numpy(dtype=np.int64),
                           e["dist"].to_numpy()):
            dist[(s, d)] = w
        # start from min doc_id (deterministic), greedily add farthest point
        reps = [int(nodes.min())]
        while len(reps) < min(k, len(nodes)):
            best, best_d = None, -1.0
            for cand in nodes:
                if cand in reps:
                    continue
                dmin = min(dist.get((cand, r), 1.0) for r in reps)
                if dmin > best_d or (dmin == best_d and (best is None or cand < best)):
                    best, best_d = int(cand), dmin
            reps.append(best)
        return pd.DataFrame({
            "cluster_id": [cid] * len(reps),
            "rep_id": reps,
            "rep_rank": list(range(len(reps))),
        })

    return ce.groupBy("cluster_id").applyInPandas(
        select_reps, schema="cluster_id long, rep_id long, rep_rank int"
    )


# ----------------------------------------------------------------- histograms

def density_histogram(edges: DataFrame, span: int = 100) -> DataFrame:
    """Per-doc neighbor counts per distance bucket, with cumulative count
    (src/MST.cpp:342-369,542-557; DENSE_SPAN=100)."""
    sym = edges.select(F.col("src").alias("doc_id"), "dist").union(
        edges.select(F.col("dst").alias("doc_id"), "dist")
    )
    bucketed = sym.withColumn(
        "bucket", F.least(F.floor(F.col("dist") * span), F.lit(span - 1)).cast("int")
    )
    counts = bucketed.groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return counts.withColumn("cum_cnt", F.sum("cnt").over(w))


def ani_histogram(edges: DataFrame) -> DataFrame:
    """Global 101-bucket histogram of ANI = 100*(1-dist) (src/MST.cpp:362-368)."""
    return (
        edges.withColumn("ani_bucket", F.floor((1.0 - F.col("dist")) * 100).cast("int"))
        .groupBy("ani_bucket").agg(F.count("*").alias("cnt"))
    )


def edge_length_stats(edges: DataFrame) -> DataFrame:
    """min/max/mean/stddev/quartiles over nonzero edge distances
    (src/MST.cpp:1743-1818; zero-dist filtered there too)."""
    nz = edges.where(F.col("dist") > 0)
    return nz.agg(
        F.count("*").alias("n_edges"),
        F.round(F.min("dist"), 6).alias("min_dist"),
        F.round(F.max("dist"), 6).alias("max_dist"),
        F.round(F.avg("dist"), 6).alias("mean_dist"),
        F.round(F.stddev_pop("dist"), 6).alias("std_dist"),
        F.round(F.expr("percentile(dist, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(dist, 0.5)"), 6).alias("median"),
        F.round(F.expr("percentile(dist, 0.75)"), 6).alias("q3"),
    )


def remove_noise(assignments: DataFrame, edges: DataFrame,
                 alpha: int = 2) -> DataFrame:
    """--dense noise removal (src/MST.cpp:189-211 getNoiseNode, 87-106
    modifyForest; driver src/sub_command.cpp:2104-2149).

    Per cluster: a member is noise if its within-threshold neighbor count
    (density) <= min(alpha, Q1 - 1) of the cluster's density distribution.
    Noise members' edges are removed and components re-run; noise docs get
    cluster_id = -1 (the reference prints them separately).
    """
    sym = edges.select(F.col("src").alias("doc_id")).union(
        edges.select(F.col("dst").alias("doc_id")))
    density = sym.groupBy("doc_id").agg(F.count("*").alias("density"))
    scored = (assignments.join(density, "doc_id", "left")
              .fillna(0, subset=["density"]))
    q1 = (scored.groupBy("cluster_id")
          .agg(F.expr("percentile(density, 0.25)").alias("q1"),
               F.count("*").alias("csize")))
    flagged = (scored.join(q1, "cluster_id")
               .withColumn("noise_cut",
                           F.least(F.lit(alpha).cast("double"), F.col("q1") - 1))
               .withColumn("is_noise",
                           (F.col("csize") > 2) & (F.col("density") <= F.col("noise_cut"))))
    noise_ids = flagged.where("is_noise").select("doc_id")
    clean_edges = (edges
                   .join(noise_ids.withColumnRenamed("doc_id", "src"), "src",
                         "left_anti")
                   .join(noise_ids.withColumnRenamed("doc_id", "dst"), "dst",
                         "left_anti"))
    membership = connected_components(clean_edges)
    keep = flagged.where(~F.col("is_noise")).select("doc_id")
    recluster = assignments_from_components(keep, membership)
    noise = noise_ids.select("doc_id",
                             F.lit(-1).cast("long").alias("cluster_id"),
                             F.lit(False).alias("is_rep"))
    return recluster.unionByName(noise)


# ------------------------------------------------------------------ formatter

def format_clusters_text(assignments_with_meta: pd.DataFrame) -> str:
    """CD-HIT-like text output parity (src/MST_IO.cpp:72-134): driver-side,
    for small collected results only.  Expects columns
    (cluster_id, local_idx, doc_id, len, name)."""
    lines = []
    df = assignments_with_meta.sort_values(["cluster_id", "local_idx"])
    for out_idx, (_, grp) in enumerate(df.groupby("cluster_id", sort=True)):
        lines.append(f"the cluster {out_idx} is:")
        for _, r in grp.iterrows():
            lines.append(f"\t{int(r.local_idx)}\t{int(r.doc_id)}\t{int(r.len)}\t{r['name']}")
    return "\n".join(lines) + "\n"


def format_repdb_stats(spark_or_stats, sketches: "DataFrame | None" = None,
                       cfg=None) -> str:
    """RepDB Statistics Report text formatter — output parity with the
    reference's print_stats sections (src/greedy.cpp:2656-2770): [Basic
    Info] / [Scale] / [Inverted Index] / [Cluster Size Distribution] /
    [Representative Sketch Sizes] / [Genome Coverage].

    ``spark_or_stats`` is the one-row DataFrame from :func:`repdb_stats`
    (with or without the coverage columns); ``sketches`` (doc_id, n, sig)
    optionally supplies the inverted-index and sketch-size sections.  All
    numbers come from partial-aggregable Spark aggs; only the single stats
    row is collected."""
    s = spark_or_stats.collect()[0]
    lines = [
        "=" * 40,
        "        RepDB Statistics Report",
        "=" * 40,
        "",
    ]
    if cfg is not None:
        lines += [
            "[Basic Info]",
            f"  Threshold:              {cfg.threshold}",
            f"  Shingle k:              {cfg.shingle_k}",
            f"  Sketch size:            {cfg.sketch_size}",
            f"  Pair mode:              {cfg.pair_mode}",
            "",
        ]
    lines += [
        "[Scale]",
        f"  Total docs:             {s['n_docs']}",
        f"  Representatives:        {s['n_reps']}",
        f"  Clusters:               {s['n_reps']}",
        f"  Compression ratio:      {s['compression_pct']:.2f}%",
        "",
    ]
    if sketches is not None:
        idx = sketches.select(F.explode("sig").alias("h")).groupBy("h") \
            .agg(F.count("*").alias("p")).agg(
                F.count("*").alias("uniq"),
                F.coalesce(F.sum("p"), F.lit(0)).alias("tot"),
                F.round(F.avg("p"), 2).alias("avg"),
                F.coalesce(F.max("p"), F.lit(0)).alias("mx")).collect()[0]
        lines += [
            "[Inverted Index]",
            f"  Unique hashes:          {idx['uniq']}",
            f"  Total postings:         {idx['tot']}",
            f"  Avg posting length:     {idx['avg']:.2f}",
            f"  Max posting length:     {idx['mx']}",
            "",
        ]
    singleton_pct = (100.0 * s["n_singletons"] / s["n_reps"]
                     if s["n_reps"] else 0.0)
    lines += [
        "[Cluster Size Distribution]",
        f"  Min cluster size:       {s['min_size']}",
        f"  Max cluster size:       {s['max_size']}",
        f"  Mean cluster size:      {s['mean_size']:.2f}",
        f"  Median cluster size:    {s['median_size']:.0f}",
        f"  Singletons:             {s['n_singletons']} ({singleton_pct:.1f}%)",
        f"  P90 cluster size:       {s['p90_size']:.0f}",
        f"  P95 cluster size:       {s['p95_size']:.0f}",
        f"  P99 cluster size:       {s['p99_size']:.0f}",
        "",
    ]
    if sketches is not None:
        sk = sketches.agg(F.min("n").alias("mn"), F.max("n").alias("mx"),
                          F.round(F.avg("n"), 1).alias("avg")).collect()[0]
        lines += [
            "[Representative Sketch Sizes]",
            f"  Min sketch size:        {sk['mn']}",
            f"  Max sketch size:        {sk['mx']}",
            f"  Mean sketch size:       {sk['avg']:.1f}",
            "",
        ]
    if "total_len" in s.asDict():
        lines += [
            "[Doc Coverage]",
            f"  Total text length:      {s['total_len']} chars",
            f"  Representative length:  {s['rep_len']} chars",
            f"  Coverage ratio:         {s['coverage_pct']:.2f}%",
            "",
        ]
    lines.append("=" * 40)
    return "\n".join(lines)
