"""Community detection: resolution-parameterized weighted label propagation
("Leiden-lite").

The reference's clust-leiden (src/leiden.cpp:295-471) calls igraph
community_multilevel / community_leiden on the similarity graph with
edge weight = 1 - dist and a resolution parameter (min-max weight
normalization for Leiden, :372-396).  It is disabled in the reference's
default build (CMakeLists.txt:9), so exact igraph parity is not a target;
this operator closes the §2.8 gap with the same graph semantics and knob:

  score(u -> community L) = w(u, L) - resolution * k_u * (K_L - 1[u in L] k_u) / 2m

the classic Louvain modularity gain (Blondel et al. 2008, eq. 2) restricted
to neighbor communities — evaluated for every node SYNCHRONOUSLY per
iteration with pure DataFrame joins/aggregations, ties broken by minimum
community id (deterministic, order-free).  Iterations stop when no label
changes, an oscillation is detected (label-set fingerprint repeats), or
max_iter is hit.

Single-process numpy twin `label_propagation_reference` implements the
identical update rule; equality on small graphs is tested in
tests/test_leiden.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prep_graph(edges: DataFrame, src: str, dst: str, dist_col: str | None):
    """Symmetrized weighted edges (u, v, w): w = 1 - dist (clamped >= 0),
    or 1.0 when the edge set has no distance column."""
    if dist_col is not None:
        w = F.greatest(F.lit(0.0), 1.0 - F.col(dist_col))
    else:
        w = F.lit(1.0)
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"), w.alias("w")) \
        .where(F.col("u") != F.col("v"))
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))


def knn_cap_edges(edges: DataFrame, k: int, src: str = "src",
                  dst: str = "dst", dist_col: str = "dist") -> DataFrame:
    """Per-node k-NN edge cap (reference --knn, src/leiden.cpp:195-231 and
    src/dbscan.cpp:221-365): keep an edge iff it is among either endpoint's
    k smallest-distance edges (the reference's per-node max-heap keeps the
    union).  Ties broken by (dist, neighbor id) for determinism."""
    from pyspark.sql import Window

    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"),
                     F.col(dist_col).alias("dist"))
    sym = e.select("src", "dst", "dist").union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "dist"))
    w = Window.partitionBy("src").orderBy(F.col("dist").asc(),
                                          F.col("dst").asc())
    kept = (sym.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .select(F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"))
            .distinct())
    return kept.join(
        e.select(F.least("src", "dst").alias("src"),
                 F.greatest("src", "dst").alias("dst"), "dist").distinct(),
        ["src", "dst"])


def label_propagation(edges: DataFrame, resolution: float = 1.0,
                      max_iter: int = 20, src: str = "src", dst: str = "dst",
                      dist_col: str | None = "dist",
                      knn: int | None = None,
                      driver_cutoff: int = 2_000_000) -> DataFrame:
    """edges -> (doc_id, community) for every node appearing in edges.

    Community ids are label values (node ids); singletons are absent —
    attach them exactly like connected-components consumers do.  ``knn``
    applies the reference's --knn per-node edge cap before propagation.

    Edge sets at or below ``driver_cutoff`` rows run the single-process twin
    on collected edges (same update rule and tie-breaks — equality is tested
    in tests/test_leiden.py), exactly like connected_components' driver
    union-find cutoff; larger graphs run the distributed iterations.  Set
    driver_cutoff=0 to force the distributed path.
    """
    from rabbittclust_spark.sources.tables import materialize

    if knn is not None:
        if dist_col is None:
            raise ValueError("knn cap requires a distance column")
        edges = knn_cap_edges(edges, knn, src=src, dst=dst, dist_col=dist_col)
        src, dst, dist_col = "src", "dst", "dist"
    if driver_cutoff:
        n_edges = edges.count()
        if n_edges <= driver_cutoff:
            cols = [src, dst] + ([dist_col] if dist_col is not None else [])
            pdf = edges.select(*cols).toPandas()
            triples = [
                (int(r[0]), int(r[1]),
                 float(r[2]) if dist_col is not None else 0.0)
                for r in pdf.itertuples(index=False)
            ]
            labels = label_propagation_reference(triples,
                                                 resolution=resolution,
                                                 max_iter=max_iter)
            out = [(int(u), int(c)) for u, c in sorted(labels.items())]
            return edges.sparkSession.createDataFrame(
                out or [], "doc_id long, community long")
    sym = materialize(_prep_graph(edges, src, dst, dist_col), "lpa_sym")
    deg = sym.groupBy("u").agg(F.sum("w").alias("k"))
    m2_row = sym.agg(F.coalesce(F.sum("w"), F.lit(0.0)).alias("s")).collect()[0]
    m2 = float(m2_row["s"])  # = 2m (both directions summed)
    if m2 <= 0:
        return edges.sparkSession.createDataFrame([], "doc_id long, community long")

    labels = deg.select(F.col("u"), F.col("u").alias("label"))
    seen_fps: list[tuple[int, int]] = []
    for _ in range(max_iter):
        labels = materialize(labels, "lpa_labels")
        # community weighted-degree totals K_L
        K = (labels.join(deg, "u")
             .groupBy("label").agg(F.sum("k").alias("K_L")))
        # weight from u to each neighbor community
        nbr_w = (sym.join(labels.withColumnRenamed("u", "v")
                          .withColumnRenamed("label", "nlabel"), "v")
                 .groupBy("u", "nlabel").agg(F.sum("w").alias("w_ul")))
        # ensure the CURRENT label is always a candidate (w_ul=0 if no
        # neighbor shares it) so an isolated-in-community node can stay put
        cur = labels.select("u", F.col("label").alias("nlabel"),
                            F.lit(0.0).alias("w_ul"))
        cand = (nbr_w.unionByName(cur)
                .groupBy("u", "nlabel").agg(F.max("w_ul").alias("w_ul")))
        scored = (
            cand.join(deg, "u")
            .join(labels, "u")
            .join(K.withColumnRenamed("label", "nlabel"), "nlabel")
            .withColumn(
                "K_other",
                F.col("K_L") - F.when(F.col("nlabel") == F.col("label"),
                                      F.col("k")).otherwise(F.lit(0.0)))
            .withColumn(
                "score",
                F.col("w_ul") - F.lit(resolution) * F.col("k") * F.col("K_other")
                / F.lit(m2))
        )
        best = scored.groupBy("u").agg(
            F.min(F.struct(F.round(-F.col("score"), 9).alias("neg"),
                           F.col("nlabel").alias("l"))).alias("b"))
        new_labels = best.select("u", F.col("b.l").alias("label"))
        # convergence: label multiset fingerprint (order-free, exact)
        fp_row = new_labels.agg(
            F.count("*").alias("c"),
            F.coalesce(F.sum(F.xxhash64("u", "label").cast("decimal(38,0)")),
                       F.lit(0).cast("decimal(38,0)")).alias("s")).collect()[0]
        fp = (int(fp_row["c"]), int(fp_row["s"]))
        labels = new_labels
        if fp in seen_fps:
            # converged (fp == previous) or oscillating (fp == any earlier):
            # stop deterministically either way
            break
        seen_fps.append(fp)
    return labels.select(F.col("u").alias("doc_id"),
                         F.col("label").alias("community"))


def label_propagation_reference(edge_list, resolution: float = 1.0,
                                max_iter: int = 20):
    """Single-process twin of :func:`label_propagation` (same update rule,
    same tie-breaks) for equivalence tests.  edge_list: [(u, v, dist), ...].
    Returns {node: community}."""
    import collections

    w = collections.defaultdict(float)
    nodes = set()
    for u, v, d in edge_list:
        if u == v:
            continue
        wt = max(0.0, 1.0 - d)
        w[(u, v)] += wt
        w[(v, u)] += wt
        nodes.add(u)
        nodes.add(v)
    adj = collections.defaultdict(dict)
    for (u, v), wt in w.items():
        adj[u][v] = wt
    k = {u: sum(adj[u].values()) for u in nodes}
    m2 = sum(k.values())
    if m2 <= 0:
        return {}
    labels = {u: u for u in nodes}
    seen = []
    for _ in range(max_iter):
        K = collections.defaultdict(float)
        for u in nodes:
            K[labels[u]] += k[u]
        new = {}
        for u in nodes:
            w_ul = collections.defaultdict(float)
            for v, wt in adj[u].items():
                w_ul[labels[v]] += wt
            w_ul.setdefault(labels[u], 0.0)
            best = None
            for L, wl in w_ul.items():
                K_other = K[L] - (k[u] if labels[u] == L else 0.0)
                score = wl - resolution * k[u] * K_other / m2
                cand = (round(-score, 9), L)
                if best is None or cand < best:
                    best = cand
            new[u] = best[1]
        fp = tuple(sorted(new.items()))
        labels = new
        if fp in seen:  # converged or oscillating — same rule as Spark side
            break
        seen.append(fp)
    return labels
