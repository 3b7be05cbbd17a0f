"""DBSCAN on the eps-edge graph vs a classic reference implementation."""

import random
from collections import deque


def _classic_dbscan(n, edges, eps, min_pts):
    """Textbook DBSCAN with deterministic border tie-break (min cluster)."""
    adj = {i: set() for i in range(n)}
    for u, v, d in edges:
        if d <= eps:
            adj[u].add(v)
            adj[v].add(u)
    core = {i for i in range(n) if len(adj[i]) + 1 >= min_pts}
    label = {}
    for start in sorted(core):
        if start in label:
            continue
        label[start] = start
        dq = deque([start])
        while dq:
            x = dq.popleft()
            for y in adj[x]:
                if y in core and y not in label:
                    label[y] = label[start]
                    dq.append(y)
    # canonicalize cluster ids to component min
    comp_min = {}
    for node, lab in label.items():
        comp_min[lab] = min(comp_min.get(lab, node), node)
    label = {nd: comp_min[lab] for nd, lab in label.items()}
    out = {}
    for i in range(n):
        if i in label:
            out[i] = (label[i], "core")
        else:
            cands = sorted(label[y] for y in adj[i] if y in core)
            out[i] = (cands[0], "border") if cands else (-1, "noise")
    return out


def test_dbscan_matches_classic(spark):
    from rabbittclust_spark.operators.dbscan import dbscan

    rng = random.Random(5)
    n = 50
    edges = []
    # two dense blobs + sparse bridge + isolated points
    for blob in (range(0, 15), range(20, 35)):
        blob = list(blob)
        for _ in range(60):
            u, v = rng.sample(blob, 2)
            edges.append((u, v, 0.01))
    edges.append((40, 41, 0.01))  # pair below min_pts -> noise
    eps, min_pts = 0.05, 4
    expected = _classic_dbscan(n, edges, eps, min_pts)

    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    e = spark.createDataFrame(list({(u, v, d) for u, v, d in edges}),
                              "src long, dst long, dist double")
    got = {r.doc_id: (r.cluster_id, r.role)
           for r in dbscan(docs, e, eps, min_pts).collect()}
    assert got == expected


def test_dbscan_all_noise(spark):
    from rabbittclust_spark.operators.dbscan import dbscan

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    e = spark.createDataFrame([(0, 1, 0.01)], "src long, dst long, dist double")
    got = {r.doc_id: (r.cluster_id, r.role)
           for r in dbscan(docs, e, 0.05, min_pts=5).collect()}
    assert all(v == (-1, "noise") for v in got.values())
