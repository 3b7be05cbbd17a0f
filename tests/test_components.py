"""Connected components: equivalence vs BFS oracle (src/MST.cpp:109-142
generateClusterWithBfs) on random graphs + edge-order invariance
(SURVEY.md §5 property tests)."""

import random
from collections import defaultdict, deque

from rabbittclust_spark.operators.components import connected_components


def _bfs_components(n_nodes, edges):
    """Reference-style BFS clustering (src/MST.cpp:109-142)."""
    adj = defaultdict(list)
    nodes = set()
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
        nodes.update((u, v))
    seen = {}
    for start in sorted(nodes):
        if start in seen:
            continue
        comp = []
        dq = deque([start])
        seen[start] = True
        while dq:
            x = dq.popleft()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen[y] = True
                    dq.append(y)
        root = min(comp)
        for x in comp:
            seen[x] = root
    return {x: seen[x] for x in nodes}


def _spark_cc(spark, edges, driver_cutoff=2_000_000):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, driver_cutoff=driver_cutoff).collect()
    return {r.doc_id: r.cluster_id for r in rows}


def test_cc_matches_bfs_random_graphs(spark):
    """Both the distributed star path (driver_cutoff=0) and the driver
    union-find fast path must match the BFS oracle."""
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(80)]
        edges = [(u, v) for u, v in edges if u != v]
        expected = _bfs_components(n, edges)
        assert _spark_cc(spark, edges, driver_cutoff=0) == expected, f"dist {trial}"
        assert _spark_cc(spark, edges) == expected, f"driver {trial}"


def test_cc_edge_order_invariance(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(50)]
    edges = [(u, v) for u, v in edges if u != v]
    a = _spark_cc(spark, edges)
    rng.shuffle(edges)
    reversed_edges = [(v, u) for u, v in edges]
    b = _spark_cc(spark, reversed_edges)
    assert a == b


def test_cc_chain_and_star(spark):
    # long chain (worst case for naive propagation) + star; distributed path
    chain = [(i, i + 1) for i in range(30)]
    star = [(100, 100 + i) for i in range(1, 20)]
    got = _spark_cc(spark, chain + star, driver_cutoff=0)
    assert all(got[i] == 0 for i in range(31))
    assert all(got[100 + i] == 100 for i in range(20))


def test_cc_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0
