"""Tree / dendrogram sinks: Newick, PHYLIP, NEXUS, scipy-style linkage.

Reference:
- Newick construction: sorted-edge single-linkage agglomeration, branch
  length = merge height - child height (src/MST.cpp:1044-1238)
- sinks: Newick / PHYLIP ("1\\n<newick>") / NEXUS (TAXA+TREES blocks)
  (src/MST_IO.cpp:252-344)
- linkage matrix: union-find over distance-sorted edges -> rows
  (c1, c2, dist, size) (src/MST.cpp:1241-1287, src/MST.h:64-69)

All driver-side: after the threshold cut a cluster's edge set is <= N-1 rows
(the reference collects the same).  Callers pass the collected edge list of
one cluster (or the whole <=d forest for a global dendrogram).
"""

from __future__ import annotations


class _Agglom:
    def __init__(self, nodes: list[int]):
        self.parent = {n: n for n in nodes}
        self.newick = {n: str(n) for n in nodes}
        self.height = {n: 0.0 for n in nodes}
        self.size = {n: 1 for n in nodes}

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x


def build_newick(edges: list[tuple[int, int, float]],
                 nodes: list[int] | None = None) -> str:
    """Single-linkage Newick from an edge list (src/MST.cpp:1044-1148).

    Branch length = merge height - child subtree height.  Disconnected parts
    are joined at the root with branch length 0 (reference prints one tree
    per cluster; this helper does the same when given one cluster's edges).
    """
    if nodes is None:
        nodes = sorted({n for e in edges for n in e[:2]})
    if not nodes:
        return ";"
    a = _Agglom(nodes)
    for u, v, d in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ru, rv = a.find(u), a.find(v)
        if ru == rv:
            continue
        h = d / 2.0  # ultrametric height at merge (src/MST.cpp:1096-1115)
        bl_u = max(h - a.height[ru], 0.0)
        bl_v = max(h - a.height[rv], 0.0)
        merged = f"({a.newick[ru]}:{bl_u:.6f},{a.newick[rv]}:{bl_v:.6f})"
        root = min(ru, rv)
        other = max(ru, rv)
        a.parent[other] = root
        a.newick[root] = merged
        a.height[root] = h
        a.size[root] = a.size[ru] + a.size[rv]
    roots = sorted({a.find(n) for n in nodes})
    if len(roots) == 1:
        return a.newick[roots[0]] + ";"
    inner = ",".join(f"{a.newick[r]}:0.000000" for r in roots)
    return f"({inner});"


def to_phylip(newick: str) -> str:
    """PHYLIP wrapper: tree count line + newick (src/MST_IO.cpp:289-303)."""
    return f"1\n{newick}\n"


def to_nexus(newick: str, taxa: list[int]) -> str:
    """NEXUS TAXA + TREES blocks (src/MST_IO.cpp:305-344)."""
    labels = "\n".join(f"\t\t{t}" for t in taxa)
    return (
        "#NEXUS\n"
        "BEGIN TAXA;\n"
        f"\tDIMENSIONS NTAX={len(taxa)};\n"
        "\tTAXLABELS\n"
        f"{labels}\n"
        "\t;\n"
        "END;\n"
        "BEGIN TREES;\n"
        f"\tTREE cluster = {newick}\n"
        "END;\n"
    )


def linkage_matrix(edges: list[tuple[int, int, float]],
                   nodes: list[int] | None = None
                   ) -> list[tuple[int, int, float, int]]:
    """scipy-style linkage rows (c1, c2, dist, size) via union-find over
    distance-sorted edges (src/MST.cpp:1241-1287).

    Leaf ids are the positions of ``nodes`` (sorted); internal cluster i is
    n_leaves + i, exactly scipy's convention.
    """
    if nodes is None:
        nodes = sorted({n for e in edges for n in e[:2]})
    return _linkage_simple(edges, nodes)


def _linkage_simple(edges, nodes):
    idx = {n: i for i, n in enumerate(nodes)}
    n_leaves = len(nodes)
    root = {i: i for i in range(n_leaves)}        # member -> root slot
    comp = {i: (i, 1) for i in range(n_leaves)}   # root slot -> (linkage id, size)

    def find(x):
        while root[x] != x:
            root[x] = root[root[x]]
            x = root[x]
        return x

    rows = []
    next_id = n_leaves
    for u, v, d in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ru, rv = find(idx[u]), find(idx[v])
        if ru == rv:
            continue
        (c1, s1), (c2, s2) = comp[ru], comp[rv]
        lo, hi = (c1, c2) if c1 < c2 else (c2, c1)
        rows.append((lo, hi, float(d), s1 + s2))
        root[rv] = ru
        comp[ru] = (next_id, s1 + s2)
        next_id += 1
    return rows
