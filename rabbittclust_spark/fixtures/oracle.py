"""Single-process numpy reference oracle (FIXTURES.md "reference-parity
oracle").

Implements the reference pipeline semantics end-to-end in one process with
the SAME sketch kernels the Spark UDFs use (functions/minhash.py), the same
distance formulas (src/MST.cpp:514-540), the same pruning bounds
(src/MST.cpp:26-37,504-512; src/greedy.cpp:649-653), and cluster extraction
as connected components of the <=d graph — provably identical to the
reference's MST-cut + BFS clustering (src/MST.cpp:59-142), since
single-linkage clusters at threshold d are the components of the <=d
subgraph.

Candidate generation uses an exact inverted index (hash -> posting list),
the reference's own structure (src/SketchInfo.h:59-161) — no LSH
approximation, so oracle clusters are the ground truth the Spark pipeline's
recall >= 0.99 is measured against.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from rabbittclust_spark.config import PipelineConfig
from rabbittclust_spark.functions.minhash import (
    bottom_s_sketch,
    jaccard_from_common,
    mash_distance,
    containment_distance,
    containment_sketch_size,
    frac_minhash_sketch,
)


class UnionFind:
    """Path-compressed union-find (reference: src/UnionFind.h:5-90)."""

    def __init__(self, n: int) -> None:
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def oracle_sketches(texts: list[str], cfg: PipelineConfig) -> dict[int, np.ndarray]:
    out = {}
    for i, t in enumerate(texts):
        if t is None or len(t) < cfg.min_len:
            continue
        if cfg.containment:
            size = containment_sketch_size(len(t), cfg.contain_compress,
                                           cfg.min_sketch_size)
            out[i] = bottom_s_sketch(t, cfg.shingle_k, size, seed=cfg.hash_seed,
                                     lowercase=cfg.lowercase)
        else:
            out[i] = bottom_s_sketch(t, cfg.shingle_k, cfg.sketch_size,
                                     seed=cfg.hash_seed, lowercase=cfg.lowercase)
    return out


def oracle_edges(sketches: dict[int, np.ndarray], cfg: PipelineConfig
                 ) -> list[tuple[int, int, float]]:
    """Exact pair distances via inverted-index candidate generation."""
    postings: dict[int, list[int]] = defaultdict(list)
    for i, sig in sketches.items():
        for h in sig.tolist():
            postings[h].append(i)
    common: dict[tuple[int, int], int] = defaultdict(int)
    for docs in postings.values():
        if len(docs) < 2:
            continue
        for ai in range(len(docs)):
            for bi in range(ai + 1, len(docs)):
                a, b = docs[ai], docs[bi]
                if a > b:
                    a, b = b, a
                common[(a, b)] += 1
    max_ratio = cfg.max_size_ratio()
    jmin = cfg.jaccard_min()
    edges = []
    for (a, b), c in common.items():
        n1, n2 = len(sketches[a]), len(sketches[b])
        if max(n1, n2) > max_ratio * min(n1, n2):
            continue
        if c < np.ceil(jmin * (n1 + n2) / (1 + jmin)):
            continue
        if cfg.containment:
            d = containment_distance(c, n1, n2, cfg.distance_k)
        else:
            d = mash_distance(jaccard_from_common(c, n1, n2), cfg.distance_k)
        if d <= cfg.threshold:
            edges.append((a, b, d))
    return edges


def oracle_clusters(texts: list[str], cfg: PipelineConfig,
                    doc_ids: list[int] | None = None) -> dict[int, int]:
    """doc_id -> cluster_id (= min doc_id of the component).  Docs below
    min_len are dropped (reference minLen semantics)."""
    sketches = oracle_sketches(texts, cfg)
    edges = oracle_edges(sketches, cfg)
    idx = sorted(sketches)
    pos = {d: i for i, d in enumerate(idx)}
    uf = UnionFind(len(idx))
    for a, b, _ in edges:
        uf.union(pos[a], pos[b])
    ids = doc_ids or list(range(len(texts)))
    roots: dict[int, int] = {}
    out = {}
    for d in idx:
        r = uf.find(pos[d])
        if r not in roots:
            roots[r] = ids[d]  # idx sorted => first hit is the min doc id
        out[ids[d]] = roots[r]
    return out


# --------------------------------------------------------------- evaluation

def co_clustered_pairs(assign: dict[int, int]) -> set[tuple[int, int]]:
    groups: dict[int, list[int]] = defaultdict(list)
    for d, c in assign.items():
        groups[c].append(d)
    pairs = set()
    for members in groups.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def dup_pair_recall(oracle: dict[int, int], predicted: dict[int, int]
                    ) -> tuple[float, float]:
    """(recall, precision) of predicted co-clustered pairs vs oracle's."""
    truth = co_clustered_pairs(oracle)
    pred = co_clustered_pairs(predicted)
    if not truth:
        return 1.0, 1.0 if not pred else 0.0
    tp = len(truth & pred)
    recall = tp / len(truth)
    precision = tp / len(pred) if pred else 1.0
    return recall, precision


def nmi(labels_a: list[int], labels_b: list[int]) -> float:
    """Normalized mutual information (arithmetic normalization), mirroring
    the reference's getNMI.py evaluation
    (/root/reference/benchmark/evaluation/getNMI.py:24-29)."""
    a = np.asarray(labels_a)
    b = np.asarray(labels_b)
    n = len(a)
    ua, ia = np.unique(a, return_inverse=True)
    ub, ib = np.unique(b, return_inverse=True)
    cont = np.zeros((len(ua), len(ub)))
    np.add.at(cont, (ia, ib), 1)
    pij = cont / n
    pi = pij.sum(axis=1, keepdims=True)
    pj = pij.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        mi = np.nansum(pij * np.log(pij / (pi @ pj)))
        ha = -np.nansum(pi * np.log(pi))
        hb = -np.nansum(pj * np.log(pj))
    if ha == 0 and hb == 0:
        return 1.0
    return float(2 * mi / (ha + hb)) if (ha + hb) > 0 else 0.0
