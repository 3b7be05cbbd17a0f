"""Threshold analysis: auto-threshold selection + stability (driver-side).

Reference semantics:
- findThresholdCandidates (src/MST.cpp:1962-2197): candidates from (a) gaps
  in the sorted edge-length distribution larger than 5-10% of the range and
  (b) fixed percentiles; each scored by gap size / separation confidence.
- selectOptimalThreshold (src/MST.cpp:2199-2283): pick the max-score
  candidate.
- threshold stability (src/MST.cpp:1829-1960): flip rate of near-threshold
  edges under +-eps perturbation.
- edge-length stats (src/MST.cpp:1743-1818).

These operate on the edge-distance distribution.  For cluster extraction the
relevant edges are at most O(docs) after the candidate filters, and the
reference itself collects them on one node — here only the (small) distance
column is collected, never the documents; at 10^12-doc scale collect a
percentile-bucketed histogram instead (same API, histogram=True).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ThresholdCandidate:
    # analog of reference ThresholdCandidate (src/MST.h:77-88)
    threshold: float
    source: str          # "gap" | "percentile"
    gap_size: float
    confidence: float


def _edge_distances(edges: DataFrame, histogram: bool, buckets: int) -> np.ndarray:
    nz = edges.where(F.col("dist") > 0)
    if not histogram:
        return np.sort(np.array([r["dist"] for r in nz.select("dist").collect()]))
    # scale path: fixed-width histogram -> representative points
    agg = (nz.select((F.floor(F.col("dist") * buckets)).cast("int").alias("b"))
           .groupBy("b").agg(F.count("*").alias("c")).orderBy("b").collect())
    pts = []
    for r in agg:
        center = (r["b"] + 0.5) / buckets
        pts.extend([center] * min(int(r["c"]), 10_000))
    return np.asarray(pts)


def find_threshold_candidates(edges: DataFrame, min_gap_frac: float = 0.05,
                              histogram: bool = False, buckets: int = 1000
                              ) -> list[ThresholdCandidate]:
    """Gap + percentile candidates (src/MST.cpp:1962-2197)."""
    d = _edge_distances(edges, histogram, buckets)
    out: list[ThresholdCandidate] = []
    if len(d) < 2:
        return out
    rng = float(d[-1] - d[0])
    if rng <= 0:
        return out
    gaps = np.diff(d)
    for i in np.argsort(gaps)[::-1][:10]:
        g = float(gaps[i])
        if g < min_gap_frac * rng:
            break
        thr = float((d[i] + d[i + 1]) / 2)
        out.append(ThresholdCandidate(
            threshold=thr, source="gap", gap_size=g,
            confidence=min(1.0, g / rng / min_gap_frac / 2)))
    for p in (25, 50, 75, 90):
        thr = float(np.percentile(d, p))
        out.append(ThresholdCandidate(threshold=thr, source="percentile",
                                      gap_size=0.0, confidence=0.3))
    return out


def select_optimal_threshold(candidates: list[ThresholdCandidate]
                             ) -> ThresholdCandidate | None:
    """Max-confidence candidate, ties toward smaller threshold
    (src/MST.cpp:2199-2283)."""
    if not candidates:
        return None
    return min(candidates, key=lambda c: (-c.confidence, c.threshold))


def threshold_stability(edges: DataFrame, threshold: float,
                        eps: float | None = None) -> dict:
    """Flip rate of near-threshold edges under +-eps (src/MST.cpp:1829-1960).

    Returns {"eps", "n_edges", "n_flippable", "flip_rate", "stable"}.
    """
    if eps is None:
        eps = max(threshold * 0.05, 1e-6)  # adaptive window (:1899-1912)
    row = edges.agg(
        F.count("*").alias("n"),
        F.sum(F.when((F.col("dist") > threshold - eps)
                     & (F.col("dist") <= threshold + eps), 1)
              .otherwise(0)).alias("flip"),
    ).collect()[0]
    n, flip = int(row["n"]), int(row["flip"] or 0)
    rate = flip / n if n else 0.0
    return {"eps": eps, "n_edges": n, "n_flippable": flip,
            "flip_rate": rate, "stable": rate < 0.05}


def recommend_shingle_k(max_doc_len: int, q: float = 1e-4,
                        alphabet: int = 64) -> int:
    """k heuristic from max doc size (reference tune_parameters,
    src/sub_command.cpp:2410-2430: k = ceil(log_sigma(len*(1-q)/q)),
    sigma=4 for DNA; text uses an effective-alphabet estimate)."""
    import math
    return max(4, math.ceil(math.log(max_doc_len * (1 - q) / q, alphabet)))
