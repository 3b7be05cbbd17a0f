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


def format_threshold_report(edges: DataFrame, min_gap_frac: float = 0.05,
                            histogram: bool = False, buckets: int = 1000,
                            max_distribution_rows: int = 10_000) -> str:
    """Threshold-analysis text report, output-parity with the reference's
    printThresholdAnalysis (src/MST.cpp:2285-2375): header, edge-length
    statistics, recommended threshold (+ stability block), candidate TSV,
    sorted edge-length distribution.

    One Spark agg for the stats; candidates/stability reuse the operators
    above.  The distribution dump is capped at ``max_distribution_rows``
    with an explicit truncation note (the reference dumps every MST edge —
    at most n-1 rows on genomes; web-scale edge sets use the cap or
    histogram=True, never an unbounded collect).
    """
    from rabbittclust_spark.operators.postprocess import edge_length_stats

    s = edge_length_stats(edges).collect()[0]
    n = int(s["n_edges"] or 0)
    lines = [
        "# Automatic Threshold Selection Analysis",
        "# Based on Similarity Graph Edge Length Distribution",
        "# ===========================================",
        "",
        "## Edge Length Statistics",
        f"Total edges: {n}",
    ]
    if n == 0:
        lines += ["", "## Optimal Threshold (Recommended)",
                  "No nonzero edges: analysis unavailable.", ""]
        return "\n".join(lines)
    lines += [
        f"Min distance: {s['min_dist']:.6f}",
        f"Max distance: {s['max_dist']:.6f}",
        f"Mean distance: {s['mean_dist']:.6f}",
        f"Median distance: {s['median']:.6f}",
        f"Q1 (25%): {s['q1']:.6f}",
        f"Q3 (75%): {s['q3']:.6f}",
        f"Standard deviation: {s['std_dist']:.6f}",
        f"Range: {s['max_dist'] - s['min_dist']:.6f}",
        "",
    ]

    cands = find_threshold_candidates(edges, min_gap_frac=min_gap_frac,
                                      histogram=histogram, buckets=buckets)
    opt = select_optimal_threshold(cands)
    lines.append("## Optimal Threshold (Recommended)")
    if opt is None:
        lines += ["No candidate thresholds (degenerate distribution).", ""]
    else:
        stab = threshold_stability(edges, opt.threshold)
        lines += [
            f"Threshold: {opt.threshold:.6f}",
            f"Confidence: {opt.confidence:.3f}",
            f"Stability (overall): {1.0 - stab['flip_rate']:.3f}",
            f"  - Near edges evaluated: {stab['n_flippable']}",
        ]
        if opt.source == "gap":
            lines += [f"Gap score: {opt.gap_size:.6f}",
                      "Source: gap-based detection (natural breakpoint in "
                      "edge distribution)"]
        else:
            lines += ["Source: percentile-based (median/quartile, no "
                      "significant gap detected)",
                      "Note: This threshold is based on distribution "
                      "statistics, not natural breakpoints.",
                      "      Consider manual adjustment if needed."]
        lines.append("")

    lines += ["## All Candidate Thresholds",
              "# Threshold\tConfidence\tSource\tGap_Score"]
    for c in cands:
        lines.append(f"{c.threshold:.6f}\t{c.confidence:.3f}\t{c.source}"
                     f"\t{c.gap_size:.6f}")
    lines.append("")

    lines += ["## Edge Length Distribution (sorted)", "# Index\tDistance"]
    dist = _edge_distances(edges, histogram, buckets)
    shown = dist[:max_distribution_rows]
    lines += [f"{i}\t{d:.6f}" for i, d in enumerate(shown)]
    if len(dist) > len(shown):
        lines.append(f"# ... truncated: {len(dist) - len(shown)} more rows "
                     f"(max_distribution_rows={max_distribution_rows})")
    lines.append("")
    return "\n".join(lines)


def write_threshold_report(edges: DataFrame, path: str, **kwargs) -> str:
    """Write format_threshold_report to ``path``; returns the text."""
    text = format_threshold_report(edges, **kwargs)
    with open(path, "w") as f:
        f.write(text)
    return text
