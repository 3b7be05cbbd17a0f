"""Auto-threshold, stability, Newick/linkage trees (driver-side helpers)."""

import numpy as np

from rabbittclust_spark.operators.analysis import (
    ThresholdCandidate,
    find_threshold_candidates,
    recommend_shingle_k,
    select_optimal_threshold,
    threshold_stability,
)
from rabbittclust_spark.operators.trees import (
    build_newick,
    linkage_matrix,
    to_nexus,
    to_phylip,
)


def _edges_df(spark, dists):
    return spark.createDataFrame(
        [(i, i + 1000, float(d)) for i, d in enumerate(dists)],
        "src long, dst long, dist double")


def test_gap_candidate_found(spark):
    # two bands of distances with a big gap: 0.01-0.02 and 0.2-0.21
    dists = list(np.linspace(0.01, 0.02, 20)) + list(np.linspace(0.2, 0.21, 20))
    cands = find_threshold_candidates(_edges_df(spark, dists))
    best = select_optimal_threshold(cands)
    assert best is not None and best.source == "gap"
    assert 0.02 < best.threshold < 0.2


def test_stability(spark):
    dists = [0.01] * 50 + [0.049] * 5  # 5 edges hug the 0.05 threshold
    st = threshold_stability(_edges_df(spark, dists), 0.05, eps=0.002)
    assert st["n_flippable"] == 5
    assert abs(st["flip_rate"] - 5 / 55) < 1e-9
    st2 = threshold_stability(_edges_df(spark, [0.01] * 50), 0.05, eps=0.002)
    assert st2["stable"]


def test_select_empty():
    assert select_optimal_threshold([]) is None
    c = [ThresholdCandidate(0.1, "gap", 0.05, 0.9),
         ThresholdCandidate(0.05, "gap", 0.05, 0.9)]
    assert select_optimal_threshold(c).threshold == 0.05  # tie -> smaller


def test_recommend_k():
    assert recommend_shingle_k(10_000) >= 4
    assert recommend_shingle_k(10_000_000) > recommend_shingle_k(10_000)


def test_newick_chain():
    # 1-2 close, 3 farther
    nwk = build_newick([(1, 2, 0.02), (2, 3, 0.1)])
    assert nwk.endswith(";")
    assert nwk.count("(") == 2
    assert "1:" in nwk and "2:" in nwk and "3:" in nwk
    # closest pair merges first and deepest
    assert nwk.index("1:") > nwk.index("(")


def test_newick_disconnected():
    nwk = build_newick([(1, 2, 0.02)], nodes=[1, 2, 3])
    assert "3:" in nwk  # singleton joined at root


def test_phylip_nexus():
    nwk = build_newick([(1, 2, 0.02)])
    assert to_phylip(nwk).startswith("1\n(")
    nx = to_nexus(nwk, [1, 2])
    assert "#NEXUS" in nx and "NTAX=2" in nx and nwk in nx


def test_linkage_matrix_scipy_convention():
    rows = linkage_matrix([(10, 20, 0.02), (20, 30, 0.1)])
    # leaves 0,1,2 = docs 10,20,30; first merge (0,1,0.02,2) -> id 3
    assert rows[0] == (0, 1, 0.02, 2)
    assert rows[1] == (2, 3, 0.1, 3)
    # verify against scipy semantics by reconstructing sizes
    assert rows[-1][3] == 3


def test_threshold_report_golden(spark, tmp_path):
    """format_threshold_report output parity with printThresholdAnalysis
    (src/MST.cpp:2285-2375): section layout + exact stat lines on a
    deterministic two-band distribution."""
    from rabbittclust_spark.operators.analysis import write_threshold_report

    dists = [0.01, 0.02, 0.03, 0.2, 0.21]
    path = str(tmp_path / "threshold_analysis.txt")
    text = write_threshold_report(_edges_df(spark, dists), path)
    assert open(path).read() == text

    lines = text.splitlines()
    assert lines[0] == "# Automatic Threshold Selection Analysis"
    for section in ("## Edge Length Statistics",
                    "## Optimal Threshold (Recommended)",
                    "## All Candidate Thresholds",
                    "## Edge Length Distribution (sorted)"):
        assert section in lines
    assert "Total edges: 5" in lines
    assert "Min distance: 0.010000" in lines
    assert "Max distance: 0.210000" in lines
    assert "Median distance: 0.030000" in lines
    assert "Range: 0.200000" in lines
    # the 0.03 -> 0.2 gap is the breakpoint; recommended inside it
    thr = float(next(l for l in lines if l.startswith("Threshold: "))
                .split(": ")[1])
    assert 0.03 < thr < 0.2
    assert any(l.startswith("Source: gap-based") for l in lines)
    # candidate TSV header + at least one gap row
    assert "# Threshold\tConfidence\tSource\tGap_Score" in lines
    assert any("\tgap\t" in l for l in lines)
    # sorted distribution with index column
    i = lines.index("# Index\tDistance")
    assert lines[i + 1] == "0\t0.010000"
    assert lines[i + 5] == "4\t0.210000"


def test_threshold_report_truncation_and_empty(spark):
    from rabbittclust_spark.operators.analysis import format_threshold_report

    dists = list(np.linspace(0.01, 0.3, 50))
    text = format_threshold_report(_edges_df(spark, dists),
                                   max_distribution_rows=10)
    assert "# ... truncated: 40 more rows" in text

    empty = format_threshold_report(
        spark.createDataFrame([], "src long, dst long, dist double"))
    assert "No nonzero edges" in empty
