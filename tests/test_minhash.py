"""Unit/property tests: MinHash sketches + distance math
(reference formulas src/MST.cpp:514-540, src/greedy.cpp:73-147)."""

import math
import random

import numpy as np
import pytest

from rabbittclust_spark.config import PipelineConfig
from rabbittclust_spark.functions.minhash import (
    band_hashes,
    bottom_s_sketch,
    containment_distance,
    frac_minhash_sketch,
    jaccard_from_common,
    kperm_signature,
    mash_distance,
    sketch_common,
)


def _doc(rng: random.Random, n_tokens: int = 2000) -> str:
    words = [f"w{i:03d}" for i in range(500)]
    return " ".join(rng.choices(words, k=n_tokens))


def _mutate(text: str, rate: float, rng: random.Random) -> str:
    return " ".join(t if rng.random() > rate else "MUT" + t
                    for t in text.split())


def test_bottom_s_is_smallest_sorted():
    t = _doc(random.Random(0))
    s = bottom_s_sketch(t, 21, 100)
    full = bottom_s_sketch(t, 21, 10**9)
    assert len(s) == 100
    assert np.array_equal(s, np.sort(full)[:100])


def test_jaccard_estimate_within_ci():
    """MinHash Jaccard estimate close to true shingle-set Jaccard."""
    rng = random.Random(7)
    t1 = _doc(rng)
    t2 = _mutate(t1, 0.05, rng)
    from rabbittclust_spark.functions.hashing import shingle_hashes
    h1, h2 = shingle_hashes(t1, 21), shingle_hashes(t2, 21)
    true_j = len(np.intersect1d(h1, h2)) / len(np.union1d(h1, h2))
    s1, s2 = bottom_s_sketch(t1, 21, 1000), bottom_s_sketch(t2, 21, 1000)
    est_j = jaccard_from_common(sketch_common(s1, s2), len(s1), len(s2))
    # s=1000 -> stderr ~ sqrt(j(1-j)/s) ~ 0.016; allow 4 sigma
    assert abs(est_j - true_j) < 0.07


def test_mash_distance_reference_values():
    # D = -(1/k) ln(2J/(1+J)) (src/MST.cpp:520-528)
    assert mash_distance(1.0, 21) == 0.0
    assert mash_distance(0.0, 21) == 1.0
    j = 0.5
    assert math.isclose(mash_distance(j, 21), -math.log(2 * j / (1 + j)) / 21)
    # clamped at 1
    assert mash_distance(1e-12, 2) == 1.0


def test_containment_distance_reference_values():
    # D = -(1/k) ln(c), c = common/min(n1,n2) (src/MST.cpp:529-540)
    assert containment_distance(100, 100, 1000, 21) == 0.0
    assert containment_distance(0, 100, 1000, 21) == 1.0
    c = 50 / 100
    assert math.isclose(containment_distance(50, 100, 1000, 21),
                        -math.log(c) / 21)


def test_config_bounds_match_reference_math():
    cfg = PipelineConfig()
    d, k = cfg.threshold, cfg.distance_k
    assert math.isclose(cfg.max_size_ratio(), 2 * math.exp(d * k) - 1)
    x = math.exp(-d * k)
    assert math.isclose(cfg.jaccard_min(), x / (2 - x))
    # round-trip: mash_distance(jaccard_min) == threshold
    assert math.isclose(mash_distance(cfg.jaccard_min(), k), d, rel_tol=1e-9)


def test_threshold_validation():
    with pytest.raises(ValueError):
        PipelineConfig(threshold=0.9, sketch_size=1000)


def test_frac_minhash_is_filtered_subset():
    t = _doc(random.Random(3))
    full = bottom_s_sketch(t, 21, 10**9)
    frac = frac_minhash_sketch(t, 21, scale=64)
    cutoff = (1 << 64) // 64
    assert np.array_equal(frac, full[full < cutoff])
    # containment property: sketch of a slice is mostly a subset
    part = frac_minhash_sketch(t[: len(t) // 2], 21, scale=64)
    inter = np.intersect1d(part, frac)
    assert len(inter) >= 0.95 * len(part)


def test_kperm_signature_similarity():
    rng = random.Random(11)
    t1 = _doc(rng)
    t2 = _mutate(t1, 0.02, rng)
    t3 = _doc(random.Random(999))
    s1 = kperm_signature(t1, 21, 128, perm_seed=348842630)
    s2 = kperm_signature(t2, 21, 128, perm_seed=348842630)
    s3 = kperm_signature(t3, 21, 128, perm_seed=348842630)
    near = (s1 == s2).mean()
    far = (s1 == s3).mean()
    assert near > 0.5
    assert far < 0.1


def test_band_hashes_shared_bands():
    rng = random.Random(13)
    t1 = _doc(rng)
    t2 = _mutate(t1, 0.01, rng)
    b1 = band_hashes(kperm_signature(t1, 21, 128, perm_seed=348842630), 2)
    b2 = band_hashes(kperm_signature(t2, 21, 128, perm_seed=348842630), 2)
    assert len(b1) == 64
    assert (b1 == b2).sum() >= 1  # near-dups share at least one band


# ------------------------------------------------------------- weighted MinHash

def test_icws_estimator_within_ci():
    """ICWS positional agreement ~ exact weighted Jaccard (4-sigma CI)."""
    import numpy as np

    from rabbittclust_spark.functions.minhash import (
        icws_signature,
        weighted_jaccard,
    )

    rng = np.random.default_rng(9)
    n = 200
    h_all = np.unique(rng.integers(0, 1 << 63, size=2 * n, dtype=np.uint64))
    h1 = h_all[:n]
    h2 = h_all[n // 2: n // 2 + n]  # 50% element overlap
    w1 = rng.integers(1, 20, size=len(h1)).astype(np.float64)
    w2 = rng.integers(1, 20, size=len(h2)).astype(np.float64)
    jw = weighted_jaccard(h1, w1, h2, w2)
    s = 256
    s1 = icws_signature(h1, w1, s, seed=23)
    s2 = icws_signature(h2, w2, s, seed=23)
    est = float((s1 == s2).mean())
    sigma = (jw * (1 - jw) / s) ** 0.5
    assert abs(est - jw) <= 4 * sigma + 1e-9, (est, jw)


def test_icws_identical_and_disjoint():
    import numpy as np

    from rabbittclust_spark.functions.minhash import icws_signature

    rng = np.random.default_rng(2)
    h = np.unique(rng.integers(0, 1 << 63, size=100, dtype=np.uint64))
    w = rng.integers(1, 9, size=len(h)).astype(np.float64)
    a = icws_signature(h, w, 64, seed=5)
    b = icws_signature(h, w.copy(), 64, seed=5)
    assert (a == b).all()  # deterministic
    h2 = np.unique(rng.integers(0, 1 << 63, size=100, dtype=np.uint64) | np.uint64(1 << 63))
    c = icws_signature(h2, w[: len(h2)], 64, seed=5)
    assert (a == c).mean() < 0.1  # disjoint sets rarely collide


def test_icws_weight_sensitivity():
    """Same elements, very different weights -> agreement well below 1."""
    import numpy as np

    from rabbittclust_spark.functions.minhash import (
        icws_signature,
        weighted_jaccard,
    )

    rng = np.random.default_rng(3)
    h = np.unique(rng.integers(0, 1 << 63, size=120, dtype=np.uint64))
    w1 = np.ones(len(h))
    w2 = np.where(np.arange(len(h)) % 2 == 0, 10.0, 1.0)
    jw = weighted_jaccard(h, w1, h, w2)
    assert jw < 0.65
    s = 256
    est = float((icws_signature(h, w1, s, seed=7) ==
                 icws_signature(h, w2, s, seed=7)).mean())
    sigma = (jw * (1 - jw) / s) ** 0.5
    assert abs(est - jw) <= 4 * sigma + 1e-9, (est, jw)


def test_sketch_wminhash_spark_matches_kernel(spark):
    """Spark operator == single-process kernel, and wminhash_pairs finds the
    planted weighted near-dup."""
    import numpy as np

    from rabbittclust_spark.config import PipelineConfig
    from rabbittclust_spark.functions.minhash import (
        icws_signature,
        shingle_hash_counts,
    )
    from rabbittclust_spark.operators.dedup import wminhash_pairs
    from rabbittclust_spark.operators.sketch import sketch_wminhash

    cfg = PipelineConfig(min_len=10, shingle_k=8)
    texts = {
        0: "the quick brown fox jumps over the lazy dog " * 8,
        1: "the quick brown fox jumps over the lazy dog " * 8 + "extra tail",
        2: "completely different content with no shared shingles here " * 6,
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    sk = {r.doc_id: r.sig for r in sketch_wminhash(docs, cfg, num_samples=64).collect()}
    for did, t in texts.items():
        h, w = shingle_hash_counts(t, cfg.shingle_k, seed=cfg.hash_seed)
        expect = icws_signature(h, w, 64, seed=cfg.hash_seed)
        assert np.array_equal(np.array(sk[did], dtype=np.int64),
                              expect.view(np.int64)), did
    pairs = {(r.src, r.dst): r.wjaccard_est
             for r in wminhash_pairs(docs, cfg, num_samples=64,
                                     min_wjaccard=0.3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.5
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_fused_banded_sketch_parity(spark):
    """sketch_minhash_bands must be bit-identical to running sketch_minhash
    and sketch_bands separately (one shingling pass vs two)."""
    import random

    from rabbittclust_spark.config import PipelineConfig
    from rabbittclust_spark.operators.sketch import (
        sketch_bands,
        sketch_minhash,
        sketch_minhash_bands,
    )

    rng = random.Random(11)
    words = [f"w{i}" for i in range(200)]
    rows = [(i, " ".join(rng.choice(words) for _ in range(80)))
            for i in range(25)]
    rows.append((25, ""))          # filtered by min_len
    rows.append((26, "short doc that still passes min_len=10 easily"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for cfg in (PipelineConfig(min_len=10, shingle_k=8, sketch_size=64,
                               perm_count=32, rows_per_band=2),
                PipelineConfig(min_len=10, shingle_k=8, containment=True,
                               contain_compress=50, min_sketch_size=16,
                               threshold=0.02)):
        fused = {r["doc_id"]: r for r in
                 sketch_minhash_bands(docs, cfg).collect()}
        sep_sk = {r["doc_id"]: r for r in sketch_minhash(docs, cfg).collect()}
        sep_bd = {r["doc_id"]: r for r in sketch_bands(docs, cfg).collect()}
        assert set(fused) == set(sep_sk) == set(sep_bd)
        for d, row in fused.items():
            assert (row["len"], row["n"], row["sig"]) == (
                sep_sk[d]["len"], sep_sk[d]["n"], sep_sk[d]["sig"])
            assert row["band_keys"] == sep_bd[d]["band_keys"]


def test_fracminhash_containment_harness(spark):
    """The retired driver slot's harness still runs (FracMinHash sketch +
    containment edges over the real sf0.001 corpus): kept exercised here
    so the operator composition never rots out of the surface."""
    import __spark_entry__ as entrymod

    out = entrymod._q_fracminhash_containment(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    assert {"src", "dst"} <= set(out.columns)


def test_icws_pinned_golden_signatures():
    """Bit-stability pin for the r8 (samples x elements) vectorization of
    icws_signature: these values were produced by the original per-sample
    loop kernel (verified bit-identical at the switch) — any future
    refactor that changes elementwise op order, the counter-hash
    derivation, or the argmin tie-break breaks round-over-round signature
    compatibility and must fail here first."""
    import numpy as np

    from rabbittclust_spark.functions.minhash import icws_signature

    rng = np.random.default_rng(123)
    h = np.unique(rng.integers(0, 2**63, size=40).astype(np.uint64))
    w = rng.integers(1, 9, size=len(h)).astype(np.float64)
    assert icws_signature(h, w, 8, seed=5).view(np.int64).tolist() == [
        -9119245368532839729, 7240719892018962161, 6648493862004641224,
        979314168270230060, 3276411334012522836, 6215788140735914831,
        -5695557088961641623, -6294747731963534597]
    assert icws_signature(h, w, 8, seed=0).view(np.int64).tolist() == [
        -4598537748038127942, 3276411334012522836, 4233453178765440223,
        3728242326827086499, -6473323745726881967, 8216091262776959122,
        7240719892018962161, -8599046217666876510]
    # sample-chunk boundaries must not change values: force tiny chunks by
    # a large element count via repeat, then compare against one-shot
    big_h = np.unique(rng.integers(0, 2**63, size=5000).astype(np.uint64))
    big_w = rng.integers(1, 200, size=len(big_h)).astype(np.float64)
    full = icws_signature(big_h, big_w, 96, seed=7)
    again = icws_signature(big_h, big_w, 96, seed=7)
    assert np.array_equal(full, again)


def test_wminhash_sketch_spreads_single_file_scan(spark):
    """A single small parquet file gives the scan ONE partition; the ICWS
    sketch is the most CPU-intense kernel (~1 ms/doc), so sketch_wminhash
    must fan its mapInPandas input out to defaultParallelism (measured 54 s
    serial for 5k docs at r8 before the fix)."""
    from rabbittclust_spark.config import PipelineConfig
    from rabbittclust_spark.operators.sketch import sketch_wminhash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = PipelineConfig()
    from pyspark.sql import functions as F

    sk = sketch_wminhash(docs, cfg, num_samples=16)
    n_parts = (sk.withColumn("p", F.spark_partition_id())
               .select("p").distinct().count())
    assert n_parts > 1
