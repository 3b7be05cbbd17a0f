"""End-to-end: Spark pipeline vs single-process numpy oracle on planted-dup
fixtures (SURVEY.md §5 item 3; north rule: dup-pair recall >= 0.99 at the
same shingle/signature config)."""

import pytest

from rabbittclust_spark.config import PipelineConfig
from rabbittclust_spark.fixtures.oracle import (
    dup_pair_recall,
    nmi,
    oracle_clusters,
)
from rabbittclust_spark.fixtures.webtext import T1, generate_pandas
from rabbittclust_spark.operators.dedup import minhash_dedup

CFG = PipelineConfig(min_len=100, exact_prededup=True)


@pytest.fixture(scope="module")
def corpus():
    return generate_pandas(T1)


@pytest.fixture(scope="module")
def oracle_assign(corpus):
    return oracle_clusters(corpus["text"].tolist(), CFG,
                           doc_ids=corpus["doc_id"].tolist())


def _spark_assign(spark, corpus, cfg):
    docs = spark.createDataFrame(corpus[["doc_id", "text"]])
    out = minhash_dedup(docs, cfg)["assignments"].collect()
    return {r.doc_id: r.cluster_id for r in out}


def test_index_mode_parity(spark, corpus, oracle_assign):
    """Reference-parity mode must match the oracle exactly (same inverted
    index semantics -> identical clusters, recall = precision = 1.0)."""
    got = _spark_assign(spark, corpus, CFG)
    assert set(got) == set(oracle_assign)
    recall, precision = dup_pair_recall(oracle_assign, got)
    assert recall == 1.0, f"recall {recall}"
    assert precision == 1.0, f"precision {precision}"
    # identical cluster ids (both use component-min convention)
    assert got == oracle_assign


def test_probe_mode_parity(spark, corpus, oracle_assign):
    """Scale path #2 (bottom-B probe join + exact verify): miss probability
    (1-J)^64 ~ 2e-7 at the threshold boundary -> clusters match the oracle."""
    import dataclasses
    cfg = dataclasses.replace(CFG, pair_mode="probe")
    got = _spark_assign(spark, corpus, cfg)
    recall, precision = dup_pair_recall(oracle_assign, got)
    assert recall == 1.0 and precision == 1.0, (recall, precision)
    assert got == oracle_assign


def test_banded_mode_recall(spark, corpus, oracle_assign):
    """Scale path (banded LSH) must reach dup-pair recall >= 0.99."""
    import dataclasses
    cfg = dataclasses.replace(CFG, pair_mode="banded")
    got = _spark_assign(spark, corpus, cfg)
    recall, precision = dup_pair_recall(oracle_assign, got)
    assert recall >= 0.99, f"recall {recall}"
    assert precision >= 0.99, f"precision {precision}"


def test_exact_dups_always_coclustered(spark, corpus):
    got = _spark_assign(spark, corpus, CFG)
    exact = corpus[corpus["kind"] == "exact"]
    for _, row in exact.iterrows():
        seed_id = int(row["truth_cluster"]) * T1.members_per_cluster
        assert got[row["doc_id"]] == got[seed_id]


def test_short_docs_dropped(spark, corpus):
    got = _spark_assign(spark, corpus, CFG)
    short_ids = set(corpus[corpus["kind"] == "short"]["doc_id"])
    assert not (short_ids & set(got))


def test_nmi_vs_planted_truth_on_clean_clusters(spark, corpus, oracle_assign):
    """At clean separations (exact dups + low mutation rates) the pipeline
    reproduces the planted clustering with NMI ~ 1 (getNMI.py analog)."""
    got = _spark_assign(spark, corpus, CFG)
    clean = corpus[
        (corpus["kind"].isin(["seed", "exact", "singleton"]))
        | ((corpus["kind"] == "near") & (corpus["mutation_rate"] <= 0.01))
    ]
    clean = clean[clean["doc_id"].isin(got)]
    truth = clean["truth_cluster"].tolist()
    pred = [got[d] for d in clean["doc_id"]]
    score = nmi(truth, pred)
    assert score > 0.99, f"NMI {score}"


def test_high_mutation_not_merged(spark, corpus, oracle_assign):
    """The oracle and pipeline agree on which mutation rates straddle the
    threshold: rate-0.10 members must NOT join their seed's cluster."""
    got = _spark_assign(spark, corpus, CFG)
    hot = corpus[(corpus["kind"] == "near") & (corpus["mutation_rate"] >= 0.45)]
    assert len(hot) > 0, "fixture should contain high-mutation clusters"
    for _, row in hot.iterrows():
        seed_id = int(row["truth_cluster"]) * T1.members_per_cluster
        assert got[row["doc_id"]] != got[seed_id], row["doc_id"]
