"""T2-scale reference parity (FIXTURES.md sf=t2, ~6.5k docs): the Spark
pipeline must reproduce the single-process reference oracle's cluster
assignments (north rule: dup-pair recall >= 0.99 at identical config;
measured: identical)."""

import dataclasses

import pytest

from rabbittclust_spark.config import PipelineConfig
from rabbittclust_spark.fixtures.oracle import dup_pair_recall, oracle_clusters
from rabbittclust_spark.fixtures.webtext import T2, generate_pandas
from rabbittclust_spark.operators.dedup import minhash_dedup

CFG = PipelineConfig(min_len=100)


@pytest.fixture(scope="module")
def t2_corpus():
    return generate_pandas(T2)


@pytest.fixture(scope="module")
def t2_oracle(t2_corpus):
    return oracle_clusters(t2_corpus["text"].tolist(), CFG,
                           doc_ids=t2_corpus["doc_id"].tolist())


@pytest.mark.parametrize("mode", ["index", "probe"])
def test_t2_parity(spark, t2_corpus, t2_oracle, mode):
    cfg = dataclasses.replace(CFG, pair_mode=mode)
    docs = spark.createDataFrame(t2_corpus[["doc_id", "text"]])
    got = {r.doc_id: r.cluster_id
           for r in minhash_dedup(docs, cfg)["assignments"].collect()}
    recall, precision = dup_pair_recall(t2_oracle, got)
    assert recall >= 0.99 and precision >= 0.99, (recall, precision)
    assert got == t2_oracle  # stronger: identical assignments
