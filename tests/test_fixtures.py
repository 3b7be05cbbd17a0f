"""Fixture generator: determinism, partition independence, planted structure."""

import numpy as np

from rabbittclust_spark.fixtures.webtext import (
    T1,
    WebtextParams,
    generate_doc,
    generate_pandas,
    generate_spark,
)


def test_deterministic():
    a = generate_doc(17, T1)
    b = generate_doc(17, T1)
    assert a == b


def test_exact_dup_clusters_identical_text():
    # cluster 5 (c % 10 == 5) is the exact-dup cluster
    base = generate_doc(5 * T1.members_per_cluster, T1)
    for i in range(1, T1.members_per_cluster):
        m = generate_doc(5 * T1.members_per_cluster + i, T1)
        assert m["text"] == base["text"]
        assert m["url"] != base["url"]


def test_containment_members_are_substrings_of_tokens():
    c = 7  # containment cluster
    base = generate_doc(c * T1.members_per_cluster, T1)
    base_tokens = base["text"].replace("\n\n", " ").split(" ")
    m = generate_doc(c * T1.members_per_cluster + 1, T1)
    m_tokens = m["text"].replace("\n\n", " ").split(" ")
    joined = " ".join(base_tokens)
    assert " ".join(m_tokens) in joined


def test_short_docs_below_min_len():
    p = T1
    start = p.num_clusters * p.members_per_cluster + p.num_singletons
    for i in range(p.num_short):
        d = generate_doc(start + i, p)
        assert d["kind"] == "short"
        assert len(d["text"]) < 100


def test_hot_cluster_shares_boilerplate():
    p = T1
    start = p.num_clusters * p.members_per_cluster + p.num_singletons + p.num_short
    a = generate_doc(start, p)
    b = generate_doc(start + 1, p)
    # same first paragraph-block prefix (boilerplate), different tails
    assert a["text"][:400] == b["text"][:400]
    assert a["text"] != b["text"]


def test_spark_matches_pandas(spark):
    p = WebtextParams(num_clusters=4, members_per_cluster=3, num_singletons=5,
                      num_short=2, hot_cluster_size=3)
    local = generate_pandas(p).sort_values("doc_id").reset_index(drop=True)
    dist = generate_spark(spark, p).orderBy("doc_id").toPandas()
    assert len(local) == len(dist) == p.num_docs
    for col in ("url", "text", "lang", "kind"):
        assert local[col].tolist() == dist[col].tolist(), col
    assert [bytes(x) for x in local["html"]] == [bytes(x) for x in dist["html"]]


def test_iceberg_sink_fallback(spark, tmp_path):
    """No Iceberg jars in this container: the stage writer must detect that
    and fall back to the identical parquet layout; the writeTo wiring itself
    is exercised on catalog-enabled clusters."""
    from rabbittclust_spark.config import PipelineConfig
    from rabbittclust_spark.sources.iceberg import (
        iceberg_catalogs,
        read_stage_table,
        write_stage_table,
    )

    assert iceberg_catalogs(spark) == []
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    path = str(tmp_path / "stage")
    fmt = write_stage_table(df, path, cfg=PipelineConfig())
    assert fmt == "parquet"
    back = read_stage_table(spark, path)
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_iceberg_table_properties_carry_config():
    from rabbittclust_spark.config import PipelineConfig
    from rabbittclust_spark.sources.iceberg import _table_properties

    props = _table_properties(PipelineConfig(shingle_k=17, sketch_size=256))
    assert props["rabbittclust.shingle_k"] == "17"
    assert props["rabbittclust.sketch_size"] == "256"
    assert props["rabbittclust.threshold"] == "0.05"
