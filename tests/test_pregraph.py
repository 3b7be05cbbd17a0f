"""Pregraph resume surface: per-stage config fingerprints.

The reference persists and reloads the weighted similarity graph so a new
community resolution never recomputes pairs (src/leiden.cpp:474-746), and
--presketched reuses sketch files under a new -d (src/main.cpp:616-641).
Here the edges stage table IS the pregraph and PipelineConfig.stage_hash
scopes each knob to the stages that read it — these tests pin the reuse
matrix: which stages rerun under which knob change.
"""

import dataclasses
import json
import os

import pytest

from rabbittclust_spark.config import PipelineConfig
from rabbittclust_spark.fixtures.webtext import WebtextParams, generate_pandas
from rabbittclust_spark.plans.pipeline import DedupPipeline

P = WebtextParams(num_clusters=6, members_per_cluster=5, num_singletons=10,
                  num_short=3, hot_cluster_size=5)
CFG = PipelineConfig(min_len=100, community_resolution=1.0)


@pytest.fixture(scope="module")
def corpus():
    return generate_pandas(P)


def _mid(root, stage):
    with open(os.path.join(root, stage, "_manifest.json")) as f:
        return json.load(f)["manifest_id"]


def test_new_resolution_reuses_pregraph(spark, corpus, tmp_path_factory):
    """Re-running at a new resolution recomputes ONLY the communities stage
    — sketches and edges (the pregraph) are reused from their manifests."""
    root = str(tmp_path_factory.mktemp("pregraph"))
    docs = spark.createDataFrame(corpus[["doc_id", "text"]])
    out1 = DedupPipeline(spark, CFG, root).run(docs)
    assert "communities" in out1
    ids1 = {s: _mid(root, s) for s in ("sketches", "edges", "communities")}

    cfg2 = dataclasses.replace(CFG, community_resolution=0.25)
    out2 = DedupPipeline(spark, cfg2, root).run(docs)
    ids2 = {s: _mid(root, s) for s in ("sketches", "edges", "communities")}
    assert ids2["sketches"] == ids1["sketches"]
    assert ids2["edges"] == ids1["edges"]          # pair recompute avoided
    assert ids2["communities"] != ids1["communities"]

    # every doc is covered (singletons + exact-dup members included)
    assert out2["communities"].count() == out1["assignments"].count()


def test_new_threshold_reuses_sketches(spark, corpus, tmp_path_factory):
    """--presketched analog: a new -d reuses the sketches stage and
    recomputes edges onward."""
    root = str(tmp_path_factory.mktemp("rethresh"))
    docs = spark.createDataFrame(corpus[["doc_id", "text"]])
    DedupPipeline(spark, CFG, root).run(docs)
    sk1, e1 = _mid(root, "sketches"), _mid(root, "edges")

    cfg2 = dataclasses.replace(CFG, threshold=0.03)
    DedupPipeline(spark, cfg2, root).run(docs)
    assert _mid(root, "sketches") == sk1
    assert _mid(root, "edges") != e1


def test_sketch_knob_invalidates_downstream(spark, corpus, tmp_path_factory):
    """A sketch-identity change (new -k) reruns sketches AND everything
    downstream via input-lineage propagation (no stale edges)."""
    root = str(tmp_path_factory.mktemp("rek"))
    docs = spark.createDataFrame(corpus[["doc_id", "text"]])
    DedupPipeline(spark, CFG, root).run(docs)
    sk1, e1 = _mid(root, "sketches"), _mid(root, "edges")

    cfg2 = dataclasses.replace(CFG, shingle_k=15)
    DedupPipeline(spark, cfg2, root).run(docs)
    assert _mid(root, "sketches") != sk1
    assert _mid(root, "edges") != e1


def test_probe_index_share_sketch_layout():
    """probe<->index share one sketch table; banded differs (band_keys)."""
    probe = PipelineConfig(pair_mode="probe")
    index = PipelineConfig(pair_mode="index")
    banded = PipelineConfig(pair_mode="banded")
    assert probe.stage_hash("sketches") == index.stage_hash("sketches")
    assert probe.stage_hash("sketches") != banded.stage_hash("sketches")
    # but their EDGES differ (different candidate generation)
    assert probe.stage_hash("edges") != index.stage_hash("edges")
    # unknown stages fall back to the full config hash (safe default)
    assert probe.stage_hash("nonexistent") == probe.config_hash()


def test_communities_match_direct_lpa(spark, corpus, tmp_path_factory):
    """The communities stage equals label_propagation run directly on the
    edges table + singleton attach (no pipeline-specific drift)."""
    from pyspark.sql import functions as F

    from rabbittclust_spark.operators.leiden import label_propagation
    from rabbittclust_spark.operators.postprocess import (
        assignments_from_components,
    )

    root = str(tmp_path_factory.mktemp("pgtwin"))
    docs = spark.createDataFrame(corpus[["doc_id", "text"]])
    out = DedupPipeline(spark, CFG, root).run(docs)
    got = sorted((r.doc_id, r.community) for r in out["communities"].collect())

    comm = label_propagation(out["edges"], resolution=1.0)
    canon = assignments_from_components(
        out["sketches"].select("doc_id"),
        comm.withColumnRenamed("community", "cluster_id"))
    want = sorted(
        (r.doc_id, r.cluster_id)
        for r in out["exact_groups"]
        .join(canon.withColumnRenamed("doc_id", "canonical_id"),
              "canonical_id")
        .select("doc_id", "cluster_id").collect())
    assert got == want


def test_levels_knob_reuses_pregraph(spark, corpus, tmp_path_factory):
    """--levels (multi-level Louvain) is a communities-stage knob: changing
    it reuses sketches + edges and recomputes only the communities stage;
    every doc keeps a community row."""
    root = str(tmp_path_factory.mktemp("levels"))
    docs = spark.createDataFrame(corpus[["doc_id", "text"]])
    out1 = DedupPipeline(spark, CFG, root).run(docs)
    ids1 = {s: _mid(root, s) for s in ("sketches", "edges", "communities")}
    rows1 = out1["communities"].count()          # read BEFORE run 2 rewrites
    n1 = out1["communities"].select("community").distinct().count()

    cfg2 = dataclasses.replace(CFG, community_levels=3)
    out2 = DedupPipeline(spark, cfg2, root).run(docs)
    ids2 = {s: _mid(root, s) for s in ("sketches", "edges", "communities")}
    assert ids2["sketches"] == ids1["sketches"]
    assert ids2["edges"] == ids1["edges"]
    assert ids2["communities"] != ids1["communities"]
    assert out2["communities"].count() == rows1
    # coarsening only ever MERGES base communities
    n2 = out2["communities"].select("community").distinct().count()
    assert n2 <= n1
