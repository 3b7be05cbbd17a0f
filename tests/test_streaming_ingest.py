"""Structured Streaming ingest: foreachBatch(append_batch) ==
full-batch clustering, and checkpoint resume processes only new files."""

import os

import pytest

from rabbittclust_spark.config import PipelineConfig
from rabbittclust_spark.fixtures.webtext import WebtextParams, generate_pandas
from rabbittclust_spark.operators.dedup import minhash_dedup
from rabbittclust_spark.streaming.ingest import stream_ingest

CFG = PipelineConfig(min_len=100, exact_prededup=False)
P = WebtextParams(num_clusters=5, members_per_cluster=4, num_singletons=8,
                  num_short=2, hot_cluster_size=4)


@pytest.fixture(scope="module")
def corpus():
    return generate_pandas(P)


def _assign_map(df):
    return {r.doc_id: r.cluster_id for r in df.collect()}


def test_stream_equals_batch(spark, corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    in_dir, state, ckpt = (str(root / d) for d in ("in", "state", "ckpt"))
    os.makedirs(in_dir)

    docs_pd = corpus[["doc_id", "text"]].sort_values("doc_id").reset_index(drop=True)
    thirds = [docs_pd.iloc[i::3] for i in range(3)]
    # first two batches arrive
    for i, part in enumerate(thirds[:2]):
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(in_dir, f"batch{i}"))
    sink = stream_ingest(spark, CFG, in_dir + "/*", state, ckpt)
    v_after_two = sink._current_version()
    assert v_after_two >= 0

    # third batch arrives later; checkpoint resume processes ONLY it
    spark.createDataFrame(thirds[2]).coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(in_dir, "batch2"))
    sink = stream_ingest(spark, CFG, in_dir + "/*", state, ckpt)
    assert sink._current_version() == v_after_two + 1

    got = _assign_map(sink.assignments())
    batch = _assign_map(
        minhash_dedup(spark.createDataFrame(docs_pd), CFG)["assignments"]
        .select("doc_id", "cluster_id"))
    assert got == batch


def test_stream_rerun_without_new_data_is_noop(spark, corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream2")
    in_dir, state, ckpt = (str(root / d) for d in ("in", "state", "ckpt"))
    os.makedirs(in_dir)
    docs_pd = corpus[["doc_id", "text"]]
    spark.createDataFrame(docs_pd).coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(in_dir, "b0"))
    sink = stream_ingest(spark, CFG, in_dir + "/*", state, ckpt)
    v1 = sink._current_version()
    sink = stream_ingest(spark, CFG, in_dir + "/*", state, ckpt)
    assert sink._current_version() == v1  # no new files -> no new state version


def test_replayed_batch_is_idempotent(spark, corpus, tmp_path_factory):
    """foreachBatch replay after a crash between the state-pointer flip and
    the stream-checkpoint commit must NOT duplicate state."""
    from rabbittclust_spark.streaming.ingest import StreamingDedup

    root = tmp_path_factory.mktemp("stream3")
    sink = StreamingDedup(spark, CFG, str(root / "state"))
    batch = spark.createDataFrame(corpus[["doc_id", "text"]])
    sink.process_batch(batch, batch_id=0)
    v1 = sink._current_version()
    n1 = sink.load_state()[0].count()
    sink.process_batch(batch, batch_id=0)  # replay of the SAME batch
    assert sink._current_version() == v1   # no new state version
    assert sink.load_state()[0].count() == n1  # no duplicated sketches
    sink.process_batch(batch.where("doc_id < 0"), batch_id=1)  # next batch ok
    assert sink._current_version() == v1 + 1
