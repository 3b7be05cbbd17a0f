"""tools/run_pipeline.py CLI surface: build, RepDB query/assign, append —
the reference-flag mapping MIGRATION.md documents."""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

import run_pipeline  # noqa: E402

from rabbittclust_spark.fixtures.webtext import WebtextParams, generate_pandas


@pytest.fixture(scope="module")
def cli_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    corpus = generate_pandas(WebtextParams(
        num_clusters=4, members_per_cluster=4, num_singletons=6,
        num_short=2, hot_cluster_size=4))
    docs = spark.createDataFrame(corpus[["doc_id", "text"]])
    in_path = str(root / "docs.parquet")
    docs.write.mode("overwrite").parquet(in_path)
    return {"in": in_path, "out": str(root / "out"), "root": root}


def _run(argv):
    old = sys.argv
    sys.argv = ["run_pipeline.py"] + argv
    try:
        run_pipeline.main()
    finally:
        sys.argv = old


def test_cli_build_query_assign_append(spark, cli_dirs):
    base = ["--input", cli_dirs["in"], "--output", cli_dirs["out"], "-m", "100"]
    _run(base + ["--dedup-dist", "0.02", "--reps-per-cluster", "2", "--dense"])
    for stage in ("assignments", "dedup_groups", "reps", "assignments_dense"):
        assert os.path.isdir(os.path.join(cli_dirs["out"], stage)), stage
    a = spark.read.parquet(os.path.join(cli_dirs["out"], "assignments"))
    assert a.count() > 0

    _run(base + ["--db-query", cli_dirs["in"], "--top-k", "2"])
    q = spark.read.parquet(os.path.join(cli_dirs["out"], "query_topk"))
    assert q.count() > 0 and q.groupBy("query_id").count() \
        .agg({"count": "max"}).collect()[0][0] <= 2

    _run(base + ["--db-assign", cli_dirs["in"]])
    asg = spark.read.parquet(os.path.join(cli_dirs["out"], "assign"))
    assert set(asg.columns) == {"query_id", "rep_id", "dist", "is_novel"}

    _run(base + ["--append", cli_dirs["in"]])
    app = spark.read.parquet(os.path.join(cli_dirs["out"],
                                          "assignments_appended"))
    assert app.count() >= a.count()
