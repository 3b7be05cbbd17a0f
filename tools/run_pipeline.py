"""spark-submit entry point: the reference CLI surface, Spark-side.

Submitted by tools/submit.sh with the engine shipped via --py-files.
Flag mapping to RabbitTClust (src/main.cpp:113-254):

  -k/--kmer-size        -> shingle width        (ref -k)
  -s/--sketch-size      -> bottom-s size        (ref -s)
  -d/--threshold        -> cluster distance     (ref -d)
  -m/--min-len          -> min doc length       (ref -m)
  -c/--containment      -> AAF/containment mode (ref -c)
  --max-posting         -> hot-posting cap      (ref --max-posting)
  --dedup-dist          -> medoid collapse      (ref --dedup-dist)
  --reps-per-cluster    -> k diverse reps       (ref --reps-per-cluster)
  --dense               -> noise removal        (ref --dense)
  --append INPUT        -> incremental append   (ref --append)
  --db-query INPUT      -> RepDB top-k query    (ref --db ... --query)
  --db-assign INPUT     -> RepDB assign/novel   (ref --db ... --assign)
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession


def _build_cfg(args):
    from rabbittclust_spark.config import PipelineConfig

    return PipelineConfig(
        shingle_k=args.kmer_size, sketch_size=args.sketch_size,
        threshold=args.threshold, min_len=args.min_len,
        containment=args.containment, pair_mode=args.pair_mode,
        max_posting=args.max_posting, hot_hash_mode=args.hot_hash_mode,
        dedup_dist=args.dedup_dist, reps_per_cluster=args.reps_per_cluster)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet/Iceberg docs table")
    ap.add_argument("--output", required=True, help="pipeline output root")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--html-col", default=None,
                    help="if set, extract text from this binary column")
    ap.add_argument("-k", "--kmer-size", type=int, default=21)
    ap.add_argument("-s", "--sketch-size", type=int, default=1000)
    ap.add_argument("-d", "--threshold", type=float, default=0.05)
    ap.add_argument("-m", "--min-len", type=int, default=100)
    ap.add_argument("-c", "--containment", action="store_true")
    ap.add_argument("--pair-mode", default="probe",
                    choices=["index", "probe", "banded"])
    ap.add_argument("--max-posting", type=int, default=None)
    ap.add_argument("--hot-hash-mode", default="star", choices=["star", "drop"])
    ap.add_argument("--dedup-dist", type=float, default=None)
    ap.add_argument("--reps-per-cluster", type=int, default=1)
    ap.add_argument("--dense", action="store_true",
                    help="noise removal pass (cluster_id -1 for noise)")
    ap.add_argument("--append", default=None, metavar="NEW_INPUT",
                    help="append NEW_INPUT docs to the existing output state")
    ap.add_argument("--db-query", default=None, metavar="QUERY_INPUT",
                    help="RepDB top-k query against the built state")
    ap.add_argument("--db-assign", default=None, metavar="QUERY_INPUT",
                    help="RepDB assign-or-novel against the built state")
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    # only stop a session this entry point created (a host process — e.g.
    # the test harness — keeps its own)
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("rabbittclust-dedup").getOrCreate()
    cfg = _build_cfg(args)

    from rabbittclust_spark.plans.pipeline import DedupPipeline

    if args.db_query or args.db_assign:
        # query modes reuse the built state's sketch table as the RepDB
        from rabbittclust_spark.streaming.incremental import (
            assign_or_novel,
            query_topk,
        )

        reps = spark.read.parquet(os.path.join(args.output, "sketches"))
        qdocs = spark.read.parquet(args.db_query or args.db_assign)
        if args.db_query:
            out = query_topk(reps, qdocs, cfg, k=args.top_k,
                             id_col=args.id_col, text_col=args.text_col)
            path = os.path.join(args.output, "query_topk")
        else:
            out = assign_or_novel(reps, qdocs, cfg,
                                  id_col=args.id_col, text_col=args.text_col)
            path = os.path.join(args.output, "assign")
        out.write.mode("overwrite").parquet(path)
        print(f"{out.count()} rows -> {path}")
        if owns_session:
            spark.stop()
        return

    if args.append:
        from rabbittclust_spark.streaming.incremental import append_batch

        old_sk = spark.read.parquet(os.path.join(args.output, "sketches"))
        old_assign = spark.read.parquet(
            os.path.join(args.output, "assignments")).select(
                "doc_id", "cluster_id")
        new_docs = spark.read.parquet(args.append)
        out = append_batch(old_sk, old_assign, new_docs, cfg,
                           id_col=args.id_col, text_col=args.text_col)
        for name in ("sketches", "assignments"):
            df = out[name]
            if name == "assignments":
                df = df.select("doc_id", "cluster_id",
                               (df.doc_id == df.cluster_id).alias("is_rep"))
            df.write.mode("overwrite").parquet(
                os.path.join(args.output, name + "_appended"))
        n = out["assignments"].count()
        print(f"appended: {n} total docs -> {args.output}/*_appended")
        if owns_session:
            spark.stop()
        return

    pipe = DedupPipeline(spark, cfg, args.output)
    docs = spark.read.parquet(args.input)
    out = pipe.run(docs, resume=not args.no_resume, html_col=args.html_col,
                   id_col=args.id_col, text_col=args.text_col)
    if args.dense:
        from rabbittclust_spark.operators.postprocess import remove_noise

        denoised = remove_noise(out["assignments"], out["edges"])
        denoised.write.mode("overwrite").parquet(
            os.path.join(args.output, "assignments_dense"))
    n = out["assignments"].count()
    clusters = out["assignments"].select("cluster_id").distinct().count()
    extras = [k for k in ("dedup_groups", "reps") if k in out]
    print(f"assignments: {n} docs in {clusters} clusters -> {args.output}"
          + (f" (+ {', '.join(extras)})" if extras else ""))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
