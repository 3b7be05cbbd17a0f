"""spark-submit entry point: run the persistent dedup pipeline.

Submitted by tools/submit.sh with the engine shipped via --py-files.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet/Iceberg docs table")
    ap.add_argument("--output", required=True, help="pipeline output root")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--html-col", default=None,
                    help="if set, extract text from this binary column")
    ap.add_argument("--threshold", type=float, default=0.05)
    ap.add_argument("--pair-mode", default="probe",
                    choices=["index", "probe", "banded"])
    ap.add_argument("--min-len", type=int, default=100)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from rabbittclust_spark.config import PipelineConfig
    from rabbittclust_spark.plans.pipeline import DedupPipeline

    spark = SparkSession.builder.appName("rabbittclust-dedup").getOrCreate()
    cfg = PipelineConfig(threshold=args.threshold, pair_mode=args.pair_mode,
                         min_len=args.min_len)
    pipe = DedupPipeline(spark, cfg, args.output)
    docs = spark.read.parquet(args.input)
    out = pipe.run(docs, resume=not args.no_resume, html_col=args.html_col,
                   id_col=args.id_col, text_col=args.text_col)
    n = out["assignments"].count()
    clusters = out["assignments"].select("cluster_id").distinct().count()
    print(f"assignments: {n} docs in {clusters} clusters -> {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
