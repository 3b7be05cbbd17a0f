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
import json
import os

from pyspark.sql import SparkSession

_STATE = "STATE.json"


def _state_paths(output: str) -> tuple[str, str, int]:
    """Current canonical (sketches, assignments, version) state.

    --append promotes its result by writing versioned dirs + atomically
    updating <output>/STATE.json (the batch twin of streaming/ingest.py's
    v{N} pointer layout), so repeated --append invocations ACCUMULATE:
    append #2 reads append #1's state, never the pre-append build.  Without
    a pointer the base build dirs are the state (version 0)."""
    try:
        with open(os.path.join(output, _STATE)) as f:
            st = json.load(f)
        return st["sketches"], st["assignments"], int(st["version"])
    except (OSError, KeyError, ValueError, json.JSONDecodeError):
        return (os.path.join(output, "sketches"),
                os.path.join(output, "assignments"), 0)


# sketch-identity params: two sketch sets are only comparable when ALL of
# these match (the reference stores them in its sketch-file header and
# validates on load, src/Sketch_IO.cpp:136-167).  `threshold` is
# deliberately NOT here: sketches do not depend on it (the pregraph
# stage_hash design excludes it from the 'sketches' stage for the same
# reason), and the reference's --presketched semantics reuse sketches
# under a new -d (src/main.cpp:616-641) — adopting the build's threshold
# would silently override a user-supplied -d in query/append modes.
_SKETCH_PARAMS = ("shingle_k", "sketch_size", "containment",
                  "containment_variant", "contain_compress",
                  "min_sketch_size", "lowercase", "hash_seed", "min_len",
                  "perm_count", "rows_per_band", "perm_seed")


def _adopt_build_config(output: str, cfg):
    """Adopt the persisted build's sketch-identity params for query/append
    sketching: joining sketches built with -k 21 against query sketches
    built with -k 8 would produce silently meaningless intersections.  The
    build manifest (DedupPipeline._stage) is the header analog; CLI values
    that differ are overridden with a warning."""
    import dataclasses

    mpath = os.path.join(output, "sketches", "_manifest.json")
    try:
        with open(mpath) as f:
            built = json.load(f)["config"]
    except (OSError, KeyError, json.JSONDecodeError):
        return cfg
    adopt = {k: built[k] for k in _SKETCH_PARAMS if k in built}
    diffs = {k: (getattr(cfg, k), v) for k, v in adopt.items()
             if getattr(cfg, k) != v}
    if diffs:
        detail = ", ".join(f"{k}: {a!r} -> {b!r}" for k, (a, b) in diffs.items())
        print(f"WARNING: CLI params differ from the built state's sketch "
              f"header ({mpath}); adopting the build's values: {detail}")
    return dataclasses.replace(cfg, **adopt)


def _build_cfg(args):
    from rabbittclust_spark.config import PipelineConfig

    return PipelineConfig(
        shingle_k=args.kmer_size, sketch_size=args.sketch_size,
        threshold=args.threshold, min_len=args.min_len,
        containment=args.containment, pair_mode=args.pair_mode,
        max_posting=(None if args.max_posting <= 0 else args.max_posting),
        hot_hash_mode=args.hot_hash_mode,
        dedup_dist=args.dedup_dist, reps_per_cluster=args.reps_per_cluster,
        community_resolution=args.resolution, community_knn=args.knn,
        community_levels=args.levels)


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
    # the config's skew-safe finite default, NOT None: the CLI must not
    # silently disable the hot-posting cap; 0 = unlimited (explicit opt-out)
    ap.add_argument("--max-posting", type=int, default=2_000,
                    help="posting-list cap (0 = unlimited)")
    ap.add_argument("--hot-hash-mode", default="star", choices=["star", "drop"])
    ap.add_argument("--dedup-dist", type=float, default=None)
    ap.add_argument("--reps-per-cluster", type=int, default=1)
    ap.add_argument("--resolution", type=float, default=None,
                    help="community detection over the edges pregraph at this "
                         "resolution (clust-leiden analog); rerunning with a "
                         "new value reuses the persisted graph")
    ap.add_argument("--knn", type=int, default=None,
                    help="per-node k-NN edge cap before community detection")
    ap.add_argument("--levels", type=int, default=1,
                    help="community detection levels: >1 enables multi-level "
                         "Louvain coarsening (reference community_multilevel)")
    ap.add_argument("--auto-threshold", action="store_true",
                    help="write threshold_analysis.txt (reference "
                         "--auto-threshold report)")
    ap.add_argument("--dense", action="store_true",
                    help="noise removal pass (cluster_id -1 for noise)")
    ap.add_argument("--append", default=None, metavar="NEW_INPUT",
                    help="append NEW_INPUT docs to the existing output state")
    ap.add_argument("--db-query", default=None, metavar="QUERY_INPUT",
                    help="RepDB top-k query against the built state")
    ap.add_argument("--db-assign", default=None, metavar="QUERY_INPUT",
                    help="RepDB assign-or-novel against the built state")
    ap.add_argument("--stats", action="store_true",
                    help="print the RepDB statistics report for the built "
                         "state (reference --stats, greedy.cpp print_stats)")
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    # only stop a session this entry point created (a host process — e.g.
    # the test harness — keeps its own)
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("rabbittclust-dedup").getOrCreate()
    cfg = _build_cfg(args)

    from rabbittclust_spark.plans.pipeline import DedupPipeline

    if args.stats:
        from rabbittclust_spark.operators.postprocess import (
            format_repdb_stats,
            repdb_stats,
        )

        cfg = _adopt_build_config(args.output, cfg)
        sk_path, as_path, _ = _state_paths(args.output)
        assign = spark.read.parquet(as_path)
        sketches = spark.read.parquet(sk_path)
        stats = repdb_stats(assign.select("doc_id", "cluster_id", "is_rep"),
                            doc_lens=sketches.select("doc_id", "len"))
        print(format_repdb_stats(stats, sketches=sketches, cfg=cfg))
        if owns_session:
            spark.stop()
        return

    if args.db_query or args.db_assign:
        # query modes reuse the built state's sketch table as the RepDB,
        # INCLUDING any appended state, with the build's sketch params
        from rabbittclust_spark.streaming.incremental import (
            assign_or_novel,
            query_topk,
        )

        cfg = _adopt_build_config(args.output, cfg)
        sk_path, _, _ = _state_paths(args.output)
        reps = spark.read.parquet(sk_path)
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

        cfg = _adopt_build_config(args.output, cfg)
        sk_path, as_path, version = _state_paths(args.output)
        old_sk = spark.read.parquet(sk_path)
        old_assign = spark.read.parquet(as_path).select("doc_id", "cluster_id")
        new_docs = spark.read.parquet(args.append)
        out = append_batch(old_sk, old_assign, new_docs, cfg,
                           id_col=args.id_col, text_col=args.text_col)
        v = version + 1
        new_paths = {name: os.path.join(args.output, f"{name}_v{v}")
                     for name in ("sketches", "assignments")}
        for name, path in new_paths.items():
            df = out[name]
            if name == "assignments":
                df = df.select("doc_id", "cluster_id",
                               (df.doc_id == df.cluster_id).alias("is_rep"))
            df.write.mode("overwrite").parquet(path)
        # atomic pointer flip: the new version only becomes canonical once
        # both tables are fully written (crash mid-write leaves version v-1)
        tmp = os.path.join(args.output, _STATE + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"version": v, "sketches": new_paths["sketches"],
                       "assignments": new_paths["assignments"]}, f)
        os.replace(tmp, os.path.join(args.output, _STATE))
        n = out["assignments"].count()
        print(f"appended: {n} total docs -> {args.output} (state v{v})")
        if owns_session:
            spark.stop()
        return

    pipe = DedupPipeline(spark, cfg, args.output)
    docs = spark.read.parquet(args.input)
    out = pipe.run(docs, resume=not args.no_resume, html_col=args.html_col,
                   id_col=args.id_col, text_col=args.text_col)
    # a fresh build supersedes any appended state: reset the pointer so
    # later --append/--db-* read the rebuilt base tables (version 0)
    state_ptr = os.path.join(args.output, _STATE)
    if os.path.exists(state_ptr):
        os.remove(state_ptr)
    if args.dense:
        from rabbittclust_spark.operators.postprocess import remove_noise

        denoised = remove_noise(out["assignments"], out["edges"])
        denoised.write.mode("overwrite").parquet(
            os.path.join(args.output, "assignments_dense"))
    if args.auto_threshold:
        # reference --auto-threshold report file (src/MST.cpp:2285-2375)
        from rabbittclust_spark.operators.analysis import write_threshold_report

        rpath = os.path.join(args.output, "threshold_analysis.txt")
        write_threshold_report(out["edges"], rpath)
        print(f"threshold analysis -> {rpath}")
    n = out["assignments"].count()
    clusters = out["assignments"].select("cluster_id").distinct().count()
    extras = [k for k in ("dedup_groups", "reps") if k in out]
    print(f"assignments: {n} docs in {clusters} clusters -> {args.output}"
          + (f" (+ {', '.join(extras)})" if extras else ""))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
