"""Round-9 optimization profiler: per-query action attribution + explain capture.

Runs selected bench queries with the SAME session config as bench.py, but
instruments the in-query barriers (materialize round-trips, collect/toPandas/
count driver actions) so each wall decomposes into attributable pieces —
guide §1 "measure first" for an engine whose queries are chains of jobs.

Usage:
    python tools/r9_profile.py q1 q2 ...          # profile named queries
    python tools/r9_profile.py --all              # all 20 headline queries
    python tools/r9_profile.py --explain q1 ...   # also write plans/r09/<q>_before.txt
    python tools/r9_profile.py --suffix _after    # explain suffix

Output: per-query JSON lines {"query": ..., "walls": [w1, w2, w3],
"events": [[label, sec], ...]} (events from the LAST run).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "minhash_dedup", "minhash_dedup_banded", "exact_dedup", "simhash_dedup",
    "substring_dedup", "ngram_jaccard", "token_pair_mash", "token_clusters",
    "label_propagation", "repdb_topk", "text_quality", "ann_cosine_topk",
    "embedding_neardup_lsh", "topk_orders", "events_stats", "wminhash_pairs",
    "minhash_dedup_oracle", "minhash_dedup_banded_oracle",
    "simhash_dedup_oracle", "substring_dedup_oracle",
]

EVENTS: list[tuple[str, float]] = []


def _instrument():
    # PySpark 4: the concrete class is pyspark.sql.classic.dataframe.DataFrame
    # (pyspark.sql.dataframe.DataFrame is the abstract base whose methods the
    # classic class overrides — patching the base is a no-op).
    try:
        import pyspark.sql.classic.dataframe as dfmod
    except ImportError:
        import pyspark.sql.dataframe as dfmod

    from rabbittclust_spark.sources import tables

    orig_mat = tables.materialize

    def timed_materialize(df, name="stage", **kw):
        t0 = time.time()
        out = orig_mat(df, name, **kw)
        EVENTS.append((f"materialize:{name}", round(time.time() - t0, 3)))
        return out

    tables.materialize = timed_materialize
    # operators import `materialize` by name at call time via
    # `from ... import materialize as _mat` INSIDE functions, so patching the
    # module attribute covers them all.

    for meth in ("collect", "toPandas", "count"):
        orig = getattr(dfmod.DataFrame, meth)

        def wrapper(self, *a, _orig=orig, _m=meth, **kw):
            t0 = time.time()
            out = _orig(self, *a, **kw)
            EVENTS.append((_m, round(time.time() - t0, 3)))
            return out

        setattr(dfmod.DataFrame, meth, wrapper)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    do_explain = "--explain" in args
    do_all = "--all" in args
    suffix = "_before"
    if "--suffix" in args:
        suffix = args[args.index("--suffix") + 1]
        args.remove("--suffix")
        args.remove(suffix) if suffix in args else None
    names = [a for a in args if not a.startswith("--") and a != suffix]
    if do_all or not names:
        names = HEADLINE

    repeats = int(os.environ.get("R9_REPEATS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["RTC_UNROLL_GUARD"] = "0"

    from rabbittclust_spark.session import get_spark

    spark = get_spark("r9prof", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    _instrument()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs.update({f"{k}_oracle": qs[k] for k in
               ("minhash_dedup", "minhash_dedup_banded", "simhash_dedup",
                "substring_dedup")})
    qs.update(entrymod.production_queries())

    # warmup identical in spirit to bench.py
    from pyspark.sql import functions as F

    from rabbittclust_spark.config import PipelineConfig
    from rabbittclust_spark.operators.sketch import sketch_minhash
    from rabbittclust_spark.sources.tables import materialize

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()
    warm = materialize(
        sketch_minhash(docs.limit(64 * int(cpus)).repartition(int(cpus)),
                       PipelineConfig(min_len=20)), "warm")
    wp = warm.select("doc_id", F.explode(F.slice("sig", 1, 8)).alias("h"))
    (wp.alias("a").join(wp.alias("b"), "h")
     .where(F.col("a.doc_id") < F.col("b.doc_id"))
     .groupBy(F.col("a.doc_id"), F.col("b.doc_id")).count().count())

    from tools.scaling_bench import ExternalCpuMonitor

    def _gate(max_wait=float(os.environ.get("R9_GATE_WAIT", "180"))):
        t0 = time.time()
        while True:
            mon = ExternalCpuMonitor()
            time.sleep(2.0)
            ext = mon.stop()
            if ext < 1.0 or time.time() - t0 >= max_wait:
                return ext

    results = {}
    for name in names:
        fn = qs[name]
        walls = []
        exts = []
        for r in range(repeats):
            _gate()
            EVENTS.clear()
            spark.sparkContext.setJobDescription(f"{name}#run{r}")
            mon = ExternalCpuMonitor()
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            walls.append(round(time.time() - t0, 3))
            exts.append(round(mon.stop(), 2))
        events = list(EVENTS)
        if do_explain:
            os.makedirs("plans/r09", exist_ok=True)
            df = fn(spark, sf_dir)
            with open(f"plans/r09/{name}{suffix}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        clean = [w for w, e in zip(walls, exts) if e <= 1.0]
        results[name] = {"walls": walls, "rows": n, "events": events}
        print(json.dumps({"query": name, "walls": walls, "ext": exts,
                          "min_clean": min(clean) if clean else None,
                          "rows": n, "events": events}), flush=True)
    spark.stop()
    print(json.dumps({k: v["walls"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
