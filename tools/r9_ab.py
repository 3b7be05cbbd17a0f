"""Alternating A/B of one env toggle on one query in ONE session.

Usage: python tools/r9_ab.py <query> <ENV_VAR> <valA> <valB> [rounds]

Runs the query 2*rounds times alternating ENV_VAR=valA / valB, each run
externally gated, prints per-config clean walls and mins.  Alternation makes
host-noise waves hit both configs equally.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    query, var, va, vb = sys.argv[1:5]
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["RTC_UNROLL_GUARD"] = "0"

    from rabbittclust_spark.session import get_spark

    spark = get_spark("r9ab", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs.update({f"{k}_oracle": qs[k] for k in
               ("minhash_dedup", "minhash_dedup_banded", "simhash_dedup",
                "substring_dedup")})
    qs.update(entrymod.production_queries())
    fn = qs[query]

    from tools.scaling_bench import ExternalCpuMonitor

    def gate(max_wait=240.0):
        t0 = time.time()
        while True:
            mon = ExternalCpuMonitor()
            time.sleep(2.0)
            if mon.stop() < 1.0 or time.time() - t0 >= max_wait:
                return

    # warmup
    fn(spark, sf_dir).count()

    walls: dict[str, list] = {va: [], vb: []}
    for r in range(rounds):
        for val in (va, vb):
            os.environ[var] = val
            gate()
            mon = ExternalCpuMonitor()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            w = round(time.time() - t0, 3)
            ext = round(mon.stop(), 2)
            walls[val].append((w, ext))
            print(f"{var}={val} wall={w} ext={ext}", flush=True)
    for val in (va, vb):
        clean = [w for w, e in walls[val] if e <= 1.0]
        print(f"RESULT {var}={val}: clean={sorted(clean)} "
              f"min={min(clean) if clean else None} all={walls[val]}")
    spark.stop()


if __name__ == "__main__":
    main()
