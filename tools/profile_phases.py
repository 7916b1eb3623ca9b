"""Phase decomposition for headline queries (optimization round r08).

For each named query, split wall time into:
  build   — Python DataFrame construction (includes any eager work the
            operator does: collect()s for centroid seeds, eager
            localCheckpoints, persists triggered during build);
  plan    — analysis + optimization + physical planning of the final
            DataFrame (df._jdf.queryExecution().executedPlan());
  exec    — the bench's row-digest materialization action.

Also records the number of Spark jobs each phase launched (status
tracker deltas): serial sub-jobs inside build are invisible in a plan
but serialize the query's critical path.

Usage: python tools/profile_phases.py [query ...]   (default: top-N by
the last BENCH_FULL solo times)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.session import get_spark

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = sys.argv[1:]
    if not names:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        full = json.load(open(os.path.join(here, "BENCH_FULL.json")))
        ranked = sorted(
            full["queries"].items(), key=lambda kv: -kv[1]["solo"]
        )
        names = [k for k, _ in ranked[:30]]

    spark = get_spark(
        "ftmcs-profile",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    def one(name: str) -> dict:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(0.5)
        j0 = n_jobs()
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t1 = time.perf_counter()
        j1 = n_jobs()
        digest = df.select(
            F.xxhash64(F.struct(*df.columns)).alias("h")
        ).groupBy().agg(F.count("h"), F.try_sum("h"))
        # physical planning of the digest plan (pre-AQE-execution)
        digest._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        j2 = n_jobs()
        digest.collect()
        t3 = time.perf_counter()
        j3 = n_jobs()
        return {
            "build": round(t1 - t0, 3),
            "plan": round(t2 - t1, 3),
            "exec": round(t3 - t2, 3),
            "total": round(t3 - t0, 3),
            "jobs_build": j1 - j0,
            "jobs_exec": j3 - j2,
        }

    results: dict[str, dict] = {}
    for name in names:
        # best of 2 per phase (steady state; first run pays codegen)
        a = one(name)
        b = one(name)
        best = min((a, b), key=lambda r: r["total"])
        results[name] = best
        print(
            f"{name:32s} total {best['total']:7.3f}  "
            f"build {best['build']:6.3f} (jobs {best['jobs_build']:2d})  "
            f"plan {best['plan']:6.3f}  exec {best['exec']:6.3f} "
            f"(jobs {best['jobs_exec']:2d})",
            flush=True,
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r08",
        "profile_phases.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
