"""d4 steady-state + GC attribution probe (r08).

d4_simhash_pairs shows 3-50x sample swings across every r08 battery
(and a 134s cold-first-run in a fresh session). This probe runs d4
N times in one fresh session and records per-run wall, cumulative JVM
GC time, and JIT compilation time deltas, so 'slow run' can be split
into GC / JIT / compute.

    FTMCS_DRIVER_MEMORY=16g python tools/probe_d4_r08.py [op] [n]
"""

from __future__ import annotations

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

    op = sys.argv[1] if len(sys.argv) > 1 else "d4_simhash_pairs"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark(
        "ftmcs-d4-probe",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    jvm = spark._jvm
    mf = jvm.java.lang.management.ManagementFactory

    def gc_ms() -> int:
        total = 0
        it = mf.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    def jit_ms() -> int:
        return mf.getCompilationMXBean().getTotalCompilationTime()

    qs = entry_mod.queries()
    fn = qs[op]

    print(f"op={op} heap={os.environ.get('FTMCS_DRIVER_MEMORY', '16g')}")
    for i in range(n):
        g0, j0 = gc_ms(), jit_ms()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.select(
            F.xxhash64(F.struct(*df.columns)).alias("h")
        ).groupBy().agg(F.count("h"), F.try_sum("h")).collect()
        wall = time.perf_counter() - t0
        g1, j1 = gc_ms(), jit_ms()
        print(
            f"run {i}: wall {wall:7.2f}s  gc +{(g1 - g0) / 1e3:6.2f}s  "
            f"jit +{(j1 - j0) / 1e3:6.2f}s",
            flush=True,
        )
        spark.catalog.clearCache()
        jvm.System.gc()
        time.sleep(1.0)


if __name__ == "__main__":
    main()
