"""Concurrent-block wear vs driver heap (r08).

Every r08 battery's 8-way concurrent wall degrades monotonically
across passes (clean1: 40.4 -> 47.6 -> 47.7 -> 72.5 -> 94.5 on an
idle box), which caps the best-of-5 headline. GC pressure in the 16g
local[32] JVM is the suspect: 111 ops/pass persist intermediates that
are only cleared between passes. This mirrors bench.py's block 2
(fresh session, clearCache+gc+settle, 8 submitters) for N passes and
reports per-pass wall + GC time delta.

    FTMCS_DRIVER_MEMORY=16g python tools/probe_concurrent_heap_r08.py 3
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.session import get_spark

    import bench
    import __spark_entry__ as entry_mod

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    spark = get_spark(
        "ftmcs-conc-heap-probe",
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

    qs = entry_mod.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.select(
            F.xxhash64(F.struct(*df.columns)).alias("h")
        ).groupBy().agg(F.count("h"), F.try_sum("h")).collect()
        return time.perf_counter() - t0

    heap = os.environ.get("FTMCS_DRIVER_MEMORY", "16g")
    print(f"heap={heap} passes={n_passes}")
    for i in range(n_passes):
        spark.catalog.clearCache()
        jvm.System.gc()
        time.sleep(1.0)
        g0, s0 = gc_ms(), steal_ticks()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(run, bench.HEADLINE))
        wall = time.perf_counter() - t0
        print(
            f"pass {i}: wall {wall:7.2f}s  gc +{(gc_ms() - g0) / 1e3:6.2f}s"
            f"  steal +{steal_ticks() - s0}",
            flush=True,
        )


if __name__ == "__main__":
    main()
