"""Heap-size A/B for the heavy-tailed dedup-family solo noise (r08).

The battery's solo samples for d4/d5/d16 swing 3-10x between adjacent
runs (BENCH_FULL sidecars, all four r08 batteries), and the 8-way
concurrent wall degrades monotonically across passes (40->94s in
clean1). Both smell like GC pressure in the 16g local[32] driver JVM
(executors in-process: ~500MB/task-thread before memory.fraction).

This probe runs the noisiest ops N times in ONE fresh session per heap
size (heap is first-session-only, so run this script once per config):

    FTMCS_DRIVER_MEMORY=16g python tools/probe_heap_r08.py
    FTMCS_DRIVER_MEMORY=32g python tools/probe_heap_r08.py

Mirrors bench.py's run() exactly (row-digest materialization,
clearCache+gc+settle between samples) so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

OPS = [
    "d4_simhash_pairs",
    "d5_ngram_jaccard",
    "d16_minhash_clusters",
    "d12_cross_dedup",
    "e1_entity_assembly",
    "d14_exact_substring_dedup",
]
N_SAMPLES = 5


def main() -> None:
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        "ftmcs-heap-probe",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    qs = entry_mod.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.select(
            F.xxhash64(F.struct(*df.columns)).alias("h")
        ).groupBy().agg(F.count("h"), F.try_sum("h")).collect()
        return round(time.perf_counter() - t0, 3)

    heap = os.environ.get("FTMCS_DRIVER_MEMORY", "16g")
    out: dict = {"heap": heap, "samples": {}}
    for name in OPS:
        samples = []
        for _ in range(N_SAMPLES):
            samples.append(run(name))
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(1.0)
        out["samples"][name] = samples
        print(name, samples, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
