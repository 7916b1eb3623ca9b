"""Steady-state A/B probe for the ops touched in r08.

Batteries on this sandbox are contaminated by host CPU-steal bursts
(/proc/stat steal accrued 144s during a 100s probe window; the four
r08 batteries' solo samples for the dedup family swing 3-50x), so the
per-op before/after evidence comes from this probe instead: one fresh
session, every touched op run N times after a warm-up pass, report all
samples + min, with the /proc/stat steal counter bracketing the run so
a steal-contaminated probe is visible in the artifact.

Run from the repo root on the code under test (HEAD or a worktree):

    FTMCS_DRIVER_MEMORY=16g python tools/probe_ab_touched_r08.py
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
    "d19_tfidf_cosine_pairs",
    "d11_line_dedup",
    "a24_column_profile",
    "a5_pricing_summary",
    "t24_c4_line_filter",
    "v12_pq_topk",
    "v13_ivfpq_topk",
    "d14_exact_substring_dedup",
    "d15_cross_substring_dedup",
    "d16_minhash_clusters",
    "d12_cross_dedup",
]
N = 4


def steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        "ftmcs-ab-probe",
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

    def settle() -> None:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(1.0)

    # one un-timed warm-up sweep so JIT state matches a mid-battery run
    for name in OPS:
        run(name)
        settle()

    s0 = steal_ticks()
    t_start = time.perf_counter()
    out: dict = {"samples": {}, "min": {}}
    for name in OPS:
        samples = []
        for _ in range(N):
            samples.append(run(name))
            settle()
        out["samples"][name] = samples
        out["min"][name] = min(samples)
        print(name, samples, flush=True)
    out["steal_ticks"] = steal_ticks() - s0
    out["wall_s"] = round(time.perf_counter() - t_start, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
