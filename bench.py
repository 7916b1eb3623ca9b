"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line.

Timing = full query wall time including the action (count of the result),
after one warm-up pass of a trivial scan so JVM/session startup isn't
attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: headline set — the heavier representatives of each operator family.
HEADLINE = [
    "j3_join_revenue_nation",
    "a5_pricing_summary",
    "a3_sum_filtered",
    "a8_count_distinct",
    "w1_window_latest",
    "u2_upsert_dedup",
    "e1_entity_assembly",
    "t2_token_topk",
    "d2_exact_dup_groups",
    "d3_minhash_lsh_pairs",
    "d5_ngram_jaccard",
    "v1_ann_topk",
    "v2_knn_join",
    "st1_events_tumbling",
    "st3_session_windows",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from ftm_columnstore_spark.session import get_spark

    spark = get_spark("ftmcs-bench", master=f"local[{CPUS}]")

    # warm-up: touch every table once (OS page cache + codegen warm)
    for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best = float("inf")
        for _ in range(2):  # best-of-2: steady-state (codegen/JIT warm)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline query wall time (sum of 15 ops)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
