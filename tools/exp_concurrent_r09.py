"""Concurrent-wall A/B for r09 (VERDICT r8 item 1).

Arms, alternated pass-by-pass in fresh sessions so box drift hits all
equally, each bracketed by the /proc/stat steal counter:

  head     — HEAD session defaults (parallelismFirst=true, 256k floor)
  r07conf  — the r07 AQE config (parallelismFirst=false + 1m floor)
  fair     — HEAD defaults + spark.scheduler.mode=FAIR (round-robin
             across the 8 concurrent jobs instead of FIFO backfill)

Runs the FULL 111-op headline set with the bench's own 8-way submit
shape so the number is the driver's headline wall, not a subset proxy.

Usage: python tools/exp_concurrent_r09.py [passes_per_arm] [arm ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

ARMS = {
    "head": {},
    "r07conf": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
    },
    "fair": {"spark.scheduler.mode": "FAIR"},
}


def steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    arm_names = sys.argv[2:] or list(ARMS)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.session import get_spark
    import bench as bench_mod
    import __spark_entry__ as entry

    qs = entry.queries()
    ops = bench_mod.HEADLINE

    def new_session(conf: dict) -> "SparkSession":
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
            time.sleep(1.0)
        spark = get_spark(
            master=f"local[{CPUS}]",
            extra_conf={"spark.ui.enabled": "false", **conf},
        )
        for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        return spark

    results: dict[str, list] = {a: [] for a in arm_names}
    for p in range(passes):
        for arm in arm_names:
            spark = new_session(ARMS[arm])
            sess = {"spark": spark}

            def run(name: str) -> float:
                s = sess["spark"]
                s.sparkContext.setJobDescription(f"exp_r09 {arm} p{p} {name}")
                t0 = time.perf_counter()
                df = qs[name](s, SF_DIR)
                df.select(
                    F.xxhash64(F.struct(*df.columns)).alias("h")
                ).groupBy().agg(F.count("h"), F.try_sum("h")).collect()
                return time.perf_counter() - t0

            # warm-up pass (8-way, untimed) so AQE/codegen state matches
            # the bench's steady-state block, then the timed pass.
            with ThreadPoolExecutor(max_workers=8) as pool:
                list(pool.map(run, ops))
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(1.0)
            s0 = steal_ticks()
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=8) as pool:
                per_op = dict(zip(ops, pool.map(run, ops)))
            wall = round(time.perf_counter() - t0, 3)
            sd = steal_ticks() - s0
            slowest = sorted(per_op.items(), key=lambda kv: -kv[1])[:6]
            rec = {
                "arm": arm,
                "pass": p,
                "wall": wall,
                "steal_delta": sd,
                "top6": [(k, round(v, 2)) for k, v in slowest],
            }
            results[arm].append(rec)
            print(json.dumps(rec), flush=True)

    print(
        json.dumps(
            {
                "ops": len(ops),
                **{
                    f"{a}_walls": [r["wall"] for r in results[a]]
                    for a in arm_names
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
