"""Steady-state per-op probe for r09: same protocol as r08's touched-op
probe (fresh session, warm-up sweep, N samples per op, bench-identical
row-digest action, /proc/stat steal counter bracketing the timed
region) but the op list comes from the command line so any suspect can
be probed without editing the tool.

    python tools/probe_ops_r09.py [-n N] op1 op2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    args = sys.argv[1:]
    n = 4
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    ops = args
    if not ops:
        raise SystemExit("usage: probe_ops_r09.py [-n N] op1 op2 ...")

    from pyspark.sql import functions as F

    from ftm_columnstore_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        "ftmcs-probe-r09",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    qs = entry_mod.queries()

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(f"probe_r09 {name}")
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

    for name in ops:
        run(name)
        settle()

    s0 = steal_ticks()
    t_start = time.perf_counter()
    out: dict = {"samples": {}, "min": {}}
    for name in ops:
        samples = []
        for _ in range(n):
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
