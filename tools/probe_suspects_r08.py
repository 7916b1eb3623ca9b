"""Focused probe for r08 regression suspects (t24/d14/d15/d4).

Same protocol as probe_ab_touched_r08 but parameterized, so an
alternating base/head driver loop can interleave the two codebases in
time and steal bursts hit both sides equally in expectation.

    python tools/probe_suspects_r08.py OUT.json op1 op2 ... [--n N]
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
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.session import get_spark

    import __spark_entry__ as entry_mod

    out_path = sys.argv[1]
    args = sys.argv[2:]
    n = 3
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    ops = args

    spark = get_spark(
        "ftmcs-suspect-probe",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    for t in ["documents", "embeddings", "lineitem"]:
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

    for name in ops:  # warm-up sweep
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
    out["steal_ticks"] = steal_ticks() - s0
    out["wall_s"] = round(time.perf_counter() - t_start, 1)
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
