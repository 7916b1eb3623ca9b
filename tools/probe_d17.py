"""Isolated steady-state probe for d17_containment_pairs (VERDICT r6
"What's wrong" item 2): d17 exceeded the 1.3x/0.8s solo drift line in
the r6 driver battery on git-identical code and — unlike j19 — never
got an isolated re-measurement. Per the d11 precedent, this records
one: fresh session, table warm-up, one discarded warm-up run, then N
samples with a gc+settle between each (the same hygiene bench.py
applies), plus the pinned calibration probe so the box's noise floor
is part of the record.

Run: PYTHONPATH=/root/repo python tools/probe_d17.py [n_samples=6]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OPS = ["d17_containment_pairs", "j19_skew_hybrid_join"]


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import bench
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    spark = bench._new_session()
    qs = entry.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.select(F.xxhash64(F.struct(*df.columns)).alias("h")).groupBy().agg(
            F.count("h"), F.try_sum("h")
        ).collect()
        return round(time.perf_counter() - t0, 3)

    out: dict = {"machine_state": bench._machine_state()}
    out["calibration"] = [bench._calibration(spark) for _ in range(3)]
    for op in OPS:
        run(op)  # warm-up, discarded
        samples = []
        for _ in range(n_samples):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(1.0)
            samples.append(run(op))
        out[op] = {
            "samples": samples,
            "min": min(samples),
            "median": sorted(samples)[len(samples) // 2],
        }
        print(json.dumps({op: out[op]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
