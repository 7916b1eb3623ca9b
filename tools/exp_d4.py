"""d4_simhash concurrent-inflation attribution experiment (VERDICT r5
item 3 / "What's wrong" #3).

Standing claim since r4: d4's 2.4s solo -> ~11s at 8-way concurrency is
shared-core arithmetic (8 concurrent queries x 32 task threads oversubscribe
the 32 cores ~8x; every query inflates, d4 most visibly because its solo
plan keeps all cores busy already). The falsifiable alternative: d4's wide
shuffles (32 partitions each) thrash the scheduler under contention, and
capping d4 to 8 shuffle partitions would recover the wall.

Design: the full 111-op headline battery, 8-way concurrent (bench.py block
2 semantics, same row-digest materialization), 3 passes per config:

  A. stock            — every query on the shared session (32 shuffle parts)
  B. d4-capped        — d4 runs on a cloned session (spark.newSession(),
                        same SparkContext/JVM) with shuffle.partitions=8

If wall(B) == wall(A) within noise AND d4's concurrent latency doesn't
move, the shuffle-width hypothesis is dead and shared-core arithmetic
stands proven — the item retires permanently.

Usage: PYTHONPATH=/root/repo python tools/exp_d4.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entry_mod
    from bench import HEADLINE, _new_session
    from pyspark.sql import functions as F

    qs = entry_mod.queries()
    results = {}
    for config in ("stock", "d4_capped"):
        spark = _new_session()
        d4_session = None
        if config == "d4_capped":
            d4_session = spark.newSession()
            d4_session.conf.set("spark.sql.shuffle.partitions", "8")

        def run(name: str) -> float:
            s = d4_session if (name == "d4_simhash_pairs" and d4_session) else spark
            t0 = time.perf_counter()
            df = qs[name](s, SF_DIR)
            df.select(F.xxhash64(F.struct(*df.columns)).alias("h")).groupBy().agg(
                F.count("h"), F.try_sum("h")
            ).collect()
            return time.perf_counter() - t0

        walls, d4_lat = [], []
        for _ in range(3):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(1.0)
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=8) as pool:
                times = dict(zip(HEADLINE, pool.map(run, HEADLINE)))
            walls.append(round(time.perf_counter() - t0, 3))
            d4_lat.append(round(times["d4_simhash_pairs"], 3))
        results[config] = {"walls": sorted(walls), "d4_concurrent": sorted(d4_lat)}
        print(f"{config}: walls={sorted(walls)} d4={sorted(d4_lat)}")
    print("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
