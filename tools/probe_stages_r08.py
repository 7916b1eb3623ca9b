"""Per-stage attribution probe (optimization round r08).

Runs named headline queries in a session WITH the UI enabled, then pulls
per-stage metrics from the local REST API: task count, executor run
time, shuffle read/write bytes. Answers "is this stage single-task?"
and "where does the CPU go?" — the two questions explain() cannot.

Usage: python tools/probe_stages_r08.py [--conf k=v ...] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    extra: dict[str, str] = {}
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, _, v = args[i + 1].partition("=")
            extra[k] = v
            i += 2
        else:
            names.append(args[i])
            i += 1

    from pyspark.sql import functions as F

    from ftm_columnstore_spark.session import get_spark

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    conf = {"spark.ui.enabled": "true", "spark.ui.port": "4050"}
    conf.update(extra)
    spark = get_spark(
        "ftmcs-stage-probe", master=f"local[{CPUS}]", extra_conf=conf
    )
    for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4050/api/v1/applications/{app_id}"

    def rest(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.loads(r.read())

    def run(name: str) -> float:
        df = qs[name](spark, SF_DIR)
        t0 = time.perf_counter()
        df.select(
            F.xxhash64(F.struct(*df.columns)).alias("h")
        ).groupBy().agg(F.count("h"), F.try_sum("h")).collect()
        return time.perf_counter() - t0

    for name in names:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(0.5)
        # warm run (codegen/JIT), then measured run
        run(name)
        spark.catalog.clearCache()
        time.sleep(0.5)
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        wall = run(name)
        time.sleep(0.3)
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages ===")
        rows = []
        for sid in stage_ids:
            try:
                infos = rest(f"/stages/{sid}")
            except Exception:
                continue
            for s in infos:
                if s["status"] == "SKIPPED":
                    rows.append((sid, "SKIPPED", 0, 0.0, 0, 0, ""))
                    continue
                rows.append(
                    (
                        sid,
                        s["status"],
                        s["numCompleteTasks"],
                        s["executorRunTime"] / 1000.0,
                        s.get("shuffleReadBytes", 0),
                        s.get("shuffleWriteBytes", 0),
                        s.get("name", "")[:60],
                    )
                )
        rows.sort(key=lambda r: -r[3])
        for sid, st, nt, rt, srb, swb, nm in rows:
            print(
                f"  stage {sid:4d} {st:9s} tasks {nt:3d} "
                f"runtime {rt:7.3f}s shufR {srb:>9d} shufW {swb:>9d}  {nm}",
                flush=True,
            )


if __name__ == "__main__":
    main()
