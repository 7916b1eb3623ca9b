"""Config A/B mini-battery (optimization round r08).

Runs a list of headline ops solo (best of 3, bench methodology: row-
digest materialization, cache-clear + gc + settle between ops) under
the session factory defaults plus any --conf overrides, with the
bench's pinned calibration probe interleaved so runs on this noisy box
stay comparable. Prints one JSON line at the end.

Usage: python tools/ab_conf_r08.py [--conf k=v ...] [--ops a,b,c]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

DEFAULT_OPS = [
    "a5_pricing_summary",
    "d11_line_dedup",
    "d19_tfidf_cosine_pairs",
    "d4_simhash_pairs",
    "d16_minhash_clusters",
    "d17_containment_pairs",
    "v9_semantic_dedup",
    "a24_column_profile",
    "t20_cross_corpus_lm",
    "v13_ivfpq_topk",
    "d15_cross_substring_dedup",
    "t30_bloom_decontaminate",
    "j13_late_sole_shippers",
    "j17_triangle_count",
    "t39_idf_rarity",
    "a31_ks_drift_by_source",
]


def main() -> None:
    args = sys.argv[1:]
    extra: dict[str, str] = {}
    ops = list(DEFAULT_OPS)
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, _, v = args[i + 1].partition("=")
            extra[k] = v
            i += 2
        elif args[i] == "--ops":
            ops = args[i + 1].split(",")
            i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    from pyspark.sql import functions as F

    from ftm_columnstore_spark.session import get_spark

    import __spark_entry__ as entry_mod
    import bench

    qs = entry_mod.queries()
    conf = {"spark.ui.enabled": "false"}
    conf.update(extra)
    spark = get_spark("ftmcs-ab", master=f"local[{CPUS}]", extra_conf=conf)
    for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.select(
            F.xxhash64(F.struct(*df.columns)).alias("h")
        ).groupBy().agg(F.count("h"), F.try_sum("h")).collect()
        return time.perf_counter() - t0

    calib = [bench._calibration(spark)]
    solo: dict[str, float] = {}
    for k, name in enumerate(ops):
        samples = []
        for _ in range(3):
            samples.append(round(run(name), 3))
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(0.7)
        solo[name] = min(samples)
        print(f"{name:32s} {min(samples):7.3f}  {samples}", flush=True)
        if (k + 1) % 8 == 0:
            calib.append(bench._calibration(spark))
    calib.append(bench._calibration(spark))
    print(
        json.dumps(
            {
                "conf": extra,
                "sum": round(sum(solo.values()), 3),
                "solo": solo,
                "calib": calib,
            }
        )
    )


if __name__ == "__main__":
    main()
