"""Concurrent-wall A/B (optimization round r08, interference triage).

Post-reboot (Aug 17 ~10:08) every full battery's 8-way concurrent
block shows chaotic pass walls (40->545s baseline, 75->272s final)
while the pre-reboot battery on the SAME inherited code was flat
(34.4-37.6s).  This experiment separates box from config: run an
8-way concurrent pass over a fixed heavier-op subset N times under
(A) HEAD session defaults and (B) the r07 AQE config
(parallelismFirst=false + 1m floor), alternating A/B/A/B in fresh
sessions so box drift hits both arms equally.

Usage: python tools/exp_concurrent_r08.py [passes_per_arm]
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

OPS = [
    "j3_join_revenue_nation",
    "j13_late_sole_shippers",
    "a5_pricing_summary",
    "a8_count_distinct",
    "e1_entity_assembly",
    "t11_bigram_lm",
    "t12_tfidf_terms",
    "d2_exact_dup_groups",
    "d3_minhash_lsh_pairs",
    "d4_simhash_pairs",
    "d5_ngram_jaccard",
    "v2_knn_join",
    "d8_decontamination",
    "d11_line_dedup",
    "d12_cross_dedup",
    "v9_semantic_dedup",
    "d14_exact_substring_dedup",
    "j17_triangle_count",
    "d15_cross_substring_dedup",
    "v10_ann_recall",
    "d16_minhash_clusters",
    "d17_containment_pairs",
    "d18_cluster_size_histogram",
    "d19_tfidf_cosine_pairs",
    "t20_cross_corpus_lm",
    "a24_column_profile",
    "t30_bloom_decontaminate",
    "j21_label_propagation",
    "a31_ks_drift_by_source",
    "v13_ivfpq_topk",
    "t39_idf_rarity",
    "j22_sorted_neighborhood",
]

R07_CONF = {
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
}


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.session import get_spark
    import __spark_entry__ as entry

    qs = entry.queries()

    def new_session(conf: dict) -> "SparkSession":
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
            time.sleep(1.0)
        return get_spark(master=f"local[{CPUS}]", extra_conf=conf)

    results: dict[str, list] = {"head": [], "r07conf": []}
    arms = [("head", {}), ("r07conf", R07_CONF)]
    for p in range(passes):
        for arm, conf in arms:
            spark = new_session(conf)
            spark.sparkContext.setJobDescription(f"exp_concurrent {arm} pass {p}")

            def run(name: str) -> float:
                t0 = time.perf_counter()
                df = qs[name](spark, SF_DIR)
                df.select(
                    F.xxhash64(F.struct(*df.columns)).alias("h")
                ).groupBy().agg(F.count("h"), F.try_sum("h")).collect()
                return time.perf_counter() - t0

            # warm pass is implicit in the first timed pass (both arms
            # pay it equally on their fresh sessions).
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=8) as pool:
                per_op = dict(zip(OPS, pool.map(run, OPS)))
            wall = round(time.perf_counter() - t0, 3)
            slowest = sorted(per_op.items(), key=lambda kv: -kv[1])[:5]
            results[arm].append(
                {"pass": p, "wall": wall,
                 "top5": [(k, round(v, 2)) for k, v in slowest]}
            )
            print(json.dumps(results[arm][-1] | {"arm": arm}), flush=True)

    print(json.dumps({
        "ops": len(OPS),
        "head_walls": [r["wall"] for r in results["head"]],
        "r07conf_walls": [r["wall"] for r in results["r07conf"]],
    }), flush=True)


if __name__ == "__main__":
    main()
