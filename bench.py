"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line.

Two measurements:
- per-query steady-state (best of 2 sequential runs — codegen/JIT warm);
- ``value`` = wall-clock for the WHOLE headline suite submitted with
  8-way concurrency (Spark's FAIR-ish overlap of independent jobs). This
  is the engine-throughput number — the quantity a cluster deployment
  cares about — while per-query latencies stay visible in ``queries``.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: headline set — the heavier representatives of each operator family,
#: widened in round 2 to cover every family's worst case so tail
#: regressions stay visible (VERDICT r1 item 6).
HEADLINE = [
    "j3_join_revenue_nation",
    "j6_top_customers",
    "j7_big_orders",
    "j11_order_count_distribution",
    "j13_late_sole_shippers",
    "a5_pricing_summary",
    "a3_sum_filtered",
    "a8_count_distinct",
    "a19_percentiles",
    "w1_window_latest",
    "w3_asof_join",
    "w4_band_join",
    "u2_upsert_dedup",
    "e1_entity_assembly",
    "t2_token_topk",
    "t11_bigram_lm",
    "t12_tfidf_terms",
    "d2_exact_dup_groups",
    "d3_minhash_lsh_pairs",
    "d4_simhash_pairs",
    "d5_ngram_jaccard",
    "d6_jaccard_dedup_kept",
    "d9_repetition_filter",
    "v1_ann_topk",
    "v2_knn_join",
    "v8_ivf_topk_portable",
    "st1_events_tumbling",
    "st3_session_windows",
    "t8_deterministic_shuffle",
    "d8_decontamination",
    "m5_time_rollup",
    "m6_multimodal_features",
    "d10_winnow_overlap",
    "d11_line_dedup",
    "d12_cross_dedup",
    "v9_semantic_dedup",
    "t15_quality_gate",
    "t14_winnow_fingerprints",
    "d14_exact_substring_dedup",
    "j17_triangle_count",
    "d15_cross_substring_dedup",
    "t17_perplexity_buckets",
    "t18_chunk_documents",
    "v10_ann_recall",
    "w5_funnel",
    "w6_retention",
    "w7_sessionize",
    "w8_transitions",
    "m7_audio_frames",
    "m8_resize_features",
    "m9_moving_average",
    "a21_data_checks",
    "t20_cross_corpus_lm",
    "d16_minhash_clusters",
    "v12_pq_topk",
    "v13_ivfpq_topk",
    "a22_hll_cardinality",
    "a23_cms_heavy_tokens",
    "a24_column_profile",
    "t21_nb_quality_scores",
    "a25_sample_quantiles",
    "v14_pq_knn_join",
    "t22_token_budget",
    "t23_leakage_free_split",
    "a26_table_profile",
    "t24_c4_line_filter",
    "j19_skew_hybrid_join",
    "m10_image_dup_pairs",
    "m11_audio_dup_pairs",
    "j20_k_core",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from ftm_columnstore_spark.session import get_spark

    spark = get_spark(
        "ftmcs-bench",
        master=f"local[{CPUS}]",
        # no UI/event bus: its listener queue adds jitter to short queries
        extra_conf={"spark.ui.enabled": "false"},
    )

    # warm-up: touch every table once (OS page cache + codegen warm)
    for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    qs = entry_mod.queries()

    def run(name: str) -> float:
        # Materialize EVERY row's full contents via a row-digest
        # aggregate: a bare .count() lets Catalyst eliminate
        # row-preserving joins (d14's span machinery, d11's reassembly
        # branch collapse to a scan count — measured 10x+ too fast).
        # One summed hash forces the whole plan and returns one row.
        from pyspark.sql import functions as F

        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.select(
            F.xxhash64(F.struct(*df.columns)).alias("h")
        ).groupBy().agg(F.count("h"), F.try_sum("h")).collect()
        return time.perf_counter() - t0

    # sequential steady-state latencies, best of 3 (GC pauses land
    # somewhere every suite pass; three samples isolate them)
    solo: dict[str, float] = {}
    for name in HEADLINE:
        solo[name] = round(min(run(name) for _ in range(3)), 3)
        # drop caches persisted inside operators (d3/d5 reuse their
        # mid-relations within a query; stranded entries otherwise pile
        # up across 100+ invocations and surface as GC-pressure spikes
        # on whatever runs next) and start from a clean heap
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    # pass 3+: throughput — whole suite, 8 concurrent submitters,
    # best of 3 (AQE/persist warm-up + GC variance dominate a single
    # run; observed 2x swings between identical passes). Per-query
    # latencies UNDER contention come from the best-wall pass, so
    # `queries` carries {solo, concurrent} and rounds diff
    # like-for-like (solo = plan quality, concurrent = scheduler mix).
    wall = float("inf")
    concurrent: dict[str, float] = {}
    for _ in range(3):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as pool:
            pass_times = dict(zip(HEADLINE, pool.map(run, HEADLINE)))
        elapsed = time.perf_counter() - t0
        if elapsed < wall:
            wall = elapsed
            concurrent = {k: round(v, 3) for k, v in pass_times.items()}
    wall = round(wall, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": (
                    f"wall-clock to run all {len(HEADLINE)} headline ops "
                    "(8-way concurrent, steady state, full row-digest "
                    "materialization)"
                ),
                "value": wall,
                "unit": "sec",
                "queries": {
                    name: {
                        "solo": solo[name],
                        "concurrent": concurrent[name],
                    }
                    for name in HEADLINE
                },
                "sum_sequential": round(sum(solo.values()), 3),
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
