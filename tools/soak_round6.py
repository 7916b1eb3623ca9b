"""Round-6 scale soak: the five new operators at 1x/10x/100x salted
replication of the sf0.1 documents table (same machinery as
soak_round4/5). What each should show:

- log2_histogram(+quantile): wall tracks the single build scan; the
  sketch is ≤66 rows per lang, quantile read-off constant.
- moments_sketch(+stats): one map-side-combinable agg — flat per scan.
- phrase_match: postings filtered to 3 terms; joins linear in the
  matched postings, never the corpus.
- rake_keywords: every shuffle keyed by doc_id — linear, no skew cliff.
- containment_pairs: the max_df guard is the expansion bound — pair
  rows stay bounded as df inflates with replication.

Run: PYTHONPATH=/root/repo python tools/soak_round6.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [1, 10, 100]


def expand(spark, factor: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    n_base = base.count()
    if factor == 1:
        return base, n_base
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    out = (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
            F.when(F.col("rep") % 10 == 0, F.col("text"))
            .otherwise(
                F.concat(
                    F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .persist()
    )
    return out, out.count()


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"stage": label, "wall_s": dt, "rows_out": n}))
    return dt


def main():
    from ftm_columnstore_spark.operators.dedup import containment_pairs
    from ftm_columnstore_spark.operators.retrieval import phrase_match
    from ftm_columnstore_spark.operators.sketches import (
        log2_histogram,
        log2_histogram_quantile,
        moments_sketch,
        moments_stats,
    )
    from ftm_columnstore_spark.operators.text import rake_keywords
    from ftm_columnstore_spark.session import get_spark

    spark = get_spark(
        "soak-r6",
        master="local[32]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for factor in SCALES:
        docs, n = expand(spark, factor)
        print(json.dumps({"scale": factor, "docs": n}))
        timed(
            f"log2_histogram+quantile x{factor}",
            lambda: log2_histogram_quantile(
                log2_histogram(docs, "n_chars", group_by=["lang"]),
                [0.5, 0.9, 0.99],
                group_by=["lang"],
            ).count(),
        )
        timed(
            f"moments_stats x{factor}",
            lambda: moments_stats(
                moments_sketch(docs, "n_chars", group_by=["source"])
            ).count(),
        )
        timed(
            f"phrase_match x{factor}",
            lambda: phrase_match(docs, "hash value table").count(),
        )
        timed(
            f"rake_keywords(top2) x{factor}",
            lambda: rake_keywords(docs, ["a", "the"], top_k=2).count(),
        )
        timed(
            f"containment_pairs(max_df=64) x{factor}",
            lambda: containment_pairs(
                docs, shingle_k=3, min_containment=0.6, max_df=64
            ).count(),
        )
        if factor > 1:
            docs.unpersist()


if __name__ == "__main__":
    main()
