"""Round-7 scale soak: the nine new operators at 1x/10x/100x salted
replication (same machinery as soak_round4/5/6). What each should show:

- pmi_collocations: unigram/bigram aggs track the scan; the marginal
  joins see only surviving pairs (min_count floor) — flat-ish.
- idf_rarity: two keyed aggs + one token-keyed join — linear.
- tfidf_cosine_pairs: max_df is the pair-fanout bound — replication
  inflates df, so the pruned space SHRINKS and pairs stay bounded
  (the d17 containment behavior).
- ks_drift: per-distinct-value agg + n_buckets-bounded prefix sum —
  flat in distinct values.
- weighted_reservoir_sample: one narrow map + TakeOrderedAndProject.
- correlation_matrix: one map-side agg — flat per scan.
- label_propagation: one shuffle pair per round over edges — linear
  in edges (disjoint replicas, so labels stay within replicas).
- windowed_cms + read-off: state is d*w per hour regardless of rows.
- sorted_neighborhood_pairs: rank + window-1 explode — linear.

Run: PYTHONPATH=/root/repo python tools/soak_round7.py
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


def expand_docs(spark, factor: int):
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


def expand_events(spark, factor: int):
    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = base.count()
    if factor == 1:
        return base, n
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    out = (
        base.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * n).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * 100000).alias("user_id"),
            "event_type",
            "value",
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
    from ftm_columnstore_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )
    from ftm_columnstore_spark.operators.dedup import tfidf_cosine_pairs
    from ftm_columnstore_spark.operators.graph import label_propagation
    from ftm_columnstore_spark.operators.sketches import (
        correlation_matrix,
        ks_drift,
    )
    from ftm_columnstore_spark.operators.sampling import (
        weighted_reservoir_sample,
    )
    from ftm_columnstore_spark.operators.text import (
        idf_rarity,
        pmi_collocations,
    )
    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.streaming.windows import (
        cms_heavy_hitters_from_windowed,
        windowed_cms_counts,
    )

    spark = get_spark(
        "soak-r7",
        master="local[32]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for factor in SCALES:
        docs, n = expand_docs(spark, factor)
        print(json.dumps({"scale": factor, "docs": n}))
        timed(
            f"pmi_collocations x{factor}",
            lambda: pmi_collocations(docs, min_count=3, top_n=25).count(),
        )
        timed(
            f"idf_rarity x{factor}",
            lambda: idf_rarity(docs).count(),
        )
        timed(
            f"tfidf_cosine_pairs(n=3,max_df=50) x{factor}",
            lambda: tfidf_cosine_pairs(
                docs, threshold=0.3, n=3, max_df=50
            ).count(),
        )
        timed(
            f"ks_drift(n_chars en/non) x{factor}",
            lambda: ks_drift(
                docs.where(F.col("lang") == "en"),
                docs.where(F.col("lang") != "en"),
                "n_chars",
            ).count(),
        )
        timed(
            f"weighted_reservoir(k=100) x{factor}",
            lambda: weighted_reservoir_sample(docs, "n_chars", 100).count(),
        )
        ev, ne = expand_events(spark, factor)
        print(json.dumps({"scale": factor, "events": ne}))
        timed(
            f"corr_matrix(events value/user/event_id) x{factor}",
            lambda: correlation_matrix(
                ev, ["value", "user_id", "event_id"]
            ).count(),
        )

        def _st6():
            cms = windowed_cms_counts(
                ev, "event_type", "1 hour", d=4, w=256, watermark=None
            )
            keys = (
                ev.where(F.col("event_type").isNotNull())
                .select(
                    F.date_format(
                        F.window(F.col("ts"), "1 hour").start,
                        "yyyy-MM-dd HH:mm:ss",
                    ).alias("window_start"),
                    "event_type",
                )
                .distinct()
            )
            return cms_heavy_hitters_from_windowed(
                cms, keys, "event_type", threshold=5, d=4, w=256
            ).count()

        timed(f"windowed_cms+readoff x{factor}", _st6)
        # user_id pairs within same (hour, type, user-hash cell) form
        # the LPA edge source; the cell key keeps PER-BUCKET user count
        # roughly constant as replication grows, so EDGES scale
        # linearly with events — the operator under test is LPA, not a
        # quadratic pair generator (first cut omitted the cell and the
        # x10 edge build alone was 100x)
        ue = (
            ev.select(
                F.window("ts", "1 hour").start.alias("h"),
                "event_type",
                "user_id",
                F.pmod(F.col("user_id"), F.lit(15 * factor)).alias("cell"),
            )
            .distinct()
        )
        edges = (
            ue.alias("a")
            .join(ue.alias("b"), on=["h", "event_type", "cell"])
            .where(F.col("a.user_id") < F.col("b.user_id"))
            .select(
                F.col("a.user_id").alias("src"),
                F.col("b.user_id").alias("dst"),
            )
        )
        timed(
            f"label_propagation(3 rounds) x{factor}",
            lambda: label_propagation(edges, iterations=3).count(),
        )
        snm = docs.select(
            F.col("doc_id").alias("entity_id"),
            F.substring("text", 1, 40).alias("fp"),
        )
        timed(
            f"sorted_neighborhood(w=4) x{factor}",
            lambda: sorted_neighborhood_pairs(
                snm, "fp", id_col="entity_id", window=4, prefix_len=2
            ).count(),
        )
        if factor > 1:
            docs.unpersist()
            ev.unpersist()


if __name__ == "__main__":
    main()
