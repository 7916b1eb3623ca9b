"""Scale soak of the round-4 operators (BM25, BPE, temperature
mixture, RRF): sf0.1 documents (5k) replicated 10x/100x (same salted
replication as soak_pipeline.py) and timed per scale. Linear-ish
growth (10x rows <= ~12-13x wall) means the shapes hold; the BPE
train should grow SLOWER than corpus (vocabulary-bounded rounds), and
the fuse stage should be flat (bounded top-k inputs).

Run:  PYTHONPATH=/root/repo python tools/soak_round4.py
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
        "doc_id", "text", "source"
    )
    n_base = base.count()
    if factor == 1:
        return base, n_base
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    out = (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
            F.when(
                F.col("rep") % 10 == 0, F.col("text")
            ).otherwise(
                F.concat(
                    F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
                )
            ).alias("text"),
            "source",
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
    from ftm_columnstore_spark.operators.bpe import (
        bpe_token_counts,
        learn_bpe,
    )
    from ftm_columnstore_spark.operators.retrieval import bm25_topk
    from ftm_columnstore_spark.operators.sampling import (
        mixture_by_temperature,
    )
    from ftm_columnstore_spark.session import get_spark

    spark = get_spark(
        "soak-r4",
        master="local[32]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for factor in SCALES:
        docs, n = expand(spark, factor)
        print(json.dumps({"scale": factor, "docs": n}))
        timed(
            f"bm25_topk x{factor}",
            lambda: len(
                bm25_topk(docs, ["hash", "join", "scan"], top=25).collect()
            ),
        )
        timed(
            f"learn_bpe(12) x{factor}",
            lambda: learn_bpe(docs, n_merges=12).count(),
        )
        merges = learn_bpe(docs, n_merges=12)
        timed(
            f"bpe_token_counts x{factor}",
            lambda: bpe_token_counts(docs, merges, top=50).count(),
        )
        timed(
            f"temperature_mixture x{factor}",
            lambda: mixture_by_temperature(
                docs, alpha=0.5, seed="soak"
            ).count(),
        )
        from ftm_columnstore_spark.operators.retrieval import (
            bm25_topk_multi,
        )

        timed(
            f"bm25_multi(3q) x{factor}",
            lambda: bm25_topk_multi(
                docs,
                {"q1": ["hash", "join"], "q2": ["scan", "table"],
                 "q3": ["agg", "key", "row"]},
                top=10,
            ).count(),
        )
        if factor > 1:
            docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
