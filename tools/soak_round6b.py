"""Round-6 soak, part 2: the late-round ops (windowed HLL, interval
overlap, n-gram novelty) at 1x/10x/100x salted replication.
Run: PYTHONPATH=/root/repo python tools/soak_round6b.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"stage": label, "wall_s": dt, "rows_out": n}), flush=True)


def main():
    from ftm_columnstore_spark.operators.temporal import interval_overlap_join
    from ftm_columnstore_spark.operators.text import ngram_novelty
    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.streaming.windows import (
        hll_estimate_from_windowed_registers,
        windowed_hll_registers,
    )

    spark = get_spark(
        "soak-r6b", master="local[32]", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev_base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    doc_base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_ev, n_doc = ev_base.count(), doc_base.count()
    for factor in (1, 10, 100):
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        ev = (
            ev_base.crossJoin(reps)
            .select(
                (F.col("event_id") + F.col("rep") * n_ev).alias("event_id"),
                # shift each replica by rep hours so windows/intervals spread
                (F.col("ts") + F.make_interval(hours=F.col("rep"))).alias("ts"),
                (F.col("user_id") + F.col("rep") * 1000).alias("user_id"),
                "event_type",
                "value",
            )
            .repartition(32)
            .persist()
        )
        docs = (
            doc_base.crossJoin(reps)
            .select(
                (F.col("doc_id") + F.col("rep") * n_doc).alias("doc_id"),
                F.when(F.col("rep") % 10 == 0, F.col("text"))
                .otherwise(
                    F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string"))
                )
                .alias("text"),
            )
            .repartition(32)
            .persist()
        )
        print(json.dumps({"scale": factor, "events": ev.count(), "docs": docs.count()}), flush=True)
        timed(
            f"windowed_hll(estimate) x{factor}",
            lambda: hll_estimate_from_windowed_registers(
                windowed_hll_registers(ev, "user_id", "1 hour", p=8, watermark=None),
                p=8,
            ).count(),
        )

        def _w9():
            span = lambda t: ev.where(F.col("event_type") == t).select(  # noqa: E731
                F.col("event_id").alias("id"),
                "user_id",
                F.unix_timestamp("ts").alias("start"),
                (F.unix_timestamp("ts") + 600).alias("end"),
            )
            return interval_overlap_join(
                span("click"), span("purchase"), key="user_id", bucket_width=600
            ).count()

        timed(f"interval_overlap x{factor}", _w9)
        timed(f"ngram_novelty x{factor}", lambda: ngram_novelty(docs, n=3).count())
        ev.unpersist()
        docs.unpersist()


if __name__ == "__main__":
    main()
