"""Round-7 soak, part 2: the six late ops at 1x/10x/100x (same salted
replication as soak_round7). Expected shapes:

- char_entropy: linear in corpus BYTES (the (id,char) relation) —
  two keyed aggs, no joins.
- snapshot_diff: two digest projections + one full-outer join on id.
- readability: ONE narrow projection — flat per scan.
- stratified_reservoir: one stratum-keyed window — linear.
- ohlc_rollup: one keyed agg — flat per scan.
- truncated_recall: corpus streamed twice (full + truncated rankings).

Run: PYTHONPATH=/root/repo python tools/soak_round7b.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.soak_round7 import expand_docs, expand_events  # noqa: E402

SCALES = [1, 10, 100]


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"stage": label, "wall_s": dt, "rows_out": n}))


def main():
    from ftm_columnstore_spark.operators.aggregations import snapshot_diff
    from ftm_columnstore_spark.operators.sampling import (
        weighted_reservoir_by_stratum,
    )
    from ftm_columnstore_spark.operators.temporal import ohlc_rollup
    from ftm_columnstore_spark.operators.text import (
        char_entropy,
        readability_scores,
    )
    from ftm_columnstore_spark.session import get_spark

    spark = get_spark(
        "soak-r7b",
        master="local[32]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for factor in SCALES:
        docs, n = expand_docs(spark, factor)
        print(json.dumps({"scale": factor, "docs": n}))
        timed(
            f"char_entropy x{factor}",
            lambda: char_entropy(docs).count(),
        )
        old = docs.where(F.col("doc_id") % 19 != 18)
        new = docs.where(F.col("doc_id") % 17 != 16).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" v2")),
            ).otherwise(F.col("text")),
        )
        timed(
            f"snapshot_diff x{factor}",
            lambda: snapshot_diff(old, new, "doc_id", ["text"]).count(),
        )
        timed(
            f"readability x{factor}",
            lambda: readability_scores(docs).count(),
        )
        timed(
            f"stratified_reservoir(k=20) x{factor}",
            lambda: weighted_reservoir_by_stratum(
                docs, "n_chars", k=20, stratum_col="lang"
            ).count(),
        )
        ev, ne = expand_events(spark, factor)
        print(json.dumps({"scale": factor, "events": ne}))
        timed(
            f"ohlc_rollup x{factor}",
            lambda: ohlc_rollup(
                ev, key_col="event_type", tiebreak_col="event_id"
            ).count(),
        )
        if factor > 1:
            docs.unpersist()
            ev.unpersist()


if __name__ == "__main__":
    main()
