"""Non-assembly consumer on the bucketed layout at 200M statements
(VERDICT r7 item 5: prove the 2.68× bucketed-assembly claim generalizes
to other canonical_id-keyed consumers).

The consumer is e3's whole-entity return — the reference's most common
query shape (filter on a property → return the ENTIRE matching
entities):

  ids   = stmts.filter(prop/value).select(canonical_id).distinct()
  whole = stmts semi-join ids on canonical_id
  out   = assemble_entities(whole)

On the plain store this costs a distinct shuffle + a join shuffle +
the assembly shuffle, all keyed on canonical_id. On the bucketed
snapshot (via the round's public Store.use_bucketed()) every one of
those is satisfied by the bucketed scan — the plan should carry ZERO
shuffle Exchanges. Records wall time and per-plan Exchange counts for
both paths.

Run: PYTHONPATH=/root/repo python tools/soak_bucketed_consumer.py [n=5_000_000]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BUCKETS = 128


def exchanges(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "shuffle": len(re.findall(r"\bExchange hashpartitioning", plan)),
        "broadcast": len(re.findall(r"\bBroadcastExchange", plan)),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    from soak_spine import synth_entities

    from ftm_columnstore_spark.operators.assembly import assemble_entities
    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.store import Store

    root = tempfile.mkdtemp(prefix="bucketed-consumer-")
    spark = get_spark(
        "soak-bucketed-consumer",
        extra_conf={
            "spark.sql.warehouse.dir": os.path.join(root, "warehouse"),
            "spark.local.dir": os.path.join(root, "scratch"),
        },
    )
    store = Store(spark, os.path.join(root, "store"))
    out: dict = {"n_entities": n, "buckets": BUCKETS}
    t0 = time.time()

    def phase(name: str, fn):
        t = time.time()
        r = fn()
        out[name] = round(time.time() - t, 2)
        free = shutil.disk_usage(root).free // 2**30
        print(
            f"[{time.time() - t0:7.1f}s] {name}: {out[name]}s "
            f"(free {free}GB) -> {r}",
            flush=True,
        )
        return r

    from pyspark.sql import functions as F

    def consumer(stmts):
        # e3 shape: country=de → whole matching entities
        ids = (
            stmts.filter(
                (F.col("prop") == "country") & (F.col("value") == "de")
            )
            .select("canonical_id")
            .distinct()
        )
        whole = stmts.join(ids, on="canonical_id", how="left_semi")
        return assemble_entities(whole)

    phase(
        "write_statements",
        lambda: store.write_entities(synth_entities(spark, n)),
    )
    phase("optimize_sliced", lambda: store.optimize(slices=8))
    out["n_statements"] = phase(
        "count", lambda: store.statements().count()
    )

    sink = os.path.join(root, "consumer_out")
    plain = consumer(store.statements())
    out["exchanges_plain"] = exchanges(plain)
    phase(
        "consumer_plain",
        lambda: plain.write.mode("overwrite").parquet(sink),
    )
    out["n_matched"] = spark.read.parquet(sink).count()
    shutil.rmtree(sink, ignore_errors=True)

    phase(
        "bucket_build",
        lambda: store.to_bucketed_table("stmts_consumer", buckets=BUCKETS),
    )
    store.use_bucketed("stmts_consumer")
    bucketed = consumer(store.statements())
    out["exchanges_bucketed"] = exchanges(bucketed)
    phase(
        "consumer_bucketed",
        lambda: bucketed.write.mode("overwrite").parquet(sink),
    )
    out["n_matched_bucketed"] = spark.read.parquet(sink).count()
    assert out["n_matched_bucketed"] == out["n_matched"]
    out["speedup"] = round(out["consumer_plain"] / out["consumer_bucketed"], 2)
    out["total_s"] = round(time.time() - t0, 2)
    print(json.dumps(out), flush=True)
    spark.sql("DROP TABLE IF EXISTS stmts_consumer")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
