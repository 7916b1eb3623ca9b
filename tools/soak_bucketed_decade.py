"""Bucketed zero-Exchange assembly at 200M+ statements (VERDICT r6
item 1 — the round's headline measurement).

The sf1 run measured to_bucketed_table's payoff at 40M statements
(assembly 43.3s plain -> 26.1s bucketed, 1.66x, one-time build 16.6s),
but 200M — where PLAIN assembly showed single-JVM GC pressure (218s,
GCLocker retries: 5M entities' collect_set state in one heap) — was
never run through the bucketed path. This does exactly that:

  synth 5M entities -> write 200M statements -> optimize() ->
  to_bucketed_table(128) -> full assembly over the bucketed scan,
  with the Exchange-free executedPlan ASSERTED at that scale, plain
  (compacted) assembly measured in the same session for the paired
  comparison, and every output deleted as soon as measured.

Optionally at 400M (n=10_000_000): plain assembly exceeded the
sandbox's scratch budget last round (~45GB shuffle spill on top of
output+input); the bucketed scan removes the corpus-wide shuffle, so
the spill term drops out and the run may fit where the plain path
could not. Disk is checked before attempting.

Run: PYTHONPATH=/root/repo python tools/soak_bucketed_decade.py [n=5_000_000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BUCKETS = 128


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    skip_plain = "--skip-plain" in sys.argv
    # 400M: optimize()'s dedup-rewrite needs store + shuffle spill +
    # compacted copy on disk AT ONCE and ENOSPCs the 80GB sandbox
    # budget (measured; r8's plain-assembly attempt hit the same wall).
    # A single-write store of distinct synth entities is unique on
    # STATEMENT_KEY by construction, so --no-optimize sets the marker
    # instead of rewriting — the read semantics the marker asserts are
    # true, only the (already measured at 200M) rewrite is skipped.
    no_optimize = "--no-optimize" in sys.argv
    from soak_spine import synth_entities
    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.store import Store
    from ftm_columnstore_spark.operators.assembly import assemble_entities

    root = tempfile.mkdtemp(prefix="bucketed-decade-")
    spark = get_spark(
        "soak-bucketed-decade",
        extra_conf={
            "spark.sql.warehouse.dir": os.path.join(root, "warehouse")
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

    phase("write_statements", lambda: store.write_entities(synth_entities(spark, n)))
    if no_optimize:
        store._set_compacted()
        out["optimize"] = "skipped: single-write store unique by construction"
    else:
        phase("optimize", store.optimize)
    out["n_statements"] = phase("count_post_compact", lambda: store.statements().count())

    # --- plain (compacted) assembly: the paired comparison ---------------
    ent_out = os.path.join(root, "entities_plain")
    if not skip_plain:
        phase(
            "assembly_plain_compacted",
            lambda: assemble_entities(store.statements())
            .write.mode("overwrite")
            .parquet(ent_out),
        )
        shutil.rmtree(ent_out, ignore_errors=True)

    # --- one-time bucketed build -----------------------------------------
    phase(
        "bucket_build",
        lambda: store.to_bucketed_table("stmts_decade", buckets=BUCKETS),
    )
    if skip_plain:
        # the bucketed managed table is self-contained; dropping the
        # plain store here frees its bytes for the assembly output
        # (the 400M disk budget needs it)
        shutil.rmtree(store._path, ignore_errors=True)
        print("plain store dropped after bucket build", flush=True)
    bucketed = store.bucketed_statements("stmts_decade")
    entities = assemble_entities(bucketed)
    plan = entities._jdf.queryExecution().executedPlan().toString()
    out["exchange_free"] = "Exchange" not in plan
    print("exchange_free:", out["exchange_free"], flush=True)
    assert out["exchange_free"], "bucketed assembly plan contains an Exchange"

    ent_out2 = os.path.join(root, "entities_bucketed")
    phase(
        "assembly_bucketed",
        lambda: entities.write.mode("overwrite").parquet(ent_out2),
    )
    out["n_assembled"] = phase(
        "count_assembled",
        lambda: spark.read.parquet(ent_out2).count(),
    )
    shutil.rmtree(ent_out2, ignore_errors=True)

    if not skip_plain and "assembly_plain_compacted" in out:
        out["speedup_vs_plain"] = round(
            out["assembly_plain_compacted"] / out["assembly_bucketed"], 2
        )
    out["total_s"] = round(time.time() - t0, 2)
    print(json.dumps(out), flush=True)
    spark.sql("DROP TABLE IF EXISTS stmts_decade")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
