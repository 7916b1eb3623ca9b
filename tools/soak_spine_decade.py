"""One-decade-up spine soak: 10M entities / 400M statements (round 8).

The sf1 soak (tools/soak_spine.py) measured every stage at 40M
statements; this runs the SPINE-ONLY subset at 10x to test the
linearity claims directly — write, dedup-on-read, full entity assembly,
query DSL, compaction, post-compaction reads. The fingerprint side-write
and the (constant-size) skew probes are covered by the sf1 run and
skipped here; outputs are deleted as soon as measured to stay inside the
sandbox's disk budget (~12GB statements + transient assembly export).

Usage: PYTHONPATH=/root/repo python tools/soak_spine_decade.py [n=10_000_000]
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from soak_spine import synth_entities
    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.store import Store
    from ftm_columnstore_spark.operators.assembly import assemble_entities
    from ftm_columnstore_spark.plans.compiler import compile_entities
    from ftm_columnstore_spark.plans.query import Q

    spark = get_spark("soak-spine-decade")
    root = tempfile.mkdtemp(prefix="decade-")
    store = Store(spark, os.path.join(root, "store"))
    out: dict[str, object] = {"n_entities": n}
    t0 = time.time()

    def phase(name: str, fn):
        t = time.time()
        r = fn()
        out[name] = round(time.time() - t, 2)
        print(f"[{time.time() - t0:7.1f}s] {name}: {out[name]}s -> {r}", flush=True)
        return r

    phase("write_statements", lambda: store.write_entities(synth_entities(spark, n)))
    out["n_statements"] = phase("dedup_read_count", lambda: store.statements().count())

    ent_out = os.path.join(root, "entities")
    phase(
        "assembly_e1_export",
        lambda: assemble_entities(store.statements())
        .write.mode("overwrite")
        .parquet(ent_out),
    )
    shutil.rmtree(ent_out, ignore_errors=True)

    phase(
        "query_e3",
        lambda: compile_entities(
            store.statements(), Q().where(schema="Person").where(country="de")
        ).count(),
    )

    phase("optimize_compaction", store.optimize)
    phase("post_compact_read_count", lambda: store.statements().count())
    phase(
        "post_compact_query_e3",
        lambda: compile_entities(
            store.statements(), Q().where(schema="Person").where(country="de")
        ).count(),
    )
    phase(
        "post_compact_assembly_e1",
        lambda: assemble_entities(store.statements())
        .write.mode("overwrite")
        .parquet(ent_out),
    )

    out["total"] = round(time.time() - t0, 2)
    print("RESULT " + json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
