"""fpx side-write layout experiment (VERDICT r6 item 6 — the ONE
untried lever, then the question retires).

History: the sf1 fingerprint side-write costs 161-169s/40M statements,
attributed to intrinsic shuffle volume; the narrow-distinct restructure
was measured WRONG on both correctness and speed and reverted (NOTES
round-8). The remaining lever is LAYOUT: derive fingerprints from the
canonical_id-bucketed statement table instead of the plain store, so
the scan arrives pre-clustered.

Expectation going in (recorded so the result reads honestly): the
pipeline's expensive edges are keyed on VALUE (the token join-back)
and on the full 7-column output row (the semantically load-bearing
distinct) — neither rides a canonical_id bucketing, so the bucketed
scan should NOT move the number. If it doesn't, the closing
attribution line gets written and the question stops being revisited.

Run: PYTHONPATH=/root/repo python tools/exp_fpx_bucketed.py [n=1_000_000]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from soak_spine import synth_entities
    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.store import Store
    from ftm_columnstore_spark.operators.blocking import derive_fingerprints

    root = tempfile.mkdtemp(prefix="fpx-bucketed-")
    spark = get_spark(
        "exp-fpx-bucketed",
        extra_conf={
            "spark.sql.warehouse.dir": os.path.join(root, "warehouse")
        },
    )
    store = Store(spark, os.path.join(root, "store"))
    out: dict = {"n_entities": n}
    t0 = time.time()

    def phase(name: str, fn):
        t = time.time()
        r = fn()
        out[name] = round(time.time() - t, 2)
        print(f"[{time.time() - t0:7.1f}s] {name}: {out[name]}s -> {r}",
              flush=True)
        return r

    phase("write_statements",
          lambda: store.write_entities(synth_entities(spark, n)))
    phase("optimize", store.optimize)
    phase("bucket_build",
          lambda: store.to_bucketed_table("stmts_fpx", buckets=64))

    def run_fpx(label: str, stmts) -> int:
        sink = os.path.join(root, f"fpx_{label}")
        derive_fingerprints(stmts).write.mode("overwrite").parquet(sink)
        n_rows = spark.read.parquet(sink).count()
        shutil.rmtree(sink, ignore_errors=True)
        return n_rows

    out["n_fpx_plain"] = phase(
        "fpx_from_plain_store", lambda: run_fpx("plain", store.statements())
    )
    out["n_fpx_bucketed"] = phase(
        "fpx_from_bucketed",
        lambda: run_fpx("bucketed", store.bucketed_statements("stmts_fpx")),
    )
    assert out["n_fpx_plain"] == out["n_fpx_bucketed"], out
    out["total_s"] = round(time.time() - t0, 2)
    print(json.dumps(out), flush=True)
    spark.sql("DROP TABLE IF EXISTS stmts_fpx")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
