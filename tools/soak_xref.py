"""sf1-scale soak of the XREF lifecycle (round 8; extends soak_spine.py).

The reference's flagship workflow beyond querying — fingerprint blocking
(D1/D2) -> candidate pairs (J5) -> scoring (D4) -> connected components
(D5) -> resolver installed -> canonicalized entity re-assembly — has only
ever run on fixture-sized corpora. This drives it end-to-end at 1M
entities / 40M statements (the soak_spine corpus: 50k/70k shared name-part
pools make fingerprint blocks ~14-20 entities wide, the realistic shape),
measuring each stage materialized:

  1. ingest (write_entities)
  2. fpx derivation (distinct-before-UDF metaphone/soundex)
  3. blocking_candidates (frequency-capped blocks)
  4. candidate_pairs (within-block self-join + cross-block distinct)
  5. score_pairs (JVM levenshtein over every candidate)
  6. accepted_edges + connected_components (star / union-find fast path)
  7. set_resolver + canonicalized assembly (the post-resolution read)

Usage: PYTHONPATH=/root/repo python tools/soak_xref.py [n_entities]
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

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from soak_spine import synth_entities
    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.store import Store
    from ftm_columnstore_spark.operators.assembly import assemble_entities
    from ftm_columnstore_spark.operators.blocking import (
        blocking_candidates,
        candidate_pairs,
        connected_components,
        derive_fingerprints,
        score_pairs,
    )
    from ftm_columnstore_spark.operators.xref import accepted_edges, build_xref

    spark = get_spark("soak-xref")
    root = tempfile.mkdtemp(prefix="xref-")
    store = Store(spark, os.path.join(root, "store"))
    out: dict[str, object] = {"n_entities": n}
    t0 = time.time()

    def phase(name: str, fn):
        t = time.time()
        r = fn()
        out[name] = round(time.time() - t, 2)
        print(f"[{time.time() - t0:7.1f}s] {name}: {out[name]}s -> {r}")
        return r

    phase("ingest", lambda: store.write_entities(synth_entities(spark, n)))
    stmts = store.statements()

    fpx = derive_fingerprints(stmts).persist()
    out["n_fpx"] = phase("fpx_derive", fpx.count)

    blocks = blocking_candidates(fpx, min_entities=3, max_entities=50).persist()
    out["n_block_rows"] = phase("blocking", blocks.count)

    pairs = candidate_pairs(blocks).persist()
    out["n_pairs"] = phase("candidate_pairs", pairs.count)

    scored = score_pairs(pairs, stmts).persist()
    out["n_scored"] = phase("score_pairs", scored.count)

    edges = scored.filter(F.col("score") >= 0.9).select("left_id", "right_id")
    cmap = connected_components(edges).persist()
    out["n_resolved"] = phase("connected_components", cmap.count)
    out["n_components"] = (
        cmap.select("canonical_id").distinct().count()
    )
    print(f"components: {out['n_components']}")

    store.set_resolver(cmap)
    ent_out = os.path.join(root, "entities")
    phase(
        "canonicalized_assembly",
        lambda: assemble_entities(store.statements())
        .write.mode("overwrite")
        .parquet(ent_out),
    )
    # biggest merged entity — the skew probe tie-in
    big = (
        store.statements()
        .groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc())
        .limit(1)
        .collect()[0]
    )
    out["max_entity_statements"] = big["n"]
    print(f"hottest canonical id holds {big['n']} statements")

    out["total"] = round(time.time() - t0, 2)
    print("RESULT " + json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
