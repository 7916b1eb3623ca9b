"""Streaming-ingest throughput soak (round 8; §2.11 scale evidence).

The streaming path (readStream json -> explode -> watermark ->
dropDuplicatesWithinWatermark -> parquet sink) is parity-tested but was
never RATE-measured. This drains an sf1-sized corpus through the real
stream in micro-batches and records:

- end-to-end statements/sec over the drain,
- per-batch dedup STATE rows (the bounded-state claim: with the
  watermark shorter than the inter-batch gap, each batch's id state
  evicts as the next batch advances the watermark — state must stay
  ~one batch's ids, NOT the whole stream's),
- output-row correctness (sink count == exploded statement count).

Usage: PYTHONPATH=/root/repo python tools/soak_streaming.py [n=1_000_000]
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

N_FILES = 100
FILES_PER_TRIGGER = 10


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from soak_spine import synth_entities
    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.streaming.ingest import stream_statements_to_store

    spark = get_spark("soak-streaming")
    root = tempfile.mkdtemp(prefix="stream-")
    src = os.path.join(root, "src")
    out: dict[str, object] = {"n_entities": n}
    t0 = time.time()

    synth_entities(spark, n).repartition(N_FILES).write.json(src)
    out["gen_json_s"] = round(time.time() - t0, 2)
    print(f"json corpus written in {out['gen_json_s']}s", flush=True)

    t1 = time.time()
    q = stream_statements_to_store(
        spark,
        src,
        os.path.join(root, "store"),
        os.path.join(root, "ckpt"),
        dataset="stream",
        watermark="1 second",
        available_now=True,
        max_files_per_trigger=FILES_PER_TRIGGER,
    )
    state_rows, batches = [], 0
    seen = set()
    while q.isActive:
        p = q.lastProgress
        if p and p["batchId"] not in seen:
            seen.add(p["batchId"])
            batches += 1
            for op in p.get("stateOperators", []):
                state_rows.append(op.get("numRowsTotal", 0))
        time.sleep(0.5)
    q.awaitTermination()
    drain = round(time.time() - t1, 2)

    n_out = spark.read.parquet(os.path.join(root, "store", "statements")).count()
    out.update(
        drain_s=drain,
        n_statements=n_out,
        statements_per_sec=int(n_out / drain),
        n_batches=batches,
        state_rows_max=max(state_rows) if state_rows else 0,
        state_rows_per_batch=state_rows,
    )
    expected = n * 40
    assert n_out == expected, f"sink rows {n_out} != {expected}"
    out["total"] = round(time.time() - t0, 2)
    print("RESULT " + json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
