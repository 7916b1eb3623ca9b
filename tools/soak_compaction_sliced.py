"""Sliced incremental compaction at decade scale (VERDICT r7 item 1 —
the round's headline measurement).

The monolithic ``optimize()`` rewrite ENOSPC'd the sandbox at 400M
statements in BOTH r6 and r7 (input + corpus-wide shuffle spill +
output resident at once). The r8 rewrite compacts per dataset partition
in ``slices`` hash-of-canonical_id jobs, so only ~1/slices of the
dataset is ever in shuffle at a time. This soak:

  synth N entities -> write ~40N statements (single dataset: the
  worst case for per-dataset incrementality — ALL the bounding must
  come from slicing) -> optimize(slices=S) with a background
  disk-watermark sampler -> verify row count, marker, fast-path plan.

The write is single-pass, so the store is unique on STATEMENT_KEY by
construction and the rewrite moves every byte — the same physical work
the r6/r7 ENOSPC runs attempted (dedup collapse would only SHRINK the
output; unique input is the upper bound).

Run: PYTHONPATH=/root/repo python tools/soak_compaction_sliced.py [n] [slices] [partitions_per_slice]
     (defaults n=10_000_000 ≈ 400M statements, slices=16)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


class DiskWatermark(threading.Thread):
    """Samples free bytes every ``interval`` s; records the minimum and
    the full (t, free_gb) series — the sawtooth segments the per-slice
    scratch growth (each slice: spill builds, output lands, spill
    frees)."""

    def __init__(self, path: str, interval: float = 2.0):
        super().__init__(daemon=True)
        self.path, self.interval = path, interval
        self.min_free = shutil.disk_usage(path).free
        self.series: list[tuple[float, float]] = []
        self._t0 = time.time()
        self._halt = threading.Event()

    def run(self) -> None:
        while not self._halt.is_set():
            free = shutil.disk_usage(self.path).free
            if free < self.min_free:
                self.min_free = free
            self.series.append(
                (round(time.time() - self._t0, 1), round(free / 2**30, 2))
            )
            self._halt.wait(self.interval)

    def stop(self) -> int:
        self._halt.set()
        self.join()
        return self.min_free


def du_gb(path: str) -> float:
    total = 0
    for dp, _dirs, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(dp, fn))
            except OSError:
                pass
    return round(total / 2**30, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    slices = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    pps = int(sys.argv[3]) if len(sys.argv) > 3 else None
    from soak_spine import synth_entities

    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.store import Store

    root = tempfile.mkdtemp(prefix="compact-sliced-")
    spark = get_spark(
        "soak-compaction-sliced",
        extra_conf={"spark.local.dir": os.path.join(root, "scratch")},
    )
    store = Store(spark, os.path.join(root, "store"))
    out: dict = {"n_entities": n, "slices": slices, "partitions_per_slice": pps}
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

    phase(
        "write_statements",
        lambda: store.write_entities(synth_entities(spark, n)),
    )
    out["store_gb"] = du_gb(store._path)
    out["free_gb_before_optimize"] = round(
        shutil.disk_usage(root).free / 2**30, 2
    )
    print(
        f"store {out['store_gb']}GB, free {out['free_gb_before_optimize']}GB",
        flush=True,
    )

    wm = DiskWatermark(root)
    wm.start()
    phase(
        "optimize_sliced",
        lambda: store.optimize(slices=slices, partitions_per_slice=pps),
    )
    out["min_free_gb_during_optimize"] = round(wm.stop() / 2**30, 2)
    out["peak_extra_gb"] = round(
        out["free_gb_before_optimize"] - out["min_free_gb_during_optimize"], 2
    )
    # decimate the series for the log (every ~10s)
    out["free_gb_series"] = wm.series[:: max(1, len(wm.series) // 60)]

    out["n_statements"] = phase(
        "count_post_compact", lambda: store.statements().count()
    )
    out["marker"] = store.is_compacted()
    plan = store.statements()._jdf.queryExecution().optimizedPlan().toString()
    out["fast_path"] = "Aggregate" not in plan
    out["store_gb_after"] = du_gb(store._path)
    out["total_s"] = round(time.time() - t0, 2)
    print(json.dumps(out), flush=True)
    assert out["marker"] and out["fast_path"]
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
