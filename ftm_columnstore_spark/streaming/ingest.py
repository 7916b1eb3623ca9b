"""Streaming statement ingest (SURVEY §2.11 extension target).

The reference's nearest analogues are batch upsert + incremental MVs
(engine.py:152, 201-234). Here a stream of FtM entity JSON-lines becomes a
continuously-appended statement store:

  readStream(json) → entities_to_statements → withWatermark(last_seen)
  → dropDuplicatesWithinWatermark(id)  [exactly-once-ish within horizon]
  → foreachBatch(Store.write_statements)  [checkpointed]

``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``): with
the event-time column absent from the dedup key, plain dropDuplicates
NEVER evicts its state even under a watermark (documented Spark
caveat) — state would grow with the full stream history. The
WithinWatermark variant dedups on the id alone while evicting each
key's state once the watermark passes it, so state is bounded by the
horizon. Late duplicates beyond the watermark are caught by the
store's dedup-on-read window, so correctness never depends on
streaming state size — the watermark only bounds how much work
dedup-on-read has left.

The sink is ``foreachBatch`` → ``Store.write_statements`` rather than a
direct parquet writeStream, for two load-bearing reasons (round 7):

- a direct sink drops a ``_spark_metadata`` transaction log inside
  ``statements/``, and Spark BATCH reads of a directory with that log
  list ONLY the files the log names — streaming into an existing
  batch-written store silently hid every pre-existing statement from
  every subsequent read (reproduced in the round-7 verify drive);
- ``write_statements`` clears the compaction marker per micro-batch,
  so a previously ``optimize()``-d store can't keep the no-dedup fast
  path while the stream appends new versions (ADVICE r6 high), and
  each batch gets the store's canonical layout (dataset partitioning +
  canonical_id clustering) instead of raw micro-batch files.

Exactly-once: the checkpoint makes batch REPLAY possible after a crash
mid-append. The sink keeps its own tiny ledger (the last FULLY written
batch_id, recorded after ``write_statements`` returns, stored next to
Spark's own checkpoint state) and SKIPS a replayed batch it already
committed — so the common replay (crash after the append, before
Spark's commit marker) writes nothing twice. The one remaining window
(crash between the append and the ledger record) re-appends that batch
once; replayed rows carry identical statement ids, so dedup-on-read
collapses them — the same safety net that catches beyond-watermark
duplicates. Until the next ``optimize()``, ``deduped=False`` counts and
on-disk size can include rows from such a replay. The ledger assumes a
locally-reachable checkpoint path (same posture as the Store's marker
files).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ftm_columnstore_spark.model.schemas import ENTITY_SCHEMA
from ftm_columnstore_spark.sources.statements import entities_to_statements
from ftm_columnstore_spark.store import Store


def _ledger_path(checkpoint_path: str) -> str:
    return os.path.join(checkpoint_path, "__committed_batch")


def _already_committed(checkpoint_path: str, batch_id: int) -> bool:
    """True iff this batch_id was fully written by a previous run of
    this checkpoint (foreachBatch batch ids are monotonic per
    checkpoint, so one high-water mark suffices)."""
    try:
        with open(_ledger_path(checkpoint_path)) as fh:
            return batch_id <= int(fh.read().strip())
    except (OSError, ValueError):
        return False


def _record_committed(checkpoint_path: str, batch_id: int) -> None:
    os.makedirs(checkpoint_path, exist_ok=True)
    tmp = _ledger_path(checkpoint_path) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, _ledger_path(checkpoint_path))


def make_statement_sink(
    store: Store, checkpoint_path: str
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch sink: append the micro-batch via
    ``Store.write_statements`` unless the ledger says this batch_id was
    already fully written (checkpoint replay after a crash)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if _already_committed(checkpoint_path, batch_id):
            return
        # cluster=False: a per-micro-batch repartition+sort costs ~3.5x
        # drain throughput (measured at sf1) for layout the next
        # optimize() rebuilds anyway
        store.write_statements(batch_df, cluster=False)
        _record_committed(checkpoint_path, batch_id)

    return _sink


def stream_statements_to_store(
    spark: SparkSession,
    source_path: str,
    store_path: str,
    checkpoint_path: str,
    dataset: str = "default",
    watermark: str = "1 hour",
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the ingest stream; returns the StreamingQuery handle.

    ``available_now=True`` drains what's currently in ``source_path`` and
    stops (micro-batch backfill mode — used by tests and batch catch-up).
    ``max_files_per_trigger`` bounds each micro-batch (backpressure for
    backfills: without it, availableNow plans one giant batch and the
    dedup state for the WHOLE corpus is live at once).
    """
    if max_files_per_trigger is not None and max_files_per_trigger < 1:
        raise ValueError(
            f"max_files_per_trigger must be >= 1, got {max_files_per_trigger}"
        )
    store = Store(spark, store_path)
    store.ensure()
    reader = spark.readStream.schema(ENTITY_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    entities = reader.json(source_path)
    statements = (
        entities_to_statements(entities, default_dataset=dataset)
        .withWatermark("last_seen", watermark)
        .dropDuplicatesWithinWatermark(["id"])
    )

    writer = (
        statements.writeStream.foreachBatch(
            make_statement_sink(store, checkpoint_path)
        )
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
