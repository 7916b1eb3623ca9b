"""Streaming statement ingest (SURVEY §2.11 extension target).

The reference's nearest analogues are batch upsert + incremental MVs
(engine.py:152, 201-234). Here a stream of FtM entity JSON-lines becomes a
continuously-appended statement store:

  readStream(json) → entities_to_statements → withWatermark(last_seen)
  → dropDuplicatesWithinWatermark(id)  [exactly-once-ish within horizon]
  → writeStream(parquet, partitionBy=dataset, checkpointed)

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
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ftm_columnstore_spark.model.schemas import ENTITY_SCHEMA
from ftm_columnstore_spark.sources.statements import entities_to_statements


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
        statements.writeStream.format("parquet")
        .option("path", f"{store_path}/statements")
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("dataset")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
