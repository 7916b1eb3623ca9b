"""Streaming IVF-PQ index maintenance (north-star extension): each
micro-batch of vectors is routed and PQ-encoded with the index's
PERSISTED quantizer artifacts and appended to the partitioned bucket
layout — online ingest for the ANN serve path, no rebuilds.

The quantizers (coarse centroids + PQ codebooks) are read from the
index sidecars ONCE at stream start and treated as fixed for the
stream's lifetime — the standard production contract: quantizers are
versioned artifacts; retraining them is a periodic batch job that
writes a NEW index generation, never an in-place mutation (the same
static-index stance as ``streaming/dedup.py``). Per micro-batch the
work is one map-only route+encode pass and an append of only the
touched ``__bucket`` partitions; serves (``ivfpq_topk_indexed``) see
new rows at the next scan with probe cost still
``n_probe/n_centroids`` of the corpus.

``foreachBatch`` rather than a streaming parquet sink because the
layout is partitioned by a derived column and must share the exact
append path with the batch operator (`append_routed_ivfpq`) — one
ingest semantics, not two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ftm_columnstore_spark.operators.similarity import (
    _read_ivfpq_artifacts,
    append_routed_ivfpq,
)


def stream_index_ivfpq(
    spark: SparkSession,
    source_path: str,
    index_path: str,
    checkpoint_path: str,
    schema,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the index-ingest stream over JSON vector batches at
    ``source_path``; returns the StreamingQuery handle. The index at
    ``index_path`` must already exist (``build_ivfpq_index``).
    ``available_now=True`` drains current source contents and stops
    (backfill/test mode)."""
    centroids, codebooks = _read_ivfpq_artifacts(spark, index_path)

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_routed_ivfpq(
            batch_df, index_path, centroids, codebooks, vec_col, id_col, scale
        )

    vecs = spark.readStream.schema(schema).json(source_path)
    writer = vecs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
