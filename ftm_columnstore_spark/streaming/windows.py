"""Windowed event-time aggregations (SURVEY §2.11 extension; exercised
against the ``events`` test table).

Each helper works on BOTH batch and streaming DataFrames — the point of
Structured Streaming's unified model. On a stream, pass a watermark so
state is bounded; on a batch frame the same plan runs as a normal agg.

The incremental-MV pattern (reference engine.py:201-234) is
``tumbling_window_agg`` over the statement stream keyed by
(dataset, schema) — state store replaces AggregatingMergeTree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df


def tumbling_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str | None = "1 hour",
) -> DataFrame:
    df = _with_watermark(events, ts_col, watermark)
    return df.groupBy(
        F.window(ts_col, window_duration).alias("win"), *key_cols
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), 4).alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *key_cols,
        "n",
        "sum_value",
    )


def sliding_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str = "15 minutes",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str | None = "1 hour",
) -> DataFrame:
    df = _with_watermark(events, ts_col, watermark)
    return df.groupBy(
        F.window(ts_col, window_duration, slide_duration).alias("win"),
        *key_cols,
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(value_col), 4).alias("avg_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        *key_cols,
        "n",
        "avg_value",
    )


def streaming_dataset_stats(statements: DataFrame) -> DataFrame:
    """A11/M1: the reference's AggregatingMergeTree stats MV
    (engine.py:201-217) as a continuously-maintained streaming aggregation
    — per (dataset, schema) distinct-entity + statement counts held in the
    state store. Works on batch frames too (same plan, no state)."""
    return statements.groupBy("dataset", "schema").agg(
        F.approx_count_distinct("canonical_id").alias("entities"),
        F.count(F.lit(1)).alias("statements"),
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    band: str = "10 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair left/right events with
    equal ``key`` whose timestamps lie within ``band`` of each other
    (``r.ts ∈ [l.ts − band, l.ts + band]``).

    On streams, BOTH sides carry watermarks and the time-range predicate
    is what lets Spark bound the join state — buffered rows older than
    watermark+band are evicted, so state never grows with stream length.
    On batch frames the identical plan is the band join
    (operators/temporal.py shows the bucketed batch formulation for the
    quadratic-safe variant). Shuffle key is ``key`` — horizontal
    scale-out; output prefixes columns with ``l_``/``r_``."""
    l = _with_watermark(left, ts_col, watermark)
    r = _with_watermark(right, ts_col, watermark)
    l = l.select([F.col(c).alias(f"l_{c}") for c in l.columns])
    r = r.select([F.col(c).alias(f"r_{c}") for c in r.columns])
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (
            F.col(f"r_{ts_col}")
            >= F.col(f"l_{ts_col}") - F.expr(f"INTERVAL {band}")
        )
        & (
            F.col(f"r_{ts_col}")
            <= F.col(f"l_{ts_col}") + F.expr(f"INTERVAL {band}")
        )
    )
    return l.join(r, cond, "inner")


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Session windows (gap-based), the stateful-operator showcase."""
    df = _with_watermark(events, ts_col, watermark)
    return df.groupBy(
        F.session_window(ts_col, gap).alias("win"), *key_cols
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        *key_cols,
        "n_events",
    )


def windowed_hll_registers(
    events: DataFrame,
    col: str = "user_id",
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    p: int = 8,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-window HyperLogLog register state — streaming distinct
    counting with BOUNDED state (≤ 2^p rows per window), the classic
    "distinct users per hour over an unbounded stream" problem exact
    counting can't survive (its state is the user space).

    ONE streaming aggregation (max per register is monotone, so
    update/complete modes are both sound, and the watermark evicts
    closed windows) — Structured Streaming forbids chaining the
    estimate aggregation onto the same query, so this emits the
    REGISTER relation; read the estimate off the materialized state
    with :func:`hll_estimate_from_windowed_registers` (batch, or
    inside foreachBatch). The split is the point at scale: the
    register relation is the mergeable artifact you persist per
    window/shard/day and re-estimate from without rescanning history
    (operators/sketches.py:hll_merge).

    On a batch frame the identical plan runs as a normal agg.

    Output: (window_start string, reg_idx, reg_rho)."""
    from ftm_columnstore_spark.operators.sketches import hll_registers

    df = _with_watermark(events, ts_col, watermark)
    win = df.withColumn(
        "__win", F.window(F.col(ts_col), window_duration)
    )
    regs = hll_registers(win, col, p=p, group_by=["__win"])
    return regs.select(
        F.date_format(F.col("__win.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "reg_idx",
        "reg_rho",
    )


def hll_estimate_from_windowed_registers(
    regs: DataFrame, p: int = 8
) -> DataFrame:
    """Batch read-off for :func:`windowed_hll_registers` output:
    (window_start, n_distinct_est). Registers from several runs /
    shards merge losslessly first (max per (window, idx) — exactly
    what a groupBy does here if the input is a union)."""
    from ftm_columnstore_spark.operators.sketches import (
        hll_estimate_from_registers,
    )

    merged = regs.groupBy("window_start", "reg_idx").agg(
        F.max("reg_rho").alias("reg_rho")
    )
    return hll_estimate_from_registers(
        merged, p=p, group_by=["window_start"]
    )
