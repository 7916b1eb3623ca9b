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


def windowed_cms_counts(
    events: DataFrame,
    col: str = "user_id",
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    d: int = 4,
    w: int = 1024,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-window Count-Min cell counts — streaming frequency tracking
    with BOUNDED state (≤ d·w rows per window, vs the key space for an
    exact per-key count): the "which keys are hot this hour" problem
    over an unbounded stream, CMS counterpart of
    :func:`windowed_hll_registers` (distinct) built on the same a23
    sketch machinery (operators/sketches.py:cms_build cell layout, so
    batch and windowed sketches with the same (d, w) merge cell-for-
    cell via cms_merge after a window_start tag).

    ONE streaming aggregation (cell counts are additive — update mode
    emits monotone partials, the watermark evicts closed windows).
    Chaining the heavy-hitter read-off onto the same query would be a
    second aggregation, which Structured Streaming forbids — emit the
    CELL relation, persist it per window/shard, and read estimates off
    with :func:`cms_heavy_hitters_from_windowed` (batch or
    foreachBatch). On a batch frame the identical plan runs as a
    normal agg.

    Output: (window_start string, j, cell, cnt)."""
    from ftm_columnstore_spark.operators.sketches import _cms_cell

    if d < 1 or w < 1:
        raise ValueError(f"d and w must be >= 1, got d={d}, w={w}")
    df = _with_watermark(events, ts_col, watermark)
    c = F.col(col)
    win = df.where(c.isNotNull()).select(
        F.window(F.col(ts_col), window_duration).alias("__win"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_cell(c, j, w).alias("cell"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("e"),
    )
    return (
        win.groupBy(
            F.date_format(F.col("__win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.col("e.j").alias("j"),
            F.col("e.cell").alias("cell"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters_from_windowed(
    cms: DataFrame,
    keys: DataFrame,
    col: str,
    threshold: int,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Batch read-off for :func:`windowed_cms_counts` output: probe
    candidate ``keys`` (window_start, col) against their window's
    cells; est = min over the d probed rows (never under the true
    count — Cormode-Muthukrishnan); keep keys with est ≥ threshold (a
    superset of the true per-window heavy hitters, no false
    negatives). Cell relations from several runs/shards merge first
    (per-cell sum — counts are linear, exactly what the groupBy here
    does on a unioned input).

    The probe join is keyed on (window_start, j, cell) — the sketch
    side is ≤ d·w rows PER WINDOW but grows with the window count (a
    year of hourly windows × 4×1024 cells is ~36M rows), so the join
    is NOT force-broadcast: AQE promotes it to a broadcast when the
    retained window range is small and keeps a shuffled hash join when
    it isn't (the apply_bpe forced-broadcast lesson).

    Output: (window_start, col, est_count) filtered to est ≥
    threshold."""
    from ftm_columnstore_spark.operators.sketches import _cms_cell

    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    merged = cms.groupBy("window_start", "j", "cell").agg(
        F.sum("cnt").alias("cnt")
    )
    c = F.col(col)
    probes = keys.where(c.isNotNull()).select(
        "window_start",
        c,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_cell(c, j, w).alias("cell"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("e"),
    ).select(
        "window_start", col, F.col("e.j").alias("j"),
        F.col("e.cell").alias("cell"),
    )
    return (
        probes.join(
            merged, on=["window_start", "j", "cell"], how="left"
        )
        .groupBy("window_start", col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
        .filter(F.col("est_count") >= threshold)
    )


def windowed_moments(
    events: DataFrame,
    col: str = "value",
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    quant: float = 100.0,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-window moments sketch — streaming mean/variance/skewness
    tracking with FOUR numbers of state per window (the a28 power-sum
    spine windowed, next to st5's HLL and st6's CMS): values quantize
    to exact integer longs q = floor(x·quant + 0.5) (the
    correlation_matrix rule — doubles can't ride an exact additive
    sketch, integers can), then (m0, Σq, Σq², Σq³) accumulate as
    DECIMAL(38,0) in ONE streaming-legal additive aggregation.

    Read the statistics off the materialized state with
    operators/sketches.py:moments_stats (it treats window_start as a
    group key); window sketches from several runs/shards merge with
    moments_merge(group_by=["window_start"]). Note the read-off
    stats are of the QUANTIZED values — mean/sd scale by quant,
    skewness is scale-invariant.

    Output: (window_start string, m0, m1, m2, m3)."""
    if quant <= 0:
        raise ValueError(f"quant must be > 0, got {quant}")
    from ftm_columnstore_spark.operators.sketches import _MOM_DEC

    df = _with_watermark(events, ts_col, watermark)
    c = F.col(col)
    q = F.floor(c.cast("double") * F.lit(float(quant)) + F.lit(0.5))
    base = df.where(c.isNotNull()).select(
        F.window(F.col(ts_col), window_duration).alias("__win"),
        q.alias("__q"),
    )
    x = F.col("__q").cast(_MOM_DEC)
    return base.groupBy(
        F.date_format(F.col("__win.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        )
    ).agg(
        F.count(F.lit(1)).alias("m0"),
        F.sum(x).cast(_MOM_DEC).alias("m1"),
        F.sum(x * F.col("__q")).cast(_MOM_DEC).alias("m2"),
        F.sum(x * F.col("__q") * F.col("__q")).cast(_MOM_DEC).alias("m3"),
    )
