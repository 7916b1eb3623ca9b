"""Data-quality constraint validation (Deequ-style, Schelter et al.
VLDB'18): declarative column checks computed as ONE aggregation pass
over the table, returned as an audit report relation rather than an
exception — the "is this 100 TB batch sane before it ships" gate.

Every check — including uniqueness — compiles into a single
``agg(...)`` producing ONE row, which is then pivoted into report rows
by exploding an array of structs over that row. One scan is guaranteed
by construction (there is exactly one aggregate subplan; nothing relies
on exchange reuse deduplicating identical branches). Uniqueness uses
``count_distinct`` inside the same agg: Spark plans multiple distinct
aggregates via Expand + a two-stage keyed aggregation, so hot values
still spread across reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_report(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    accepted_values: dict[str, list] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    min_rows: int | None = None,
) -> DataFrame:
    """Run the declared checks; returns (check, observed, threshold,
    passed) — one row per check, ``observed``/``threshold`` as doubles
    (rates for null/accepted checks, counts for rows/uniqueness).

    - ``not_null``: columns whose null rate must be 0
    - ``unique``: columns whose values must be distinct (judged among
      non-null values; ``count_distinct`` and the non-null total both
      ignore nulls)
    - ``accepted_values``: column -> allowed values (violation rate 0)
    - ``ranges``: column -> (lo, hi) inclusive bounds on non-null values
    - ``min_rows``: minimum table cardinality
    """
    # violation flags projected before the one-pass agg (agg-input
    # expressions run interpreted inside the aggregate — see
    # operators/dedup.py minhash_signature)
    flags: list[Column] = []
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in not_null or []:
        flags.append(F.col(c).isNull().cast("long").alias(f"__fnull_{c}"))
        aggs.append(F.sum(f"__fnull_{c}").alias(f"__null_{c}"))
    for c, vals in (accepted_values or {}).items():
        flags.append(
            (F.col(c).isNotNull() & ~F.col(c).isin(*vals))
            .cast("long")
            .alias(f"__fbad_{c}")
        )
        aggs.append(F.sum(f"__fbad_{c}").alias(f"__bad_{c}"))
    for c, (lo, hi) in (ranges or {}).items():
        flags.append(
            (F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi)))
            .cast("long")
            .alias(f"__foob_{c}")
        )
        aggs.append(F.sum(f"__foob_{c}").alias(f"__oob_{c}"))
    for c in unique or []:
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(F.count(F.col(c)).alias(f"__pres_{c}"))
    base = df.select("*", *flags).agg(*aggs) if flags else df.agg(*aggs)

    rows: list[Column] = []

    def rep(name: str, observed: Column, threshold: Column, passed: Column):
        rows.append(
            F.struct(
                F.lit(name).alias("check"),
                observed.cast("double").alias("observed"),
                threshold.cast("double").alias("threshold"),
                passed.alias("passed"),
            )
        )

    n = F.col("__n").cast("double")
    if min_rows is not None:
        rep("min_rows", n, F.lit(float(min_rows)), n >= min_rows)
    for c in not_null or []:
        rate = F.col(f"__null_{c}") / F.greatest(n, F.lit(1.0))
        rep(
            f"not_null:{c}",
            F.round(rate, 6),
            F.lit(0.0),
            F.col(f"__null_{c}") == 0,
        )
    for c in accepted_values or {}:
        rate = F.col(f"__bad_{c}") / F.greatest(n, F.lit(1.0))
        rep(
            f"accepted:{c}",
            F.round(rate, 6),
            F.lit(0.0),
            F.col(f"__bad_{c}") == 0,
        )
    for c in ranges or {}:
        rate = F.col(f"__oob_{c}") / F.greatest(n, F.lit(1.0))
        rep(
            f"range:{c}",
            F.round(rate, 6),
            F.lit(0.0),
            F.col(f"__oob_{c}") == 0,
        )
    for c in unique or []:
        rep(
            f"unique:{c}",
            F.col(f"__dist_{c}"),
            F.col(f"__pres_{c}"),
            F.col(f"__dist_{c}") == F.col(f"__pres_{c}"),
        )
    if not rows:
        raise ValueError("no checks declared")
    # pivot the single base row into |checks| report rows — exploding an
    # array literal over one row, so the aggregate subplan exists once
    return base.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
