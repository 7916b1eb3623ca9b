"""Data-quality constraint validation (Deequ-style, Schelter et al.
VLDB'18): declarative column checks computed as ONE aggregation pass
over the table, returned as an audit report relation rather than an
exception — the "is this 100 TB batch sane before it ships" gate.

Every check compiles to a conditional aggregate inside a single
``agg(...)`` — one scan, one partial+final reduction, zero joins; the
report is |checks| rows. Uniqueness is the one check needing a second
shuffle (count distinct over the column), expressed as
``distinct().count()``-style two-stage agg to stay skew-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    - ``unique``: columns whose values must be distinct
    - ``accepted_values``: column -> allowed values (violation rate 0)
    - ``ranges``: column -> (lo, hi) inclusive bounds on non-null values
    - ``min_rows``: minimum table cardinality
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in not_null or []:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}")
        )
    for c, vals in (accepted_values or {}).items():
        aggs.append(
            F.sum(
                (
                    F.col(c).isNotNull() & ~F.col(c).isin(*vals)
                ).cast("long")
            ).alias(f"__bad_{c}")
        )
    for c, (lo, hi) in (ranges or {}).items():
        aggs.append(
            F.sum(
                (
                    F.col(c).isNotNull()
                    & ((F.col(c) < lo) | (F.col(c) > hi))
                ).cast("long")
            ).alias(f"__oob_{c}")
        )
    base = df.agg(*aggs)

    reports = []
    n = F.col("__n").cast("double")
    if min_rows is not None:
        reports.append(
            base.select(
                F.lit("min_rows").alias("check"),
                n.alias("observed"),
                F.lit(float(min_rows)).alias("threshold"),
                (n >= min_rows).alias("passed"),
            )
        )
    for c in not_null or []:
        rate = F.col(f"__null_{c}") / F.greatest(n, F.lit(1.0))
        reports.append(
            base.select(
                F.lit(f"not_null:{c}").alias("check"),
                F.round(rate, 6).alias("observed"),
                F.lit(0.0).alias("threshold"),
                (F.col(f"__null_{c}") == 0).alias("passed"),
            )
        )
    for c in accepted_values or {}:
        rate = F.col(f"__bad_{c}") / F.greatest(n, F.lit(1.0))
        reports.append(
            base.select(
                F.lit(f"accepted:{c}").alias("check"),
                F.round(rate, 6).alias("observed"),
                F.lit(0.0).alias("threshold"),
                (F.col(f"__bad_{c}") == 0).alias("passed"),
            )
        )
    for c in ranges or {}:
        rate = F.col(f"__oob_{c}") / F.greatest(n, F.lit(1.0))
        reports.append(
            base.select(
                F.lit(f"range:{c}").alias("check"),
                F.round(rate, 6).alias("observed"),
                F.lit(0.0).alias("threshold"),
                (F.col(f"__oob_{c}") == 0).alias("passed"),
            )
        )
    for c in unique or []:
        # lazy, one aggregation per column: distinct vs non-null counts
        # (count_distinct ignores nulls; so does the non-null total —
        # uniqueness is judged among present values). Spark plans the
        # distinct as a two-stage agg, so hot values spread.
        u = df.agg(
            F.count_distinct(F.col(c)).cast("double").alias("observed"),
            F.count(F.col(c)).cast("double").alias("threshold"),
        )
        reports.append(
            u.select(
                F.lit(f"unique:{c}").alias("check"),
                "observed",
                "threshold",
                (F.col("observed") == F.col("threshold")).alias("passed"),
            )
        )
    if not reports:
        raise ValueError("no checks declared")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out
