"""Skew mitigation utilities (SURVEY §4; brief: "skewed keys hurt").

AQE's skew-join splitting handles most cases at runtime; these helpers
cover the two patterns AQE can't fix:

- **salted_aggregate**: a groupBy where one key holds a huge share of rows
  (mega-entities in the statement table, boilerplate shingles). Two-phase:
  partial agg on (key, salt) → final agg on key. Correct for any
  algebraic aggregate expressed as (partial, merge) pair.

  NOTE (measured, NOTES.md "Skew"): plain algebraic aggregates
  (count/sum/min/max) already collapse hot keys map-side via Spark's
  partial aggregation — salting those is pure overhead. Reach for this
  only when the aggregate is NOT map-side combinable (percentiles over
  raw rows, large collect_list states); for count-distinct, prefer
  restructuring to ``select(k, v).distinct().groupBy(k).count()`` —
  the distinct shuffles on (k, v), which is spread.
- **salted_join**: a shuffle join where the LEFT side has hot keys —
  replicate the RIGHT side per salt, spray the left. Use only when the
  right side is too big to broadcast but small enough to replicate
  ``salts`` times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salts: int, col_name: str = "__salt") -> DataFrame:
    """Uniform random-ish deterministic salt derived from a full-row hash."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*df.columns), F.lit(salts)).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salts: int = 16,
) -> DataFrame:
    """groupBy(keys) resistant to hot keys.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` merge the salted
    partials (they reference the partial alias names). Example::

        salted_aggregate(
            stmts, ["canonical_id"],
            [F.count(F.lit(1)).alias("c")],
            [F.sum("c").alias("n_statements")])
    """
    salted = with_salt(df, salts)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot left-side keys: left rows get a random salt,
    right rows are replicated once per salt value, join key becomes
    (on, salt). Output columns match a plain ``left.join(right, on, how)``."""
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts)).cast(
            "int"
        ),
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return l.join(r, on=[on, "__salt"], how=how).drop("__salt")
