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


def skew_hybrid_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    threshold: int = 100_000,
    d: int = 4,
    w: int = 4096,
    how: str = "inner",
    max_hot_keys: int = 100,
    detect_fraction: float | None = None,
    detect_seed: int = 42,
) -> DataFrame:
    """Skew-aware equi-join: DETECT the hot keys with a Count-Min pass
    (``operators.sketches.cms_heavy_hitters`` — one bounded-state scan,
    est ≥ true count so no hot key is ever missed), then route them
    through a broadcast branch while the long tail takes the normal
    shuffle join:

    - cold keys → plain ``left ⋈ right`` (sort-merge/AQE as usual);
    - hot keys → ``left_hot ⋈ broadcast(right_hot)`` — the right-side
      rows for the (bounded, ≤ corpus/threshold) hot keys are small by
      construction, so no reducer ever sees a hot key's full row set.

    This is the targeted remedy when AQE's skew splitting can't help
    (e.g. the skew is on the BUILD side of a future stage, or the join
    feeds a window keyed the same way). Union of the two branches is
    row-identical to the plain join (asserted in tests) — each left row
    belongs to exactly one branch, so 'left'/'left_anti' compose
    correctly too. NULL join keys route through the COLD branch
    explicitly (``isNull() | ~isin(hot)``): a bare ``~isin`` evaluates
    to NULL for NULL keys and would silently drop such rows from BOTH
    branches, breaking 'left'/'left_anti' parity with the plain join.
    ``how`` supports 'inner', 'left', 'left_semi' and 'left_anti'.

    ``detect_fraction``: run the Count-Min DETECTION over a Bernoulli
    row-sample of the left side (threshold scaled by the fraction) —
    at 100 TB the full-scan sketch build is the dominant cost, and the
    hot-set choice only steers ROUTING, never results: a borderline key
    the sample misses simply takes the cold branch, so the union stays
    row-identical to the plain join for ANY detected subset (the same
    argument that makes max_hot_keys safe). A key holding ≥ threshold
    rows keeps ≥ threshold·f in expectation with Chernoff-tight
    concentration, so genuinely hot keys survive sampling whp."""
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"unsupported how: {how!r}")
    from ftm_columnstore_spark.operators.sketches import cms_heavy_hitters

    if max_hot_keys < 1:
        raise ValueError(f"max_hot_keys must be >= 1, got {max_hot_keys}")
    detect_src, eff_threshold = left, threshold
    if detect_fraction is not None:
        if not 0.0 < detect_fraction <= 1.0:
            raise ValueError(
                f"detect_fraction must be in (0, 1], got {detect_fraction}"
            )
        if detect_fraction < 1.0:
            detect_src = left.where(
                F.rand(detect_seed) < F.lit(detect_fraction)
            )
            eff_threshold = max(1, int(threshold * detect_fraction))
    hot_rows = (
        cms_heavy_hitters(detect_src, on, eff_threshold, d=d, w=w)
        .orderBy(F.col("est_count").desc(), F.col(on))
        .limit(max_hot_keys)
        .collect()
    )
    hot = [r[on] for r in hot_rows]
    if not hot:
        return left.join(right, on=on, how=how)
    # null-safe cold routing: NULL keys never equi-match, but a plain
    # left/left_anti join KEEPS the left row — so they must land in the
    # cold branch, not vanish into the NULL of ~isin
    l_cold = left.filter(F.col(on).isNull() | ~F.col(on).isin(hot))
    l_hot = left.filter(F.col(on).isin(hot))
    r_cold = right.filter(~F.col(on).isin(hot))
    r_hot = right.filter(F.col(on).isin(hot))
    cold = l_cold.join(r_cold, on=on, how=how)
    hot_j = l_hot.join(F.broadcast(r_hot), on=on, how=how)
    return cold.unionByName(hot_j)
