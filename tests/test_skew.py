"""Salting utilities: results must match the unsalted equivalents."""

from pyspark.sql import functions as F

from ftm_columnstore_spark.functions.skew import (
    salted_aggregate,
    salted_join,
    with_salt,
)


def skewed(spark):
    # one hot key with 10k rows, 50 cold keys
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_with_salt_bounded(spark):
    df = with_salt(skewed(spark), salts=8)
    vals = {r["__salt"] for r in df.select("__salt").distinct().collect()}
    assert vals <= set(range(8)) and len(vals) > 1


def test_salted_aggregate_matches_plain(spark):
    df = skewed(spark)
    plain = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in salted_aggregate(
            df,
            ["k"],
            [F.count(F.lit(1)).alias("pc"), F.sum("v").alias("ps")],
            [F.sum("pc").alias("n"), F.sum("ps").alias("s")],
            salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = skewed(spark)
    right = spark.createDataFrame(
        [("hot", "H"), ("c1", "C1"), ("c2", "C2")], ["k", "label"]
    )
    plain = left.join(right, on="k").groupBy("k", "label").count()
    salted = salted_join(left, right, on="k", salts=4).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def hot_statement_corpus(spark):
    """One mega-entity with 1e5 statements next to 200 normal entities —
    the skew shape AQE's join splitting can't fix for aggregations."""
    hot = spark.range(100_000).select(
        F.lit("mega").alias("canonical_id"),
        F.lit("mega").alias("entity_id"),
        F.lit("everyPage").alias("prop"),
        F.lit("string").alias("prop_type"),
        F.lit("Document").alias("schema"),
        F.concat(F.lit("v"), F.col("id")).alias("value"),
        F.lit("ds").alias("dataset"),
    )
    cold = spark.range(200).select(
        F.concat(F.lit("e"), F.col("id")).alias("canonical_id"),
        F.concat(F.lit("e"), F.col("id")).alias("entity_id"),
        F.lit("name").alias("prop"),
        F.lit("name").alias("prop_type"),
        F.lit("Company").alias("schema"),
        F.concat(F.lit("Name "), F.col("id")).alias("value"),
        F.lit("ds").alias("dataset"),
    )
    return hot.unionByName(cold)


def test_salted_aggregate_hot_entity(spark):
    """10^5-statement mega-entity: salted per-entity counts must match
    the plain aggregation exactly, and the salted plan must show the
    two-phase shape (first exchange keyed on (entity, salt) so the hot
    key spreads over `salts` reducers)."""
    stmts = hot_statement_corpus(spark)
    plain = {
        r["canonical_id"]: r["n"]
        for r in stmts.groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted_df = salted_aggregate(
        stmts,
        ["canonical_id"],
        [F.count(F.lit(1)).alias("pc")],
        [F.sum("pc").alias("n")],
        salts=16,
    )
    salted = {r["canonical_id"]: r["n"] for r in salted_df.collect()}
    assert salted == plain
    assert salted["mega"] == 100_000
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    # phase 1 keys on (canonical_id, __salt): the hot key fans out
    assert "__salt" in plan
    # both phases partial-aggregate before their exchange
    assert plan.count("partial_count") + plan.count("partial_sum") >= 2


def test_salted_join_hot_entity(spark):
    """Join of the hot statement table against a per-entity dimension:
    salted result must match the plain join row-for-row."""
    stmts = hot_statement_corpus(spark)
    dim = spark.createDataFrame(
        [("mega", "MEGA"), ("e1", "E1"), ("e7", "E7")],
        ["canonical_id", "label"],
    )
    plain = (
        stmts.join(dim, on="canonical_id")
        .groupBy("canonical_id", "label")
        .count()
    )
    salted = (
        salted_join(stmts, dim, on="canonical_id", salts=8)
        .groupBy("canonical_id", "label")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_dedup_window_hot_entity(spark, tmp_path):
    """Store dedup-on-read over the mega-entity corpus: the max-struct
    hash aggregate collapses duplicates map-side (no Window, no
    single-partition sort), and upserted duplicates still collapse to
    one row per (entity, prop, value)."""
    from ftm_columnstore_spark.store import dedup_statements
    from ftm_columnstore_spark.sources.statements import statement_key

    stmts = hot_statement_corpus(spark).select(
        statement_key("dataset", "entity_id", "prop", "value").alias("id"),
        "entity_id", "canonical_id", "prop", "prop_type", "schema", "value",
        F.lit(None).cast("string").alias("original_value"),
        "dataset",
        F.lit(None).cast("string").alias("lang"),
        F.lit(False).alias("target"),
        F.lit(False).alias("external"),
        F.to_timestamp(F.lit("2024-01-01")).alias("first_seen"),
        F.to_timestamp(F.lit("2024-01-01")).alias("last_seen"),
    )
    doubled = stmts.unionByName(
        stmts.withColumn("last_seen", F.to_timestamp(F.lit("2024-06-01")))
    )
    deduped = dedup_statements(doubled)
    assert deduped.count() == 100_200
    plan = deduped._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan
    assert "Window" not in plan
    # newest version wins
    got = deduped.filter("canonical_id = 'e1'").collect()[0]
    assert str(got["last_seen"]).startswith("2024-06-01")


def test_skew_hybrid_join_matches_plain_join(spark):
    from ftm_columnstore_spark.functions.skew import skew_hybrid_join

    # "hot" carries 500 of 600 left rows
    left = spark.createDataFrame(
        [(("hot" if i < 500 else f"k{i % 17}"), i) for i in range(600)],
        ["k", "lv"],
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k2", 3), ("nowhere", 4)], ["k", "rv"]
    )
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in skew_hybrid_join(left, right, "k", threshold=100).collect()
    )
    plain = sorted(
        (r["k"], r["lv"], r["rv"]) for r in left.join(right, "k").collect()
    )
    assert got == plain and len(got) > 500


def test_skew_hybrid_join_semi_and_no_hot(spark):
    from ftm_columnstore_spark.functions.skew import skew_hybrid_join

    left = spark.createDataFrame([(f"k{i}", i) for i in range(50)], ["k", "lv"])
    right = spark.createDataFrame([("k1", 1), ("k2", 2)], ["k", "rv"])
    # nothing hot at this threshold: falls back to the plain join
    got = sorted(
        r["k"]
        for r in skew_hybrid_join(
            left, right, "k", threshold=1000, how="left_semi"
        ).collect()
    )
    assert got == ["k1", "k2"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported how"):
        skew_hybrid_join(left, right, "k", how="right")


def test_skew_hybrid_join_hot_branch_broadcasts(spark):
    from ftm_columnstore_spark.functions.skew import skew_hybrid_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(400)] + [(f"k{i}", i) for i in range(40)],
        ["k", "lv"],
    )
    right = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(40)], ["k", "rv"]
    )
    plan = (
        skew_hybrid_join(left, right, "k", threshold=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_skew_hybrid_join_left_and_anti(spark):
    from ftm_columnstore_spark.functions.skew import skew_hybrid_join

    left = spark.createDataFrame(
        [(("hot" if i < 300 else f"k{i % 9}"), i) for i in range(360)],
        ["k", "lv"],
    )
    right = spark.createDataFrame([("hot", 1), ("k1", 2)], ["k", "rv"])
    for how in ("left", "left_anti"):
        got = sorted(
            tuple(r) for r in skew_hybrid_join(
                left, right, "k", threshold=100, how=how
            ).collect()
        )
        plain = sorted(
            tuple(r) for r in left.join(right, "k", how).collect()
        )
        assert got == plain, how


def test_skew_hybrid_join_null_keys_survive(spark):
    """NULL join keys must behave exactly like the plain join: dropped
    by inner/semi, KEPT by left/left_anti (a bare ~isin(hot) predicate
    evaluates to NULL for them and silently drops them from both
    branches — the regression this test pins)."""
    from ftm_columnstore_spark.functions.skew import skew_hybrid_join

    rows = [(("hot" if i < 300 else f"k{i % 9}"), i) for i in range(360)]
    rows += [(None, 9001), (None, 9002)]
    left = spark.createDataFrame(rows, "k string, lv int")
    right = spark.createDataFrame([("hot", 1), ("k1", 2)], ["k", "rv"])
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = sorted(
            (
                tuple(r)
                for r in skew_hybrid_join(
                    left, right, "k", threshold=100, how=how
                ).collect()
            ),
            key=key,
        )
        plain = sorted(
            (tuple(r) for r in left.join(right, "k", how).collect()),
            key=key,
        )
        assert got == plain, how
        if how in ("left", "left_anti"):
            assert (None, 9001) in {(g[0], g[1]) for g in got}, how


def test_skew_hybrid_join_sampled_detection_row_identical(spark):
    """detect_fraction changes ROUTING only: for every `how`, the
    sampled-detection output equals the plain join exactly."""
    from ftm_columnstore_spark.functions.skew import skew_hybrid_join

    rows = [("hot", i) for i in range(400)] + [
        (f"k{i}", i) for i in range(200)
    ]
    left = spark.createDataFrame(rows, "k string, lv int")
    right = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k7", 3)], ["k", "rv"]
    )
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = sorted(
            tuple(r)
            for r in skew_hybrid_join(
                left, right, "k", threshold=50, how=how,
                detect_fraction=0.2,
            ).collect()
        )
        plain = sorted(
            tuple(r) for r in left.join(right, "k", how).collect()
        )
        assert got == plain, how


def test_skew_hybrid_join_detect_fraction_validation(spark):
    import pytest

    from ftm_columnstore_spark.functions.skew import skew_hybrid_join

    left = spark.createDataFrame([("a", 1)], ["k", "v"])
    right = spark.createDataFrame([("a", 1)], ["k", "w"])
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            skew_hybrid_join(left, right, "k", detect_fraction=bad)
    # 1.0 is the full-scan path — allowed
    assert (
        skew_hybrid_join(
            left, right, "k", threshold=1, detect_fraction=1.0
        ).count()
        == 1
    )
