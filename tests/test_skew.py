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
