"""Deequ-style data-quality checks (operators/validation.py)."""

import pytest

from ftm_columnstore_spark.operators.validation import check_report


def test_check_report(spark):
    df = spark.createDataFrame(
        [
            (1, "en", 10.0),
            (2, "de", 20.0),
            (2, None, 999.0),   # dup id, null lang, out-of-range value
        ],
        ["id", "lang", "v"],
    )
    out = {
        r["check"]: r
        for r in check_report(
            df,
            not_null=["lang"],
            unique=["id"],
            accepted_values={"lang": ["en", "de"]},
            ranges={"v": (0, 100)},
            min_rows=2,
        ).collect()
    }
    assert out["min_rows"]["passed"] and out["min_rows"]["observed"] == 3.0
    assert not out["not_null:lang"]["passed"]
    assert out["not_null:lang"]["observed"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["accepted:lang"]["passed"]  # nulls aren't violations
    assert not out["range:v"]["passed"]
    assert not out["unique:id"]["passed"]
    assert out["unique:id"]["observed"] == 2.0  # distinct ids
    assert out["unique:id"]["threshold"] == 3.0

    with pytest.raises(ValueError):
        check_report(df)


def test_check_report_all_pass(spark):
    df = spark.createDataFrame([(1, "en"), (2, "de")], ["id", "lang"])
    rep = check_report(df, not_null=["lang"], unique=["id"], min_rows=1)
    assert all(r["passed"] for r in rep.collect())


def test_check_report_single_scan(spark):
    """The report is ONE aggregation pass by construction: the source
    appears exactly once in the optimized plan even with several check
    families (including uniqueness) declared."""
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("lang", F.lit("en"))
    rep = check_report(
        df,
        not_null=["lang"],
        unique=["id"],
        accepted_values={"lang": ["en"]},
        ranges={"id": (0, 1000)},
        min_rows=1,
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1, plan
