"""As-of join: golden cases + equivalence with the naive range-join form."""

import pytest
from pyspark.sql import functions as F

from ftm_columnstore_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    quotes = spark.createDataFrame(
        [
            ("A", 1, 10.0),
            ("A", 5, 11.0),
            ("A", 9, 12.0),
            ("B", 4, 20.0),
        ],
        ["sym", "qts", "price"],
    )
    trades = spark.createDataFrame(
        [
            ("A", 0, 100),   # before any quote → unmatched
            ("A", 1, 101),   # tie with quote@1 → matches it
            ("A", 6, 102),   # → quote@5
            ("A", 9, 103),   # tie with quote@9
            ("B", 3, 104),   # before B's only quote → unmatched
            ("B", 7, 105),   # → quote@4
        ],
        ["sym", "tts", "trade_id"],
    )
    return quotes, trades


def test_asof_inner_semantics(frames):
    quotes, trades = frames
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_cols=["qts", "price"],
    )
    got = {r.trade_id: (r.qts_right, r.price_right) for r in out.collect()}
    assert got == {
        101: (1, 10.0),   # tie matches
        102: (5, 11.0),
        103: (9, 12.0),
        105: (4, 20.0),
    }  # 100 and 104 dropped (no prior quote)


def test_asof_keep_unmatched(frames):
    quotes, trades = frames
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_cols=["price"], keep_unmatched=True,
    )
    got = {r.trade_id: r.price_right for r in out.collect()}
    assert got[100] is None and got[104] is None
    assert len(got) == 6


def test_asof_matches_naive_range_join(spark):
    """Window form ≡ naive max-per-left range join on random-ish data."""
    import random

    rng = random.Random(11)
    right = spark.createDataFrame(
        [(rng.randrange(4), i, rng.randrange(1000)) for i in range(0, 400, 2)],
        ["k", "rts", "payload"],
    )
    left = spark.createDataFrame(
        [(rng.randrange(4), rng.randrange(400), i) for i in range(150)],
        ["k", "lts", "lid"],
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", right_cols=["rts"]
    )
    got = {r.lid: r.rts_right for r in out.collect()}

    naive = (
        left.join(right, on="k")
        .filter(F.col("rts") <= F.col("lts"))
        .groupBy("lid")
        .agg(F.max("rts").alias("best"))
    )
    want = {r.lid: r.best for r in naive.collect()}
    assert got == want
