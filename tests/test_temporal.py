"""Temporal joins: golden cases + equivalence with naive range-join forms."""

import pytest
from pyspark.sql import functions as F

from ftm_columnstore_spark.operators.temporal import asof_join, band_join


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


def test_band_join_golden(spark):
    """Inclusive bounds, per-key scoping, bucket-boundary pairs."""
    left = spark.createDataFrame(
        [("A", 10.0, 1), ("A", 20.0, 2), ("B", 10.0, 3)], ["k", "lts", "lid"]
    )
    right = spark.createDataFrame(
        [("A", 5.0, 10), ("A", 10.0, 11), ("A", 16.0, 12), ("B", 21.0, 13)],
        ["k", "rts", "rid"],
    )
    # band: rts in [lts - 5, lts] inclusive
    out = band_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        lower=-5, upper=0, right_cols=["rid"],
    )
    got = sorted((r.lid, r.rid_right) for r in out.collect())
    # lid 1: rts in [5,10] -> 10, 11; lid 2: [15,20] -> 12; lid 3: [5,10] -> none
    assert got == [(1, 10), (1, 11), (2, 12)]


def test_band_join_matches_naive(spark):
    """Bucketed form ≡ naive join+filter on random data (both band signs)."""
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(rng.randrange(3), rng.uniform(0, 100), i) for i in range(120)],
        ["k", "lts", "lid"],
    )
    right = spark.createDataFrame(
        [(rng.randrange(3), rng.uniform(0, 100), i) for i in range(200)],
        ["k", "rts", "rid"],
    )
    for lo, hi in [(-7.5, 0.0), (-3.0, 3.0), (2.0, 11.0)]:
        out = band_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            lower=lo, upper=hi, right_cols=["rid"],
        )
        got = sorted((r.lid, r.rid_right) for r in out.collect())
        naive = left.join(right, on="k").filter(
            (F.col("rts") >= F.col("lts") + lo) & (F.col("rts") <= F.col("lts") + hi)
        )
        want = sorted((r.lid, r.rid) for r in naive.collect())
        assert got == want, (lo, hi)


def test_band_join_timestamps(spark):
    """Timestamp axis: bounds are seconds, micros-exact arithmetic."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 1)], ["k", "ts", "lid"]
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:04:59.999999", 20),  # just outside
            (1, "2024-01-01 00:05:00", 21),         # exactly on lower bound
            (1, "2024-01-01 00:10:00", 22),         # on upper bound (tie)
            (1, "2024-01-01 00:10:00.000001", 23),  # just after
        ],
        ["k", "ts", "rid"],
    ).withColumn("ts", F.to_timestamp("ts"))
    out = band_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        lower=-300, upper=0, right_cols=["rid"],
    )
    assert sorted(r.rid_right for r in out.collect()) == [21, 22]


# ---------------------------------------------------------------------------
# interval overlap join
# ---------------------------------------------------------------------------


def test_interval_overlap_join_exactly_once(spark):
    from ftm_columnstore_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 60), (3, 200, 210)],
        "id long, start long, end long",
    )
    right = spark.createDataFrame(
        [(10, 90, 150), (11, 55, 58), (12, 300, 310)],
        "id long, start long, end long",
    )
    # bucket width 10: interval 1 spans 10 buckets — pairs with BOTH
    # 10 (shares buckets 9..9) and 11 (bucket 5), each exactly once
    rows = interval_overlap_join(
        left, right, bucket_width=10
    ).collect()
    got = {
        (r["left_id"], r["right_id"]): (
            r["overlap_start"],
            r["overlap_end"],
        )
        for r in rows
    }
    assert got == {(1, 10): (90, 100), (1, 11): (55, 58), (2, 11): (55, 58)}
    assert len(rows) == 3  # exactly-once: no duplicate bucket emissions


def test_interval_overlap_join_keyed_and_touching(spark):
    from ftm_columnstore_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, "u1", 0, 10), (2, "u2", 0, 10)],
        "id long, user string, start long, end long",
    )
    right = spark.createDataFrame(
        [(10, "u1", 5, 15), (11, "u2", 10, 20)],
        "id long, user string, start long, end long",
    )
    rows = interval_overlap_join(
        left, right, key="user", bucket_width=8
    ).collect()
    # u1 overlaps [5,10); u2's spans only TOUCH at 10 (half-open: no)
    assert [(r["left_id"], r["right_id"], r["user"]) for r in rows] == [
        (1, 10, "u1")
    ]


def test_interval_overlap_join_span_guard(spark):
    import pytest

    from ftm_columnstore_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0, 100_000)], "id long, start long, end long"
    )
    with pytest.raises(ValueError, match="max_buckets_per_interval"):
        interval_overlap_join(left, left, bucket_width=10)
    # empty/inverted intervals drop silently
    bad = spark.createDataFrame(
        [(1, 10, 10), (2, 20, 5)], "id long, start long, end long"
    )
    assert interval_overlap_join(bad, bad, bucket_width=10).count() == 0


def test_ohlc_rollup_hand_computed(spark):
    from ftm_columnstore_spark.operators.temporal import ohlc_rollup

    rows = [
        ("2024-01-01 10:05:00", 3.0, 1),
        ("2024-01-01 10:10:00", 9.0, 2),
        ("2024-01-01 10:20:00", 1.0, 3),
        ("2024-01-01 10:55:00", 5.0, 4),
        ("2024-01-01 11:05:00", 7.0, 5),
    ]
    df = spark.createDataFrame(
        rows, "ts string, value double, event_id long"
    ).selectExpr("CAST(ts AS TIMESTAMP) ts", "value", "event_id")
    got = {
        r["window_start"]: (r["open"], r["high"], r["low"], r["close"], r["n"])
        for r in ohlc_rollup(df, tiebreak_col="event_id").collect()
    }
    assert got == {
        "2024-01-01 10:00:00": (3.0, 9.0, 1.0, 5.0, 4),
        "2024-01-01 11:00:00": (7.0, 7.0, 7.0, 7.0, 1),
    }


def test_ohlc_rollup_tie_semantics_and_keys(spark):
    from ftm_columnstore_spark.operators.temporal import ohlc_rollup

    # two simultaneous opens: tiebreak by event_id -> open = id 1's 8.0;
    # without tiebreak_col the value itself breaks the tie -> open 2.0
    rows = [
        ("a", "2024-01-01 10:00:00", 8.0, 1),
        ("a", "2024-01-01 10:00:00", 2.0, 2),
        ("a", "2024-01-01 10:30:00", 5.0, 3),
        ("b", "2024-01-01 10:10:00", 4.0, 4),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, value double, event_id long"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "value", "event_id")
    by_id = {
        r["key"]: (r["open"], r["close"])
        for r in ohlc_rollup(
            df, key_col="k", tiebreak_col="event_id"
        ).collect()
    }
    assert by_id == {"a": (8.0, 5.0), "b": (4.0, 4.0)}
    by_val = {
        r["key"]: (r["open"], r["close"])
        for r in ohlc_rollup(df, key_col="k").collect()
    }
    assert by_val == {"a": (2.0, 5.0), "b": (4.0, 4.0)}
