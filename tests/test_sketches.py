"""Portable sketches: HLL cardinality and CMS heavy hitters.

Each test replays the exact md5/integer arithmetic in pure python and
requires equality — the same contract the DuckDB oracles (a22/a23 in
__spark_entry__) enforce cross-engine.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from ftm_columnstore_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    hll_cardinality,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hll_py(values, p):
    m = 1 << p
    maxbits = 60 - p
    regs = {}
    for v in values:
        h = _h60(str(v))
        idx, w = h % m, h // m
        rho = maxbits - (w.bit_length()) + 1 if w > 0 else maxbits + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    sp = maxbits + 1
    s = sum(1 << (sp - r) for r in regs.values()) + (m - len(regs)) * (
        1 << sp
    )
    raw = (alpha * m * m * float(1 << sp)) / float(s)
    v_empty = m - len(regs)
    if raw <= 2.5 * m and v_empty > 0:
        est = m * math.log(m / v_empty)
    else:
        est = raw
    return math.floor(est + 0.5)


@pytest.fixture(scope="module")
def keyed(spark):
    rows = [(i, f"k{i % 137}", f"g{i % 3}") for i in range(2000)]
    return spark.createDataFrame(rows, ["i", "k", "g"]).cache()


def test_hll_matches_python_replay(keyed):
    got = hll_cardinality(keyed, "k", p=6).collect()[0]["n_distinct_est"]
    expected = _hll_py([f"k{i % 137}" for i in range(2000)], p=6)
    assert got == expected


def test_hll_grouped_matches_python_replay(keyed):
    got = {
        r["g"]: r["n_distinct_est"]
        for r in hll_cardinality(keyed, "k", p=6, group_by=["g"]).collect()
    }
    for gk in ("g0", "g1", "g2"):
        vals = [
            f"k{i % 137}" for i in range(2000) if f"g{i % 3}" == gk
        ]
        assert got[gk] == _hll_py(vals, p=6)


def test_hll_accuracy_within_error_bound(spark):
    # p=10 → 1024 registers, theoretical σ ≈ 3.3%; allow 4σ
    n = 5000
    df = spark.createDataFrame([(f"v{i}",) for i in range(n)], ["k"])
    est = hll_cardinality(df, "k", p=10).collect()[0]["n_distinct_est"]
    assert abs(est - n) / n < 4 * 1.04 / math.sqrt(1024)


def test_hll_small_range_linear_counting(spark):
    # 3 distinct values over 64 registers → linear-counting branch
    df = spark.createDataFrame([("a",), ("b",), ("c",), ("a",)], ["k"])
    est = hll_cardinality(df, "k", p=6).collect()[0]["n_distinct_est"]
    expected = _hll_py(["a", "b", "c", "a"], p=6)
    assert est == expected
    assert abs(est - 3) <= 1


def test_hll_validates_p(keyed):
    with pytest.raises(ValueError, match="p must"):
        hll_cardinality(keyed, "k", p=2)


def _cms_py(values, d, w):
    cells = {}
    for v in values:
        for j in range(d):
            cell = _h60(f"{j}|{v}") % w
            cells[(j, cell)] = cells.get((j, cell), 0) + 1
    return cells


def test_cms_build_matches_python_replay(keyed):
    vals = [f"k{i % 137}" for i in range(2000)]
    expected = _cms_py(vals, d=3, w=64)
    got = {
        (r["j"], r["cell"]): r["cnt"]
        for r in cms_build(keyed, "k", d=3, w=64).collect()
    }
    assert got == expected


def test_cms_estimate_never_underestimates(keyed):
    true = {}
    for i in range(2000):
        true[f"k{i % 137}"] = true.get(f"k{i % 137}", 0) + 1
    cms = cms_build(keyed, "k", d=4, w=64)
    keys = keyed.select("k").distinct()
    got = {
        r["k"]: r["est_count"]
        for r in cms_estimate(cms, keys, "k", d=4, w=64).collect()
    }
    assert set(got) == set(true)
    for k, t in true.items():
        assert got[k] >= t


def test_cms_heavy_hitters_superset_of_true(spark):
    # skewed: "hot" appears 500×, others ≤ 20×
    rows = [("hot",)] * 500 + [(f"c{i % 50}",) for i in range(1000)]
    df = spark.createDataFrame(rows, ["k"])
    hh = {
        r["k"]: r["est_count"]
        for r in cms_heavy_hitters(df, "k", threshold=100, d=4, w=256).collect()
    }
    assert "hot" in hh and hh["hot"] >= 500
    # wide sketch, tiny keyspace → no false positives here
    assert set(hh) == {"hot"}


def test_cms_weighted_build(spark):
    df = spark.createDataFrame([("a", 5), ("a", 3), ("b", 2)], ["k", "n"])
    cms = cms_build(df, "k", d=2, w=32, weight_col="n")
    keys = df.select("k").distinct()
    got = {
        r["k"]: r["est_count"]
        for r in cms_estimate(cms, keys, "k", d=2, w=32).collect()
    }
    assert got["a"] >= 8 and got["b"] >= 2


def test_cms_validates_params(keyed):
    with pytest.raises(ValueError, match="d and w"):
        cms_build(keyed, "k", d=0)
    with pytest.raises(ValueError, match="threshold"):
        cms_heavy_hitters(keyed, "k", threshold=0)


def test_hll_merge_is_lossless(spark):
    """Sketch of a union == max-merge of per-part sketches — the
    property that makes incremental/per-shard HLL rollups exact."""
    from ftm_columnstore_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    a = spark.createDataFrame([(f"x{i}",) for i in range(300)], ["k"])
    b = spark.createDataFrame([(f"x{i}",) for i in range(150, 500)], ["k"])
    whole = a.unionByName(b)
    merged = hll_merge(
        hll_registers(a, "k", p=7), hll_registers(b, "k", p=7)
    )
    got = hll_estimate_from_registers(merged, p=7).collect()[0][
        "n_distinct_est"
    ]
    direct = hll_cardinality(whole, "k", p=7).collect()[0]["n_distinct_est"]
    assert got == direct


def test_cms_merge_is_lossless(spark):
    from ftm_columnstore_spark.operators.sketches import cms_merge

    a = spark.createDataFrame([(f"k{i % 7}",) for i in range(100)], ["k"])
    b = spark.createDataFrame([(f"k{i % 11}",) for i in range(80)], ["k"])
    merged = {
        (r["j"], r["cell"]): r["cnt"]
        for r in cms_merge(
            cms_build(a, "k", d=3, w=32), cms_build(b, "k", d=3, w=32)
        ).collect()
    }
    direct = {
        (r["j"], r["cell"]): r["cnt"]
        for r in cms_build(a.unionByName(b), "k", d=3, w=32).collect()
    }
    assert merged == direct


def test_hll_registers_stream_to_batch_estimate(spark, tmp_path):
    """The streaming shape: per-window register state IS the streaming
    aggregation (single groupBy max — streaming-legal); estimates are
    computed on read from the sink. Must equal the batch sketch."""
    import json as _json

    from ftm_columnstore_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"ts": f"2026-01-01 00:{i % 2}0:00", "user": f"u{i % 61}"}
        for i in range(400)
    ]
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))
    schema = "ts timestamp, user string"

    stream = spark.readStream.schema(schema).json(str(src))
    windowed = stream.withColumn(
        "win", F.window("ts", "10 minutes").start.cast("string")
    )
    regs = hll_registers(windowed, "user", p=6, group_by=["win"])
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["win"]: r["n_distinct_est"]
        for r in hll_estimate_from_registers(
            spark.table("hll_regs"), p=6, group_by=["win"]
        ).collect()
    }
    batch = spark.read.schema(schema).json(str(src)).withColumn(
        "win", F.window("ts", "10 minutes").start.cast("string")
    )
    expected = {
        r["win"]: r["n_distinct_est"]
        for r in hll_cardinality(batch, "user", p=6, group_by=["win"]).collect()
    }
    assert got == expected and len(got) == 2


def test_profile_cardinalities_matches_per_column_hll(keyed):
    from ftm_columnstore_spark.operators.sketches import (
        profile_cardinalities,
    )

    got = {
        r["column"]: r["n_distinct_est"]
        for r in profile_cardinalities(keyed, ["k", "g"], p=8).collect()
    }
    for c in ("k", "g"):
        solo = hll_cardinality(
            keyed.select(F.col(c).cast("string").alias("v")), "v", p=8
        ).collect()[0]["n_distinct_est"]
        assert got[c] == solo
    # g has 3 distinct values — small-range branch must be near-exact
    assert got["g"] == 3


def test_cms_build_streaming_matches_batch(spark, tmp_path):
    """CMS build is a single sum aggregation — legal streaming state;
    the streamed sketch must equal the batch sketch cell-for-cell."""
    import json as _json

    src = tmp_path / "cms_src"
    src.mkdir()
    rows = [{"k": f"t{i % 23}"} for i in range(300)]
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema("k string").json(str(src))
    q = (
        cms_build(stream, "k", d=3, w=64)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["j"], r["cell"]): r["cnt"]
        for r in spark.table("cms_stream").collect()
    }
    batch = spark.read.schema("k string").json(str(src))
    expected = {
        (r["j"], r["cell"]): r["cnt"]
        for r in cms_build(batch, "k", d=3, w=64).collect()
    }
    assert got == expected


def test_profile_columns_counts_and_estimates(spark):
    from ftm_columnstore_spark.operators.sketches import (
        profile_cardinalities,
        profile_columns,
    )

    rows = [
        (i, f"k{i % 37}" if i % 5 else None, f"g{i % 3}")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, ["i", "k", "g"])
    got = {
        r["column"]: (r["n_values"], r["n_nulls"], r["n_distinct_est"])
        for r in profile_columns(df, ["k", "g"], p=8).collect()
    }
    n_null = sum(1 for _, k, _ in rows if k is None)
    assert got["k"][0] == 400 - n_null and got["k"][1] == n_null
    assert got["g"] == (400, 0, 3)
    mm = {
        r["column"]: (r["min_value"], r["max_value"])
        for r in profile_columns(df, ["k", "g"], p=8).collect()
    }
    ks = sorted(k for _, k, _ in rows if k is not None)
    assert mm["k"] == (ks[0], ks[-1])
    assert mm["g"] == ("g0", "g2")
    # the estimate must agree with the nulls-dropped profiler exactly
    base = {
        r["column"]: r["n_distinct_est"]
        for r in profile_cardinalities(df, ["k", "g"], p=8).collect()
    }
    assert got["k"][2] == base["k"] and got["g"][2] == base["g"]


def test_profile_columns_all_null_column(spark):
    from ftm_columnstore_spark.operators.sketches import profile_columns

    df = spark.createDataFrame([(1, None), (2, None)], "i int, k string")
    got = {
        r["column"]: (
            r["n_values"], r["n_nulls"], r["n_distinct_est"],
            r["min_value"], r["max_value"],
        )
        for r in profile_columns(df, ["k"], p=6).collect()
    }
    assert got["k"] == (0, 2, 0, None, None)


# --- Bloom filter ---------------------------------------------------------


def test_bloom_no_false_negatives_and_param_guards(spark):
    """Every inserted key MUST probe true (no false negatives — the
    operator's contract); unseen keys may rarely collide but the probe
    column is definitive when false. Param guards follow the house
    threshold rule."""
    import pytest

    from ftm_columnstore_spark.operators.sketches import (
        MAX_BLOOM_BITS,
        bloom_build,
        bloom_might_contain,
    )

    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(200)], ["k"]
    )
    bloom = bloom_build(keys, "k", m_bits=1 << 12, k=3)
    assert bloom.count() <= (1 << 12) // 32
    got = {
        r["k"]: r["might_contain"]
        for r in bloom_might_contain(bloom, keys, "k", 1 << 12, 3).collect()
    }
    assert all(got[f"key-{i}"] for i in range(200))
    with pytest.raises(ValueError, match="multiple of 32"):
        bloom_build(keys, "k", m_bits=100)
    with pytest.raises(ValueError, match="MAX_BLOOM_BITS"):
        bloom_build(keys, "k", m_bits=MAX_BLOOM_BITS * 2)
    with pytest.raises(ValueError, match="k must be"):
        bloom_build(keys, "k", m_bits=64, k=0)


def test_bloom_fp_rate_in_expected_band(spark):
    """With n=256 keys in m=2^13 bits and k=4, fp ≈ (1-e^{-kn/m})^4
    ≈ 0.05%; a 1000-key unseen probe must stay well under 2% — loose
    enough to be deterministic-stable, tight enough to catch a broken
    hash family (which degenerates toward 100%)."""
    from ftm_columnstore_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    seen = spark.createDataFrame([(f"in-{i}",) for i in range(256)], ["k"])
    unseen = spark.createDataFrame(
        [(f"out-{i}",) for i in range(1000)], ["k"]
    )
    bloom = bloom_build(seen, "k", m_bits=1 << 13, k=4)
    fp = (
        bloom_might_contain(bloom, unseen, "k", 1 << 13, 4)
        .where("might_contain")
        .count()
    )
    assert fp <= 20, f"false-positive count {fp} out of band"


def test_bloom_decontaminate_exact_on_clean_docs(spark):
    """Docs sharing no n-gram with the bench set are absent from the
    report (no false negatives ⇒ clean is exact unless an fp fires;
    with these sizes the fp chance is ~0 and the assert is on the doc
    that DOES overlap)."""
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.operators.sketches import (
        bloom_ngram_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words about other things entirely"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(9, "story of the quick brown fox again")], ["doc_id", "text"]
    )
    rows = {
        r["id"]: r
        for r in bloom_ngram_decontaminate(
            corpus, bench, n=3, m_bits=1 << 12, k=2
        ).collect()
    }
    assert 1 in rows and rows[1]["n_hits"] >= 2  # 'the quick brown' etc.
    assert 2 not in rows
    assert rows[1]["hit_rate"] == round(
        rows[1]["n_hits"] / rows[1]["n_grams"], 6
    )


def test_bloom_merge_lossless(spark):
    """Merged per-shard filters equal the filter of the concatenated
    input — bit-for-bit (the same lossless-merge contract as
    hll_merge/cms_merge)."""
    from ftm_columnstore_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
    )

    a = spark.createDataFrame([(f"a-{i}",) for i in range(50)], ["k"])
    b = spark.createDataFrame([(f"b-{i}",) for i in range(50)], ["k"])
    merged = bloom_merge(
        bloom_build(a, "k", m_bits=1 << 10, k=3),
        bloom_build(b, "k", m_bits=1 << 10, k=3),
    )
    whole = bloom_build(a.unionByName(b), "k", m_bits=1 << 10, k=3)
    got = {r["word_idx"]: r["bits"] for r in merged.collect()}
    want = {r["word_idx"]: r["bits"] for r in whole.collect()}
    assert got == want
    import pytest

    with pytest.raises(ValueError):
        bloom_merge()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", blacklist_categories=("Cs",)
            ),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_bloom_never_false_negative_property(spark, keys):
    """For ARBITRARY unicode keys (empty string included), every
    inserted key probes true — the no-false-negative contract is
    structural (the k inserted bits are exactly the k probed bits),
    so it must survive any input."""
    from ftm_columnstore_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    bloom = bloom_build(df, "k", m_bits=512, k=3)
    got = {
        r["k"]: r["might_contain"]
        for r in bloom_might_contain(bloom, df, "k", 512, 3).collect()
    }
    assert all(got[k] for k in keys), [k for k in keys if not got[k]]


def test_bloom_probe_is_broadcast(spark):
    """Scale contract: the probe side joins the word table as a
    BROADCAST (map-side, no corpus-sized shuffle of the probe keys
    against the filter)."""
    from ftm_columnstore_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    keys = spark.createDataFrame([(f"k{i}",) for i in range(100)], ["k"])
    out = bloom_might_contain(
        bloom_build(keys, "k", 1 << 10, 3), keys, "k", 1 << 10, 3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


# --- KMV sketch -----------------------------------------------------------


def test_kmv_exact_below_k(spark):
    """With fewer than k distinct values the sketch IS the hash set:
    distinct estimate and Jaccard report are exact."""
    from ftm_columnstore_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_jaccard,
        kmv_sketch,
    )

    a_vals = [f"a{i}" for i in range(30)] + ["shared1", "shared2"]
    b_vals = [f"b{i}" for i in range(10)] + ["shared1", "shared2"]
    a = kmv_sketch(
        spark.createDataFrame([(v,) for v in a_vals * 3], ["v"]), "v", k=256
    )
    b = kmv_sketch(
        spark.createDataFrame([(v,) for v in b_vals], ["v"]), "v", k=256
    )
    assert kmv_distinct_estimate(a, 256).collect()[0][
        "n_distinct_est"
    ] == len(set(a_vals))
    row = kmv_jaccard(a, b, 256).collect()[0]
    union = len(set(a_vals) | set(b_vals))
    assert row["n_union_minima"] == union
    assert row["n_shared"] == 2
    assert row["union_est"] == union
    assert row["intersection_est"] == 2
    assert row["jaccard_est"] == round(2 / union, 6)


def test_kmv_estimates_in_band(spark):
    """Saturated regime: k=128 over 2000 distinct values — the KMV
    estimator's relative error is ~1/sqrt(k-2) ≈ 9%; assert a loose
    deterministic band (same seedless md5 every run, so the numbers
    are fixed — the band catches estimator regressions, not noise)."""
    from ftm_columnstore_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_jaccard,
        kmv_sketch,
    )

    vals = [(f"v{i}",) for i in range(2000)]
    df = spark.createDataFrame(vals, ["v"])
    sk = kmv_sketch(df, "v", k=128)
    assert sk.count() == 128
    est = kmv_distinct_estimate(sk, 128).collect()[0]["n_distinct_est"]
    assert 1400 <= est <= 2600, est
    # A = first 1500, B = last 1500 -> true J = 1000/2000 = 0.5
    a = kmv_sketch(
        spark.createDataFrame(vals[:1500], ["v"]), "v", k=128
    )
    b = kmv_sketch(
        spark.createDataFrame(vals[500:], ["v"]), "v", k=128
    )
    row = kmv_jaccard(a, b, 128).collect()[0]
    assert 0.3 <= row["jaccard_est"] <= 0.7, row
    assert 1400 <= row["union_est"] <= 2600, row
    # determinism: a second run is bit-identical
    again = kmv_jaccard(a, b, 128).collect()[0]
    assert row.asDict() == again.asDict()


def test_kmv_param_guard(spark):
    import pytest

    from ftm_columnstore_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame([("x",)], ["v"])
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, "v", k=1)


# ---------------------------------------------------------------------------
# log2 histogram + moments sketch
# ---------------------------------------------------------------------------


def _log2_bucket_py(x: int) -> int:
    if x < 0:
        return -1
    return x.bit_length()  # 0 -> 0, else floor(log2)+1


def test_log2_histogram_matches_bit_length(spark):
    from ftm_columnstore_spark.operators.sketches import log2_histogram

    vals = [0, 1, 2, 3, 4, 7, 8, 255, 256, 1023, 1024, 10**12, -5]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        (r["bucket"]): r["cnt"]
        for r in log2_histogram(df, "x").collect()
    }
    want = {}
    for v in vals:
        b = _log2_bucket_py(v)
        want[b] = want.get(b, 0) + 1
    assert got == want
    # power-of-two boundaries land in distinct buckets (the case float
    # log2 gets wrong by one ulp)
    assert _log2_bucket_py(1024) == 11 and _log2_bucket_py(1023) == 10


def test_log2_histogram_merge_equals_whole(spark):
    from ftm_columnstore_spark.operators.sketches import (
        log2_histogram,
        log2_histogram_merge,
    )

    vals = list(range(0, 300)) + [2**40, 2**40 + 5]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    whole = {
        r["bucket"]: r["cnt"] for r in log2_histogram(df, "x").collect()
    }
    a = log2_histogram(df.where(F.col("x") % 2 == 0), "x")
    b = log2_histogram(df.where(F.col("x") % 2 == 1), "x")
    merged = {
        r["bucket"]: r["cnt"]
        for r in log2_histogram_merge(a, b).collect()
    }
    assert merged == whole


def test_log2_histogram_quantile_rule(spark):
    from ftm_columnstore_spark.operators.sketches import (
        log2_histogram,
        log2_histogram_quantile,
    )

    # 10 values in bucket 1 (value 1), 80 in bucket 4 (8..15), 10 in
    # bucket 7 (64..127): p50/p90 in bucket 4, p0.95 in bucket 7
    vals = [1] * 10 + [9] * 80 + [100] * 10
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    hist = log2_histogram(df, "x")
    rows = {
        r["prob"]: (r["bucket"], r["lo"], r["hi"])
        for r in log2_histogram_quantile(
            hist, [0.1, 0.5, 0.9, 0.95]
        ).collect()
    }
    assert rows[0.1] == (1, 1, 1)
    assert rows[0.5] == (4, 8, 15)
    assert rows[0.9] == (4, 8, 15)
    assert rows[0.95] == (7, 64, 127)


def test_log2_histogram_quantile_validates(spark):
    from ftm_columnstore_spark.operators.sketches import (
        log2_histogram,
        log2_histogram_quantile,
    )

    df = spark.createDataFrame([(1,)], "x long")
    hist = log2_histogram(df, "x")
    with pytest.raises(ValueError, match="non-empty"):
        log2_histogram_quantile(hist, [])
    with pytest.raises(ValueError, match="out of"):
        log2_histogram_quantile(hist, [1.5])


def test_moments_sketch_exact_and_mergeable(spark):
    from ftm_columnstore_spark.operators.sketches import (
        moments_merge,
        moments_sketch,
        moments_stats,
    )

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    row = moments_sketch(df, "x").collect()[0]
    assert row["m0"] == len(vals)
    assert int(row["m1"]) == sum(vals)
    assert int(row["m2"]) == sum(v * v for v in vals)
    assert int(row["m3"]) == sum(v**3 for v in vals)

    a = moments_sketch(df.limit(5), "x")
    b = moments_sketch(df.subtract(df.limit(5)), "x")
    # merge parity on the aggregate moments (split by distinct rows,
    # so compare against the distinct-set sketch)
    dd = df.distinct()
    m = moments_merge(
        moments_sketch(dd.where(F.col("x") <= 3), "x"),
        moments_sketch(dd.where(F.col("x") > 3), "x"),
    ).collect()[0]
    w = moments_sketch(dd, "x").collect()[0]
    assert (m["m0"], int(m["m1"]), int(m["m2"]), int(m["m3"])) == (
        w["m0"],
        int(w["m1"]),
        int(w["m2"]),
        int(w["m3"]),
    )

    stats = moments_stats(moments_sketch(df, "x")).collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / n
    sd = var**0.5
    skew = sum((v - mean) ** 3 for v in vals) / n / sd**3
    assert stats["mean"] == pytest.approx(mean, abs=1e-6)
    assert stats["variance"] == pytest.approx(var, abs=1e-6)
    assert stats["skewness"] == pytest.approx(skew, abs=1e-5)


def test_moments_stats_zero_variance_skew_null(spark):
    from ftm_columnstore_spark.operators.sketches import (
        moments_sketch,
        moments_stats,
    )

    df = spark.createDataFrame([(7,), (7,), (7,)], "x long")
    row = moments_stats(moments_sketch(df, "x")).collect()[0]
    assert row["variance"] == 0.0
    assert row["skewness"] is None


def test_ks_drift_hand_computed(spark):
    from ftm_columnstore_spark.operators.sketches import ks_drift

    a = spark.createDataFrame([(1,), (2,), (3,)], "v long")
    b = spark.createDataFrame([(3,), (4,)], "v long")
    r = ks_drift(a, b, "v").first()
    # F_a = {1:1/3, 2:2/3, 3:1, 4:1}; F_b = {1:0, 2:0, 3:1/2, 4:1}
    assert (r["d_stat"], r["at_value"], r["n_a"], r["n_b"]) == (
        0.666667, 2, 3, 2,
    )


def test_ks_drift_identical_distributions(spark):
    from ftm_columnstore_spark.operators.sketches import ks_drift

    a = spark.createDataFrame([(i % 7,) for i in range(50)], "v long")
    r = ks_drift(a, a, "v").first()
    assert r["d_stat"] == 0.0 and r["at_value"] == 0


def test_ks_drift_matches_scipy_style_reference(spark):
    """Cross-check against a pure-Python CDF replay on random-ish data,
    across a bucket count that forces multi-bucket prefix sums."""
    from ftm_columnstore_spark.operators.sketches import ks_drift

    xs = [((i * 37) % 101) for i in range(80)]
    ys = [((i * 53) % 89) + 10 for i in range(60)]
    a = spark.createDataFrame([(v,) for v in xs], "v long")
    b = spark.createDataFrame([(v,) for v in ys], "v long")
    r = ks_drift(a, b, "v", n_buckets=8).first()
    values = sorted(set(xs) | set(ys))
    def cdf(data, x):
        return sum(1 for d in data if d <= x) / len(data)
    diffs = [(abs(cdf(xs, v) - cdf(ys, v)), v) for v in values]
    dmax = max(d for d, _ in diffs)
    at = min(v for d, v in diffs if d == dmax)
    assert r["d_stat"] == round(dmax, 6)
    assert r["at_value"] == at
    assert (r["n_a"], r["n_b"]) == (80, 60)


def test_ks_drift_validation(spark):
    import pytest

    from ftm_columnstore_spark.operators.sketches import ks_drift

    a = spark.createDataFrame([(1,)], "v long")
    empty = spark.createDataFrame([], "v long")
    with pytest.raises(ValueError, match="n_buckets"):
        ks_drift(a, a, "v", n_buckets=0)
    with pytest.raises(ValueError, match="no non-null"):
        ks_drift(empty, empty, "v")
    with pytest.raises(ValueError, match="one side"):
        ks_drift(a, empty, "v")


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from ftm_columnstore_spark.operators.sketches import correlation_matrix

    xs = [float((i * 7) % 13) for i in range(40)]
    ys = [2.5 * v + 1.0 + ((i * 3) % 5) for i, v in enumerate(xs)]
    zs = [float((i * 11) % 17) for i in range(40)]
    df = spark.createDataFrame(
        list(zip(xs, ys, zs)), "x double, y double, z double"
    )
    got = {
        (r["col_x"], r["col_y"]): (r["n"], r["corr"])
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    for (cx, cy), (n, corr) in got.items():
        a = {"x": xs, "y": ys, "z": zs}[cx]
        b = {"x": xs, "y": ys, "z": zs}[cy]
        assert n == 40
        assert abs(corr - float(np.corrcoef(a, b)[0, 1])) < 1e-6
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}


def test_correlation_matrix_pairwise_deletion_and_zero_variance(spark):
    from ftm_columnstore_spark.operators.sketches import correlation_matrix

    df = spark.createDataFrame(
        [
            (1.0, 2.0, 5.0),
            (2.0, None, 5.0),
            (3.0, 6.0, 5.0),
            (None, 8.0, 5.0),
        ],
        "x double, y double, c double",
    )
    got = {
        (r["col_x"], r["col_y"]): (r["n"], r["corr"])
        for r in correlation_matrix(df, ["x", "y", "c"]).collect()
    }
    # x/y complete on rows 1 and 3 only -> perfect line -> corr 1
    assert got[("x", "y")] == (2, 1.0)
    # constant column -> zero variance -> NULL
    assert got[("x", "c")][1] is None
    assert got[("y", "c")][1] is None


def test_correlation_matrix_validation(spark):
    import pytest

    from ftm_columnstore_spark.operators.sketches import correlation_matrix

    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    with pytest.raises(ValueError, match="at least 2"):
        correlation_matrix(df, ["x"])
    with pytest.raises(ValueError, match="max_cols"):
        correlation_matrix(df, ["x", "y"], max_cols=1)


def test_ks_drift_by_group_matches_pairwise(spark):
    """Each group's leave-one-out D equals ks_drift(group, rest)."""
    from ftm_columnstore_spark.operators.sketches import (
        ks_drift,
        ks_drift_by_group,
    )

    rows = [("a", (i * 37) % 50) for i in range(60)] + [
        ("b", (i * 11) % 80 + 5) for i in range(40)
    ] + [("c", (i * 7) % 30) for i in range(30)]
    df = spark.createDataFrame(rows, "src string, v long")
    got = {
        r["group"]: (r["d_stat"], r["at_value"], r["n_group"], r["n_rest"])
        for r in ks_drift_by_group(df, "v", "src").collect()
    }
    assert set(got) == {"a", "b", "c"}
    for grp in ("a", "b", "c"):
        ref = ks_drift(
            df.where(f"src = '{grp}'"), df.where(f"src <> '{grp}'"), "v"
        ).first()
        assert got[grp] == (
            ref["d_stat"], ref["at_value"], ref["n_a"], ref["n_b"]
        ), grp


def test_ks_drift_by_group_validation(spark):
    import pytest

    from ftm_columnstore_spark.operators.sketches import ks_drift_by_group

    df = spark.createDataFrame(
        [(str(i), i) for i in range(10)], "src string, v long"
    )
    with pytest.raises(ValueError, match="max_groups"):
        ks_drift_by_group(df, "v", "src", max_groups=1)
    with pytest.raises(ValueError, match="more than max_groups"):
        ks_drift_by_group(df, "v", "src", max_groups=5)
    with pytest.raises(ValueError, match="max_distinct_values"):
        ks_drift_by_group(df, "v", "src", max_distinct_values=1)


def test_ks_drift_by_group_single_group_raises(spark):
    """Leave-one-out drift with one group divides by zero in the
    rest-CDF — must raise, not emit NaN (ADVICE r5)."""
    import pytest

    from ftm_columnstore_spark.operators.sketches import ks_drift_by_group

    df = spark.createDataFrame(
        [("only", i) for i in range(10)], "src string, v long"
    )
    with pytest.raises(ValueError, match="fewer than 2 distinct groups"):
        ks_drift_by_group(df, "v", "src")


def test_ks_drift_by_group_value_grid_guard(spark):
    """A near-unique value column trips the value-side grid bound
    (VERDICT r5 item 5) instead of silently building |groups|x|corpus|."""
    import pytest

    from ftm_columnstore_spark.operators.sketches import ks_drift_by_group

    df = spark.createDataFrame(
        [("a" if i % 2 == 0 else "b", i * 1.000001) for i in range(64)],
        "src string, v double",
    )
    with pytest.raises(ValueError, match="more than max_distinct_values"):
        ks_drift_by_group(df, "v", "src", max_distinct_values=16)
    # binning the column per the docstring recommendation succeeds
    from pyspark.sql import functions as F

    binned = df.select("src", F.round(F.col("v") / 8.0).alias("v"))
    rows = ks_drift_by_group(binned, "v", "src").collect()
    assert {r["group"] for r in rows} == {"a", "b"}
