"""Property-based CROSS-ENGINE parity for the portable hash families.

The portable MinHash/SimHash/embedding-LSH pipelines claim to be exact
integer/IEEE arithmetic reproducible in any engine. These tests fuzz
that claim: hypothesis-generated corpora run through BOTH the Spark
operators and the DuckDB oracle SQL (the exact strings the driver's
correctness gate executes), asserting identical output — not just on
the fixed test tables, but on arbitrary adversarial inputs (dup-heavy
corpora, short docs, token boundary cases).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entry
from ftm_columnstore_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signature,
    simhash_pairs_portable,
)

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "x1", "y22",
]

doc = st.one_of(
    st.none(),  # null text: operators and oracles must both drop it
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=25).map(" ".join),
)
corpus = st.lists(doc, min_size=2, max_size=8).filter(
    lambda ts: sum(t is not None for t in ts) >= 2
)

# PARITY_MAX_EXAMPLES cranks the per-test example budget for offline
# stress sweeps (the r6 moments divergence was found by exactly such a
# sweep); CI/driver runs keep the cheap default.
import os as _os

SETTINGS = settings(
    max_examples=int(_os.environ.get("PARITY_MAX_EXAMPLES", "5")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _oracle(pdf: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", pdf)
    return con.execute(sql).df()


def _assert_same(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> None:
    cols = sorted(spark_pdf.columns)
    assert cols == sorted(oracle_pdf.columns)
    # sort by exact (non-float) columns first: float values may differ in
    # the last ulps between engines, and a float-led sort could then
    # misalign otherwise-identical rows
    sort_cols = sorted(cols, key=lambda c: spark_pdf[c].dtype.kind == "f")
    s = spark_pdf[cols].sort_values(sort_cols).reset_index(drop=True)
    o = oracle_pdf[cols].sort_values(sort_cols).reset_index(drop=True)
    assert len(s) == len(o), (len(s), len(o))
    for c in cols:
        if s[c].dtype.kind == "f" or o[c].dtype.kind == "f":
            assert np.allclose(
                s[c].astype(float), o[c].astype(float), rtol=1e-9,
                equal_nan=True,
            ), c
        elif s[c].dtype.kind in "iu" and o[c].dtype.kind in "iu":
            assert (
                s[c].astype("int64").values == o[c].astype("int64").values
            ).all(), c
        else:
            assert (
                s[c].astype(str).values == o[c].astype(str).values
            ).all(), c


@SETTINGS
@given(texts=corpus)
def test_minhash_pairs_match_duckdb(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    sigs = minhash_signature(df, num_hashes=32, shingle_k=3)
    got = minhash_lsh_pairs(sigs, num_bands=8).toPandas()
    want = _oracle(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        entry._d3_oracle(nh=32, k=3, nb=8),
    )
    _assert_same(got, want)


@SETTINGS
@given(texts=corpus)
def test_simhash_pairs_match_duckdb(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    # max_hamming must respect the pigeonhole contract (< bands); 7/8
    # keeps the filter nearly accept-all so value parity is exercised on
    # every candidate pair the banding emits
    got = simhash_pairs_portable(df, max_hamming=7, bands=8).toPandas()
    want = _oracle(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        entry._d4_oracle(bands=8, max_hamming=7),
    )
    _assert_same(got, want)


@SETTINGS
@given(texts=corpus)
def test_bigram_lm_match_duckdb(spark, texts):
    from ftm_columnstore_spark.operators.text import bigram_lm_scores

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = (
        bigram_lm_scores(df)
        .withColumnRenamed("id", "doc_id")
        .toPandas()
    )
    want = _oracle(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        entry.oracle_sql()["t11_bigram_lm"],
    )
    _assert_same(got, want)


@SETTINGS
@given(texts=corpus)
def test_tfidf_match_duckdb(spark, texts):
    from ftm_columnstore_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = (
        tfidf_top_terms(df, top=3)
        .withColumnRenamed("id", "doc_id")
        .toPandas()
    )
    want = _oracle(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        entry.oracle_sql()["t12_tfidf_terms"],
    )
    _assert_same(got, want)


@SETTINGS
@given(ids=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
                    max_size=40, unique=True))
def test_hash_split_match_duckdb(spark, ids):
    """The md5-threshold split contract must be reproducible outside
    Spark — per-ROW assignment equality, not just aggregate counts."""
    from ftm_columnstore_spark.operators.sampling import split_by_hash

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = split_by_hash(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, seed="seed"
    ).toPandas()
    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"doc_id": ids}))
    want = con.execute("""
        SELECT doc_id, CASE
            WHEN substr(md5('seed' || CAST(doc_id AS VARCHAR)), 1, 8)
                 < 'cccccccc' THEN 'train'
            WHEN substr(md5('seed' || CAST(doc_id AS VARCHAR)), 1, 8)
                 < 'e6666666' THEN 'val'
            ELSE 'test' END AS split
        FROM docs
    """).df()
    _assert_same(got, want)


@SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1.0,
                max_value=1.0,
                allow_nan=False,
                width=32,
            ),
            min_size=8,
            max_size=8,
        ),
        # zero-norm vectors are fine: both the operator and the oracle
        # drop them (cosine undefined), so parity holds even there
        min_size=2,
        max_size=8,
    )
)
def test_embedding_dups_match_duckdb(spark, vecs):
    from ftm_columnstore_spark.operators.dedup import (
        embedding_dup_pairs_portable,
    )

    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    got = embedding_dup_pairs_portable(
        df, min_cosine=0.1, num_planes=4
    ).toPandas()
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            }
        ),
    )
    want = con.execute(
        entry._v4_oracle(min_cosine=0.1, num_planes=4, dim=8)
    ).df()
    _assert_same(got, want)


@SETTINGS
@given(texts=corpus)
def test_winnow_fingerprints_match_duckdb(spark, texts):
    from ftm_columnstore_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = (
        winnow_fingerprints(df, k=4, window=4)
        .withColumnRenamed("id", "doc_id")
        .toPandas()
    )
    want = _oracle(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        entry.oracle_sql()["t14_winnow_fingerprints"],
    )
    _assert_same(got, want)


# multi-line docs for line dedup: several lines per doc drawn from a
# SMALL line pool so cross-document duplicate lines are common
_line = st.sampled_from(
    ["alpha beta", "gamma delta", "epsilon zeta", "  ", "shared line"]
)
_mldoc = st.one_of(
    st.none(),
    st.lists(_line, min_size=1, max_size=5).map("\n".join),
)

_LINE_DEDUP_ORACLE = """
    WITH lines AS (
        SELECT doc_id, pos, line FROM (
            SELECT doc_id,
                   generate_subscripts(ls, 1) - 1 AS pos,
                   unnest(ls) AS line
            FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                  FROM documents WHERE text IS NOT NULL))
        WHERE trim(line) <> ''
    ), ranked AS (
        SELECT doc_id, pos, line,
               row_number() OVER (PARTITION BY md5(line)
                                  ORDER BY doc_id, pos) AS rn
        FROM lines
    ), kept AS (SELECT doc_id, pos, line FROM ranked WHERE rn = 1),
    counts AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id),
    agg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS text
        FROM kept GROUP BY doc_id
    )
    SELECT c.doc_id, c.n_lines,
           coalesce(a.n_kept, 0) AS n_kept,
           coalesce(a.text, '') AS text
    FROM counts c LEFT JOIN agg a USING (doc_id)
"""


@SETTINGS
@given(texts=st.lists(_mldoc, min_size=2, max_size=8))
def test_line_dedup_match_duckdb(spark, texts):
    from ftm_columnstore_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = line_dedup(df).withColumnRenamed("id", "doc_id").toPandas()
    want = _oracle(
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": pd.array(texts, dtype="string")}
        ),
        _LINE_DEDUP_ORACLE,
    )
    _assert_same(got, want)


@SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=8,
    )
)
def test_semantic_dedup_match_duckdb(spark, vecs):
    from ftm_columnstore_spark.operators.dedup import semantic_dedup_portable

    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    got = semantic_dedup_portable(df, n_centroids=2, threshold=0.5).toPandas()
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            }
        ),
    )
    want = con.execute(
        entry._v9_oracle(n_centroids=2, threshold=0.5, dim=4)
    ).df()
    _assert_same(got, want)


@SETTINGS
@given(texts=corpus)
def test_exact_substring_dedup_match_duckdb(spark, texts):
    """ExactSubstr (d14): random dup-heavy corpora produce identical
    span cuts in both engines (k lowered to 4 so short fuzz docs
    actually overlap)."""
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.operators.dedup import exact_substring_dedup

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = (
        exact_substring_dedup(df, k=4)
        .select(
            F.col("id").alias("doc_id"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_removed").cast("long").alias("n_removed"),
            F.md5("text").alias("clean_md5"),
        )
        .toPandas()
    )
    sql = entry.oracle_sql()["d14_exact_substring_dedup"]
    # the registry oracle is pinned at k=8; re-derive it for k=4
    sql = (
        sql.replace("len(tk) - 6", "len(tk) - 2")
        .replace("tk[i:i+7]", "tk[i:i+3]")
        .replace("len(tk) >= 8", "len(tk) >= 4")
        .replace("pos + 7 AS e", "pos + 3 AS e")
    )
    want = _oracle(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}), sql
    )
    _assert_same(got, want)


event_stream = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),            # user
        st.integers(min_value=0, max_value=3 * 86400),    # seconds offset
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(rows=event_stream)
def test_funnel_match_duckdb(spark, rows):
    """Funnel (w5): arbitrary event streams (multi-day, shuffled order,
    duplicate timestamps) produce identical depths in both engines."""
    import datetime as dt

    import duckdb as _duckdb

    from pyspark.sql import functions as F

    from ftm_columnstore_spark.operators.temporal import funnel

    base = dt.datetime(2024, 1, 1)
    data = [
        (u, base + dt.timedelta(seconds=s), t) for u, s, t in rows
    ]
    ev = spark.createDataFrame(data, ["user_id", "ts", "event_type"])
    got = (
        funnel(ev, ["view", "click", "purchase"], window_seconds=86400)
        .select(
            F.col("user").alias("user_id"),
            F.unix_micros(F.col("t1").cast("timestamp")).alias("t1_us"),
            F.unix_micros(F.col("t2").cast("timestamp")).alias("t2_us"),
            F.unix_micros(F.col("t3").cast("timestamp")).alias("t3_us"),
            "depth",
        )
        .toPandas()
    )
    con = _duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [r[0] for r in data],
                "ts": [r[1] for r in data],
                "event_type": [r[2] for r in data],
            }
        ),
    )
    want = con.execute(entry.oracle_sql()["w5_funnel"]).df()
    _assert_same(got, want)


@SETTINGS
@given(rows=event_stream)
def test_sessionize_match_duckdb(spark, rows):
    """Sessionize (w7): random streams (incl. duplicate timestamps —
    session membership is tie-order-invariant) match the oracle."""
    import datetime as dt

    import duckdb as _duckdb

    from pyspark.sql import functions as F

    from ftm_columnstore_spark.operators.temporal import sessionize

    base = dt.datetime(2024, 1, 1)
    data = [(u, base + dt.timedelta(seconds=s)) for u, s, _t in rows]
    ev = spark.createDataFrame(data, ["user_id", "ts"])
    got = (
        sessionize(ev, gap_seconds=1800)
        .select(
            F.col("user").alias("user_id"),
            F.col("session_no").cast("long").alias("session_no"),
            F.unix_micros(F.col("t_start").cast("timestamp")).alias("start_us"),
            F.unix_micros(F.col("t_end").cast("timestamp")).alias("end_us"),
            F.col("n_events").cast("long").alias("n_events"),
            F.round("duration_s", 6).alias("duration_s"),
        )
        .toPandas()
    )
    con = _duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {"user_id": [r[0] for r in data], "ts": [r[1] for r in data]}
        ),
    )
    want = con.execute(entry.oracle_sql()["w7_sessionize"]).df()
    _assert_same(got, want)


@SETTINGS
@given(rows=event_stream)
def test_retention_match_duckdb(spark, rows):
    """Retention (w6): random multi-day streams match the oracle."""
    import datetime as dt

    import duckdb as _duckdb

    from pyspark.sql import functions as F

    from ftm_columnstore_spark.operators.temporal import retention

    base = dt.datetime(2024, 1, 1)
    data = [(u, base + dt.timedelta(seconds=s)) for u, s, _t in rows]
    ev = spark.createDataFrame(data, ["user_id", "ts"])
    got = (
        retention(ev, offsets=[1, 7])
        .select(
            "cohort",
            "n_users",
            F.col("d1").cast("long").alias("d1"),
            F.col("d7").cast("long").alias("d7"),
        )
        .toPandas()
    )
    con = _duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {"user_id": [r[0] for r in data], "ts": [r[1] for r in data]}
        ),
    )
    want = con.execute(entry.oracle_sql()["w6_retention"]).df()
    _assert_same(got, want)


@SETTINGS
@given(sizes=st.lists(st.integers(min_value=0, max_value=400),
                      min_size=1, max_size=25))
def test_pack_portable_match_duckdb(spark, sizes):
    """Portable packing (t19): random size mixes (incl. oversized and
    zero-size items) fill bins identically to the recursive-CTE oracle."""
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.operators.sampling import (
        pack_sequences_portable,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], ["doc_id", "n_tokens"]
    )
    got = (
        pack_sequences_portable(df, budget=256, n_buckets=8)
        .select(
            F.col("id").alias("doc_id"),
            F.col("size").alias("n_tokens"),
            "bucket",
            "bin_no",
            "bin_fill",
        )
        .toPandas()
    )
    # re-derive the registry oracle for a sizes table instead of text
    sql = entry.oracle_sql()["t19_pack_portable"].replace(
        """len(list_filter(
                           string_split_regex(lower(coalesce(text, '')),
                                              '[^a-z0-9]+'),
                           x -> x <> ''))::BIGINT AS size""",
        "n_tokens::BIGINT AS size",
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(sizes)), "n_tokens": sizes}),
    )
    want = con.execute(sql).df()
    _assert_same(got, want)


@SETTINGS
@given(texts=corpus)
def test_cross_corpus_lm_match_duckdb(spark, texts):
    """Cross-corpus LM (t20): the reference/batch split scores match,
    including unseen-bigram fallbacks."""
    from ftm_columnstore_spark.operators.text import (
        score_with_bigram_lm,
        train_bigram_lm,
    )

    # first half trains, second half scores (ids below/above 250 in the
    # registry oracle; remap the fuzz ids accordingly)
    mid = len(texts) // 2
    rows = [
        (i if i < mid else i - mid + 250, t) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from pyspark.sql import functions as F

    lm = train_bigram_lm(df.where(F.col("doc_id") < 250))
    got = (
        score_with_bigram_lm(df.where(F.col("doc_id") >= 250), lm)
        .withColumnRenamed("id", "doc_id")
        .toPandas()
    )
    want = _oracle(
        pd.DataFrame(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
        ),
        entry.oracle_sql()["t20_cross_corpus_lm"],
    )
    _assert_same(got, want)


# --- round-3 additions: sketches / budget / PQ / classifier ------------------


@given(
    vals=st.lists(
        st.one_of(st.none(), st.sampled_from(VOCAB)), min_size=1, max_size=40
    ),
    p=st.sampled_from([4, 6, 8]),
)
@SETTINGS
def test_hll_matches_duckdb_replay(spark, vals, p):
    """Fuzzed cross-engine HLL: arbitrary value lists (with nulls) →
    Spark registers/estimate == the DuckDB replay of the same math."""
    from ftm_columnstore_spark.operators.sketches import hll_cardinality

    df = spark.createDataFrame([(v,) for v in vals], "k string")
    got = hll_cardinality(df, "k", p=p).collect()[0]["n_distinct_est"]
    m = 1 << p
    maxbits, sp = 60 - p, 60 - p + 1
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )
    alpha_num = alpha * m * m * float(1 << sp)
    con = duckdb.connect()
    con.register("vals", pd.DataFrame({"k": vals}))
    o = con.execute(f"""
        WITH h AS (
          SELECT ('0x'||substr(md5(k),1,15))::BIGINT AS h FROM vals
          WHERE k IS NOT NULL
        ), reg AS (SELECT h % {m} AS idx, h // {m} AS w FROM h),
        rk AS (
          SELECT idx, CASE WHEN w > 0 THEN {maxbits} - length(bin(w)) + 1
                           ELSE {maxbits + 1} END AS rho FROM reg
        ), regs AS (SELECT idx, max(rho) AS rho FROM rk GROUP BY idx),
        agg AS (
          SELECT sum(1::BIGINT << ({sp} - rho)) AS s, count(*) AS n
          FROM regs
        ), est AS (
          SELECT {alpha_num!r} / CAST(s + ({m} - n) * (1::BIGINT << {sp})
                                      AS DOUBLE) AS raw,
                 CAST({m} - n AS DOUBLE) AS v
          FROM agg
        )
        SELECT CAST(floor(CASE WHEN raw <= {2.5 * m!r} AND v > 0
                               THEN {float(m)!r} * ln({float(m)!r} / v)
                               ELSE raw END + 0.5) AS BIGINT) AS e
        FROM est
    """).fetchone()[0]
    if all(v is None for v in vals):
        # no rows reach the register agg: Spark yields no group either
        return
    assert got == o


@given(
    costs=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=30),
    budget=st.integers(min_value=0, max_value=4000),
)
@SETTINGS
def test_take_budget_matches_replay_fuzzed(spark, costs, budget):
    import hashlib

    from ftm_columnstore_spark.operators.sampling import take_budget

    rows = list(enumerate(costs))
    df = spark.createDataFrame(rows, ["doc_id", "cost"])
    got = {r["doc_id"] for r in take_budget(df, "cost", budget).collect()}
    keyed = sorted(
        (hashlib.md5(str(i).encode()).hexdigest()[:8], i, c) for i, c in rows
    )
    acc, expected = 0, set()
    for _, i, c in keyed:
        acc += c
        if acc <= budget:
            expected.add(i)
    assert got == expected


@given(
    n=st.integers(min_value=8, max_value=25),
    qi=st.integers(min_value=0, max_value=7),
)
@SETTINGS
def test_pq_topk_matches_replay_fuzzed(spark, n, qi):
    import random

    from pyspark.sql import functions as F

    from tests.test_similarity import _pq_brute_py
    from ftm_columnstore_spark.operators.similarity import pq_topk

    rng = random.Random(n * 31 + qi)
    data = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(n)
    ]
    df = spark.createDataFrame(data, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    # re-read the float32-rounded vectors: the replay must quantize the
    # same values the operator sees
    data32 = sorted(
        (r["vec_id"], list(r["embedding"])) for r in df.collect()
    )
    q = data32[qi][1]
    expected = _pq_brute_py(data32, q, m=4, n_codes=min(8, n), k=3)
    got = [
        (r["vec_id"], r["adist"])
        for r in pq_topk(df, q, k=3, m=4, n_codes=min(8, n)).collect()
    ]
    assert got == expected


@given(
    gtexts=st.lists(doc, min_size=0, max_size=5),
    btexts=st.lists(doc, min_size=0, max_size=5),
)
@SETTINGS
def test_nb_classifier_fuzzed_never_errors_and_matches_replay(
    spark, gtexts, btexts
):
    """Arbitrary corpora (nulls, empties, one-sided, fully empty) must
    yield a defined model and scores matching the python replay within
    1e-6 (Spark's partition-order double sums vs sequential replay)."""
    import math

    from tests.test_text_functions import _nb_py
    from ftm_columnstore_spark.operators.text import (
        score_quality_classifier,
        train_quality_classifier,
    )

    gdf = spark.createDataFrame([(t,) for t in gtexts], "text string")
    bdf = spark.createDataFrame([(t,) for t in btexts], "text string")
    score_texts = [t for t in gtexts + btexts if t] or ["alpha"]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score_texts)], "doc_id int, text string"
    )
    w = train_quality_classifier(gdf, bdf)
    got = {
        r["id"]: (r["n_scored_tokens"], r["nb_score"])
        for r in score_quality_classifier(sdf, w).collect()
    }
    expected = _nb_py(
        [t for t in gtexts if t], [t for t in btexts if t], score_texts
    )
    assert set(got) == set(expected)
    for i, (n, s) in expected.items():
        assert got[i][0] == n
        assert math.isclose(got[i][1], s, abs_tol=1e-6), (i, got[i][1], s)


line_strategy = st.one_of(
    st.sampled_from([
        "A proper sentence here.",
        "short.",
        "no punct at all",
        'He said "stop".',
        "Enable JavaScript to continue.",
        "  padded line with spaces.  ",
        "one two three four!",
        "tab\tseparated words here?",
        "",
        "   ",
    ]),
    st.text(
        alphabet=st.sampled_from(list('abc .!?"\t')), min_size=0, max_size=20
    ),
)
c4_doc = st.one_of(
    st.none(),
    st.lists(line_strategy, min_size=0, max_size=6).map("\n".join),
)


@given(texts=st.lists(c4_doc, min_size=1, max_size=6))
@SETTINGS
def test_c4_line_filter_matches_duckdb(spark, texts):
    """Fuzzed cross-engine C4 rules: Java-regex predicates vs DuckDB
    RE2 list lambdas must agree on adversarial lines (quotes, tabs,
    whitespace padding, empty/null docs)."""
    from ftm_columnstore_spark.operators.text import c4_line_filter

    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = (
        c4_line_filter(df, min_words=3)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    oracle = _oracle(pdf, entry.oracle_sql()["t24_c4_line_filter"]).sort_values(
        "id"
    ).reset_index(drop=True)
    assert got["n_lines"].tolist() == oracle["n_lines"].tolist()
    assert got["n_kept"].tolist() == oracle["n_kept"].tolist()
    assert got["text"].tolist() == oracle["text"].tolist()


@given(
    vals=st.lists(
        st.one_of(st.none(), st.sampled_from(VOCAB)), min_size=1, max_size=40
    ),
)
@SETTINGS
def test_cms_matches_duckdb_replay(spark, vals):
    """Fuzzed cross-engine CMS: cell counts and min-estimates must be
    identical between the Spark build and the DuckDB replay."""
    from ftm_columnstore_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([(v,) for v in vals], "k string")
    cms = cms_build(df, "k", d=3, w=32)
    keys = df.where(df.k.isNotNull()).select("k").distinct()
    got = {
        r["k"]: r["est_count"]
        for r in cms_estimate(cms, keys, "k", d=3, w=32).collect()
    }
    con = duckdb.connect()
    con.register("vals", pd.DataFrame({"k": vals}))
    oracle = dict(
        con.execute("""
            WITH cells AS (
              SELECT j.range AS j,
                     ('0x'||substr(md5(CAST(j.range AS VARCHAR)||'|'||k),
                                   1,15))::BIGINT % 32 AS cell
              FROM vals, range(3) j WHERE k IS NOT NULL
            ), cms AS (
              SELECT j, cell, count(*) AS cnt FROM cells GROUP BY j, cell
            ), keys AS (SELECT DISTINCT k FROM vals WHERE k IS NOT NULL),
            probes AS (
              SELECT k, j.range AS j,
                     ('0x'||substr(md5(CAST(j.range AS VARCHAR)||'|'||k),
                                   1,15))::BIGINT % 32 AS cell
              FROM keys, range(3) j
            )
            SELECT k, CAST(min(coalesce(cnt, 0)) AS BIGINT)
            FROM probes LEFT JOIN cms USING (j, cell) GROUP BY k
        """).fetchall()
    )
    assert got == oracle


@given(
    st.lists(
        st.integers(min_value=-(2**40), max_value=2**62),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_log2_bucket_match_duckdb(spark, vals):
    """a27's oracle contract: Spark's length(bin(x)) bucket and the
    DuckDB CASE/bin replay agree on arbitrary longs, including 0,
    negatives, and exact powers of two (where float log2 is one ulp
    off in at least one engine)."""
    from ftm_columnstore_spark.operators.sketches import log2_histogram

    # force the boundary cases into every example
    vals = list(vals) + [0, 1, 2, 1023, 1024, 2**40 - 1, 2**40]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r["bucket"]: r["cnt"] for r in log2_histogram(df, "x").collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": pd.Series(vals, dtype="int64")}))
    want = {
        int(b): int(c)
        for b, c in con.sql(
            """
            SELECT CASE WHEN x < 0 THEN -1 WHEN x = 0 THEN 0
                        ELSE length(bin(x)) END AS bucket,
                   count(*) AS cnt
            FROM t GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want


@given(
    st.lists(
        st.integers(min_value=0, max_value=10**6),
        min_size=2,
        max_size=30,
    )
)
@SETTINGS
def test_moments_stats_match_duckdb(spark, vals):
    """a28's oracle contract: mean/variance are exact decimal divisions
    (digit-identical to the HUGEINT replay on arbitrary inputs);
    skewness's sqrt chain matches to one ulp of the 6th decimal."""
    from ftm_columnstore_spark.operators.sketches import (
        moments_sketch,
        moments_stats,
    )

    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = moments_stats(moments_sketch(df, "x")).collect()[0]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": pd.Series(vals, dtype="int64")}))
    want = con.sql(
        """
        WITH s AS (
          SELECT count(*)::HUGEINT AS m0, sum(x::HUGEINT) AS m1,
                 sum(x::HUGEINT * x) AS m2,
                 sum(x::HUGEINT * x * x) AS m3
          FROM t)
        SELECT m0::BIGINT,
               (CASE WHEN m1 >= 0
                 THEN ((m1 * 2000000 + m0) // (2 * m0))
                 ELSE -(((-m1) * 2000000 + m0) // (2 * m0))
                END)::DOUBLE / 1000000.0,
               (((m0 * m2 - m1 * m1) * 2000000 + m0 * m0)
                // (2 * m0 * m0))::DOUBLE / 1000000.0,
               CASE WHEN (m0 * m2 - m1 * m1) > 0 THEN
                 round((m0 * m0 * m3 - 3 * m0 * m1 * m2
                        + 2 * m1 * m1 * m1)::DOUBLE
                       / ((m0 * m0 * m0)::DOUBLE
                          * sqrt((m0 * m2 - m1 * m1)::DOUBLE
                                 / (m0 * m0)::DOUBLE)
                          * sqrt((m0 * m2 - m1 * m1)::DOUBLE
                                 / (m0 * m0)::DOUBLE)
                          * sqrt((m0 * m2 - m1 * m1)::DOUBLE
                                 / (m0 * m0)::DOUBLE)), 6)
               END
        FROM s
        """
    ).fetchall()[0]
    assert got["m0"] == want[0]

    def assert_exact_decimal(got_v, want_v):
        # the 6-dp DECIMAL is exactly determined on both sides (integer
        # half-up rounding); the DOUBLE output column can only carry it
        # bit-exactly while scaled |value|*1e6 fits the 53-bit mantissa
        # (|v| < ~9.0e9). Above that, Spark's decimal->double cast is
        # correctly rounded but the oracle's k::DOUBLE/1e6 replay
        # double-rounds — allow the few-ulp representation gap there.
        if abs(want_v) < 9.0e9:
            assert got_v == want_v
        else:
            assert abs(got_v - want_v) <= 4 * np.spacing(abs(want_v))

    assert_exact_decimal(got["mean"], want[1])
    assert_exact_decimal(got["variance"], want[2])
    if want[3] is None:
        assert got["skewness"] is None
    else:
        # skewness carries a sqrt — the double chain is op-order
        # identical on both sides, but 6-dp rounding of a double that
        # lands on a representation boundary may differ by one ulp of
        # the 6th decimal across engines (the r6 variance find, now
        # fixed for mean/variance via exact decimal division; sqrt has
        # no exact path)
        assert got["skewness"] == pytest.approx(want[3], abs=2e-6)


@SETTINGS
@given(texts=corpus)
def test_char_entropy_match_duckdb(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    from ftm_columnstore_spark.operators.text import char_entropy

    got = char_entropy(df).toPandas()
    want = _oracle(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        entry.oracle_sql()["t41_char_entropy"],
    )
    _assert_same(got, want)


@SETTINGS
@given(texts=corpus)
def test_idf_rarity_match_duckdb(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    from ftm_columnstore_spark.operators.text import idf_rarity

    got = idf_rarity(df).toPandas()
    want = _oracle(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        entry.oracle_sql()["t39_idf_rarity"],
    )
    _assert_same(got, want)


@SETTINGS
@given(texts=corpus)
def test_pmi_collocations_match_duckdb(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    from ftm_columnstore_spark.operators.text import pmi_collocations

    got = pmi_collocations(df, min_count=3, top_n=25).toPandas()
    want = _oracle(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        entry.oracle_sql()["t38_pmi_collocations"],
    )
    _assert_same(got, want)
