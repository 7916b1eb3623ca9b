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

SETTINGS = settings(
    max_examples=5,
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
