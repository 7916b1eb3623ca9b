"""BM25 ranked retrieval (operators/retrieval.py).

Golden values are hand-computed from the BM25 formula on a
known-by-construction corpus; plan shape is asserted the same way the
other top-k operators pin TakeOrderedAndProject.
"""

from __future__ import annotations

import math

import pytest

from ftm_columnstore_spark.operators.retrieval import bm25_scores, bm25_topk

CORPUS = [
    (1, "spark shuffle join join join"),
    (2, "spark scan"),
    (3, "filter project sort"),
    (4, "join spark spark spark spark spark spark spark"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def _bm25(tf, dl, df, n, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_golden(docs):
    rows = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, ["join"]).collect()
    }
    # N=4 docs, dl = 5,2,3,8 -> avgdl = 4.5; df(join)=2
    avgdl = 18 / 4
    assert set(rows) == {1, 4}
    assert rows[1] == pytest.approx(
        round(_bm25(3, 5, 2, 4, avgdl), 6), abs=1e-6
    )
    assert rows[4] == pytest.approx(
        round(_bm25(1, 8, 2, 4, avgdl), 6), abs=1e-6
    )


def test_bm25_multi_term_sums_contributions(docs):
    single = {
        t: {r["id"]: r["score"] for r in bm25_scores(docs, [t]).collect()}
        for t in ("spark", "join")
    }
    both = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, ["spark", "join"]).collect()
    }
    for doc_id, score in both.items():
        expect = single["spark"].get(doc_id, 0.0) + single["join"].get(
            doc_id, 0.0
        )
        assert score == pytest.approx(expect, abs=2e-6)


def test_bm25_only_matching_docs(docs):
    ids = {r["id"] for r in bm25_scores(docs, ["filter"]).collect()}
    assert ids == {3}


def test_bm25_rare_term_beats_common_at_equal_tf(docs):
    # 'scan' (df=1) should out-score 'spark' (df=3) for the same tf/dl
    scores = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, ["scan", "filter"]).collect()
    }
    assert 2 in scores and 3 in scores


def test_bm25_topk_order_and_plan(docs):
    top = bm25_topk(docs, ["spark", "join"], top=2)
    rows = top.collect()
    assert len(rows) == 2
    assert rows[0]["score"] >= rows[1]["score"]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_empty_query_raises(docs):
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_bm25_ignores_nontoken_docs(spark):
    df = spark.createDataFrame(
        [(1, "join join"), (2, None), (3, "   ")], ["doc_id", "text"]
    )
    rows = bm25_scores(df, ["join"]).collect()
    # N counts only tokenizable docs (dl > 0): N=1, df=1
    assert {r["id"] for r in rows} == {1}
    expect = round(_bm25(2, 2, 1, 1, 2.0), 6)
    assert rows[0]["score"] == pytest.approx(expect, abs=1e-6)


def test_rrf_fuse_golden(spark):
    from ftm_columnstore_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["id", "rank"])
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], ["id", "rank"])
    got = {r["id"]: r["rrf"] for r in rrf_fuse([a, b], k0=60).collect()}
    assert got[1] == pytest.approx(round(1 / 61 + 1 / 62, 6), abs=1e-6)
    assert got[2] == pytest.approx(round(1 / 62, 6), abs=1e-6)
    assert got[3] == pytest.approx(round(1 / 63 + 1 / 61, 6), abs=1e-6)
    assert got[9] == pytest.approx(round(1 / 63, 6), abs=1e-6)


def test_rrf_fuse_topk_order(spark):
    from ftm_columnstore_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(i, i) for i in range(1, 8)], ["id", "rank"])
    b = spark.createDataFrame([(i, 8 - i) for i in range(1, 8)], ["id", "rank"])
    rows = rrf_fuse([a, b], k0=60, top=3).collect()
    assert len(rows) == 3
    # rrf(i) = 1/(60+i) + 1/(68-i) is symmetric around i=4 and maximal
    # at the extremes: ids 1 and 7 tie (tie broken by id asc), then 2
    assert [r["id"] for r in rows] == [1, 7, 2]


def test_with_rank_total_order(spark, docs):
    from ftm_columnstore_spark.operators.retrieval import bm25_topk, with_rank
    import pyspark.sql.functions as F

    top = bm25_topk(docs, ["spark", "join"], top=3)
    ranked = with_rank(top, F.col("score").desc(), F.col("id")).collect()
    assert [r["rank"] for r in ranked] == [1, 2, 3]
    scores = [r["score"] for r in ranked]
    assert scores == sorted(scores, reverse=True)


def test_rrf_empty_raises(spark):
    from ftm_columnstore_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_bm25_single_corpus_pass(docs):
    """Scale contract: the corpus token explode feeds ONE groupBy(id),
    materialized once (localCheckpoint) — the final plan reads the
    checkpointed per-doc relation on both consumer sides and contains
    NO corpus-wide explode of its own (without the checkpoint Catalyst
    inlined the tokenize lineage into both the corpus reduction and the
    scoring join — a measured double scan)."""
    import re

    from ftm_columnstore_spark.operators.retrieval import _doc_term_stats

    per_plan = (
        _doc_term_stats(docs, ["join", "spark"], "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert per_plan.count("Generate explode") == 1, per_plan
    assert len(re.findall(r"Exchange hashpartitioning", per_plan)) == 1

    plan = (
        bm25_scores(docs, ["spark", "join"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Generate explode") == 0, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan


# --- property parity vs a pure-Python reference BM25 ---------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta".split()),
            min_size=0,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    terms=st.lists(
        st.sampled_from("alpha beta gamma".split()),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_bm25_matches_reference(spark, texts, terms):
    """Engine scores equal an in-memory BM25 on arbitrary corpora."""
    docs_py = [(i, t) for i, t in enumerate(texts)]
    toks = {i: t.split() for i, t in docs_py if t.split()}
    n = len(toks)
    if n == 0:
        return
    avgdl = sum(len(v) for v in toks.values()) / n
    expect = {}
    for i, tk in toks.items():
        s = 0.0
        hit = False
        for t in sorted(set(terms)):
            tf = tk.count(t)
            if tf:
                hit = True
            df_t = sum(1 for v in toks.values() if t in v)
            s += _bm25(tf, len(tk), df_t, n, avgdl)
        if hit:
            expect[i] = round(s, 6)
    df = spark.createDataFrame(docs_py, ["doc_id", "text"])
    got = {
        r["id"]: r["score"] for r in bm25_scores(df, list(terms)).collect()
    }
    assert set(got) == set(expect)
    for i in expect:
        assert got[i] == pytest.approx(expect[i], abs=2e-6), (i, expect, got)


def test_bm25_multi_matches_single(spark, docs):
    """Each multi-query branch equals the standalone bm25_topk for the
    same bag — df/N/avgdl are corpus-global, so sharing the stats
    relation across queries changes nothing."""
    from ftm_columnstore_spark.operators.retrieval import bm25_topk_multi

    queries = {"a": ["join", "spark"], "b": ["scan"], "c": ["filter", "sort"]}
    multi = bm25_topk_multi(docs, queries, top=3).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r["query_id"], []).append((r["id"], r["score"]))
    for qid, terms in queries.items():
        solo = [
            (r["id"], r["score"])
            for r in bm25_topk(docs, terms, top=3).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(solo), qid


def test_bm25_multi_validation(spark, docs):
    from ftm_columnstore_spark.operators.retrieval import bm25_topk_multi

    with pytest.raises(ValueError):
        bm25_topk_multi(docs, {})
    with pytest.raises(ValueError):
        bm25_topk_multi(docs, {"q": []})


def test_bm25_max_terms_guard(docs):
    """Unbounded-width contract (house rule): each distinct term adds a
    conditional-count column to the one-pass aggregate, so the union
    width is bounded and the error names the chunking escape hatch."""
    from ftm_columnstore_spark.operators.retrieval import bm25_topk_multi

    many = [f"t{i}" for i in range(300)]
    with pytest.raises(ValueError, match="max_terms"):
        bm25_scores(docs, many)
    with pytest.raises(ValueError, match="(?i)chunk"):
        bm25_topk_multi(docs, {"q0": many[:150], "q1": many[150:]})
    # explicit opt-up accepts a consciously-raised width (modest here:
    # the score chain is a LEFT FOLD for oracle parity, so a 300-term
    # bag builds a 300-deep expression tree — hundreds of terms risk
    # JVM stack depth during analysis, which is exactly why the bound
    # exists and why huge bags should chunk rather than opt up)
    assert bm25_scores(docs, ["join"] + many[:40], max_terms=48).count() >= 0
    with pytest.raises(ValueError, match="max_terms"):
        bm25_scores(docs, ["join"] + many[:40], max_terms=40)


def test_with_rank_expected_max_rows(spark, docs):
    """Executable bounded-input contract: within the bound the ranking
    is unchanged; past it the single-partition sort is refused."""
    import pyspark.sql.functions as F

    from ftm_columnstore_spark.operators.retrieval import bm25_topk, with_rank

    top = bm25_topk(docs, ["spark", "join"], top=3)
    ranked = with_rank(
        top, F.col("score").desc(), F.col("id"), expected_max_rows=3
    ).collect()
    assert [r["rank"] for r in ranked] == [1, 2, 3]

    wide = spark.range(10).select(F.col("id"))
    with pytest.raises(ValueError, match="expected_max_rows"):
        with_rank(wide, F.col("id"), expected_max_rows=5)


# ---------------------------------------------------------------------------
# positional index + phrase match
# ---------------------------------------------------------------------------


def test_positional_index_positions(spark):
    from ftm_columnstore_spark.operators.retrieval import positional_index

    df = spark.createDataFrame(
        [(1, "Alpha beta GAMMA alpha")], "doc_id long, text string"
    )
    rows = sorted(
        (r["pos"], r["term"])
        for r in positional_index(df).collect()
    )
    assert rows == [(0, "alpha"), (1, "beta"), (2, "gamma"), (3, "alpha")]


def test_phrase_match_counts_and_positions(spark):
    from ftm_columnstore_spark.operators.retrieval import phrase_match

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox saw the quick brown dog"),
            (2, "quick brown"),
            (3, "brown quick"),
            (4, "the quick, brown fox"),  # punctuation splits but keeps order
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match(df, "quick brown").collect()
    }
    assert got == {1: (2, 1), 2: (1, 0), 4: (1, 1)}


def test_phrase_match_single_term_and_validation(spark):
    from ftm_columnstore_spark.operators.retrieval import (
        MAX_PHRASE_TERMS,
        phrase_match,
    )

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b")], "doc_id long, text string"
    )
    got = {
        r["id"]: r["n_matches"]
        for r in phrase_match(df, "a").collect()
    }
    assert got == {1: 2}
    import pytest

    with pytest.raises(ValueError, match="at least one token"):
        phrase_match(df, "   ")
    with pytest.raises(ValueError, match="MAX_PHRASE_TERMS"):
        phrase_match(df, ["w"] * (MAX_PHRASE_TERMS + 1))


def test_phrase_match_accepts_prebuilt_index(spark):
    from ftm_columnstore_spark.operators.retrieval import (
        phrase_match,
        positional_index,
    )

    df = spark.createDataFrame(
        [(1, "x y z x y")], "doc_id long, text string"
    )
    idx = positional_index(df)
    got = phrase_match(df, "x y", index=idx).collect()
    assert [(r["id"], r["n_matches"]) for r in got] == [(1, 2)]


def test_proximity_match_slop_semantics(spark):
    from ftm_columnstore_spark.operators.retrieval import proximity_match

    df = spark.createDataFrame(
        [
            (1, "hash big value"),        # gap 1 between hash and value
            (2, "hash value"),            # gap 0
            (3, "value hash"),            # wrong order
            (4, "hash x y z value"),      # gap 3 — beyond slop 2
            (5, "hash big value hash value"),  # two starts
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_matches"], r["first_pos"])
        for r in proximity_match(df, "hash value", max_slop=2).collect()
    }
    assert got == {1: (1, 0), 2: (1, 0), 5: (2, 0)}
    # slop 0 == exact phrase
    got0 = {
        r["id"]: r["n_matches"]
        for r in proximity_match(df, "hash value", max_slop=0).collect()
    }
    assert got0 == {2: 1, 5: 1}


def test_proximity_match_distinct_starts_not_paths(spark):
    from ftm_columnstore_spark.operators.retrieval import proximity_match

    # "a b b c": start a(0) reaches c via b(1) AND b(2) — still ONE match
    df = spark.createDataFrame(
        [(1, "a b b c")], "doc_id long, text string"
    )
    got = proximity_match(df, ["a", "b", "c"], max_slop=2).collect()
    assert [(r["id"], r["n_matches"]) for r in got] == [(1, 1)]


def test_proximity_match_validation(spark):
    import pytest

    from ftm_columnstore_spark.operators.retrieval import proximity_match

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_slop"):
        proximity_match(df, "a b", max_slop=-1)
    with pytest.raises(ValueError, match="at least one"):
        proximity_match(df, [])
