"""Text primitives + document analysis (SURVEY §2.9; north-star text ops)."""

import pytest
from pyspark.sql import functions as F

from ftm_columnstore_spark.functions.text import (
    clean_tokens_col,
    shingles_col,
    word_tokens_col,
)
from ftm_columnstore_spark.operators.text import analyze_documents


def docs(spark):
    return spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog near the river bank"),
            (2, "Der schnelle braune Fuchs springt über den faulen Hund und das ist gut"),
            (3, "x"),
            (4, "one two three"),
        ],
        ["doc_id", "text"],
    )


def test_word_tokens(spark):
    row = docs(spark).select(word_tokens_col("text").alias("t")).collect()[0]
    assert row["t"][:3] == ["the", "quick", "brown"]


def test_clean_tokens_sorted_distinct(spark):
    row = (
        docs(spark)
        .filter(F.col("doc_id") == 1)
        .select(clean_tokens_col("text").alias("t"))
        .collect()[0]
    )
    assert row["t"] == sorted(set(row["t"]))
    assert row["t"].count("the") == 1


def test_shingles(spark):
    rows = docs(spark).select("doc_id", shingles_col("text", 5).alias("s")).collect()
    by_id = {r["doc_id"]: r["s"] for r in rows}
    assert by_id[1][0] == "the quick brown fox jumps"
    # short doc → single whole-doc shingle
    assert by_id[4] == ["one two three"]
    assert by_id[3] == ["x"]


def test_analyze_documents(spark):
    out = {r["doc_id"]: r for r in analyze_documents(docs(spark)).collect()}
    assert out[1]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "de"
    assert out[1]["n_tokens"] == 13
    assert 0.0 <= out[3]["quality"] <= 0.2
    assert out[1]["quality"] > out[3]["quality"]
    assert isinstance(out[1]["fingerprint"], int)


def test_repetition_stats(spark):
    from ftm_columnstore_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            # "a b c" ×3 → grams: ababab... tokens a b c a b c a b c:
            # 7 trigrams, distinct {abc, bca, cab} = 3, top (abc) = 3
            (1, "a b c a b c a b c"),
            (2, "all distinct words here now"),  # 3 grams, all distinct
            (3, "two words"),                    # < 3 tokens → no row
        ],
        ["doc_id", "text"],
    )
    got = {
        r.id: (r.n_grams, r.n_distinct, r.top_count)
        for r in repetition_stats(df, ngram_n=3).collect()
    }
    assert got == {1: (7, 3, 3), 2: (3, 3, 1)}


def test_bigram_lm_scores(spark):
    import math

    from ftm_columnstore_spark.operators.text import bigram_lm_scores

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # typical: bigrams (a,b)x3 (b,a)x2
            (2, "a b"),              # one common bigram
            (3, "x q"),              # rare bigram → high bits
            (4, "solo"),             # 1 token → no bigrams, excluded
        ],
        ["doc_id", "text"],
    )
    got = {r.id: (r.n_bigrams, r.bits_per_bigram)
           for r in bigram_lm_scores(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1][0] == 5 and got[2][0] == 1 and got[3][0] == 1
    # the rare (x,q) bigram must cost more bits than the common (a,b)
    assert got[3][1] > got[2][1]
    # hand-checked: V=5 tokens {a,b,x,q,solo}; c2(a,b)=4, c1(a)=4 →
    # P(b|a) = (4+.5)/(4+.5·5) = 4.5/6.5
    assert math.isclose(got[2][1], -math.log2(4.5 / 6.5), rel_tol=1e-6)


def test_bigram_scoring_broadcasts_count_relations(spark):
    """Scale-shape pin: both scoring joins carry an explicit broadcast
    hint on the vocabulary-bounded count relations — Catalyst's size
    estimate downstream of the bigram explode once inverted the build
    side and broadcast the corpus-sized stream (measured 119s vs 13s
    on a 27M-bigram corpus)."""
    from ftm_columnstore_spark.operators.text import bigram_lm_scores

    df = spark.createDataFrame([(1, "a b c"), (2, "a b")], ["doc_id", "text"])
    plan = bigram_lm_scores(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("strategy=broadcast") == 2, plan


def test_tfidf_top_terms(spark):
    from ftm_columnstore_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "spark spark spark common"),
            (2, "duck duck common"),
            (3, "common only words"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(df, top=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append((r.rank, r.term))
    # each doc's rank-1 term is its distinctive repeated word where present
    assert sorted(by_doc[1])[0][1] == "spark"
    assert sorted(by_doc[2])[0][1] == "duck"
    assert all(len(v) == 2 for v in by_doc.values())


def test_pii_stats(spark):
    from ftm_columnstore_spark.operators.text import pii_stats

    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@corp.example.org or 192.168.0.1"),
            (2, "card 4111111111111111 twice 4111111111111111"),
            (3, "nothing sensitive here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in pii_stats(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_ipv4"] == 1
    assert "[EMAIL]" in out[1]["redacted"] and "[IPV4]" in out[1]["redacted"]
    assert "jane.doe" not in out[1]["redacted"]
    assert out[2]["n_cards"] == 2
    assert out[2]["redacted"].count("[CARD]") == 2
    assert out[3]["n_emails"] == out[3]["n_ipv4"] == out[3]["n_cards"] == 0
    assert out[4]["redacted"] is None


def _md5_60bit(gram: str) -> int:
    import hashlib

    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def test_winnow_fingerprints_guarantee_and_portability(spark):
    """MOSS guarantee: a shared token run >= window + k - 1 (here 7)
    produces >= 1 shared fingerprint; fps are the portable md5-60bit
    gram hashes."""
    from ftm_columnstore_spark.operators.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    df = spark.createDataFrame(
        [
            (1, f"intro words here {shared} tail one"),
            (2, f"{shared} completely different continuation text now"),
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(df, k=4, window=4).collect()
    fps = {}
    for r in out:
        fps.setdefault(r.id, set()).add(r.fp)
    assert fps[1] & fps[2], "overlapping run must share a fingerprint"
    # every fp is the md5-60bit hash of SOME 4-gram of that document
    toks1 = "intro words here alpha beta gamma delta epsilon zeta eta tail one".split()
    grams1 = {
        _md5_60bit(" ".join(toks1[i : i + 4])) for i in range(len(toks1) - 3)
    }
    assert fps[1] <= grams1


def test_winnow_fingerprints_short_docs(spark):
    from ftm_columnstore_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        [
            (1, "just three tokens"),  # < k → no grams → no rows
            (2, "exactly four tokens here"),  # 1 gram < window → its min
            (3, "five tokens are right here"),  # 2 grams < window → 1 fp
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(df, k=4, window=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, set()).add(r.fp)
    assert 1 not in by_id
    assert by_id[2] == {_md5_60bit("exactly four tokens here")}
    g1 = _md5_60bit("five tokens are right")
    g2 = _md5_60bit("tokens are right here")
    assert by_id[3] == {min(g1, g2)}


def test_winnow_overlap_pairs_and_max_df(spark):
    from ftm_columnstore_spark.operators.text import winnow_overlap_pairs

    boiler = "this boilerplate header repeats on every single page always"
    unique = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2: "alpha beta gamma delta epsilon zeta eta theta lambda mu",
        3: "totally unrelated words describing some other topic entirely now",
    }
    rows = [(i, f"{boiler} {t}") for i, t in unique.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.left_id, r.right_id): r.n_shared
        for r in winnow_overlap_pairs(df, min_shared=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    # drop fingerprints shared by >2 docs → boilerplate-only pairs vanish
    capped = {
        (r.left_id, r.right_id)
        for r in winnow_overlap_pairs(df, min_shared=2, max_df=2).collect()
    }
    assert (1, 3) not in capped and (2, 3) not in capped
    assert (1, 2) in capped


def test_winnow_validates_params(spark):
    import pytest as _pytest

    from ftm_columnstore_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with _pytest.raises(ValueError):
        winnow_fingerprints(df, window=0)


def test_quality_gate_rules(spark):
    from ftm_columnstore_spark.operators.text import quality_gate

    good = "the quick brown fox jumps over the lazy dog and keeps running for a while longer today"
    df = spark.createDataFrame(
        [
            (1, good),
            (2, "the and of"),                      # too few tokens
            (3, "zz qq " * 10),                     # no stopwords, short words
            (4, "!!! ??? ### $$$ %%% the and is"),  # low alnum ratio
            (5, None),                              # null text → no row
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in
           quality_gate(df, min_tokens=10, min_stopwords=2,
                        min_mean_word_len=3.0, min_alnum_ratio=0.6).collect()}
    assert out[1].keep
    assert not out[2].keep and not out[3].keep and not out[4].keep
    assert 5 not in out
    assert out[1].n_stopwords >= 2 and out[2].n_tokens == 3


def test_quality_gate_repetition_rule(spark):
    from ftm_columnstore_spark.operators.text import quality_gate

    loopy = "spam ham eggs " * 20 + "the and is that with for was"
    clean = ("the quick brown fox jumps over the lazy dog and then walks "
             "slowly back home while evening falls quietly around town")
    df = spark.createDataFrame(
        [(1, clean), (2, loopy)], "doc_id long, text string"
    )
    out = {r.id: r for r in
           quality_gate(df, min_tokens=10, min_stopwords=2,
                        max_dup_ngram_frac=0.3).collect()}
    assert out[1].keep and out[1].dup_frac < 0.3
    assert not out[2].keep and out[2].dup_frac > 0.3
    # a 2-token doc has no 3-grams: dup_frac coalesces to 0
    short = spark.createDataFrame([(9, "the and")], "doc_id long, text string")
    row = quality_gate(short, min_tokens=1, min_stopwords=1,
                       max_dup_ngram_frac=0.3).collect()[0]
    assert row.dup_frac == 0.0 and row.keep


def test_perplexity_buckets(spark):
    from ftm_columnstore_spark.operators.text import (
        bigram_lm_scores,
        perplexity_buckets,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat again"),
            (2, "the cat sat on the mat"),
            (3, "zebra quark flux nebula prism vortex"),  # all-rare bigrams
        ],
        ["doc_id", "text"],
    )
    scores = {
        r["id"]: r["bits_per_bigram"]
        for r in bigram_lm_scores(df).collect()
    }
    # cutoffs straddling the observed scores -> all three buckets occur
    vals = sorted(scores.values())
    lo = (vals[0] + vals[1]) / 2
    hi = (vals[1] + vals[2]) / 2
    out = {
        r["id"]: r for r in perplexity_buckets(df, cutoffs=(lo, hi)).collect()
    }
    by_bucket = {r["bucket"]: r["id"] for r in out.values()}
    assert set(by_bucket) == {"head", "middle", "tail"}
    # the all-rare-bigram doc is the least fluent -> tail
    assert by_bucket["tail"] == 3
    assert out[1]["bits_per_bigram"] == scores[1]  # scores pass through

    with pytest.raises(ValueError):
        perplexity_buckets(df, cutoffs=(2.0, 1.0))


def test_chunk_documents(spark):
    from ftm_columnstore_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, "")], ["doc_id", "text"]
    )
    out = chunk_documents(df, size=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    # doc 1: stride 3, last start = ceil((10-4)/3)=2 -> starts 0,3,6
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_no"])
    assert [r["chunk_no"] for r in c1] == [0, 1, 2]
    assert c1[0]["text"] == "w0 w1 w2 w3"
    assert c1[1]["text"] == "w3 w4 w5 w6"
    assert c1[2]["text"] == "w6 w7 w8 w9"
    assert all(r["n_chunk_tokens"] == 4 for r in c1)
    # short doc -> one whole-document chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["text"] == "a b c"
    assert by_doc[2][0]["n_chunk_tokens"] == 3
    # empty doc -> no chunks
    assert 3 not in by_doc

    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, size=0)


def test_train_score_bigram_lm_split(spark):
    """Train/score decoupling: scoring the training corpus reproduces
    bigram_lm_scores exactly; unseen bigrams cost the smoothed floor."""
    import math

    from ftm_columnstore_spark.operators.text import (
        bigram_lm_scores,
        score_with_bigram_lm,
        train_bigram_lm,
    )

    ref = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c")], ["doc_id", "text"]
    )
    lm = train_bigram_lm(ref)
    joint = {r.id: r.bits_per_bigram for r in bigram_lm_scores(ref).collect()}
    split = {
        r.id: r.bits_per_bigram for r in score_with_bigram_lm(ref, lm).collect()
    }
    assert joint == split

    # out-of-domain batch: unseen context 'z' -> P = k/(kV) = 1/V, V=3
    batch = spark.createDataFrame([(9, "z q")], ["doc_id", "text"])
    got = score_with_bigram_lm(batch, lm).collect()[0]
    assert got["n_bigrams"] == 1
    assert math.isclose(
        got["bits_per_bigram"], math.log2(3), rel_tol=1e-6
    )


# --- Naive-Bayes quality classifier ------------------------------------------


def _nb_py(good_texts, bad_texts, score_texts, alpha=1.0):
    import math as _math
    import re as _re

    tok = lambda t: [x for x in _re.split(r"[^a-z0-9]+", t.lower()) if x]
    cg, cb = {}, {}
    for t in good_texts:
        for w in tok(t):
            cg[w] = cg.get(w, 0) + 1
    for t in bad_texts:
        for w in tok(t):
            cb[w] = cb.get(w, 0) + 1
    vocab = set(cg) | set(cb)
    v = max(len(vocab), 1)
    ng, nb = sum(cg.values()), sum(cb.values())
    wts = {
        w: _math.log((cg.get(w, 0) + alpha) / (ng + alpha * v))
        - _math.log((cb.get(w, 0) + alpha) / (nb + alpha * v))
        for w in vocab
    }
    out = {}
    for i, t in enumerate(score_texts):
        ws = [wts[w] for w in tok(t) if w in wts]
        if ws:
            out[i] = (len(ws), round(sum(ws) / len(ws), 6))
    return out


def test_nb_classifier_matches_python_replay(spark):
    from ftm_columnstore_spark.operators.text import (
        score_quality_classifier,
        train_quality_classifier,
    )

    good = ["the quick brown fox", "a quick brown dog", "the lazy fox"]
    bad = ["zzz spam spam buy now", "buy zzz now spam", "lazy spam"]
    score = ["quick fox runs", "buy spam now", "the dog and the fox"]
    gdf = spark.createDataFrame([(t,) for t in good], ["text"])
    bdf = spark.createDataFrame([(t,) for t in bad], ["text"])
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], ["doc_id", "text"]
    )
    w = train_quality_classifier(gdf, bdf)
    got = {
        r["id"]: (r["n_scored_tokens"], r["nb_score"])
        for r in score_quality_classifier(sdf, w).collect()
    }
    assert got == _nb_py(good, bad, score)


def test_nb_classifier_separates_corpora(spark):
    """Good-like text must score positive, bad-like negative."""
    from ftm_columnstore_spark.operators.text import (
        score_quality_classifier,
        train_quality_classifier,
    )

    good = ["clean prose about science and history"] * 5
    bad = ["win cash prize click here winner"] * 5
    gdf = spark.createDataFrame([(t,) for t in good], ["text"])
    bdf = spark.createDataFrame([(t,) for t in bad], ["text"])
    sdf = spark.createDataFrame(
        [(0, "an essay about history and science"),
         (1, "click here to win a cash prize")],
        ["doc_id", "text"],
    )
    w = train_quality_classifier(gdf, bdf)
    got = {
        r["id"]: r["nb_score"]
        for r in score_quality_classifier(sdf, w).collect()
    }
    assert got[0] > 0 > got[1]


def test_nb_classifier_empty_corpus_contract(spark):
    """Empty training halves yield a defined (empty) model, not ln(0) —
    the t20 lesson applied up front."""
    from ftm_columnstore_spark.operators.text import (
        score_quality_classifier,
        train_quality_classifier,
    )

    empty = spark.createDataFrame([], "text string")
    bdf = spark.createDataFrame([("spam spam eggs",)], ["text"])
    sdf = spark.createDataFrame([(0, "spam spam")], ["doc_id", "text"])
    w = train_quality_classifier(empty, bdf)
    rows = score_quality_classifier(sdf, w).collect()
    # defined, finite scores (no ln(0)); the over-represented bad token
    # scores negative against the empty-good uniform model
    assert len(rows) == 1 and rows[0]["nb_score"] < 0
    w2 = train_quality_classifier(empty, empty)
    assert score_quality_classifier(sdf, w2).collect() == []


# --- C4 line filter ----------------------------------------------------------


def test_c4_line_filter_rules(spark):
    from ftm_columnstore_spark.operators.text import c4_line_filter

    docs = spark.createDataFrame(
        [
            (1, "This is a good sentence.\nshort.\nEnable JavaScript to view.\n"
                "Another proper line stays here!\nno terminal punctuation"),
            (2, "   \n\n"),
            (3, "One two three four."),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["id"]: (r["n_lines"], r["n_kept"], r["text"])
        for r in c4_line_filter(docs, min_words=3).collect()
    }
    assert got[1] == (
        5,
        2,
        "This is a good sentence.\nAnother proper line stays here!",
    )
    assert got[2] == (0, 0, "")
    assert got[3] == (1, 1, "One two three four.")


def test_c4_line_filter_toggles(spark):
    from ftm_columnstore_spark.operators.text import c4_line_filter

    docs = spark.createDataFrame([(1, "one two\nthree four.")], ["doc_id", "text"])
    all_kept = c4_line_filter(
        docs, min_words=0, require_terminal=False, blocklist=()
    ).collect()[0]
    assert all_kept["n_kept"] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_words"):
        c4_line_filter(docs, min_words=-1)


def test_normalize_text_forms(spark):
    from ftm_columnstore_spark.operators.text import normalize_text

    composed = "café"              # é precomposed
    decomposed = "café"           # e + combining acute
    wide = "Ｈｉ"               # fullwidth "Hi"
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, wide), (4, None)],
        ["doc_id", "text"],
    )
    nfc = {r["doc_id"]: r["text"] for r in normalize_text(df, form="NFC").collect()}
    assert nfc[1] == composed and nfc[2] == composed and nfc[4] is None
    assert nfc[3] == wide  # NFC keeps compatibility variants
    nfkc = {r["doc_id"]: r["text"] for r in normalize_text(df, form="NFKC").collect()}
    assert nfkc[3] == "Hi"  # NFKC folds fullwidth forms
    import pytest as _pytest

    with _pytest.raises(ValueError, match="normalization form"):
        normalize_text(df, form="NFX")


def test_normalize_text_nfc_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    from ftm_columnstore_spark.operators.text import normalize_text

    texts = ["café au lait", "naïve", "plain ascii.", "Å unit"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["text"]
        for r in normalize_text(df, form="NFC").collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    oracle = dict(
        con.execute("SELECT doc_id, nfc_normalize(text) FROM t").fetchall()
    )
    assert got == oracle


def test_zipf_alpha_golden(spark):
    """Hand-computed Hill estimator: frequencies 8,4,2 (top_n=3),
    f_min=2 -> alpha = 1 + 3 / (ln4 + ln2 + ln1). Per-term rounding to
    12 dp then a decimal sum keeps the value engine- and
    partition-order-exact."""
    import math

    from ftm_columnstore_spark.operators.text import zipf_alpha

    text = " ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"])
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = zipf_alpha(df, top_n=3).collect()[0]
    s = round(math.log(4.0), 12) + round(math.log(2.0), 12) + 0.0
    assert row["n_ranked"] == 3 and row["f_min"] == 2
    assert row["alpha"] == round(1.0 + 3.0 / s, 6)


def test_zipf_alpha_uniform_is_null(spark):
    """All ranked frequencies equal -> denominator 0 -> alpha NULL
    (documented), and top_n guard raises."""
    from ftm_columnstore_spark.operators.text import zipf_alpha

    df = spark.createDataFrame([(1, "x y z x y z")], ["doc_id", "text"])
    row = zipf_alpha(df, top_n=3).collect()[0]
    assert row["alpha"] is None and row["f_min"] == 2
    with pytest.raises(ValueError, match="top_n"):
        zipf_alpha(df, top_n=1)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    freqs=st.lists(
        st.integers(min_value=1, max_value=50), min_size=2, max_size=12
    ),
    top_n=st.integers(min_value=2, max_value=8),
)
def test_zipf_alpha_matches_python(spark, freqs, top_n):
    """Property parity vs a pure-Python Hill estimator replay (same
    top-n total order, same per-term 12 dp rounding, same decimal
    sum) on arbitrary frequency profiles."""
    import math

    from ftm_columnstore_spark.operators.text import zipf_alpha

    words = [f"w{i:02d}" for i in range(len(freqs))]
    text = " ".join(
        w for w, f in zip(words, freqs) for _ in range(f)
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = zipf_alpha(df, top_n=top_n).collect()[0]

    ranked = sorted(zip(freqs, words), key=lambda t: (-t[0], t[1]))[:top_n]
    fmin = min(f for f, _ in ranked)
    s = sum(round(math.log(f / fmin), 12) for f, _ in ranked)
    assert row["n_ranked"] == len(ranked) and row["f_min"] == fmin
    if s == 0:
        assert row["alpha"] is None
    else:
        assert row["alpha"] == round(1.0 + len(ranked) / s, 6)


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------


def test_rake_keywords_hand_computed(spark):
    from ftm_columnstore_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "slow table scan and the fast hash join beat a slow table")],
        "doc_id long, text string",
    )
    rows = rake_keywords(df, ["and", "the", "a"], top_k=2).collect()
    got = [(r["phrase"], r["score"], r["n_words"]) for r in rows]
    # degrees: slow/table 5 (phrases of len 3 and 2), scan 3,
    # fast/hash/join/beat 4; freqs: slow/table 2, rest 1
    # scores: "fast hash join beat" = 4*4 = 16,
    #         "slow table scan" = 2.5 + 2.5 + 3 = 8, "slow table" = 5
    assert got == [
        ("fast hash join beat", 16.0, 4),
        ("slow table scan", 8.0, 3),
    ]


def test_rake_keywords_stopword_only_and_validation(spark):
    import pytest

    from ftm_columnstore_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "the the a"), (2, None), (3, "alpha beta")],
        "doc_id long, text string",
    )
    rows = rake_keywords(df, ["the", "a"], top_k=1).collect()
    # doc 1 has no non-stopword tokens, doc 2 no text -> only doc 3
    assert [(r["id"], r["phrase"]) for r in rows] == [(3, "alpha beta")]
    with pytest.raises(ValueError, match="stopwords"):
        rake_keywords(df, [])
    with pytest.raises(ValueError, match="top_k"):
        rake_keywords(df, ["the"], top_k=0)


def test_rake_arrow_matches_relational(spark):
    """The Arrow scale path and the relational cross-engine spec must
    agree EXACTLY (same phrases, same 6-dp scores, same top-k cut) —
    the BPE fast-path precedent: the fast path is pinned to the
    executable spec on corpora with ties, repeats and stopword runs."""
    from ftm_columnstore_spark.operators.text import rake_keywords

    docs = [
        (1, "slow table scan and the fast hash join beat a slow table"),
        (2, "the the a"),
        (3, "alpha beta alpha the alpha beta"),
        (4, None),
        (5, "x"),
        (6, "a b c a b c a b c"),  # tie-heavy: identical phrases repeat
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for k in (1, 2, 5):
        arrow = sorted(
            (r["id"], r["phrase"], r["score"], r["n_words"])
            for r in rake_keywords(
                df, ["and", "the", "a"], top_k=k, use_arrow=True
            ).collect()
        )
        rel = sorted(
            (r["id"], r["phrase"], r["score"], r["n_words"])
            for r in rake_keywords(
                df, ["and", "the", "a"], top_k=k, use_arrow=False
            ).collect()
        )
        assert arrow == rel, f"top_k={k}: {arrow} != {rel}"


def test_rake_arrow_matches_relational_testdata(spark):
    from ftm_columnstore_spark.operators.text import rake_keywords

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    arrow = sorted(
        tuple(r)
        for r in rake_keywords(
            df, ["a", "the"], top_k=2, use_arrow=True
        ).collect()
    )
    rel = sorted(
        tuple(r)
        for r in rake_keywords(
            df, ["a", "the"], top_k=2, use_arrow=False
        ).collect()
    )
    assert arrow == rel


def test_vocab_divergence_hand_computed(spark):
    import math

    from ftm_columnstore_spark.operators.text import vocab_divergence

    a = spark.createDataFrame(
        [(1, "x x y")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "y z")], "doc_id long, text string"
    )
    rows = vocab_divergence(a, b, top_n=10, alpha=1.0).collect()
    got = {r["token"]: (r["cnt_a"], r["cnt_b"], r["contrib"]) for r in rows}
    # V=3, N_a=3 (x x y), N_b=2 (y z): p_t=(cnt_a+1)/6, q_t=(cnt_b+1)/5
    def contrib(ca, cb):
        p = (ca + 1.0) / (3 + 3.0)
        q = (cb + 1.0) / (2 + 3.0)
        return round(p * math.log(p / q) + q * math.log(q / p), 12)

    assert got["x"] == (2, 0, contrib(2, 0))
    assert got["y"] == (1, 1, contrib(1, 1))
    assert got["z"] == (0, 1, contrib(0, 1))
    # identical corpora diverge nowhere
    same = vocab_divergence(a, a, top_n=10).collect()
    assert all(r["contrib"] == 0.0 for r in same)


def test_vocab_divergence_validation(spark):
    import pytest

    from ftm_columnstore_spark.operators.text import vocab_divergence

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="top_n"):
        vocab_divergence(df, df, top_n=0)
    with pytest.raises(ValueError, match="alpha"):
        vocab_divergence(df, df, alpha=0.0)


def test_ngram_novelty_hand_computed(spark):
    from ftm_columnstore_spark.operators.text import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c d"),       # grams: "a b c", "b c d"
            (2, "a b c x"),       # grams: "a b c", "b c x"
            (3, "z z z q q"),     # grams: "z z z", "z z q", "z q q"
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(df, n=3).collect()
    }
    # "a b c" is shared (df=2); everything else unique
    assert got == {
        1: (2, 1, 0.5),
        2: (2, 1, 0.5),
        3: (3, 3, 1.0),
    }


def test_pmi_collocations_hand_computed(spark):
    import math

    from ftm_columnstore_spark.operators.text import pmi_collocations

    # corpus: "a b a b" and "a b c" -> bigrams: (a,b)x3, (b,a)x1, (b,c)x1
    # unigrams: a=3, b=3, c=1; N_uni=7; N_big = 5 = the UNFILTERED
    # whole-corpus bigram total (min_count prunes reported pairs, not
    # the Church & Hanks denominator)
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    rows = pmi_collocations(df, min_count=2, top_n=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["cnt"]) == ("a", "b", 3)
    assert r["pmi"] == round(math.log(3 * 49 / (5 * 3 * 3)), 12)


def test_pmi_collocations_min_count_and_order(spark):
    from ftm_columnstore_spark.operators.text import pmi_collocations

    df = spark.createDataFrame(
        [(1, "x y x y q r"), (2, "q r s t")], "doc_id long, text string"
    )
    rows = pmi_collocations(df, min_count=2, top_n=10).collect()
    got = [(r["w1"], r["w2"], r["cnt"]) for r in rows]
    # surviving pairs: (x,y) cnt=2, (q,r) cnt=2; rarer marginals rank higher
    assert set(got) == {("x", "y", 2), ("q", "r", 2)}
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_pmi_collocations_single_token_docs_ignored(spark):
    from ftm_columnstore_spark.operators.text import pmi_collocations

    df = spark.createDataFrame(
        [(1, "solo"), (2, None), (3, "a b"), (4, "a b")],
        "doc_id long, text string",
    )
    rows = pmi_collocations(df, min_count=2, top_n=5).collect()
    assert [(r["w1"], r["w2"], r["cnt"]) for r in rows] == [("a", "b", 2)]


def test_pmi_collocations_validation(spark):
    import pytest

    from ftm_columnstore_spark.operators.text import pmi_collocations

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(df, min_count=0)
    with pytest.raises(ValueError, match="top_n"):
        pmi_collocations(df, top_n=0)


def test_idf_rarity_hand_computed(spark):
    import math
    from decimal import Decimal

    from ftm_columnstore_spark.operators.text import idf_rarity

    # N=3 docs. df: a=3, b=2, z=1.
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b z z"), (3, "a")],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_tokens"], r["idf_rarity"])
        for r in idf_rarity(df).collect()
    }
    idf = {
        "a": Decimal(str(round(math.log(3 / 3), 12))),
        "b": Decimal(str(round(math.log(3 / 2), 12))),
        "z": Decimal(str(round(math.log(3 / 1), 12))),
    }

    def mean(toks):
        return round(float(sum(idf[t] for t in toks)) / len(toks), 6)

    assert got == {
        1: (2, mean("ab")),
        2: (4, mean("abzz")),
        3: (1, mean("a")),
    }


def test_idf_rarity_null_text_skipped(spark):
    from ftm_columnstore_spark.operators.text import idf_rarity

    df = spark.createDataFrame(
        [(1, "only doc"), (2, None)], "doc_id long, text string"
    )
    rows = idf_rarity(df).collect()
    # single non-null doc: every token has df=1=N -> idf 0
    assert [(r["id"], r["n_tokens"], r["idf_rarity"]) for r in rows] == [
        (1, 2, 0.0)
    ]


def test_char_entropy_hand_computed(spark):
    import math
    from decimal import Decimal

    from ftm_columnstore_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, None)],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_chars_counted"], r["entropy"])
        for r in char_entropy(df).collect()
    }

    def h(counts):
        n = sum(counts)
        s = sum(Decimal(str(round(-c * math.log(c), 12))) for c in counts)
        return round(round(math.log(n), 12) + float(s) / n, 6)

    assert got == {
        1: (4, h([4])),          # 0.0
        2: (4, h([2, 2])),       # ln 2
        3: (4, h([1, 1, 1, 1])), # ln 4
    }
    assert got[1][1] == 0.0
    assert abs(got[2][1] - math.log(2)) < 1e-6
    assert abs(got[3][1] - math.log(4)) < 1e-6


def test_char_entropy_orders_quality(spark):
    from ftm_columnstore_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r["entropy"] for r in char_entropy(df).collect()}
    assert got[2] == 0.0 < got[1]


def test_readability_hand_computed(spark):
    from ftm_columnstore_spark.operators.text import readability_scores

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),   # 6 words, 2 sentences
            (2, "zzz qqq"),                      # no vowels, no periods
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (
            r["n_words"], r["n_sentences"], r["n_syllables"], r["fk_grade"]
        )
        for r in readability_scores(df).collect()
    }
    assert set(got) == {1, 2}
    nw, ns, sy, fk = got[1]
    assert (nw, ns, sy) == (6, 2, 6)
    assert fk == round(0.39 * 3 + 11.8 * 1 - 15.59, 6)
    nw, ns, sy, fk = got[2]
    assert (nw, ns, sy) == (2, 1, 0)
    assert fk == round(0.39 * 2 + 0 - 15.59, 6)


def test_readability_monotone_in_syllable_density(spark):
    from ftm_columnstore_spark.operators.text import readability_scores

    df = spark.createDataFrame(
        [(1, "bit bat bet bot but."), (2, "onomatopoeia aficionado.")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["fk_grade"] for r in readability_scores(df).collect()}
    assert got[2] > got[1]


def test_fan_out_parallelizes_single_split_only(spark):
    """r08: fan_out raises a below-parallelism input to the slot count
    (so scan-side CPU parallelizes) and is a no-op at/above it — and
    never changes values, only partitioning."""
    from ftm_columnstore_spark.functions.text import fan_out

    target = spark.sparkContext.defaultParallelism
    one = spark.createDataFrame([(i,) for i in range(10)], "v int").coalesce(1)
    fanned = fan_out(one)
    assert fanned.rdd.getNumPartitions() == target
    assert sorted(r["v"] for r in fanned.collect()) == list(range(10))

    wide = spark.createDataFrame([(i,) for i in range(10)], "v int").repartition(
        target
    )
    assert fan_out(wide) is wide

    # r09: the scale gate — when the optimizer's size estimate already
    # guarantees >= slot-count splits (est >= parallelism × maxPartitionBytes),
    # fan_out returns the input without the df.rdd partition probe (no
    # physical planning / RDD conversion on the scale path). Simulated by
    # shrinking maxPartitionBytes so even a tiny relation trips the gate.
    # spark.range has REAL stats (8 bytes/row); a createDataFrame relation
    # (LogicalRDD) instead reports the unknown-stats sentinel and must
    # keep taking the exact probe (the `one`/`wide` cases above).
    ranged = spark.range(10).coalesce(1)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
        assert fan_out(ranged) is ranged  # single-split, but gate says scale
        assert fan_out(one).rdd.getNumPartitions() == target  # unknown stats
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
