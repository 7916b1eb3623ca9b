"""Ranked text retrieval over document corpora — BM25 scoring.

The reference has no retrieval surface (its `search` filter is an ILIKE
substring scan, `ftm-columnstore` plans/query.py); this module adds the
ranked-retrieval pass an LLM-data pipeline needs for quality probes,
contamination triage, and RAG-style corpus slicing, expressed as plain
aggregations so Catalyst keeps the whole plan in whole-stage codegen.

Scale posture (100 TB): the corpus is scanned ONCE — per-document token
counts AND per-query-term term frequencies ride the same groupBy(id)
aggregation (query terms are a bounded literal set, so the tf columns
are conditional counts, not a second explode+shuffle). Document
frequencies and the corpus aggregates (N, avgdl) reduce that per-doc
relation, which is |docs| rows and 2+|q| integer columns — narrow. The
final top-k is a TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ftm_columnstore_spark.functions.text import word_tokens_col

__all__ = [
    "bm25_topk",
    "bm25_scores",
    "bm25_topk_multi",
    "with_rank",
    "rrf_fuse",
    "positional_index",
    "phrase_match",
    "proximity_match",
]

#: Widest union-of-terms the one-pass conditional-count design accepts.
#: Each distinct term adds one aggregate column to the groupBy(id) pass;
#: past a few hundred the Expand/codegen stage degrades (wholestage
#: fallback, constant-pool pressure) — the same unbounded-width class the
#: house rule bounds everywhere else (64k BPE vocab, 100k CC edges). The
#: score expression is additionally a LEFT-FOLD chain (fixed FP order is
#: the oracle-parity contract), so a huge bag also means a huge
#: expression-tree depth during analysis — chunk big bags across calls
#: rather than opting the bound up unboundedly (df/N/avgdl are
#: corpus-global, so per-query scores are unaffected by which chunk a
#: bag lands in).
DEFAULT_MAX_TERMS = 256


def _check_term_width(n_terms: int, max_terms: int) -> None:
    if n_terms > max_terms:
        raise ValueError(
            f"{n_terms} distinct query terms exceeds max_terms={max_terms}: "
            "each term becomes one conditional-count column in the "
            "single-pass groupBy(id) aggregate, and thousands of columns "
            "break whole-stage codegen. Chunk the query bags into batches "
            f"of <= {max_terms} distinct terms (per-query scores are "
            "identical — df/N/avgdl are corpus-global), or pass a larger "
            "max_terms if the width is a conscious choice."
        )


def _doc_term_stats(
    df: DataFrame, terms: list[str], text_col: str, id_col: str
) -> DataFrame:
    """(id, dl, tf_0..tf_{n-1}) in ONE pass: explode tokens, then a
    single groupBy(id) computing document length and one conditional
    count per query term. Docs whose text yields zero tokens drop out
    (dl = 0 ⇒ BM25 undefined and no term can match)."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens_col(text_col)).alias("term"),
    )
    aggs = [F.count(F.lit(1)).alias("dl")] + [
        F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    return tok.groupBy("id").agg(*aggs)


def _scored_stats_join(
    df: DataFrame, all_terms: list[str], text_col: str, id_col: str
) -> DataFrame:
    """Checkpointed per-doc stats cross-joined with the 1-row corpus
    reduction — the shared relation every BM25 scoring branch reads.

    localCheckpoint: BOTH consumers (the corpus reduction and the
    scoring branches) read the per-doc relation — without
    materialization Catalyst inlines the tokenize+aggregate lineage
    into each side and the corpus is scanned TWICE (caught by the
    plan-shape test). The checkpointed relation is |docs| rows x
    (2+|terms|) integers — noise next to the corpus at any scale."""
    per = _doc_term_stats(df, all_terms, text_col, id_col).localCheckpoint(
        eager=True
    )
    gaggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ] + [
        F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
        for i in range(len(all_terms))
    ]
    return per.crossJoin(F.broadcast(per.agg(*gaggs)))


def _score_and_match(
    idxs: list[int], k1: float, b: float
) -> tuple[Column, Column]:
    """(score, matched) expressions over _scored_stats_join columns for
    the term indices of one query bag — contributions summed in index
    (= sorted-term) order, so single- and multi-query paths are
    expression-identical by construction."""
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
    )

    def contrib(i: int) -> Column:
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
        )
        return idf * tf * F.lit(float(k1 + 1.0)) / (tf + norm)

    score: Column | None = None
    matched: Column | None = None
    for i in idxs:
        c = contrib(i)
        score = c if score is None else score + c
        m = F.col(f"tf_{i}") > 0
        matched = m if matched is None else (matched | m)
    assert score is not None and matched is not None
    return score, matched


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    max_terms: int = DEFAULT_MAX_TERMS,
) -> DataFrame:
    """BM25 (Robertson-Sparck Jones / Lucene idf form) of every matching
    document against a bag of query terms. Output: (id, score) for docs
    with at least one query-term occurrence; ``score`` rounded to 6 dp.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))

    Determinism: tf/dl/df/N are exact integers from one aggregation
    pass; avgdl = Σdl/N is one IEEE division; the per-document score
    sums the per-term contributions in FIXED literal order (an
    expression chain, not a float aggregation over rows), so the double
    is bit-stable across partitionings and engines.

    Scale: one corpus scan + one groupBy(id) shuffle (see module
    docstring); df/N/avgdl reduce the narrow per-doc relation and come
    back as a broadcast 1-row join — no second pass over the corpus.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    _check_term_width(len(terms), max_terms)
    j = _scored_stats_join(df, terms, text_col, id_col)
    score, matched = _score_and_match(list(range(len(terms))), k1, b)
    return (
        j.filter(matched)
        .select(F.col("id"), score.alias("__s"))
        .select("id", F.round("__s", 6).alias("score"))
    )


def bm25_topk_multi(
    df: DataFrame,
    queries: dict[str, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top: int = 10,
    max_terms: int = DEFAULT_MAX_TERMS,
) -> DataFrame:
    """Multi-query BM25 in ONE corpus pass — the retrieval counterpart
    of the PQ kNN join's one-scan design: the per-doc stats relation is
    built once over the UNION of all query bags (still one tokenize +
    one groupBy(id)), then each query scores as a cheap projection over
    the checkpointed relation with its own TakeOrderedAndProject top-k.
    Output: (query_id, id, score), per-query top-``top``.

    Per-query results are IDENTICAL to :func:`bm25_topk` with that bag
    (same fixed-order contribution sums; df/N/avgdl are corpus-global,
    not query-dependent) — pinned by test. Scale: corpus cost is paid
    once no matter how many queries; each branch reads |docs| narrow
    rows."""
    if not queries:
        raise ValueError("queries must be non-empty")
    empty = sorted(q for q, ts in queries.items() if not ts)
    if empty:
        raise ValueError(f"query bags must be non-empty: {empty}")
    all_terms = sorted({t for ts in queries.values() for t in ts})
    _check_term_width(len(all_terms), max_terms)
    term_idx = {t: i for i, t in enumerate(all_terms)}
    j = _scored_stats_join(df, all_terms, text_col, id_col)
    branches = []
    for qid in sorted(queries):
        idxs = [term_idx[t] for t in sorted(set(queries[qid]))]
        score, matched = _score_and_match(idxs, k1, b)
        branches.append(
            j.filter(matched)
            .select(
                F.lit(qid).alias("query_id"),
                F.col("id"),
                F.round(score, 6).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col("id"))
            .limit(int(top))
        )
    out = branches[0]
    for b_ in branches[1:]:
        out = out.unionByName(b_)
    return out


def with_rank(
    df: DataFrame, *order: Column, expected_max_rows: int | None = None
) -> DataFrame:
    """Attach a 1-based ``rank`` column by a total order. BOUNDED-INPUT
    CONTRACT: the window has no partition key, so this is a
    single-partition sort — only ever call it on an already-bounded
    relation (a top-k result, k rows), the same rule as the MMR
    re-ranker and collected codebooks. Unbounded ranking belongs to
    ``Window.partitionBy`` shapes (see w2) or top-k limits.

    ``expected_max_rows`` makes the contract executable: when set, the
    input is localCheckpointed (it is supposed to be ≤n rows — the
    materialization is the same one computation the ranking would have
    forced anyway, now reusable) and a free count() on the materialized
    relation raises ValueError if it exceeds the bound. Zero extra
    passes on the happy path; the top-k call sites (v16's ≤k-row fusion
    inputs) pass their k so a future unbounded caller fails loudly
    instead of single-partition-sorting a corpus."""
    from pyspark.sql import Window

    if expected_max_rows is not None:
        n = int(expected_max_rows)
        df = df.localCheckpoint(eager=True)
        probed = df.limit(n + 1).count()
        if probed > n:
            raise ValueError(
                f"with_rank input exceeds expected_max_rows={n}: the "
                "no-partition row_number window is a single-partition "
                "sort, safe only on already-bounded relations (top-k "
                "outputs). Bound the input first (limit / top-k) or use "
                "a Window.partitionBy ranking."
            )
    return df.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "id",
    k0: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack-Clarke-Buettcher'09) of N ranked
    lists: rrf(d) = Σ_i 1/(k0 + rank_i(d)), items absent from a list
    contribute 0 for it. The standard hybrid-retrieval combiner (BM25 ⊕
    dense ANN) — rank-based, so the systems' incomparable score scales
    never meet. Input DataFrames carry (id_col, rank); output
    (id, rrf) rounded to 6 dp, optionally top-``top`` by (rrf DESC, id).

    Each ranked list is bounded (top-k) by construction, so the fuse is
    a chain of full-outer joins over k-row relations — driver-trivial at
    any corpus scale; the heavy lifting happened inside the per-system
    top-k operators. Determinism: 1/(k0+rank) is one exact IEEE
    division on integers and the fusion sum runs in fixed list order."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    fused: DataFrame | None = None
    for i, r in enumerate(rankings):
        contrib = (
            F.lit(1.0)
            / (F.lit(float(k0)) + F.col("rank").cast("double"))
        ).alias(f"__c{i}")
        ri = r.select(F.col(id_col).alias("id"), contrib)
        fused = ri if fused is None else fused.join(ri, on="id", how="full_outer")
    score: Column = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(rankings)):
        score = score + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    out = fused.select("id", F.round(score, 6).alias("rrf"))
    if top is not None:
        out = out.orderBy(F.col("rrf").desc(), F.col("id")).limit(int(top))
    return out


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top: int = 10,
    max_terms: int = DEFAULT_MAX_TERMS,
) -> DataFrame:
    """Top-``top`` documents by BM25 (score desc, id asc — total order).
    The limit compiles to TakeOrderedAndProject: partial top-k per
    partition, k rows to the driver — no global sort at any scale."""
    scored = bm25_scores(df, query_terms, text_col, id_col, k1, b, max_terms)
    return scored.orderBy(F.col("score").desc(), F.col("id")).limit(top)


# ---------------------------------------------------------------------------
# positional index + exact phrase match
# ---------------------------------------------------------------------------

#: Longest phrase the chained-join matcher accepts: each extra term is
#: one more narrow join; past this the plan depth (and the analysis
#: cost) grows without retrieval benefit — split longer phrases into
#: overlapping windows and intersect doc ids instead.
MAX_PHRASE_TERMS = 16


def positional_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted index: one row per token OCCURRENCE with its
    0-based position — (id, pos, term). The classic IR artifact phrase
    and proximity queries run against (Manning, Raghavan & Schütze,
    "Introduction to Information Retrieval" §2.4); the reference's
    search is a substring ILIKE scan (ftm-columnstore plans/query.py),
    this is the indexed sibling.

    100 TB shape: a single posexplode projection — map-only, no
    shuffle; writers typically persist it partitioned/bucketed by term
    so phrase joins co-locate. Tokenization is the repo-wide
    word_tokens_col (lowercase alphanumeric runs)."""
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.posexplode(word_tokens_col(text_col)).alias("pos", "term"),
    )


def phrase_match(
    df: DataFrame,
    phrase: str | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Exact consecutive-phrase match via the positional index: doc ids
    containing the phrase's tokens at consecutive positions, with the
    match count and first match position per doc.

    Plan: filter the index to the phrase's terms (one narrow relation
    per term — predicate pushdown prunes a term-partitioned index to
    just those buckets), then chain equi-joins on (id, pos+i). The
    joined relation never exceeds the rarest term's postings list; at
    corpus scale that is the whole point of anchoring on positions
    instead of re-scanning text with a substring LIKE. Join order runs
    left-to-right; AQE broadcasts the small side per join at runtime
    (rare terms → tiny relations), so no manual rarest-first
    reordering is needed for correctness or, with AQE, for speed.

    Output: (id, n_matches, first_pos) — all integers, one row per
    matching doc."""
    terms = (
        [t for t in phrase.lower().split() if t]
        if isinstance(phrase, str)
        else [str(t).lower() for t in phrase]
    )
    if not terms:
        raise ValueError("phrase must contain at least one token")
    if len(terms) > MAX_PHRASE_TERMS:
        raise ValueError(
            f"phrase has {len(terms)} tokens > MAX_PHRASE_TERMS="
            f"{MAX_PHRASE_TERMS}: chain-join depth would grow without "
            "retrieval benefit. Split into overlapping sub-phrases and "
            "intersect the matched ids."
        )
    idx = (
        index
        if index is not None
        else positional_index(df, id_col=id_col, text_col=text_col)
    )
    # Materialize the phrase-term postings ONCE: without this each
    # per-term join side recomputes the whole index subtree (an
    # ad-hoc index = one corpus scan+explode PER TERM — the d14
    # rebuilt-relation lesson). The filtered relation is 3 narrow
    # integer/string columns bounded by the phrase terms' postings,
    # the smallest artifact in sight.
    postings = idx.where(F.col("term").isin(terms)).localCheckpoint(
        eager=True
    )
    matched = postings.where(F.col("term") == terms[0]).select(
        "id", F.col("pos").alias("start")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.where(F.col("term") == t).select(
            "id", (F.col("pos") - i).alias("start")
        )
        matched = matched.join(nxt, on=["id", "start"], how="inner")
    return matched.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("start").alias("first_pos"),
    )


def proximity_match(
    df: DataFrame,
    terms: list[str] | str,
    max_slop: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Ordered proximity search (the SLOP query — Manning+ IIR §2.4.2):
    docs containing ``terms`` in order with each consecutive gap at
    most ``max_slop`` intervening tokens. ``max_slop=0`` degenerates to
    exact phrase match; larger slops catch "hash ... value ... table"
    separated by modifiers.

    Same plan family as :func:`phrase_match` — the term-filtered
    postings are materialized once, then chained joins on the doc id
    carry a RANGE predicate per gap (prev_pos < pos ≤ prev_pos + 1 +
    max_slop). The joins stay keyed on id; the range is a residual
    filter, so the pair expansion per doc is bounded by the per-doc
    postings of the two terms — never cross-document. A start position
    may admit several completions; matches are counted as DISTINCT
    start positions (deterministic, order-free).

    Output: (id, n_matches, first_pos) — n_matches = distinct start
    positions that begin an in-order, slop-bounded chain."""
    tl = (
        [t for t in terms.lower().split() if t]
        if isinstance(terms, str)
        else [str(t).lower() for t in terms]
    )
    if not tl:
        raise ValueError("terms must contain at least one token")
    if len(tl) > MAX_PHRASE_TERMS:
        raise ValueError(
            f"{len(tl)} terms > MAX_PHRASE_TERMS={MAX_PHRASE_TERMS}: "
            "split the query and intersect matched ids."
        )
    if max_slop < 0:
        raise ValueError(f"max_slop must be >= 0, got {max_slop}")
    idx = (
        index
        if index is not None
        else positional_index(df, id_col=id_col, text_col=text_col)
    )
    postings = idx.where(F.col("term").isin(tl)).localCheckpoint(
        eager=True
    )
    cur = postings.where(F.col("term") == tl[0]).select(
        "id", F.col("pos").alias("start"), F.col("pos").alias("prev")
    )
    for t in tl[1:]:
        nxt = postings.where(F.col("term") == t).select(
            F.col("id").alias("__rid"), F.col("pos").alias("__p")
        )
        cur = (
            cur.join(
                nxt,
                (F.col("id") == F.col("__rid"))
                & (F.col("__p") > F.col("prev"))
                & (F.col("__p") <= F.col("prev") + 1 + max_slop),
            )
            .select("id", "start", F.col("__p").alias("prev"))
            # several mid-chain paths can reach the same (start, prev);
            # collapsing keeps the chain relation minimal and makes the
            # final distinct-start count correct by construction
            .distinct()
        )
    return cur.groupBy("id").agg(
        F.count_distinct(F.col("start")).alias("n_matches"),
        F.min("start").alias("first_pos"),
    )
