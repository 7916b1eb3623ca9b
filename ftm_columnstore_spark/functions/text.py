"""Text primitives — tokenization, shingles (SURVEY §2.9 X2/X7/X8; north-star
text-analysis extensions).

All pure-column expressions (whole-stage codegen, no Python in the hot
path). These are the building blocks for the documents-table operators in
``operators.text`` and the near-dup machinery in ``operators.dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: token pattern: runs of anything that isn't a lowercase letter or digit.
NON_ALNUM = "[^a-z0-9]+"


def word_tokens_col(col: Column | str) -> Column:
    """Lowercased alphanumeric tokens, empties dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), NON_ALNUM), lambda x: x != F.lit("")
    )


def clean_tokens_col(col: Column | str) -> Column:
    """Sorted distinct tokens — the set form used by fingerprints/jaccard."""
    return F.array_sort(F.array_distinct(word_tokens_col(col)))


def shingles_col(col: Column | str, k: int = 5) -> Column:
    """k-word shingles as space-joined strings (distinct).

    Documents shorter than k tokens yield a single whole-document shingle
    so they still participate in dedup.

    NOTE: expression-level shingling re-evaluates the tokenizer inside the
    ``transform`` lambda (HOF interiors defeat subexpression reuse) — fine
    for ad-hoc column use, but bulk operators should use the relational
    ``shingle_rows`` below, which tokenizes each document exactly once.
    """
    tokens = word_tokens_col(col)
    n = F.size(tokens)
    starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle = lambda i: F.array_join(F.slice(tokens, i + 1, k), " ")  # noqa: E731
    return F.when(n <= k, F.array(F.array_join(tokens, " "))).otherwise(
        F.array_distinct(F.transform(starts, shingle))
    )


def shingle_sets(df, text_col: str = "text", id_col: str = "doc_id", k: int = 5):
    """(id, sh_arr) — per-document distinct shingle arrays, ZERO shuffles.

    Two-stage projection: the first ``select`` materializes the token
    array as a real column, so the ``transform`` lambda in the second
    stage references a column (evaluated once per row), not the tokenizer
    expression (which a single-stage HOF would re-evaluate per shingle).
    Documents with no tokens are dropped (no shingles → can't pair).

    This is the scale path: shingling is narrow (no window, no distinct
    shuffle) — at 100 TB it pipelines straight out of the parquet scan.
    One exception: when the input has fewer partitions than the cluster
    has slots (small local files), fan out first so the per-element HOF
    work parallelizes — a no-op on real multi-split scans."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    toks_df = df.select(
        F.col(id_col).alias("id"), word_tokens_col(text_col).alias("__toks")
    ).filter(F.size("__toks") > 0)
    t = F.col("__toks")
    n = F.size(t)
    starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    mk = lambda i: F.array_join(F.slice(t, i + 1, k), " ")  # noqa: E731
    sh = F.when(n <= k, F.array(F.array_join(t, " "))).otherwise(
        F.array_distinct(F.transform(starts, mk))
    )
    return toks_df.select("id", sh.alias("sh_arr"))


def shingle_rows(df, text_col: str = "text", id_col: str = "doc_id", k: int = 5):
    """(id, shingle) rows — relational shingling for bulk operators.
    Explode of :func:`shingle_sets`; still zero shuffles (narrow)."""
    return shingle_sets(df, text_col, id_col, k).select(
        "id", F.explode("sh_arr").alias("shingle")
    )
