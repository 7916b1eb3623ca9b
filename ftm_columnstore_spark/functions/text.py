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


def shingle_rows(df, text_col: str = "text", id_col: str = "doc_id", k: int = 5):
    """(id, shingle) rows — relational shingling for bulk operators.

    posexplode the token array (tokenizer runs ONCE per document), then
    build each k-shingle with ``lead`` over (id, pos). ``concat_ws`` skips
    the trailing nulls, so a document shorter than k naturally produces
    its single whole-document shingle at pos 0. One window shuffle keyed
    by doc id; distinct shingles per doc (set semantics, matching
    ``shingles_col``)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(word_tokens_col(text_col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    n = F.count(F.lit(1)).over(Window.partitionBy("id"))
    return (
        toks.select(
            "id",
            "pos",
            F.concat_ws(" ", *parts).alias("shingle"),
            n.alias("__n"),
        )
        .filter((F.col("pos") <= F.col("__n") - k) | (F.col("pos") == 0))
        .select("id", "shingle")
        .distinct()
    )
