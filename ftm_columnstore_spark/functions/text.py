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

    ``transform(sequence(...))`` over the token array — executed vectorized
    JVM-side; no UDF. Documents shorter than k tokens yield a single
    whole-document shingle so they still participate in dedup.
    """
    tokens = word_tokens_col(col)
    n = F.size(tokens)
    starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle = lambda i: F.array_join(F.slice(tokens, i + 1, k), " ")  # noqa: E731
    return F.when(n <= k, F.array(F.array_join(tokens, " "))).otherwise(
        F.array_distinct(F.transform(starts, shingle))
    )
