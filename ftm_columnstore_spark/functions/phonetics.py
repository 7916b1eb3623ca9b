"""Phonetic / name-normalization functions (SURVEY §2.9 X1-X5).

Reference behavior (``/root/reference/ftm_columnstore/phonetic.py:32-70``,
golden at ``tests/test_store.py:50-56``):

- ``fingerprint``: normalize (lower, de-accent, strip punctuation), sort
  distinct tokens → "Tchibo Holding AG" → "ag holding tchibo";
- ``tokenize``: {full fingerprint} ∪ {tokens with len > 5};
- ``metaphone1/2``: double-metaphone primary/secondary per token;
- ``soundex``: per-token soundex.

Fingerprint/tokenize/soundex are pure-column (codegen). Metaphone has
no Spark builtin → Arrow-batched pandas UDF around a faithful Double
Metaphone port (``double_metaphone.py``; primary+secondary, same
contract as the ``metaphone`` package the reference consumes). The
reference's 10M-entry lru_caches (phonetic.py:32-56) are unnecessary:
we ``distinct()`` values before encoding, which is the distributed form
of memoization.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: legal-form / corporate stopwords stripped by name fingerprints.
LEGAL_FORMS = (
    "ag kg gmbh mbh ug ohg gbr ev eg se llc llp lp ltd inc corp co gmbh co "
    "plc pllc sa sarl sas snc srl spa nv bv cv oy ab as asa aps kk pte pty "
    "limited incorporated corporation company holdings holding group the"
).split()


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _norm_tokens(col: Column | str, strip_legal_forms: bool = False) -> Column:
    """lower → de-accent (translate common latin diacritics) → strip
    punctuation → split; optionally drop legal-form stopwords."""
    c = F.lower(_c(col))
    c = F.translate(
        c,
        "àáâãäåāçćčèéêëēěìíîïīñńòóôõöøōšùúûüūýÿžßæœ",
        "aaaaaaacccceeeeeeiiiiinnooooooosuuuuuyyzsao",
    )
    pred = (lambda x: (x != F.lit("")) & ~x.isin(*[F.lit(s) for s in LEGAL_FORMS])) \
        if strip_legal_forms else (lambda x: x != F.lit(""))
    return F.filter(F.split(c, "[^a-z0-9]+"), pred)


def fingerprint_col(col: Column | str, strip_legal_forms: bool = False) -> Column:
    """X1: sorted distinct normalized tokens, space-joined.

    Default keeps legal-form tokens, matching the reference golden
    ("Tchibo Holding AG" → "ag holding tchibo",
    reference tests/test_store.py:50-56); pass strip_legal_forms=True for
    the more aggressive blocking key."""
    return F.array_join(
        F.array_sort(F.array_distinct(_norm_tokens(col, strip_legal_forms))), " "
    )


def tokenize_col(col: Column | str) -> Column:
    """X2: {full fingerprint} ∪ {tokens with len > 5} (array)."""
    fp = fingerprint_col(col)
    long_tokens = F.filter(_norm_tokens(col), lambda x: F.length(x) > 5)
    return F.array_distinct(
        F.concat(F.array(fp), long_tokens)
    )


def soundex_col(col: Column | str) -> Column:
    """X4: Spark's builtin (classic Anglo soundex; the reference's libindic
    variant adds Indic-script handling — documented divergence)."""
    return F.soundex(_c(col))


# --- double metaphone --------------------------------------------------------

from ftm_columnstore_spark.functions.double_metaphone import double_metaphone


def _metaphone_series(values: pd.Series, index: int) -> pd.Series:
    """Per-token double-metaphone codes, space-joined; memoized per batch
    via ``map`` over unique values. ``index`` picks primary (0) or
    secondary (1) — the reference's metaphone1/metaphone2 split
    (phonetic.py:65-68)."""

    def encode(v):
        if v is None:
            return None
        codes = (double_metaphone(t)[index] for t in str(v).split())
        return " ".join(c for c in codes if c)

    uniques = values.drop_duplicates()
    mapping = {v: encode(v) for v in uniques}
    return values.map(mapping)


_METAPHONE_UDFS: dict[int, object] = {}


def _metaphone(col: Column | str, index: int) -> Column:
    # created lazily — registering a pandas UDF requires an active session
    if index not in _METAPHONE_UDFS:
        _METAPHONE_UDFS[index] = pandas_udf(
            lambda v, _i=index: _metaphone_series(v, _i), "string"
        )
    return _METAPHONE_UDFS[index](_c(col))


def metaphone_udf(col: Column | str) -> Column:
    """X3: double-metaphone *primary* codes per token, space-joined.
    Arrow-batched pandas UDF (faithful Philips double metaphone, see
    ``double_metaphone.py``; matches the ``metaphone`` package the
    reference consumes at phonetic.py:9,46-47)."""
    return _metaphone(col, 0)


def metaphone2_udf(col: Column | str) -> Column:
    """X3: double-metaphone *secondary* codes per token ("" where the
    secondary equals the primary, mirroring the package contract)."""
    return _metaphone(col, 1)


def _dm_array_series(values: pd.Series, index: int) -> pd.Series:
    """Encode each element of an array column with double metaphone —
    whole-element encoding (a multi-word fingerprint is ONE token, as in
    reference ``get_metaphone(t)`` over ``tokenize()`` output)."""

    memo: dict[str, str] = {}

    def enc_one(t: str) -> str:
        if t not in memo:
            memo[t] = double_metaphone(t)[index]
        return memo[t]

    return values.map(
        lambda arr: None if arr is None else [enc_one(t) for t in arr]
    )


_DM_ARRAY_UDFS: dict[int, object] = {}


def dm_array_col(col: Column, index: int = 0) -> Column:
    """Double-metaphone over every element of an array<string> column
    (whole-element encoding — multi-word strings are one call, as the
    reference's ``get_metaphone(t)`` behaves)."""
    if index not in _DM_ARRAY_UDFS:
        _DM_ARRAY_UDFS[index] = pandas_udf(
            lambda v, _i=index: _dm_array_series(v, _i), "array<string>"
        )
    return _DM_ARRAY_UDFS[index](col)


_dm_array = dm_array_col


def phonetics_col(col: Column | str, algorithm: str) -> Column:
    """X5 dispatcher (reference ``get_phonetics``, phonetic.py:55-70):
    fingerprint first, then tokenize ({full fingerprint} ∪ {tokens with
    len > 5}), then encode every token — so the multi-word fingerprint
    itself is one encoded key, exactly as the reference emits it.

    ``soundex`` uses Spark's builtin (Latin scripts); ``soundex_indic``
    routes through the Indic-aware variant (cross-script equivalence,
    see ``indic_soundex.py`` — the libindic analogue)."""
    tokens = tokenize_col(col)
    if algorithm == "fingerprint":
        return tokens
    if algorithm == "metaphone1":
        return _dm_array(tokens, 0)
    if algorithm == "metaphone2":
        return _dm_array(tokens, 1)
    if algorithm == "soundex":
        return F.transform(tokens, lambda t: F.soundex(t))
    if algorithm == "soundex_indic":
        from ftm_columnstore_spark.functions.indic_soundex import (
            indic_soundex_udf,
        )

        # script-preserving tokenization: the ascii fingerprint
        # normalizer would strip Indic codepoints entirely
        return indic_soundex_udf()(_unicode_tokens(col))
    raise ValueError(f"unknown phonetic algorithm: {algorithm}")


def _unicode_tokens(col: Column | str) -> Column:
    """Whitespace/punctuation tokenization that keeps every letter of
    every script (``\\p{L}``), plus the sorted-distinct joined form —
    the unicode analogue of ``tokenize_col`` for Indic-aware keys."""
    toks = F.filter(
        F.split(F.lower(_c(col)), r"[^\p{L}\p{Nd}]+"),
        lambda x: x != F.lit(""),
    )
    fp = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    # same len > 5 token filter as tokenize_col: short tokens would
    # become hot blocking keys and diverge from the reference key set
    long_toks = F.filter(toks, lambda x: F.length(x) > 5)
    return F.array_distinct(F.concat(F.array(fp), long_toks))
