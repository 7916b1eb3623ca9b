"""Phonetic / name-normalization functions (SURVEY §2.9 X1-X5).

Reference behavior (``/root/reference/ftm_columnstore/phonetic.py:32-70``,
golden at ``tests/test_store.py:50-56``):

- ``fingerprint``: normalize (lower, de-accent, strip punctuation), sort
  distinct tokens → "Tchibo Holding AG" → "ag holding tchibo";
- ``tokenize``: {full fingerprint} ∪ {tokens with len > 5};
- ``metaphone1/2``: double-metaphone primary/secondary per token;
- ``soundex``: per-token soundex.

Fingerprint/tokenize/soundex are pure-column (codegen). Metaphone has no
Spark builtin → Arrow-batched pandas UDF around a self-contained
simplified-metaphone encoder (classic Lawrence-Philips rules subset; the
reference's C double-metaphone differs on rare digraphs — documented
divergence, same blocking power). The reference's 10M-entry lru_caches
(phonetic.py:32-56) are unnecessary: we ``distinct()`` values before
encoding, which is the distributed form of memoization.
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


# --- simplified metaphone ----------------------------------------------------

_VOWELS = set("aeiou")


def _metaphone_word(word: str) -> str:
    """Simplified Metaphone (public Lawrence-Philips rule subset):
    good enough for blocking keys; not byte-identical to double-metaphone."""
    w = "".join(ch for ch in word.lower() if ch.isalpha())
    if not w:
        return ""
    # leading-letter exceptions
    for pre, rep in (("kn", "n"), ("gn", "n"), ("pn", "n"), ("wr", "r"), ("x", "s"), ("wh", "w")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    out: list[str] = []
    i = 0
    n = len(w)
    while i < n:
        ch = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        prv = w[i - 1] if i > 0 else ""
        if ch in _VOWELS:
            if i == 0:
                out.append(ch.upper())
        elif ch == "b":
            if not (i == n - 1 and prv == "m"):
                out.append("B")
        elif ch == "c":
            if nxt == "h":
                out.append("X"); i += 1
            elif nxt in "iey":
                out.append("S")
            else:
                out.append("K")
        elif ch == "d":
            if nxt == "g" and i + 2 < n and w[i + 2] in "iey":
                out.append("J"); i += 1
            else:
                out.append("T")
        elif ch == "g":
            if nxt == "h":
                out.append("K"); i += 1
            elif nxt in "iey":
                out.append("J")
            else:
                out.append("K")
        elif ch == "h":
            if prv in _VOWELS and nxt not in _VOWELS:
                pass
            else:
                out.append("H")
        elif ch == "k":
            if prv != "c":
                out.append("K")
        elif ch == "p":
            out.append("F" if nxt == "h" else "P")
            if nxt == "h":
                i += 1
        elif ch == "q":
            out.append("K")
        elif ch == "s":
            if nxt == "h":
                out.append("X"); i += 1
            elif nxt == "i" and i + 2 < n and w[i + 2] in "oa":
                out.append("X")
            else:
                out.append("S")
        elif ch == "t":
            if nxt == "h":
                out.append("0"); i += 1
            elif nxt == "i" and i + 2 < n and w[i + 2] in "oa":
                out.append("X")
            else:
                out.append("T")
        elif ch == "v":
            out.append("F")
        elif ch == "w":
            if nxt in _VOWELS:
                out.append("W")
        elif ch == "x":
            out.append("KS")
        elif ch == "y":
            if nxt in _VOWELS:
                out.append("Y")
        elif ch == "z":
            out.append("S")
        elif ch in "flmnr":
            out.append(ch.upper())
        # skip doubled letters
        while i + 1 < n and w[i + 1] == w[i] and ch not in "c":
            i += 1
        i += 1
    return "".join(out)


def phonetics_col(col: Column | str, algorithm: str) -> Column:
    """X5 dispatcher (reference ``get_phonetics``, phonetic.py:55-70):
    one name for every algorithm; returns an array of keys."""
    if algorithm == "fingerprint":
        return tokenize_col(col)
    if algorithm in ("metaphone1", "metaphone2"):
        # one simplified-metaphone variant; primary == secondary here
        return F.split(metaphone_udf(col), " ")
    if algorithm == "soundex":
        return F.array(soundex_col(col))
    raise ValueError(f"unknown phonetic algorithm: {algorithm}")


def _metaphone_series(values: pd.Series) -> pd.Series:
    def encode(v):
        if v is None:
            return None
        return " ".join(
            filter(None, (_metaphone_word(t) for t in str(v).split()))
        )

    uniques = values.drop_duplicates()
    mapping = {v: encode(v) for v in uniques}
    return values.map(mapping)


_METAPHONE_UDF = None


def metaphone_udf(col: Column | str) -> Column:
    """X3 analogue: per-token metaphone codes, space-joined. Arrow-batched
    pandas UDF, memoized per batch via ``map`` over unique values. Created
    lazily — registering a pandas UDF requires an active SparkSession."""
    global _METAPHONE_UDF
    if _METAPHONE_UDF is None:
        _METAPHONE_UDF = pandas_udf(_metaphone_series, "string")
    return _METAPHONE_UDF(_c(col))
