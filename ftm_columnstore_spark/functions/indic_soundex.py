"""Indic-aware soundex (X4 option — closes the libindic divergence).

The reference encodes fpx soundex keys with ``libindic.soundex``
(``/root/reference/ftm_columnstore/phonetic.py:8,50-52``), whose value
over classic soundex is *cross-script* phonetic equality for Indic
names. That works because the nine major Indic blocks (Devanagari,
Bengali, Gurmukhi, Gujarati, Oriya, Tamil, Telugu, Kannada, Malayalam)
are layout-aligned in Unicode: the consonant ``ka`` sits at offset
0x15 of every 0x80-wide block, ``pa`` at 0x2A, and so on.

This module implements that design from the public Unicode block layout
(ISCII-aligned, Unicode chapter 12): consonants are coded by phonetic
row (velar/palatal/retroflex/dental/labial/semivowel/sibilant), vowels,
matras and viramas are skipped, consecutive duplicates collapse. Two
transliterations of the same name in different Indic scripts produce
identical codes. Latin text falls back to classic soundex.

Divergence note: code *strings* are not byte-identical to libindic's
(its private value table is not reproduced here); the equivalence
classes — which names block together — match the published design.
"""

from __future__ import annotations

#: Unicode range covered by the nine aligned Indic blocks.
_INDIC_START = 0x0900
_INDIC_END = 0x0D80  # exclusive; Malayalam block end
_BLOCK = 0x80

#: block-offset → phonetic-row code (shared by all nine scripts).
#: rows follow the varga (articulation-place) ordering of the blocks.
_OFFSET_CODES: dict[int, str] = {}
for _off in range(0x15, 0x1A):  # ka kha ga gha nga — velar
    _OFFSET_CODES[_off] = "1"
for _off in range(0x1A, 0x1F):  # ca cha ja jha nya — palatal
    _OFFSET_CODES[_off] = "2"
for _off in range(0x1F, 0x24):  # tta ttha dda ddha nna — retroflex
    _OFFSET_CODES[_off] = "3"
for _off in range(0x24, 0x2A):  # ta tha da dha na (+nnna) — dental
    _OFFSET_CODES[_off] = "4"
for _off in range(0x2A, 0x2F):  # pa pha ba bha ma — labial
    _OFFSET_CODES[_off] = "5"
for _off in range(0x2F, 0x36):  # ya ra rra la lla llla va — semivowel
    _OFFSET_CODES[_off] = "6"
for _off in range(0x36, 0x3A):  # sha ssa sa ha — sibilant/aspirate
    _OFFSET_CODES[_off] = "7"

#: classic soundex codes for a-z.
_LATIN_CODES = {
    **{c: "1" for c in "bfpv"},
    **{c: "2" for c in "cgjkqsxz"},
    **{c: "3" for c in "dt"},
    "l": "4",
    **{c: "5" for c in "mn"},
    "r": "6",
}


def _indic_code(cp: int) -> str | None:
    """Phonetic-row code for an Indic codepoint; None = skip (vowel,
    matra, virama, sign, digit)."""
    return _OFFSET_CODES.get((cp - _INDIC_START) % _BLOCK)


def indic_soundex(value: str, length: int = 4) -> str:
    """Soundex with cross-script Indic equivalence.

    Indic input → codes are script-independent phonetic rows, so
    the same name written in Devanagari and Kannada encodes equal.
    Latin input → classic soundex (letter + 3 digits).
    """
    if not value:
        return ""
    word = value.strip()
    if not word:
        return ""
    first_cp = ord(word[0])
    if _INDIC_START <= first_cp < _INDIC_END:
        codes: list[str] = []
        prev = None
        for ch in word:
            cp = ord(ch)
            if not (_INDIC_START <= cp < _INDIC_END):
                prev = None
                continue
            code = _indic_code(cp)
            if code is None:
                prev = None
                continue
            if code != prev:
                codes.append(code)
            prev = code
        return ("I" + "".join(codes))[: length + 1].ljust(length + 1, "0")
    # classic soundex for everything else
    letters = [c for c in word.lower() if c.isalpha()]
    if not letters:
        return ""
    out = letters[0].upper()
    prev = _LATIN_CODES.get(letters[0])
    for ch in letters[1:]:
        code = _LATIN_CODES.get(ch)
        if ch in "hw":
            continue  # h/w do not reset the run
        if code and code != prev:
            out += code
        prev = code
        if len(out) >= length:
            break
    return out.ljust(length, "0")


def indic_soundex_udf():
    """Arrow-batched pandas UDF encoding every element of an
    ``array<string>`` column with :func:`indic_soundex` (HOF lambdas
    cannot call Python UDFs, so the array is encoded whole — same shape
    as the metaphone array encoder). Created lazily; registering
    requires an active SparkSession."""
    from pyspark.sql.functions import pandas_udf

    def series(values):
        memo: dict[str, str] = {}

        def enc(t: str) -> str:
            if t not in memo:
                memo[t] = indic_soundex(t)
            return memo[t]

        return values.map(
            lambda arr: None if arr is None else [enc(t) for t in arr]
        )

    return pandas_udf(series, "array<string>")
