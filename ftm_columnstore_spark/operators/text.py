"""Text-analysis operators over a documents table (north-star extension;
SURVEY §7 step 9 — language-ID, quality scoring, token counting, document
fingerprinting). All pure-column expressions; designed to run as one scan
over 100 TB of text with no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ftm_columnstore_spark.functions.text import word_tokens_col

#: tiny per-language stopword marker sets for the n-gram/stopword heuristic.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"),
    "es": ("el", "la", "los", "las", "es", "una", "por", "que", "para", "con"),
}


def token_count_col(text: Column | str) -> Column:
    """Whitespace-ish token count (BPE-ish proxy: alnum runs)."""
    return F.size(word_tokens_col(text))


def language_id_col(text: Column | str) -> Column:
    """Stopword-voting language ID: the language whose marker set overlaps
    the document's token set the most; 'und' (undetermined) when no marker
    hits. Columnar: one array_intersect per language over the token set."""
    tokens = F.array_distinct(word_tokens_col(text))
    scored = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        tokens, F.array(*[F.lit(m) for m in markers])
                    )
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, markers in sorted(_LANG_MARKERS.items())
        ]
    )
    best = F.array_max(scored)
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def quality_score_col(text: Column | str) -> Column:
    """Heuristic quality in [0,1]: penalize too-short docs, extreme mean
    word length, and high non-alnum ratio (boilerplate/garbage signals)."""
    t = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(t)
    tokens = word_tokens_col(t)
    n_tokens = F.size(tokens)
    alnum_chars = F.length(F.regexp_replace(F.lower(t), "[^a-z0-9]", ""))
    mean_len = alnum_chars / F.greatest(n_tokens, F.lit(1))
    len_ok = F.least(n_tokens / F.lit(20.0), F.lit(1.0))
    word_ok = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    alnum_ratio = alnum_chars / F.greatest(n_chars, F.lit(1))
    return F.round(len_ok * word_ok * alnum_ratio, 4)


def doc_fingerprint_col(text: Column | str) -> Column:
    """Deterministic 64-bit-ish document fingerprint: xxhash64 over the
    normalized token stream (rolling-hash analogue, exact-normalized dedup
    key)."""
    return F.xxhash64(F.array_join(word_tokens_col(text), " "))


def analyze_documents(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-scan document profile: tokens, language, quality, fingerprint."""
    return documents.select(
        id_col,
        token_count_col(text_col).alias("n_tokens"),
        language_id_col(text_col).alias("lang_pred"),
        quality_score_col(text_col).alias("quality"),
        doc_fingerprint_col(text_col).alias("fingerprint"),
    )
