from ftm_columnstore_spark.functions.double_metaphone import double_metaphone
from ftm_columnstore_spark.functions.phonetics import (
    fingerprint_col,
    metaphone2_udf,
    metaphone_udf,
    soundex_col,
    tokenize_col,
)
from ftm_columnstore_spark.functions.text import (
    clean_tokens_col,
    shingles_col,
    word_tokens_col,
)
from ftm_columnstore_spark.functions.vectors import (
    cosine_similarity_col,
    dot_col,
    norm_col,
)

__all__ = [
    "clean_tokens_col",
    "cosine_similarity_col",
    "dot_col",
    "double_metaphone",
    "fingerprint_col",
    "metaphone2_udf",
    "metaphone_udf",
    "norm_col",
    "shingles_col",
    "soundex_col",
    "tokenize_col",
    "word_tokens_col",
]
