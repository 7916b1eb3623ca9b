"""Vector primitives over ``array<float>`` embedding columns (north-star
similarity-search extension; SURVEY §7 step 9).

Pure-column implementations via ``zip_with`` + ``aggregate``. NOTE:
Spark evaluates higher-order-function lambdas on the INTERPRETED
expression path, outside whole-stage codegen (measured ~5× penalty on
the analogous shingling path — see NOTES.md "Hot-path rule, measured
exception"), so these expressions are the portable, oracle-checkable
baseline — NOT the scale path. For bulk similarity work use the
Arrow/numpy BLAS variants (`operators/similarity.py:brute_force_topk_np`,
IVF index probes), which batch whole partitions through one matrix
multiply.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_col(a: Column | str, b: Column | str) -> Column:
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(
        prod, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )


def norm_col(a: Column | str) -> Column:
    sq = F.aggregate(
        _c(a), F.lit(0.0), lambda acc, x: acc + (x * x).cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity_col(a: Column | str, b: Column | str) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))
