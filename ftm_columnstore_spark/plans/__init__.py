from ftm_columnstore_spark.plans.compiler import (
    compile_aggregations,
    compile_entities,
    compile_statements,
)
from ftm_columnstore_spark.plans.query import Q, Query

__all__ = [
    "Q",
    "Query",
    "compile_aggregations",
    "compile_entities",
    "compile_statements",
]
