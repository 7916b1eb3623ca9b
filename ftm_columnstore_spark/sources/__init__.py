from ftm_columnstore_spark.sources.ftm_json import read_entities, write_entities
from ftm_columnstore_spark.sources.statements import (
    entities_to_statements,
    statements_from_rows,
)

__all__ = [
    "entities_to_statements",
    "read_entities",
    "statements_from_rows",
    "write_entities",
]
