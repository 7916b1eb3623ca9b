from ftm_columnstore_spark.model.ftm import (
    CAPTION_PROPS,
    NAME_SCHEMAS,
    PROP_TYPES,
    REVERSE_PROPS,
    SCHEMA_PARENTS,
    is_a,
    prop_type,
    schema_ancestors,
    schema_depth,
    schema_descendants,
)
from ftm_columnstore_spark.model.schemas import (
    ENTITY_SCHEMA,
    FPX_SCHEMA,
    STATEMENT_COLUMNS,
    STATEMENT_SCHEMA,
    XREF_SCHEMA,
)

__all__ = [
    "CAPTION_PROPS",
    "ENTITY_SCHEMA",
    "FPX_SCHEMA",
    "NAME_SCHEMAS",
    "PROP_TYPES",
    "REVERSE_PROPS",
    "SCHEMA_PARENTS",
    "STATEMENT_COLUMNS",
    "STATEMENT_SCHEMA",
    "XREF_SCHEMA",
    "is_a",
    "prop_type",
    "schema_ancestors",
    "schema_depth",
    "schema_descendants",
]
