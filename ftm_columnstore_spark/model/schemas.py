"""Spark StructTypes for the engine's tables.

Statement fact table mirrors the reference DDL
(``/root/reference/ftm_columnstore/engine.py:129-155``; FIXTURES.md A.3):
ClickHouse ``FixedString(40)``/``LowCardinality(String)`` become plain
``StringType`` (parquet dictionary-encodes low-cardinality columns
automatically), ``DateTime64`` → ``TimestampType``, ``Decimal32(8)`` →
``DecimalType(9, 8)``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATEMENT_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("entity_id", StringType(), False),
        StructField("canonical_id", StringType(), False),
        StructField("prop", StringType(), False),
        StructField("prop_type", StringType(), False),
        StructField("schema", StringType(), False),
        StructField("value", StringType(), False),
        StructField("original_value", StringType(), True),
        StructField("dataset", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("target", BooleanType(), True),
        StructField("external", BooleanType(), True),
        StructField("first_seen", TimestampType(), True),
        StructField("last_seen", TimestampType(), False),
    ]
)

STATEMENT_COLUMNS = [f.name for f in STATEMENT_SCHEMA.fields]

#: Dedup identity of a statement — the reference's MergeTree sort key
#: (engine.py:153-154); rows equal on these collapse to max(last_seen).
STATEMENT_KEY = ["canonical_id", "entity_id", "prop", "value", "id"]

ENTITY_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("caption", StringType(), True),
        StructField("schema", StringType(), False),
        StructField(
            "properties",
            MapType(StringType(), ArrayType(StringType(), False), False),
            False,
        ),
        StructField("datasets", ArrayType(StringType(), False), False),
        StructField("referents", ArrayType(StringType(), False), False),
    ]
)

#: Phonetic fingerprint side table (engine.py:157-174).
FPX_SCHEMA = StructType(
    [
        StructField("algorithm", StringType(), False),
        StructField("value", StringType(), False),
        StructField("dataset", StringType(), False),
        StructField("entity_id", StringType(), False),
        StructField("schema", StringType(), False),
        StructField("prop", StringType(), False),
        StructField("prop_type", StringType(), False),
    ]
)

#: Match-candidate pair table (engine.py:176-199).
XREF_SCHEMA = StructType(
    [
        StructField("left_dataset", StringType(), False),
        StructField("left_id", StringType(), False),
        StructField("left_schema", StringType(), False),
        StructField("left_country", StringType(), True),
        StructField("left_caption", StringType(), True),
        StructField("right_dataset", StringType(), False),
        StructField("right_id", StringType(), False),
        StructField("right_schema", StringType(), False),
        StructField("right_country", StringType(), True),
        StructField("right_caption", StringType(), True),
        StructField("judgement", StringType(), True),
        StructField("score", DecimalType(9, 8), True),
        StructField("ts", TimestampType(), False),
        StructField("user", StringType(), True),
    ]
)
