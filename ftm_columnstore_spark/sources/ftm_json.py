"""FtM entity JSON-lines source/sink (SURVEY §2.1 S1, S7; §2.9 X12).

The reference reads entity-per-line JSON via ``ftmq.io.smart_read_proxies``
(``tests/conftest.py:19-21``) and writes the same shape back out through the
CLI round-trip (``tests/test_cli.py:37-44``). Here both directions are plain
distributed Spark jobs: ``spark.read.json`` with an explicit schema (no
sampling-based inference pass — one scan, not two) and ``to_json`` on write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_columnstore_spark.model.schemas import ENTITY_SCHEMA


def read_entities(
    spark: SparkSession, path: str, dataset: str | None = None
) -> DataFrame:
    """Read FtM entity JSON-lines into an entity DataFrame.

    Unknown keys are ignored; missing ``datasets``/``referents`` default to
    empty (or ``[dataset]`` when given, mirroring ftmq's dataset override).
    """
    df = spark.read.json(path, schema=ENTITY_SCHEMA, mode="PERMISSIVE")
    datasets = (
        F.array(F.lit(dataset))
        if dataset is not None
        else F.coalesce(F.col("datasets"), F.array().cast("array<string>"))
    )
    return df.select(
        "id",
        "caption",
        "schema",
        F.coalesce(
            "properties", F.create_map().cast(ENTITY_SCHEMA["properties"].dataType)
        ).alias("properties"),
        datasets.alias("datasets"),
        F.coalesce("referents", F.array().cast("array<string>")).alias("referents"),
    )


def write_entities(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write an entity DataFrame as FtM JSON-lines (the ``iterate`` sink)."""
    df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.mode(mode).text(
        path
    )
