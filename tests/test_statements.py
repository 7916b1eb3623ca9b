"""Ingest / decomposition (SURVEY §2.1 S1-S2, §2.9 X11)."""

from pyspark.sql import functions as F

from ftm_columnstore_spark.model.schemas import STATEMENT_COLUMNS


def test_statement_columns(statements):
    assert statements.columns == STATEMENT_COLUMNS


def test_one_row_per_prop_value(statements):
    # pay-1 has 4 prop values + 1 synthetic id statement
    rows = statements.filter(F.col("entity_id") == "pay-1").collect()
    assert len(rows) == 5
    props = {r["prop"] for r in rows}
    assert props == {"amountEur", "date", "beneficiary", "payer", "id"}


def test_prop_types(statements):
    by_prop = {
        r["prop"]: r["prop_type"]
        for r in statements.select("prop", "prop_type").distinct().collect()
    }
    assert by_prop["amountEur"] == "number"
    assert by_prop["date"] == "date"
    assert by_prop["beneficiary"] == "entity"
    assert by_prop["name"] == "name"
    assert by_prop["jurisdiction"] == "country"


def test_sha1_ids_stable_and_unique(statements):
    ids = statements.select("id").collect()
    assert all(len(r["id"]) == 40 for r in ids)
    # content-hash: unique per (dataset, entity, prop, value)
    assert statements.select("id").distinct().count() == statements.count()


def test_dataset_scoping(statements):
    assert statements.filter(F.col("dataset") == "grants").select(
        "entity_id"
    ).distinct().count() == 7
    assert statements.filter(F.col("dataset") == "registry").select(
        "entity_id"
    ).distinct().count() == 3


def test_statement_key_nomenklatura_recipe(spark):
    """Ids are byte-equal to nomenklatura's ``Statement.make_key``:
    sha1("{dataset}.{entity_id}.{prop}.{value}"), ".ext" appended for
    external statements (the hash the reference persists, engine.py:132)."""
    import hashlib

    from ftm_columnstore_spark.sources.statements import statement_key

    rows = [
        ("donations", "e1", "name", "Tchibo Holding AG", False),
        ("donations", "e1", "name", "Tchibo Holding AG", True),
        ("eu", "eu-authorities-chafea", "jurisdiction", "eu", False),
    ]
    df = spark.createDataFrame(
        rows, "dataset string, entity_id string, prop string, value string, external boolean"
    )
    got = df.select(
        statement_key(
            "dataset", "entity_id", "prop", "value", F.col("external")
        ).alias("id")
    ).collect()
    for (ds, eid, prop, val, ext), r in zip(rows, got):
        key = f"{ds}.{eid}.{prop}.{val}"
        if ext:
            key += ".ext"
        assert r["id"] == hashlib.sha1(key.encode("utf-8")).hexdigest()
