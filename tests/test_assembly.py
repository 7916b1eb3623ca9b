"""Entity assembly goldens (SURVEY §2.6; reference tests/test_store.py:27-28,86-105)."""

from pyspark.sql import functions as F

from ftm_columnstore_spark.operators.assembly import assemble_entities, get_entity


def test_roundtrip_counts(statements):
    entities = assemble_entities(statements)
    assert entities.count() == 10


def test_entity_shape(statements):
    e = get_entity(statements, "pay-1").collect()[0]
    assert e["id"] == "pay-1"
    assert e["schema"] == "Payment"
    assert e["properties"]["amountEur"] == ["50001"]
    assert e["properties"]["beneficiary"] == ["org-acme"]
    assert e["datasets"] == ["grants"]
    assert e["referents"] == []


def test_caption_from_name(statements):
    e = get_entity(statements, "org-acme").collect()[0]
    assert e["caption"] == "Acme Holding AG"


def test_caption_address_full(statements):
    e = get_entity(statements, "addr-1").collect()[0]
    assert e["caption"] == "Hauptstr. 1, Berlin"


def test_multivalued_props_sorted_distinct(statements, spark):
    from ftm_columnstore_spark.sources.statements import statements_from_rows

    extra = statements_from_rows(
        spark,
        [
            dict(id=f"x{i}", entity_id="multi", prop="name", schema="Company",
                 value=v, dataset="grants", last_seen=None)
            for i, v in enumerate(["Zeta", "Alpha", "Alpha"])
        ],
    )
    e = assemble_entities(extra).collect()[0]
    assert e["properties"]["name"] == ["Alpha", "Zeta"]


def test_referents_from_merged_ids(statements, spark):
    from ftm_columnstore_spark.sources.statements import statements_from_rows

    merged = statements_from_rows(
        spark,
        [
            dict(id="a1", entity_id="src-1", canonical_id="canon", prop="name",
                 schema="Person", value="A", dataset="d", last_seen=None),
            dict(id="a2", entity_id="src-2", canonical_id="canon", prop="name",
                 schema="Person", value="B", dataset="d", last_seen=None),
        ],
    )
    e = assemble_entities(merged).collect()[0]
    assert e["id"] == "canon"
    assert sorted(e["referents"]) == ["src-1", "src-2"]
    assert e["properties"]["name"] == ["A", "B"]


def test_most_specific_schema_wins(spark):
    from ftm_columnstore_spark.sources.statements import statements_from_rows

    mixed = statements_from_rows(
        spark,
        [
            dict(id="s1", entity_id="e", prop="name", schema="LegalEntity",
                 value="X", dataset="d", last_seen=None),
            dict(id="s2", entity_id="e", prop="name", schema="Company",
                 value="X", dataset="d", last_seen=None),
        ],
    )
    e = assemble_entities(mixed).collect()[0]
    assert e["schema"] == "Company"


def test_lookup_by_source_id_after_merge(spark):
    from ftm_columnstore_spark.operators.assembly import get_entity
    from ftm_columnstore_spark.sources.statements import statements_from_rows

    merged = statements_from_rows(
        spark,
        [
            dict(id="a1", entity_id="src-1", canonical_id="canon", prop="name",
                 schema="Person", value="A", dataset="d", last_seen=None),
        ],
    )
    assert get_entity(merged, "src-1").collect()[0]["id"] == "canon"
    assert get_entity(merged, "canon").collect()[0]["id"] == "canon"
