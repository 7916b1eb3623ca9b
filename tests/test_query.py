"""Query DSL semantics (SURVEY §2.2 F1-F11, §2.7 O1-O4;
reference tests/test_store.py:118-281)."""

import pytest

from ftm_columnstore_spark.plans.compiler import compile_entities
from ftm_columnstore_spark.plans.query import Q


def ids(statements, q):
    return sorted(r["id"] for r in compile_entities(statements, q).collect())


def test_dataset_filter(statements):
    assert len(ids(statements, Q().where(dataset="registry"))) == 3
    assert len(ids(statements, Q().where(dataset="grants"))) == 7


def test_schema_filter(statements):
    got = ids(statements, Q().where(schema="Payment"))
    assert got == ["pay-1", "pay-2", "pay-3"]


def test_schema_filter_descendants(statements):
    # LegalEntity expands to Person/Company/Organization/PublicBody (F2)
    got = ids(statements, Q().where(schema="LegalEntity"))
    assert got == ["org-acme", "org-beta", "per-carol", "reg-1", "reg-2", "reg-3"]


def test_prop_comparator_filter(statements):
    got = ids(statements, Q().where(schema="Payment", date__gte=2009))
    assert got == ["pay-2", "pay-3"]


def test_whole_entity_returned_after_prop_filter(statements):
    # F10: date-filtered payments still carry all their props
    ents = compile_entities(
        statements, Q().where(schema="Payment", date__gte=2009)
    ).collect()
    by_id = {e["id"]: e for e in ents}
    assert by_id["pay-2"]["properties"]["amountEur"] == ["320000"]


def test_conjunction_mismatch_empty(statements):
    assert ids(statements, Q().where(entity_id="pay-1", dataset="registry")) == []


def test_id_prefix_filter(statements):
    got = ids(statements, Q().where(entity_id__startswith="pay-"))
    assert got == ["pay-1", "pay-2", "pay-3"]


def test_reverse_filter(statements):
    got = ids(statements, Q().where(reverse="org-acme"))
    assert got == ["pay-1", "pay-2"]


def test_search(statements):
    # ftmq-parity: search matches name-typed values only (reference golden
    # tests/test_store.py:260-263) — reg-3's description mentions "agency"
    # but only reg-1 carries it in a name.
    got = ids(statements, Q().where(dataset="registry").search("agency"))
    assert got == ["reg-1"]


def test_order_by_numeric_asc(statements):
    ents = compile_entities(
        statements, Q().where(schema="Payment").order_by("amountEur")
    ).collect()
    # order preserved? compile_entities assembles after slicing; ordering of
    # the returned DF is not guaranteed post-groupBy, so assert via slice.
    first = compile_entities(
        statements, Q().where(schema="Payment").order_by("amountEur")[0]
    ).collect()[0]
    assert first["properties"]["amountEur"] == ["1200.5"]
    assert len(ents) == 3


def test_order_by_numeric_desc(statements):
    first = compile_entities(
        statements,
        Q().where(schema="Payment").order_by("amountEur", ascending=False)[0],
    ).collect()[0]
    assert first["properties"]["amountEur"] == ["320000"]


def test_order_by_string(statements):
    first = compile_entities(
        statements, Q().where(schema="Person").order_by("name")[0]
    ).collect()[0]
    assert first["caption"] == "Carol Meier"


def test_slice(statements):
    got = compile_entities(statements, Q().where(dataset="grants")[:3]).collect()
    assert len(got) == 3
    one = compile_entities(statements, Q().where(dataset="grants")[2]).collect()
    assert len(one) == 1


def test_bad_comparator_raises():
    with pytest.raises(ValueError):
        Q().where(prop="date", value=1, comparator="huh")
