"""View facade — reference user-facing API parity
(reference tests/test_store.py usage shapes)."""

import pytest

from ftm_columnstore_spark.plans.query import Q
from ftm_columnstore_spark.store import Store


@pytest.fixture()
def view(spark, tmp_path, entities_df):
    store = Store(spark, str(tmp_path / "s"))
    store.ensure()
    store.write_entities(entities_df, last_seen="2024-01-01 00:00:00")
    return store.view()


def test_get_entity(view):
    e = view.get_entity("org-acme")
    assert e["caption"] == "Acme Holding AG"
    assert e["properties"]["country"] == ["de"]
    assert view.get_entity("nope") is None


def test_entities_with_query(view):
    got = sorted(e["id"] for e in view.entities(Q().where(schema="Payment")))
    assert got == ["pay-1", "pay-2", "pay-3"]
    assert len(list(view.entities())) == 10


def test_get_inverted(view):
    got = sorted(view.get_inverted("org-acme"))
    assert got == [("paymentsReceived", "pay-1"), ("paymentsReceived", "pay-2")]


def test_get_adjacent(view):
    got = sorted(view.get_adjacent("per-carol"))
    assert ("out", "addressEntity", "addr-1") in got
    assert ("in", "paymentsMade", "pay-2") in got


def test_stats_and_aggregations(view):
    s = view.stats(dataset="grants")
    assert s["entity_count"] == 7
    agg = view.aggregations(
        Q().where(schema="Payment").aggregate("sum", "amountEur")
    )
    assert agg["sum"]["amountEur"] == 371201.5


def test_catalog_view(spark, tmp_path, entities_df):
    store = Store(spark, str(tmp_path / "cat"))
    store.ensure()
    store.write_entities(entities_df, last_seen="2024-01-01 00:00:00")
    both = store.view(dataset=["grants", "registry"])
    assert len(list(both.entities())) == 10
    one = store.view(dataset=["registry"])
    assert len(list(one.entities())) == 3


def test_get_expanded(view):
    got = dict(view.get_expanded("addr-1", hops=2))
    assert got["addr-1"] == 0
    assert got.get("org-acme") == 1
    assert got.get("pay-1") == 2


def test_view_profile(view):
    prof = {r["column"]: r for r in view.profile(["schema", "canonical_id"])}
    assert set(prof) == {"schema", "canonical_id"}
    assert prof["schema"]["n_nulls"] == 0
    assert prof["schema"]["n_distinct_est"] >= 1
    assert prof["canonical_id"]["n_values"] > 0
