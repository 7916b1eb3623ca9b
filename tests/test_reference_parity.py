"""Golden-output parity against the reference's own fixtures.

Reads ``/root/reference/tests/fixtures/donations.ijson`` (474 entities)
and ``eu_authorities.ftm.json`` (151) **read-only at test time** and
replays every assertion of the reference's de-facto spec
(``/root/reference/tests/test_store.py:12-283``, ``test_cli.py:40-45``)
against this engine. This is SURVEY §5's "parity bar".

Documented divergence: the reference's ClickHouse sum() returns integers
(``test_store.py:186-237`` FIXME comments show the true decimal values);
this engine sums as double, so sum parity is asserted via truncation.
"""

from __future__ import annotations

import os

import pytest

from ftm_columnstore_spark.plans.query import Q
from ftm_columnstore_spark.sources.ftm_json import read_entities
from ftm_columnstore_spark.store import Store
from ftm_columnstore_spark.view import View

FIXTURES = "/root/reference/tests/fixtures"
DONATIONS = os.path.join(FIXTURES, "donations.ijson")
AUTHORITIES = os.path.join(FIXTURES, "eu_authorities.ftm.json")

TCHIBO = "4e0bd810e1fcb49990a2b31709b6140c4c9139c5"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(DONATIONS) and os.path.exists(AUTHORITIES)),
    reason="reference fixtures not available",
)


@pytest.fixture(scope="module")
def parity_store(spark, tmp_path_factory):
    uri = str(tmp_path_factory.mktemp("parity-store"))
    store = Store(spark, uri)
    store.ensure()
    store.write_entities(
        read_entities(spark, DONATIONS), with_fingerprints=True
    )
    store.write_entities(
        read_entities(spark, AUTHORITIES), with_fingerprints=True
    )
    return store


@pytest.fixture(scope="module")
def view(parity_store):
    return View(parity_store)


# --- counts (test_cli.py:40-45, test_store.py:23-25,105-117) -------------


def test_entity_counts(view, parity_store):
    assert sum(1 for _ in view.entities()) == 625
    eu = View(parity_store, "eu_authorities")
    assert sum(1 for _ in eu.entities()) == 151
    don = View(parity_store, "donations")
    assert sum(1 for _ in don.entities()) == 474
    # Query-level dataset filter (test_store.py:118-122)
    res = list(view.entities(Q().where(dataset="eu_authorities")))
    assert len(res) == 151
    assert all("eu_authorities" in e["datasets"] for e in res[:3])


# --- Tchibo golden (test_store.py:27-56) ---------------------------------


def test_tchibo_caption(view):
    ent = view.get_entity(TCHIBO)
    assert ent is not None
    assert ent["caption"] == "Tchibo Holding AG"


def test_tchibo_inverted(view):
    ent = view.get_entity(TCHIBO)
    # for each entity-typed value, the inverted lookup must point back
    address = ent["properties"]["addressEntity"][0]
    pointers = list(view.get_inverted(address))
    assert any(eid == TCHIBO for _, eid in pointers)
    # reversed prop name for Thing.addressEntity
    assert all(isinstance(p, str) and p for p, _ in pointers)


def test_tchibo_adjacent(view):
    adjacent = list(view.get_adjacent(TCHIBO))
    assert len(adjacent) == 2  # test_store.py:40-41


def test_tchibo_fingerprint_statement(parity_store):
    # reference fpx golden (test_store.py:50-56)
    fpx = parity_store.fingerprints()
    rows = fpx.filter(
        (fpx.entity_id == TCHIBO) & (fpx.algorithm == "fingerprint")
    ).collect()
    values = {r["value"] for r in rows}
    assert "ag holding tchibo" in values


def test_tchibo_metaphone_keys(parity_store):
    """fpx metaphone parity: double-metaphone primary of each tokenize()
    token — {full fingerprint, holding, tchibo}."""
    from ftm_columnstore_spark.functions.double_metaphone import (
        double_metaphone,
    )

    fpx = parity_store.fingerprints()
    rows = fpx.filter(
        (fpx.entity_id == TCHIBO) & (fpx.algorithm == "metaphone1")
    ).collect()
    values = {r["value"] for r in rows}
    expected = {
        double_metaphone(t)[0]
        for t in ("ag holding tchibo", "holding", "tchibo")
    }
    assert values == {v for v in expected if v}


def test_upsert_idempotent(spark, parity_store, view):
    # re-writing the same dataset must not change entity count
    # (test_store.py:58-66)
    parity_store.write_entities(read_entities(spark, DONATIONS))
    assert sum(1 for _ in view.entities()) == 625
    ent = view.get_entity(TCHIBO)
    assert ent["caption"] == "Tchibo Holding AG"


# --- SatCen exact property dict (test_store.py:86-98) --------------------


def test_satcen_property_dict(view):
    ent = view.get_entity("eu-authorities-satcen")
    props = ent["properties"]
    assert props == {
        "legalForm": ["security_agency"],
        "keywords": ["security_agency"],
        "website": ["https://www.satcen.europa.eu/"],
        "description": [
            "The European Union Satellite Centre (SatCen) supports EU decision-making and\naction in the context of Europe’s Common Foreign and Security Policy. This\nmeans providing products and services based on exploiting space assets and\ncollateral data, including satellite imagery and aerial imagery, and related\nservices."  # noqa
        ],
        "name": ["European Union Satellite Centre"],
        "weakAlias": ["SatCen"],
        "jurisdiction": ["eu"],
        "sourceUrl": ["https://www.asktheeu.org/en/body/satcen"],
    }


# --- schema + comparator filter (test_store.py:123-127) ------------------


def test_payment_date_gte(view):
    q = Q().where(schema="Payment", prop="date", value=2011, comparator="gte")
    res = list(view.entities(q))
    assert len(res) == 21
    assert all(e["schema"] == "Payment" for e in res)


# --- stats (test_store.py:129-142) ---------------------------------------


def test_stats_eu_authorities(parity_store):
    eu = View(parity_store, "eu_authorities")
    st = eu.stats()
    assert st["entity_count"] == 151
    assert st["schemata"] == {"PublicBody": 151}
    assert st["countries"] == {"eu": 151}


# --- ordering + slicing (test_store.py:144-166) --------------------------


def test_order_by_amount(view):
    q = Q().where(schema="Payment", prop="date", value=2011, comparator="gte")
    res = list(view.entities(q.order_by("amountEur")))
    assert len(res) == 21
    assert res[0]["properties"]["amountEur"] == ["50001"]
    res = list(view.entities(q.order_by("amountEur", ascending=False)))
    assert res[0]["properties"]["amountEur"] == ["320000"]


def test_slice(view):
    q = Q().where(schema="Payment", prop="date", value=2011, comparator="gte")
    q = q.order_by("amountEur")[:10]
    res = list(view.entities(q))
    assert len(res) == 10
    assert res[0]["properties"]["payer"] == [
        "efccc434cdf141c7ba6f6e539bb6b42ecd97c368"
    ]


def test_first_person_by_name(view):
    q = Q().where(schema="Person").order_by("name")[0]
    res = list(view.entities(q))
    assert len(res) == 1
    assert res[0]["caption"] == "Dr.-Ing. E. h. Martin Herrenknecht"


# --- aggregations (test_store.py:169-237) --------------------------------


def test_agg_minmax_date(view):
    res = view.aggregations(
        Q().aggregate("max", "date").aggregate("min", "date")
    )
    assert res == {
        "max": {"date": "2011-12-29"},
        "min": {"date": "2002-07-04"},
    }


def test_agg_count_by_beneficiary(view):
    res = view.aggregations(
        Q().aggregate("count", "id", groups="beneficiary")
    )
    assert (
        res["groups"]["beneficiary"]["count"]["id"][
            "6d03aec76fdeec8f9697d8b19954ab6fc2568bc8"
        ]
        == 10
    )
    assert res["count"]["id"] == 625


GOLDEN_BENEFICIARY_SUMS = {
    # int-truncated golden values; true decimal noted in the reference's
    # FIXME comments (6d03aec… is 3368136.15)
    "6d03aec76fdeec8f9697d8b19954ab6fc2568bc8": 3368136,
    "783d918df9f9178400d6b3386439ab3b3679979c": 6039987,
    "6d8377d3938b85fa1bfd1985486f0f913c42e224": 6394282,
    "d10764ddf47ca220527d385fc8fbaa62114408e4": 660008,
    "7202347006660188aab5c1e264c4bee948478fd6": 4125977,
    "c326dd8021ee75fe9608f31ecb4e2e7388144102": 17231420,
    "542c6435219bd84c061ea407a6ab1e29b4d146d0": 1030898,
    "9fbaa5733790781e56eec4998aeacf5093dccbf5": 290725,
    "9e292c150c617eec85e5479c5f039f8441569441": 175000,
    "49d46f7e70e19bc497a17734af53ea1a00c831d6": 1221256,
    "4b308dc2b128377e63a4bf2e4c1b9fcd59614eee": 52000,
}

GOLDEN_YEAR_SUMS = {
    "2011": 1953402,  # true 1953402.15
    "2010": 3899002,
    "2009": 6451130,
    "2008": 6002766,
    "2007": 3266005,
    "2006": 4515084,
    "2005": 7278646,
    "2004": 2156628,
    "2003": 2337982,
    "2002": 2729044,
}


def test_agg_sum_by_beneficiary(view):
    res = view.aggregations(
        Q()
        .where(dataset="donations")
        .aggregate("sum", "amountEur", groups="beneficiary")
    )
    got = res["groups"]["beneficiary"]["sum"]["amountEur"]
    assert {k: int(v) for k, v in got.items()} == GOLDEN_BENEFICIARY_SUMS
    assert int(res["sum"]["amountEur"]) == 40589689


def test_agg_sum_by_year(view):
    res = view.aggregations(
        Q()
        .where(dataset="donations")
        .aggregate("sum", "amountEur", groups="year")
    )
    got = res["groups"]["year"]["sum"]["amountEur"]
    assert {k: int(v) for k, v in got.items()} == GOLDEN_YEAR_SUMS
    assert int(res["sum"]["amountEur"]) == 40589689


# --- reverse lookups (test_store.py:239-258) -----------------------------


def test_reverse(view):
    entity_id = "783d918df9f9178400d6b3386439ab3b3679979c"
    res = list(view.entities(Q().where(reverse=entity_id)))
    assert len(res) == 53
    assert all(
        entity_id in e["properties"].get("beneficiary", []) for e in res
    )
    q = Q().where(reverse=entity_id, schema="Payment")
    q = q.where(prop="date", value=2007, comparator="gte")
    assert len(list(view.entities(q))) == 37
    q = Q().where(reverse=entity_id, schema="Person")
    assert len(list(view.entities(q))) == 0


# --- search (test_store.py:260-263) --------------------------------------


def test_search_agency(view):
    q = Q().where(dataset="eu_authorities").search("agency")
    assert len(list(view.entities(q))) == 23


# --- id lookups (test_store.py:265-283) ----------------------------------


def test_id_lookups(view):
    assert len(list(view.entities(Q().where(entity_id="eu-authorities-chafea")))) == 1
    assert (
        len(list(view.entities(Q().where(canonical_id="eu-authorities-chafea"))))
        == 1
    )
    assert (
        len(
            list(
                view.entities(
                    Q().where(
                        entity_id="eu-authorities-chafea", dataset="donations"
                    )
                )
            )
        )
        == 0
    )
    assert (
        len(
            list(
                view.entities(Q().where(entity_id__startswith="eu-authorities-"))
            )
        )
        == 151
    )
    assert (
        len(
            list(
                view.entities(
                    Q().where(canonical_id__startswith="eu-authorities-")
                )
            )
        )
        == 151
    )


# --- CLI roundtrip (reference test_cli.py:20-45) -------------------------


def test_cli_iterate_counts(spark, parity_store, capsys):
    """ftmq-roundtrip golden: iterating the whole store yields 625 JSON
    lines, dataset-filtered iteration 474/151 (test_cli.py:40-45)."""
    from ftm_columnstore_spark.cli import main

    rc = main(["--store", parity_store.uri, "iterate"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().split("\n") if l.strip()]
    assert len(lines) == 625
    import json as _json

    parsed = _json.loads(lines[0])
    assert {"id", "schema", "properties"} <= set(parsed)

    rc = main(["--store", parity_store.uri, "iterate", "--dataset", "donations"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().split("\n") if l.strip()]
    assert len(lines) == 474

    rc = main(
        ["--store", parity_store.uri, "iterate", "--dataset", "eu_authorities"]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().split("\n") if l.strip()]
    assert len(lines) == 151


# --- adjacency tuple shape (test_store.py:30-41) --------------------------


def test_tchibo_adjacent_tuple_shape(view):
    """The reference walks get_adjacent(entity) as typed pairs; our
    analog yields (direction, prop, entity_id) triples — pin the shape
    and that the out-edge follows Tchibo's own entity-typed property
    to the exact address id, with the inverted pointer closing the
    loop (test_store.py:30-41)."""
    ent = view.get_entity(TCHIBO)
    address = ent["properties"]["addressEntity"][0]
    adjacent = list(view.get_adjacent(TCHIBO))
    assert len(adjacent) == 2
    for item in adjacent:
        assert isinstance(item, tuple) and len(item) == 3
        direction, prop, other = item
        assert direction in {"in", "out"}
        assert isinstance(prop, str) and prop
        assert isinstance(other, str) and other
    assert ("out", "addressEntity", address) in adjacent
    # the other neighbour points AT Tchibo (an in-edge), and the same
    # edge is visible through get_inverted on the address side
    assert sum(1 for d, _, _ in adjacent if d == "in") == 1
    assert any(eid == TCHIBO for _, eid in view.get_inverted(address))


# --- apply_iter analog (test_store.py:250-256) -----------------------------


def test_apply_iter_counts_without_store(spark):
    """The reference's q.apply_iter(proxies) evaluates a query over an
    in-memory iterable with no store. The analog here is F11: the SAME
    compiler applied to any statements DataFrame — built directly from
    the fixture files, never written to a Store — must reproduce the
    reference counts (37 date-gated reverse Payments, 0 reverse
    Persons)."""
    from ftm_columnstore_spark.plans.compiler import compile_entities
    from ftm_columnstore_spark.sources.statements import (
        entities_to_statements,
    )

    stmts = entities_to_statements(
        read_entities(spark, DONATIONS), "donations"
    ).unionByName(
        entities_to_statements(
            read_entities(spark, AUTHORITIES), "eu_authorities"
        )
    )
    entity_id = "783d918df9f9178400d6b3386439ab3b3679979c"
    q = Q().where(reverse=entity_id, schema="Payment")
    q = q.where(prop="date", value=2007, comparator="gte")
    assert compile_entities(stmts, q).count() == 37
    q2 = Q().where(reverse=entity_id, schema="Person")
    assert compile_entities(stmts, q2).count() == 0


# --- leaf dataset names (test_store.py:99) ---------------------------------


def test_store_dataset_names(parity_store):
    """store.dataset.leaf_names == {donations, eu_authorities} — the
    analog is the distinct dataset column of the statement relation."""
    names = {
        r["dataset"]
        for r in parity_store.statements().select("dataset").distinct().collect()
    }
    assert names == {"donations", "eu_authorities"}


# --- entity payload completeness (test_store.py:100-104) -------------------


def test_entities_are_complete_payloads(view):
    """Every iterated entity is a full FtM payload (the reference
    asserts isinstance CompositeEntity): id, schema, caption,
    non-empty properties dict, datasets list."""
    seen = 0
    for ent in view.entities():
        assert set(ent) >= {"id", "schema", "caption", "properties", "datasets"}
        assert isinstance(ent["properties"], dict) and ent["properties"]
        assert isinstance(ent["datasets"], list) and ent["datasets"]
        seen += 1
        if seen >= 5:
            break
    assert seen == 5
