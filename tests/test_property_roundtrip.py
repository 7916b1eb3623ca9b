"""Property-based entity ↔ statement round-trip (SURVEY §5 plan item c —
absent in the reference, cheap for us).

For arbitrary generated FtM-shaped entities: decompose → reassemble must
preserve id, schema, datasets, and the properties multimap (as sets —
the engine's contract is distinct values, sorted)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ftm_columnstore_spark.model.schemas import ENTITY_SCHEMA
from ftm_columnstore_spark.operators.assembly import assemble_entities
from ftm_columnstore_spark.sources.statements import entities_to_statements

ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=12
)
value = st.text(min_size=1, max_size=20).filter(lambda s: s.strip() == s and s)
prop_name = st.sampled_from(["name", "country", "date", "amountEur", "note", "alias"])

entity_strategy = st.builds(
    lambda eid, schema, ds, props: {
        "id": "e-" + eid,
        "caption": None,
        "schema": schema,
        "properties": {p: sorted(set(vs)) for p, vs in props.items()},
        "datasets": [ds],
        "referents": [],
    },
    ident,
    st.sampled_from(["Company", "Person", "Payment", "Address"]),
    ident,
    st.dictionaries(prop_name, st.lists(value, min_size=1, max_size=3), max_size=4),
)


@settings(
    max_examples=int(__import__("os").environ.get("PARITY_MAX_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(entity_strategy, min_size=1, max_size=6, unique_by=lambda e: e["id"]))
def test_roundtrip_preserves_entities(spark, entities):
    rows = [
        tuple(e[f] for f in ["id", "caption", "schema", "properties", "datasets", "referents"])
        for e in entities
    ]
    df = spark.createDataFrame(rows, ENTITY_SCHEMA)
    stmts = entities_to_statements(df, last_seen="2024-01-01 00:00:00")
    out = {r["id"]: r for r in assemble_entities(stmts).collect()}

    assert set(out) == {e["id"] for e in entities}
    for e in entities:
        got = out[e["id"]]
        assert got["schema"] == e["schema"]
        assert sorted(got["datasets"]) == sorted(e["datasets"])
        got_props = {p: sorted(vs) for p, vs in (got["properties"] or {}).items()}
        assert got_props == e["properties"]
