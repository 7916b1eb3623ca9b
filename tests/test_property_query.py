"""Property-based Query-compiler check: for random statement corpora and
random filters, the compiler's entity set must equal a direct Python
evaluation of the same semantics (the reference's dual-engine F11
guarantee, collapsed into one engine + this oracle)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ftm_columnstore_spark.plans.compiler import compile_entities
from ftm_columnstore_spark.plans.query import Q
from ftm_columnstore_spark.sources.statements import statements_from_rows

DATASETS = ["d1", "d2"]
SCHEMAS = ["Company", "Person", "Payment"]
PROPS = {"name": "name", "amountEur": "number", "date": "date"}


statement_strategy = st.builds(
    lambda eid, ds, schema, prop, val: dict(
        id=f"{eid}-{prop}-{val}",
        entity_id=f"e{eid}",
        prop=prop,
        prop_type=PROPS[prop],
        schema=schema,
        value=str(val),
        dataset=ds,
        last_seen=None,
    ),
    st.integers(0, 8),
    st.sampled_from(DATASETS),
    st.sampled_from(SCHEMAS),
    st.sampled_from(list(PROPS)),
    st.integers(1990, 2030),
)


def py_eval(rows, dataset=None, schema=None, prop=None, cmp=None, val=None):
    """Reference evaluation: entity matches if ALL criteria hold on its
    (dataset/schema-filtered) statements; prop criteria need one matching
    statement of that prop."""
    by_entity: dict = {}
    for r in rows:
        by_entity.setdefault(r["entity_id"], []).append(r)
    out = set()
    ops = {
        "eq": lambda a, b: a == b,
        "gt": lambda a, b: a > b,
        "gte": lambda a, b: a >= b,
        "lt": lambda a, b: a < b,
        "lte": lambda a, b: a <= b,
    }
    for eid, stmts in by_entity.items():
        scoped = [
            s
            for s in stmts
            if (dataset is None or s["dataset"] == dataset)
            and (schema is None or s["schema"] == schema)
        ]
        if not scoped:
            continue
        if prop is not None and not any(
            s["prop"] == prop and ops[cmp](s["value"], str(val)) for s in scoped
        ):
            continue
        out.add(eid)
    return out


@settings(
    max_examples=int(__import__("os").environ.get("PARITY_MAX_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(statement_strategy, min_size=1, max_size=40),
    dataset=st.sampled_from([None, "d1", "d2"]),
    schema=st.sampled_from([None, "Payment", "Person"]),
    prop_filter=st.one_of(
        st.none(),
        st.tuples(
            st.sampled_from(list(PROPS)),
            st.sampled_from(["eq", "gt", "gte", "lt", "lte"]),
            st.integers(1990, 2030),
        ),
    ),
)
def test_compiler_matches_python_eval(spark, rows, dataset, schema, prop_filter):
    # dedup statement ids (content-hash semantics)
    uniq = {r["id"]: r for r in rows}.values()
    df = statements_from_rows(spark, uniq)
    q = Q()
    kwargs = {}
    if dataset:
        q = q.where(dataset=dataset)
        kwargs["dataset"] = dataset
    if schema:
        q = q.where(schema=schema)
        kwargs["schema"] = schema
    if prop_filter:
        p, cmp, val = prop_filter
        q = q.where(prop=p, value=val, comparator=cmp)
        kwargs.update(prop=p, cmp=cmp, val=val)
    got = {r["id"] for r in compile_entities(df, q).collect()}
    expected = py_eval(list(uniq), **kwargs)
    assert got == expected
