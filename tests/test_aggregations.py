"""Aggregations (SURVEY §2.4 A1-A10; reference tests/test_store.py:169-237)."""

from ftm_columnstore_spark.plans.compiler import compile_aggregations
from ftm_columnstore_spark.plans.query import Q


def test_min_max_date(statements):
    q = Q().where(schema="Payment").aggregate("max", "date").aggregate("min", "date")
    res = compile_aggregations(statements, q)
    assert res["max"]["date"] == "2009-11-02"
    assert res["min"]["date"] == "2008-03-15"


def test_count(statements):
    res = compile_aggregations(statements, Q().where(dataset="grants").aggregate("count", "id"))
    assert res["count"]["id"] == 7


def test_sum_numeric_coercion(statements):
    res = compile_aggregations(
        statements, Q().where(schema="Payment").aggregate("sum", "amountEur")
    )
    assert res["sum"]["amountEur"] == 371201.5


def test_avg(statements):
    res = compile_aggregations(
        statements, Q().where(schema="Payment").aggregate("avg", "amountEur")
    )
    assert abs(res["avg"]["amountEur"] - 371201.5 / 3) < 1e-9


def test_group_by_prop(statements):
    q = Q().where(schema="Payment").aggregate("count", "id", groups="beneficiary")
    res = compile_aggregations(statements, q)
    assert res["groups"]["beneficiary"]["count"]["id"] == {"org-acme": 2, "org-beta": 1}


def test_group_by_year(statements):
    q = Q().where(schema="Payment").aggregate("sum", "amountEur", groups="year")
    res = compile_aggregations(statements, q)
    # partial date "2009" buckets into year 2009 (X9)
    assert res["groups"]["year"]["sum"]["amountEur"] == {
        "2008": 50001.0,
        "2009": 321200.5,
    }


def test_group_cap(statements, monkeypatch):
    from ftm_columnstore_spark import settings

    monkeypatch.setattr(settings, "MAX_AGG_GROUPS", 1)
    q = Q().where(schema="Payment").aggregate("count", "id", groups="beneficiary")
    res = compile_aggregations(statements, q)
    assert len(res["groups"]["beneficiary"]["count"]["id"]) == 1


def test_stats(statements):
    from ftm_columnstore_spark.operators.aggregations import stats

    res = stats(statements, dataset="grants")
    assert res["entity_count"] == 7
    assert res["schemata"]["Payment"] == 3
    assert res["schemata"]["Company"] == 1
    assert res["countries"]["de"] == 3


def test_dataset_stats_approx_close_to_exact(statements):
    from ftm_columnstore_spark.operators.aggregations import dataset_stats

    exact = {
        (r["dataset"], r["schema"]): (r["entities"], r["statements"])
        for r in dataset_stats(statements).collect()
    }
    approx = {
        (r["dataset"], r["schema"]): (r["entities"], r["statements"])
        for r in dataset_stats(statements, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for k, (e_ents, e_stmts) in exact.items():
        a_ents, a_stmts = approx[k]
        assert a_stmts == e_stmts              # statement count stays exact
        # p=12 → ~1.6% σ; tiny groups hit linear counting (near-exact)
        assert abs(a_ents - e_ents) <= max(2, 0.1 * e_ents), k
