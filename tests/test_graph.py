"""Graph operators (SURVEY §2.3 J1/J2; reference tests/test_store.py:31-41)."""

from ftm_columnstore_spark.operators.graph import adjacent, inverted


def test_inverted(statements):
    rows = inverted(statements, "org-acme").collect()
    got = sorted((r["prop"], r["entity_id"]) for r in rows)
    assert got == [("paymentsReceived", "pay-1"), ("paymentsReceived", "pay-2")]


def test_inverted_address(statements):
    rows = inverted(statements, "addr-1").collect()
    got = sorted((r["prop"], r["entity_id"]) for r in rows)
    assert got == [("things", "org-acme"), ("things", "per-carol")]


def test_adjacent_bidirectional(statements):
    rows = adjacent(statements, "org-acme").collect()
    got = sorted((r["direction"], r["prop"], r["neighbour_id"]) for r in rows)
    assert got == [
        ("in", "paymentsReceived", "pay-1"),
        ("in", "paymentsReceived", "pay-2"),
        ("out", "addressEntity", "addr-1"),
    ]
