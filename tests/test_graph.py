"""Graph operators (SURVEY §2.3 J1/J2; reference tests/test_store.py:31-41)."""

import pytest

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


def test_expand_khop(statements):
    from ftm_columnstore_spark.operators.graph import expand

    got = {r["id"]: r["dist"] for r in expand(statements, ["addr-1"], hops=2).collect()}
    # addr-1 ← org-acme/per-carol (1 hop) ← pay-1/pay-2 (2 hops via org-acme)
    assert got["addr-1"] == 0
    assert got["org-acme"] == 1 and got["per-carol"] == 1
    assert got["pay-1"] == 2 and got["pay-2"] == 2


def test_expand_early_exit(statements):
    from ftm_columnstore_spark.operators.graph import expand

    # hops beyond the component's diameter terminate early and return
    # the full component with stable distances
    a = {r["id"]: r["dist"] for r in expand(statements, ["addr-1"], hops=2).collect()}
    b = {r["id"]: r["dist"] for r in expand(statements, ["addr-1"], hops=10).collect()}
    assert set(a).issubset(set(b))
    for k, v in a.items():
        assert b[k] == v


def test_pagerank_matches_reference_arithmetic(spark):
    """Spark pagerank equals a driver-side reimplementation of the same
    simplified formulation on a small directed graph (with a dangling
    node holding the base rank)."""
    from collections import Counter, defaultdict

    from ftm_columnstore_spark.operators.graph import pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("a", "d")]
    # d is dangling (no out-edges)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: r.rank for r in pagerank(df, iterations=4).collect()}

    from decimal import ROUND_HALF_UP, Decimal

    q12 = Decimal("1e-12")
    nodes = {n for e in edges for n in e}
    out = Counter(s for s, _ in edges)
    r = {n: 1.0 for n in nodes}
    for _ in range(4):
        # mirror the operator: shares quantized to decimal(28,12) and
        # summed exactly, so the replica is bit-identical, not just close
        inflow = defaultdict(lambda: Decimal(0))
        for s, t in edges:
            inflow[t] += Decimal(r[s] / out[s]).quantize(
                q12, rounding=ROUND_HALF_UP
            )
        r = {n: 0.15 + 0.85 * float(inflow[n]) for n in nodes}
    assert set(got) == nodes
    for n in nodes:
        assert abs(got[n] - r[n]) < 1e-12, n
    # the hub feeding everything outranks the pure sink
    assert got["c"] > got["d"]


def test_triangle_count(spark):
    from ftm_columnstore_spark.operators.graph import triangle_count

    # square 1-2-3-4 plus diagonal 1-3: triangles (1,2,3) and (1,3,4);
    # edges arrive messy: mixed direction, duplicate, self-loop
    edges = spark.createDataFrame(
        [
            ("1", "2"), ("2", "3"), ("3", "4"), ("4", "1"),
            ("3", "1"), ("1", "3"),   # diagonal, both directions
            ("2", "1"),               # duplicate of 1-2, reversed
            ("4", "4"),               # self-loop: dropped
        ],
        ["src", "dst"],
    )
    out = {r["id"]: r for r in triangle_count(edges).collect()}
    assert {k: v["triangles"] for k, v in out.items()} == {
        "1": 2, "2": 1, "3": 2, "4": 1
    }
    assert {k: v["degree"] for k, v in out.items()} == {
        "1": 3, "2": 2, "3": 3, "4": 2
    }
    assert out["1"]["clustering"] == pytest.approx(2 * 2 / (3 * 2), abs=1e-6)
    assert out["2"]["clustering"] == pytest.approx(1.0)


def test_triangle_count_no_triangles(spark):
    from ftm_columnstore_spark.operators.graph import triangle_count

    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], ["src", "dst"]
    )
    out = {r["id"]: r for r in triangle_count(star).collect()}
    assert all(r["triangles"] == 0 for r in out.values())
    assert out["hub"]["degree"] == 5 and out["hub"]["clustering"] == 0.0
    assert out["leaf0"]["clustering"] == 0.0  # degree 1 -> defined as 0


def _k_core_py(edges, k):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return set(adj)


def test_k_core_matches_python_replay(spark):
    import random

    from ftm_columnstore_spark.operators.graph import k_core

    rng = random.Random(13)
    edges = list({
        tuple(sorted((rng.randrange(40), rng.randrange(40))))
        for _ in range(120)
    })
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    for k in (2, 3, 4):
        got = {r["id"] for r in k_core(df, k).collect()}
        assert got == _k_core_py(edges, k), k


def test_k_core_known_graph(spark):
    from ftm_columnstore_spark.operators.graph import k_core

    # triangle (1,2,3) + a pendant 4 and an isolated edge 5-6
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert {r["id"] for r in k_core(df, 2).collect()} == {1, 2, 3}
    assert k_core(df, 3).collect() == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        k_core(df, 0)


def test_label_propagation_two_communities(spark):
    from ftm_columnstore_spark.operators.graph import label_propagation

    # two triangles joined by one bridge edge: LPA splits them, CC wouldn't
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "src long, dst long",
    )
    got = {
        r["id"]: r["label"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_label_propagation_multi_edges_and_self_loops(spark):
    from ftm_columnstore_spark.operators.graph import label_propagation

    # duplicate + reversed edges collapse to one vote; self-loop dropped
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 2)], "src long, dst long"
    )
    got = {
        r["id"]: r["label"]
        for r in label_propagation(edges, iterations=2).collect()
    }
    # round 1: 1<-label(2)=2, 2<-label(1)=1; round 2: swap back
    assert got == {1: 1, 2: 2}


def test_label_propagation_validation(spark):
    import pytest

    from ftm_columnstore_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        label_propagation(edges, iterations=0)


def test_neighbor_jaccard_hand_computed(spark):
    from ftm_columnstore_spark.operators.graph import neighbor_jaccard

    # square 1-2-3-4-1: opposite corners share BOTH neighbors (J=1),
    # adjacent corners share none
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    got = {
        (r["node_a"], r["node_b"]): (
            r["shared"], r["degree_a"], r["degree_b"], r["jaccard"]
        )
        for r in neighbor_jaccard(edges).collect()
    }
    assert got == {
        (1, 3): (2, 2, 2, 1.0),
        (2, 4): (2, 2, 2, 1.0),
    }


def test_neighbor_jaccard_max_degree_undercounts_only(spark):
    from ftm_columnstore_spark.operators.graph import neighbor_jaccard

    # hub 0 connects to everyone; 1 and 2 also share neighbor 3
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 3), (2, 3)],
        "src long, dst long",
    )
    full = {
        (r["node_a"], r["node_b"]): r["shared"]
        for r in neighbor_jaccard(edges).collect()
    }
    capped = {
        (r["node_a"], r["node_b"]): (r["shared"], r["jaccard"])
        for r in neighbor_jaccard(edges, max_degree=3).collect()
    }
    # hub-mediated share drops; the 1-2 pair keeps only neighbor 3
    assert full[(1, 2)] == 2
    assert capped[(1, 2)][0] == 1
    # degrees still full (deg 2 each) -> jaccard 1/(2+2-1)
    assert capped[(1, 2)][1] == round(1 / 3, 6)


def test_neighbor_jaccard_validation(spark):
    import pytest

    from ftm_columnstore_spark.operators.graph import neighbor_jaccard

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="min_shared"):
        neighbor_jaccard(edges, min_shared=0)
    with pytest.raises(ValueError, match="max_degree"):
        neighbor_jaccard(edges, max_degree=1)


def test_adamic_adar_hand_computed(spark):
    import math

    from ftm_columnstore_spark.operators.graph import adamic_adar

    # 1 and 2 share neighbors 3 (deg 2) and 0 (deg 3)
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (0, 1), (0, 2), (0, 4)], "src long, dst long"
    )
    got = {
        (r["node_a"], r["node_b"]): (r["shared"], r["aa_score"])
        for r in adamic_adar(edges, min_shared=2).collect()
    }
    # (1,2) share {3 (deg 2), 0 (deg 3)}; (0,3) share {1, 2} (deg 2 each)
    w2 = round(1 / math.log(2), 12)
    w3 = round(1 / math.log(3), 12)
    assert set(got) == {(1, 2), (0, 3)}
    assert got[(1, 2)][0] == 2 and abs(
        got[(1, 2)][1] - round(w2 + w3, 6)
    ) < 1e-9
    assert got[(0, 3)][0] == 2 and abs(
        got[(0, 3)][1] - round(2 * w2, 6)
    ) < 1e-9


def test_adamic_adar_discounts_hubs_vs_jaccard(spark):
    from ftm_columnstore_spark.operators.graph import adamic_adar

    # pair (1,2) shares a rare neighbor; pair (5,6) shares a hub
    edges = [(1, 3), (2, 3)] + [(5, 0), (6, 0)] + [
        (0, i) for i in range(10, 30)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["node_a"], r["node_b"]): r["aa_score"]
        for r in adamic_adar(df).collect()
    }
    assert got[(1, 2)] > got[(5, 6)]
