"""Similarity search: brute-force exactness, LSH recall, kNN join."""

import math

import pytest
from pyspark.sql import functions as F

from ftm_columnstore_spark.operators.similarity import (
    brute_force_topk,
    knn_join,
    lsh_topk,
)


@pytest.fixture(scope="module")
def vectors(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)
    ]
    return (
        spark.createDataFrame(rows, ["vec_id", "embedding"])
        .withColumn("embedding", F.col("embedding").cast("array<float>"))
        .cache()
    )


def brute_py(rows, q, k):
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    scored = sorted(
        ((round(cos(r, q), 6), i) for i, r in rows), key=lambda t: (-t[0], t[1])
    )
    return [i for _, i in scored[:k]]


def test_brute_force_matches_python(vectors):
    data = [(r["vec_id"], list(r["embedding"])) for r in vectors.collect()]
    q = data[0][1]
    expected = brute_py([(i, v) for i, v in data], q, 10)
    got = [r["vec_id"] for r in brute_force_topk(vectors, q, k=10).collect()]
    assert got == expected


def test_lsh_topk_recall(vectors):
    q = list(vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    exact = {r["vec_id"] for r in brute_force_topk(vectors, q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in lsh_topk(vectors, q, k=10, num_planes=8, probe_bits=3).collect()
    }
    # multi-probe LSH with generous probing should recover most of top-10
    assert len(exact & approx) >= 5


def test_lsh_topk_portable_recall(vectors):
    from ftm_columnstore_spark.operators.similarity import lsh_topk_portable

    q = list(vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    exact = {r["vec_id"] for r in brute_force_topk(vectors, q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in lsh_topk_portable(
            vectors, q, k=10, num_planes=8, probe_bits=3
        ).collect()
    }
    assert len(exact & approx) >= 5


def test_ivf_topk_portable_recall(vectors):
    from ftm_columnstore_spark.operators.similarity import ivf_topk_portable

    q = list(vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    corpus = vectors.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in brute_force_topk(corpus, q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_topk_portable(
            corpus, q, k=10, n_centroids=8, n_probe=5
        ).collect()
    }
    assert len(approx) == 10
    assert len(exact & approx) >= 4


def test_knn_join(vectors):
    queries = vectors.filter(F.col("vec_id") < 3)
    out = knn_join(queries, vectors, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["cid"], r["cosine"]))
    assert set(by_q) == {0, 1, 2}
    for qid, hits in by_q.items():
        assert len(hits) == 4
        assert hits[0][0] == qid  # self is the nearest
        sims = [s for _, s in hits]
        assert sims == sorted(sims, reverse=True)


def test_ivf_topk_recall(vectors):
    from ftm_columnstore_spark.operators.similarity import ivf_topk

    q = list(vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    exact = {r["vec_id"] for r in brute_force_topk(vectors, q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_topk(vectors, q, k=10, n_centroids=8, n_probe=4).collect()
    }
    assert len(approx) == 10
    assert len(exact & approx) >= 5


def test_brute_force_np_matches_columnar(vectors):
    from ftm_columnstore_spark.operators.similarity import brute_force_topk_np

    q = list(vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    exact = [(r["vec_id"], r["cosine"]) for r in brute_force_topk(vectors, q, k=10).collect()]
    np_out = [(r["vec_id"], r["cosine"]) for r in brute_force_topk_np(vectors, q, k=10).collect()]
    assert np_out == exact


def test_ivf_trained_centroids_recall(vectors):
    from ftm_columnstore_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    cents = kmeans_centroids(vectors, n_centroids=8, sample_size=200)
    assert len(cents) == 8 and len(cents[0]) == 16
    q = list(vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    exact = {r["vec_id"] for r in brute_force_topk(vectors, q, k=10).collect()}
    trained = {
        r["vec_id"]
        for r in ivf_topk(vectors, q, k=10, n_probe=4, centroids=cents).collect()
    }
    assert len(exact & trained) >= 6


def test_ivf_index_build_and_probe(vectors, tmp_path):
    """Persisted IVF index: probe results equal the in-memory ivf_topk
    with the same centroids, and the probe scan is partition-pruned."""
    from ftm_columnstore_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
    )

    spark = vectors.sparkSession
    path = str(tmp_path / "ivf_index")
    cents = build_ivf_index(vectors, path, n_centroids=8)
    assert len(cents) == 8

    q = list(vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    indexed = ivf_topk_indexed(spark, path, q, k=10, n_probe=4)
    got = [(r["vec_id"], r["cosine"]) for r in indexed.collect()]
    want = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(vectors, q, k=10, n_probe=4, centroids=cents).collect()
    ]
    assert got == want

    # the __bucket predicate must prune partitions, not filter rows
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__bucket" in plan.split(
        "PartitionFilters"
    )[1][:200]


def test_knn_join_np_matches_expression_path(spark):
    """The BLAS kNN join returns exactly what the expression form does."""
    import random

    from ftm_columnstore_spark.operators.similarity import knn_join, knn_join_np

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter("vec_id < 4")
    a = sorted(map(tuple, knn_join(q, df, k=3).collect()))
    b = sorted(map(tuple, knn_join_np(q, df, k=3).collect()))
    assert [x[:2] for x in a] == [x[:2] for x in b]  # same neighbours
    for (_, _, ca), (_, _, cb) in zip(a, b):
        assert abs(ca - cb) < 1e-6  # cosines agree to rounding


def test_knn_join_np_empty_query_side(spark):
    from ftm_columnstore_spark.operators.similarity import knn_join_np

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    assert knn_join_np(df.filter("vec_id > 99"), df, k=2).count() == 0


def test_ivf_portable_string_ids(spark):
    """ivf_topk_portable preserves the input id dtype (string ids used to
    raise ValueError via int() coercion)."""
    import numpy as np

    from ftm_columnstore_spark.operators.similarity import ivf_topk_portable

    rows = [
        (f"doc-{i}", [float((i * 7 + j * 3) % 10) / 10 for j in range(8)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    out = ivf_topk_portable(
        df, rows[0][1], k=5, n_centroids=4, n_probe=2
    )
    got = out.collect()
    assert out.schema["vec_id"].dataType.simpleString() == "string"
    assert 0 < len(got) <= 5
    assert all(r["vec_id"].startswith("doc-") for r in got)


def test_ivf_portable_empty_schema_matches_input_dtype(spark):
    from ftm_columnstore_spark.operators.similarity import ivf_topk_portable

    df = spark.createDataFrame(
        [("a", [0.0, 0.0])], "vec_id string, embedding array<float>"
    )
    out = ivf_topk_portable(df, [1.0, 0.0], k=3, n_centroids=2)
    assert out.schema["vec_id"].dataType.simpleString() == "string"
    assert out.count() == 0


def test_kmeans_centroids_portable(spark):
    from ftm_columnstore_spark.operators.similarity import (
        ivf_topk_portable,
        kmeans_centroids_portable,
    )

    # two tight clusters around (1,0) and (0,1); seeds = lowest 2 ids
    rows = [
        (1, [1.0, 0.01]), (2, [0.0, 1.0]),          # seeds, one per cluster
        (3, [0.9, 0.0]), (4, [1.0, 0.1]),
        (5, [0.05, 0.9]), (6, [0.0, 1.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_centroids_portable(df, n_centroids=2, iterations=2)
    assert [cid for cid, _ in cents] == [1, 2]
    (c1, v1), (c2, v2) = cents
    # cluster means land near the cluster axes (quantized at 1e6)
    assert v1[0] > 800_000 and abs(v1[1]) < 100_000
    assert v2[1] > 800_000 and abs(v2[0]) < 100_000

    # trained centroids serve through the same exact path
    out = ivf_topk_portable(
        df, [1.0, 0.0], k=3, n_probe=1, centroids=cents
    ).collect()
    assert [r["vec_id"] for r in out[:1]] == [3]  # exact [0.9, 0] match

    # empty input -> empty centroid list
    assert kmeans_centroids_portable(
        df.where("vec_id > 99"), n_centroids=2
    ) == []


def test_auto_centroid_sizing_formulas():
    """n_centroids defaults derive from corpus size: sqrt(N) for IVF
    probe balance, N/4096 for Σ|cluster|² pair stages — both floored at
    16 (the old fixed default) and capped."""
    from ftm_columnstore_spark.operators.similarity import (
        auto_n_centroids_ivf,
        auto_n_centroids_pairs,
    )

    # floors: tiny corpora keep the old behavior
    assert auto_n_centroids_ivf(0) == 16
    assert auto_n_centroids_ivf(100) == 16
    assert auto_n_centroids_pairs(100) == 16
    # growth: 100× the corpus → 10× the IVF lists, 100× the pair clusters
    assert auto_n_centroids_ivf(1_000_000) == 1000
    assert auto_n_centroids_ivf(100_000_000) == 4096  # capped
    assert auto_n_centroids_pairs(1_000_000) == 245  # ceil(1e6/4096)
    assert auto_n_centroids_pairs(100_000_000) == 24415
    # expected cluster size stays ~target under pairs sizing
    for n in (10**5, 10**6, 10**7):
        k = auto_n_centroids_pairs(n)
        assert n / k <= 4096 + 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        auto_n_centroids_ivf(-1)


def test_semantic_dedup_auto_sizing_scales(spark):
    """semantic_dedup_portable with the None default picks more
    centroids for a bigger corpus (and still returns every input row)."""
    from ftm_columnstore_spark.operators.dedup import semantic_dedup_portable
    from ftm_columnstore_spark.operators.similarity import (
        auto_n_centroids_pairs,
    )

    rows = [
        (i, [float((i * 13 + j * 5) % 17) / 17 + 0.01 for j in range(4)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_portable(df, threshold=0.999999)
    got = out.collect()
    assert len(got) == 300
    # the auto default at N=300 is the floor — same as the old fixed 16
    assert auto_n_centroids_pairs(300) == 16
    n_clusters = len({r["cid"] for r in got})
    assert 1 <= n_clusters <= 16


def test_ivf_topk_auto_sizing(spark):
    """ivf_topk / ivf_topk_portable run with the None default (auto
    count job) and still return exact-cosine-ordered results."""
    from ftm_columnstore_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_portable,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 10) / 10 + 0.01 for j in range(8)])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = ivf_topk_portable(df, rows[0][1], k=5, n_probe=16).collect()
    assert 0 < len(got) <= 5
    got2 = ivf_topk(df, rows[0][1], k=5, n_probe=16).collect()
    assert 0 < len(got2) <= 5
    # the target vector itself ranks first in both
    assert got[0]["vec_id"] == 0 and got2[0]["vec_id"] == 0


def test_nearest_centroid_numpy_path_matches_expr(spark):
    """Past 64 centroids assignment switches to the Arrow numpy matmul;
    on tie-free data it assigns identically to the expression path."""
    from ftm_columnstore_spark.operators.similarity import (
        _nearest_centroid_col,
        _nearest_centroid_expr,
    )

    import random

    rng = random.Random(7)
    cents = [
        [rng.uniform(-1, 1) for _ in range(6)] for _ in range(70)
    ]
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", _nearest_centroid_col(cents, "embedding").alias("b")
        ).collect()
    }
    b = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", _nearest_centroid_expr(cents, "embedding").alias("b")
        ).collect()
    }
    assert a == b
