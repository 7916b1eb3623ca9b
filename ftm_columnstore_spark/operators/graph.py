"""Graph operators: inverted lookup, 1-hop adjacency, reverse semi-join
(SURVEY §2.3 J1/J2, §2.2 F7).

All three are fixed-shape equi-self-joins on the statement table; the
reference runs them as ClickHouse SQL with a ``value``-sorted projection
(``engine.py:236-262``). In Spark the frontier side (one entity's ids, or
one id) is tiny, so we broadcast it and no shuffle of the big table occurs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ftm_columnstore_spark.model.ftm import REVERSE_PROPS


def _reverse_prop_expr(col: str = "prop") -> F.Column:
    pairs: list[F.Column] = []
    for prop, rev in REVERSE_PROPS.items():
        pairs.append(F.lit(prop))
        pairs.append(F.lit(rev))
    mapping = F.create_map(*pairs)
    return F.coalesce(mapping[F.col(col)], F.concat(F.col(col), F.lit("Reverse")))


def inverted(statements: DataFrame, value_id: str) -> DataFrame:
    """Incoming edges of ``value_id``: statements whose ``prop_type='entity'``
    value references it, with the reversed FtM prop name
    (reference ``tests/test_store.py:31-38``).

    Returns (reversed_prop, referencing_canonical_id).
    """
    return (
        statements.filter(
            (F.col("prop_type") == "entity") & (F.col("value") == value_id)
        )
        .select(
            _reverse_prop_expr().alias("prop"),
            F.col("canonical_id").alias("entity_id"),
        )
        .distinct()
    )


def reverse_ids(statements: DataFrame, value_id: str) -> DataFrame:
    """Canonical ids of entities referencing ``value_id`` (F7 reverse
    filter): used as a left-semi join against the statement table."""
    return (
        statements.filter(
            (F.col("prop_type") == "entity") & (F.col("value") == value_id)
        )
        .select("canonical_id")
        .distinct()
    )


def expand(
    statements: DataFrame,
    entity_ids: list[str],
    hops: int = 2,
) -> DataFrame:
    """K-hop entity neighbourhood — the investigative "everything within
    N hops of this company" query the reference stops short of (its
    ``get_adjacent`` is 1-hop, tests/test_store.py:40-41). Frontier BFS
    over the entity-reference edges: per hop, outgoing (frontier's
    entity-typed values) ∪ incoming (statements referencing the
    frontier), minus already-visited — each hop is two broadcast joins
    of the (tiny) frontier against the statement table plus one
    anti-join, so no shuffle of the big side and bounded driver rounds
    (early exit on an empty frontier). Returns (id, dist) with the
    minimum hop distance, dist 0 = the seeds."""
    spark = statements.sparkSession
    visited = spark.createDataFrame(
        [(e, 0) for e in entity_ids], "id string, dist int"
    )
    frontier = visited.select("id")
    edges = statements.filter(F.col("prop_type") == "entity").select(
        "canonical_id", "value"
    )
    for h in range(1, hops + 1):
        out_ids = edges.join(
            F.broadcast(frontier), edges.canonical_id == frontier.id
        ).select(F.col("value").alias("id"))
        in_ids = edges.join(
            F.broadcast(frontier), edges.value == frontier.id
        ).select(F.col("canonical_id").alias("id"))
        # eager localCheckpoint (the connected-components pattern): cuts
        # the per-hop lineage growth and leaves no stranded cache entries
        nxt = (
            out_ids.union(in_ids)
            .distinct()
            .join(visited, on="id", how="left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(
            nxt.withColumn("dist", F.lit(h))
        ).localCheckpoint(eager=True)
        frontier = nxt.select("id")
    return visited


def adjacent(statements: DataFrame, entity_id: str) -> DataFrame:
    """1-hop neighbourhood (reference ``tests/test_store.py:40-41``):
    outgoing (this entity's entity-typed values) ∪ incoming (inverted).

    Returns (prop, neighbour_id, direction).
    """
    mine = statements.filter(
        (F.col("canonical_id") == entity_id) | (F.col("entity_id") == entity_id)
    )
    out_edges = (
        mine.filter(F.col("prop_type") == "entity")
        .select(
            F.col("prop"),
            F.col("value").alias("neighbour_id"),
            F.lit("out").alias("direction"),
        )
        .distinct()
    )
    in_edges = inverted(statements, entity_id).select(
        F.col("prop"),
        F.col("entity_id").alias("neighbour_id"),
        F.lit("in").alias("direction"),
    )
    return out_edges.unionByName(in_edges)


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank (Page et al. 1999) over an edge list —
    the investigative "which entity is most central in this payment
    network" score. Simplified formulation (no dangling-mass
    redistribution; dangling nodes hold the base rank ``1 - damping``),
    which keeps every iteration a pure join+groupBy and makes the result
    reproducible in plain SQL for audits (the unrolled-iteration oracle).

    Scale shape: rank updates are one shuffle per iteration — join ranks
    to edges on src (out-degree pre-joined once), groupBy dst. Per-
    iteration ``localCheckpoint(eager=True)`` cuts lineage growth (the
    same pattern as :func:`expand` / connected components), so 20
    iterations on a billion-edge graph neither re-executes the chain nor
    strands cache. Convergence-based stopping would need a driver-side
    delta per round; fixed iterations keep rounds deterministic.

    Inflow is accumulated in decimal(28,12), not double: decimal
    addition is associative, so Spark's partial-aggregation order (which
    varies with partitioning) cannot wobble ranks in the last ulps —
    ranks are bit-identical run-to-run and engine-to-engine (the share
    is quantized to 12 dp at the cast; a SQL oracle replays it with the
    same ``::DECIMAL(28,12)`` cast). Costs ~2× the plain double sum —
    the price of auditability, same trade the TPC-H money sums make.

    Returns (id, rank) for every node appearing as src or dst."""
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # contribution edges with the sender's out-degree attached, reused
    # every iteration — computed and checkpointed once
    contrib_edges = e.join(outdeg, on="src").localCheckpoint(eager=True)
    base = F.lit(1.0 - damping)
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        inflow = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outdeg"))
                .cast("decimal(28,12)")
                .alias("share"),
            )
            .groupBy("id")
            .agg(F.sum("share").cast("double").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, on="id", how="left")
            .select(
                "id",
                (
                    base + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
