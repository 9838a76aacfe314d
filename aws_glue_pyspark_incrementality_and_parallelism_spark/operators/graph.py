"""Graph analytics over relational entity graphs: distributed PageRank.

Completes the iterative-operator family (k-means refinement in
``similarity.py``, connected components in ``dedup.py``) with the
classic link-analysis loop: rank propagation over a directed edge
relation via join + re-aggregation per iteration.

Scale design: the edge relation (with precomputed out-degrees) is the
loop invariant — materialized once and reused every iteration; only the
O(nodes) rank relation is rewritten per pass, and only two scalars
(dangling mass, convergence delta) ever cross the driver boundary.
At 100 TB the localCheckpoints become ``persist(DISK)`` + checkpoint
to object storage; the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table

DAMPING = 0.85
PAGERANK_ITERS = 8


def pagerank(edges: DataFrame, n_iters: int = PAGERANK_ITERS, damping: float = DAMPING) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Returns ``(node, rank)`` with ranks summing to the node count
    (the random-surfer convention scaled by n). Nodes with no
    out-edges (dangling) redistribute their mass uniformly each
    iteration — the scalar dangling sum is the only per-iteration
    driver round-trip besides the loop counter.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # Loop invariant: every edge annotated with its source's fan-out.
    fanout = (
        edges.join(out_deg, "src")
        .select("src", "dst", "out_deg")
        .localCheckpoint(eager=True)
    )

    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(n_iters):
        contribs = (
            fanout.join(ranks, fanout.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("incoming"))
        )
        # Mass sitting on dangling nodes (no out-edges) this round.
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        base = (1.0 - damping) + damping * dangling / n_nodes
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("incoming"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


@query("graph_pagerank_parts", oracle=None)
def q_graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite part→supplier fulfillment graph
    (distinct lineitem (partkey, suppkey) pairs as directed edges; node
    ids namespaced by sign). Suppliers are all dangling, exercising the
    dangling-mass redistribution path. Rows-only check: iterative
    fixpoints aren't SQL-expressible; invariants (mass conservation,
    monotone convergence) are asserted in pytest."""
    l = load_table(spark, sf_dir, "lineitem")
    edges = (
        l.select(
            F.col("l_partkey").alias("src"),
            (-F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges)
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(20)
