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

#: Below this node count the rank vector is broadcast into the
#: contribution join (no shuffle of the edge relation per pass). Above
#: it — a web-scale vertex set — the join falls back to shuffle
#: hash/sort-merge, which is the only strategy that works when the rank
#: vector itself no longer fits in one executor.
BROADCAST_RANKS_MAX_NODES = 5_000_000


def pagerank(edges: DataFrame, n_iters: int = PAGERANK_ITERS, damping: float = DAMPING) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Returns ``(node, rank)`` with ranks summing to the node count
    (the random-surfer convention scaled by n). Nodes with no
    out-edges (dangling) redistribute their mass uniformly each
    iteration.

    Iteration shape: ONE Spark action per pass (the eager checkpoint of
    the new rank vector). The dangling mass is a 1-row aggregate
    broadcast-crossed into the update — never a driver ``collect()`` —
    so passes don't serialize on Python round-trips; the dangling set
    membership is a static per-node flag computed once, not a per-pass
    anti join. When the vertex set is small enough the rank vector is
    broadcast into the contribution join, leaving the (much larger)
    edge relation entirely unshuffled per pass.
    """
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # Loop invariant: every edge annotated with its source's fan-out.
    fanout = (
        edges.join(out_deg, "src")
        .select("src", "dst", "out_deg")
        .localCheckpoint(eager=True)
    )
    # Loop invariant: vertex set with its static dangling flag.
    deg_keys = out_deg.select(F.col("src").alias("deg_src"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(deg_keys, F.col("node") == F.col("deg_src"), "left")
        .select("node", F.col("deg_src").isNull().alias("is_dangling"))
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    broadcast_ranks = n_nodes <= BROADCAST_RANKS_MAX_NODES

    ranks = (
        nodes.select("node", "is_dangling", F.lit(1.0).alias("rank"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iters):
        rank_vec = F.broadcast(ranks) if broadcast_ranks else ranks
        contribs = (
            fanout.join(rank_vec, fanout.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("incoming"))
        )
        # Mass sitting on dangling nodes this round: a 1-row relation,
        # folded in via broadcast instead of collected to the driver.
        dangling = ranks.filter("is_dangling").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass")
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "is_dangling",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.col("dangling_mass") / F.lit(float(n_nodes))
                    + F.lit(damping) * F.coalesce(F.col("incoming"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank")


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
