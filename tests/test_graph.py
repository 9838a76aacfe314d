"""PageRank invariants: mass conservation, dangling handling, ranking
sanity on a hand-computable graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.graph import pagerank

from .conftest import SF_SMALL


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_mass_conservation(spark):
    # Strongly connected 3-cycle: total rank mass == n, all equal by symmetry.
    r = _ranks(spark, [(1, 2), (2, 3), (3, 1)])
    assert sum(r.values()) == pytest.approx(3.0, rel=1e-6)
    assert max(r.values()) == pytest.approx(min(r.values()), rel=1e-9)


def test_dangling_mass_redistributed(spark):
    # 1->2, 2 is dangling; without redistribution mass leaks each pass.
    r = _ranks(spark, [(1, 2)], n_iters=20)
    assert sum(r.values()) == pytest.approx(2.0, rel=1e-4)
    assert r[2] > r[1]  # 2 receives 1's mass plus its share of dangling


def test_hub_outranks_leaves(spark):
    # Star pointing at node 0: the sink hub must dominate.
    r = _ranks(spark, [(i, 0) for i in range(1, 6)])
    assert r[0] > max(v for k, v in r.items() if k != 0) * 2


def test_registry_query_runs(spark):
    from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY

    out = REGISTRY["graph_pagerank_parts"].fn(spark, SF_SMALL)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"node", "rank"}
    # The high-rank tier is exactly the suppliers (negative ids): they
    # absorb the fact-side mass, parts sit near the teleport floor.
    assert all(r["node"] < 0 for r in rows)
    assert all(r["rank"] >= 1.0 for r in rows)
