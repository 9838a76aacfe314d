"""Bucketed-join test: co-located (bucketed) tables join without a
shuffle — the 100 TB strategy for repeated large-fact joins. Asserts the
physical plan has NO shuffle exchange on the join path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # external tables (explicit path) so the static warehouse dir is
    # never touched
    wh = str(tmp_path_factory.mktemp("warehouse"))
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/lineitem_b")
        .saveAsTable("lineitem_b")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/orders_b")
        .saveAsTable("orders_b")
    )
    yield "lineitem_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, ot = bucketed_tables
    # Disable broadcast: at test size Catalyst would broadcast the small
    # side, but bucketing exists for the at-scale regime where both
    # sides are too big to broadcast — that's the plan we assert on.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l = spark.table(lt)
        o = spark.table(ot)
        joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
            F.count("*").alias("n")
        )
        _assert_no_join_shuffle(spark, joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _assert_no_join_shuffle(spark, joined):
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # The join itself must not re-shuffle either bucketed side. (The
    # final small aggregation exchange is expected and fine.)
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert join_section.count("Exchange hashpartitioning(l_orderkey") == 0
    assert join_section.count("Exchange hashpartitioning(o_orderkey") == 0

    # and the result matches the unbucketed join
    base = (
        load_table(spark, SF_SMALL, "lineitem")
        .join(
            load_table(spark, SF_SMALL, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, base.collect()))
