"""Property-based spot checks (SURVEY §5 item 5, hypothesis): invariants
that must hold for ANY input, not just the shipped testdata."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.skew import (
    salted_decimal_sum,
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-10**6, max_value=10**6),
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=8, deadline=None)
@given(rows_strategy)
def test_groupby_sum_partition_invariant(spark, rows):
    """Sum of per-group totals == global total (exact, via decimals)."""
    df = spark.createDataFrame(rows, "k string, v long")
    per_group = df.groupBy("k").agg(F.sum("v").alias("t"))
    total_of_groups = per_group.agg(F.sum("t")).collect()[0][0]
    global_total = df.agg(F.sum("v")).collect()[0][0]
    assert total_of_groups == global_total


@settings(max_examples=6, deadline=None)
@given(rows_strategy)
def test_salted_sum_equals_direct_sum(spark, rows):
    """Two-phase salted aggregation is result-invariant for any input."""
    df = spark.createDataFrame(rows, "k string, v long")
    direct = {
        r.k: r.t
        for r in df.groupBy("k").agg(F.sum(F.col("v").cast("decimal(18,2)")).alias("t")).collect()
    }
    salted = {
        r.k: r.t
        for r in salted_decimal_sum(
            df, ["k"], F.col("v").cast("decimal(18,2)"), alias="t", salt_buckets=4
        ).collect()
    }
    assert {k: Decimal(v) for k, v in direct.items()} == {
        k: Decimal(v) for k, v in salted.items()
    }
