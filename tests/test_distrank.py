"""Unit + plan tests for operators/distrank.py — the bin-offset
prefix-sum primitives that replace single-partition global windows
(round-3 VERDICT's three `weak` scale-killers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.distrank import (
    add_global_row_number,
    add_global_row_number_skewed,
    add_global_running_sum,
    distributed_sweep,
    exact_ntile,
    prefix2_bin,
)
from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY

from .conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMALL)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_global_row_number_matches_naive_window(spark):
    """Bin-offset global rank == row_number over the one-partition
    window, including ties on the sort value (tiebreak column) and
    values that collide into the same bin."""
    rows = [(v, i) for i, v in enumerate([5, 3, 3, 9, 1, 7, 3, 9, 0, 2, 8, 8])]
    df = spark.createDataFrame(rows, "v long, id long")
    got = add_global_row_number(df, "v", "id", 0, 9, "rn", n_bins=4)
    naive = df.withColumn("rn", F.row_number().over(Window.orderBy("v", "id")))
    assert sorted(map(tuple, got.select("v", "id", "rn").collect())) == sorted(
        map(tuple, naive.select("v", "id", "rn").collect())
    )


@pytest.mark.parametrize("n", [1, 3, 4, 5, 8, 11, 100])
def test_exact_ntile_matches_builtin(spark, n):
    """exact_ntile(rn, n, 4) must reproduce NTILE(4) for every group
    remainder (n % 4 in 0..3) and the degenerate n < tiles case."""
    df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
    got = df.select("rn", exact_ntile("rn", n, 4).alias("t"))
    ref = df.select("rn", F.ntile(4).over(Window.orderBy("rn")).alias("t"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_distributed_sweep_matches_naive(spark):
    """Distributed running sum + cross-bin lead == the naive global
    window, with (at, delta) tie order (ends before starts)."""
    intervals = [(0, 10), (2, 5), (5, 8), (8, 30), (11, 12), (12, 25), (29, 31)]
    rows = [(s, 1) for s, _ in intervals] + [(e + 1, -1) for _, e in intervals]
    deltas = spark.createDataFrame(rows, "at_us long, delta int")
    got = distributed_sweep(deltas, lo=0, hi=32, n_bins=5, with_next=True)
    w = Window.orderBy("at_us", "delta")
    naive = deltas.select(
        "at_us",
        "delta",
        F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "concurrent"
        ),
        F.lead("at_us").over(w).alias("next_us"),
    )
    cols = ["at_us", "delta", "concurrent", "next_us"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, naive.select(*cols).collect())
    )


def test_global_running_sum_matches_naive_window(spark):
    """Bin-offset running total == SUM OVER (ORDER BY ...) on one
    partition, with duplicate sort values (tiebreak) and negative
    summands."""
    rows = [(v, i, x) for i, (v, x) in enumerate(
        [(5, 10), (3, -2), (3, 7), (9, 1), (1, 4), (7, 0), (3, 3), (9, -5)]
    )]
    df = spark.createDataFrame(rows, "v long, id long, x long")
    got = add_global_running_sum(df, "v", "id", "x", 0, 9, "cum", n_bins=4)
    naive = df.withColumn(
        "cum",
        F.sum("x").over(
            Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    cols = ["v", "id", "x", "cum"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, naive.select(*cols).collect())
    )


def test_skewed_rank_matches_naive_window(spark):
    """Two-level skew-aware rank == row_number over the naive global
    window when one key value owns most of the relation (the power-law
    tie case plain range bins cannot split), including the all-ties
    degenerate relation and strings where the prefix bin must stay
    monotone ('' < 'a' < 'ab' < 'b' < unicode)."""
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(1200):
        k = 1 if i < 900 else rnd.randint(2, 9)  # mega-tie on k=1
        rows.append((k, "".join(rnd.choice("abgz") for _ in range(rnd.randint(0, 4))) + str(i)))
    rows += [(1, w) for w in ["", "a", "ab", "b", "é", "zz"]]
    df = spark.createDataFrame(rows, "k long, w string").withColumn(
        "fb", prefix2_bin("w")
    )
    got = add_global_row_number_skewed(df, "k", "w", "fb", 1, 9, "rn")
    naive = df.withColumn("rn", F.row_number().over(Window.orderBy("k", "w")))
    assert sorted(map(tuple, got.select("k", "w", "rn").collect())) == sorted(
        map(tuple, naive.select("k", "w", "rn").collect())
    )


@pytest.mark.parametrize(
    "name",
    [
        "events_rfm_segmentation",
        "events_max_concurrent_sessions",
        "events_littles_law_audit",
        "agg_abc_classification",
        "window_ntile_quartiles",
        "ab_mann_whitney_u",
        "text_zipf_slope",
    ],
)
def test_no_data_proportional_single_partition_window(spark, name):
    """The three round-3 `weak` queries must sort data-proportional
    relations inside bin-partitioned windows (offsets broadcast back);
    the only single-partition window allowed is the O(bins) offset
    prefix sum."""
    plan = _plan(spark, name)
    assert "hashpartitioning(__bin" in plan, "bin-partitioned window missing"
    assert "BroadcastHashJoin" in plan, "offsets must broadcast back"


def test_empty_relation_yields_empty_not_typeerror(spark):
    """ADVICE r4: an empty relation collects min/max as None — range_bin
    must fall back to lo=hi=0 and produce an empty ranked result, like
    the single-window plans it replaced, not a plan-build TypeError."""
    from pyspark.sql import functions as F

    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.distrank import (
        add_global_row_number,
        add_global_running_sum,
        distributed_sweep,
        range_bin,
    )

    empty = spark.createDataFrame([], "k bigint, v bigint")
    span = empty.agg(F.min("k").alias("lo"), F.max("k").alias("hi")).collect()[0]
    assert span["lo"] is None and span["hi"] is None

    ranked = add_global_row_number(empty, "k", "v", span["lo"], span["hi"], "rn")
    assert ranked.count() == 0
    summed = add_global_running_sum(empty, "k", "v", "v", span["lo"], span["hi"], "cum")
    assert summed.count() == 0

    deltas = spark.createDataFrame([], "at_us bigint, delta int")
    swept = distributed_sweep(deltas, lo=span["lo"], hi=span["hi"])
    assert swept.count() == 0
    # the Column factory itself must also tolerate the None span
    _ = range_bin(F.col("k"), None, None)
