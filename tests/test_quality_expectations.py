"""Planted-violation tests for the expectation suite: the parquet
fixtures are clean (every check reads 0 violations), so these are the
tests that prove the counters actually count."""

from __future__ import annotations

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.queries_quality import (
    expectation_suite,
)


def _suite(spark, orders_rows, cust_keys):
    orders = spark.createDataFrame(
        orders_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    cust = spark.createDataFrame([(k,) for k in cust_keys], "c_custkey long")
    return {r.expectation: r for r in expectation_suite(orders, cust).collect()}


def test_clean_input_passes_all(spark):
    out = _suite(
        spark,
        [(1, 10, "O", 5.0), (2, 11, "F", 7.5)],
        [10, 11],
    )
    assert all(r.passed and r.n_violations == 0 for r in out.values())
    assert len(out) == 5


def test_each_violation_is_counted_by_exactly_its_check(spark):
    rows = [
        (1, 10, "O", 5.0),
        (1, 10, "O", 6.0),  # duplicate orderkey (1 extra copy)
        (2, None, "F", 7.5),  # null custkey
        (3, 99, "P", 8.0),  # orphan FK (99 not in customer)
        (4, 11, "X", 9.0),  # status outside domain
        (5, 11, "O", -2.0),  # negative price
    ]
    out = _suite(spark, rows, [10, 11])
    assert out["orderkey_unique"].n_violations == 1
    assert out["custkey_not_null"].n_violations == 1
    # the NULL custkey also cannot match the FK join -> orphan too
    assert out["custkey_fk_exists"].n_violations == 2
    assert out["orderstatus_in_domain"].n_violations == 1
    assert out["totalprice_non_negative"].n_violations == 1
    assert not any(r.passed for r in out.values())


def test_violation_isolation(spark):
    # one bad status only: every OTHER check still passes
    out = _suite(spark, [(1, 10, "Z", 1.0), (2, 10, "O", 2.0)], [10])
    assert out["orderstatus_in_domain"].n_violations == 1
    assert not out["orderstatus_in_domain"].passed
    for name in (
        "orderkey_unique",
        "custkey_not_null",
        "custkey_fk_exists",
        "totalprice_non_negative",
    ):
        assert out[name].passed, name
