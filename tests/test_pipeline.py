"""End-to-end pipeline test: incremental two-run execution produces the
same reports as a single full run (the reference's core guarantee)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark import pipeline
from aws_glue_pyspark_incrementality_and_parallelism_spark.operators import reports
from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table

from .conftest import SF_SMALL


def test_full_run_matches_report_operators(spark, tmp_path):
    out = str(tmp_path / "out")
    res = pipeline.run_etl(spark, SF_SMALL, out)
    assert res.committed_hwm == (
        load_table(spark, SF_SMALL, "lineitem").agg(F.max("l_orderkey")).collect()[0][0]
    )
    got = spark.read.parquet(res.output_paths["sales_by_supplier"])
    expected = reports.sales_by_supplier(spark, SF_SMALL)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_rerun_is_noop_and_preserves_outputs(spark, tmp_path):
    out = str(tmp_path / "out")
    first = pipeline.run_etl(spark, SF_SMALL, out)
    assert first.report_rows["sales_by_customer"] > 0
    second = pipeline.run_etl(spark, SF_SMALL, out)
    assert second.report_rows == {}, "no new fact rows -> no work"
    assert second.committed_hwm == first.committed_hwm
    # outputs from run 1 untouched
    n = spark.read.parquet(first.output_paths["sales_by_customer"]).count()
    assert n == first.report_rows["sales_by_customer"]


def test_pipeline_observation_metrics(spark, tmp_path):
    """The data-quality observation must report the joined row count and
    zero null prices, collected from the same action that wrote the
    reports (no extra scan)."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark import pipeline

    res = pipeline.run_etl(spark, SF_SMALL, str(tmp_path / "out"))
    assert res.metrics is not None
    assert res.metrics["joined_rows"] > 0
    assert res.metrics["null_prices"] == 0
    assert res.metrics["min_orderdate"] <= res.metrics["max_orderdate"]
