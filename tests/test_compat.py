"""Glue-compat façade: the reference's job code shape (bugs fixed) must
run on this engine through create_dynamic_frame / Join.apply /
SelectFields.apply / write_dynamic_frame, with job bookmarks giving the
no-duplicates incremental guarantee the reference's screenshots
document."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark import compat
from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table

from .conftest import SF_SMALL


def _run_reference_shaped_job(spark, sf_dir, out_dir):
    """The reference pipeline transposed onto the testdata star schema:
    lineitem (fact) joined to orders and customer, projected, grouped,
    written — glue_rds_to_redshift.py:28-65 with bugs B2-B7 fixed."""
    ctx = compat.GlueCompatContext(spark, sf_dir, out_dir, job_bookmarks=True)
    fact = ctx.create_dynamic_frame.from_catalog(
        database="testdata",
        table_name="lineitem",
        transformation_ctx="src_lineitem",
        additional_options={"jobBookmarkKeys": ["l_orderkey"], "jobBookmarkKeysSortOrder": "asc"},
    )
    orders = ctx.create_dynamic_frame.from_catalog(
        database="testdata", table_name="orders", transformation_ctx="src_orders"
    )
    customer = ctx.create_dynamic_frame.from_catalog(
        database="testdata", table_name="customer", transformation_ctx="src_customer"
    )
    fact = fact.rename_field("l_orderkey", "trn_orderkey")
    joined = compat.Join.apply(
        compat.Join.apply(fact, orders, "trn_orderkey", "o_orderkey"),
        customer,
        "o_custkey",
        "c_custkey",
    )
    selected = compat.SelectFields.apply(
        frame=joined,
        paths=["trn_orderkey", "o_custkey", "c_name", "l_extendedprice", "no_such_column"],
    )
    report = (
        selected.toDF()
        .groupBy("o_custkey", "c_name")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("total"))
    )
    ctx.write_dynamic_frame.from_options(
        compat.DynamicFrameShim.fromDF(report, ctx, "report"),
        connection_options={"dbtable": "sales_report"},
    )
    ctx.commit_bookmarks()
    return report


def test_compat_job_matches_native_join(spark, tmp_path):
    out = str(tmp_path / "out")
    report = _run_reference_shaped_job(spark, SF_SMALL, out)
    got = spark.read.parquet(os.path.join(out, "sales_report"))

    l = load_table(spark, SF_SMALL, "lineitem")
    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer")
    expected = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", "c_name")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("total"))
    )
    assert got.count() == expected.count() > 0
    assert expected.exceptAll(got).count() == 0
    # SelectFields ignored the absent path instead of failing
    assert "no_such_column" not in report.columns


def test_compat_join_keeps_both_keys_and_decollides(spark):
    ctx = compat.GlueCompatContext(spark, SF_SMALL, "/tmp/unused-compat")
    a = compat.DynamicFrameShim(
        spark.createDataFrame([(1, "x")], "k long, name string"), ctx
    )
    b = compat.DynamicFrameShim(
        spark.createDataFrame([(1, "y")], "kk long, name string"), ctx
    )
    j = compat.Join.apply(a, b, "k", "kk").toDF()
    # Glue keeps both key columns; colliding non-key names get _2
    assert set(j.columns) == {"k", "kk", "name", "name_2"}
    row = j.collect()[0]
    assert row.k == row.kk == 1 and row.name == "x" and row.name_2 == "y"


def test_compat_bookmarks_skip_seen_rows(spark, tmp_path):
    """Second run over the same catalog reads zero new fact rows — the
    exact incremental semantic whose absence produced the duplicated
    report rows in the reference's screenshots."""
    out = str(tmp_path / "out")
    _run_reference_shaped_job(spark, SF_SMALL, out)
    first = spark.read.parquet(os.path.join(out, "sales_report")).count()

    ctx2 = compat.GlueCompatContext(spark, SF_SMALL, out, job_bookmarks=True)
    fact2 = ctx2.create_dynamic_frame.from_catalog(
        database="testdata",
        table_name="lineitem",
        transformation_ctx="src_lineitem",
        additional_options={"jobBookmarkKeys": ["l_orderkey"], "jobBookmarkKeysSortOrder": "asc"},
    )
    assert fact2.count() == 0, "bookmarked source must only yield rows past the committed HWM"
    assert first > 0
