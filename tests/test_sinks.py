"""Sink tests: partitioned writes and dynamic partition overwrite (the
idempotent at-scale sink pattern — rewriting one day's partition never
touches the others)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table, write_parquet

from .conftest import SF_SMALL


def test_partitioned_write_layout(spark, tmp_path):
    out = str(tmp_path / "events_by_type")
    events = load_table(spark, SF_SMALL, "events")
    write_parquet(events, out, partition_by=["event_type"])
    dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert dirs == {
        f"event_type={t}"
        for t in ("click", "view", "purchase", "signup", "error")
    }
    # partition pruning: reading one partition scans only that directory
    one = spark.read.parquet(out).filter(F.col("event_type") == "click")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = one._jdf.queryExecution().explainString(mode)
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_dynamic_partition_overwrite_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "dyn")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        events = load_table(spark, SF_SMALL, "events")
        write_parquet(events, out, partition_by=["event_type"])
        total = spark.read.parquet(out).count()

        # rewrite ONLY the 'click' partition (e.g. a late-data restatement)
        clicks = events.filter(F.col("event_type") == "click")
        write_parquet(clicks, out, mode="overwrite", partition_by=["event_type"])

        after = spark.read.parquet(out)
        assert after.count() == total, "other partitions must be untouched"
        assert after.filter(F.col("event_type") == "click").count() == clicks.count()
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_compact_parquet_dir_preserves_data(spark, tmp_path):
    """Compaction: many small append files become few right-sized ones;
    row set is byte-identical before/after."""
    from pyspark.sql import functions as F

    from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import (
        compact_parquet_dir,
        load_table,
    )
    from .conftest import SF_SMALL

    out = str(tmp_path / "sink")
    orders = load_table(spark, SF_SMALL, "orders")
    # simulate 12 micro-batch appends
    for i in range(12):
        orders.filter(F.col("o_orderkey") % 12 == i).coalesce(1).write.mode(
            "append"
        ).parquet(out)

    before = spark.read.parquet(out)
    n_before = before.count()
    checksum_before = before.agg(
        F.sum(F.crc32(F.concat_ws("|", "o_orderkey", "o_orderstatus")))
    ).collect()[0][0]

    stats = compact_parquet_dir(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] >= 12
    assert stats["files_after"] < stats["files_before"]

    after = spark.read.parquet(out)
    assert after.count() == n_before
    checksum_after = after.agg(
        F.sum(F.crc32(F.concat_ws("|", "o_orderkey", "o_orderstatus")))
    ).collect()[0][0]
    assert checksum_after == checksum_before
