"""Streaming incremental pipeline tests: checkpointed file-source
exactly-once (the bookmark analog), watermark behavior, and equivalence
with the batch rollup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table
from aws_glue_pyspark_incrementality_and_parallelism_spark.streaming import incremental as si

from .conftest import SF_SMALL


def _split_events(spark, tmp):
    """Events as two append batches split on event time."""
    events_raw = spark.read.parquet(os.path.join(SF_SMALL, "events.parquet"))
    # keep raw long ts (streaming source reads the raw schema)
    cut = events_raw.agg(F.expr("percentile(ts, 0.5)")).collect()[0][0]
    src = os.path.join(tmp, "stream_src")
    events_raw.filter(F.col("ts") <= cut).write.parquet(src)
    later = events_raw.filter(F.col("ts") > cut)
    return src, later


def test_incremental_stream_no_duplicates(spark, tmp_path):
    tmp = str(tmp_path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src, later = _split_events(spark, tmp)
    ckpt = os.path.join(tmp, "ckpt")
    out = os.path.join(tmp, "out")

    si.run_incremental_stream(spark, src, ckpt, out, watermark="100 hours")
    n_after_run1 = spark.read.parquet(out).agg(F.sum("n_events")).collect()[0][0]
    assert n_after_run1 > 0

    # Second batch of files arrives; rerun picks up ONLY the new files.
    later.write.mode("append").parquet(src)
    si.run_incremental_stream(spark, src, ckpt, out, watermark="100 hours")

    # Sum of per-batch deltas == one full batch rollup (no double counting
    # even though run 2 re-saw the run-1 directory).
    got = (
        spark.read.parquet(out)
        .groupBy("window_start", "event_type")
        .agg(F.sum("n_events").alias("n_events"))
    )
    expected = (
        load_table(spark, SF_SMALL, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_rerun_without_new_files_is_noop(spark, tmp_path):
    tmp = str(tmp_path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src, _ = _split_events(spark, tmp)
    ckpt = os.path.join(tmp, "ckpt")
    out = os.path.join(tmp, "out")

    si.run_incremental_stream(spark, src, ckpt, out, watermark="100 hours")
    total1 = spark.read.parquet(out).agg(F.sum("n_events")).collect()[0][0]
    si.run_incremental_stream(spark, src, ckpt, out, watermark="100 hours")
    total2 = spark.read.parquet(out).agg(F.sum("n_events")).collect()[0][0]
    assert total1 == total2, "rerun with no new files must process nothing"
