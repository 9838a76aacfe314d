"""Custom stateful operator test: per-key HWM dedup across two
checkpointed incremental runs (state survives restart; re-delivered
events are dropped)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.streaming import incremental as si
from aws_glue_pyspark_incrementality_and_parallelism_spark.streaming import stateful

from .conftest import SF_SMALL


def _run(spark, src, ckpt, out):
    events = si.read_events_stream(spark, src)
    deduped = stateful.hwm_dedup_stream(events)

    def _write(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(_write)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_keyed_hwm_dedup_across_runs(spark, tmp_path):
    tmp = str(tmp_path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(SF_SMALL, "events.parquet"))
    cut = raw.agg(F.expr("percentile(event_id, 0.5)")).collect()[0][0]
    src = os.path.join(tmp, "src")
    ckpt = os.path.join(tmp, "ckpt")
    out = os.path.join(tmp, "out")

    batch1 = raw.filter(F.col("event_id") <= cut)
    batch1.write.parquet(src)
    _run(spark, src, ckpt, out)
    n1 = spark.read.parquet(out).count()
    assert n1 == batch1.count()

    # second delivery: re-sends some already-seen events + new ones
    resend = raw.filter(
        (F.col("event_id") > cut * 0.8) & (F.col("event_id") <= cut)
    )
    fresh = raw.filter(F.col("event_id") > cut)
    resend.unionByName(fresh).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)

    final = spark.read.parquet(out)
    # every event exactly once, despite the redelivery
    assert final.count() == raw.count()
    dup = final.groupBy("user_id", "event_id").count().filter(F.col("count") > 1).count()
    assert dup == 0


def test_drop_duplicates_within_watermark_across_runs(spark, tmp_path):
    """Redelivered (user_id, event_id) pairs within the watermark
    horizon are dropped across checkpointed runs; fresh events pass."""
    tmp = str(tmp_path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(SF_SMALL, "events.parquet"))
    cut = raw.agg(F.expr("percentile(event_id, 0.5)")).collect()[0][0]
    src = os.path.join(tmp, "src")
    ckpt = os.path.join(tmp, "ckpt")
    out = os.path.join(tmp, "out")

    def _run():
        events = si.read_events_stream(spark, src)
        deduped = stateful.dedup_within_watermark_stream(events)
        q = (
            deduped.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch1 = raw.filter(F.col("event_id") <= cut)
    batch1.write.parquet(src)
    _run()
    assert spark.read.parquet(out).count() == batch1.count()

    resend = raw.filter(
        (F.col("event_id") > cut * 0.8) & (F.col("event_id") <= cut)
    )
    fresh = raw.filter(F.col("event_id") > cut)
    resend.unionByName(fresh).write.mode("append").parquet(src)
    _run()

    final = spark.read.parquet(out)
    assert final.count() == raw.count()
    dup = final.groupBy("user_id", "event_id").count().filter(F.col("count") > 1).count()
    assert dup == 0
