"""Arbitrary stateful streaming via Spark 4's ``transformWithStateInPandas``.

The reference's bookmark keeps ONE global high-water-mark per source
(glue_rds_to_redshift.py:31,35,40). The modern Spark-native
generalization is the StatefulProcessor API: typed per-key state
variables in the checkpointed state store, Arrow-batched user logic, and
exactly-once semantics across restarts. Here it maintains per-user
running totals — the streaming twin of the batch
``groupBy(user).agg(count, sum)`` report, emitting the updated total for
every user touched by each micro-batch.

State is one (n, total) pair per user — O(keys), never O(events) — so
the operator runs indefinitely at any scale; at 100 TB the state store
is RocksDB on the executors, and this code is unchanged.

Environment note: transformWithState's Python↔JVM state channel is
protobuf-encoded, so running it requires the ``protobuf`` package
(absent from this container — the pytest coverage importorskips it).
The operator definition itself has no protobuf dependency.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (count, sum) with a single ValueState cell."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals",
            StructType(
                [StructField("n", LongType()), StructField("total", DoubleType())]
            ),
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = 0, 0.0
        if self._totals.exists():
            n, total = self._totals.get()
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Keyed stateful transform: updated per-user totals per micro-batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_running_totals(spark, source_dir: str, checkpoint_dir: str, out_dir: str) -> None:
    """One availableNow pass: emit updated totals, append with batch id
    so a reader can take the latest row per user."""
    from pyspark.sql import functions as F

    from .incremental import read_events_stream

    # transformWithState requires the RocksDB state store provider (the
    # default HDFS-backed provider doesn't implement the new API).
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    events = read_events_stream(spark, source_dir)
    totals = running_user_totals_stream(events)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    q = (
        totals.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_write)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
