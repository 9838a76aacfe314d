"""Keyed upsert (MERGE) into a parquet target — the update-capture gap
in bookmark-style incrementality, closed.

Keyed bookmarks deliberately skip in-place UPDATEs to already-seen keys
(SURVEY §7: the reference's screenshots show updated rows silently
missed). CDC pipelines therefore need an apply step: new version of a
key replaces the old one, unseen keys append.

Plain parquet has no row-level transaction log (that's Delta/Iceberg),
so the merge is copy-on-write: ``target ⟕anti updates ∪ updates``
rewritten atomically via a staging directory rename. At scale you would
partition the target and rewrite only partitions containing updated
keys (dynamic partition overwrite — see tests/test_sinks.py); table
formats with merge-on-read take it from there.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def upsert_parquet(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    keys: list[str],
) -> None:
    """MERGE ``updates`` into the parquet table at ``target_dir`` by key.

    Last-writer-wins per key. Copy-on-write: the merged result lands in
    a staging dir, then swaps in (rename is atomic on posix local/ HDFS;
    object stores need a manifest commit instead).
    """
    if os.path.exists(target_dir):
        target = spark.read.parquet(target_dir)
        kept = target.join(updates.select(*keys), on=keys, how="left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates

    staging = f"{target_dir}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    # the read above is fully materialized by the write; swap dirs
    backup = f"{target_dir}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(target_dir):
        os.rename(target_dir, backup)
    os.rename(staging, target_dir)
    if os.path.exists(backup):
        shutil.rmtree(backup)
