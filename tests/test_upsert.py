from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.upsert import upsert_parquet
from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table

from .conftest import SF_SMALL


def test_upsert_updates_and_inserts(spark, tmp_path):
    target = os.path.join(str(tmp_path), "customers")
    base = load_table(spark, SF_SMALL, "customer")
    upsert_parquet(spark, target, base, keys=["c_custkey"])
    assert spark.read.parquet(target).count() == base.count()

    # update 10 customers' balance, insert 5 new ones
    updates = (
        base.filter(F.col("c_custkey") < 10)
        .withColumn("c_acctbal", F.lit(99999.0))
        .unionByName(
            base.filter(F.col("c_custkey") < 5).withColumn(
                "c_custkey", F.col("c_custkey") + 1_000_000
            )
        )
    )
    upsert_parquet(spark, target, updates, keys=["c_custkey"])

    after = spark.read.parquet(target)
    assert after.count() == base.count() + 5
    assert after.filter(F.col("c_custkey") < 10).filter(F.col("c_acctbal") != 99999.0).count() == 0
    assert after.filter(F.col("c_custkey") >= 1_000_000).count() == 5
    # keys unique after merge
    assert after.groupBy("c_custkey").count().filter(F.col("count") > 1).count() == 0


def test_upsert_idempotent(spark, tmp_path):
    target = os.path.join(str(tmp_path), "t")
    base = load_table(spark, SF_SMALL, "supplier")
    upsert_parquet(spark, target, base, keys=["s_suppkey"])
    upsert_parquet(spark, target, base, keys=["s_suppkey"])
    after = spark.read.parquet(target)
    assert after.count() == base.count()
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, base.collect()))
