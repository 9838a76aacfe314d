"""The reference's own narrative, reproduced end-to-end on its literal
star schema (FIXTURES.md §A, from /root/reference/medium screenshots):

a second batch of fact rows arrives (transaction_ids 12013/12015,
medium/tbl_registers_updatedd.jpeg rows 9-10); re-running the report job
WITHOUT keyed bookmarks double-counts the first batch
(medium/transaction_by_subscription_report_messed.jpeg — duplicated
transaction_ids), while keyed bookmarks + an idempotent keyed sink
converge to the one-full-run report
(medium/transaction_By_subscription_good.jpeg)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.upsert import (
    upsert_parquet,
)
from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.incremental import (
    BookmarkStore,
    incremental_read,
)

FACT_COLS = (
    "transaction_id long, account_id long, subscription_id long, "
    "paid_amount long, register_date string"
)

#: batch 1 ≈ medium/tbl_registers_normal_start.png
FACT_BATCH1 = [
    (12001, 6679, 673, 90, "2020-01-01"),
    (12002, 6680, 671, 100, "2020-01-01"),
    (12004, 6681, 672, 150, "2020-02-02"),
    (12006, 6682, 675, 200, "2020-03-03"),
    (12008, 6683, 673, 250, "2020-03-03"),
    (12011, 6684, 671, 300, "2020-04-04"),
]
#: batch 2 = the "updated" rows (new keys 12013/12015,
#: medium/tbl_registers_updatedd.jpeg)
FACT_BATCH2 = [
    (12013, 6688, 672, 1990, "2020-05-18"),
    (12015, 6688, 675, 3000, "2020-05-19"),
]

SUBS = [
    (671, "Professional", "Monthly"),
    (672, "Enterprise", "Monthly"),
    (673, "Student", "Monthly"),
    (675, "Professional", "Anual"),
    (677, "Enterprise", "Anual"),
    (679, "Student", "Anual"),
]


def _report(fact, subs):
    """transactions_by_subscription_report: sum(paid_amount) per
    (subscription, name, date) — glue_rds_to_redshift.py:74 with the
    intended columns (SURVEY §8 B7)."""
    return (
        fact.join(subs, "subscription_id")
        .groupBy("subscription_id", "subscription_name", "register_date")
        .agg(F.sum("paid_amount").alias("total"))
    )


def _frames(spark):
    b1 = spark.createDataFrame(FACT_BATCH1, FACT_COLS)
    full = spark.createDataFrame(FACT_BATCH1 + FACT_BATCH2, FACT_COLS)
    subs = spark.createDataFrame(
        SUBS, "subscription_id long, subscription_name string, subscription_type string"
    )
    return b1, full, subs


def test_naive_rerun_duplicates_report_rows(spark, tmp_path):
    """Bookmarks off: run 2 re-reads the whole table and appends —
    batch-1 totals appear twice (the 'messed' report)."""
    b1, full, subs = _frames(spark)
    out = str(tmp_path / "messed")
    _report(b1, subs).write.mode("append").parquet(out)
    _report(full, subs).write.mode("append").parquet(out)

    messed = spark.read.parquet(out)
    groups = messed.groupBy("subscription_id", "register_date").count()
    assert groups.filter(F.col("count") > 1).count() > 0, (
        "naive rerun must duplicate batch-1 report rows"
    )
    # totals are now wrong: the appended report double-counts batch 1
    summed = messed.agg(F.sum("total")).collect()[0][0]
    true_total = sum(r[3] for r in FACT_BATCH1 + FACT_BATCH2)
    assert summed > true_total


def test_keyed_bookmarks_converge_to_good_report(spark, tmp_path):
    """Bookmarks on (transaction_id asc) + keyed merge sink: after the
    second batch arrives, the standing report equals one full run —
    every transaction counted exactly once."""
    b1, full, subs = _frames(spark)
    store = BookmarkStore(str(tmp_path / "bm.json"))
    report_dir = str(tmp_path / "good")
    keys = ["subscription_id", "subscription_name", "register_date"]

    # run 1: only batch 1 exists
    batch = incremental_read(b1, "transaction_id", store, "trial_register")
    delta = _report(batch.df, subs)
    upsert_parquet(spark, report_dir, delta, keys=keys)
    batch.commit()

    # run 2: full table visible, bookmark filters to the new keys
    batch2 = incremental_read(full, "transaction_id", store, "trial_register")
    new_ids = {r.transaction_id for r in batch2.df.select("transaction_id").collect()}
    assert new_ids == {12013, 12015}, "bookmark must admit only the new keys"
    delta2 = _report(batch2.df, subs)
    upsert_parquet(spark, report_dir, delta2, keys=keys)
    batch2.commit()

    good = spark.read.parquet(report_dir).select(
        "subscription_id", "subscription_name", "register_date", "total"
    )
    expected = _report(full, subs)
    assert good.count() == expected.count()
    assert good.exceptAll(expected).count() == 0
    assert expected.exceptAll(good).count() == 0
