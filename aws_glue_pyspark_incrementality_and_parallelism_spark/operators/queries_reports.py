"""Registry entries for the flagship report pipeline (SURVEY §2.1-2.6).

Covers: parquet scans (S1/S2), rename (P1), projection (P2), equi inner
joins (J1/J2), grouped sum aggregations (A1/A2), alias (A3), and the
incremental-scan predicate (S3) as a fixed-HWM query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table
from . import reports

_BOOKMARK_HWM = 500  # fixed literal so the oracle is reproducible at every SF


@query(
    "report_sales_by_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, CAST(o.o_orderdate AS DATE) AS order_date,
           ROUND(SUM(l.l_extendedprice), 2) AS total
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2, 3
    """,
)
def q_report_sales_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference users-report (glue_rds_to_redshift.py:62, intended semantics)."""
    return reports.sales_by_customer(spark, sf_dir)


@query(
    "report_sales_by_supplier",
    oracle="""
    SELECT s.s_suppkey, s.s_name, CAST(l.l_shipdate AS DATE) AS ship_date,
           ROUND(SUM(l.l_extendedprice), 2) AS total
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2, 3
    """,
)
def q_report_sales_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference subscriptions-report (glue_rds_to_redshift.py:74, intended)."""
    return reports.sales_by_supplier(spark, sf_dir)


@query(
    "join3_projection",
    oracle="""
    SELECT l.l_orderkey AS orderkey, l.l_suppkey AS trn_suppkey, l.l_quantity,
           l.l_extendedprice, l.l_shipdate, o.o_orderdate, o.o_orderpriority,
           c.c_custkey, c.c_name, c.c_mktsegment
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join3_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + rename + projection (glue_rds_to_redshift.py:44-47)."""
    return reports.joined_sales(spark, sf_dir)


@query(
    "incremental_scan_hwm",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_orderkey > {_BOOKMARK_HWM}
    """,
)
def q_incremental_scan_hwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bookmark predicate (jobBookmarkKeys, glue_rds_to_redshift.py:31) as a
    pushed-down scan filter; the stateful store is tested in pytest."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") > F.lit(_BOOKMARK_HWM))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "incremental_agg_merge",
    oracle="""
    SELECT l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance — the engine's
    incrementality thesis as a value-checked operator. The already-
    processed half (l_orderkey <= HWM, what a bookmark-committed run
    left behind as stored per-key partials) and the new increment
    (l_orderkey > HWM) are each partially aggregated, then MERGED by
    re-aggregating the partial states — never by rescanning history.
    The oracle is the full-table aggregate: merged-partials must equal
    recompute-from-scratch exactly.

    Sums are carried as DECIMAL(18,4): decimal addition is associative,
    so the split-merge result is bit-identical to the one-pass result
    regardless of grouping order (a double sum would straddle rounding
    boundaries between the two plans). At 100 TB this is the pattern
    that turns a daily full-scan report into an increment-sized job:
    the stored state is one row per key, the merge is a hash agg over
    state ∪ increment-partials. (Reference anchor: this is what
    glue_rds_to_redshift.py:44-74's re-run SHOULD have computed; the
    keyed-merge convergence on the reference's own star schema is
    replayed in tests/test_reference_scenario.py.)"""
    li = load_table(spark, sf_dir, "lineitem")
    dec_price = F.col("l_extendedprice").cast("decimal(18,4)")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("l_suppkey").agg(
            F.count("*").alias("n_items"),
            F.sum(dec_price).alias("total_dec"),
        )

    processed = partials(li.filter(F.col("l_orderkey") <= _BOOKMARK_HWM))
    increment = partials(li.filter(F.col("l_orderkey") > _BOOKMARK_HWM))
    merged = (
        processed.unionByName(increment)
        .groupBy("l_suppkey")
        .agg(
            F.sum("n_items").alias("n_items"),
            F.sum("total_dec").alias("total_dec"),
        )
    )
    return merged.select(
        "l_suppkey", "n_items", F.col("total_dec").cast("double").alias("total")
    )
