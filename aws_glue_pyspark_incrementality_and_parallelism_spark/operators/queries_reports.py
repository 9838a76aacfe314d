"""Registry entries for the flagship report pipeline (SURVEY §2.1-2.6).

Covers: parquet scans (S1/S2), rename (P1), projection (P2), equi inner
joins (J1/J2), grouped sum aggregations (A1/A2), alias (A3), and the
incremental-scan predicate (S3) as a fixed-HWM query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..session import pin
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


#: Orders-side HWM for incremental JOIN maintenance: rows on or after
#: this date are "the new order batch". Mid-range of the synthetic
#: 1995-2001 o_orderdate span, so both halves are non-trivial.
_ORDERS_HWM_DATE = "1998-01-01"


@query(
    "incremental_join_merge",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q_incremental_join_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-JOIN maintenance — the delta-join
    algebra (Δ(L⋈O) = ΔL⋈O ∪ L_old⋈ΔO, with ΔL⋈ΔO inside the first
    term) that view-maintenance engines apply to a binlog. Each side
    has its OWN independent high-water mark (lineitem by l_orderkey,
    orders by o_orderdate), so all three delta quadrants are
    non-trivial: an old lineitem can join a new order and vice versa —
    the case naive "join only the new rows" incremental jobs silently
    drop. The standing result (old⋈old) plus the two delta terms are
    unioned and aggregated; the oracle recomputes the aggregate from
    the FULL join, so merged-deltas must equal recompute-from-scratch
    exactly (decimal-carried sums: associative, bit-identical under
    any split).

    At 100 TB: the standing result is the stored view; each run joins
    only increment-sized inputs against the other side (with the join
    key co-partitioned, ΔL⋈O prunes to the matching key range via the
    same pushed-down HWM predicates this query uses). The reference's
    bookmark job (glue_rds_to_redshift.py:44-74) rescans and rejoins
    everything every run; this is the operator that makes its re-run
    increment-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    hwm_date = F.lit(_ORDERS_HWM_DATE).cast("timestamp")

    old_l = li.filter(F.col("l_orderkey") <= _BOOKMARK_HWM)
    new_l = li.filter(F.col("l_orderkey") > _BOOKMARK_HWM)
    old_o = od.filter(F.col("o_orderdate") < hwm_date)
    new_o = od.filter(F.col("o_orderdate") >= hwm_date)

    cols = [
        F.col("o_orderstatus"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price_dec"),
    ]
    standing = old_l.join(old_o, old_l.l_orderkey == old_o.o_orderkey).select(*cols)
    delta_l = new_l.join(od, new_l.l_orderkey == od.o_orderkey).select(*cols)
    delta_o = old_l.join(new_o, old_l.l_orderkey == new_o.o_orderkey).select(*cols)

    return (
        standing.unionByName(delta_l)
        .unionByName(delta_o)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("price_dec").cast("double").alias("total"),
        )
    )


#: Partition-gap lane cut: a day whose u32(md5('bf:' || day)) falls below
#: this is "missing from the sink" (~5% of days — deterministic, so the
#: backfill provably fires at every SF).
BACKFILL_MAX = 214_748_364


@query(
    "incremental_partition_backfill",
    oracle=f"""
    WITH dayagg AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders
      GROUP BY 1
    )
    SELECT day, n_orders, revenue_cents,
           CAST(0 AS BIGINT) AS residual_gaps
    FROM dayagg
    WHERE CAST(('0x' || substr(md5('bf:' || CAST(day AS VARCHAR)), 1, 8)) AS BIGINT)
          < {BACKFILL_MAX}
    """,
)
def q_incremental_partition_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-gap detection + targeted backfill — the recovery half
    of the reference's job-bookmark contract (glue_rds_to_redshift.py's
    bookmark only moves FORWARD; when a day's partition is lost or was
    never written, something must find and recompute exactly that day).
    A deterministic ~5% of order days are 'missing from the sink'
    (md5 lane on the ISO date); the operator diffs the expected day set
    against the sink listing (anti-join at DAY grain — the listing is
    O(days), never O(rows)), recomputes ONLY the missing days, and
    re-verifies that existing ∪ backfilled covers everything, emitting
    the residual gap count (pinned 0) as a broadcast scalar on every
    backfilled row.

    Plan: one day-grain aggregate over the fact (map-side partial
    combine; cardinality bounded by the calendar, not the row count),
    then set algebra over that tiny relation. At 100 TB with a
    date-partitioned sink the missing-day predicate becomes partition
    pruning on the scan — the recompute reads only the gap days."""
    orders = load_table(spark, sf_dir, "orders")
    dayagg = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")).alias(
            "revenue_cents"
        ),
    )
    lane = F.conv(
        F.substring(F.md5(F.concat(F.lit("bf:"), F.col("day").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    # Materialize the O(days) aggregate once: every later branch
    # (listing, gap anti-join, backfill, residual audit) reuses it, so
    # the FACT table is scanned exactly once — without this, Catalyst
    # re-derives the aggregate per branch (7 fact scans observed).
    dayagg = dayagg.withColumn("_lane", lane).transform(pin)
    expected = dayagg.select("day")
    sink_existing = dayagg.filter(F.col("_lane") >= BACKFILL_MAX)
    # Gap detection: expected days with no sink partition.
    missing = expected.join(sink_existing.select("day"), "day", "left_anti")
    backfilled = dayagg.join(missing, "day", "left_semi").drop("_lane")
    # Post-backfill audit: existing ∪ backfilled must cover every
    # expected day; the residual count is a 1-row broadcast scalar.
    covered = sink_existing.select("day").unionByName(backfilled.select("day"))
    residual = (
        expected.join(covered, "day", "left_anti")
        .agg(F.count("*").alias("residual_gaps"))
    )
    return backfilled.crossJoin(F.broadcast(residual))


@query(
    "pipeline_observe_metrics",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
           MAX(o_orderdate) AS last_orderdate
    FROM orders
    """,
)
def q_pipeline_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``DataFrame.observe`` — Spark's
    zero-extra-pass metrics API: named aggregate expressions ride along
    with the job's ONE action (here a noop sink write standing in for
    the production parquet/JDBC sink), accumulated task-side exactly
    once even under retries, and surface driver-side after the action
    completes. This is how a 100 TB load emits row counts / revenue
    checksums / freshness watermarks for its data-quality monitor
    WITHOUT a second scan — the alternative (a separate ``.agg()``
    job) doubles the read.

    The observed metrics come back as an O(1) driver-side dict; the
    returned single-row DataFrame is built from them, and the oracle
    recomputes the same aggregates from the table — adjudicating that
    observe's task-side accumulation agrees with a direct aggregate.
    Money exact cents; freshness is the max order timestamp."""
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("load_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("revenue_cents"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.max("o_orderdate").alias("last_orderdate"),
    )
    # The production action (sink write); noop format keeps the probe
    # I/O-free while still executing every task.
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_orders"],
                m["revenue_cents"],
                m["n_finished"],
                m["last_orderdate"],
            )
        ],
        "n_orders bigint, revenue_cents bigint, n_finished bigint, "
        "last_orderdate timestamp",
    )


#: Late-dimension lane: suppliers whose u32(md5(suppkey || ':latedim'))
#: falls below this (~10%) are absent from the first dimension snapshot
#: and only land in the second batch.
LATE_DIM_MAX = 429_496_729


@query(
    "incremental_late_arriving_dimension",
    oracle=f"""
    WITH late AS (
      SELECT s_suppkey, s_nationkey,
             CAST(('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || ':latedim'), 1, 8))
                  AS BIGINT) < {LATE_DIM_MAX} AS is_late
      FROM supplier
    )
    SELECT l.s_nationkey,
           COUNT(CASE WHEN NOT l.is_late THEN 1 END) AS n_matched_batch1,
           COUNT(CASE WHEN l.is_late THEN 1 END) AS n_matched_batch2,
           CAST(0 AS BIGINT) AS n_unmatched_final,
           CAST(SUM(CAST(floor(li.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem li JOIN late l ON li.l_suppkey = l.s_suppkey
    GROUP BY l.s_nationkey
    """,
)
def q_incremental_late_arriving_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EARLY-ARRIVING FACTS (the warehouse's late-arriving-dimension
    problem): fact rows land before their dimension row exists — here a
    deterministic ~10% of suppliers are missing from the first
    dimension snapshot. The incremental protocol: batch 1 joins facts
    against the partial dimension, ENRICHING what it can and PARKING
    the rest (never dropping, never nulling); batch 2 re-joins only the
    parked facts against the completed dimension. The oracle is the
    from-scratch join against the full dimension — the two-phase
    union must reproduce it exactly, with the final unparked count
    pinned at zero.

    This is the reference bookmark contract's dual: its forward-only
    HWM (glue_rds_to_redshift.py:31,40) assumes dims are always ahead
    of facts; real CDC feeds violate that daily. Plan: both phases are
    plain hash joins; the parked set is ~10% of the fact table and
    shrinks to zero — no retry loop, no driver state beyond the lane
    constant. All money exact cents."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    lane = F.conv(
        F.substring(
            F.md5(F.concat(F.col("s_suppkey").cast("string"), F.lit(":latedim"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    supp = supp.withColumn("is_late", lane < LATE_DIM_MAX)
    snap1 = supp.filter(~F.col("is_late")).select("s_suppkey", "s_nationkey")
    full = supp.select("s_suppkey", "s_nationkey")

    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    facts = li.select("l_suppkey", cents.alias("cents"))

    # Batch 1: enrich against the partial dim; park the misses.
    matched1 = facts.join(snap1, facts.l_suppkey == snap1.s_suppkey).select(
        "s_nationkey", "cents", F.lit(1).alias("phase")
    )
    parked = facts.join(snap1, facts.l_suppkey == snap1.s_suppkey, "left_anti")
    # Batch 2: only the parked facts touch the completed dimension.
    matched2 = parked.join(full, parked.l_suppkey == full.s_suppkey).select(
        "s_nationkey", "cents", F.lit(2).alias("phase")
    )
    unmatched_final = parked.join(
        full, parked.l_suppkey == full.s_suppkey, "left_anti"
    ).agg(F.count("*").alias("n_unmatched_final"))

    return (
        matched1.unionByName(matched2)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.when(F.col("phase") == 1, 1)).alias("n_matched_batch1"),
            F.count(F.when(F.col("phase") == 2, 1)).alias("n_matched_batch2"),
            F.sum("cents").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(unmatched_final))
        .select(
            "s_nationkey",
            "n_matched_batch1",
            "n_matched_batch2",
            "n_unmatched_final",
            "revenue_cents",
        )
    )


@query(
    "incremental_scan_composite_hwm",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_new,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(MAX(o_orderdate) AS TIMESTAMP) AS max_date,
           CAST(MAX(CASE WHEN o_orderdate =
                    (SELECT MAX(o_orderdate) FROM orders) THEN o_orderkey END)
                AS BIGINT) AS max_key_at_max_date
    FROM orders
    WHERE o_orderdate > TIMESTAMP '1998-01-01 00:00:00'
       OR (o_orderdate = TIMESTAMP '1998-01-01 00:00:00' AND o_orderkey > 1000)
    GROUP BY 1 ORDER BY 1
    """,
)
def q_incremental_scan_composite_hwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSITE job bookmark — the reference's ``jobBookmarkKeys`` is a
    LIST (glue_rds_to_redshift.py:31: ["transaction_id"], but the
    contract is multi-column), and the correct multi-key watermark is
    LEXICOGRAPHIC: a row is new iff (date, key) > (hwm_date, hwm_key)
    in dictionary order — date strictly greater, OR equal date with a
    greater key. The naive conjunctive form (date >= hwm AND key > k)
    silently drops every row whose key restarted below the old key on a
    newer date — the classic composite-bookmark bug.

    [[incremental_scan_hwm]] covers the single-key contract; this query
    runs the two-key predicate against the planted (1998-01-01, 1000)
    bookmark and also emits the NEXT bookmark pair (max date + max key
    at that date) so the commit step is part of the adjudicated
    surface. Scale: the date leg of the predicate partition-prunes on
    date-partitioned layout; the equal-date leg touches one partition.
    """
    o = load_table(spark, sf_dir, "orders")
    hwm_d = F.lit("1998-01-01 00:00:00").cast("timestamp")
    hwm_k = F.lit(1000)
    delta = o.filter(
        (F.col("o_orderdate") > hwm_d)
        | ((F.col("o_orderdate") == hwm_d) & (F.col("o_orderkey") > hwm_k))
    )
    max_d = delta.agg(F.max("o_orderdate").alias("md"))
    return (
        delta.crossJoin(F.broadcast(max_d))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_new"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
            F.max("o_orderdate").alias("max_date"),
            F.max(
                F.when(F.col("o_orderdate") == F.col("md"), F.col("o_orderkey"))
            )
            .cast("bigint")
            .alias("max_key_at_max_date"),
        )
        .orderBy("o_orderpriority")
    )
