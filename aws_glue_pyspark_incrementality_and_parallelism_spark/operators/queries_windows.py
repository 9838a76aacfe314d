"""Window-function queries (SURVEY §2.7 breadth).

Determinism rule: every window ORDER BY ends in a unique tiebreaker
column so ranks and running frames are identical across engines.

Scale note: a window partitioned by a key shuffles once on that key and
sorts within partitions — same cost envelope as a groupBy. A window with
NO partition key is a single-node sort; never do that at 100 TB (the
top-k query shows the scalable global pattern instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table


@query(
    "window_rank_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
)
def q_window_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via row_number — the standard
    'latest/top N per key' pattern."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer over order history."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("running_spend"),
        )
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_type
    FROM events
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next event type per user — sessionization building block."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "window_dense_rank_share",
    oracle="""
    SELECT s_suppkey, supplier_revenue,
           DENSE_RANK() OVER (ORDER BY supplier_revenue DESC, s_suppkey) AS rev_rank
    FROM (
      SELECT l_suppkey AS s_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS supplier_revenue
      FROM lineitem GROUP BY 1
    )
    """,
)
def q_window_dense_rank_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank suppliers by revenue. The global window runs AFTER a groupBy
    shrank the data to one row per supplier — the safe way to use an
    unpartitioned window at scale (input is already tiny)."""
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("supplier_revenue")
        )
    )
    w = Window.orderBy(F.desc("supplier_revenue"), F.asc("s_suppkey"))
    return rev.select("s_suppkey", "supplier_revenue", F.dense_rank().over(w).alias("rev_rank"))


@query(
    "window_first_last_value",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER w AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full-partition frame (the
    default frame for last_value is 'up to current row' — a classic
    silent-wrong-answer; always pin the frame)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    )


@query(
    "window_range_frame_1h",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rolling_1h_value
    FROM (SELECT user_id, event_id, value,
                 -- floor, not CAST: DuckDB's double->int cast ROUNDS, while
                 -- Spark's unix_timestamp TRUNCATES sub-second parts; a
                 -- rounded-up second shifts the 1h frame boundary for
                 -- events whose microseconds are >= .5 (bit sf0.1)
                 CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events)
    """,
)
def q_window_range_frame_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per-user rolling 1-hour value sum keyed on event
    time (value-based frame, not row-count — late rows in the same
    second share the frame, so the result is order-deterministic even
    with timestamp ties)."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "epoch_s", F.unix_timestamp("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias(
            "rolling_1h_value"
        ),
    )


@query(
    "window_ntile_quartiles",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS balance_quartile
    FROM customer
    """,
)
def q_window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing by account balance (unique tiebreak keeps both
    engines' bucket assignment identical). Round-4 rewrite: instead of
    the unpartitioned-ntile global sort, the global rank comes from the
    bin-offset prefix sum (``distrank.add_global_row_number`` over
    integer-cent balance bins — acctbal has exactly two decimals, so
    cents is order-isomorphic to the double) and the quartile from the
    exact SQL NTILE formula as a pure projection — bit-identical to the
    oracle's NTILE at any scale, no single-partition sort."""
    from .distrank import add_global_row_number, exact_ntile

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint").alias("bal_c"),
    )
    st = c.agg(
        F.count(F.lit(1)).alias("n"), F.min("bal_c").alias("lo"), F.max("bal_c").alias("hi")
    ).collect()[0]
    ranked = add_global_row_number(c, "bal_c", "c_custkey", st["lo"], st["hi"], "rn")
    return ranked.select(
        "c_custkey", exact_ntile("rn", st["n"], 4).alias("balance_quartile")
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k. Spark plans orderBy+limit as TakeOrderedAndProject:
    each partition keeps its local top-k, the driver merges k·p rows —
    no global sort, scales to any input size."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "window_percent_rank_cume",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window functions: percent_rank and cume_dist
    per market segment ordered by balance (custkey tiebreak makes the
    ordering total, so ranks are deterministic across engines)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_forward_fill",
    oracle="""
    WITH masked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT user_id, event_id,
           ROUND(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled
    FROM masked
    """,
)
def q_window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF): carry each user's last observed value across
    gap rows — the sensor/time-series repair primitive. ``last_value``
    with ``ignoreNulls`` over a running frame; one shuffle on user_id
    with an in-partition sort, same cost envelope as any per-key window
    at any scale."""
    e = load_table(spark, sf_dir, "events")
    masked = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "view", None).otherwise(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return masked.select(
        "user_id",
        "event_id",
        F.round(F.last("v", ignorenulls=True).over(w), 4).alias("filled"),
    )


@query(
    "window_year_over_year",
    oracle="""
    WITH yearly AS (
      SELECT year(o_orderdate) AS yr,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT yr, revenue,
           ROUND(revenue - lag(revenue) OVER (ORDER BY yr), 2) AS yoy_delta,
           ROUND(100.0 * (revenue - lag(revenue) OVER (ORDER BY yr))
                 / lag(revenue) OVER (ORDER BY yr), 4) AS yoy_pct
    FROM yearly
    """,
)
def q_window_year_over_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth: lag over the YEARLY pre-aggregate (the
    rollup-ladder pattern again — the window sees O(years) rows, so the
    unpartitioned ORDER BY is free; the fact table is touched once by
    the groupBy)."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue")
    )
    w = Window.orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "yr",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("yoy_delta"),
        F.round(100.0 * (F.col("revenue") - prev) / prev, 4).alias("yoy_pct"),
    )


@query(
    "window_moving_avg_rows",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg4
    FROM events WHERE event_type = 'view'
    """,
)
def q_window_moving_avg_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS-frame moving average (last 4 events per user) —
    the count-based smoothing frame, complementing the time-based RANGE
    frame (``window_range_frame_1h``) and the unbounded running frame
    (``window_running_sum``). Bounded frames keep O(frame) state per
    row during the single per-user sort pass."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg4"),
    )


@query(
    "window_sliding_median_exact",
    oracle="""
    SELECT event_id, user_id, med5
    FROM (
        SELECT event_id, user_id,
               ROW_NUMBER() OVER w AS rn,
               (list_sort(list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)))[3]
                   AS med5
        FROM events WHERE event_type = 'view'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE rn >= 5
    """,
)
def q_window_sliding_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sliding median over a 5-row frame per user — the robust
    smoother percentile_approx can't provide (order statistics don't
    decompose, so the frame must be materialized).

    Both engines compute the IDENTICAL algorithm — collect the 5-row
    frame as a list, sort it, take the 3rd element — so the result is
    the exact middle VALUE (no interpolation, no float averaging of two
    middles; frames are always odd because warm-up rows rn<5 are
    dropped). Scale shape: a rows-frame window per user key — state is
    O(frame) per row, partitions parallel across users; cost is
    k·log k per row, independent of table size. The anti-pattern this
    replaces is a per-row self-join or a global sort.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-4, 0)
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "event_id",
            "user_id",
            F.row_number().over(w).alias("rn"),
            F.element_at(F.array_sort(F.collect_list("value").over(frame)), 3).alias(
                "med5"
            ),
        )
        .filter(F.col("rn") >= 5)
        .drop("rn")
    )


@query(
    "window_rolling_ols_slope",
    oracle="""
    WITH pts AS (
        SELECT user_id, event_id,
               epoch_us(ts) // 60000000 AS x,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y,
               ROW_NUMBER() OVER w AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_user
        FROM events WHERE event_type = 'click'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sums AS (
        SELECT user_id, event_id, rn,
               SUM(x)     OVER f AS sx,
               SUM(y)     OVER f AS sy,
               SUM(x * y) OVER f AS sxy,
               SUM(x * x) OVER f AS sxx
        FROM pts
        WINDOW f AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           CAST(10 * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(10 * sxx - sx * sx AS BIGINT) AS slope_den
    FROM sums WHERE rn >= 10
    ORDER BY user_id, event_id
    """,
)
def q_window_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling least-squares trend per user: the OLS slope over the
    trailing 10 clicks, carried as the EXACT integer fraction
    (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) — no float regression anywhere.

    x is the integer minute index, y the micro-quantized value, so all
    four frame sums are int64 window aggregates (partial-friendly
    rows-frames) and the closed-form slope needs only products of
    those sums. Warm-up rows (rn < 10) are dropped so every frame is
    exactly 10 points. The streaming-feature shape: per-key rolling
    state of O(frame), linear in events, and the emitted fraction
    defers division to the consumer (exactly how feature stores avoid
    baking rounding into stored features).
    """
    pts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.expr("unix_micros(ts) div 60000000").alias("x"),
            F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint").alias("y"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    f = w.rowsBetween(-9, 0)
    sums = pts.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.sum("x").over(f).alias("sx"),
        F.sum("y").over(f).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(f).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(f).alias("sxx"),
    )
    return (
        sums.filter(F.col("rn") >= 10)
        .select(
            "user_id",
            "event_id",
            (F.lit(10) * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("bigint")
            .alias("slope_num"),
            (F.lit(10) * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("bigint")
            .alias("slope_den"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_hampel_outliers",
    oracle="""
    WITH pts AS (
        SELECT user_id, event_id,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y,
               ROW_NUMBER() OVER w AS rn
        FROM events WHERE event_type = 'view'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), med AS (
        SELECT user_id, event_id, y, rn,
               (list_sort(list(y) OVER f))[3] AS med5,
               list_sort(list(y) OVER f) AS frame
        FROM pts
        WINDOW f AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    ), mad AS (
        SELECT user_id, event_id, y, rn, med5,
               (list_sort([abs(v - med5) FOR v IN frame]))[3] AS mad5
        FROM med
    )
    SELECT user_id, event_id, y AS value_micro, med5 AS median_micro,
           mad5 AS mad_micro,
           abs(y - med5) > 3 * mad5 AS is_outlier
    FROM mad WHERE rn >= 5
    ORDER BY user_id, event_id
    """,
)
def q_window_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter per user series: flag a point when it deviates
    from the rolling 5-point median by more than 3 rolling MADs — the
    robust despiking standard (mean/σ rules break because the outlier
    itself inflates σ; median/MAD have a 50% breakdown point).

    Exactness: micro-quantized values; the rolling median AND the MAD
    are both the literal middle element of a sorted odd frame (warm-up
    rows dropped), so every engine-crossing number is an exact integer
    and the 3-MAD comparison is pure int arithmetic. Scale: one keyed
    window, O(frame·log frame) per row, embarrassing across users —
    the same cost envelope as the sliding median it composes.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    f = w.rowsBetween(-4, 0)
    pts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint").alias("y"),
        )
    )
    med = pts.select(
        "user_id",
        "event_id",
        "y",
        F.row_number().over(w).alias("rn"),
        F.array_sort(F.collect_list("y").over(f)).alias("frame"),
    ).withColumn("med5", F.element_at("frame", 3))
    mad = med.withColumn(
        "mad5",
        F.element_at(
            F.array_sort(F.expr("transform(frame, v -> abs(v - med5))")), 3
        ),
    )
    return (
        mad.filter(F.col("rn") >= 5)
        .select(
            "user_id",
            "event_id",
            F.col("y").alias("value_micro"),
            F.col("med5").alias("median_micro"),
            F.col("mad5").alias("mad_micro"),
            (F.abs(F.col("y") - F.col("med5")) > 3 * F.col("mad5")).alias("is_outlier"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_fifo_allocation",
    oracle="""
    WITH inv AS (
      SELECT o.o_custkey AS custkey,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS amt_c,
             CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS budget_c,
             SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY o.o_custkey ORDER BY o.o_orderdate, o.o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS cum_c
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_acctbal > 0
    ), alloc AS (
      SELECT custkey, amt_c, budget_c,
             GREATEST(CAST(0 AS BIGINT),
                      LEAST(amt_c, budget_c - (cum_c - amt_c))) AS funded_c
      FROM inv
    )
    SELECT custkey,
           COUNT(*) AS n_invoices,
           CAST(SUM(CASE WHEN funded_c = amt_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_funded_full,
           CAST(SUM(CASE WHEN funded_c > 0 AND funded_c < amt_c THEN 1 ELSE 0 END)
                AS BIGINT) AS n_funded_partial,
           CAST(SUM(funded_c) AS BIGINT) AS funded_cents,
           CAST(MAX(budget_c) AS BIGINT) AS budget_cents
    FROM alloc
    GROUP BY custkey
    HAVING SUM(CASE WHEN funded_c > 0 AND funded_c < amt_c THEN 1 ELSE 0 END) > 0
    ORDER BY custkey
    """,
)
def q_window_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO allocation waterfall — the settlement/billing primitive:
    each customer's account balance (the budget) funds their orders
    oldest-first; an order is fully funded while the running invoice
    total stays under budget, the order that crosses the line is
    PARTIALLY funded with exactly the remainder, everything after gets
    zero.  Sequential-sounding, but the greedy FIFO outcome is a pure
    function of the running prefix sum — ``funded = clamp(budget −
    cumsum_before, 0, amount)`` — so one keyed window computes the
    whole waterfall with no iteration; exact cents end-to-end.  The
    output keeps only customers with a partial allocation (the
    boundary case that proves the clamp algebra), with full/partial
    counts and funded totals.

    Scale: one shuffle to co-locate each customer's orders, one window
    pass, one grouped aggregate — the same plan family as every other
    keyed running-total here; no driver state, no loop."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("bigint")  # noqa: E731
    w = (
        Window.partitionBy("custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    inv = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            "o_orderdate",
            "o_orderkey",
            cents("o_totalprice").alias("amt_c"),
            cents("c_acctbal").alias("budget_c"),
        )
        .withColumn("cum_c", F.sum("amt_c").over(w))
    )
    alloc = inv.withColumn(
        "funded_c",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(F.col("amt_c"), F.col("budget_c") - (F.col("cum_c") - F.col("amt_c"))),
        ),
    )
    partial = (F.col("funded_c") > 0) & (F.col("funded_c") < F.col("amt_c"))
    return (
        alloc.groupBy("custkey")
        .agg(
            F.count("*").alias("n_invoices"),
            F.sum(F.when(F.col("funded_c") == F.col("amt_c"), 1).otherwise(0)).alias(
                "n_funded_full"
            ),
            F.sum(F.when(partial, 1).otherwise(0)).alias("n_funded_partial"),
            F.sum("funded_c").cast("bigint").alias("funded_cents"),
            F.max("budget_c").cast("bigint").alias("budget_cents"),
        )
        .filter(F.col("n_funded_partial") > 0)
        .orderBy("custkey")
    )


@query(
    "events_ohlc_hourly",
    oracle="""
    WITH pricked AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_hour,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT event_type, bar_hour,
           CAST(MAX(CASE WHEN rn_open = 1 THEN v_c END) AS BIGINT) AS open_c,
           CAST(MAX(v_c) AS BIGINT) AS high_c,
           CAST(MIN(v_c) AS BIGINT) AS low_c,
           CAST(MAX(CASE WHEN rn_close = 1 THEN v_c END) AS BIGINT) AS close_c,
           COUNT(*) AS volume,
           CAST(SUM(v_c) AS BIGINT) AS total_c
    FROM pricked
    GROUP BY event_type, bar_hour
    ORDER BY event_type, bar_hour
    """,
)
def q_events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick downsampling — the time-series compaction every
    market-data / metrics pipeline runs: per (series, hour) bar, the
    OPEN (first value by event time), HIGH, LOW, CLOSE (last value) and
    volume.  First/last are made deterministic with the (ts, event_id)
    total order (two row_number windows over the SAME keyed partition —
    one shuffle, both windows and the final aggregate share it); values
    are exact integer cents.

    Scale: bars partition by (series, hour), so state per partition is
    one hour of one series regardless of corpus size — this is the
    batch form of the watermarked streaming rollup
    (``stream_hourly_rollup_merge``), extended with order-dependent
    open/close endpoints."""
    events = load_table(spark, sf_dir, "events")
    bar = F.date_trunc("hour", F.col("ts"))
    base = events.select(
        "event_type",
        bar.alias("bar_hour"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_c"),
    )
    wk = Window.partitionBy("event_type", "bar_hour")
    rn_open = F.row_number().over(wk.orderBy("ts", "event_id"))
    rn_close = F.row_number().over(wk.orderBy(F.desc("ts"), F.desc("event_id")))
    pricked = base.withColumn("rn_open", rn_open).withColumn("rn_close", rn_close)
    return (
        pricked.groupBy("event_type", "bar_hour")
        .agg(
            F.max(F.when(F.col("rn_open") == 1, F.col("v_c"))).cast("bigint").alias("open_c"),
            F.max("v_c").cast("bigint").alias("high_c"),
            F.min("v_c").cast("bigint").alias("low_c"),
            F.max(F.when(F.col("rn_close") == 1, F.col("v_c"))).cast("bigint").alias("close_c"),
            F.count("*").alias("volume"),
            F.sum("v_c").cast("bigint").alias("total_c"),
        )
        .orderBy("event_type", "bar_hour")
    )


@query(
    "window_range_between_numeric",
    oracle="""
    WITH c AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority, cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_price_neighbors,
           CAST(SUM(cents) OVER w AS BIGINT) AS neighbor_cents_sum
    FROM c
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
                 RANGE BETWEEN 1000000 PRECEDING AND 1000000 FOLLOWING)
    """,
)
def q_window_range_between_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame — the window family's value-based sibling of
    the time-range frame (`window_range_frame_1h`): for every order,
    aggregate over all orders of the same priority within ±$10,000 of
    its price (a peer-group/price-band statistic: 'how crowded is this
    order's price neighborhood'). RANGE frames bound by VALUE, not row
    count, so ties and gaps behave correctly where a ROWS frame would
    not; money is quantized to exact cents BEFORE ordering so frame
    membership (a <= comparison on the order key) is decided on
    identical integers in both engines — a double ordering key would
    make the frame boundary itself a float hazard.

    Plan — BANDED, not partitioned on the raw 5-value priority key
    (which would cap parallelism at 5 tasks forever): cents are banded
    into width-2W bins within priority (W = the frame half-width), so
    the window partitions on (priority, bin) — hundreds of keys whose
    cardinality grows with the price range, not a constant 5. The
    frame of a row never reaches past the adjacent bin (bin width 2W
    >= frame reach W), and exactly one of the two neighbors is
    reachable: a row in the lower half of its bin (offset < W) can be
    needed only by the bin below, the upper half (offset >= W) only by
    the bin above. Each row therefore emits its home copy plus ONE
    halo copy into that single reachable neighbor — 2x data, and every
    underlying order appears exactly once per (priority, bin)
    partition (home XOR halo), so the in-frame COUNT/SUM are exact.
    Within each partition Spark still evaluates the frame with two
    moving endpoints over the sorted run — O(n) per bin. At 100 TB,
    shrink W's bin multiple (or band on price-decile boundaries) to
    bound bin population; the halo construction is unchanged."""
    orders = load_table(spark, sf_dir, "orders")
    W = 1_000_000  # frame half-width: +/- $10,000 in cents
    B = 2 * W  # band width >= 2*W => one conditional halo copy per row
    c = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    binned = c.withColumn("home_bin", F.floor(F.col("cents") / B).cast("bigint"))
    copies = binned.select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.explode(
            F.array(
                F.struct(
                    F.col("home_bin").alias("bin"), F.lit(True).alias("is_home")
                ),
                F.struct(
                    # pmod, not %: the in-bin offset must match the
                    # floor-division binning for ALL signs. Spark's %
                    # is a signed remainder (in (-B, 0] for negative
                    # cents), which would send the upper half of every
                    # negative bin's halo to home_bin - 1 instead of
                    # home_bin + 1; pmod(cents, B) = cents - B*floor(
                    # cents/B) is in [0, B) always, so lower half
                    # (< W) -> bin below, upper half -> bin above,
                    # sign-independent.
                    F.when(
                        F.pmod(F.col("cents"), F.lit(B)) < W, F.col("home_bin") - 1
                    ).otherwise(F.col("home_bin") + 1).alias("bin"),
                    F.lit(False).alias("is_home"),
                ),
            )
        ).alias("cp"),
    ).select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.col("cp.bin").alias("bin"),
        F.col("cp.is_home").alias("is_home"),
    )
    # NULL-cents rows: home_bin is NULL, and the halo expression is NULL
    # too — without this filter the halo copy would land in the SAME
    # (priority, NULL) partition as the home copy and double every
    # NULL-peer count. Keeping only the home copy reproduces the
    # unbanded form's NULL semantics: NULLs are each other's sole peers.
    copies = copies.where(F.col("is_home") | F.col("bin").isNotNull())
    w = (
        Window.partitionBy("o_orderpriority", "bin")
        .orderBy("cents")
        .rangeBetween(-W, W)
    )
    return (
        copies.select(
            "o_orderkey",
            "o_orderpriority",
            "cents",
            "is_home",
            F.count("*").over(w).cast("bigint").alias("n_price_neighbors"),
            F.sum("cents").over(w).cast("bigint").alias("neighbor_cents_sum"),
        )
        .where(F.col("is_home"))
        .drop("is_home")
    )
