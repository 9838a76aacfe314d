"""Aggregation-family queries (SURVEY §2.4 + §2.7 breadth).

Pattern for hash-compare determinism: any sum/avg over a large group is
computed on DECIMAL-cast inputs (exact, associative), then cast back to
DOUBLE at the end — both engines produce bit-identical doubles, immune
to float accumulation-order differences. Small per-group sums use
round(sum, 2) which is stable at that scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..session import fan_out_compute, pin
from ..sources.io import load_table, register_views


@query(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary: few groups, giant partial-aggregate
    fan-in. Map-side combine means the shuffle carries one row per
    (task, group) — this is the canonical 100 TB-safe aggregation."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation — Catalyst expands to a two-phase plan
    (distinct-by-key partial, then final) so it still combines map-side."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS n_exact, TRUE AS approx_within_2pct
    FROM lineitem
    """,
)
def q_agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path when exact
    distinct would shuffle every key. Raw estimates are engine-specific,
    so the driver-checkable surface is (exact count, estimate-within-2%
    flag): the oracle pins the exact column and expects the tolerance
    flag TRUE, which fails if the sketch ever degrades.

    Both aggregates read ONE pre-distincted relation (partial distinct
    map-side, one shuffle of unique keys): HLL is idempotent on
    duplicates, so the estimate is unchanged, while asking Catalyst for
    countDistinct + approx in a single agg would trigger the
    multi-distinct Expand rewrite (row duplication + a second wide
    shuffle — 5.7 s vs 0.9 s at sf0.1)."""
    keys = load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    agg = keys.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
    )
    return agg.select(
        "n_exact",
        (
            F.abs(F.col("approx") - F.col("n_exact")) <= F.col("n_exact") * 0.02
        ).alias("approx_within_2pct"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("spend"),
        )
        .filter(F.col("n_orders") >= 3)
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy subtotals (flag, flag+status, grand total)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
    FROM customer
    GROUP BY CUBE (c_mktsegment, c_nationkey)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping combinations)."""
    return (
        load_table(spark, sf_dir, "customer")
        .cube("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns. Explicit value list ⇒ single pass,
    no extra distinct-values job (required at scale)."""
    pivoted = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )
    return pivoted.select(
        "l_returnflag",
        F.col("F").alias("qty_f"),
        F.col("O").alias("qty_o"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT o_orderstatus,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(STDDEV_SAMP(o_totalprice), 2) AS std_price,
           ROUND(MEDIAN(o_totalprice), 2) AS median_price
    FROM orders GROUP BY 1
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact median (percentile 0.5).

    Exact percentiles need the whole group; at 100 TB prefer
    approx_percentile (t-digest sketch, map-side combinable).
    """
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.stddev_samp("o_totalprice"), 2).alias("std_price"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
        )
    )


@query(
    "agg_string_concat_sorted",
    oracle="""
    SELECT n.n_regionkey AS regionkey,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n GROUP BY 1
    """,
)
def q_agg_string_concat_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): collect → sort → join keeps
    the output deterministic regardless of partition arrival order —
    never emit unsorted collect_list in a hash-compared result."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
    )


@query(
    "agg_argmax_bool",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_custkey, o_orderkey) AS latest_custkey,
           bool_or(o_totalprice > 400000) AS any_big,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
    FROM orders GROUP BY 1
    """,
)
def q_agg_argmax_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / bool_or / filtered count. max_by keys on the UNIQUE
    o_orderkey so both engines pick the same row (arg-max over a column
    with ties is engine-dependent — never hash-compare that)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_custkey", "o_orderkey").alias("latest_custkey"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_big"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
    )


@query(
    "agg_corr_covar",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           ROUND((n * sxy - sx * sy) /
                 sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS qty_price_corr,
           ROUND((sxy - sx * sy / n) / (n - 1), 2) AS qty_price_covar
    FROM s
    """,
)
def q_agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance via exact decimal power sums.

    The built-in CORR/COVAR_SAMP co-moment accumulators merge in
    partition order, so Spark and DuckDB disagree in the last ulps
    (observed at sf0.01) — not hash-comparable. Decimal Σx/Σy/Σxy are
    exact and associative; combining them in identical double arithmetic
    gives bit-equal results. Same one-shuffle cost envelope."""
    l = load_table(spark, sf_dir, "lineitem")
    dx = F.col("l_quantity").cast("decimal(19,6)")
    dy = F.col("l_extendedprice").cast("decimal(19,6)")
    s = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # try_divide: a single-sample group has zero variance and n-1 = 0 —
    # corr/covar are then undefined (NULL) instead of an ANSI
    # DIVIDE_BY_ZERO abort on degenerate partitions
    return s.select(
        "l_returnflag",
        F.round(
            F.try_divide(
                n * sxy - sx * sy,
                F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            ),
            4,
        ).alias("qty_price_corr"),
        F.round(F.try_divide(sxy - sx * sy / n, n - 1), 2).alias("qty_price_covar"),
    )


@query(
    "fn_hash_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'a'
    """,
)
def q_fn_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 sample via an md5 bucket on the key — unlike
    TABLESAMPLE/rand() this is reproducible across engines, runs, and
    partitionings, which is what training-data subsampling needs (same
    doc always lands in the same split)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "a"
    ).select("doc_id", "lang")


@query(
    "agg_quantile_bucketize",
    oracle="""
    SELECT CAST(unnest(generate_series(1, 4)) AS INT) AS bucket,
           TRUE AS share_ok,
           (SELECT COUNT(*) FROM orders) AS total_rows
    """,
)
def q_agg_quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale twin of ntile: compute approx quantile cut-points (sketch,
    one small job), bucket rows with a CASE against the broadcast
    literals — no global sort at any data size. Sketch cut-points are
    engine-specific, so the driver-checkable surface is the invariants:
    all 4 buckets exist, each holds 25%±5% of rows (share_ok), and the
    bucketing conserves the exact row count (total_rows)."""
    o = load_table(spark, sf_dir, "orders")
    cuts = o.agg(
        F.expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 10000)")
    ).collect()[0][0]
    # empty relation: the sketch returns NULL — any cut-points work,
    # every downstream stage is empty anyway
    q1, q2, q3 = cuts if cuts is not None else (0.0, 0.0, 0.0)
    bucket = (
        F.when(F.col("o_totalprice") <= q1, 1)
        .when(F.col("o_totalprice") <= q2, 2)
        .when(F.col("o_totalprice") <= q3, 3)
        .otherwise(4)
    )
    counts = o.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))
    total = o.agg(F.count(F.lit(1)).alias("total_rows"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            (
                F.abs(F.col("n") / F.col("total_rows") - 0.25) <= 0.05
            ).alias("share_ok"),
            "total_rows",
        )
    )


@query(
    "agg_global_no_group",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(MIN(l_shipdate) AS DATE) AS first_ship,
           CAST(MAX(l_shipdate) AS DATE) AS last_ship
    FROM lineitem
    """,
)
def q_agg_global_no_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (ungrouped) aggregate — single-row result."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        F.to_date(F.min("l_shipdate")).alias("first_ship"),
        F.to_date(F.max("l_shipdate")).alias("last_ship"),
    )


@query(
    "agg_hll_rollup_merge",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           COUNT(DISTINCT date_trunc('month', o_orderdate)) AS n_months,
           COUNT(DISTINCT o_custkey) AS n_exact,
           TRUE AS est_within_5pct
    FROM orders GROUP BY 1
    """,
)
def q_agg_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct-count ladder (Apache DataSketches HLL
    via Spark built-ins hll_sketch_agg / hll_union_agg): per-month
    customer sketches are built in ONE scan of the fact table; every
    coarser grain (year here) is then a cheap associative union of the
    stored binary sketches — re-aggregation never touches the facts
    again. Exact distinct cannot ride a rollup ladder (distinct is not
    associative); sketches merge like sums, which is what makes
    distinct-count rollups viable at 100 TB. Sketch binaries and raw
    estimates are engine-specific, so the driver-checkable surface is
    (year, month count, exact distinct, estimate-within-5% flag): the
    oracle pins the exact columns, and the flag fails if the merged
    estimate ever drifts beyond HLL(lgK=12)'s error envelope."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.hll_sketch_agg("o_custkey", 12).alias("sk")
    )
    yearly = monthly.groupBy(F.year("month").alias("year")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count("*").alias("n_months"),
    )
    exact = o.groupBy(F.year("o_orderdate").alias("year")).agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return yearly.join(exact, "year").select(
        "year",
        "n_months",
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact")) <= F.col("n_exact") * 0.05
        ).alias("est_within_5pct"),
    )


@query(
    "agg_grouped_median",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS q1_qty,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS q3_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quantiles (linear-interpolated continuous
    percentile — both engines implement the same textbook definition).
    Exact percentile needs the group's values together (a sort within
    the aggregation); the sketch-based twin for 100 TB is
    ``agg_approx_percentile``/``agg_quantile_bucketize``."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q1_qty"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("q3_qty"),
    )


@query(
    "agg_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 50.0) AS BIGINT) AS bin,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def q_agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event type (bin = floor(value/50)) —
    the distribution summary that needs no sort and no sketch: one
    hash-aggregate keyed on (type, bin), map-side combinable, O(bins)
    output regardless of input size."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type", F.floor(F.col("value") / 50.0).cast("bigint").alias("bin")
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates: bucket each key
    into a 32k-bit bitmap (bitmap_bucket_number/bitmap_bit_position),
    OR the bitmaps per group, sum the popcounts. Same answer as
    COUNT(DISTINCT) but the shuffle carries fixed-size bitmaps instead
    of every distinct value — the exact-count analog of the HLL ladder
    (``agg_hll_rollup_merge``) when approximate isn't acceptable, and
    the bitmaps are mergeable across days/partitions the same way."""
    events = load_table(spark, sf_dir, "events")
    per_bucket = events.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bucket")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )


@query(
    "agg_rollup_grouping_id",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) AS g_priority,
           GROUPING(o_orderstatus) AS g_status,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def q_agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() metadata: the indicator that
    distinguishes a real NULL group from a subtotal row — required the
    moment rollup output feeds a report layer. Same single Expand+agg
    plan as the plain rollup; grouping() reads the expand tag, costing
    nothing."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_orderpriority", "o_orderstatus", "g_priority", "g_status", "n")
    )


@query(
    "agg_hll_set_overlap",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             MAX(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS hi,
             MAX(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS lo
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(SUM(hi) AS BIGINT) AS n_high,
           CAST(SUM(lo) AS BIGINT) AS n_low,
           CAST(SUM(hi * lo) AS BIGINT) AS n_both,
           TRUE AS est_within_10pct
    FROM per_cust
    """,
)
def q_agg_hll_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set algebra: how many distinct customers bought in BOTH
    the high-priority and low-priority segments, estimated by
    inclusion-exclusion over HLL sketches (|A∩B| ≈ |A| + |B| − |A∪B|,
    with |A∪B| from ``hll_union`` of the two sketch binaries) — the
    audience-overlap workflow where each segment's sketch is built once
    and intersections of ANY segment pair are answered without
    rescanning facts. One scan builds both sketches via conditional
    aggregation; the exact side is one groupBy(custkey) flag aggregate
    (no multi-distinct Expand). The oracle pins the exact counts and
    expects the estimate-within-10% flag TRUE (inclusion-exclusion
    compounds the two ±1.6% HLL errors, so the band is wider than the
    single-sketch queries')."""
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    sk = o.agg(
        F.hll_sketch_agg(F.when(high, F.col("o_custkey")), 12).alias("sk_hi"),
        F.hll_sketch_agg(F.when(~high, F.col("o_custkey")), 12).alias("sk_lo"),
    )
    est = sk.select(
        F.hll_sketch_estimate("sk_hi").alias("e_hi"),
        F.hll_sketch_estimate("sk_lo").alias("e_lo"),
        F.hll_sketch_estimate(F.hll_union("sk_hi", "sk_lo")).alias("e_union"),
    ).select((F.col("e_hi") + F.col("e_lo") - F.col("e_union")).alias("e_both"))
    exact = (
        o.groupBy("o_custkey")
        .agg(
            F.max(high.cast("long")).alias("hi"),
            F.max((~high).cast("long")).alias("lo"),
        )
        .agg(
            F.sum("hi").cast("bigint").alias("n_high"),
            F.sum("lo").cast("bigint").alias("n_low"),
            F.sum(F.col("hi") * F.col("lo")).cast("bigint").alias("n_both"),
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_high",
        "n_low",
        "n_both",
        (
            F.abs(F.col("e_both") - F.col("n_both")) <= F.col("n_both") * 0.10
        ).alias("est_within_10pct"),
    )


@query(
    "agg_join_size_estimate",
    oracle="""
    WITH c AS (
      SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1
    ), s AS (
      SELECT l_partkey, COUNT(*) AS s FROM lineitem
      WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                     || CAST(l_linenumber AS VARCHAR) || ':jsz'), 1, 8))
                 AS BIGINT) < 2147483648
      GROUP BY 1
    )
    SELECT (SELECT CAST(SUM(c * c) AS BIGINT) FROM c) AS exact_pairs,
           (SELECT CAST(4 * SUM(s * s) - 2 * SUM(s) AS BIGINT) FROM s) AS est_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_sampled_keys,
           abs((SELECT 4 * SUM(s * s) - 2 * SUM(s) FROM s)
               - (SELECT SUM(c * c) FROM c)) * 10
             <= (SELECT SUM(c * c) FROM c) AS est_within_10pct
    """,
)
def q_agg_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled join-cardinality estimation — the optimizer-statistics
    machinery behind join reordering, done as an operator: the size of
    the self-equi-join |L ⋈ L on l_partkey| = Σ c_k² is estimated from
    a deterministic 50% Bernoulli row sample WITHOUT touching the other
    50%. With sampling rate p exactly 1/2 (md5 row lane < 2^31 — the
    repo's portable-hash convention, exact in integers), the unbiased
    estimator E[Σs_k²] = p²c_k² + p(1−p)c_k inverts to
    est = 4·Σs_k² − 2·Σs_k — PURE int64 arithmetic, so both engines
    compute the identical estimate and the oracle needs no float
    tolerance. Emits exact, estimate, sampled-key count, and the
    cross-multiplied 10% accuracy bound (measured error ≤ 1.2% at
    every SF).

    Plan: two branch aggregates over one scan each (the sample branch's
    predicate rides the scan), joined as 1-row relations. At 100 TB the
    point is the SAMPLE side: join-size estimates for reordering come
    from increment-sized sample scans, never from executing the join."""
    li = load_table(spark, sf_dir, "lineitem")
    row_u32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("l_linenumber").cast("string"),
                    F.lit(":jsz"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")

    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("exact_pairs"))
    )
    sample = (
        li.filter(row_u32 < 2147483648)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("s"))
        .agg(
            (4 * F.sum(F.col("s") * F.col("s")) - 2 * F.sum("s"))
            .cast("bigint")
            .alias("est_pairs"),
            F.count(F.lit(1)).cast("bigint").alias("n_sampled_keys"),
        )
    )
    return exact.crossJoin(sample).select(
        "exact_pairs",
        "est_pairs",
        "n_sampled_keys",
        (
            F.abs(F.col("est_pairs") - F.col("exact_pairs")) * 10
            <= F.col("exact_pairs")
        ).alias("est_within_10pct"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(l_quantity AS BIGINT) AS wt,
             l_orderkey, l_linenumber
      FROM lineitem
    ), cum AS (
      SELECT l_returnflag, price_c,
             SUM(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY price_c, l_orderkey, l_linenumber
                           ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS total_w
      FROM w
    )
    SELECT l_returnflag,
           CAST(MIN(total_w) AS BIGINT) AS total_weight,
           CAST(MIN(price_c) AS BIGINT) AS median_price_c
    FROM cum
    WHERE 2 * cw >= total_w
    GROUP BY l_returnflag
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median (lower) of extended price per return flag,
    weighted by quantity — the inventory-weighted price statistic no
    Spark builtin computes (``percentile`` weights rows equally, and
    the approx sketches are unweighted too). Definition: the smallest
    value whose cumulative weight reaches half the total. Everything is
    exact integers — prices quantized to cents, integral quantities
    cast to int64, the half-total test cross-multiplied (2·cum ≥ total)
    — so no float summation order or rounding can diverge engines.

    Plan: ONE per-group sort shuffle carries both windows (running
    cumulative weight and group total share the partition), then the
    boundary row is min(price) over the monotone satisfying suffix —
    a plain aggregate, no second pass over sorted data. At 100 TB the
    per-group sort is the same shape as any grouped quantile; a
    pathological single hot group would move to the sketch path
    (``agg_quantile_bucketize``) that trades exactness for
    partition-parallel cut-points."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql.window import Window as W

    w = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("price_c"),
        F.col("l_quantity").cast("bigint").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    ordered = (
        W.partitionBy("l_returnflag")
        .orderBy("price_c", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    grp = W.partitionBy("l_returnflag")
    cum = w.select(
        "l_returnflag",
        "price_c",
        F.sum("wt").over(ordered).alias("cw"),
        F.sum("wt").over(grp).alias("total_w"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("total_w"))
        .groupBy("l_returnflag")
        .agg(
            F.min("total_w").cast("bigint").alias("total_weight"),
            F.min("price_c").cast("bigint").alias("median_price_c"),
        )
    )


@query(
    "agg_log2_histogram",
    oracle="""
    WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders
    )
    SELECT CAST(length(printf('%b', v)) AS BIGINT) AS bucket_log2,
           COUNT(*) AS n,
           CAST(MIN(v) AS BIGINT) AS lo_cents,
           CAST(MAX(v) AS BIGINT) AS hi_cents
    FROM cents
    GROUP BY 1 ORDER BY 1
    """,
)
def q_agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential (HdrHistogram-style) value histogram: power-of-two
    buckets over order totals in cents, bucket = bit length of the
    integer value — floor(log2)+1 computed EXACTLY via binary-string
    length on both engines, no float log anywhere.

    The latency/price-distribution summary format: constant relative
    error, fixed bucket count regardless of range, and buckets merge
    across shards/windows by addition (same mergeability argument as
    the CMS/HLL sketches). One partial-aggregated groupBy on a derived
    integer key; bucket bounds emitted as exact min/max cents.
    """
    cents = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("v")
    )
    return (
        cents.groupBy(F.length(F.bin(F.col("v"))).cast("bigint").alias("bucket_log2"))
        .agg(
            F.count("*").alias("n"),
            F.min("v").cast("bigint").alias("lo_cents"),
            F.max("v").cast("bigint").alias("hi_cents"),
        )
        .orderBy("bucket_log2")
    )


@query(
    "agg_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
        FROM lineitem GROUP BY l_partkey
    ), ranked AS (
        SELECT l_partkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum_cents,
               SUM(cents) OVER () AS total_cents
        FROM rev
    ), classed AS (
        SELECT CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                    WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               cents
        FROM ranked
    )
    SELECT abc_class, COUNT(*) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
)
def q_agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: rank parts by revenue,
    class A carries the first 80% of cumulative revenue, B to 95%, C
    the tail — the procurement/catalog-curation standard.

    Exactness: revenue in integer cents; the class boundaries compare
    ``cum*100 <= total*80`` by cross-multiplication, so no percentage
    division crosses the engines; the cumulative order is total
    (revenue desc, partkey). Scale shape (round-4 rewrite): one
    fact-table aggregate collapses to O(parts) — still billions of
    rows at 100 TB, so the cumulative-revenue sweep runs distributed
    via ``distrank.add_global_running_sum`` (revenue-range bins,
    per-bin parallel cumsums, O(bins) broadcast offsets; ties on cents
    keep the partkey tiebreak inside one bin because the bin is a
    function of cents alone) and the grand total attaches as a 1-row
    broadcast aggregate instead of a whole-relation window.
    """
    from .distrank import add_global_running_sum

    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents")
        )
        .select("l_partkey", "cents", (-F.col("cents")).alias("neg_cents"))
        .transform(pin)
    )
    st = rev.agg(
        F.min("neg_cents").alias("lo"),
        F.max("neg_cents").alias("hi"),
        F.sum("cents").alias("total_cents"),
    ).collect()[0]
    ranked = add_global_running_sum(
        rev, "neg_cents", "l_partkey", "cents", st["lo"], st["hi"], "cum_cents"
    ).select("cents", "cum_cents", F.lit(st["total_cents"]).alias("total_cents"))
    classed = ranked.select(
        F.when(F.col("cum_cents") * 100 <= F.col("total_cents") * 80, "A")
        .when(F.col("cum_cents") * 100 <= F.col("total_cents") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("abc_class")
    )


@query(
    "agg_hhi_concentration",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey AS nation, l.l_suppkey,
               SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ), mkt AS (
        SELECT nation,
               COUNT(*) AS n_suppliers,
               SUM(cents) AS total,
               SUM(CAST(cents AS HUGEINT) * cents) AS sum_sq
        FROM rev GROUP BY nation
    )
    SELECT nation, CAST(n_suppliers AS BIGINT) AS n_suppliers,
           CAST(total AS BIGINT) AS revenue_cents,
           CAST(sum_sq * 1000000 // (CAST(total AS HUGEINT) * total) AS BIGINT)
               AS hhi_micro
    FROM mkt ORDER BY nation
    """,
)
def q_agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index per nation:
    HHI = Σ share_i² over each nation's supplier revenue shares —
    the antitrust/market-structure gauge (1e6 micro = monopoly).

    Share division never happens: HHI = Σc_i² / (Σc_i)² by algebra, so
    both engines exchange one integer ratio per market (HUGEINT /
    DECIMAL(38,0) products — cents² sums overflow int64 by design,
    the same widening as the z-test). Two stacked aggregates: fact →
    (nation, supplier), then (nation); the supplier join broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents")
        )
    )
    mkt = rev.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum("cents").cast("bigint").alias("total"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sum_sq"),
    )
    return mkt.select(
        "nation",
        "n_suppliers",
        F.col("total").alias("revenue_cents"),
        F.expr(
            "CAST((sum_sq * 1000000) div (CAST(total AS DECIMAL(38,0)) * total) AS BIGINT)"
        ).alias("hhi_micro"),
    ).orderBy("nation")


@query(
    "agg_bootstrap_ci",
    oracle="""
    WITH w AS (
        SELECT o.b, o.o_orderkey,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               -- Poisson(1) weight by inverse CDF over the md5 u32 lane
               -- (thresholds floor(CDF(k)*2^32); tail truncated at 6,
               --  mass ~1e-4): E[w]=1, Var[w]~=1 — the real Poisson
               -- bootstrap, not a uniform stand-in
               CASE WHEN u < 1580030168 THEN 0 WHEN u < 3160060337 THEN 1
                    WHEN u < 3950075421 THEN 2 WHEN u < 4213413783 THEN 3
                    WHEN u < 4279248373 THEN 4 WHEN u < 4292415291 THEN 5
                    ELSE 6 END AS wt
        FROM (
            -- one md5 seeds FOUR replicates: the digest is 32 hex chars
            -- = 4 independent u32 lanes at offsets 1/9/17/25, so the
            -- 100-replicate fan-out hashes each row 25 times, not 100
            SELECT o.o_orderkey, o.o_totalprice, 4 * j.j + l.l AS b,
                   CAST(('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':'
                                            || CAST(o.o_orderkey AS VARCHAR)),
                                        CAST(1 + 8 * l.l AS INT), 8))
                        AS BIGINT) AS u
            FROM orders o, (SELECT unnest(range(0, 25)) AS j) j,
                 (SELECT unnest(range(0, 4)) AS l) l
        ) o
    ), reps AS (
        SELECT b,
               CAST(SUM(wt * cents) // SUM(wt) AS BIGINT) AS est_cents
        FROM w GROUP BY b HAVING SUM(wt) > 0
    ), ranked AS (
        SELECT est_cents,
               ROW_NUMBER() OVER (ORDER BY est_cents, b) AS rn,
               COUNT(*) OVER () AS n
        FROM reps
    )
    SELECT (SELECT CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        // COUNT(*) AS BIGINT) FROM orders) AS point_cents,
           (SELECT est_cents FROM ranked WHERE rn = 5) AS ci_lo_cents,
           (SELECT est_cents FROM ranked WHERE rn = 95) AS ci_hi_cents,
           (SELECT CAST(n AS BIGINT) FROM ranked LIMIT 1) AS n_replicates,
           TRUE AS ci_brackets_point
    """,
)
def q_agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean order value without
    resampling passes: the one-scan Poisson bootstrap — each row joins
    each of 100 replicates with a Poisson(1) weight drawn by inverse
    CDF from an md5-lane uniform (thresholds floor(CDF(k)·2³²), tail
    truncated at 6 with ~1e-4 mass; E[w]=1, Var[w]≈1, so replicate
    spread matches the true multinomial-bootstrap standard error) —
    replicate means in exact integer cents, the CI from order
    statistics of the replicate distribution.

    This is THE distributed-uncertainty technique (bag of little
    bootstraps' cousin): no per-replicate data pass, one explode +
    one groupBy; weights are deterministic md5 so both engines build
    the IDENTICAL 100 replicates and the driver adjudicates the
    interval exactly. ``ci_brackets_point`` pins the sanity invariant
    computed from the real values. At 100 TB the replicate dimension
    rides the scan (B× map-side rows into a 100-row aggregate) — no
    shuffle grows with B beyond the tiny replicate relation.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    # one md5 per (row, j) seeds FOUR replicates (the 32-hex digest is 4
    # independent u32 lanes): the replicate fan-out costs rows×25 md5
    # evaluations instead of rows×100. Lane extraction stays codegen:
    # the earlier `transform(..., l -> conv(substring(...)))` lambda ran
    # INTERPRETED per element and conv re-parsed 8 hex chars per lane —
    # together ~5× the digest's own cost (md5-only floor 2.1 s vs
    # 11.5 s at sf0.1). Two fixes: (a) the Poisson inverse-CDF compares
    # the lane's 8 hex chars AS A STRING against hex-encoded thresholds
    # (fixed-width lowercase hex orders identically to the u32 it
    # spells, so `u < T` ⟺ `substr(h) < hex8(T)` — no conv at all), and
    # (b) the four lanes fold into per-lane aggregate columns on the
    # UN-exploded (row, j) relation — groupBy(j) with 4×(Σwt·cents, Σwt)
    # then one `stack` to the 100-replicate relation — so the shuffle
    # carries 25 groups of 8 longs instead of 15M exploded rows.
    # Weight values per (row, b) are bit-identical to the oracle's
    # numeric-threshold formulation: measured 11.5 s → 4.0 s at sf0.1.
    thresholds = [1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291]

    def _wt(lane: int):
        sub = F.substring("h", 1 + 8 * lane, 8)
        w = F.when(sub < format(thresholds[0], "08x"), 0)
        for k, t in enumerate(thresholds[1:], start=1):
            w = w.when(sub < format(t, "08x"), k)
        return w.otherwise(6)

    j = F.explode(F.sequence(F.lit(0), F.lit(24))).alias("j")
    # r9 (guide §2.5): the single-row-group scan gives this pipeline ONE
    # task, so the whole rows×25 md5 + 100-compare weight kernel ran on
    # one core (3.7 s of the 4.7 s isolated floor at sf0.1). Hash
    # repartition on the unique o_orderkey spreads the kernel across the
    # cluster for a ~2.4 MB shuffle of the narrow (key, cents) rows;
    # no-op once the scan already has cluster parallelism (100 TB case).
    lanes = (
        fan_out_compute(orders, "o_orderkey").select("o_orderkey", "cents", j)
        .withColumn("h", F.md5(F.concat_ws(":", F.col("j"), F.col("o_orderkey"))))
        .select("cents", "j", *[_wt(l).alias(f"wt{l}") for l in range(4)])
    )
    per_j = lanes.groupBy("j").agg(
        *[
            agg
            for l in range(4)
            for agg in (
                F.sum(F.col(f"wt{l}") * F.col("cents")).alias(f"swc{l}"),
                F.sum(f"wt{l}").alias(f"sw{l}"),
            )
        ]
    )
    reps = (
        per_j.select(
            F.expr(
                "stack(4, 4*j+0, swc0, sw0, 4*j+1, swc1, sw1,"
                " 4*j+2, swc2, sw2, 4*j+3, swc3, sw3) AS (b, swc, sw)"
            )
        )
        .filter(F.col("sw") > 0)
        .select("b", F.expr("swc div sw").cast("bigint").alias("est_cents"))
    )
    # ONE aggregate over the 100-row replicate relation extracts both
    # order statistics and the count: the rank-5/rank-95 window + three
    # separate 1-row cross-join sides each re-ran the whole exploded
    # md5 pipeline (3 full passes over B×rows — measured 14.2 s at
    # sf0.1; single-pass ~3× less). sort_array over ≤B elements is
    # driver-safe because B is a constant 100, never data-sized; ties
    # in est_cents yield the same 5th/95th VALUE as the (est_cents, b)
    # row_number order did, since only the value is emitted.
    stats = reps.agg(
        F.sort_array(F.collect_list("est_cents")).alias("xs"),
        F.count("*").alias("n"),
    ).select(
        # try_: fewer than 95 surviving replicates (a degenerate corpus)
        # yields NULL bounds, not an out-of-bounds abort
        F.try_element_at("xs", F.lit(5)).alias("ci_lo_cents"),
        F.try_element_at("xs", F.lit(95)).alias("ci_hi_cents"),
        F.when(F.col("n") > 0, F.col("n")).cast("bigint").alias("n_replicates"),
    )
    point = orders.agg(
        F.expr("CAST(SUM(cents) div COUNT(*) AS BIGINT)").alias("point_cents")
    )
    out = point.crossJoin(stats)
    return out.select(
        "point_cents",
        "ci_lo_cents",
        "ci_hi_cents",
        "n_replicates",
        (
            (F.col("ci_lo_cents") <= F.col("point_cents"))
            & (F.col("point_cents") <= F.col("ci_hi_cents"))
        ).alias("ci_brackets_point"),
    )


@query(
    "agg_top_movers_period_delta",
    oracle="""
    WITH bounds AS (
        SELECT MIN(o_orderdate) AS t0,
               MIN(o_orderdate) + (MAX(o_orderdate) - MIN(o_orderdate)) / 2 AS mid
        FROM orders
    ), rev AS (
        SELECT o.o_custkey AS custkey,
               CASE WHEN o.o_orderdate < b.mid THEN 'p1' ELSE 'p2' END AS period,
               SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
        FROM orders o CROSS JOIN bounds b
        GROUP BY 1, 2
    ), wide AS (
        SELECT custkey,
               COALESCE(SUM(cents) FILTER (WHERE period = 'p1'), 0) AS p1_cents,
               COALESCE(SUM(cents) FILTER (WHERE period = 'p2'), 0) AS p2_cents
        FROM rev GROUP BY custkey
    )
    SELECT custkey, CAST(p1_cents AS BIGINT) AS p1_cents,
           CAST(p2_cents AS BIGINT) AS p2_cents,
           CAST(p2_cents - p1_cents AS BIGINT) AS delta_cents
    FROM wide
    ORDER BY abs(p2_cents - p1_cents) DESC, custkey
    LIMIT 10
    """,
)
def q_agg_top_movers_period_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by absolute revenue change between the first
    and second half of the order-date range — the what-changed report
    every revenue dashboard leads with.

    The midpoint derives from exact timestamp arithmetic (min + half
    the span — the same integer-microsecond discipline as the zone-map
    probe), revenue stays in integer cents, and the top-10 cut is
    totally ordered (|delta| desc, custkey). Scale shape: one
    conditional aggregate per (customer, period) with the 1-row bounds
    relation broadcast; the FILTER pivot collapses to one row per
    customer; TakeOrdered ends it — no global sort.
    """
    from pyspark.sql.window import Window  # noqa: F401  (module convention)

    # o_orderdate reads as TIMESTAMP_NTZ; cast once to session-UTC
    # TIMESTAMP so integer-microsecond arithmetic applies (UTC session
    # pins the conversion — the repo-wide timezone contract)
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    bounds = orders.agg(
        F.min("o_orderdate").alias("t0"), F.max("o_orderdate").alias("t1")
    ).select(
        F.expr(
            "timestampadd(MICROSECOND,"
            " (unix_micros(t1) - unix_micros(t0)) div 2, t0)"
        ).alias("mid")
    )
    rev = (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.when(F.col("o_orderdate") < F.col("mid"), "p1").otherwise("p2").alias(
                "period"
            ),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents")
        )
    )
    wide = rev.groupBy("custkey").agg(
        F.coalesce(
            F.sum(F.when(F.col("period") == "p1", F.col("cents"))), F.lit(0)
        ).alias("p1_cents"),
        F.coalesce(
            F.sum(F.when(F.col("period") == "p2", F.col("cents"))), F.lit(0)
        ).alias("p2_cents"),
    )
    return (
        wide.select(
            "custkey",
            "p1_cents",
            "p2_cents",
            (F.col("p2_cents") - F.col("p1_cents")).alias("delta_cents"),
        )
        .orderBy(F.abs(F.col("delta_cents")).desc(), F.asc("custkey"))
        .limit(10)
    )
