"""Join-family queries (SURVEY §2.3).

The reference has only equi inner joins (glue_rds_to_redshift.py:46);
the rebuild exposes every Spark join type through the one primitive
``df.join(other, cond, how)``. Scale notes per query in docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..session import pin
from ..sources.io import load_table


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no qualifying orders."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join; orders always survive, rich customers optional."""
    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_name")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_name"
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer WHERE c_acctbal > 9000 GROUP BY 1
    ), supp AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
           cust.n_customers, supp.n_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two per-nation aggregates with nulls on both sides."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    joined = cust.join(supp, cust.nationkey == supp.nationkey, "full")
    return joined.select(
        F.coalesce(cust.nationkey, supp.nationkey).alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): customers that placed a big order. Semi joins
    shuffle only the keys of the probe side — at 100 TB far cheaper than
    inner-join+distinct."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no orders at all."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_broadcast_snowflake",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def q_join_broadcast_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join through two explicitly-broadcast tiny dims.

    nation (25 rows) and region (5 rows) never grow with SF, so a
    broadcast hint is always correct — no shuffle of the big side at any
    scale. Decimal-cast sums keep the aggregate deterministic for the
    hash compare.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
    )


@query(
    "join_range_nonequi",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderdate
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    """,
)
def q_join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range predicate (late shipments >60 days after order).

    The equi conjunct keeps this a hash/sort-merge join with the range
    as a post-join filter — NOT a broadcast-nested-loop — so it scales.
    A pure theta join (no equi conjunct) degenerates to BNL; never do
    that on two large tables.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cond = (lineitem.l_orderkey == orders.o_orderkey) & (
        lineitem.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return lineitem.join(orders, cond, "inner").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate"
    )


@query(
    "join_theta_self_pairs",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
    FROM nation a
    JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def q_join_theta_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self theta-join: unordered nation pairs within a region."""
    a = load_table(spark, sf_dir, "nation").alias("a")
    b = load_table(spark, sf_dir, "nation").alias("b")
    cond = (F.col("a.n_regionkey") == F.col("b.n_regionkey")) & (
        F.col("a.n_nationkey") < F.col("b.n_nationkey")
    )
    return a.join(b, cond).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


@query(
    "join_cross_explicit",
    oracle="""
    SELECT n.n_name AS nation_name, r.r_name AS region_name
    FROM nation n CROSS JOIN region r
    """,
)
def q_join_cross_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (cartesian) of two tiny dims — legitimate only
    when one side is broadcast-small; Spark requires the explicit
    crossJoin call so accidental cartesians fail loudly."""
    n = load_table(spark, sf_dir, "nation").select(F.col("n_name").alias("nation_name"))
    r = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("region_name"))
    return n.crossJoin(F.broadcast(r))


@query(
    "join_5way_snowflake",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY 1
    """,
)
def q_join_5way_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way snowflake join (TPC-H Q5 shape): fact → orders → customer →
    nation → region, revenue per region.

    Catalyst reorders and broadcasts the small dims; the orderdate filter
    is pushed to the orders parquet scan before the join.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "join_asof_last_view",
    oracle="""
    WITH v AS (
      SELECT user_id, ts AS view_ts, MAX(event_id) AS view_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), p AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.purchase_ts, v.view_id, v.view_ts
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND v.view_ts <= p.purchase_ts
    """,
)
def q_join_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — an operator Spark has no built-in for: each purchase
    matched to the same user's latest view at-or-before it (the oracle
    is DuckDB's native ASOF LEFT JOIN).

    Implemented with the union+window technique, the scale path: tag
    both sides, union them, one window per user ordered by (time, side)
    carrying last(view cols, ignoreNulls) forward, keep the purchase
    rows. ONE shuffle on the join key, zero row explosion — unlike the
    naive inequality-join + argmax, which materializes every
    (purchase × earlier-view) pair before reducing. Views are
    pre-deduped to one row per (user, ts) so tie-breaking is
    deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("t"))
        .agg(F.max("event_id").alias("view_id"))
        .select(
            "user_id",
            "t",
            F.lit(0).alias("side"),
            "view_id",
            F.col("t").alias("view_ts"),
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("view_id"),
        F.lit(None).cast("timestamp").alias("view_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("t"), F.asc("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        views.unionByName(purchases)
        .withColumn("asof_view_id", F.last("view_id", ignorenulls=True).over(w))
        .withColumn("asof_view_ts", F.last("view_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("t").alias("purchase_ts"),
            F.col("asof_view_id").alias("view_id"),
            F.col("asof_view_ts").alias("view_ts"),
        )
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH c AS (
      SELECT nullif(c_custkey % 7, 0) AS k, COUNT(*) AS n_customers
      FROM customer GROUP BY 1
    ), o AS (
      SELECT nullif(o_custkey % 7, 0) AS k, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT c.k AS k, n_customers, n_orders
    FROM c JOIN o ON c.k IS NOT DISTINCT FROM o.k
    """,
)
def q_join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics ETL needs when
    a nullable dimension key must still pair its "unknown" buckets.
    Pre-aggregating both sides first keeps the NULL bucket a single row
    per side, so the null-safe join never explodes (the naive row-level
    null-safe join is a hidden cross join between the NULL populations).
    Catalyst plans ``<=>`` as a normal hash join key."""
    c = (
        load_table(spark, sf_dir, "customer")
        .select(F.nullif(F.col("c_custkey") % 7, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_customers"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select(F.nullif(F.col("o_custkey") % 7, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_orders"))
    )
    return c.alias("c").join(o.alias("o"), F.col("c.k").eqNullSafe(F.col("o.k"))).select(
        F.col("c.k").alias("k"), "n_customers", "n_orders"
    )


#: Bucket width (days) for the binned interval join below.
INTERVAL_BUCKET_DAYS = 30


@query(
    "join_interval_binned",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS start_d,
             CAST(o_orderdate AS DATE) + 30 AS end_d
      FROM orders WHERE o_orderstatus = 'P' AND o_orderkey % 97 = 0
    )
    SELECT iv.o_orderkey, CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_shipped
    FROM iv LEFT JOIN lineitem l
      ON CAST(l.l_shipdate AS DATE) >= iv.start_d
     AND CAST(l.l_shipdate AS DATE) < iv.end_d
    GROUP BY 1
    """,
)
def q_join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval join done scale-safe: count ALL lineitems
    shipped inside each sampled order's 30-day window — there is no
    equi key relating the two sides, the predicate is purely
    range-vs-point, which Spark would otherwise plan as a
    BroadcastNestedLoopJoin (O(n·m) compares; a cluster-killer when
    neither side broadcasts).

    The standard rewrite: BIN time into fixed-width buckets — each
    point belongs to exactly one bucket, each interval EXPLODES into
    the (at most ⌈len/width⌉+1) buckets it covers — equi-join on the
    bucket id, then refine with the exact range predicate. A
    (point, interval) pair meets in exactly one bucket (the point's),
    so no post-join dedup is needed. The join becomes a plain shuffle
    hash join keyed on the bucket: partitionable, skew-manageable,
    no nested loop at any scale. Zero-match intervals are restored by
    a left join against the interval set (the oracle's LEFT JOIN)."""
    B = INTERVAL_BUCKET_DAYS
    epoch = F.lit("1970-01-01").cast("date")
    iv = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "P") & (F.col("o_orderkey") % 97 == 0))
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("start_d"),
            F.date_add(F.to_date("o_orderdate"), B).alias("end_d"),
        )
    )
    sd = F.datediff(F.col("start_d"), epoch)
    ed = F.datediff(F.col("end_d"), epoch)
    iv_binned = iv.select(
        "o_orderkey",
        "start_d",
        "end_d",
        F.explode(
            F.sequence(F.floor(sd / B).cast("long"), F.floor((ed - 1) / B).cast("long"))
        ).alias("bucket"),
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.to_date("l_shipdate").alias("ship_d"))
        .withColumn(
            "bucket", F.floor(F.datediff(F.col("ship_d"), epoch) / B).cast("long")
        )
    )
    matched = (
        li.join(iv_binned, "bucket")
        .filter((F.col("ship_d") >= F.col("start_d")) & (F.col("ship_d") < F.col("end_d")))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        iv.select("o_orderkey")
        .join(matched, "o_orderkey", "left")
        .select("o_orderkey", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_shipped"))
    )


@query(
    "join_point_in_time_features",
    oracle="""
    WITH hist AS (
      SELECT user_id, event_id, value AS attr_value, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'purchase'
    ), probes AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           h.event_id AS feature_src, h.attr_value AS feature_value
    FROM probes p LEFT JOIN hist h
      ON p.user_id = h.user_id AND p.ts >= h.valid_from
     AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    """,
)
def q_join_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join — the feature-store primitive
    a training pipeline needs so features never leak the future: every
    'view' probe is enriched with the purchase-value feature AS OF its
    own timestamp (the latest purchase at-or-before, NULL before the
    first — the same leakage rule Feast/Tecton enforce). Declaratively
    this is a validity-interval join against the SCD2 history
    (``scd2_user_value_history``); the oracle states it that way.

    Scale path: the union+window as-of technique (cf.
    ``join_asof_last_view``) — tag history rows src=0 and probes src=1,
    union, and take ``last(value, ignorenulls)`` over the per-user
    (ts, src, event_id)-ordered running frame. ONE shuffle on user_id,
    zero row explosion, no range join for Catalyst to nested-loop. The
    (ts, src) ordering makes boundary semantics exact: a probe AT a
    purchase timestamp sees that purchase (src 0 < 1), and same-ts
    purchases resolve to the max event_id — bit-equal to the interval
    formulation, where the earlier duplicate's [t, t) interval is
    empty."""
    ev = load_table(spark, sf_dir, "events")
    hist = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("src"),
        "event_id",
        F.col("value").alias("attr"),
    )
    probes = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(1).alias("src"), "event_id",
        F.lit(None).cast("double").alias("attr"),
    )
    u = hist.unionByName(probes)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    feature = F.last("attr", ignorenulls=True).over(w)
    feature_src = F.last(
        F.when(F.col("attr").isNotNull(), F.col("event_id")), ignorenulls=True
    ).over(w)
    return (
        u.select(
            "event_id",
            "user_id",
            "src",
            feature_src.alias("feature_src"),
            feature.alias("feature_value"),
        )
        .filter(F.col("src") == 1)
        .drop("src")
    )


@query(
    "join_bloom_semi_reduction",
    oracle="""
    WITH keys AS (
        SELECT DISTINCT s_suppkey FROM supplier WHERE s_nationkey < 5
    ), positions AS (
        SELECT s_suppkey, lane,
               CAST(('0x' || substr(md5(CAST(lane AS VARCHAR) || ':'
                                        || CAST(s_suppkey AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 1024 AS p
        FROM keys, (SELECT unnest([0, 1, 2]) AS lane)
    ), words AS (
        SELECT p // 32 AS w, bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS bits
        FROM positions GROUP BY 1
    ), fact_pairs AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ), probe AS (
        SELECT l_orderkey, l_suppkey, lane,
               CAST(('0x' || substr(md5(CAST(lane AS VARCHAR) || ':'
                                        || CAST(l_suppkey AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 1024 AS p
        FROM fact_pairs, (SELECT unnest([0, 1, 2]) AS lane)
    ), hits AS (
        SELECT l_orderkey, l_suppkey
        FROM probe LEFT JOIN words ON words.w = p // 32
        GROUP BY l_orderkey, l_suppkey
        HAVING COUNT(*) FILTER (
            WHERE (bits >> CAST(p % 32 AS INTEGER)) & 1 = 1) = 3
    )
    SELECT (SELECT COUNT(*) FROM lineitem) AS n_fact_rows,
           (SELECT COUNT(*) FROM hits) AS n_candidates,
           (SELECT COUNT(*) FROM hits WHERE l_suppkey IN (SELECT s_suppkey FROM keys))
               AS n_true_matches,
           (SELECT COUNT(*) FROM hits WHERE l_suppkey NOT IN (SELECT s_suppkey FROM keys))
               AS n_false_positives,
           TRUE AS no_false_negatives
    """,
)
def q_join_bloom_semi_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction: thin the fact scan against a
    1024-bit / 3-lane bloom filter of the dim-side keyset BEFORE any
    shuffle, then measure the filter's exactness.

    This is the operator form of what Catalyst's runtime bloom filters
    do under AQE (pinned at plan level in tests/test_plans.py): the
    dim keyset folds to 32 32-bit words (bit_or aggregate), the words
    travel to the fact scan as a 32-element broadcast literal — O(1)
    state, never a join — and each fact row tests its 3 md5-lane bit
    positions with pure JVM bit arithmetic. At 100 TB this converts a
    full-fact shuffle into a pre-shuffle filter at bloom selectivity
    (here: keyset/supplier ratio plus a measured false-positive term).

    Everything is md5-deterministic, so the DuckDB oracle recomputes
    the IDENTICAL filter (same lanes, same words) and the emitted
    false-positive count is adjudicated exactly;
    ``no_false_negatives`` pins the bloom guarantee (a real anti-join
    count of true matches missed by the filter — zero by construction).
    """
    supplier = load_table(spark, sf_dir, "supplier")
    keys = (
        supplier.filter(F.col("s_nationkey") < 5).select("s_suppkey").distinct()
    )

    def positions(df: DataFrame, key: str) -> DataFrame:
        lanes = F.array([F.lit(i) for i in range(3)])
        return df.withColumn("lane", F.explode(lanes)).withColumn(
            "p",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("lane"), F.col(key))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % 1024,
        )

    words = (
        positions(keys, "s_suppkey")
        .groupBy((F.col("p") / 32).cast("bigint").alias("w"))
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))")).alias("bits"))
        .collect()
    )
    # O(1) control-plane state: the bloom words ship as a literal array,
    # exactly like a broadcast variable — no join against the fact side.
    word_arr = [0] * 32
    for r in words:
        word_arr[int(r["w"])] = int(r["bits"])
    warr = F.array([F.lit(b).cast("long") for b in word_arr])

    fact = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # pinned: the distinct pair relation feeds the probe AND the
    # false-negative audit — one distinct shuffle, not two
    fact_pairs = fact.distinct().transform(pin)
    # the probe is a per-row conjunction of 3 bit tests against the word
    # literal — a single map-side expression, NOT an explode + re-group
    # (the lanes depend only on the row's own key and the 32 literal
    # words, so no second shuffle of the pair relation is needed)

    def _lane_hit(lane: int):
        p = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(lane), F.col("l_suppkey"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % 1024
        )
        return F.expr(
            "shiftrightunsigned(element_at(bloom_words,"
            f" CAST({'p%d' % lane} div 32 AS INT) + 1),"
            f" CAST({'p%d' % lane} % 32 AS INT)) % 2 = 1"
        ), p

    probed = fact_pairs.withColumn("bloom_words", warr)
    hit_exprs = []
    for lane in range(3):
        expr, p = _lane_hit(lane)
        probed = probed.withColumn(f"p{lane}", p)
        hit_exprs.append(expr)
    # pinned: the md5-probe pipeline runs ONCE; the candidate stats, the
    # true/false split, and the false-negative audit all read the pinned
    # relation instead of re-deriving distinct + 3 md5 lanes per side
    # (previously ~5 full passes across the crossJoin sides + missed)
    hits = (
        probed.filter(hit_exprs[0] & hit_exprs[1] & hit_exprs[2])
        .select("l_orderkey", "l_suppkey")
        .transform(pin)
    )
    # one aggregate splits candidates into true matches / false
    # positives via the broadcast keyset (semi + anti were two passes)
    stats = (
        hits.join(F.broadcast(keys), hits.l_suppkey == keys.s_suppkey, "left")
        .agg(
            F.count("*").alias("n_candidates"),
            F.count(keys.s_suppkey).alias("n_true_matches"),
            (F.count("*") - F.count(keys.s_suppkey)).alias("n_false_positives"),
        )
    )
    missed = (
        fact_pairs.join(F.broadcast(keys), fact_pairs.l_suppkey == keys.s_suppkey, "left_semi")
        .join(hits, ["l_orderkey", "l_suppkey"], "left_anti")
        .count()
    )
    return (
        fact.agg(F.count("*").alias("n_fact_rows"))
        .crossJoin(stats)
        .withColumn("no_false_negatives", F.lit(missed == 0))
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH v AS (
      SELECT user_id, ts AS view_ts, MAX(event_id) AS view_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), p AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ), matched AS (
      SELECT p.purchase_id, p.user_id, p.purchase_ts, v.view_id, v.view_ts
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND v.view_ts <= p.purchase_ts
    )
    SELECT purchase_id, user_id, purchase_ts,
           CASE WHEN view_ts IS NOT NULL
                     AND epoch_us(purchase_ts) - epoch_us(view_ts) <= 86400000000
                THEN view_id END AS view_id,
           CASE WHEN view_ts IS NOT NULL
                     AND epoch_us(purchase_ts) - epoch_us(view_ts) <= 86400000000
                THEN view_ts END AS view_ts,
           view_ts IS NOT NULL
               AND epoch_us(purchase_ts) - epoch_us(view_ts) > 86400000000
               AS dropped_stale
    FROM matched
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness TOLERANCE (pandas ``merge_asof``
    tolerance semantics, feature-store freshness SLAs): the latest
    at-or-before view still matches a purchase only if it is at most
    24h old — a staler match is nulled and flagged, never silently
    served.

    Same union+window scale path as ``join_asof_last_view`` (one keyed
    shuffle, zero row explosion); the tolerance is a pure post-window
    projection in integer microseconds, so it adds NO plan cost — the
    whole SLA check rides the join's existing co-location. The oracle
    applies the identical bound over DuckDB's native ASOF join.
    """
    base = q_join_asof_last_view(spark, sf_dir)
    fresh = (
        F.col("view_ts").isNotNull()
        & (F.unix_micros("purchase_ts") - F.unix_micros("view_ts") <= 86400000000)
    )
    stale = (
        F.col("view_ts").isNotNull()
        & (F.unix_micros("purchase_ts") - F.unix_micros("view_ts") > 86400000000)
    )
    return base.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.when(fresh, F.col("view_id")).alias("view_id"),
        F.when(fresh, F.col("view_ts")).alias("view_ts"),
        stale.alias("dropped_stale"),
    )


@query(
    "join_interval_overlap_binned",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey, o_orderpriority,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS s,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               + o_orderkey % 7 + 1 AS e
      FROM orders
    ),
    a AS (SELECT * FROM iv WHERE o_orderkey % 10 = 0),
    b AS (SELECT * FROM iv WHERE o_orderkey % 10 = 5)
    SELECT a.o_orderpriority AS a_priority,
           b.o_orderpriority AS b_priority,
           COUNT(*) AS n_overlaps,
           CAST(SUM(LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1) AS BIGINT)
             AS overlap_days
    FROM a JOIN b ON a.s <= b.e AND b.s <= a.e
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_join_interval_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval OVERLAP join, scale-safe: two interval sets
    (disjoint order samples, validity = orderdate + orderkey%7+1 days)
    joined on overlap, aggregated to the priority-pair matrix with
    exact overlap-day sums.

    [[join_interval_binned]] handles point-in-interval; interval-
    interval adds a hazard that technique alone doesn't cover: two
    intervals can SHARE SEVERAL time buckets, so the bucket equi-join
    yields duplicate candidate pairs. Deduplication is by RESPONSIBILITY
    ASSIGNMENT, not a distinct: a pair is counted only in the bucket
    containing max(a.start, b.start) — a bucket both intervals provably
    explode into (the later start lies inside both intervals), so each
    overlapping pair survives exactly once, with no second shuffle and
    no pair-key distinct. Spark would otherwise plan the raw overlap
    predicate as a BroadcastNestedLoopJoin (pinned away in tests).

    Scale: bucket width (8 days) ~ max interval length, so each
    interval lands in <= 2 buckets (explosion <= 2x) and candidates are
    bucket-local; the oracle is the definitional overlap join DuckDB
    plans as IEJoin.
    """
    iv = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("s"),
    )
    iv = iv.withColumn("e", F.col("s") + F.col("o_orderkey") % 7 + 1)
    a = iv.filter(F.col("o_orderkey") % 10 == 0)
    b = iv.filter(F.col("o_orderkey") % 10 == 5)

    def binned(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col("o_orderpriority").alias(f"{side}_priority"),
            F.col("s").alias(f"{side}_s"),
            F.col("e").alias(f"{side}_e"),
            F.explode(
                F.sequence(F.floor(F.col("s") / 8), F.floor(F.col("e") / 8))
            ).alias("bucket"),
        )

    cand = binned(a, "a").join(binned(b, "b"), "bucket")
    hits = cand.filter(
        (F.col("a_s") <= F.col("b_e"))
        & (F.col("b_s") <= F.col("a_e"))
        # responsibility assignment: count the pair only in the bucket
        # holding the later start (shared by construction)
        & (F.col("bucket") == F.floor(F.greatest(F.col("a_s"), F.col("b_s")) / 8))
    )
    return (
        hits.groupBy("a_priority", "b_priority")
        .agg(
            F.count("*").alias("n_overlaps"),
            F.sum(
                F.least(F.col("a_e"), F.col("b_e"))
                - F.greatest(F.col("a_s"), F.col("b_s"))
                + 1
            )
            .cast("bigint")
            .alias("overlap_days"),
        )
        .orderBy("a_priority", "b_priority")
    )


@query(
    "join_hint_strategy_invariance",
    oracle="""
    WITH agg AS (
      SELECT COUNT(*) AS n_items,
             CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
    )
    SELECT strategy, n_items, revenue_cents, TRUE AS hint_honored
    FROM agg, (SELECT 'broadcast' AS strategy UNION ALL
               SELECT 'merge' UNION ALL SELECT 'shuffle_hash') s
    ORDER BY strategy
    """,
)
def q_join_hint_strategy_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy HINTS as a first-class tuning surface: the same
    fact⋈dim join executed under BROADCAST, MERGE and SHUFFLE_HASH
    hints must (a) actually flip the physical operator — adjudicated
    per-lane via a plan-derived ``hint_honored`` boolean, since a hint
    Catalyst silently ignores is a 100 TB incident waiting (an
    accidental broadcast of a huge build side OOMs every executor; an
    accidental SMJ of a skewed key spills for hours) — and (b) leave
    the RESULT bit-identical, which the shared oracle aggregate pins
    across all three lanes.

    Hints override the size-based planner choice (broadcast >
    merge > shuffle_hash in Spark's resolution order, each beating
    autoBroadcastJoinThreshold), so this also documents the override
    contract the engine relies on when statistics are wrong — the
    AQE-era replacement for hand-setting the threshold per job.
    """
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    lanes = {
        "broadcast": ("BroadcastHashJoin", o.hint("broadcast")),
        "merge": ("SortMergeJoin", o.hint("merge")),
        "shuffle_hash": ("ShuffledHashJoin", o.hint("shuffle_hash")),
    }
    out = None
    for name, (node, dim) in lanes.items():
        j = l.join(dim, l.l_orderkey == dim.o_orderkey)
        plan = j._jdf.queryExecution().explainString(mode)
        honored = node in plan
        lane = j.agg(
            F.count("*").alias("n_items"),
            F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        ).select(
            F.lit(name).alias("strategy"),
            "n_items",
            "revenue_cents",
            F.lit(honored).alias("hint_honored"),
        )
        out = lane if out is None else out.unionByName(lane)
    return out.orderBy("strategy")
