"""Analytics breadth: deterministic mode, discrete percentiles, fuzzy
edit-distance dedup pairs, cohort retention, tumbling time buckets,
cryptographic digests, n-gram language-model counts.

Fills SURVEY §2.4/§2.7/§2.8 surfaces the registry didn't cover yet.
Everything is JVM-side column expressions; the only shuffles are the
grouping/window exchanges each operator inherently needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..session import pin
from ..sources.io import load_table


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH counted AS (
      SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_mktsegment ORDER BY n DESC, o_orderpriority ASC) AS rn
      FROM counted
    )
    SELECT c_mktsegment, o_orderpriority AS modal_priority, n AS n_orders
    FROM ranked WHERE rn = 1
    """,
)
def q_agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: most frequent order priority per market
    segment, ties broken by priority string. Built-in ``F.mode`` is
    non-deterministic on ties, so the engine computes count→argmax via a
    window — two shuffles, both on low-cardinality keys, both safe at
    100 TB (the windowed relation is one row per (segment, priority))."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    counted = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("n").alias("n_orders"),
        )
    )


@query(
    "agg_percentile_disc",
    oracle="""
    SELECT o_orderpriority,
           ROUND(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p25,
           ROUND(PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p50,
           ROUND(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (PERCENTILE_DISC): the smallest value
    whose cumulative rank reaches p — i.e. the value at sorted row
    ceil(p·n). Spark has no exact disc builtin, so the engine sorts
    within each group once (single window shuffle) and selects the
    boundary rows with conditional aggregation. Ties can't bleed across
    the boundary: ordering is by value, so the selected *value* is
    deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = o.select("o_orderpriority", "o_totalprice").select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("o_orderpriority")).alias("n"),
    )

    def pick(p: float):
        target = F.ceil(F.lit(p) * F.col("n"))
        return F.round(
            F.max(F.when(F.col("rn") == target, F.col("o_totalprice"))), 2
        )

    return ranked.groupBy("o_orderpriority").agg(
        pick(0.25).alias("p25"), pick(0.50).alias("p50"), pick(0.75).alias("p75")
    )


@query(
    "dedup_fuzzy_pairs_blocked",
    oracle="""
    SELECT a.c_nationkey AS nationkey,
           a.c_custkey AS left_key, b.c_custkey AS right_key,
           levenshtein(a.c_name, b.c_name) AS edit_distance
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def q_dedup_fuzzy_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup candidates by edit distance ≤ 1 via deletion-
    neighborhood blocking (FastSS/SymSpell): each name explodes into its
    L+1 single-deletion variants, candidates equi-join on
    (nation, variant), and the exact levenshtein filter runs only on
    candidates. Two strings within edit distance 1 always share a
    variant, so this is *exact* — but the quadratic all-pairs compare
    (the oracle's formulation) is replaced by a fine-keyed hash join
    that stays near-linear at 100 TB."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    variants = c.select(
        "*",
        F.explode(
            F.expr(
                "transform(sequence(0, length(c_name)), i -> CASE WHEN i = 0 THEN c_name"
                " ELSE concat(substring(c_name, 1, i - 1),"
                " substring(c_name, i + 1, length(c_name))) END)"
            )
        ).alias("variant"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_nationkey").alias("nationkey"),
            F.col("a.c_custkey").alias("left_key"),
            F.col("b.c_custkey").alias("right_key"),
            F.col("a.c_name").alias("left_name"),
            F.col("b.c_name").alias("right_name"),
        )
        .distinct()
    )
    dist = F.levenshtein(F.col("left_name"), F.col("right_name"))
    return (
        candidates.filter(dist <= 1)
        .select("nationkey", "left_key", "right_key", dist.alias("edit_distance"))
    )


@query(
    "events_retention_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY 1
    )
    SELECT f.cohort_week,
           CAST(date_diff('week', f.cohort_week,
                          CAST(date_trunc('week', e.ts) AS DATE)) AS BIGINT)
             AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week,
    counted distinct in each subsequent week. Two aggregations; the
    firsts side is one row per user so the re-join shuffles on user_id
    and the final distinct-count groups on (cohort, offset) — no step
    holds more than O(users) state."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    return (
        e.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.floor(
                    F.datediff(F.to_date(F.date_trunc("week", F.col("ts"))), F.col("cohort_week"))
                    / 7
                )
            ).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "events_time_bucket_15min",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_time_bucket_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 15-minute buckets via Spark's native ``window()``
    grouping expression (the same operator Structured Streaming uses, so
    this plan is streaming-portable verbatim). Epoch-aligned in UTC,
    matching DuckDB's time_bucket origin for sub-hour widths."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events", "total_value")
    )


@query(
    "fn_hash_digests",
    oracle="""
    SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256,
           md5(c_name || '|' || c_mktsegment) AS composite_md5
    FROM customer
    """,
)
def q_fn_hash_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests (md5 / sha256) as row-level codegen
    expressions — content-addressing and record-fingerprint joins at
    100 TB ride on these instead of comparing raw payloads."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.md5(F.concat_ws("|", "c_name", "c_mktsegment")).alias("composite_md5"),
    )


@query(
    "text_bigrams_top",
    oracle="""
    WITH toks AS (
      SELECT lang, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE len(string_split_regex(lower(trim(text)), '\\s+')) >= 2
    ), pairs AS (
      SELECT lang, list_extract(t, i) || ' ' || list_extract(t, i + 1) AS bigram
      FROM toks, UNNEST(range(1, len(t))) AS u(i)
    ), counted AS (
      SELECT lang, bigram, COUNT(*) AS n FROM pairs GROUP BY 1, 2
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram ASC) AS rn
      FROM counted
    )
    SELECT lang, bigram, n FROM ranked WHERE rn <= 3
    """,
)
def q_text_bigrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model n-gram counts: top-3 bigrams per language.
    Bigrams are built array-side (sequence + element_at inside codegen,
    zero Python), exploded, then hash-aggregated with map-side combine;
    the final top-k window sees one row per (lang, bigram)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    bigrams = F.expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    )
    counted = (
        docs.select("lang", toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return counted.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3).drop("rn")


@query(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
             AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price: two exact decimal sums in one
    partial-aggregated pass, divided after the shuffle — never an
    avg-of-avgs."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(
            F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,4)"))
            .cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"),
            4,
        ).alias("wavg_price")
    )


@query(
    "agg_skewness_kurtosis",
    oracle="""
    WITH sums AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity
                           AS DECIMAL(28,6))) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / POW(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness_pop,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / POW(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 6) AS excess_kurtosis_pop,
           ROUND(SQRT(s2 / n - (s1 / n) * (s1 / n)) / (s1 / n), 6) AS coef_variation
    FROM sums
    """,
)
def q_agg_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher central moments (population skewness, excess kurtosis,
    coefficient of variation) from exact decimal power sums S1..S4 — one
    map-side-combined pass, with the floating-point moment algebra done
    identically after aggregation so both engines produce bit-equal
    doubles. The mergeable-power-sum layout is how moments survive
    rollup ladders at 100 TB (sums add; moments don't)."""
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    sums = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q.cast("decimal(28,6)")).cast("double").alias("s1"),
        F.sum((q * q).cast("decimal(28,6)")).cast("double").alias("s2"),
        F.sum((q * q * q).cast("decimal(28,6)")).cast("double").alias("s3"),
        F.sum((q * q * q * q).cast("decimal(28,6)")).cast("double").alias("s4"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n")
    m3 = F.col("s3") / F.col("n")
    m4 = F.col("s4") / F.col("n")
    var = m2 - m1 * m1
    # try_divide: a single-sample group has var = 0 — the moments are
    # then undefined (NULL), matching DuckDB, instead of an ANSI
    # DIVIDE_BY_ZERO abort on degenerate (1-row) partitions
    return sums.select(
        "l_returnflag",
        "n",
        F.round(
            F.try_divide(m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1, F.pow(var, 1.5)), 6
        ).alias("skewness_pop"),
        F.round(
            F.try_divide(
                m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1,
                F.pow(var, 2),
            )
            - 3,
            6,
        ).alias("excess_kurtosis_pop"),
        F.round(F.try_divide(F.sqrt(var), m1), 6).alias("coef_variation"),
    )


@query(
    "window_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
    ), grouped AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
               AS island
      FROM days
    ), streaks AS (
      SELECT user_id, island, COUNT(*) AS streak_len FROM grouped GROUP BY 1, 2
    )
    SELECT user_id, MAX(streak_len) AS longest_streak,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id
    """,
)
def q_window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-daily-activity streak per
    user. Distinct days → row_number island labeling (day minus rank is
    constant within a run) → two cheap re-aggregations. Everything
    partitions on user_id; no global sort anywhere."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = days.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = grouped.groupBy("user_id", "island").agg(F.count("*").alias("streak_len"))
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.sum("streak_len").alias("n_active_days"),
    )


@query(
    "fn_interval_ship_latency",
    oracle="""
    SELECT CAST(FLOOR(date_diff('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)) / 10.0) AS BIGINT)
             AS latency_decade,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def q_fn_interval_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + date difference: order→ship latency bucketed
    into 10-day decades, restricted to shipments within orderdate + 90
    days. The interval predicate stays a codegen expression on the join
    output."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    latency = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") <= F.expr("o_orderdate + INTERVAL 90 DAY"))
        .groupBy(F.floor(latency / 10.0).cast("bigint").alias("latency_decade"))
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
    )


@query(
    "window_running_distinct",
    oracle="""
    SELECT event_id, user_id,
           COUNT(DISTINCT event_type)
             OVER (PARTITION BY user_id ORDER BY ts) AS distinct_types_so_far
    FROM events
    """,
)
def q_window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count per user (how many event types has this
    user touched so far). Spark can't put DISTINCT inside a window
    aggregate, so the engine keeps a running set (collect_set over the
    growing frame) and takes its size — state is bounded by the
    event-type cardinality, not the row count. ts is unique per user in
    this data, so ROWS and RANGE framing agree."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("distinct_types_so_far"),
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_view_then_click,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_full_funnel
    """,
)
def q_events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase, strict
    temporal order): stage N counts only users whose earliest stage-N
    event happens AFTER their earliest qualifying stage-(N−1) event —
    the product-analytics query every event warehouse ships.

    Shape: one hash aggregate per stage plus a user_id equi-join back to
    events — every shuffle is on the same key, so the exchanges reuse
    one partitioning; no window over the full event stream, no per-user
    Python. At 100 TB each stage's scan prunes on the event_type
    predicate before shuffling (only that stage's events move)."""
    ev = load_table(spark, sf_dir, "events")

    def stage(prev: DataFrame | None, etype: str, tcol: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            pcol = prev.columns[1]
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(pcol))
        return e.groupBy("user_id").agg(F.min("ts").alias(tcol))

    s1 = stage(None, "view", "t1")
    s2 = stage(s1, "click", "t2")
    s3 = stage(s2, "purchase", "t3")
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in ((s1, "n_view"), (s2, "n_view_then_click"), (s3, "n_full_funnel"))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


@query(
    "agg_market_basket",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), sup AS (
      SELECT l_partkey, COUNT(*) AS s FROM op GROUP BY 1
    ), n AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS s_ab
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, s_ab,
           sa.s AS s_a, sb.s AS s_b,
           floor(s_ab * 10000.0 / sa.s + 0.5) / 10000.0 AS confidence,
           floor(s_ab * 10000.0 * n.n_orders / (sa.s * sb.s) + 0.5) / 10000.0
             AS lift
    FROM pairs
    JOIN sup sa ON part_a = sa.l_partkey
    JOIN sup sb ON part_b = sb.l_partkey
    CROSS JOIN n
    ORDER BY s_ab DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (the A-priori support/confidence/
    lift triple) over order contents: top-20 part pairs by co-occurrence
    support, with confidence P(b|a) and lift P(ab)/(P(a)P(b)).

    The pair join is keyed by ORDER — candidate pairs are generated
    only within a basket, so the blow-up is Σ C(basket_size, 2), linear
    in orders for bounded baskets (the universal case), never the
    all-parts cross product. Ratios are floor-quantized to 4 decimals
    (the repo's cross-engine rounding rule) from exact integer counts;
    the top-20 cut is totally ordered (support desc, then the pair) so
    the boundary is deterministic on both engines. At 100 TB: distinct
    → pair-gen → two broadcast joins against the part-support relation
    (O(|parts|)) and a TakeOrdered top-k — no global sort."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sup = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    # order count as a broadcast 1-row relation riding the same plan —
    # no driver-side count action, no second scan submission
    n_rel = op.agg(F.countDistinct("l_orderkey").alias("n_orders"))

    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("s_ab"))
    )
    sa = sup.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("s_a"))
    sb = sup.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("s_b"))
    # Quantization mirrors the oracle's EXACT operation order —
    # integer×10000 FIRST (exact in doubles up to 2^53), ONE division,
    # then floor(+0.5). Scaling after the division would associate the
    # float ops differently and could flip a rounding near a .5
    # boundary between engines.
    confidence = (
        F.floor(F.col("s_ab") * 10000.0 / F.col("s_a") + 0.5) / 10000.0
    )
    lift = (
        F.floor(
            F.col("s_ab") * 10000.0 * F.col("n_orders")
            / (F.col("s_a") * F.col("s_b"))
            + 0.5
        )
        / 10000.0
    )
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n_rel))
        .select(
            "part_a",
            "part_b",
            "s_ab",
            "s_a",
            "s_b",
            confidence.alias("confidence"),
            lift.alias("lift"),
        )
        .orderBy(F.desc("s_ab"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "agg_pareto_frontier",
    oracle="""
    WITH pt AS (
      SELECT p_partkey, CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
             p_size
      FROM part
    )
    SELECT p.p_partkey, p.price_c, p.p_size
    FROM pt p
    WHERE NOT EXISTS (
      SELECT 1 FROM pt q
      WHERE q.price_c <= p.price_c AND q.p_size >= p.p_size
        AND (q.price_c < p.price_c OR q.p_size > p.p_size)
    )
    """,
)
def q_agg_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) operator: the parts no other part
    dominates (cheaper-or-equal AND bigger-or-equal, strict in one) —
    minimize price, maximize size, the multi-criteria shortlist every
    procurement/ranking pipeline computes. Prices are quantized to
    exact integer cents so the dominance comparisons are pure int64.

    The definitional formulation is the quadratic NOT EXISTS the
    oracle runs; the engine uses the sort-based rewrite — order by
    price, then a part is dominated iff (a) some STRICTLY cheaper part
    has size ≥ its own (running MAX(size) over the price-ordered RANGE
    frame ending one cent before) or (b) an equal-priced part has
    STRICTLY larger size (per-price-group MAX) — applied in the
    standard TWO-PHASE skyline topology: a partition-LOCAL frontier
    pass first (no shuffle — the window partitions on the physical
    partition id), then the same logic globally over the tiny survivor
    set. Correct for ANY partitioning by dominance transitivity: if q
    dominates p and q is itself locally eliminated, some transitive
    dominator of p survives to the global pass. The unpartitioned
    global window's single task sees only O(per-partition frontiers),
    never the input — the shape that holds at 100 TB. Ties (exact
    duplicates) are mutually non-dominating and both survive, matching
    the oracle."""

    def frontier(df: DataFrame, part_cols: list) -> DataFrame:
        cheaper = (
            Window.partitionBy(*part_cols)
            .orderBy("price_c")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        equal_price = Window.partitionBy(*part_cols, "price_c")
        flagged = df.select(
            "p_partkey",
            "price_c",
            "p_size",
            *part_cols,
            F.max("p_size").over(cheaper).alias("mx_cheaper"),
            F.max("p_size").over(equal_price).alias("mx_equal"),
        )
        return flagged.filter(
            (F.col("mx_cheaper").isNull() | (F.col("mx_cheaper") < F.col("p_size")))
            & (F.col("mx_equal") <= F.col("p_size"))
        ).select("p_partkey", "price_c", "p_size")

    pt = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("bigint").alias("price_c"),
        "p_size",
    )
    local = frontier(pt.withColumn("pid", F.spark_partition_id()), [F.col("pid")])
    return frontier(local, [])


@query(
    "events_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT user_id,
             MAX(ts) AS last_ts,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS monetary_c
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ), scored AS (
      SELECT user_id,
             NTILE(4) OVER (ORDER BY last_ts DESC, user_id) AS r,
             NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f,
             NTILE(4) OVER (ORDER BY monetary_c DESC, user_id) AS m
      FROM rfm
    )
    SELECT r * 100 + f * 10 + m AS rfm_segment,
           COUNT(*) AS n_users,
           CAST(MIN(user_id) AS BIGINT) AS sample_user
    FROM scored
    GROUP BY 1
    """,
)
def q_events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic marketing cube: quartile-score each purchaser on the three
    axes (1 = best), concatenate into a segment code, count the
    segments. Determinism: each NTILE orders by its metric THEN
    user_id, so quartile boundaries cannot depend on engine sort
    stability; monetary sums are exact integer cents.

    Plan (round-4 rewrite of the round-3 `weak` shape): one grouped
    aggregate to per-user RFM (purchase-filtered scan), then each NTILE
    is computed WITHOUT a single-partition global sort — the user-grain
    relation is still billions of rows at 100 TB. Each axis encodes its
    DESC order as a negated ascending bigint, gets a distributed global
    row_number via the bin-offset prefix sum (``distrank.
    add_global_row_number`` — range bins, per-bin parallel windows,
    O(bins) broadcast offsets), and maps rank → quartile with the exact
    SQL NTILE formula as a pure projection (``distrank.exact_ntile``).
    Ties keep the user_id tiebreak, so the assignment is bit-identical
    to the oracle's NTILE. One tiny stats collect (min/max/count —
    control-plane scalars); rows shuffle once per axis, keyed by bin.
    The localCheckpoint pin trades fault tolerance for speed
    (executor-local blocks, no lineage replay) — right for bench runs;
    at production scale use reliable checkpoint()/replicated persist
    instead (see operators/distrank.py module docstring + SCALING.md)."""
    from .distrank import add_global_row_number, exact_ntile

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    rfm = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("monetary_c"),
        )
        .select(
            "user_id",
            (-F.unix_micros("last_ts")).alias("s_r"),
            (-F.col("frequency")).alias("s_f"),
            (-F.col("monetary_c")).alias("s_m"),
        )
        .transform(pin)
    )
    st = rfm.agg(
        F.count(F.lit(1)).alias("n"),
        *[f(c) for c in ("s_r", "s_f", "s_m") for f in (F.min, F.max)],
    ).collect()[0]
    n = st["n"]
    ranked = rfm
    for axis in ("r", "f", "m"):
        s = f"s_{axis}"
        ranked = add_global_row_number(
            ranked, s, "user_id", st[f"min({s})"], st[f"max({s})"], f"rn_{axis}",
            histogram_from=rfm,
        )
    scored = ranked.select(
        "user_id",
        *[exact_ntile(f"rn_{axis}", n, 4).alias(axis) for axis in ("r", "f", "m")],
    )
    return (
        scored.groupBy(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("rfm_segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("user_id").cast("bigint").alias("sample_user"),
        )
    )


@query(
    "agg_benford_digit_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS lead_digit
      FROM orders WHERE o_totalprice >= 1
    )
    SELECT lead_digit,
           COUNT(*) AS n,
           floor(COUNT(*) * 10000.0 / SUM(COUNT(*)) OVER () + 0.5) / 10000.0
             AS share,
           floor(log10(1.0 + 1.0 / lead_digit) * 10000 + 0.5) / 10000.0
             AS benford_expected
    FROM digits
    GROUP BY lead_digit
    """,
)
def q_agg_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit — the forensic-accounting screen for
    fabricated numbers: the leading digit of naturally-occurring
    amounts follows log10(1 + 1/d), and a ledger that deviates hard is
    flagged for review. Emits per digit the observed count, observed
    share, and the Benford expectation (both floor-quantized to 4
    decimals with integer-first operation order, the repo's
    cross-engine rounding rule; digit extraction goes through
    floor-then-integer-cast — an explicit floor on BOTH sides, because
    DuckDB's double→int CAST rounds while Spark's truncates, the exact
    divergence class from the round-3 SF-robustness taxonomy).

    Plan: stateless digit projection riding the scan → one 9-key hash
    aggregate → a single-row total window over 9 rows. Scan-bound at
    any scale."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1)
        .cast("bigint")
        .alias("lead_digit")
    )
    counted = digits.groupBy("lead_digit").agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy()
    share = F.floor(F.col("n") * 10000.0 / F.sum("n").over(total) + 0.5) / 10000.0
    expected = (
        F.floor(F.log10(1.0 + 1.0 / F.col("lead_digit")) * 10000 + 0.5) / 10000.0
    )
    return counted.select(
        "lead_digit",
        "n",
        share.alias("share"),
        expected.alias("benford_expected"),
    )


@query(
    "window_max_drawdown",
    oracle="""
    WITH series AS (
      SELECT user_id, ts, event_id,
             SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS balance_c
      FROM events
    ), dd AS (
      SELECT user_id, balance_c,
             MAX(balance_c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS peak_c
      FROM series
    )
    SELECT user_id,
           CAST(MAX(peak_c) AS BIGINT) AS peak_balance_c,
           CAST(MAX(peak_c - balance_c) AS BIGINT) AS max_drawdown_c
    FROM dd
    GROUP BY user_id
    """,
)
def q_window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user — the risk metric over a cumulative
    series (largest peak-to-trough fall of the running balance built
    from event values). Two stacked running windows over ONE per-user
    sort: cumulative balance, then running peak; drawdown = peak −
    balance, reduced by max. Exact integer cents end-to-end, ties
    ordered by (ts, event_id) — the (monotone-state ∘ running-window)
    composition pattern, same family as gaps-islands. One shuffle; at
    100 TB both windows share the single per-user sort and stream in
    one pass per partition."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    series = ev.select(
        "user_id",
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .over(w)
        .alias("balance_c"),
        F.col("ts"),
        F.col("event_id"),
    )
    dd = series.select(
        "user_id",
        "balance_c",
        F.max("balance_c").over(w).alias("peak_c"),
    )
    return dd.groupBy("user_id").agg(
        F.max("peak_c").cast("bigint").alias("peak_balance_c"),
        F.max(F.col("peak_c") - F.col("balance_c")).cast("bigint").alias("max_drawdown_c"),
    )


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS x
        FROM events GROUP BY 1, 2
    ), curves AS (
        SELECT event_type, day,
               SUM(x) OVER (PARTITION BY event_type ORDER BY day) AS cum,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
               SUM(x) OVER (PARTITION BY event_type) AS total,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ), scored AS (
        SELECT event_type, day, n,
               ABS(n * cum - t * total) AS score,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ABS(n * cum - t * total) DESC, day) AS rk
        FROM curves
    )
    SELECT event_type, n AS n_days, day AS changepoint_day,
           CAST(score AS BIGINT) AS cusum_peak_scaled
    FROM scored WHERE rk = 1
    ORDER BY event_type
    """,
)
def q_ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event-type daily series: the day
    where the cumulative deviation from the series mean peaks.

    Classic CUSUM uses S_t = sum_{i<=t}(x_i - mean); to keep every
    engine-crossing value an exact integer the score is scaled by n:
    |n*S_t| = |n*cum_t - t*total| (daily values first quantized to
    micro-units — the floor(x*1e6+0.5) rule both engines compute
    identically). argmax is a per-key rank with a date tie-break.

    Scale shape: one partial-agg groupBy collapses the fact table to
    O(keys x days) rows; every window after that runs on the collapsed
    series (thousands of rows per key), so fact-table growth only
    changes the first aggregate. int64 headroom: day-sums ~1e12 micro,
    x n_days x n_days ~ 1e16 << 2^63; a 100 TB deployment widens to
    DECIMAL(38,0) at the curves step.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")).alias(
                "x"
            )
        )
    )
    wk = Window.partitionBy("event_type")
    wo = wk.orderBy("day")
    curves = daily.select(
        "event_type",
        "day",
        F.sum("x").over(wo).alias("cum"),
        F.row_number().over(wo).alias("t"),
        F.sum("x").over(wk).alias("total"),
        F.count("*").over(wk).alias("n"),
    )
    scored = curves.select(
        "event_type",
        "day",
        "n",
        F.abs(F.col("n") * F.col("cum") - F.col("t") * F.col("total")).alias("score"),
    ).withColumn(
        "rk",
        F.row_number().over(wk.orderBy(F.desc("score"), F.asc("day"))),
    )
    return (
        scored.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("day").alias("changepoint_day"),
            F.col("score").cast("bigint").alias("cusum_peak_scaled"),
        )
        .orderBy("event_type")
    )


@query(
    "ab_test_proportion_z",
    oracle="""
    WITH conv AS (
        SELECT user_id % 2 AS variant,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                  THEN CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                                  ELSE 0 END) > 590000000
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT variant, COUNT(*) AS n, SUM(converted) AS x
        FROM conv GROUP BY variant
    ), wide AS (
        SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
               MAX(CASE WHEN variant = 0 THEN x END) AS x_a,
               MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
               MAX(CASE WHEN variant = 1 THEN x END) AS x_b
        FROM arms
    )
    SELECT n_a, CAST(x_a AS BIGINT) AS x_a, n_b, CAST(x_b AS BIGINT) AS x_b,
           CAST(CASE WHEN CAST(n_a AS HUGEINT) * n_b * (x_a + x_b)
                          * (n_a + n_b - x_a - x_b) = 0
                THEN -1
                ELSE (CAST(x_a * n_b - x_b * n_a AS HUGEINT)
                      * CAST(x_a * n_b - x_b * n_a AS HUGEINT)
                      * CAST(n_a + n_b AS HUGEINT) * 10000)
                     // (CAST(n_a AS HUGEINT) * n_b * (x_a + x_b)
                         * (n_a + n_b - x_a - x_b))
                END AS BIGINT) AS z2_permyriad
    FROM wide
    """,
)
def q_ab_test_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between experiment arms (variant = user_id
    parity; conversion = per-user purchase volume above a fixed
    micro-unit threshold).

    The pooled z statistic squares to a ratio of INTEGERS:
    z^2 = (x_a*n_b - x_b*n_a)^2 * (n_a+n_b)
          / (n_a*n_b*(x_a+x_b)*(n_a+n_b-x_a-x_b)),
    so significance testing needs no float sqrt anywhere — the engines
    exchange z^2 in exact permyriad units (DECIMAL(38,0) products,
    integer floor-div; -1 sentinel for degenerate arms). z^2 > 3.8415
    is the two-sided 5% line. Scale shape: one per-user aggregate, one
    per-arm aggregate, a 2-row pivot — the fact scan dominates and
    everything after is O(1).
    """
    conv = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint"),
                    ).otherwise(F.lit(0).cast("bigint"))
                )
                > 590000000,
                1,
            )
            .otherwise(0)
            .alias("converted"),
            (F.first(F.col("user_id") % 2)).alias("variant"),
        )
    )
    arms = conv.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").alias("x")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("x_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("x_b"),
    )
    return wide.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.expr(
            """
            CAST(CASE WHEN CAST(n_a AS DECIMAL(38,0)) * n_b * (x_a + x_b)
                           * (n_a + n_b - x_a - x_b) = 0
                 THEN -1
                 ELSE (CAST(x_a * n_b - x_b * n_a AS DECIMAL(38,0))
                       * CAST(x_a * n_b - x_b * n_a AS DECIMAL(38,0))
                       * CAST(n_a + n_b AS DECIMAL(38,0)) * 10000)
                      div (CAST(n_a AS DECIMAL(38,0)) * n_b * (x_a + x_b)
                           * (n_a + n_b - x_a - x_b))
                 END AS BIGINT)
            """
        ).alias("z2_permyriad"),
    )


@query(
    "ts_theil_sen_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '2020-01-01', CAST(date_trunc('day', ts) AS DATE))
                   AS x,
               SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS y
        FROM events GROUP BY 1, 2
    ), slopes AS (
        SELECT a.event_type,
               b.y - a.y AS num, b.x - a.x AS den,
               CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS val,
               a.x AS xi, b.x AS xj
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.x < b.x
    ), ranked AS (
        SELECT event_type, num, den, val,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY val, xi, xj) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM slopes
    )
    SELECT event_type, CAST(cnt AS BIGINT) AS n_pairs,
           CAST(num AS BIGINT) AS slope_num_micro,
           CAST(den AS BIGINT) AS slope_den_days,
           val AS slope_micro_per_day
    FROM ranked WHERE rn = (cnt + 1) // 2
    ORDER BY event_type
    """,
)
def q_ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event-type daily series: the median of
    all pairwise slopes (breakdown point 29% — one bad day cannot move
    it, unlike OLS).

    Determinism contract: pairwise slopes are exact integer fractions
    (micro-unit numerators, day-count denominators); the sort key is
    the IEEE double num/den — the same division on both engines gives
    the same total order — with (xi, xj) breaking exact-value ties, and
    the lower median (rank (cnt+1)//2) avoids averaging two middles.
    The selected slope is emitted as its exact fraction AND the double.

    Scale shape: the O(days²) pair join runs on the collapsed
    O(keys × days) daily aggregate, never the fact table — same
    collapse-first stance as the CUSUM operator; a decade of days is
    ~6.7M pairs per key, an executor-local cell.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"), F.lit("2020-01-01").cast("date")
            ).alias("x"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")).alias("y")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.y") - F.col("a.y")).alias("num"),
        (F.col("b.x") - F.col("a.x")).alias("den"),
        ((F.col("b.y") - F.col("a.y")).cast("double") / (F.col("b.x") - F.col("a.x"))).alias(
            "val"
        ),
        F.col("a.x").alias("xi"),
        F.col("b.x").alias("xj"),
    )
    w = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "num",
        "den",
        "val",
        F.row_number().over(w.orderBy("val", "xi", "xj")).alias("rn"),
        F.count("*").over(w).alias("cnt"),
    )
    return (
        ranked.filter(F.expr("rn = (cnt + 1) div 2"))
        .select(
            "event_type",
            F.col("cnt").cast("bigint").alias("n_pairs"),
            F.col("num").cast("bigint").alias("slope_num_micro"),
            F.col("den").cast("bigint").alias("slope_den_days"),
            F.col("val").alias("slope_micro_per_day"),
        )
        .orderBy("event_type")
    )


@query(
    "sql_scripting_adaptive_threshold",
    oracle="""
    WITH total AS (
        SELECT COUNT(*) // 10 AS target FROM orders
    ), cand AS (
        SELECT 100000.0 * g AS thr FROM generate_series(0, 100) t(g)
    ), counts AS (
        SELECT thr,
               (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr) AS cnt
        FROM cand
    ), chosen AS (
        SELECT thr, cnt FROM counts, total
        WHERE cnt <= target
        ORDER BY thr LIMIT 1
    )
    SELECT CAST(thr AS DOUBLE) AS threshold,
           CAST(cnt AS BIGINT) AS n_above,
           (SELECT CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
            FROM orders, chosen WHERE o_totalprice > chosen.thr) AS revenue_cents
    FROM chosen
    """,
)
def q_sql_scripting_adaptive_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (BEGIN/DECLARE/WHILE): an adaptive
    threshold search written as a PROCEDURE — raise the price cutoff in
    fixed steps until at most 10% of orders qualify, then report the
    qualifying tier.

    The procedural surface matters for ETL parity: stored-procedure
    migrations land as exactly this shape (loop + scalar SET + final
    SELECT), and Spark 4 executes it natively in one session with the
    loop state driver-side and every iteration a full declarative
    query. The oracle states the loop's FIXED POINT closed-form (the
    smallest step multiple whose selectivity meets the target), so the
    driver adjudicates that the iteration converged to the right
    answer, not just that it ran.
    """
    from ..sources.io import table_path

    spark.conf.set("spark.sql.scripting.enabled", "true")
    path = table_path(sf_dir, "orders")
    return spark.sql(f"""
    BEGIN
      DECLARE target BIGINT DEFAULT 0;
      DECLARE thr DOUBLE DEFAULT 0;
      DECLARE cnt BIGINT DEFAULT 0;
      SET target = (SELECT COUNT(*) DIV 10 FROM parquet.`{path}`);
      SET cnt = (SELECT COUNT(*) FROM parquet.`{path}` WHERE o_totalprice > thr);
      WHILE cnt > target DO
        SET thr = thr + 100000;
        SET cnt = (SELECT COUNT(*) FROM parquet.`{path}` WHERE o_totalprice > thr);
      END WHILE;
      SELECT thr AS threshold,
             cnt AS n_above,
             (SELECT CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
              FROM parquet.`{path}` WHERE o_totalprice > thr) AS revenue_cents;
    END
    """)


@query(
    "ts_weekday_seasonality_index",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS rev
        FROM events GROUP BY 1
    ), wd AS (
        SELECT CAST(dayofweek(day) AS INT) AS weekday,
               COUNT(*) AS n_days, SUM(rev) AS rev
        FROM daily GROUP BY 1
    ), tot AS (
        SELECT SUM(n_days) AS all_days, SUM(rev) AS all_rev FROM wd
    )
    SELECT weekday, CAST(n_days AS BIGINT) AS n_days,
           CAST(rev AS BIGINT) AS rev_micro,
           CAST((CAST(rev AS HUGEINT) * all_days * 1000000)
                // (CAST(all_rev AS HUGEINT) * n_days) AS BIGINT)
               AS seasonal_index_micro
    FROM wd, tot
    ORDER BY weekday
    """,
)
def q_ts_weekday_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality index: each weekday's average daily volume
    relative to the overall daily average (1e6 micro = exactly
    average) — the multiplicative seasonal profile demand forecasting
    starts from.

    index = (rev_wd / n_days_wd) / (rev_all / n_days_all), computed by
    cross-multiplication as ONE widened integer ratio so no division
    crosses the engines. Two collapse aggregates (fact → day →
    weekday) then a 7-row broadcast of the totals. DuckDB's
    ``dayofweek`` (0=Sunday) matches Spark's ``dayofweek - 1``.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")).alias(
                "rev"
            )
        )
    )
    wd = daily.groupBy(
        (F.dayofweek("day") - 1).cast("int").alias("weekday")
    ).agg(F.count("*").cast("bigint").alias("n_days"), F.sum("rev").alias("rev"))
    tot = wd.agg(
        F.sum("n_days").alias("all_days"), F.sum("rev").alias("all_rev")
    )
    return (
        wd.crossJoin(F.broadcast(tot))
        .select(
            "weekday",
            "n_days",
            F.col("rev").cast("bigint").alias("rev_micro"),
            F.expr(
                "CAST((CAST(rev AS DECIMAL(38,0)) * all_days * 1000000)"
                " div (CAST(all_rev AS DECIMAL(38,0)) * n_days) AS BIGINT)"
            ).alias("seasonal_index_micro"),
        )
        .orderBy("weekday")
    )


@query(
    "agg_chi_square_independence",
    oracle="""
    WITH obs AS (
        SELECT user_id % 5 AS cohort, event_type, COUNT(*) AS o
        FROM events GROUP BY 1, 2
    ), margins AS (
        SELECT cohort, SUM(o) AS row_n FROM obs GROUP BY cohort
    ), cols AS (
        SELECT event_type, SUM(o) AS col_n FROM obs GROUP BY event_type
    ), tot AS (
        SELECT SUM(o) AS n FROM obs
    ), grid AS (
        -- full cohort x type grid: a zero cell still contributes
        -- (0-E)^2/E = E to the statistic
        SELECT m.cohort, c.event_type, m.row_n, c.col_n,
               COALESCE(obs.o, 0) AS o
        FROM margins m CROSS JOIN cols c
        LEFT JOIN obs ON obs.cohort = m.cohort AND obs.event_type = c.event_type
    ), terms AS (
        SELECT cohort, event_type,
               -- chi2 cell term in micro-units:
               -- (O-E)^2/E with E=row*col/n == (O*n - row*col)^2/(row*col*n)
               CAST((CAST(o AS HUGEINT) * n - CAST(row_n AS HUGEINT) * col_n)
                    * (CAST(o AS HUGEINT) * n - CAST(row_n AS HUGEINT) * col_n)
                    * 1000000
                    // (CAST(row_n AS HUGEINT) * col_n * n) AS BIGINT) AS term_scaled
        FROM grid CROSS JOIN tot
    )
    SELECT COUNT(*) AS n_cells,
           CAST(SUM(term_scaled) AS BIGINT) AS chi2_micro
    FROM terms
    """,
)
def q_agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence test between user cohort and event type
    over the contingency table, with every engine-crossing value an
    exact integer.

    Algebra: the cell term (O−E)²/E with E = row·col/n equals
    (O·n − row·col)² / (row·col·n) exactly (the /n is already inside),
    so the emitted statistic is χ² itself in micro-units; empty
    contingency cells are materialized from the full margin grid
    because a zero cell still contributes E — each cell term
    integer-divides in HUGEINT/DECIMAL
    then the terms integer-sum, so no float enters the comparison
    (same deferred-division discipline as the z-test and HHI).
    Headroom note: (O·n − row·col)² needs ~4 digits beyond 2·log₁₀(n),
    so DECIMAL(38,0)/HUGEINT carries corpora to ~10⁸ events per
    contingency table; beyond that, compute the diff once, divide by
    row·col first, or carry the cell terms as DOUBLE with this exact
    expression order (the diff stays exactly representable to 2⁵³).
    Scale shape: one fact-table aggregate collapses to O(cohorts×types)
    cells; margins and the total are aggregates OF the cell relation
    (the fact table is scanned once); everything downstream is tiny
    broadcast joins.
    """
    obs = (
        load_table(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 5).alias("cohort"), "event_type")
        .agg(F.count("*").alias("o"))
    )
    margins = obs.groupBy("cohort").agg(F.sum("o").alias("row_n"))
    cols = obs.groupBy("event_type").agg(F.sum("o").alias("col_n"))
    tot = obs.agg(F.sum("o").alias("n"))
    grid = (
        margins.crossJoin(cols)
        .join(obs, ["cohort", "event_type"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    terms = (
        grid.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                """
                CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(row_n AS DECIMAL(38,0)) * col_n)
                     * (CAST(o AS DECIMAL(38,0)) * n - CAST(row_n AS DECIMAL(38,0)) * col_n)
                     * 1000000
                     div (CAST(row_n AS DECIMAL(38,0)) * col_n * n) AS BIGINT)
                """
            ).alias("term_scaled")
        )
    )
    return terms.agg(
        F.count("*").alias("n_cells"),
        F.sum("term_scaled").cast("bigint").alias("chi2_micro"),
    )


@query(
    "agg_ks_two_sample",
    oracle="""
    WITH s AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
               o_orderkey % 2 AS grp
        FROM orders
    ), hist AS (
        SELECT v,
               COUNT(*) FILTER (WHERE grp = 0) AS c0,
               COUNT(*) FILTER (WHERE grp = 1) AS c1
        FROM s GROUP BY v
    ), tot AS (
        SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM hist
    ), cums AS (
        SELECT v,
               SUM(c0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum0,
               SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1
        FROM hist
    ), scored AS (
        SELECT v, ABS(cum0 * n1 - cum1 * n0) AS d_scaled
        FROM cums, tot
    )
    SELECT (SELECT CAST(n0 AS BIGINT) FROM tot) AS n0,
           (SELECT CAST(n1 AS BIGINT) FROM tot) AS n1,
           (SELECT CAST(MAX(d_scaled) AS BIGINT) FROM scored) AS ks_d_scaled,
           (SELECT CAST(MIN(v) AS BIGINT) FROM scored
             WHERE d_scaled = (SELECT MAX(d_scaled) FROM scored)) AS argmax_cents
    """,
)
def q_agg_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between even- and
    odd-keyed orders' price distributions: D·n₀·n₁ = max over values of
    |cum₀·n₁ − cum₁·n₀| — the distribution-drift test with NO float
    anywhere (cents values, cross-multiplied ECDFs, integer argmax with
    a smallest-value tie-break).

    Scale shape: collapse to the value histogram first (one groupBy),
    then the ECDF running sums distribute by the SAME key-range-bin +
    offset prefix-sum technique as ``sample_systematic_every_k`` — 16
    parallel within-bin windows plus an O(bins) offset relation, never
    a single-partition window over the value domain. The oracle states
    the intent directly with one ordered window.
    """
    from pyspark.sql.window import Window

    s = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
        (F.col("o_orderkey") % 2).alias("grp"),
    )
    hist = s.groupBy("v").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    # persist: the max-scalar action below and the main plan both read
    # the histogram; without it the dominant scan+groupBy runs twice
    hist = hist.persist()
    tot = hist.agg(
        F.sum("c0").cast("bigint").alias("n0"), F.sum("c1").cast("bigint").alias("n1")
    )
    max_v = hist.agg(F.max("v")).collect()[0][0]
    bin_width = (max_v if max_v is not None else 0) // 16 + 1
    binned = hist.withColumn("bin", (F.col("v") / bin_width).cast("bigint"))
    bin_tot = binned.groupBy("bin").agg(
        F.sum("c0").alias("b0"), F.sum("c1").alias("b1")
    )
    w_off = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bin_tot.select(
        "bin",
        F.coalesce(F.sum("b0").over(w_off), F.lit(0)).alias("off0"),
        F.coalesce(F.sum("b1").over(w_off), F.lit(0)).alias("off1"),
    )
    w_bin = Window.partitionBy("bin").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cums = (
        binned.join(F.broadcast(offsets), "bin")
        .select(
            "v",
            (F.sum("c0").over(w_bin) + F.col("off0")).alias("cum0"),
            (F.sum("c1").over(w_bin) + F.col("off1")).alias("cum1"),
        )
    )
    scored = cums.crossJoin(F.broadcast(tot)).select(
        "v",
        F.abs(F.col("cum0") * F.col("n1") - F.col("cum1") * F.col("n0")).alias(
            "d_scaled"
        ),
    )
    best = scored.agg(F.max("d_scaled").alias("ks_d_scaled"))
    arg = (
        scored.join(F.broadcast(best), scored.d_scaled == best.ks_d_scaled)
        .agg(F.min("v").cast("bigint").alias("argmax_cents"))
    )
    return (
        tot.crossJoin(best.select(F.col("ks_d_scaled").cast("bigint").alias("ks_d_scaled")))
        .crossJoin(arg)
        .select("n0", "n1", "ks_d_scaled", "argmax_cents")
    )


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS max_order_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q_sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL via Spark 4's ``EXECUTE IMMEDIATE`` + session
    variables: the statement text is ASSEMBLED at runtime from a metric
    registry (the shape every templated-report/ETL-config system
    produces), stored in a ``DECLARE``d session variable through a
    parameterized ``SET VAR`` (no string-escaping hazards), and executed
    with the date cutoff bound via ``USING`` — the three-layer
    indirection (config → statement → parameter) that migrations from
    stored-procedure warehouses rely on.

    The assembled statement is itself fully declarative, so Catalyst
    sees a plain scan→filter→aggregate: the timestamp predicate pushes
    down to the parquet scan and the aggregate partial-combines —
    dynamic SQL costs nothing at plan time. Money exact cents."""
    from ..sources.io import table_path

    path = table_path(sf_dir, "orders")
    metrics = {
        "n_orders": "COUNT(*)",
        "revenue_cents": "SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))",
        "max_order_cents": "MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))",
    }
    select_list = ", ".join(f"{expr} AS {alias}" for alias, expr in metrics.items())
    stmt = (
        f"SELECT o_orderpriority, {select_list} FROM parquet.`{path}` "
        "WHERE o_orderdate >= ? GROUP BY o_orderpriority"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE stmt_exec_imm STRING")
    spark.sql("SET VAR stmt_exec_imm = :s", args={"s": stmt})
    return spark.sql(
        "EXECUTE IMMEDIATE stmt_exec_imm USING TIMESTAMP '1997-01-01 00:00:00'"
    )


@query(
    "sql_identifier_dynamic_table",
    oracle="""
    SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer
    UNION ALL
    SELECT 'supplier' AS tbl, COUNT(*) AS n_rows,
           CAST(SUM(s_suppkey) AS BIGINT) AS key_sum
    FROM supplier
    """,
)
def q_sql_identifier_dynamic_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic object resolution via the ``IDENTIFIER()`` clause — the
    SQL-injection-safe way to parameterize a TABLE NAME (a config-driven
    audit job iterating a table list cannot bind names as values, and
    string-splicing them is the injection anti-pattern EXECUTE IMMEDIATE
    was shown avoiding for values). Each (table, key column) pair from
    the config registry runs the same audit statement with both names
    bound as parameters through IDENTIFIER, unioned into one report.

    Catalyst resolves IDENTIFIER at analysis time, so the executed plans
    are the ordinary per-table scan→aggregate — the indirection has zero
    runtime cost."""
    for tbl in ("customer", "supplier"):
        load_table(spark, sf_dir, tbl).createOrReplaceTempView(f"idq_{tbl}")
    out = None
    for tbl, key in [("customer", "c_custkey"), ("supplier", "s_suppkey")]:
        part = spark.sql(
            "SELECT :tbl AS tbl, COUNT(*) AS n_rows, "
            "CAST(SUM(IDENTIFIER(:key)) AS BIGINT) AS key_sum "
            "FROM IDENTIFIER(:view)",
            args={"tbl": tbl, "key": key, "view": f"idq_{tbl}"},
        )
        out = part if out is None else out.unionByName(part)
    return out


@query(
    "ts_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
             CAST(COUNT(*) AS HUGEINT) AS cnt
      FROM orders GROUP BY 1
    ), s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(cnt) AS HUGEINT) AS tot
      FROM daily
    ), dev AS (
      SELECT day, (SELECT n FROM s) * cnt - (SELECT tot FROM s) AS d FROM daily
    ), den AS (
      SELECT SUM(d * d) AS den FROM dev
    ), pairs AS (
      SELECT l.lag_days, COUNT(*) AS n_pairs, SUM(a.d * b.d) AS num
      FROM (SELECT 1 AS lag_days UNION ALL SELECT 2 UNION ALL SELECT 7) l
      JOIN dev a ON TRUE
      JOIN dev b ON b.day = a.day + l.lag_days
      GROUP BY 1
    )
    SELECT CAST(lag_days AS INT) AS lag_days,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(floor(CAST(num AS DOUBLE) / CAST((SELECT den FROM den) AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS acf_micro
    FROM pairs ORDER BY 1
    """,
)
def q_ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (ACF at k=1,2,7) of the daily order-count
    series, exact-integer end-to-end: with n days, total S and counts x,
    the deviation n*x_t - S is an integer, so numerator
    sum((n*x_t - S)(n*x_{t+k} - S)) and denominator sum((n*x_t - S)^2)
    are exact DECIMAL(38,0)/HUGEINT aggregates; only the final ratio is
    a double, formed from IDENTICAL integers on both engines and
    quantized with the shared floor(x*1e6+0.5) rule.

    Missing calendar days make LAG/LEAD wrong here — the pair relation
    is built by self-joining the day series on day+k, so only days
    where BOTH endpoints exist pair up (n_pairs is part of the result).
    Scale: the raw scan collapses to the O(days) daily relation first;
    the self-join, the broadcast scalar stats and the lag fan-out all
    run on that tiny series — the same collapse-before-expensive-work
    shape as ts_cusum_changepoint. The weekly lag (k=7) exposes the
    seasonality ts_weekday_seasonality_index measures from the other
    direction.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").cast("decimal(38,0)").alias("cnt"))
        # The daily series feeds stats, the denominator and BOTH sides of
        # the lag self-join — without a checkpoint Catalyst re-derives it
        # per branch and the 100 TB fact scans 12 times (measured).
        # Checkpointing the O(days) aggregate pins exactly one scan.
        .transform(pin)
    )
    stats = daily.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("cnt").cast("decimal(38,0)").alias("tot"),
    )
    dev = daily.crossJoin(F.broadcast(stats)).select(
        "day", (F.col("n") * F.col("cnt") - F.col("tot")).alias("d")
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("den"))
    lags = spark.createDataFrame([(1,), (2,), (7,)], "lag_days int")
    a = dev.crossJoin(F.broadcast(lags))
    pairs = a.alias("a").join(
        dev.alias("b"),
        F.col("b.day") == F.col("a.day") + F.col("a.lag_days"),
    )
    num = pairs.groupBy("a.lag_days").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("a.d") * F.col("b.d")).alias("num"),
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("lag_days").cast("int").alias("lag_days"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.floor(
                F.col("num").cast("double") / F.col("den").cast("double") * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("acf_micro"),
        )
        .orderBy("lag_days")
    )


@query(
    "events_wilson_ctr_ranking",
    oracle="""
    WITH counts AS (
      SELECT user_id % 50 AS cohort,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END)
                  AS BIGINT) AS n
      FROM events
      WHERE event_type IN ('click', 'view')
      GROUP BY 1
    ), scored AS (
      SELECT cohort, x, n,
             CAST(floor(
               ((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                 + 3.8416 / (2 * CAST(n AS DOUBLE))
                 - 1.96 * sqrt(((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                                * (1 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                                + 3.8416 / (4 * CAST(n AS DOUBLE)))
                               / CAST(n AS DOUBLE)))
                / (1 + 3.8416 / CAST(n AS DOUBLE)))
               * 1000000 + 0.5) AS BIGINT) AS wilson_lb_micro
      FROM counts WHERE n > 0
    )
    SELECT cohort, x, n, wilson_lb_micro
    FROM scored ORDER BY wilson_lb_micro DESC, cohort LIMIT 10
    """,
)
def q_events_wilson_ctr_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking under uncertainty: top user cohorts by the WILSON score
    lower bound of their click-through rate (z=1.96), not the raw rate —
    the standard fix for small-sample leaders (a 1/1 cohort must not
    outrank a 900/1000 one; the raw-rate ranking does exactly that).

    Cross-engine exactness without integerizing the formula: x and n
    are exact integers, every float op is written in the IDENTICAL
    order on both engines from the single double D = CAST(n AS DOUBLE)
    (z^2 carried as the literal 3.8416), and sqrt is correctly rounded
    by IEEE 754 — so both engines walk the same double chain and the
    floor(x*1e6+0.5) quantization cannot straddle an ulp. Same
    discipline as the cosine oracles, applied to a branchier formula.

    Scale: one fact-grain filtered aggregate to O(cohorts) rows; the
    scoring projection and top-k run on the tiny relation (TakeOrdered,
    no global sort).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    counts = ev.groupBy((F.col("user_id") % 50).alias("cohort")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.count("*").cast("bigint").alias("n"),
    )
    d = F.col("n").cast("double")
    p = F.col("x").cast("double") / d
    lb = (
        p
        + F.lit(3.8416) / (2 * d)
        - F.lit(1.96) * F.sqrt((p * (1 - p) + F.lit(3.8416) / (4 * d)) / d)
    ) / (1 + F.lit(3.8416) / d)
    return (
        counts.filter(F.col("n") > 0)
        .select(
            "cohort",
            "x",
            "n",
            F.floor(lb * 1000000 + F.lit(0.5)).cast("bigint").alias("wilson_lb_micro"),
        )
        .orderBy(F.desc("wilson_lb_micro"), "cohort")
        .limit(10)
    )


@query(
    "sql_named_parameters",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    WHERE o_totalprice > 200000.0 AND o_orderstatus = 'F'
    GROUP BY 1 ORDER BY 1
    """,
)
def q_sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized ``spark.sql`` (Spark 3.4+): named ``:minp`` /
    ``:status`` markers bound via ``args=`` plus a DataFrame injected
    through the ``{orders}`` template slot — the injection-safe way to
    thread runtime values into SQL text, complementing the SQL-side
    pair (EXECUTE IMMEDIATE ... USING in [[sql_execute_immediate]] and
    IDENTIFIER() in [[sql_identifier_dynamic_table]]).

    Parameters are bound in the PARSER as typed literals, never string-
    spliced, so Catalyst still constant-folds and pushes them into the
    parquet scan exactly like hand-written literals (the reference
    concatenates job args straight into its connection options,
    glue_rds_to_redshift.py:33-39 — this is that pattern done safely).
    """
    orders = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM {orders}
        WHERE o_totalprice > :minp AND o_orderstatus = :status
        GROUP BY 1 ORDER BY 1
        """,
        args={"minp": 200000.0, "status": "F"},
        orders=orders,
    )


@query(
    "ab_did_two_period",
    oracle="""
    WITH tagged AS (
      SELECT (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT) % 2
               AS treated,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END
               AS period,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
      FROM events
    ), cells AS (
      SELECT treated, period,
             CAST(SUM(is_purchase) AS BIGINT) AS purchases,
             COUNT(*) AS n_events
      FROM tagged GROUP BY 1, 2
    ), wide AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND period = 0 THEN purchases END) AS t_pre,
        MAX(CASE WHEN treated = 1 AND period = 1 THEN purchases END) AS t_post,
        MAX(CASE WHEN treated = 0 AND period = 0 THEN purchases END) AS c_pre,
        MAX(CASE WHEN treated = 0 AND period = 1 THEN purchases END) AS c_post
      FROM cells
    )
    SELECT t_pre, t_post, c_pre, c_post,
           (t_post - t_pre) - (c_post - c_pre) AS did_estimate
    FROM wide
    """,
)
def q_ab_did_two_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: purchase-count change for the treated
    cohort minus the change for control across a fixed period boundary
    (Jan 16) — the quasi-experimental estimator for rollouts without
    randomized exposure, complementing [[ab_test_proportion_z]]'s
    randomized-test z-score.

    Assignment is the portable md5 lane on user_id (bit-identical
    cross-engine, and consistent with how every split/tokenization
    query assigns units), so cohorts are stable under data growth; all
    four cells and the estimate are exact integers. Scale: one
    fact-grain aggregate to 4 cells, then a 4-row pivot — the estimator
    costs one scan regardless of corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 2
        ).alias("treated"),
        F.when(F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), 0)
        .otherwise(1)
        .alias("period"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
    )
    cells = tagged.groupBy("treated", "period").agg(
        F.sum("is_purchase").cast("bigint").alias("purchases")
    )
    wide = cells.agg(
        F.max(
            F.when((F.col("treated") == 1) & (F.col("period") == 0), F.col("purchases"))
        ).alias("t_pre"),
        F.max(
            F.when((F.col("treated") == 1) & (F.col("period") == 1), F.col("purchases"))
        ).alias("t_post"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("period") == 0), F.col("purchases"))
        ).alias("c_pre"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("period") == 1), F.col("purchases"))
        ).alias("c_post"),
    )
    return wide.select(
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        (
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre"))
        ).alias("did_estimate"),
    )


@query(
    "window_largest_remainder_apportion",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey,
             CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ), tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total FROM rev),
    quota AS (
      SELECT c_nationkey, rev_cents,
             (100000 * rev_cents) // (SELECT total FROM tot) AS base,
             (100000 * rev_cents) % (SELECT total FROM tot) AS rem
      FROM rev
    ), extra AS (
      SELECT CAST(100000 - SUM(base) AS BIGINT) AS n_extra FROM quota
    ), ranked AS (
      SELECT c_nationkey, rev_cents, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, c_nationkey) AS rk
      FROM quota
    )
    SELECT c_nationkey, rev_cents,
           CAST(base + CASE WHEN rk <= (SELECT n_extra FROM extra)
                            THEN 1 ELSE 0 END AS BIGINT) AS alloc,
           rk <= (SELECT n_extra FROM extra) AS got_extra
    FROM ranked ORDER BY c_nationkey
    """,
)
def q_window_largest_remainder_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment (Hamilton's method): split a
    fixed budget of 100,000 units across nations proportional to
    revenue so that the allocations are integers AND sum to the budget
    EXACTLY — naive floor division strands units, naive rounding
    over-allocates; the method floors every quota and hands the
    leftover units to the largest fractional remainders (tie: nation
    key). The standard exact algorithm for quota sharding, budget
    splitting, sampling-quota assignment — anywhere "proportional but
    integral and conservation-exact" is the contract.

    Everything is integer: quota = budget*rev, base = quota div total,
    remainder = quota mod total (DuckDB ``//``/``%`` on BIGINT, Spark
    ``div``/``%`` — the one integer-division pairing both engines
    compute identically, per the repo's exactness rules). The
    conservation property (sum(alloc) == budget) is pinned in pytest;
    the got_extra lane is non-degenerate by construction (0 < leftover
    < n_classes almost surely, and the oracle adjudicates it anyway).

    Scale: one fact-grain join+aggregate to O(nations) rows; ranking
    and correction run on the tiny relation — the global (unpartitioned)
    rank window is safe ONLY because its input is domain-bounded (the
    nation list), never fact-grain; fact-grain global orderings use the
    bin+offset prefix-sum technique instead (text_sequence_pack).
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    tot = rev.agg(F.sum("rev_cents").cast("bigint").alias("total"))
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "c_nationkey",
        "rev_cents",
        F.expr("(100000 * rev_cents) div total").alias("base"),
        ((F.lit(100000) * F.col("rev_cents")) % F.col("total")).alias("rem"),
    )
    extra = quota.agg((F.lit(100000) - F.sum("base")).cast("bigint").alias("n_extra"))
    w = Window.orderBy(F.desc("rem"), F.asc("c_nationkey"))
    ranked = quota.withColumn("rk", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(extra))
        .select(
            "c_nationkey",
            "rev_cents",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("n_extra"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
            (F.col("rk") <= F.col("n_extra")).alias("got_extra"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "ts_linear_interpolate_grid",
    oracle="""
    WITH obs AS (
      SELECT event_type, user_id % 50 AS cohort,
             date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS h,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2, 3
    ), span AS (
      SELECT event_type, cohort, MIN(h) AS lo, MAX(h) AS hi FROM obs GROUP BY 1, 2
    ), grid AS (
      SELECT s.event_type, s.cohort, unnest(range(s.lo, s.hi + 1)) AS h FROM span s
    ), joined AS (
      SELECT g.event_type, g.cohort, g.h, o.cents FROM grid g
      LEFT JOIN obs o USING (event_type, cohort, h)
    ), walls AS (
      SELECT event_type, cohort, h, cents,
             LAST_VALUE(cents IGNORE NULLS) OVER
               (PARTITION BY event_type, cohort ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_prev,
             LAST_VALUE(h_obs IGNORE NULLS) OVER
               (PARTITION BY event_type, cohort ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_prev,
             FIRST_VALUE(cents IGNORE NULLS) OVER
               (PARTITION BY event_type, cohort ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_next,
             FIRST_VALUE(h_obs IGNORE NULLS) OVER
               (PARTITION BY event_type, cohort ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t_next
      FROM (SELECT *, CASE WHEN cents IS NOT NULL THEN h END AS h_obs
            FROM joined)
    ), interp AS (
      SELECT event_type, cohort,
             (v_prev * (t_next - h) * 1000 + v_next * (h - t_prev) * 1000)
               // (t_next - t_prev) AS interp_milli
      FROM walls WHERE cents IS NULL
    )
    SELECT o.event_type, o.cohort,
           COUNT(DISTINCT o.h) AS n_observed,
           (SELECT COUNT(*) FROM interp i
             WHERE i.event_type = o.event_type AND i.cohort = o.cohort) AS n_gaps,
           (SELECT CAST(COALESCE(SUM(interp_milli), 0) AS BIGINT) FROM interp i
             WHERE i.event_type = o.event_type AND i.cohort = o.cohort)
             AS interp_sum_milli
    FROM obs o GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_ts_linear_interpolate_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample irregular series to a dense hourly grid with LINEAR
    interpolation — the numeric upgrade over LOCF gap-fill
    ([[events_gapfill_daily]] carries the last value forward; a gauge
    between two observations is better estimated by the line through
    them). Per (event_type, user-cohort) series: hourly sums where
    observed, and for every interior missing hour the exact rational
    v_prev*(t_next-t) + v_next*(t-t_prev)) / (t_next-t_prev), carried
    in integer milli-cents via the blessed div pairing — hours and
    cents are ints, so interpolation needs no floats at all.

    Neighbor discovery is the two-sided ignore-nulls window pair
    (forward LAST_VALUE + backward FIRST_VALUE — the forward_fill
    machinery run in both directions); series edges have no second
    wall and stay un-interpolated by construction. Output collapses to
    per-series (n_observed, n_gaps, interp_sum_milli), so every
    interpolated value is adjudicated through the exact sum while the
    compare relation stays O(series).

    Scale: one keyed aggregate to the observed grid, one sequence-
    explode per series for the grid (bounded by the time span), two
    windows on the series key — all co-partitioned; no global state.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.groupBy(
            "event_type",
            (F.col("user_id") % 50).alias("cohort"),
            (
                (F.unix_micros("ts") - F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp")))
                / F.lit(3600000000)
            )
            .cast("bigint")
            .alias("h"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .transform(pin)
    )
    span = obs.groupBy("event_type", "cohort").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = span.select(
        "event_type",
        "cohort",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("h"),
    )
    joined = grid.join(obs, ["event_type", "cohort", "h"], "left")
    w_f = (
        Window.partitionBy("event_type", "cohort")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Backward walls via a CUMULATIVE frame over DESC ordering, not a
    # [current, unboundedFollowing] frame (optimization round 9, guide
    # §1.1 first-principles): Spark's UnboundedFollowing frame
    # re-aggregates from the current row to the partition end FOR EVERY
    # ROW — O(rows²) per series, measured 2.0 s of this query's 4.8 s
    # downstream at sf0.1 — while the running-state cumulative frame is
    # O(rows). `h` is unique per series (it is a grouping key of obs),
    # so `first non-null at-or-after h ascending` ≡ `last non-null
    # at-or-before h descending` exactly; same exchange, one extra
    # in-partition sort.
    w_b = (
        Window.partitionBy("event_type", "cohort")
        .orderBy(F.col("h").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    h_obs = F.when(F.col("cents").isNotNull(), F.col("h"))
    walls = joined.select(
        "event_type",
        "cohort",
        "h",
        "cents",
        F.last("cents", ignorenulls=True).over(w_f).alias("v_prev"),
        F.last(h_obs, ignorenulls=True).over(w_f).alias("t_prev"),
        F.last("cents", ignorenulls=True).over(w_b).alias("v_next"),
        F.last(h_obs, ignorenulls=True).over(w_b).alias("t_next"),
    )
    interp = walls.filter(F.col("cents").isNull()).select(
        "event_type",
        "cohort",
        F.expr(
            "(v_prev * (t_next - h) * 1000 + v_next * (h - t_prev) * 1000)"
            " div (t_next - t_prev)"
        ).alias("interp_milli"),
    )
    gaps = interp.groupBy("event_type", "cohort").agg(
        F.count("*").alias("n_gaps"),
        F.sum("interp_milli").cast("bigint").alias("interp_sum_milli"),
    )
    return (
        obs.groupBy("event_type", "cohort")
        # h is a grouping key of obs, hence unique per (event_type,
        # cohort): plain count == count-distinct without the two-phase
        # distinct-aggregate expansion
        .agg(F.count("h").alias("n_observed"))
        .join(gaps, ["event_type", "cohort"], "left")
        .select(
            "event_type",
            "cohort",
            "n_observed",
            F.coalesce(F.col("n_gaps"), F.lit(0)).cast("bigint").alias("n_gaps"),
            F.coalesce(F.col("interp_sum_milli"), F.lit(0))
            .cast("bigint")
            .alias("interp_sum_milli"),
        )
        .orderBy("event_type", "cohort")
    )


@query(
    "events_feature_drift_psi",
    oracle="""
    WITH tagged AS (
      SELECT event_type,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 'ref' ELSE 'cur' END
               AS period,
             CAST(floor(value / 10.0) AS BIGINT) AS bucket
      FROM events
    ), cells AS (
      SELECT event_type, bucket,
             CAST(SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      FROM tagged GROUP BY 1, 2
    ), tots AS (
      SELECT event_type,
             CAST(SUM(n_ref) AS BIGINT) AS t_ref,
             CAST(SUM(n_cur) AS BIGINT) AS t_cur,
             CAST(COUNT(*) AS BIGINT) AS n_buckets
      FROM cells GROUP BY 1
    ), terms AS (
      SELECT c.event_type,
             CAST(floor(
               LN(CAST((c.n_ref + 1) * (t.t_cur + t.n_buckets) AS DOUBLE)
                  / CAST((c.n_cur + 1) * (t.t_ref + t.n_buckets) AS DOUBLE))
               * (CAST(c.n_ref + 1 AS DOUBLE) / CAST(t.t_ref + t.n_buckets AS DOUBLE)
                  - CAST(c.n_cur + 1 AS DOUBLE) / CAST(t.t_cur + t.n_buckets AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS term_micro
      FROM cells c JOIN tots t USING (event_type)
    )
    SELECT event_type,
           CAST(SUM(term_micro) AS BIGINT) AS psi_micro
    FROM terms GROUP BY 1 ORDER BY 1
    """,
)
def q_events_feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the industry-standard ML-monitoring
    drift metric — between the first and second half of the month for
    each event type's value distribution (buckets of 10):
    PSI = sum_b (p_b - q_b) * ln(p_b / q_b), add-one smoothed so empty
    cells stay finite.

    Exactness discipline: each bucket's term is computed from exact
    integer counts through one ln of a cross-multiplied exact ratio
    (identical doubles both engines, the BM25 precedent) times the
    exact-fraction difference, quantized to micro-units PER BUCKET
    before the per-type sum — no float accumulation order crosses
    engines. PSI > 0.2 is the conventional "investigate" threshold;
    the raw micro value is emitted so the threshold stays the
    consumer's choice.

    Scale: one fact-grain aggregate to (type x bucket) cells, then
    O(cells) arithmetic — drift monitoring costs one scan per audit.
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        F.when(F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), "ref")
        .otherwise("cur")
        .alias("period"),
        F.floor(F.col("value") / 10.0).cast("bigint").alias("bucket"),
    )
    cells = tagged.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur"),
    )
    tots = cells.groupBy("event_type").agg(
        F.sum("n_ref").cast("bigint").alias("t_ref"),
        F.sum("n_cur").cast("bigint").alias("t_cur"),
        F.count("*").cast("bigint").alias("n_buckets"),
    )
    j = cells.join(F.broadcast(tots), "event_type")
    p = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + F.col("n_buckets")).cast(
        "double"
    )
    q = (F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + F.col("n_buckets")).cast(
        "double"
    )
    ratio = (
        ((F.col("n_ref") + 1) * (F.col("t_cur") + F.col("n_buckets"))).cast("double")
        / ((F.col("n_cur") + 1) * (F.col("t_ref") + F.col("n_buckets"))).cast("double")
    )
    term = F.floor(F.log(ratio) * (p - q) * 1000000 + F.lit(0.5)).cast("bigint")
    return (
        j.select("event_type", term.alias("term_micro"))
        .groupBy("event_type")
        .agg(F.sum("term_micro").cast("bigint").alias("psi_micro"))
        .orderBy("event_type")
    )


@query(
    "ab_mann_whitney_u",
    oracle="""
    WITH tagged AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS in_a
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), vals AS (
      SELECT cents,
             CAST(SUM(in_a) AS BIGINT) AS cnt_a,
             CAST(COUNT(*) - SUM(in_a) AS BIGINT) AS cnt_b
      FROM tagged GROUP BY 1
    ), ranked AS (
      SELECT cents, cnt_a, cnt_b,
             SUM(cnt_a + cnt_b) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - (cnt_a + cnt_b) AS cnt_less
      FROM vals
    ), sums AS (
      SELECT CAST(SUM(cnt_a) AS BIGINT) AS n1,
             CAST(SUM(cnt_b) AS BIGINT) AS n2,
             CAST(SUM(cnt_a * (2 * cnt_less + (cnt_a + cnt_b) + 1)) AS BIGINT)
               AS r1_x2
      FROM ranked
    )
    SELECT n1, n2,
           CAST(2 * n1 * n2 + n1 * (n1 + 1) - r1_x2 AS BIGINT) AS u1_x2,
           CAST(2 * n1 * n2 - (2 * n1 * n2 + n1 * (n1 + 1) - r1_x2) AS BIGINT)
             AS u2_x2,
           TRUE AS u_identity_ok
    FROM sums
    """,
)
def q_ab_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between the urgent and low-priority
    order-value distributions — the NONPARAMETRIC two-sample test
    (no normality assumption, rank-based), completing the family next
    to [[agg_ks_two_sample]] (ECDF distance), [[ab_test_proportion_z]]
    (proportions) and [[agg_chi_square_independence]] (categoricals).

    Exact to the last tie: with ties, each value's members share the
    AVERAGE rank — a half-integer — so everything is carried at 2x
    scale: rank_x2 = 2*cnt_less + cnt_eq + 1, R1_x2 accumulates per
    distinct VALUE (count x rank, never per row), and U1 + U2 = n1*n2
    holds exactly at 2x scale — the identity is emitted as adjudicated
    evidence. No floats anywhere; the normal approximation's z is the
    consumer's one-liner from (U, n1, n2).

    Scale: the fact scan collapses to the distinct-VALUE relation
    (bounded by the price domain in cents, not row count — but that
    bound is tens of millions, too many for one task), so the rank
    cumsum runs distributed via ``distrank.add_global_running_sum``
    (cents-range bins, per-bin parallel cumsums, O(bins) broadcast
    offsets); the final U statistics are one tiny aggregate.
    """
    from .distrank import add_global_running_sum

    tagged = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("in_a"),
        )
    )
    vals = (
        tagged.groupBy("cents")
        .agg(
            F.sum("in_a").cast("bigint").alias("cnt_a"),
            (F.count("*") - F.sum("in_a")).cast("bigint").alias("cnt_b"),
            (F.count("*")).cast("bigint").alias("cnt_all"),
        )
        .transform(pin)
    )
    # The distinct-VALUE relation saturates at the cents domain but
    # still reaches tens of millions of rows — the rank cumsum runs
    # distributed (round-4 distrank rewrite), never on one task. cents
    # is unique after the groupBy, so it is its own tiebreak.
    span = vals.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi")).collect()[0]
    ranked = add_global_running_sum(
        vals, "cents", "cents", "cnt_all", span["lo"], span["hi"], "cum_all"
    ).withColumn("cnt_less", F.col("cum_all") - F.col("cnt_all"))
    sums = ranked.agg(
        F.sum("cnt_a").cast("bigint").alias("n1"),
        F.sum("cnt_b").cast("bigint").alias("n2"),
        F.sum(
            F.col("cnt_a")
            * (2 * F.col("cnt_less") + (F.col("cnt_a") + F.col("cnt_b")) + 1)
        )
        .cast("bigint")
        .alias("r1_x2"),
    )
    u1 = 2 * F.col("n1") * F.col("n2") + F.col("n1") * (F.col("n1") + 1) - F.col("r1_x2")
    return sums.select(
        "n1",
        "n2",
        u1.cast("bigint").alias("u1_x2"),
        (2 * F.col("n1") * F.col("n2") - u1).cast("bigint").alias("u2_x2"),
        (
            (u1 + (2 * F.col("n1") * F.col("n2") - u1))
            == 2 * F.col("n1") * F.col("n2")
        ).alias("u_identity_ok"),
    )
