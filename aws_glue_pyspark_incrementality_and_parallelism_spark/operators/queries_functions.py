"""Scalar-function queries (SURVEY §2.7): string/date/math/conditional/
null/JSON/array surfaces, plus subquery shapes. All JVM-side built-ins —
whole-stage codegen keeps these in one generated loop per stage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..sources.io import load_table, register_views


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           CONCAT(c_mktsegment, '/', c_name) AS tagged,
           REPLACE(c_name, 'Customer#', '') AS name_id,
           LPAD(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_code
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: upper/substring/length/concat/replace/lpad."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("/"), F.col("c_name")).alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("")).alias("name_id"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_code"),
    )


@query(
    "fn_regexp_like_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%BRASS%' OR regexp_matches(p_name, '(red|green)')
    """,
)
def q_fn_regexp_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regexp predicates in a scan filter."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%BRASS%") | F.col("p_name").rlike("(red|green)")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           EXTRACT(year FROM o_orderdate) AS order_year,
           EXTRACT(month FROM o_orderdate) AS order_month,
           CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS order_quarter,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: cast, extract, trunc, interval math, datediff."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.to_date(F.date_trunc("quarter", "o_orderdate")).alias("order_quarter"),
        F.to_date(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days_to_y2k"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100
             AS charge,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_kilo,
           ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
           CAST(l_quantity AS INT) % 7 AS qty_mod
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: round/abs/floor/ceil/sqrt/modulo."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # floor(x*100+0.5)/100 instead of round(x, 2): Spark rounds the
        # exact decimal expansion of the double (HALF_UP) while DuckDB
        # scales-then-rounds in doubles; on ~1/5000 rows they disagree at
        # the tie. floor over identical IEEE ops is deterministic in both.
        (
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100
                + 0.5
            )
            / 100
        ).alias("charge"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_kilo"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod"),
    )


@query(
    "fn_case_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked,
           (c_acctbal IS NULL) AS bal_is_null
    FROM customer
    """,
)
def q_fn_case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN, NULLIF/COALESCE, IS NULL."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        F.isnull("c_acctbal").alias("bal_is_null"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def q_fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@query(
    "fn_array_ops",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
           ROUND((SELECT SUM(CAST(e AS DOUBLE) * CAST(e AS DOUBLE))
                  FROM UNNEST(embedding) AS t(e)), 4) AS sq_norm
    FROM embeddings
    """,
)
def q_fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops on the embedding column: size, element access, and a
    sum-of-squares via the higher-order AGGREGATE function (JVM-side —
    no Python for per-element math)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_component"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            4,
        ).alias("sq_norm"),
    )


@query(
    "fn_explode_posexplode",
    oracle="""
    SELECT vec_id,
           CAST(unnest(range(len(embedding))) AS INT) AS pos,
           ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS component
    FROM embeddings WHERE vec_id < 10
    """,
)
def q_fn_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode an array column into (pos, value) rows."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.round(F.col("val").cast("double"), 6).alias("component"))


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey,
           l_orderkey & 255 AS key_low_byte,
           l_orderkey << 2 AS key_shifted,
           xor(l_orderkey, 21845) AS key_xored
    FROM lineitem WHERE l_linenumber = 1 AND l_orderkey < 500
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators: AND / shift-left / XOR."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") < 500)
    )
    return l.select(
        "l_orderkey",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("key_low_byte"),
        F.shiftleft("l_orderkey", 2).alias("key_shifted"),
        F.col("l_orderkey").bitwiseXOR(F.lit(21845)).alias("key_xored"),
    )


@query(
    "fn_date_format_parse",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS order_month_str,
           CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE)
             AS reparsed_date
    FROM orders WHERE o_orderkey < 200
    """,
)
def q_fn_date_format_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip date formatting/parsing (engines use different pattern
    dialects — Java 'yyyy-MM' vs strftime '%Y-%m' — but identical
    outputs)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month_str"),
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd"), "yyyy-MM-dd").alias(
            "reparsed_date"
        ),
    )


@query(
    "fn_map_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity AS qty_val,
           ROUND(l_extendedprice, 2) AS price_val,
           2 AS n_keys
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def q_fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: build a map column, read it back via key access
    and map_keys (the oracle checks the extracted values — map layout
    itself isn't portable across engines)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("price"), F.round("l_extendedprice", 2)
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        m.getItem("qty").alias("qty_val"),
        m.getItem("price").alias("price_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders > 2× the mean price)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@query(
    "subquery_in_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
)
def q_subquery_in_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery + correlated EXISTS — Catalyst decorrelates both into
    semi joins (visible in the physical plan), so they scale like joins."""
    register_views(spark, sf_dir, ("orders", "customer", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        """
    )


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows via F.window — the batch twin
    of the Structured Streaming windowed aggregation in streaming/."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "events_daily_from_hourly",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup ladder (hypertable continuous-aggregate pattern): the daily
    report is RE-aggregated from the hourly pre-aggregate, never from raw
    events — count→sum, sum→sum, max→max all re-aggregate losslessly
    (decimal sums are associative, so this is exact, which the oracle
    proves by aggregating the raw table directly). At 100 TB the hourly
    layer is a materialized table ~1000× smaller than raw events; every
    coarser granularity reads it instead of the fact table."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("total_value"),
        F.max(F.col("value").cast("decimal(18,4)")).alias("max_value"),
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").cast("date").alias("day"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").cast("double").alias("total_value"),
            F.max("max_value").cast("double").alias("max_value"),
        )
    )


@query(
    "fn_stratified_sample",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_sampled,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sampled_price
    FROM orders
    WHERE o_orderkey % 10 < (CASE o_orderstatus
                             WHEN 'P' THEN 5 WHEN 'O' THEN 2 ELSE 1 END)
    GROUP BY 1
    """,
)
def q_fn_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (50% of P, 20% of O,
    10% of F) via a deterministic key-modulo threshold — the
    reproducible twin of ``df.sampleBy`` (whose seeded RNG is not
    portable across engines). The predicate is a scan-level filter: no
    shuffle until the per-stratum accounting aggregate."""
    o = load_table(spark, sf_dir, "orders")
    rate = (
        F.when(F.col("o_orderstatus") == "P", 5)
        .when(F.col("o_orderstatus") == "O", 2)
        .otherwise(1)
    )
    return (
        o.filter(F.col("o_orderkey") % 10 < rate)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sampled_price"),
        )
    )


@query(
    "events_gapfill_daily",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events
    ), cal AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT t.event_type, c.day,
           COALESCE(d.n_events, 0) AS n_events,
           COALESCE(d.total_value, 0.0) AS total_value
    FROM types t
    CROSS JOIN cal c
    LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = c.day
    """,
)
def q_events_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: a complete (event_type × day) grid over the
    corpus date span, missing days filled with zero — downstream
    time-series models need dense series, and a groupBy alone silently
    drops empty days.

    Scale shape: the calendar is GENERATED (sequence + explode from one
    global min/max row — one tiny job), never scanned; the grid is
    small-dim × days so the grid side is broadcast into the left join
    against the daily pre-aggregate. The expensive side (raw events)
    is touched exactly once, by the groupBy."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    grid = e.select("event_type").distinct().crossJoin(F.broadcast(cal))
    return (
        grid.join(F.broadcast(daily), ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


@query(
    "fn_variant_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def q_fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion via the open VARIANT type (Spark 4
    ``parse_json`` / ``variant_get``): the JSON string is parsed ONCE
    into a binary shredded encoding, then every extraction is a cheap
    typed path lookup — unlike ``get_json_object``, which re-parses the
    raw string per expression. At 100 TB of event payloads that
    parse-once property (and VARIANT's parquet shredding) is the
    difference between one decode pass and one per referenced field."""
    e = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )


@query(
    "fn_try_arithmetic",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             l_extendedprice / nullif(l_quantity - 25, 0) AS safe_ratio
      FROM lineitem
    )
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN safe_ratio IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_zero,
           ROUND(MIN(safe_ratio), 4) AS min_ratio,
           ROUND(MAX(safe_ratio), 4) AS max_ratio
    FROM r GROUP BY l_returnflag
    """,
)
def q_fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (``try_divide``): divide-by-zero yields NULL
    instead of Infinity or a job-killing ANSI exception — the per-row
    failure containment a 100 TB batch needs (one poison row must not
    fail a 10-hour job; count the NULLs, don't die). Oracle expresses
    the same semantics with nullif."""
    l = load_table(spark, sf_dir, "lineitem")
    r = l.select(
        "l_returnflag",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias("safe_ratio"),
    )
    return r.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("safe_ratio").isNull(), 1).otherwise(0)).alias("n_div_zero"),
        F.round(F.min("safe_ratio"), 4).alias("min_ratio"),
        F.round(F.max("safe_ratio"), 4).alias("max_ratio"),
    )


#: This exact SQL text runs unchanged on BOTH engines — it is both the
#: Spark implementation (spark.sql over registered views) and the oracle.
_SQL_CTE_WINDOW = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1
    )
    SELECT day, n_orders, total,
           ROUND(AVG(total) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7,
           RANK() OVER (PARTITION BY date_trunc('month', day)
                        ORDER BY total DESC) AS rank_in_month
    FROM daily
"""


@query("sql_cte_window", oracle=_SQL_CTE_WINDOW)
def q_sql_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text surface: a CTE + two window frames (7-day moving
    average, rank within month) submitted via ``spark.sql`` over the
    registered temp views — the ONE SQL string is also the DuckDB
    oracle, proving the engine speaks portable ANSI SQL, not just the
    DataFrame DSL. The global-ORDER window runs over the DAILY
    pre-aggregate (O(days) rows), never the fact table — the ladder
    makes the single-partition window sort a non-issue at any scale."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_SQL_CTE_WINDOW)


#: Shared SQL text (implementation AND oracle): iterative halving walk
#: from every supplier key down to 0 — a WITH RECURSIVE transitive
#: closure (Spark 4 recursive CTEs). Portable int division via
#: CAST(FLOOR(x/2)); terminates in O(log max_key) passes, each pass a
#: set-based self-step over O(rows) — never a per-row driver loop.
_SQL_RECURSIVE_WALK = """
    WITH RECURSIVE walk AS (
      SELECT s_suppkey AS start_key, s_suppkey AS node, 0 AS depth FROM supplier
      UNION ALL
      SELECT start_key, CAST(FLOOR(node / 2) AS BIGINT) AS node, depth + 1 AS depth
      FROM walk WHERE node > 0
    )
    SELECT depth, COUNT(*) AS n_paths, CAST(SUM(node) AS BIGINT) AS sum_nodes
    FROM walk GROUP BY depth
"""


@query("sql_recursive_cte_walk", oracle=_SQL_RECURSIVE_WALK)
def q_sql_recursive_cte_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE surface (SQL:1999 WITH RECURSIVE, native in
    Spark 4): every supplier key walks its halving chain to the root,
    aggregated per depth. The reference has no recursion anywhere; this
    proves the engine's iterative-fixpoint SQL path with the identical
    text running on DuckDB as the oracle. At scale the recursion depth
    is log2(max key) and each level is a full set-at-a-time step, so the
    plan is O(log n) joins — the same structure the dedup connected-
    components oracle uses, now first-class in the query surface."""
    register_views(spark, sf_dir, ("supplier",))
    return spark.sql(_SQL_RECURSIVE_WALK)


#: Shared SQL text (implementation AND oracle): correlated LATERAL
#: top-k — for each nation, its 2 richest customers via an ORDER BY +
#: LIMIT subquery referencing the outer row.
_SQL_LATERAL_TOPK = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
"""


@query("join_lateral_topk", oracle=_SQL_LATERAL_TOPK)
def q_join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (top-2 customers per nation via an
    outer-referencing ORDER BY/LIMIT subquery) — the SQL-standard
    spelling of per-group top-k, complementing the window-function
    spelling in ``window_rank_topn_per_group``. Catalyst decorrelates
    the lateral subquery into a ranked join rather than re-executing it
    per outer row, so the same text that reads as a nested loop executes
    as a single shuffle at any nation count. Deterministic tie-break on
    (acctbal DESC, name)."""
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_SQL_LATERAL_TOPK)


@query(
    "fn_xml_extract",
    oracle="""
    SELECT event_id, event_type AS xml_type, ROUND(value, 4) AS xml_value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
)
def q_fn_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface: serialize each event to an XML fragment,
    parse it back with Spark 4's native ``from_xml`` into a typed
    struct, and emit the extracted fields. Roundtripping through a
    string proves the parse path; the oracle reads the same values off
    the base columns directly (DuckDB has no XML type). Both the
    serialize and parse are codegen'd expressions — no Python."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    xml = F.format_string("<e><t>%s</t><v>%.4f</v></e>", "event_type", "value")
    parsed = F.from_xml(xml, "t STRING, v DOUBLE")
    return events.select(
        "event_id",
        parsed.getField("t").alias("xml_type"),
        parsed.getField("v").alias("xml_value"),
    )


@query(
    "fn_url_parse",
    oracle="""
    SELECT event_id,
           'events.example.com' AS url_host,
           '/' || event_type || '/' || CAST(user_id AS VARCHAR) AS url_path,
           'v=' || CAST(event_id AS VARCHAR) AS url_query,
           CAST(event_id AS VARCHAR) AS v_param
    FROM events WHERE event_type = 'click'
    """,
)
def q_fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL surface: build canonical event URLs, then parse host / path /
    query / single-parameter back out with ``parse_url`` — the web-log
    normalization primitive (crawl dedup keys on exactly this). All
    codegen string expressions; the oracle re-derives each component
    from the base columns since DuckDB has no URL parser."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    url = F.format_string(
        "https://events.example.com/%s/%d?v=%d", "event_type", "user_id", "event_id"
    )
    return events.select(
        "event_id",
        F.parse_url(url, F.lit("HOST")).alias("url_host"),
        F.parse_url(url, F.lit("PATH")).alias("url_path"),
        F.parse_url(url, F.lit("QUERY")).alias("url_query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("v")).alias("v_param"),
    )


@query(
    "sql_pipe_syntax_report",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q_sql_pipe_syntax_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax (|>): the same logical plan as the
    standard-SQL oracle, written as a linear dataflow — each |> stage
    is parsed into the identical Catalyst operators (filter →
    aggregate), so there is zero execution difference; this query pins
    that the surface exists and resolves correctly."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
                     ROUND(SUM(o_totalprice), 2) AS revenue
           GROUP BY o_orderpriority
        """
    ).select("o_orderpriority", "n_orders", "revenue")


def _wrs_chain_sql(expr: str, n: int) -> str:
    """Left-associated explicit product ``expr*expr*...`` (n factors) —
    the SAME IEEE multiply sequence Spark's chained Column ``*`` emits,
    so both engines produce bit-identical doubles."""
    return " * ".join([expr] * n)


@query(
    "sample_weighted_reservoir_per_key",
    oracle=f"""
    WITH base AS (
      SELECT source, doc_id,
             1 + CAST(CAST(CONCAT('0x', substring(md5(CONCAT('tier:', CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) % 4 AS INT) AS tier,
             (CAST(CONCAT('0x', substring(md5(CONCAT('wrs:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 1)
               / 4294967297.0 AS u
      FROM documents
    ), keyed AS (
      SELECT source, doc_id, tier,
             CASE tier
               WHEN 1 THEN {_wrs_chain_sql('u', 12)}
               WHEN 2 THEN {_wrs_chain_sql('u', 6)}
               WHEN 3 THEN {_wrs_chain_sql('u', 4)}
               ELSE {_wrs_chain_sql('u', 3)}
             END AS s
      FROM base
    )
    SELECT source, doc_id, tier, CAST(rn AS INT) AS rn
    FROM (SELECT source, doc_id, tier,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY s DESC, doc_id) AS rn
          FROM keyed)
    WHERE rn <= 3
    """,
)
def q_sample_weighted_reservoir_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling per key (Efraimidis-Spirakis A-ES):
    keep the top-K=3 documents per ``source``, selection probability
    proportional to a weight tier — the standard one-pass 'sample k
    quality-weighted docs per domain' primitive of a training-data
    pipeline. Each item draws u ∈ (0,1] and ranks by u^(1/w); top-K by
    that key IS a weighted sample without replacement.

    Cross-engine exactness (the float-threshold trap, engineered out):
    u is an md5-derived 32-bit rational — identical on both engines —
    and weights are INTEGER TIERS w ∈ {{1..4}}, so ranking by u^(1/w)
    is equivalent to ranking by u^(12/w) (both sides of any comparison
    raised to the 12th power), and 12/w ∈ {{12,6,4,3}} is computed as
    an EXPLICIT left-associated product — the same IEEE multiply
    sequence in Spark and DuckDB, hence bit-identical sort keys and an
    identical reservoir. (A float pow()/ln() formulation could diverge
    by an ulp at a rank boundary.) Tier here is an md5-derived proxy
    (decorrelated from ``source``, which is itself doc_id-striped);
    production buckets a real quality score.

    Scale shape: one scan, one window shuffle on ``source`` — the same
    top-K-per-key pattern as ``sort_limit_topk``; at 100 TB the window
    is a partial top-K aggregate, never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    tier = (
        F.lit(1)
        + (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("tier:"), F.col("doc_id").cast("string"))), 1, 4
                ),
                16,
                10,
            ).cast("bigint")
            % 4
        ).cast("int")
    ).alias("tier")
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("wrs:"), F.col("doc_id").cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            + 1
        )
        / F.lit(4294967297.0)
    ).alias("u")
    base = docs.select("source", "doc_id", tier, u)

    def chain(n: int):
        col = F.col("u")
        for _ in range(n - 1):
            col = col * F.col("u")
        return col

    keyed = base.select(
        "source",
        "doc_id",
        "tier",
        F.when(F.col("tier") == 1, chain(12))
        .when(F.col("tier") == 2, chain(6))
        .when(F.col("tier") == 3, chain(4))
        .otherwise(chain(3))
        .alias("s"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("s"), F.asc("doc_id"))
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", "doc_id", "tier", F.col("rn").cast("int").alias("rn"))
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT doc_id,
           -- PKCS#7 pads BYTES (strlen), not code points: on non-ASCII
           -- text the ciphertext length follows the UTF-8 byte count
           -- (unicode-corpus divergence fixed in round 9)
           CAST(16 * ((strlen(text) + 16) // 16) AS BIGINT) AS cipher_len,
           TRUE AS roundtrip_ok,
           CAST(length(text) AS BIGINT) AS plain_len
    FROM documents
    """,
)
def q_fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface (``aes_encrypt``/``aes_decrypt``
    — the at-rest PII protection primitive): each document's text is
    encrypted and decrypted with AES-128-ECB (the deterministic mode,
    so ciphertext geometry is checkable; production would pick GCM and
    give up determinism for IV freshness).  DuckDB has no AES, so the
    oracle adjudicates the algebraic structure instead: PKCS#7
    ciphertext length ``16 * (len/16 + 1)`` exactly, and the
    decrypt∘encrypt fixed point pinned through a REAL comparison
    (the boolean is computed from the round-tripped bytes JVM-side,
    not a literal)."""
    docs = load_table(spark, sf_dir, "documents")
    enc = F.expr("aes_encrypt(text, '0123456789abcdef', 'ECB')")
    dec = F.expr(
        "cast(aes_decrypt(aes_encrypt(text, '0123456789abcdef', 'ECB'),"
        " '0123456789abcdef', 'ECB') as string)"
    )
    return docs.select(
        "doc_id",
        F.length(enc).cast("bigint").alias("cipher_len"),
        (dec == F.col("text")).alias("roundtrip_ok"),
        F.length("text").cast("bigint").alias("plain_len"),
    )


@query(
    "fn_collation_group",
    oracle="""
    WITH mixed AS (
      SELECT CASE event_id % 3
               WHEN 0 THEN upper(event_type)
               WHEN 1 THEN upper(substr(event_type, 1, 1)) || lower(substr(event_type, 2))
               ELSE lower(event_type)
             END AS et
      FROM events
    )
    SELECT lower(et) AS event_type_ci,
           COUNT(*) AS n_events,
           COUNT(DISTINCT et) AS n_spellings
    FROM mixed
    GROUP BY lower(et)
    """,
)
def q_fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 ``collate``/``UTF8_LCASE``):
    event types arrive with inconsistent casing (simulated
    deterministically: UPPER / Initcap / lower by ``event_id % 3``);
    grouping on the column COLLATED as case-insensitive merges the
    spellings without rewriting every predicate to ``lower()`` — the
    collation travels with the column through joins, sorts, and
    DISTINCT, which is the point of engine-level collations over
    ad-hoc normalization.

    The group representative under a collation is whichever raw
    spelling a partition saw first (nondeterministic), so the output
    projects ``lower()`` of it — canonical regardless of
    representative — and counts the raw spellings with a plain
    (case-sensitive) DISTINCT as evidence the merge actually collapsed
    multiple variants. Oracle states the same algebra with explicit
    ``lower()``; Initcap is spelled ucfirst-style so both engines
    agree on single-word tokens."""
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(F.col("event_id") % 3 == 0, F.upper("event_type"))
        .when(F.col("event_id") % 3 == 1, F.initcap("event_type"))
        .otherwise(F.lower("event_type"))
        .alias("et")
    )
    return (
        mixed.groupBy(F.collate(F.col("et"), "UTF8_LCASE").alias("etc"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct(F.collate(F.col("et"), "UTF8_BINARY")).alias(
                "n_spellings"
            ),
        )
        .select(
            F.lower("etc").cast("string").alias("event_type_ci"),
            "n_events",
            "n_spellings",
        )
    )
