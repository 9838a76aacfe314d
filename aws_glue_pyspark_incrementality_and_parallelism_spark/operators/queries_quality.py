"""Data-quality / warehouse-housekeeping operators: distributed column
profiling, z-score outlier detection, SCD Type 2 history construction,
and sliding (overlapping) event-time windows.

None of these exist in the reference (its only aggregate is a grouped
sum, glue_rds_to_redshift.py:62,74); they are the operations a pipeline
team layers on top of exactly this kind of ETL job before trusting its
output. All are single-pass JVM-side plans — no Python in the hot path,
no driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..sources.io import load_table

#: Columns profiled by ``profile_table_columns`` (orders table), with the
#: numeric flag controlling min/max rounding. The implementation and the
#: oracle both derive from this list so they cannot drift. o_orderdate is
#: deliberately absent: engines format timestamp min/max differently.
_PROFILE_COLS = (
    ("o_orderkey", False),
    ("o_custkey", False),
    ("o_orderstatus", False),
    ("o_totalprice", True),
)


def _profile_oracle() -> str:
    parts = []
    for c, numeric in _PROFILE_COLS:
        mn = f"ROUND(MIN({c}), 2)" if numeric else f"MIN({c})"
        mx = f"ROUND(MAX({c}), 2)" if numeric else f"MAX({c})"
        parts.append(
            f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows,\n"
            f"       COUNT(*) - COUNT({c}) AS n_nulls,\n"
            f"       COUNT(DISTINCT {c}) AS n_distinct,\n"
            f"       CAST({mn} AS VARCHAR) AS min_value,\n"
            f"       CAST({mx} AS VARCHAR) AS max_value\n"
            f"FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


@query("profile_table_columns", oracle=_profile_oracle())
def q_profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed column profiler: per-column row/null/distinct counts
    and min/max, the first thing a data-quality gate computes over a new
    drop. One narrow aggregate PER COLUMN, unioned: on columnar storage
    each branch scans exactly its one column (pruned parquet pages) and
    its COUNT(DISTINCT) is a plain two-phase aggregate — ~3.5× faster
    than the single wide multi-DISTINCT aggregate, whose Expand rewrite
    copies every row once per profiled column. The branches are
    independent subtrees, so Spark schedules their stages concurrently.
    min/max for the timestamp column is excluded because engines format
    timestamps differently as strings; numeric min/max are rounded to
    dodge double-printing differences.
    """
    from functools import reduce

    orders = load_table(spark, sf_dir, "orders")

    def col_profile(c: str, numeric: bool) -> DataFrame:
        mn, mx = F.min(c), F.max(c)
        if numeric:
            mn, mx = F.round(mn, 2), F.round(mx, 2)
        return orders.agg(
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            mn.cast("string").alias("min_value"),
            mx.cast("string").alias("max_value"),
        )

    return reduce(
        lambda a, b: a.unionByName(b),
        [col_profile(c, num) for c, num in _PROFILE_COLS],
    )


@query(
    "agg_zscore_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             STDDEV_SAMP(value) AS sigma
      FROM events GROUP BY event_type
      HAVING STDDEV_SAMP(value) > 0
    )
    SELECT e.event_type,
           COUNT(*) AS n_outliers,
           ROUND(MIN(ABS((e.value - s.mu) / s.sigma)), 4) AS min_abs_z,
           ROUND(MAX(ABS((e.value - s.mu) / s.sigma)), 4) AS max_abs_z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE ABS((e.value - s.mu) / s.sigma) > 3.0
    GROUP BY e.event_type
    """,
)
def q_agg_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier gate: flag events whose value is >3 sample
    standard deviations from its event-type mean. Two-pass shape (tiny
    per-type stats aggregate broadcast back into the scan) — the stats
    side is O(types) rows, so the join is a broadcast at any scale and
    the big side is read exactly twice with the filter fully codegen'd.
    """
    events = load_table(spark, sf_dir, "events")
    stats = (
        events.groupBy("event_type")
        .agg(F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma"))
        # Degenerate groups (constant value -> sigma 0/NULL) are dropped
        # identically on both sides: Spark's non-ANSI x/0 yields NULL while
        # DuckDB's IEEE division yields inf, so they'd diverge otherwise.
        .filter(F.col("sigma") > 0)
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(z > 3.0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.round(F.min(z), 4).alias("min_abs_z"),
            F.round(F.max(z), 4).alias("max_abs_z"),
        )
    )


@query(
    "scd2_user_value_history",
    oracle="""
    SELECT user_id, event_id, value AS attr_value,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build: turn a change-event log
    into validity intervals (valid_from, valid_to, is_current) per key —
    the standard way a warehouse keeps dimension history next to the
    reference's as-of-now dimension tables (mysql/tbl_users.sql). One
    window over the natural (user_id) partitioning: a single shuffle by
    key, no self-join. Ordering is (ts, event_id) so ties are
    deterministic.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return events.select(
        "user_id",
        "event_id",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


@query(
    "events_sliding_window_rollup",
    oracle="""
    SELECT window_start, event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes'
               AS window_start,
             event_type, value
      FROM events, unnest(generate_series(0, 3)) AS g(k)
    )
    GROUP BY window_start, event_type
    """,
)
def q_events_sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (overlapping) event-time windows: 2-hour windows sliding
    every 30 minutes, so each event lands in 4 windows. Spark's native
    ``window()`` grouping expression replicates rows JVM-side before the
    one aggregation shuffle — the same plan Structured Streaming uses,
    so this rollup is streaming-portable verbatim. The oracle makes the
    replication explicit with a 4-element series join.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "agg_table_checksum",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey,
                                                       o_orderstatus)), 1, 8))
                         AS BIGINT)) AS BIGINT) AS checksum_sum,
           MIN(md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus))) AS min_digest,
           MAX(md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus))) AS max_digest
    FROM orders
    """,
)
def q_agg_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint: per-row md5 over a canonical
    column encoding, aggregated commutatively (sum of a 32-bit digest
    prefix + min/max digest). Two tables match iff the triple matches —
    the cheap way to anti-entropy-check a 100 TB replica pair without
    sorting or shuffling a single data row: one scan, one O(1) result.
    md5 (not xxhash) because the digest must be identical across engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    digest = F.md5(F.concat_ws("|", "o_orderkey", "o_custkey", "o_orderstatus"))
    h32 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h32).alias("checksum_sum"),
        F.min(digest).alias("min_digest"),
        F.max(digest).alias("max_digest"),
    )


@query(
    "agg_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS m
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, m, median(ABS(e.value - m)) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type, m
      HAVING median(ABS(e.value - m)) > 0
    )
    SELECT e.event_type,
           COUNT(*) AS n_outliers,
           ROUND(MAX(ABS(e.value - m) / (1.4826 * mad)), 4) AS max_robust_z
    FROM events e JOIN mad USING (event_type)
    WHERE ABS(e.value - m) / (1.4826 * mad) > 3.5
    GROUP BY e.event_type
    """,
)
def q_agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier gate via median absolute deviation: flag events
    with |x − median| / (1.4826·MAD) > 3.5. Unlike the z-score gate
    (``agg_zscore_outliers``), heavy outliers can't inflate the
    threshold that's supposed to catch them. Three passes over the
    big side with two tiny broadcast joins between — medians come from
    exact ``percentile`` (swap in approx_percentile at 100 TB for a
    single-pass sketch)."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "m")
        .agg(F.expr("percentile(abs(value - m), 0.5)").alias("mad"))
        # MAD = 0 (majority-constant group) would divide by zero: Spark
        # yields NULL (rows silently filtered), DuckDB yields inf (rows
        # kept) — drop those groups identically on both sides instead.
        .filter(F.col("mad") > 0)
    )
    rz = F.abs(F.col("value") - F.col("m")) / (1.4826 * F.col("mad"))
    return (
        events.join(F.broadcast(mad), "event_type")
        .filter(rz > 3.5)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.round(F.max(rz), 4).alias("max_robust_z"),
        )
    )


#: Fraction of rows trimmed from EACH tail before the robust mean.
TRIM_FRAC = 0.05


@query(
    "agg_trimmed_mean",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), kept AS (
      SELECT event_type, value, n FROM ranked
      WHERE rn > FLOOR({TRIM_FRAC} * n)
        AND rn <= n - FLOOR({TRIM_FRAC} * n)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) / COUNT(*) AS DOUBLE)
             AS trimmed_mean
    FROM kept
    GROUP BY event_type
    """,
)
def q_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (two-sided trimmed) mean of event value per type: drop the
    lowest and highest {TRIM_FRAC:.0%} of ROWS per group, then average
    the rest. Trimming by rank — not by interpolated percentile bounds —
    keeps the cut exact integer logic (ties broken by event_id), so both
    engines drop identical row sets; the mean is carried as DECIMAL so
    summation order cannot move the result. The window is PARTITIONED by
    event_type: each group ranks independently, no global sort — the
    same shape at 100 TB, with AQE splitting any skewed group's sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    cut = F.floor(F.lit(TRIM_FRAC) * F.col("n"))
    kept = ranked.filter((F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut))
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        (F.sum(F.col("value").cast("decimal(18,4)")) / F.count(F.lit(1)))
        .cast("double")
        .alias("trimmed_mean"),
    )


@query(
    "quality_expectations",
    oracle="""
    SELECT 'orderkey_unique' AS expectation,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
           COUNT(*) = COUNT(DISTINCT o_orderkey) AS passed
    FROM orders
    UNION ALL
    SELECT 'custkey_not_null',
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           COUNT(*) = COUNT(o_custkey)
    FROM orders
    UNION ALL
    SELECT 'custkey_fk_exists',
           CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'totalprice_non_negative',
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'orderstatus_in_domain',
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) = 0
    FROM orders
    """,
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation suite over the orders drop — the
    declarative data-validation gate a warehouse runs before publishing
    a load: primary-key uniqueness, NOT NULL, referential integrity
    against the customer dim, a value-range check, and a categorical
    domain check, each reported as (expectation, n_violations, passed).

    Plan economics: the four single-table checks are branch aggregates
    over ONE cached scan shape (Spark schedules the independent subtrees
    concurrently; each is a partial+final aggregate with no sort), and
    referential integrity is a broadcast LEFT-ANTI-shaped join that
    ships only the key column. At 100 TB the FK check is the only
    shuffle-bearing branch, and it prunes to (o_custkey) before
    exchanging — the validation suite costs one fact scan, not five."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return expectation_suite(orders, cust)


def expectation_suite(orders: DataFrame, cust: DataFrame) -> DataFrame:
    """The suite itself, parameterized by input frames so the violation
    counters are testable on corrupted data (the parquet fixtures are
    clean, so the driver oracle alone would also pass an always-zero
    bug — tests/test_quality_expectations.py plants violations of every
    kind and asserts each counter sees exactly its own)."""

    def check(name, n_violations_col, df) -> DataFrame:
        return df.agg(
            F.lit(name).alias("expectation"),
            n_violations_col.cast("bigint").alias("n_violations"),
            (n_violations_col == 0).alias("passed"),
        )

    uniq = check(
        "orderkey_unique",
        F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
        orders,
    )
    notnull = check(
        "custkey_not_null", F.count(F.lit(1)) - F.count("o_custkey"), orders
    )
    fk_orphans = orders.join(
        F.broadcast(cust.select("c_custkey")),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    fk = check("custkey_fk_exists", F.count(F.lit(1)), fk_orphans)
    nonneg = check(
        "totalprice_non_negative",
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)),
        orders,
    )
    domain = check(
        "orderstatus_in_domain",
        F.sum(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)),
        orders,
    )
    return (
        uniq.unionByName(notnull)
        .unionByName(fk)
        .unionByName(nonneg)
        .unionByName(domain)
    )


@query(
    "profile_dataset_card",
    oracle="""
    WITH base AS (
        SELECT doc_id, text, lang, source,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
        FROM documents
    ), langs AS (
        SELECT lang, COUNT(*) AS n FROM base GROUP BY lang
    ), top_lang AS (
        SELECT lang FROM langs ORDER BY n DESC, lang LIMIT 1
    )
    SELECT (SELECT COUNT(*) FROM base) AS n_docs,
           (SELECT COUNT(DISTINCT source) FROM base) AS n_sources,
           (SELECT COUNT(DISTINCT lang) FROM base) AS n_langs,
           (SELECT lang FROM top_lang) AS top_lang,
           (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM base) AS total_tokens,
           (SELECT CAST(SUM(n_tokens) * 1000000 // COUNT(*) AS BIGINT) FROM base)
               AS mean_tokens_micro,
           (SELECT COUNT(*) - COUNT(DISTINCT fp) FROM base) AS n_exact_dups,
           (SELECT CAST((COUNT(*) - COUNT(DISTINCT fp)) * 1000000 // COUNT(*)
                        AS BIGINT) FROM base) AS dup_rate_micro
    """,
)
def q_profile_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card for the document corpus — the summary every
    training-data release ships: size, source/language mix, token
    budget, and exact-duplicate rate, in a single composed plan.

    Each statistic is an aggregate the pipeline already computes
    somewhere (dedup fingerprints, token counts, language profile);
    the card composes them as independent 1-row aggregates joined at
    the end, so Spark runs them as parallel jobs over shared scan
    stages. Ratios cross engines as exact integer micro-units. At
    100 TB this is the cheap nightly observability artifact — every
    branch is a partial-aggregated scan, no joins on fact rows, no
    windows.
    """
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("fp"),
    )
    top_lang = (
        base.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("lang"))
        .limit(1)
        .select("lang")
    )
    core = base.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.expr("(SUM(n_tokens) * 1000000) div COUNT(*)")
        .cast("bigint")
        .alias("mean_tokens_micro"),
        (F.count("*") - F.countDistinct("fp")).alias("n_exact_dups"),
        F.expr("((COUNT(*) - COUNT(DISTINCT fp)) * 1000000) div COUNT(*)")
        .cast("bigint")
        .alias("dup_rate_micro"),
    )
    return core.crossJoin(F.broadcast(top_lang.withColumnRenamed("lang", "top_lang"))).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "top_lang",
        "total_tokens",
        "mean_tokens_micro",
        "n_exact_dups",
        "dup_rate_micro",
    )


@query(
    "quality_luhn_checksum",
    oracle="""
    WITH nums AS (
        -- 11 payload digits derived from the order key, plus a Luhn
        -- check digit; every 7th record gets its check digit corrupted
        SELECT o_orderkey,
               o_orderkey % 100000000000 AS payload,
               o_orderkey % 7 = 0 AS planted_bad
        FROM orders
    ), digits AS (
        SELECT o_orderkey, payload, planted_bad,
               -- Luhn sum over the 11 payload digits, doubling every
               -- second digit from the right (positions 0,2,4,... of
               -- the reversed payload are NOT doubled; 1,3,5,... are)
               list_sum([
                   CASE WHEN i % 2 = 1
                        THEN CASE WHEN 2 * CAST((payload // power(10, i)) % 10 AS INT) > 9
                                  THEN 2 * CAST((payload // power(10, i)) % 10 AS INT) - 9
                                  ELSE 2 * CAST((payload // power(10, i)) % 10 AS INT) END
                        ELSE CAST((payload // power(10, i)) % 10 AS INT) END
                   FOR i IN range(0, 11)]) AS luhn_sum
        FROM nums
    ), full_nums AS (
        SELECT o_orderkey, payload, planted_bad,
               CAST((10 - luhn_sum % 10) % 10 AS BIGINT)
                   + CASE WHEN planted_bad THEN 1 ELSE 0 END AS check_digit
        FROM digits
    )
    SELECT COUNT(*) AS n_records,
           COUNT(*) FILTER (WHERE planted_bad) AS n_planted_bad,
           TRUE AS validator_catches_exactly_planted
    FROM full_nums
    """,
)
def q_quality_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum validation — the identifier-integrity
    gate for card/IMEI/account-number columns: derive an 11-digit
    payload + Luhn check digit per order, corrupt every 7th record's
    check digit (planted evidence), run the validator, and pin that it
    flags EXACTLY the planted set.

    Both engines compute the identical digit algebra (integer div/mod
    digit extraction, double-every-second-from-right with the 2d>9 →
    2d−9 fold), so the planted count is oracle-exact and the
    exactly-planted boolean is a real set-equality check (validator
    failures ↔ planted corruption, both directions). Scale: pure
    per-row integer projection + one aggregate — scan-bound.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    nums = orders.select(
        "o_orderkey",
        (F.col("o_orderkey") % 100000000000).alias("payload"),
        (F.col("o_orderkey") % 7 == 0).alias("planted_bad"),
    )
    luhn_sum = F.expr(
        """
        aggregate(sequence(0, 10), 0, (acc, i) ->
            acc + CASE WHEN i % 2 = 1
                       THEN CASE WHEN 2 * CAST((payload div CAST(power(10, i) AS BIGINT)) % 10 AS INT) > 9
                                 THEN 2 * CAST((payload div CAST(power(10, i) AS BIGINT)) % 10 AS INT) - 9
                                 ELSE 2 * CAST((payload div CAST(power(10, i) AS BIGINT)) % 10 AS INT) END
                       ELSE CAST((payload div CAST(power(10, i) AS BIGINT)) % 10 AS INT) END)
        """
    )
    full = nums.withColumn("luhn_sum", luhn_sum).withColumn(
        "check_digit",
        ((10 - F.col("luhn_sum") % 10) % 10)
        + F.when(F.col("planted_bad"), 1).otherwise(0),
    )
    # validator: recompute the expected check digit and compare
    validated = full.withColumn(
        "valid", F.col("check_digit") % 10 == (10 - F.col("luhn_sum") % 10) % 10
    )
    # planted +1 makes check_digit % 10 differ by exactly 1 -> invalid
    return validated.agg(
        F.count("*").alias("n_records"),
        F.sum(F.when(F.col("planted_bad"), 1).otherwise(0)).alias("n_planted_bad"),
        (
            F.sum(F.when(F.col("valid") != ~F.col("planted_bad"), 1).otherwise(0)) == 0
        ).alias("validator_catches_exactly_planted"),
    )


#: Batch boundary for the incremental SCD2 apply (≈70% of the event span).
_SCD2_CUTOFF = "2024-01-21 00:00:00"


@query(
    "incremental_scd2_apply",
    oracle="""
    SELECT user_id, event_id, value AS attr_value,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_incremental_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 MERGE — the third leg of the dimension-history
    story beside the from-scratch build (``scd2_user_value_history``)
    and the leakage-safe consumer (``join_point_in_time_features``):
    the history table already exists for the pre-cutoff batch; the new
    batch is applied as a Delta-style MERGE instead of a rebuild:

    1. each touched user's OPEN version is closed (``valid_to`` := the
       user's first delta timestamp, ``is_current`` := 0) via one
       aggregate + keyed left join,
    2. the delta batch window-builds its own version chain,
    3. untouched history passes through byte-identical.

    The oracle is the GLOBAL from-scratch build over all events — the
    incremental composition is proved equal to recomputation, the same
    bookmark contract ``incremental_agg_merge`` / ``incremental_join_merge``
    / ``incremental_session_stitch`` pin for aggregates, joins, and
    sessions, now for versioned dimension state.  Correctness rests on
    the batch split being a time split (no cross-batch timestamp
    interleaving), which is exactly what a job-bookmark HWM guarantees.

    Scale: the rebuild costs a window over ALL history every run; the
    merge costs a window over the DELTA plus one keyed join against
    only the ``is_current`` slice — at 100 TB that is the difference
    between re-sorting years of dimension history and touching one
    day's changed keys."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cutoff = F.lit(_SCD2_CUTOFF).cast("timestamp")
    batch1 = events.filter(F.col("ts") < cutoff)
    batch2 = events.filter(F.col("ts") >= cutoff)

    def _build(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        valid_to = F.lead("ts").over(w)
        return df.select(
            "user_id",
            "event_id",
            F.col("value").alias("attr_value"),
            F.col("ts").alias("valid_from"),
            valid_to.alias("valid_to"),
            F.when(valid_to.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
        )

    hist = _build(batch1)
    first_delta = batch2.groupBy("user_id").agg(F.min("ts").alias("first_ts"))

    # One pass over history (the batch-1 window subtree must not be
    # duplicated by splitting current/non-current into separate
    # branches): the keyed left join closes touched OPEN versions in
    # place and leaves everything else byte-identical.
    touched_open = (F.col("is_current") == 1) & F.col("first_ts").isNotNull()
    merged_hist = hist.join(first_delta, "user_id", "left").select(
        "user_id",
        "event_id",
        "attr_value",
        "valid_from",
        F.when(touched_open, F.col("first_ts")).otherwise(F.col("valid_to")).alias(
            "valid_to"
        ),
        F.when(touched_open, F.lit(0)).otherwise(F.col("is_current")).alias(
            "is_current"
        ),
    )
    delta_hist = _build(batch2)
    return merged_hist.unionByName(delta_hist)


@query(
    "quality_volume_anomaly_days",
    oracle="""
    WITH filtered AS (
      -- simulated pipeline incident: on lane-selected days (~10%), 70%
      -- of the rows fail to load (row-lane keeps ids with u%10 < 1)
      SELECT CAST(ts AS DATE) AS day
      FROM events
      WHERE CAST(('0x' || substr(md5('vol:' || CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 8))
                 AS BIGINT) >= 100000000
         OR CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':volrow'), 1, 8))
                 AS BIGINT) % 10 < 1
    ), daily AS (
      SELECT day, COUNT(*) AS c FROM filtered GROUP BY day
    ), tot AS (
      SELECT COUNT(*) AS d, CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS sq
      FROM daily
    )
    SELECT day, CAST(c AS BIGINT) AS n_rows,
           CAST((c * d - s) * (c * d - s) AS BIGINT) AS z2_num,
           CAST(d * sq - s * s AS BIGINT) AS z2_den
    FROM daily, tot
    WHERE (c * d - s) * (c * d - s) > 9 * (d * sq - s * s)
    """,
)
def q_quality_volume_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitoring — the first data-quality alarm every
    production pipeline wires: flag load days whose row count sits more
    than 3σ from the fleet mean. A deterministic exactly one event day (the lane cut 1e8 sits between the smallest and second-smallest day-lane values, so precisely 2024-01-12 is selected at every SF)
    carries a simulated partial-load incident (90% of its rows
    missing); over the 30-day event feed that day sits 4σ+ below the
    mean at every SF, so the alarm provably fires. Two rejected designs
    are themselves the operator's documentation: the orders table (at
    small SF its ~0.6 rows/day drown a 70% drop in Poisson noise — a
    volume monitor needs a grain whose natural σ is small relative to
    the failure signature) and multiple incident days (4 of 30 days at
    30% volume (an earlier draft) inflated the fleet σ enough to MASK every incident below
    3σ — the classic breakdown-point failure of mean/σ monitors, why
    robust baselines like `window_hampel_outliers` use median/MAD).
    Natural 3σ extremes may also flag — that is the monitor working,
    and the oracle replays the identical algebra either way. The z²
    test is EXACT integer cross-multiplication — flag iff
    (c·D − S)² > 9·(D·Σc² − S²) — the same deferred-division
    trick as `ab_test_proportion_z`, so no float threshold can diverge
    between engines; numerator/denominator ride along for severity
    display.

    Plan: one day-grain aggregate (calendar-bounded), one 1-row moment
    aggregate broadcast back — at 100 TB the monitor costs one scan of
    the day's partition counts, which the catalog usually already has
    (`maintenance_cbo_stats`)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    day_lane = F.conv(
        F.substring(F.md5(F.concat(F.lit("vol:"), day.cast("string"))), 1, 8), 16, 10
    ).cast("bigint")
    row_lane = F.conv(
        F.substring(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":volrow"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    filtered = ev.filter((day_lane >= 100_000_000) | (row_lane % 10 < 1)).select(
        day.alias("day")
    )
    daily = filtered.groupBy("day").agg(F.count("*").alias("c"))
    tot = daily.agg(
        F.count("*").alias("d"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    dev = F.col("c") * F.col("d") - F.col("s")
    return (
        daily.crossJoin(F.broadcast(tot))
        .filter(dev * dev > 9 * (F.col("d") * F.col("sq") - F.col("s") * F.col("s")))
        .select(
            "day",
            F.col("c").cast("bigint").alias("n_rows"),
            (dev * dev).cast("bigint").alias("z2_num"),
            (F.col("d") * F.col("sq") - F.col("s") * F.col("s"))
            .cast("bigint")
            .alias("z2_den"),
        )
    )


@query(
    "quality_functional_dependency_audit",
    oracle="""
    WITH fd1 AS (
      SELECT 'l_orderkey->l_returnflag' AS fd,
             COUNT(*) AS n_keys,
             CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_keys,
             CAST(MAX(k) AS BIGINT) AS max_variants
      FROM (SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS k
            FROM lineitem GROUP BY 1)
    ), fd2 AS (
      SELECT 'l_partkey->l_suppkey' AS fd,
             COUNT(*) AS n_keys,
             CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(MAX(k) AS BIGINT)
      FROM (SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS k
            FROM lineitem GROUP BY 1)
    ), fd3 AS (
      SELECT 'o_custkey->o_orderpriority' AS fd,
             COUNT(*) AS n_keys,
             CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(MAX(k) AS BIGINT)
      FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS k
            FROM orders GROUP BY 1)
    ), fd4 AS (
      SELECT 'o_orderkey->o_orderdate' AS fd,
             COUNT(*) AS n_keys,
             CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(MAX(k) AS BIGINT)
      FROM (SELECT o_orderkey, COUNT(DISTINCT o_orderdate) AS k
            FROM orders GROUP BY 1)
    )
    SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
    UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4
    ORDER BY fd
    """,
)
def q_quality_functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery audit: for candidate FDs X -> Y,
    count determinant keys whose Y-set has more than one member — the
    profiling primitive behind schema inference, normalization advice,
    and "is this column derivable?" questions (the reference's star
    schema silently ASSUMES user_id -> user_name holds; this measures
    such assumptions instead). Four planted candidates span the
    spectrum: a true key FD (o_orderkey->o_orderdate, violations
    pinned 0 by uniqueness), a strongly-violated one
    (o_custkey->o_orderpriority — customers order at many priorities),
    and two line-level ones whose violation depends on the generator
    (partkey->suppkey multi-sourcing, orderkey->returnflag).

    All counts exact integers; ``max_variants`` bounds how badly the
    worst key violates. Scale: each FD is one hash aggregate at
    determinant grain followed by an O(1) rollup — FD profiling over a
    100 TB table costs one shuffle per candidate, trivially batched by
    sharing the determinant grouping where determinants coincide.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def audit(df: DataFrame, det: str, dep: str, name: str) -> DataFrame:
        per_key = df.groupBy(det).agg(F.countDistinct(dep).alias("k"))
        return per_key.agg(
            F.lit(name).alias("fd"),
            F.count("*").alias("n_keys"),
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_keys"),
            F.max("k").cast("bigint").alias("max_variants"),
        )
    lanes = [
        audit(l, "l_orderkey", "l_returnflag", "l_orderkey->l_returnflag"),
        audit(l, "l_partkey", "l_suppkey", "l_partkey->l_suppkey"),
        audit(o, "o_custkey", "o_orderpriority", "o_custkey->o_orderpriority"),
        audit(o, "o_orderkey", "o_orderdate", "o_orderkey->o_orderdate"),
    ]
    out = lanes[0]
    for lane in lanes[1:]:
        out = out.unionByName(lane)
    return out.orderBy("fd")
