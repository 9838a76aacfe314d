"""Sessionization (SURVEY §2.7 streaming-adjacent surface, batch form).

Spark's ``session_window`` merges events whose gaps are under the
timeout — identical semantics to the SQL gaps-and-islands construction,
which is what the DuckDB oracle runs. The streaming twin lives in
``streaming.incremental``; a stateful custom variant would use
``applyInPandasWithState``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table

GAP = "30 minutes"


@query(
    "events_sessionization",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM seq
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
    FROM isl
    GROUP BY user_id, sess_id
    """,
)
def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap sessions: count + value per session.

    ``session_window`` is a single shuffle on user_id with an in-partition
    sort — same cost envelope as the window-function formulation but
    expressed as one declarative operator Catalyst understands.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", GAP).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY event_type), 4) AS p
    FROM pairs
    """,
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the behavioral model
    behind next-action prediction and funnel-dropoff analysis. One
    shuffle by user for the lead() window, then an O(types²) aggregate;
    the transition matrix itself is tiny at any corpus size, so the
    normalizing window runs on O(types²) rows."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    seq_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "event_type", F.lead("event_type").over(seq_w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm_w = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(norm_w), 4).alias("p"),
    )


@query(
    "agg_entropy_per_group",
    oracle="""
    WITH counts AS (
      SELECT user_id % 10 AS cohort, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id % 10, event_type
    ), probs AS (
      SELECT cohort, n, n * 1.0 / SUM(n) OVER (PARTITION BY cohort) AS p
      FROM counts
    )
    SELECT cohort,
           CAST(SUM(n) AS BIGINT) AS n_events,
           ROUND(-SUM(p * LN(p)) / LN(2), 4) AS entropy_bits
    FROM probs
    GROUP BY cohort
    """,
)
def q_agg_entropy_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type mix per user cohort — the
    diversity/imbalance gauge for behavioral segments (low entropy =
    single-action bots). Two O(cohorts × types) aggregates after one
    data-sized groupBy; entropy math happens on the tiny count relation."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    counts = (
        events.withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("cohort")
    p = F.col("n") / F.sum("n").over(w)
    return (
        counts.select("cohort", "n", (-p * F.log(p)).alias("term"))
        .groupBy("cohort")
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("term") / F.log(F.lit(2.0)), 4).alias("entropy_bits"),
        )
    )


@query(
    "events_pattern_regex",
    oracle="""
    WITH coded AS (
      SELECT user_id,
             CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                  WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                  WHEN 'error' THEN 'e' ELSE 'x' END AS code,
             ts, event_id
      FROM events
    ), journeys AS (
      SELECT user_id, string_agg(code, '' ORDER BY ts, event_id) AS journey
      FROM coded GROUP BY user_id
    )
    SELECT user_id,
           length(journey) AS journey_len,
           CAST(len(regexp_extract_all(journey, 'v[vc]*p')) AS INT)
             AS n_funnel_matches,
           len(regexp_extract_all(journey, 'v[vc]*p')) > 0 AS converted
    FROM journeys
    """,
)
def q_events_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over event journeys — the
    MATCH_RECOGNIZE shape expressed as regex over an ordered
    per-user event string: encode each event as one character, fold
    each user's timeline into a journey string (deterministic
    (ts, event_id) order via array_sort over structs), then count
    non-overlapping matches of the funnel pattern ``v[vc]*p`` (a view
    leading through views/clicks to a purchase). The pattern grammar
    is restricted to the Java-regex ∩ RE2 subset (character classes,
    greedy closures — where leftmost-greedy and leftmost-longest agree)
    so Spark and DuckDB count identical matches, the same discipline
    as the PII scrub patterns.

    Plan: one groupBy(user) aggregate builds journeys (collect_list of
    structs + array_sort + transform + array_join — all JVM-side), one
    projection runs the regex. Per-user state is the user's OWN event
    count — the scale bound is max-events-per-user, not corpus size,
    and a pathological hot user would hit the same salting escape as
    any hot key."""
    ev = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "error", "e")
        .otherwise("x")
    )
    journeys = (
        ev.select("user_id", F.struct("ts", "event_id", code.alias("code")).alias("s"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda x: x["code"]),
                "",
            ).alias("journey")
        )
    )
    n_matches = F.regexp_count(F.col("journey"), F.lit(r"v[vc]*p"))
    return journeys.select(
        "user_id",
        F.length("journey").alias("journey_len"),
        n_matches.cast("int").alias("n_funnel_matches"),
        (n_matches > 0).alias("converted"),
    )
