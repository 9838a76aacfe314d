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
from ..session import pin
from ..sources.io import load_table

GAP = "30 minutes"


@query(
    "events_sessionization",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       -- strictly > : an event EXACTLY gap after its
                       -- predecessor still merges (session_window joins
                       -- windows whose start equals the previous end;
                       -- pinned by test_session_window_exact_gap_boundary)
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
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


@query(
    "events_survival_nelson_aalen",
    oracle="""
    WITH bounds AS (
        SELECT MAX(ts) AS t_end FROM events
    ), users AS (
        SELECT user_id,
               MIN(ts) AS t0,
               MIN(CASE WHEN event_type = 'error' THEN ts END) AS t_fail
        FROM events GROUP BY user_id
    ), spans AS (
        SELECT user_id,
               datediff('day', CAST(t0 AS DATE),
                        CAST(COALESCE(t_fail, (SELECT t_end FROM bounds)) AS DATE))
                   AS duration,
               CASE WHEN t_fail IS NOT NULL THEN 1 ELSE 0 END AS observed
        FROM users
    ), per_day AS (
        SELECT duration, COUNT(*) AS n_here, SUM(observed) AS d_events
        FROM spans GROUP BY duration
    ), risk AS (
        SELECT duration, d_events,
               SUM(n_here) OVER (ORDER BY duration DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS n_at_risk
        FROM per_day
    ), hazard AS (
        SELECT duration, CAST(d_events AS BIGINT) AS d_events, n_at_risk,
               CAST(d_events * 1000000 // n_at_risk AS BIGINT) AS hazard_micro
        FROM risk WHERE d_events > 0
    )
    SELECT duration AS day, d_events, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           hazard_micro,
           CAST(SUM(hazard_micro) OVER (ORDER BY duration
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_hazard_micro
    FROM hazard
    ORDER BY day
    """,
)
def q_events_survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator for time-to-first-error
    per user (right-censored at the corpus end) — the survival-analysis
    primitive behind churn/retention modeling, computed as pure
    DataFrame algebra.

    Every engine-crossing number is an exact integer: durations in
    days, risk sets from a reverse-cumulative count, per-day hazards as
    integer-div micro-units, and the cumulative hazard as an integer
    running sum of those terms (Kaplan–Meier's product form would need
    a float fold; Nelson–Aalen's sum form quantizes term-by-term —
    same trick as the CUSUM operator).

    Scale shape: one per-user aggregate collapses the fact table; the
    life-table (per-duration) relation is O(distinct durations) — the
    windows run on that tiny series. The censoring bound is a 1-row
    broadcast aggregate.
    """
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(F.max("ts").alias("t_end"))
    users = events.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).alias("t_fail"),
    )
    spans = users.crossJoin(F.broadcast(bounds)).select(
        F.datediff(
            F.coalesce(F.col("t_fail"), F.col("t_end")).cast("date"),
            F.col("t0").cast("date"),
        ).alias("duration"),
        F.when(F.col("t_fail").isNotNull(), 1).otherwise(0).alias("observed"),
    )
    per_day = spans.groupBy("duration").agg(
        F.count("*").alias("n_here"), F.sum("observed").alias("d_events")
    )
    w_desc = Window.orderBy(F.desc("duration")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_day.select(
        "duration",
        "d_events",
        F.sum("n_here").over(w_desc).alias("n_at_risk"),
    ).filter(F.col("d_events") > 0)
    hazard = risk.select(
        "duration",
        F.col("d_events").cast("bigint").alias("d_events"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.expr("(d_events * 1000000) div n_at_risk").cast("bigint").alias("hazard_micro"),
    )
    w_asc = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    return hazard.select(
        F.col("duration").alias("day"),
        "d_events",
        "n_at_risk",
        "hazard_micro",
        F.sum("hazard_micro").over(w_asc).cast("bigint").alias("cum_hazard_micro"),
    ).orderBy("day")


@query(
    "events_bot_burst_detect",
    oracle="""
    WITH buckets AS (
        SELECT user_id,
               epoch_us(ts) // 300000000 AS bucket5m,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), peaks AS (
        SELECT user_id, MAX(n) AS peak_5min,
               CAST(SUM(n) AS BIGINT) AS total_events,
               COUNT(*) AS active_buckets
        FROM buckets GROUP BY user_id
    )
    SELECT user_id, peak_5min, total_events, active_buckets,
           peak_5min >= 8 AS flagged_bot
    FROM peaks
    ORDER BY user_id
    """,
)
def q_events_bot_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst-rate bot heuristic: the peak 5-minute event count per user
    (exact integer microsecond bucketing — the unix_micros rule, never
    a float timestamp cast), flagged against a fixed rate threshold.

    The abuse-filtering primitive of traffic pipelines. Two stacked
    hash aggregates — (user, bucket) then user — both partial-agg
    friendly; no windows, no joins, cardinality bounded by active
    user-buckets. At 100 TB the first aggregate is the only fact-scan
    pass and the threshold becomes a per-surface config.
    """
    events = load_table(spark, sf_dir, "events")
    buckets = events.groupBy(
        "user_id",
        (F.unix_micros(F.col("ts")) / 300000000).cast("bigint").alias("bucket5m"),
    ).agg(F.count("*").alias("n"))
    return (
        buckets.groupBy("user_id")
        .agg(
            F.max("n").alias("peak_5min"),
            F.sum("n").cast("bigint").alias("total_events"),
            F.count("*").alias("active_buckets"),
        )
        .select(
            "user_id",
            "peak_5min",
            "total_events",
            "active_buckets",
            (F.col("peak_5min") >= 8).alias("flagged_bot"),
        )
        .orderBy("user_id")
    )


@query(
    "events_max_concurrent_sessions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), marks AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                    THEN 1 ELSE 0 END AS is_start
        FROM ordered
    ), sess AS (
        SELECT user_id, session_seq,
               MIN(ts) AS t_start, MAX(ts) AS t_end
        FROM (
            SELECT user_id, ts,
                   SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM marks
        )
        GROUP BY user_id, session_seq
    ), deltas AS (
        SELECT epoch_us(t_start) AS at_us, 1 AS delta FROM sess
        UNION ALL
        SELECT epoch_us(t_end) + 1, -1 FROM sess
    ), sweep AS (
        SELECT at_us,
               SUM(delta) OVER (ORDER BY at_us, delta
                                ROWS UNBOUNDED PRECEDING) AS concurrent
        FROM deltas
    )
    SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
           CAST(MAX(concurrent) AS BIGINT) AS max_concurrent
    FROM sweep
    """,
)
def q_events_max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency over user sessions (30-min inactivity gap): the
    +1/−1 boundary-sweep algorithm — explode each session into a start
    (+1) and end (−1) delta, order the deltas, and the running sum's
    maximum IS the peak number of simultaneously-open sessions.

    Exactness: boundaries compare in integer microseconds; ends sort
    at ``t_end + 1 µs`` with delta as the tie-break (ends before
    starts at the same instant), so both engines walk the identical
    sweep. Scale shape (round-4 rewrite of the round-3 `weak` shape):
    sessionization is the standard per-user gap window; the sweep runs
    on the COLLAPSED session-boundary relation (2 rows per session) —
    still data-proportional at 100 TB, so the running sum is computed
    DISTRIBUTED via ``distrank.distributed_sweep``: time-range bins,
    per-bin parallel cumsums, O(bins) broadcast bin-total offsets. Tie
    order is preserved exactly (bins split on at_us alone; within-bin
    order is (at_us, delta)), so the oracle's single-window statement
    of intent still matches bit-for-bit.
    """
    from pyspark.sql.window import Window

    from .distrank import distributed_sweep

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = events.withColumn("prev_ts", F.lag("ts").over(w_user)).withColumn(
        "is_start",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts")) > 1800000000),
            1,
        ).otherwise(0),
    )
    w_cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = (
        marks.withColumn("session_seq", F.sum("is_start").over(w_cum))
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("t_start"), F.max("ts").alias("t_end"))
        .transform(pin)
    )
    span = sess.agg(
        F.min(F.unix_micros("t_start")).alias("lo"),
        (F.max(F.unix_micros("t_end")) + 1).alias("hi"),
    ).collect()[0]
    deltas = sess.select(
        F.unix_micros("t_start").alias("at_us"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(
            (F.unix_micros("t_end") + 1).alias("at_us"), F.lit(-1).alias("delta")
        )
    )
    sweep = distributed_sweep(deltas, lo=span["lo"], hi=span["hi"])
    return sess.agg(F.count("*").cast("bigint").alias("n_sessions")).crossJoin(
        sweep.agg(F.max("concurrent").cast("bigint").alias("max_concurrent"))
    )


@query(
    "events_attribution_multitouch",
    oracle="""
    WITH conv AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS conv_us
        FROM events WHERE event_type = 'purchase'
    ), touch AS (
        SELECT user_id, event_id AS touch_id, event_type, epoch_us(ts) AS touch_us
        FROM events WHERE event_type IN ('click', 'view')
    ), assigned AS (
        SELECT c.conv_id, t.event_type,
               COUNT(*) OVER (PARTITION BY c.conv_id) AS n_touches
        FROM conv c JOIN touch t
          ON c.user_id = t.user_id
         AND t.touch_us < c.conv_us
         AND t.touch_us >= c.conv_us - 604800000000
    )
    SELECT event_type,
           COUNT(*) AS n_touchpoints,
           COUNT(DISTINCT conv_id) AS n_conversions_touched,
           CAST(SUM(1000000 // n_touches) AS BIGINT) AS credit_micro
    FROM assigned
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_events_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click/view in the 7 days
    before a purchase shares that conversion's credit equally; credit
    totals per channel come out in exact integer micro-units
    (1e6 div n_touches — both engines integer-divide, so the tiny
    rounding loss is identical and cross-checkable).

    Scale shape: the conversion⋈touch pairing is a per-user interval
    join — equi on user_id, range on the 7-day window — so the shuffle
    key is the user and the per-key pairing is bounded by per-user
    activity (the same keyed-interval shape as the as-of join and
    stream-stream attribution queries, here in batch form with an
    exact oracle). The per-conversion touch count is a window over the
    paired relation, then one small aggregate per channel.
    """
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    conv = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("conv_id"),
        F.unix_micros("ts").alias("conv_us"),
    )
    touch = events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        "event_type",
        F.unix_micros("ts").alias("touch_us"),
    )
    assigned = conv.join(
        touch,
        (F.col("c_user") == F.col("t_user"))
        & (F.col("touch_us") < F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - 604800000000),
    ).withColumn("n_touches", F.count("*").over(Window.partitionBy("conv_id")))
    return (
        assigned.groupBy("event_type")
        .agg(
            F.count("*").alias("n_touchpoints"),
            F.countDistinct("conv_id").alias("n_conversions_touched"),
            F.sum(F.expr("1000000 div n_touches")).cast("bigint").alias("credit_micro"),
        )
        .orderBy("event_type")
    )


@query(
    "events_dau_wau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    ), days AS (
        SELECT DISTINCT day FROM du
    ), wau AS (
        SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
        FROM days d JOIN du u
          ON u.day <= d.day AND u.day > d.day - 7
        GROUP BY d.day
    ), dau AS (
        SELECT day, COUNT(*) AS dau FROM du GROUP BY day
    )
    SELECT d.day, dau.dau, wau.wau,
           CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_micro
    FROM days d JOIN dau USING (day) JOIN wau ON wau.day = d.day
    ORDER BY d.day
    """,
)
def q_events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness (DAU÷WAU) per day — the
    product-analytics headline metrics, computed without a distinct-
    over-range window (which Spark cannot partial-aggregate).

    Rewrite: collapse to the DISTINCT (day, user) relation first —
    THE standard trick; everything after runs on |days|×|actives|,
    never raw events — then each active (day, user) EXPLODES into the
    constant 7 report-days it covers and equi-joins the observed-day
    relation: a hash join with fixed fan-out, where the naive range
    predicate would plan a BroadcastNestedLoopJoin.
    Stickiness crosses engines in exact integer micro-units. At 100 TB
    the (day,user) relation is the persisted daily-actives table every
    metrics stack materializes; the range join's fan-out is a constant
    (the window length), so cost stays linear in actives.
    """
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    covered = du.select(
        "user_id",
        F.explode(
            F.expr("transform(sequence(0, 6), i -> date_add(day, i))")
        ).alias("day"),
    )
    wau = (
        covered.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(dau * 1000000) div wau").cast("bigint").alias("stickiness_micro"),
        )
        .orderBy("day")
    )


@query(
    "incremental_session_stitch",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    ), per_sess AS (
      SELECT user_id, sid, COUNT(*) AS n FROM sess GROUP BY user_id, sid
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(MAX(n) AS BIGINT) AS longest_session_events,
           CAST(SUM(n) AS BIGINT) AS total_events
    FROM per_sess
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_incremental_session_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sessionization — the stateful-window form of the
    reference's bookmark pattern: sessions computed over the history
    batch (events ≤ HWM at 70% of the timespan) are STITCHED with the
    delta batch's sessions instead of recomputed, and the merged state
    must equal global sessionization exactly (the oracle recomputes
    from scratch).

    Correctness algebra: a 30-min-gap session boundary can only cross
    the HWM between one user's LAST history event and FIRST delta
    event, so the stitch rule is local — merge each user's last
    history session into its first delta session iff that single gap
    is ≤ 30 min; every other session is untouched. This is what
    applyInPandasWithState's per-key state does in streaming, here as
    pure batch algebra with O(users) carried state (exactly the
    incremental_agg_merge contract, lifted to a gap-windowed
    aggregate).

    Scale: each phase is one keyed window over its own batch; the
    stitch is a per-user join of two O(users) session-boundary
    relations — the delta never re-reads history events, which is the
    point of incrementality at 100 TB.
    """
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    bounds = events.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).select(
        (F.col("lo") + F.expr("(hi - lo) * 7 div 10")).alias("hwm_us")
    )
    ev = events.crossJoin(F.broadcast(bounds)).withColumn(
        "us", F.unix_micros("ts")
    )
    GAP = 1800000000

    def sessionize(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("us", "event_id")
        marks = df.withColumn("prev_us", F.lag("us").over(w)).withColumn(
            "is_start",
            F.when(
                F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > GAP), 1
            ).otherwise(0),
        )
        wc = w.rowsBetween(Window.unboundedPreceding, 0)
        return (
            marks.withColumn("sid", F.sum("is_start").over(wc))
            .groupBy("user_id", "sid")
            .agg(
                F.count("*").alias("n"),
                F.min("us").alias("s_start"),
                F.max("us").alias("s_end"),
            )
        )

    hist = sessionize(ev.filter(F.col("us") <= F.col("hwm_us")))
    delta = sessionize(ev.filter(F.col("us") > F.col("hwm_us")))

    # per-user boundary state: history's LAST session, delta's FIRST
    wh = Window.partitionBy("user_id")
    h_last = hist.withColumn("mx", F.max("sid").over(wh)).filter(
        F.col("sid") == F.col("mx")
    ).select("user_id", F.col("n").alias("h_n"), F.col("s_end").alias("h_end"))
    d_first = delta.withColumn("mn", F.min("sid").over(wh)).filter(
        F.col("sid") == F.col("mn")
    ).select("user_id", F.col("n").alias("d_n"), F.col("s_start").alias("d_start"))
    stitch = h_last.join(d_first, "user_id", "full").select(
        "user_id",
        (
            F.col("h_end").isNotNull()
            & F.col("d_start").isNotNull()
            & (F.col("d_start") - F.col("h_end") <= GAP)
        ).alias("merged"),
        (F.coalesce(F.col("h_n"), F.lit(0)) + F.coalesce(F.col("d_n"), F.lit(0))).alias(
            "merged_n"
        ),
    )

    # assemble per-user session-size multisets: all non-boundary
    # sessions + either the merged boundary session or the two
    # unmerged ones
    h_rest = hist.withColumn("mx", F.max("sid").over(wh)).filter(
        F.col("sid") != F.col("mx")
    ).select("user_id", "n")
    d_rest = delta.withColumn("mn", F.min("sid").over(wh)).filter(
        F.col("sid") != F.col("mn")
    ).select("user_id", "n")
    boundary = (
        stitch.join(h_last, "user_id", "left")
        .join(d_first, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("merged"), F.array(F.col("merged_n")))
            .otherwise(
                F.array_compact(
                    F.array(F.col("h_n").cast("long"), F.col("d_n").cast("long"))
                )
            )
            .alias("ns"),
        )
        .select("user_id", F.explode("ns").alias("n"))
    )
    all_sessions = h_rest.unionByName(d_rest).unionByName(boundary)
    return (
        all_sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n").cast("bigint").alias("longest_session_events"),
            F.sum("n").cast("bigint").alias("total_events"),
        )
        .orderBy("user_id")
    )


@query(
    "events_bounce_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    ), per_sess AS (
      SELECT user_id, sid, COUNT(*) AS n FROM sess GROUP BY user_id, sid
    )
    SELECT COUNT(*) AS n_sessions,
           COUNT(*) FILTER (WHERE n = 1) AS n_bounces,
           CAST(COUNT(*) FILTER (WHERE n = 1) * 1000000 // COUNT(*) AS BIGINT)
               AS bounce_rate_micro,
           CAST(MAX(n) AS BIGINT) AS longest_session
    FROM per_sess
    """,
)
def q_events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate over 30-minute-gap sessions: the fraction of
    sessions containing exactly one event — the engagement headline
    next to DAU/stickiness, computed off the same sessionization
    relation the other session operators share.

    One keyed gap window → per-session counts → a 1-row aggregate;
    the rate crosses engines in exact micro-units.
    """
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = events.withColumn("prev", F.lag("ts").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev") > 1800000000),
            1,
        ).otherwise(0),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    per_sess = (
        marks.withColumn("sid", F.sum("new_sess").over(wc))
        .groupBy("user_id", "sid")
        .agg(F.count("*").alias("n"))
    )
    return per_sess.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("n_bounces"),
        F.expr(
            "CAST((SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000)"
            " div COUNT(*) AS BIGINT)"
        ).alias("bounce_rate_micro"),
        F.max("n").cast("bigint").alias("longest_session"),
    )


@query(
    "events_session_window_builtin",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM s
    GROUP BY user_id, sid
    """,
)
def q_events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL surface of Spark's native ``session_window``: where
    ``events_sessionization`` exposes only session starts, this emits
    the end timestamp too — the column whose semantics are easy to get
    wrong (end = last event ts + gap, NOT the last event ts) and the
    one a downstream TTL/expiry job actually consumes. The form
    transfers verbatim to Structured Streaming (where the lag/cumsum
    rewrite of the oracle is impossible and ``session_window`` is the
    only native sessionizer).

    Semantics pinned by the oracle: a session's END is ``last event ts
    + gap`` (not the last ts), and an event landing EXACTLY ``gap``
    after its predecessor still merges (Spark merges windows whose
    start equals the previous end, so the oracle's break condition is
    strictly ``diff > gap``) — both verified against a hand-built
    boundary fixture in tests/test_sessions_ops.py.

    Plan: one shuffle on user_id, then session assembly inside the
    aggregate — no self-join, no window-function pass; at 100 TB this
    is the cheapest sessionizer Spark offers (and AQE coalesces the
    per-user partitions). Money quantized to exact cents pre-sum."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "value_cents",
        )
    )


@query(
    "events_decay_weighted_score",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    aged AS (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             (epoch_us((SELECT m FROM mx)) - epoch_us(ts)) // 604800000000 AS age_wk
      FROM events
    )
    SELECT user_id,
           CAST(SUM(cents * (CAST(1 AS BIGINT) << CAST(4 - LEAST(age_wk, 4) AS INTEGER)))
                AS BIGINT) AS score_sixteenths,
           COUNT(*) AS n_events
    FROM aged
    GROUP BY user_id
    """,
)
def q_events_decay_weighted_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement scoring — the recency-weighted ranking
    primitive behind feeds and churn models: each event's value decays
    by half per week of age, summed per user. The decay weights are
    EXACT dyadic rationals (2^-age_weeks, age capped at 4 over the
    30-day corpus), carried as integer SIXTEENTHS — cents·2^(4−age) —
    so the whole computation is int64 with zero float rounding to
    diverge between engines (the usual exp(-λ·age) formulation is a
    cross-engine float hazard the quantization rules exist to avoid).

    Plan: one O(1) max-timestamp scalar (the bookmark pattern), then a
    stateless weight projection + one hash aggregate on user_id — the
    same cost envelope as a plain per-user sum at any scale."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    aged = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        (
            (F.unix_micros(F.col("m")) - F.unix_micros(F.col("ts")))
            / F.lit(604_800_000_000)
        )
        .cast("bigint")
        .alias("age_wk"),
    )
    weight = F.expr("shiftleft(cast(1 as bigint), cast(4 - least(age_wk, 4) as int))")
    return aged.groupBy("user_id").agg(
        F.sum(F.col("cents") * weight).alias("score_sixteenths"),
        F.count("*").alias("n_events"),
    )


@query(
    "events_markov_stationary_power",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ), trans AS MATERIALIZED (
      SELECT event_type AS src, next_type AS dst, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), rowtot AS MATERIALIZED (
      SELECT src, CAST(SUM(c) AS BIGINT) AS r FROM trans GROUP BY 1
    ), v0 AS MATERIALIZED (
      SELECT src AS state, CAST(1000000 AS BIGINT) AS vq FROM rowtot
    ), v1 AS MATERIALIZED (
      SELECT t.dst AS state, CAST(SUM((v.vq * t.c) // rt.r) AS BIGINT) AS vq
      FROM v0 v JOIN trans t ON t.src = v.state
      JOIN rowtot rt ON rt.src = v.state
      GROUP BY 1
    ), v2 AS MATERIALIZED (
      SELECT t.dst AS state, CAST(SUM((v.vq * t.c) // rt.r) AS BIGINT) AS vq
      FROM v1 v JOIN trans t ON t.src = v.state
      JOIN rowtot rt ON rt.src = v.state
      GROUP BY 1
    ), v3 AS MATERIALIZED (
      SELECT t.dst AS state, CAST(SUM((v.vq * t.c) // rt.r) AS BIGINT) AS vq
      FROM v2 v JOIN trans t ON t.src = v.state
      JOIN rowtot rt ON rt.src = v.state
      GROUP BY 1
    )
    SELECT v3.state AS event_type, v3.vq AS stationary_micro,
           v3.vq - v0.vq AS drift_from_uniform_micro
    FROM v3 JOIN v0 ON v3.state = v0.state
    ORDER BY 1
    """,
)
def q_events_markov_stationary_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain
    by POWER ITERATION — three v <- vP passes from the uniform vector,
    the matrix-algebra-as-relational-algebra shape (each pass is one
    join of the state vector against the transition relation plus a
    keyed sum; PageRank is this same loop with teleport).

    Exactness without rational blow-up: multiplying exact fractions
    c_ij/r_i compounds denominators past any fixed-width type in two
    passes, so each term quantizes FIRST — (vq * c) div r in pure
    integers (the blessed div/// pairing), summed per destination state
    — and the oracle unrolls the identical three passes as chained
    MATERIALIZED CTEs (the BPE/MMR technique). Micro-unit state mass is
    conserved to within 5 ulps/pass by construction, and the drift
    column exposes how far the chain's stationary mass sits from
    uniform — nonzero at every SF (the event generator is not
    symmetric in transitions).

    Scale: the fact-grain work is the ONE lead() window per user that
    [[events_markov_transitions]] already pays; all three iterations
    run on the O(types^2) transition relation.
    """
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    seq_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(seq_w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("c"))
        .transform(pin)
    )
    rowtot = trans.groupBy("src").agg(F.sum("c").cast("bigint").alias("r"))
    tr = trans.join(rowtot, "src").transform(pin)

    v0 = rowtot.select(F.col("src").alias("state"), F.lit(1000000).cast("bigint").alias("vq"))
    # r10 (guide §1.2): the three vP passes run UNROLLED in one job — no
    # per-iteration localCheckpoint. The pagerank cadence negative does
    # not transfer here: v and tr are O(event-types) relations (a few
    # rows) on top of the pinned `tr`, so the unrolled tree is three
    # broadcast joins deep and plans in milliseconds, while each pin was
    # a full job submission. A/B at sf0.1: 2.97-6.9 s -> 1.47-2.0 s
    # (min-of-4 each, same session conditions).
    v = v0
    for _ in range(3):
        v = (
            tr.join(v, tr.src == v.state)
            .select("dst", F.expr("(vq * c) div r").alias("t"))
            .groupBy(F.col("dst").alias("state_new"))
            .agg(F.sum("t").cast("bigint").alias("vq"))
            .select(F.col("state_new").alias("state"), "vq")
        )
    return (
        v.join(v0.select(F.col("state"), F.col("vq").alias("vq0")), "state")
        .select(
            F.col("state").alias("event_type"),
            F.col("vq").alias("stationary_micro"),
            (F.col("vq") - F.col("vq0")).alias("drift_from_uniform_micro"),
        )
        .orderBy("event_type")
    )


@query(
    "events_littles_law_audit",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), marks AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                    THEN 1 ELSE 0 END AS is_start
        FROM ordered
    ), sess AS MATERIALIZED (
        SELECT user_id, session_seq,
               epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) + 1 AS e_us
        FROM (
            SELECT user_id, ts,
                   SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM marks
        )
        GROUP BY user_id, session_seq
    ), direct AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(e_us - s_us) AS BIGINT) AS total_session_us,
               CAST(MIN(s_us) AS BIGINT) AS lo,
               CAST(MAX(e_us) AS BIGINT) AS hi
        FROM sess
    ), deltas AS (
        SELECT s_us AS at_us, 1 AS delta FROM sess
        UNION ALL SELECT e_us, -1 FROM sess
    ), sweep AS (
        SELECT at_us,
               SUM(delta) OVER (ORDER BY at_us, delta
                                ROWS UNBOUNDED PRECEDING) AS concurrent,
               LEAD(at_us) OVER (ORDER BY at_us, delta) AS next_us
        FROM deltas
    ), integ AS (
        SELECT CAST(SUM(concurrent * (next_us - at_us)) AS BIGINT) AS integral_us,
               CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent
        FROM sweep WHERE next_us IS NOT NULL
    )
    SELECT d.n_sessions, d.total_session_us, i.integral_us,
           i.integral_us = d.total_session_us AS identity_ok,
           i.peak_concurrent,
           CAST(CAST(i.integral_us AS HUGEINT) * 1000000
                // (d.hi - d.lo) AS BIGINT) AS l_avg_micro,
           CAST(i.integral_us // d.n_sessions AS BIGINT) AS w_mean_us,
           CAST(CAST(d.n_sessions AS HUGEINT) * 3600000000000
                // (d.hi - d.lo) AS BIGINT) AS lambda_per_hour_milli
    FROM direct d, integ i
    """,
)
def q_events_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law over user sessions, audited as an EXACT conservation
    identity: the time integral of concurrency (computed from the
    +1/−1 boundary sweep, concurrency x gap summed across sweep
    intervals) must equal the direct sum of session durations — two
    INDEPENDENT derivations of the same microsecond total, so
    ``identity_ok`` catches sweep bugs (lost boundaries, tie
    mis-ordering, off-by-one eviction) that each derivation alone
    would hide. From the conserved quantities the queueing triple
    derives in integer micro-units: L = integral/horizon,
    W = integral/n, lambda = n/horizon — L = lambda*W then holds by
    construction (their common numerator IS the identity), which is
    Little's law's content.

    Scale: same shape as [[events_max_concurrent_sessions]] — per-user
    gap sessionization, then everything runs on the collapsed 2-rows-
    per-session boundary relation, which is still data-proportional at
    100 TB; the running sum AND the global lead() both distribute via
    ``distrank.distributed_sweep`` (round-4 rewrite of the round-3
    `weak` shape: time-range bins + per-bin cumsum/lead + O(bins)
    broadcast offsets, cross-bin lead stitched from each successor
    bin's min timestamp). The HUGEINT/DECIMAL(38,0) carriers keep the
    rate arithmetic exact at any horizon.
    """
    from pyspark.sql.window import Window

    from .distrank import distributed_sweep

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = events.withColumn("prev_ts", F.lag("ts").over(w_user)).withColumn(
        "is_start",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
                > 1800000000
            ),
            1,
        ).otherwise(0),
    )
    w_cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = (
        marks.withColumn("session_seq", F.sum("is_start").over(w_cum))
        .groupBy("user_id", "session_seq")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            (F.unix_micros(F.max("ts")) + 1).alias("e_us"),
        )
        .transform(pin)
    )
    direct = sess.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum(F.col("e_us") - F.col("s_us")).cast("bigint").alias("total_session_us"),
        F.min("s_us").cast("bigint").alias("lo"),
        F.max("e_us").cast("bigint").alias("hi"),
    )
    span = sess.agg(
        F.min("s_us").alias("lo"), F.max("e_us").alias("hi")
    ).collect()[0]
    deltas = sess.select(F.col("s_us").alias("at_us"), F.lit(1).alias("delta")).unionByName(
        sess.select(F.col("e_us").alias("at_us"), F.lit(-1).alias("delta"))
    )
    sweep = distributed_sweep(
        deltas, lo=span["lo"], hi=span["hi"], with_next=True
    ).select("at_us", "concurrent", "next_us")
    integ = sweep.filter(F.col("next_us").isNotNull()).agg(
        F.sum(F.col("concurrent") * (F.col("next_us") - F.col("at_us")))
        .cast("bigint")
        .alias("integral_us"),
        F.max("concurrent").cast("bigint").alias("peak_concurrent"),
    )
    return (
        direct.crossJoin(F.broadcast(integ))
        .select(
            "n_sessions",
            "total_session_us",
            "integral_us",
            (F.col("integral_us") == F.col("total_session_us")).alias("identity_ok"),
            "peak_concurrent",
            F.expr(
                "CAST(CAST(integral_us AS DECIMAL(38,0)) * 1000000"
                " div (hi - lo) AS BIGINT)"
            ).alias("l_avg_micro"),
            F.expr("integral_us div n_sessions").alias("w_mean_us"),
            F.expr(
                "CAST(CAST(n_sessions AS DECIMAL(38,0)) * 3600000000000"
                " div (hi - lo) AS BIGINT)"
            ).alias("lambda_per_hour_milli"),
        )
    )


@query(
    "events_time_weighted_average",
    oracle="""
    WITH samples AS (
      SELECT event_type,
             CAST(ts AS DATE) AS day,
             epoch_us(ts) AS t_us,
             event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents
      FROM events
    ), stepped AS (
      SELECT event_type, day, v_cents,
             LEAD(t_us) OVER (PARTITION BY event_type, day
                              ORDER BY t_us, event_id) - t_us AS dt_us
      FROM samples
    )
    SELECT event_type, day,
           COUNT(*) AS n_intervals,
           CAST(SUM(dt_us) AS BIGINT) AS covered_us,
           CAST(CAST(SUM(CAST(v_cents AS HUGEINT) * dt_us) AS HUGEINT)
                // SUM(dt_us) AS BIGINT) AS twap_cents
    FROM stepped WHERE dt_us IS NOT NULL AND dt_us > 0
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_events_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) over IRREGULAR samples: each
    observation holds until the next one, so its weight is the gap to
    the successor — the correct mean for market data, gauge metrics and
    sensor streams, where the arithmetic mean over-counts bursts of
    rapid updates. Computed per (event_type, day); an observation's
    value is carried as exact cents and its weight as exact
    microseconds, the weighted sum rides DECIMAL(38,0)/HUGEINT (cents x
    us overflows int64 at month horizons), and the final division is
    the blessed integer div pairing — no float anywhere.

    Boundary semantics (documented, mirrored by the oracle): each day's
    LAST observation has no successor inside the partition and is
    dropped (the step function is integrated over [first, last) of each
    day); zero-length gaps (same-microsecond samples) carry zero weight
    and are excluded with dt > 0. ``covered_us`` exposes the integrated
    span so consumers can reason about coverage.

    Scale: one lead() window per (type, day) partition key — bounded
    partitions, co-located with the subsequent aggregate's key; one
    shuffle total.
    """
    from pyspark.sql.window import Window

    samples = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_cents"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("t_us", "event_id")
    stepped = samples.select(
        "event_type",
        "day",
        "v_cents",
        (F.lead("t_us").over(w) - F.col("t_us")).alias("dt_us"),
    )
    return (
        stepped.filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
        .groupBy("event_type", "day")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dt_us").cast("bigint").alias("covered_us"),
            F.expr(
                "CAST(SUM(CAST(v_cents AS DECIMAL(38,0)) * dt_us)"
                " div SUM(dt_us) AS BIGINT)"
            ).alias("twap_cents"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "events_attribution_time_decay",
    oracle="""
    WITH conv AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS conv_us
        FROM events WHERE event_type = 'purchase'
    ), touch AS (
        SELECT user_id, event_id AS touch_id, event_type, epoch_us(ts) AS touch_us
        FROM events WHERE event_type IN ('click', 'view')
    ), assigned AS (
        SELECT c.conv_id, t.touch_id, t.event_type,
               (1::BIGINT << CAST(6 - (c.conv_us - t.touch_us) // 86400000000
                                  AS INT)) AS w
        FROM conv c JOIN touch t
          ON c.user_id = t.user_id
         AND t.touch_us < c.conv_us
         AND t.touch_us >= c.conv_us - 604800000000
    ), quota AS (
        SELECT conv_id, touch_id, event_type, w,
               SUM(w) OVER (PARTITION BY conv_id) AS sumw
        FROM assigned
    ), based AS (
        SELECT *, (1000 * w) // sumw AS base, (1000 * w) % sumw AS rem,
               ROW_NUMBER() OVER (PARTITION BY conv_id
                                  ORDER BY (1000 * w) % sumw DESC, touch_id) AS rk,
               1000 - SUM((1000 * w) // sumw) OVER (PARTITION BY conv_id)
                 AS n_extra
        FROM quota
    ), credited AS (
        SELECT conv_id, event_type,
               base + CASE WHEN rk <= n_extra THEN 1 ELSE 0 END AS credit
        FROM based
    )
    SELECT event_type,
           COUNT(*) AS n_touchpoints,
           CAST(SUM(credit) AS BIGINT) AS credit_milli,
           (SELECT CAST(SUM(credit) AS BIGINT) FROM credited)
             = 1000 * (SELECT COUNT(DISTINCT conv_id) FROM credited)
             AS credit_conserved
    FROM credited GROUP BY 1 ORDER BY 1
    """,
)
def q_events_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAY attribution with CONSERVATION-EXACT integer credits:
    each touch in the 7 days before a purchase weighs 2^(6 - age_days)
    (yesterday's click counts 64x a week-old one — exact dyadic, no
    exp()), and every conversion's 1000 credit millis split
    proportionally via PER-CONVERSION largest-remainder apportionment —
    so the books balance exactly: sum(credits) == 1000 x conversions,
    adjudicated as ``credit_conserved`` and impossible under naive
    per-touch rounding. Completes the attribution family:
    [[events_attribution_multitouch]] splits equally and tolerates
    identical rounding loss; this one weights by recency and refuses
    any loss.

    Scale: the touch-conversion interval join is user-keyed and
    time-bounded (the multitouch shape); the apportionment windows
    partition BY CONVERSION — bounded groups, co-located with the join
    output, never a global ordering.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.unix_micros("ts").alias("conv_us"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        "event_type",
        F.unix_micros("ts").alias("touch_us"),
    )
    # both relations descend from the same scan — alias explicitly so
    # the user_id equality binds left-to-right, not trivially-true
    assigned = conv.alias("c").join(
        touch.alias("t"),
        (F.col("c.user_id") == F.col("t.user_id"))
        & (F.col("t.touch_us") < F.col("c.conv_us"))
        & (F.col("t.touch_us") >= F.col("c.conv_us") - 604800000000),
    ).select(
        "conv_id",
        "touch_id",
        "event_type",
        F.expr(
            "shiftleft(CAST(1 AS BIGINT),"
            " CAST(6 - (conv_us - touch_us) div 86400000000 AS INT))"
        ).alias("w"),
    )
    w_conv = Window.partitionBy("conv_id")
    quota = assigned.withColumn("sumw", F.sum("w").over(w_conv)).select(
        "conv_id",
        "touch_id",
        "event_type",
        F.expr("(1000 * w) div sumw").alias("base"),
        ((F.lit(1000) * F.col("w")) % F.col("sumw")).alias("rem"),
    )
    based = quota.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("conv_id").orderBy(F.desc("rem"), F.asc("touch_id"))
        ),
    ).withColumn("n_extra", F.lit(1000) - F.sum("base").over(w_conv))
    credited = based.select(
        "conv_id",
        "event_type",
        (F.col("base") + F.when(F.col("rk") <= F.col("n_extra"), 1).otherwise(0)).alias(
            "credit"
        ),
    ).transform(pin)
    conserved = credited.agg(
        (
            F.sum("credit") == F.lit(1000) * F.countDistinct("conv_id")
        ).alias("credit_conserved")
    )
    return (
        credited.groupBy("event_type")
        .agg(
            F.count("*").alias("n_touchpoints"),
            F.sum("credit").cast("bigint").alias("credit_milli"),
        )
        .crossJoin(F.broadcast(conserved))
        .orderBy("event_type")
    )
