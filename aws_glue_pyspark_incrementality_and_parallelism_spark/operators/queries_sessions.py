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
