"""PII detection / redaction — the scrub pass every training-data
pipeline runs before text leaves the ingest zone.

Patterns are deliberately restricted to the Java-regex ∩ RE2 common
subset (character classes, bounded repeats, no backrefs) so the Spark
plan and the DuckDB oracle compile the *same* automaton semantics.

Scale shape: both queries are a single map-side projection
(``regexp_extract_all`` / ``regexp_replace`` inside whole-stage
codegen) followed by one hash aggregation on a low-cardinality key —
no joins, no windows; at 100 TB the cost is exactly one scan, and the
agg combines map-side before the (tiny) shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table

#: Email-shaped token (common-subset regex; no \b to keep RE2/Java parity).
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: Run of digits — catches ids, phone fragments, numeric literals.
DIGIT_PAT = r"[0-9]+"
#: Phone-like long digit run (7+), the usual redaction threshold.
LONG_DIGIT_PAT = r"[0-9]{7,}"
#: Dotted-quad IPv4 literal.
IPV4_PAT = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


@query(
    "events_pii_scrub",
    oracle=f"""
    WITH scrub AS (
      SELECT event_type,
             len(regexp_extract_all(props, '{DIGIT_PAT}')) AS n_digit_runs,
             len(regexp_extract_all(props, '{EMAIL_PAT}')) AS n_emails,
             regexp_replace(props, '{DIGIT_PAT}', '[NUM]', 'g') AS redacted
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(n_digit_runs) AS BIGINT) AS total_digit_runs,
           CAST(SUM(CASE WHEN n_digit_runs > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rows_with_digits,
           CAST(SUM(n_emails) AS BIGINT) AS total_emails,
           CAST(COUNT(DISTINCT redacted) AS BIGINT) AS n_distinct_redacted
    FROM scrub
    GROUP BY event_type
    """,
)
def q_events_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub pass over the semi-structured ``events.props`` payload:
    count digit-run and email-shaped matches per record, redact digit
    runs to ``[NUM]``, and report per-event-type totals plus the
    distinct-redacted-template count (how many payload *shapes* survive
    redaction — the dedup-after-scrub cardinality).

    Reference parity: the reference ships raw RDS rows to Redshift with
    no scrub step (glue_rds_to_redshift.py:44-74); this is the hygiene
    operator a real pipeline inserts before that sink."""
    ev = load_table(spark, sf_dir, "events")
    scrub = ev.select(
        "event_type",
        F.size(F.regexp_extract_all(F.col("props"), F.lit(DIGIT_PAT), 0)).alias("n_digit_runs"),
        F.size(F.regexp_extract_all(F.col("props"), F.lit(EMAIL_PAT), 0)).alias("n_emails"),
        F.regexp_replace("props", DIGIT_PAT, "[NUM]").alias("redacted"),
    )
    return scrub.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("n_digit_runs").alias("total_digit_runs"),
        F.sum(F.when(F.col("n_digit_runs") > 0, 1).otherwise(0)).alias("n_rows_with_digits"),
        F.sum("n_emails").alias("total_emails"),
        F.countDistinct("redacted").alias("n_distinct_redacted"),
    )


@query(
    "docs_pii_clean_ratio",
    oracle=f"""
    WITH flags AS (
      SELECT source,
             CASE WHEN regexp_matches(text, '{EMAIL_PAT}')
                    OR regexp_matches(text, '{LONG_DIGIT_PAT}')
                    OR regexp_matches(text, '{IPV4_PAT}')
                  THEN 1 ELSE 0 END AS flagged
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(flagged) AS BIGINT) AS n_flagged,
           CAST(1.0 - SUM(flagged) * 1.0 / COUNT(*) AS DOUBLE) AS clean_ratio
    FROM flags
    GROUP BY source
    """,
)
def q_docs_pii_clean_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure report over the corpus: fraction of
    documents free of email / long-digit / IPv4 matches — the release
    gate metric for a corpus snapshot. (The synthetic corpus is clean,
    so the expected ratio is 1.0; the operator itself — three-pattern
    flagging plus per-source rollup — is what's under test.)"""
    docs = load_table(spark, sf_dir, "documents")
    flagged = (
        F.col("text").rlike(EMAIL_PAT)
        | F.col("text").rlike(LONG_DIGIT_PAT)
        | F.col("text").rlike(IPV4_PAT)
    )
    flags = docs.select("source", F.when(flagged, 1).otherwise(0).alias("flagged"))
    return flags.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("flagged").alias("n_flagged"),
        (F.lit(1.0) - F.sum("flagged") / F.count("*")).alias("clean_ratio"),
    )
