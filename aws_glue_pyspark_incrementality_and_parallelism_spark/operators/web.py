"""Web-corpus URL normalization.

Crawl pipelines (Common-Crawl-scale corpus builds) dedup and join on
the *canonical* URL: the raw strings producers emit differ in scheme /
host case, default ports, trailing slashes, tracking parameters
(``utm_*``, ``ref``), parameter order, and fragments — none of which
change the fetched resource.  ``text_url_canonicalize`` plants every
one of those variations deterministically (event_id stripes), runs a
pure-codegen canonicalizer (regex component extraction + higher-order
array ops for the query string), and adjudicates BYTE-EXACT output via
an order-independent md5-lane checksum over the distinct canonical
URLs, plus the raw→canonical collapse census.

Scale: canonicalization is a stateless per-row projection (no shuffle,
whole-stage codegen end-to-end); the dedup census is one groupBy on
the canonical key — the same shuffle the downstream crawl dedup pays
anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table

#: Messy-URL construction, shared verbatim (modulo dialect) by both
#: engines: every stripe is a real-world variation the canonicalizer
#: must erase.  Spark-side uses the SQL-expression dialect below via
#: ``F.expr``; the oracle mirrors it with VARCHAR casts.
_RAW_SPARK = """
    concat(
      CASE WHEN event_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END,
      '://',
      CASE WHEN event_id % 3 = 0 THEN 'Events.Example.COM'
           ELSE 'events.example.com' END,
      CASE WHEN event_id % 5 = 0 THEN ':443' ELSE '' END,
      '/', event_type, '/', CAST(user_id AS STRING),
      CASE WHEN event_id % 7 = 0 THEN '/' ELSE '' END,
      CASE WHEN event_id % 2 = 1
           THEN concat('?utm_source=feed&v=', CAST(user_id AS STRING))
           ELSE concat('?v=', CAST(user_id AS STRING),
                       CASE WHEN event_id % 3 = 1 THEN '&ref=partner' ELSE '' END)
      END,
      CASE WHEN event_id % 11 = 0 THEN '#section-2' ELSE '' END
    )
"""

_RAW_DUCK = _RAW_SPARK.replace("AS STRING", "AS VARCHAR")


@query(
    "text_url_canonicalize",
    oracle=f"""
    WITH raw AS (
      SELECT event_id, user_id, {_RAW_DUCK} AS raw_url
      FROM events WHERE event_type = 'click'
    ), canon AS (
      SELECT raw_url,
             'https://events.example.com/click/' || CAST(user_id AS VARCHAR)
               || '?v=' || CAST(user_id AS VARCHAR) AS canon_url
      FROM raw
    )
    SELECT COUNT(*) AS n_events,
           COUNT(DISTINCT raw_url) AS n_raw_distinct,
           COUNT(DISTINCT canon_url) AS n_canonical_distinct,
           COUNT(DISTINCT raw_url) - COUNT(DISTINCT canon_url) AS n_collapsed,
           (SELECT CAST(SUM(('0x' || substr(md5(u), 1, 8))::BIGINT) AS BIGINT)
            FROM (SELECT DISTINCT canon_url AS u FROM canon))
             AS canonical_checksum
    FROM canon
    """,
)
def q_text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize deliberately-messy URLs with a real normalizer —
    lowercase scheme+host, strip the protocol-default port and trailing
    slash, drop the fragment, remove ``utm_*``/``ref`` tracking params,
    sort what remains — and prove byte-exact output: the oracle derives
    each event's canonical form directly from the base columns (stating
    the *intent*: every planted variation erases to one string) and the
    md5-lane checksum over distinct canonical URLs fails on any single
    byte of drift.  The census row pins how many raw variants collapsed."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    raw = events.select(
        "event_id", "user_id", F.expr(_RAW_SPARK).alias("raw_url")
    )
    scheme = F.lower(F.regexp_extract("raw_url", r"^([A-Za-z]+)://", 1))
    host = F.lower(
        F.regexp_replace(
            F.regexp_extract("raw_url", r"^[A-Za-z]+://([^/?#]+)", 1), r":443$", ""
        )
    )
    path = F.regexp_replace(
        F.regexp_extract("raw_url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1), r"/$", ""
    )
    qstring = F.regexp_extract("raw_url", r"\?([^#]*)", 1)
    params = F.filter(
        F.split(qstring, "&"),
        lambda p: (~p.startswith("utm_")) & (~p.startswith("ref=")) & (p != ""),
    )
    qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    canoned = raw.select("raw_url", canon.alias("canon_url"))
    checksum = (
        canoned.select("canon_url")
        .distinct()
        .agg(
            F.sum(F.conv(F.substring(F.md5("canon_url"), 1, 8), 16, 10).cast("bigint"))
            .cast("bigint")
            .alias("canonical_checksum")
        )
    )
    census = canoned.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("raw_url").alias("n_raw_distinct"),
        F.countDistinct("canon_url").alias("n_canonical_distinct"),
        (F.countDistinct("raw_url") - F.countDistinct("canon_url")).alias("n_collapsed"),
    )
    return census.crossJoin(F.broadcast(checksum))
