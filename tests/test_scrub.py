"""Literal-data semantics for the PII scrub operators (parity with the
DuckDB oracle is covered by test_parity_all; this pins the actual
redaction behavior on adversarial inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.queries_scrub import (
    DIGIT_PAT,
    EMAIL_PAT,
    IPV4_PAT,
    LONG_DIGIT_PAT,
)


def test_digit_redaction_and_counts(spark):
    df = spark.createDataFrame(
        [
            ("call 555-123-4567 now", 3),   # three digit runs
            ("no numbers here", 0),
            ("x1y22z333", 3),
            ("", 0),
        ],
        "s string, want int",
    )
    got = df.select(
        "want",
        F.size(F.regexp_extract_all("s", F.lit(DIGIT_PAT), 0)).alias("n"),
        F.regexp_replace("s", DIGIT_PAT, "[NUM]").alias("red"),
    ).collect()
    for r in got:
        assert r["n"] == r["want"]
        assert not any(ch.isdigit() for ch in r["red"])


def test_email_and_ip_patterns(spark):
    rows = [
        ("contact bob.smith+tag@example.co.uk please", True, False),
        ("bare @ sign a@b is not an address", False, False),
        ("server at 192.168.0.1 responded", False, True),
        ("version 1.2.3 is not an ip", False, False),
        ("mixed: a_1%x@host.org from 10.0.0.255", True, True),
    ]
    df = spark.createDataFrame(rows, "s string, has_email boolean, has_ip boolean")
    got = df.select(
        "has_email",
        "has_ip",
        F.col("s").rlike(EMAIL_PAT).alias("email"),
        F.col("s").rlike(IPV4_PAT).alias("ip"),
    ).collect()
    for r in got:
        assert r["email"] == r["has_email"], r
        assert r["ip"] == r["has_ip"], r


def test_long_digit_threshold(spark):
    df = spark.createDataFrame(
        [("123456", False), ("1234567", True), ("id 99999999 ok", True)],
        "s string, want boolean",
    )
    for r in df.select("want", F.col("s").rlike(LONG_DIGIT_PAT).alias("hit")).collect():
        assert r["hit"] == r["want"]
