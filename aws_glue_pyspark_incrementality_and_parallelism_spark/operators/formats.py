"""Source-format interoperability: CSV / JSON / ORC ingestion parity.

The reference pipeline reads exactly one format (JDBC rows from RDS,
glue_rds_to_redshift.py:44-49); a 100 TB lake ingests whatever the
producers emit — CSV drops from legacy systems, JSON event feeds, ORC
from Hive-era warehouses — and the first job is always the same:
normalize every feed into the columnar house format without losing a
row or a digit.  ``source_multiformat_roundtrip`` proves the engine's
text/binary readers are lossless against the parquet ground truth:
the same table is written to CSV (header + explicit schema read-back),
JSON lines, and ORC, re-read through ``sources.io``'s readers, and
each lane is adjudicated on exact integer checksums (row count, cents
checksum, key cardinality, epoch-day sum — no float compare anywhere).

Scale note: all three readers are splittable scans in Spark (CSV/JSON
line-split, ORC stripe-split), so the normalize job is a narrow
per-partition rewrite — no shuffle; the checksum aggregate is one
partial-agg pass.  Schema is supplied explicitly (never inferred) —
at 100 TB schema inference is a full extra scan and a correctness
hazard (a single all-null partition flips a column to string).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table, read_csv, read_json, read_orc

#: The integrity surface every lane must reproduce exactly.
_CHECKS = """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_totalprice_cents,
           COUNT(DISTINCT o_orderkey) AS n_keys,
           CAST(SUM(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS BIGINT)
             AS sum_epoch_day
    FROM orders
"""


def _integrity() -> list:
    return [
        F.count("*").alias("n_rows"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("sum_totalprice_cents"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01")))
        .cast("bigint")
        .alias("sum_epoch_day"),
    ]


@query(
    "source_multiformat_roundtrip",
    oracle=f"""
    WITH s AS ({_CHECKS})
    SELECT f.fmt, s.n_rows, s.sum_totalprice_cents, s.n_keys, s.sum_epoch_day
    FROM (VALUES ('csv'), ('json'), ('orc')) AS f(fmt) CROSS JOIN s
    ORDER BY f.fmt
    """,
)
def q_source_multiformat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write ``orders`` to CSV, JSON-lines, and ORC; re-read each through
    the engine's schema-explicit readers; adjudicate every lane on exact
    integer checksums against the parquet source (the oracle computes the
    same checksums once and expects all three lanes identical)."""
    orders = load_table(spark, sf_dir, "orders")
    schema = orders.schema
    root = tempfile.mkdtemp(prefix="sgq_formats_")

    csv_path = os.path.join(root, "csv")
    json_path = os.path.join(root, "json")
    orc_path = os.path.join(root, "orc")
    orders.write.mode("overwrite").option("header", "true").csv(csv_path)
    orders.write.mode("overwrite").json(json_path)
    orders.write.mode("overwrite").orc(orc_path)

    lanes = [
        ("csv", read_csv(spark, csv_path, schema)),
        ("json", read_json(spark, json_path, schema)),
        ("orc", read_orc(spark, orc_path)),
    ]
    out = None
    for fmt, df in lanes:
        agg = df.agg(*_integrity()).select(F.lit(fmt).alias("fmt"), "*")
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("fmt")
