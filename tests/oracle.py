"""DuckDB-differential parity harness mirroring the driver's compare:
row-count + column-name set + order-insensitive normalized values."""

from __future__ import annotations

import datetime
import math

import duckdb

from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY
from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import TABLES, table_path


def duckdb_rows(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(row[i]) for i in order) for row in rows)


def assert_parity(spark, name: str, sf_dir: str) -> None:
    spec = REGISTRY[name]
    assert spec.oracle is not None, f"{name} has no oracle"
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = duckdb_rows(spec.oracle, sf_dir)
    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    s_norm, o_norm = normalize(s_cols, s_rows), normalize(o_cols, o_rows)
    mismatches = [(a, b) for a, b in zip(s_norm, o_norm) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"
