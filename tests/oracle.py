"""DuckDB-differential parity harness mirroring the driver's compare:
row-count + column-name set + order-insensitive normalized values."""

from __future__ import annotations

import datetime
import math

import duckdb

from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY
from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import (
    EMBEDDINGS_GATE_SQL,
    EVENTS_GATE_SQL,
    TABLES,
    table_path,
)

#: Ingest-boundary validity gates (Class F in DEGENERATE.md), mirrored
#: from sources/io.py so both engines see the same post-ingest relation.
#: The driver registers its own UNGATED views at sf0.01, where the gates
#: filter nothing — these only bite on the float-edge `extremes` corpus.
_VIEW_GATES = {"events": EVENTS_GATE_SQL, "embeddings": EMBEDDINGS_GATE_SQL}


def _register_views(con, sf_dir: str, materialize_gated: bool = True) -> None:
    """Register the ten tables; gated ones as MATERIALIZED tables.

    Materialization is load-bearing, not an optimization: with a plain
    ``CREATE VIEW ... WHERE gate``, DuckDB merges an oracle's own
    predicates into the same scan node and may evaluate them BEFORE the
    gate (filter reordering is cost-based, not left-to-right), so an
    expression like ``CAST(floor(x*1e6) AS BIGINT)`` can still be
    computed on a quarantined NaN row and crash. ``CREATE TABLE AS``
    is a hard evaluation barrier: no downstream expression ever sees a
    quarantined row. ``materialize_gated=False`` keeps the lazy views
    for schema-only probes (duckdb_result_types) where nothing is
    evaluated.
    """
    for t in TABLES:
        gate = _VIEW_GATES.get(t)
        if gate and materialize_gated:
            con.execute(
                f"CREATE TABLE {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
                f" WHERE {gate}"
            )
        else:
            where = f" WHERE {gate}" if gate else ""
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'{where}"
            )


def duckdb_rows(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    _register_views(con, sf_dir)
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def duckdb_result_types(sql: str, sf_dir: str) -> dict[str, str]:
    """Column -> DuckDB type name for an oracle query, without executing it."""
    con = duckdb.connect()
    _register_views(con, sf_dir, materialize_gated=False)
    rel = con.sql(sql)
    return dict(zip(rel.columns, (str(t).upper() for t in rel.types)))


_DUCK_INTS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _duck_class(t: str) -> str:
    if t.startswith("DECIMAL"):
        return "DECIMAL"  # becomes float64 through pandas
    if t == "HUGEINT":
        return "HUGEINT"  # becomes float64 through pandas
    if t in _DUCK_INTS:
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "VARCHAR":
        return "str"
    if t.endswith("[]"):
        return "list"
    return t.lower()


def _spark_class(dt) -> str:
    s = dt.simpleString()
    if s.startswith("decimal"):
        return "spark_decimal"  # becomes object(Decimal) through toPandas
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("timestamp"):
        return "ts"
    if s == "string":
        return "str"
    if s.startswith("array"):
        return "list"
    if s.startswith("map"):
        return "map"
    if s.startswith("struct"):
        return "struct"
    return s


def assert_type_compat(spark, name: str, sf_dir: str) -> None:
    """Mirror the driver's type-strict value hashing at the schema level.

    The driver materializes both sides through pandas, where DuckDB HUGEINT
    (SUM of any integer) and DECIMAL arrive as float64 — so an integer Spark
    column hashed as ``5`` vs an uncast oracle SUM hashed as ``5.0`` fails
    even when values agree (round-1 ``window_gaps_islands``).  Both schemas
    are available lazily, so this costs no query execution.
    """
    spec = REGISTRY[name]
    assert spec.oracle is not None, f"{name} has no oracle"
    s_types = {f.name: _spark_class(f.dataType) for f in spec.fn(spark, sf_dir).schema.fields}
    o_types = {c: _duck_class(t) for c, t in duckdb_result_types(spec.oracle, sf_dir).items()}
    bad = []
    extra = sorted(set(o_types) - set(s_types))
    if extra:
        bad.append(f"oracle-only columns {extra} (spark cols: {sorted(s_types)})")
    for col, sc in s_types.items():
        oc = o_types.get(col)
        # Registry-wide guard: the driver's pandas sort+hash canonicalizer
        # cannot handle non-scalar cells (TypeError: unhashable type) — no
        # query may emit a top-level array/map/struct column, even when both
        # engines agree on it (round-5 text_inverted_index was value-correct
        # and still driver-red).  Flatten (array_join / explode / checksum).
        if sc in ("list", "map", "struct"):
            bad.append(
                f"{col}: spark emits non-scalar {sc} — the driver's pandas"
                " hasher cannot canonicalize it; flatten the column"
            )
        if oc == "list":
            bad.append(
                f"{col}: oracle emits a DuckDB list — flatten with"
                " array_to_string(...) to stay driver-hashable"
            )
        if oc is None:
            bad.append(f"{col}: missing from oracle (oracle cols: {sorted(o_types)})")
            continue
        ok = sc == oc or (sc == "float" and oc in ("float", "DECIMAL", "HUGEINT"))
        if not ok:
            bad.append(f"{col}: spark={sc} oracle={oc} (add an explicit CAST in the oracle)")
    assert not bad, f"{name}: type-class mismatches vs driver hashing: {bad}"


def driver_canonicalize(cols: list[str], rows: list[tuple]) -> int:
    """Reproduce the DRIVER's pandas canonicalization, failure modes included.

    The driver materializes each side into a pandas DataFrame, sorts columns
    by name, ``sort_values`` over ALL columns, then hashes cells.  A query
    whose output schema contains a non-scalar column (array/map/struct) dies
    there with ``TypeError: unhashable type: 'list'`` even when its values are
    correct (round-5 ``text_inverted_index``).  The pre-flight must fail
    wherever the driver fails, so this mirror performs the same pandas
    sort+hash and deliberately does NOT catch the TypeError.

    The returned hash is for hashability only — cross-engine equality is
    still judged by :func:`normalize` (dtype-insensitive), because pandas
    hashes int64 and float64 representations of the same value differently.
    """
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=cols)
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


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
    # Driver-hashability gate: both sides must survive the driver's pandas
    # sort+hash canonicalization (raises TypeError on list/map/struct cells).
    driver_canonicalize(s_cols, s_rows)
    driver_canonicalize(o_cols, o_rows)
