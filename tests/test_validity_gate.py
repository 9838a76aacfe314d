"""Class F ingest-gate pins: the events/embeddings validity gates must
(1) be exact cross-engine twins of their DuckDB mirror predicates,
(2) be a no-op on the standard corpora, and (3) stay a pushdown-able
scan predicate on the events side (so quarantine costs pruning, not
compute). Corpus-level behavior is swept by
``parity_sweep.py --corpus extremes`` (SWEEP_DETAIL_EXTREMES.json)."""

from __future__ import annotations

import datetime

import duckdb
from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import (
    EMBEDDINGS_GATE_SQL,
    EVENTS_GATE_SQL,
    embeddings_validity_gate,
    events_validity_gate,
    load_table,
    table_path,
)

SF = "/root/testdata/sf0.001"

_MID_TS = datetime.datetime(2024, 6, 1, 12, 0, 0)

#: probe_id -> (value, ts); expected-kept ids must match the DuckDB
#: mirror. 1-11 probe the measure domain (valid ts), 12-18 the Class T
#: temporal domain (valid value): NULL ts kept, pre-epoch and the exact
#: epoch-0 zeroed-field marker dropped, first microsecond after epoch
#: kept, 2100 bound exclusive, far-future 9999 dropped.
_E_PROBES = [
    (1, 1.5, _MID_TS),
    (2, None, _MID_TS),
    (3, float("nan"), _MID_TS),
    (4, float("inf"), _MID_TS),
    (5, float("-inf"), _MID_TS),
    (6, 1e300, _MID_TS),
    (7, -1e300, _MID_TS),
    (8, 1e-300, _MID_TS),
    (9, 1e9, _MID_TS),
    (10, -1e9, _MID_TS),
    (11, 1000000001.0, _MID_TS),
    (12, 1.0, None),
    (13, 1.0, datetime.datetime(1905, 3, 15, 7, 30, 0)),
    (14, 1.0, datetime.datetime(1970, 1, 1, 0, 0, 0)),
    (15, 1.0, datetime.datetime(1970, 1, 1, 0, 0, 0, 1)),
    (16, 1.0, datetime.datetime(2099, 12, 31, 23, 59, 59, 999999)),
    (17, 1.0, datetime.datetime(2100, 1, 1, 0, 0, 0)),
    (18, 1.0, datetime.datetime(9999, 12, 31, 23, 59, 59, 999999)),
]
_E_KEPT = {1, 2, 8, 9, 10, 12, 15, 16}

_V_PROBES = [
    (1, [0.5, -0.25]),
    (2, None),
    (3, [0.0, 0.0]),
    (4, [1.0, float("nan")]),
    (5, [1.0, float("inf")]),
    (6, [1.0, 2e9]),
    (7, []),
    (8, [0.0, 3.0]),
    # NULL component: the one probe where IMPLICIT semantics diverge
    # (Spark forall propagates the NULL, DuckDB list_filter skips it) —
    # both gates quarantine it explicitly.
    (9, [1.0, None]),
]
_V_KEPT = {1, 2, 8}


def test_events_gate_spark_semantics(spark):
    df = spark.createDataFrame(
        _E_PROBES, "probe_id bigint, value double, ts timestamp"
    )
    kept = {r.probe_id for r in events_validity_gate(df).collect()}
    assert kept == _E_KEPT


def _dlit(v, typ: str) -> str:
    """Render a Python float as a DuckDB literal (NaN/Inf need quotes)."""
    if v is None:
        return f"CAST(NULL AS {typ})"
    if v != v or v in (float("inf"), float("-inf")):
        return f"'{v}'::{typ}"
    return f"{v!r}::{typ}"


def _tlit(ts) -> str:
    if ts is None:
        return "CAST(NULL AS TIMESTAMP)"
    return f"TIMESTAMP '{ts.isoformat(sep=' ')}'"


def test_events_gate_duckdb_mirror_matches():
    con = duckdb.connect()
    vals = ", ".join(
        f"({pid}, {_dlit(v, 'DOUBLE')}, {_tlit(ts)})" for pid, v, ts in _E_PROBES
    )
    kept = {
        r[0]
        for r in con.execute(
            f"WITH p(probe_id, value, ts) AS (VALUES {vals})"
            f" SELECT probe_id FROM p WHERE {EVENTS_GATE_SQL}"
        ).fetchall()
    }
    assert kept == _E_KEPT


def test_embeddings_gate_spark_semantics(spark):
    df = spark.createDataFrame(_V_PROBES, "probe_id bigint, embedding array<float>")
    kept = {r.probe_id for r in embeddings_validity_gate(df).collect()}
    assert kept == _V_KEPT


def test_embeddings_gate_duckdb_mirror_matches():
    def lit(vec):
        if vec is None:
            return "NULL::FLOAT[]"
        if not vec:
            return "[]::FLOAT[]"
        return "[" + ", ".join(_dlit(x, "FLOAT") for x in vec) + "]"

    con = duckdb.connect()
    vals = ", ".join(f"({pid}, {lit(v)})" for pid, v in _V_PROBES)
    kept = {
        r[0]
        for r in con.execute(
            f"WITH p(probe_id, embedding) AS (VALUES {vals})"
            f" SELECT probe_id FROM p WHERE {EMBEDDINGS_GATE_SQL}"
        ).fetchall()
    }
    assert kept == _V_KEPT


def test_gate_is_noop_on_standard_corpus(spark):
    """Standard testdata is fully in-domain: the gates must filter
    NOTHING at any driver SF — this is what keeps the 369-green ledger
    valid after the gates landed."""
    for t in ("events", "embeddings"):
        raw = spark.read.parquet(table_path(SF, t)).count()
        gated = load_table(spark, SF, t).count()
        assert gated == raw, f"{t}: gate filtered {raw - gated} standard rows"


def test_events_gate_pushes_into_scan(spark):
    """The events gate is two plain range comparisons, so it must reach
    the parquet reader as PushedFilters — quarantine via row-group
    pruning, not post-scan compute."""
    plan = (
        load_table(spark, SF, "events")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "GreaterThanOrEqual(value" in pushed or "value" in pushed, pushed


def test_stream_source_applies_gate(spark, tmp_path):
    """A raw staged file with out-of-domain measures must be quarantined
    by the STREAM ingest path too (read_events_stream), not only batch."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.streaming.incremental import (
        read_events_stream,
    )

    src = str(tmp_path / "src")
    rows = [
        (1, "2024-01-01 00:00:00", 10, "view", 2.0, None),
        (2, "2024-01-01 00:01:00", 11, "view", float("nan"), None),
        (3, "2024-01-01 00:02:00", 12, "view", 1e300, None),
        (4, "2024-01-01 00:03:00", 13, "view", None, None),
        # watermark poison: one far-future event time would mark every
        # genuine row "late" — the stream gate must quarantine it
        (5, "9999-12-31 23:59:59", 14, "view", 1.0, None),
        (6, "1970-01-01 00:00:00", 15, "view", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(src)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (
        read_events_stream(spark, src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {r.event_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 4}


def test_gate_compositions_are_equivalent(spark, tmp_path):
    """load_table's scan-pushable composition (raw-typed ts prefilter →
    normalize → measure gate) must keep EXACTLY the rows of the
    canonical events_validity_gate(normalize(df)) — on both physical ts
    variants (timestamp micros and int64 epoch nanos)."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import (
        events_measure_gate,
        events_ts_domain_prefilter,
        normalize_events_ts,
    )

    probes = [
        (1, "2024-06-01 12:00:00", 2.0),
        (2, "1905-03-15 07:30:00", 2.0),
        (3, "1970-01-01 00:00:00", 2.0),
        (4, "1970-01-01 00:00:00.000001", 2.0),
        (5, "2099-12-31 23:59:59.999999", 2.0),
        (6, "2100-01-01 00:00:00", 2.0),
        (7, "9999-12-31 23:59:59.999999", 2.0),
        (8, None, 2.0),
        (9, "2024-06-01 12:00:00", float("nan")),
        (10, "9999-12-31 23:59:59.999999", float("nan")),
    ]
    micros = spark.createDataFrame(
        [(i, ts, v) for i, ts, v in probes],
        "event_id bigint, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    import datetime

    def nanos(ts):
        if ts is None:
            return None
        dt = datetime.datetime.fromisoformat(ts)
        epoch = datetime.datetime(1970, 1, 1)
        us = (dt - epoch) // datetime.timedelta(microseconds=1)
        return us * 1000

    nano_rows = [(i, nanos(ts), v) for i, ts, v in probes if nanos(ts) is None or abs(nanos(ts)) < 2**63]
    nanodf = spark.createDataFrame(
        nano_rows, "event_id bigint, ts long, value double"
    )

    for df in (micros, nanodf):
        canonical = {
            r.event_id
            for r in events_validity_gate(normalize_events_ts(df)).collect()
        }
        pushable = {
            r.event_id
            for r in events_measure_gate(
                normalize_events_ts(events_ts_domain_prefilter(df))
            ).collect()
        }
        assert canonical == pushable
    # and the expected keep-set itself: in-domain + NULL-ts + epoch+1us
    assert canonical == {1, 4, 5, 8}
