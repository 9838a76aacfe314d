"""Columnar sources and sinks.

The reference reads crawled MySQL tables through the Glue Catalog
(/root/reference/glue_rds_to_redshift.py:28-40) and writes to Redshift
via an S3-staged copy (:86-92). The rebuild is columnar-at-rest: parquet
in, parquet out, with the same "register tables, query by name" shape via
Spark temp views. A JDBC round-trip would be
``spark.read.format("jdbc")`` / ``df.write.format("jdbc")`` behind the
same helpers; parquet is the default because the driver's testdata is
parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Driver-provided tables (/root/repo/TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    Plain ``spark.read.parquet`` so Catalyst gets predicate pushdown,
    column pruning, and partition-split planning for free. Never collect
    here; scans must stay lazy so filters written later still reach the
    parquet reader.

    ``events.ts`` arrives as either nanosecond-precision parquet (which
    Spark has no timestamp type for — PARQUET_TYPE_ILLEGAL by default) or
    plain micros, depending on the generator. Handle both: nanos are read
    as long and floor-truncated to micros (the same truncation DuckDB
    applies); micros pass through. Either way the column is normalized to
    a session-TZ timestamp with the session pinned to UTC, so
    date_trunc/window agree with DuckDB's naive reading.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(table_path(sf_dir, name))
        # Temporal gate FIRST, on the raw physical column, so it pushes
        # into the scan; then normalize; then the measure gate. Exactly
        # equivalent to events_validity_gate(normalize_events_ts(df)) —
        # pinned by test_gate_compositions_are_equivalent — but the
        # post-normalize form compares a CAST column, which Spark cannot
        # push (measured ~+25% on an sf0.1 events scan; at 100 TB an
        # unpushed gate also forfeits row-group pruning of garbage
        # time ranges).
        return events_measure_gate(
            normalize_events_ts(events_ts_domain_prefilter(df))
        )
    if name == "embeddings":
        return embeddings_validity_gate(spark.read.parquet(table_path(sf_dir, name)))
    return spark.read.parquet(table_path(sf_dir, name))


#: Validity domain of the ``events.value`` measure and of embedding
#: components, enforced at the ingest boundary (the quarantine lane —
#: Class F in DEGENERATE.md). |value| ≤ 1e9 keeps every downstream exact
#: lane representable: DECIMAL(18,4) holds up to ~1e14, the integer
#: micro-cents lanes (floor(value*1e6) AS BIGINT) up to ~9.2e12 per row.
#: NaN/±Inf are excluded by the same range predicate in BOTH engines
#: because Spark and DuckDB share the "NaN is larger than any other
#: value" comparison convention (so NaN <= bound is false, never an
#: error). In-domain AGGREGATE overflow deliberately stays a loud ANSI
#: error: silently clamping a sum would corrupt statistics, while a
#: per-row domain gate is an auditable ingest contract.
MEASURE_DOMAIN_BOUND = 1e9

#: Validity domain of the ``events.ts`` event time (Class T in
#: DEGENERATE.md). Strictly after epoch 0 — the EXACT instant
#: 1970-01-01 00:00:00 is the classic zeroed-field garbage marker —
#: and strictly before 2100. A 100 TB feed WILL contain garbage event
#: times, and they are uniquely destructive: one far-future row poisons
#: every event-time watermark (all genuine rows become "late" and are
#: silently dropped), and one out-of-range row makes every
#: observed-span grid (sequence(min(h), max(h))) explode — measured:
#: a single 9999-dated row turns a sub-second sf0.001 interpolation
#: grid into a >120 s runaway. NULL ts passes: missing is data,
#: garbage is not. Plain range predicates, so both engines' scans
#: prune on them.
TS_DOMAIN_LO = "1970-01-01 00:00:00"  # exclusive
TS_DOMAIN_HI = "2100-01-01 00:00:00"  # exclusive

#: DuckDB mirror of :func:`events_validity_gate` — the oracle harness
#: (tests/oracle.py) bakes this into its ``events`` view so both engines
#: always see the same post-ingest relation. A plain range predicate, so
#: both Spark's parquet reader (PushedFilters) and DuckDB's zone maps can
#: prune on it.
EVENTS_GATE_SQL = (
    "(value IS NULL OR (value >= -1000000000.0 AND value <= 1000000000.0))"
    " AND (ts IS NULL OR (ts > TIMESTAMP '1970-01-01 00:00:00'"
    " AND ts < TIMESTAMP '2100-01-01 00:00:00'))"
)

#: DuckDB mirror of :func:`embeddings_validity_gate`: no NULL component
#: (a hole in a vector is malformed the same way NaN is — it poisons any
#: dot product; and without the explicit conjunct the two engines would
#: silently disagree, because Spark's ``forall`` propagates the NULL into
#: the filter while ``list_filter`` skips it), every component in domain
#: (NaN/±Inf excluded by the shared comparison convention), and at least
#: one nonzero component (a zero-norm vector has no direction — unusable
#: for cosine math, quarantined as malformed at ingest).
EMBEDDINGS_GATE_SQL = (
    "(embedding IS NULL OR ("
    "len(list_filter(embedding, x -> x IS NULL)) = 0"
    " AND len(list_filter(embedding, x -> NOT (x >= -1000000000.0 AND x <= 1000000000.0))) = 0"
    " AND len(list_filter(embedding, x -> x != 0)) > 0))"
)


def events_validity_gate(df: DataFrame) -> DataFrame:
    """Quarantine out-of-domain measure rows at the events ingest boundary.

    A 100 TB feed WILL contain NaN/±Inf/absurd-magnitude measures (bad
    sensors, serialization bugs, unit mix-ups); without a gate, the first
    such row crashes every ANSI decimal/bigint lane mid-job. Rows whose
    ``value`` is non-NULL and outside ±MEASURE_DOMAIN_BOUND (which by the
    NaN-sorts-last convention includes NaN and ±Inf) are dropped here —
    the same policy, with the same predicate, that the oracle harness
    applies to its DuckDB view (EVENTS_GATE_SQL), so parity is preserved
    by construction. NULL measures pass: missing is data, garbage is not.

    The event TIME is gated the same way (Class T): ``ts`` must lie
    strictly inside (TS_DOMAIN_LO, TS_DOMAIN_HI) or be NULL. The exact
    epoch-0 instant is out of domain on purpose — it is the classic
    zeroed-field marker — and the bounds cap the damage radius of the
    two uniquely-temporal failure modes: watermark poisoning (one
    far-future row silently drops every genuine row as "late") and
    observed-span grid explosion (sequence(min, max) over a 70M-hour
    span). All predicates are plain comparisons, so they push into the
    parquet scan and cost row-group pruning, not compute.
    """
    from pyspark.sql import functions as F

    t = F.col("ts")
    ts_ok = t.isNull() | (
        (t > F.lit(TS_DOMAIN_LO).cast("timestamp"))
        & (t < F.lit(TS_DOMAIN_HI).cast("timestamp"))
    )
    return events_measure_gate(df).filter(ts_ok)


def events_measure_gate(df: DataFrame) -> DataFrame:
    """The measure conjunct of the events gate alone: non-NULL ``value``
    must lie inside ±MEASURE_DOMAIN_BOUND. Split out so ``load_table``
    can compose it with the raw-typed temporal prefilter without paying
    the canonical gate's ts conjunct twice."""
    from pyspark.sql import functions as F

    c = F.col("value")
    return df.filter(
        c.isNull()
        | ((c >= -MEASURE_DOMAIN_BOUND) & (c <= MEASURE_DOMAIN_BOUND))
    )


#: 2100-01-01 00:00:00 UTC in epoch nanoseconds — TS_DOMAIN_HI for the
#: int64-nanos physical variant of events.ts (epoch-0-exclusive lower
#: bound is simply > 0 there).
_TS_DOMAIN_HI_NANOS = 4102444800 * 1_000_000_000


def events_ts_domain_prefilter(df: DataFrame) -> DataFrame:
    """The Class T temporal gate applied to the RAW events frame, in the
    ts column's physical type, BEFORE timestamp normalization.

    Same domain as :func:`events_validity_gate`'s ts conjunct — strictly
    inside (TS_DOMAIN_LO, TS_DOMAIN_HI), NULL passes — but expressed on
    the raw column so the comparison pushes into the parquet scan: the
    post-normalize form compares a CAST column, which Spark cannot push
    (and at 100 TB pushdown is what turns the gate into row-group
    pruning of garbage time ranges instead of per-row compute). With the
    session pinned to UTC the two forms keep exactly the same rows,
    pinned by ``test_gate_compositions_are_equivalent``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    t = F.col("ts")
    if isinstance(df.schema["ts"].dataType, LongType):
        # int64 epoch-nanos generator variant: epoch-0 exclusive is > 0
        ok = t.isNull() | ((t > F.lit(0)) & (t < F.lit(_TS_DOMAIN_HI_NANOS)))
    else:
        dt = df.schema["ts"].dataType.simpleString()
        ok = t.isNull() | (
            (t > F.lit(TS_DOMAIN_LO).cast(dt)) & (t < F.lit(TS_DOMAIN_HI).cast(dt))
        )
    return df.filter(ok)


def embeddings_validity_gate(df: DataFrame) -> DataFrame:
    """Quarantine malformed embedding vectors at the ingest boundary.

    A vector with a NULL/NaN/Inf/out-of-domain component poisons every
    dot product it touches; a zero-norm vector breaks cosine
    normalization (division by zero). All are quarantined here with the
    exact DuckDB twin predicate (EMBEDDINGS_GATE_SQL). NULL *vectors*
    pass through — downstream lanes already handle missing vectors. The
    NULL-component conjunct is explicit rather than left to ``forall``'s
    three-valued NULL propagation, because the DuckDB twin's
    ``list_filter`` SKIPS null elements — implicit semantics would make
    the engines silently disagree on e.g. ``[1.0, NULL]``. JVM-side
    lambda expressions (forall/exists), no Python in the path.
    """
    from pyspark.sql import functions as F

    e = F.col("embedding")
    no_null = ~F.exists(e, lambda x: x.isNull())
    in_domain = F.forall(
        e,
        lambda x: (x >= F.lit(-MEASURE_DOMAIN_BOUND))
        & (x <= F.lit(MEASURE_DOMAIN_BOUND)),
    )
    nonzero = F.exists(e, lambda x: x != F.lit(0.0))
    return df.filter(e.isNull() | (no_null & in_domain & nonzero))


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a UTC-session ``TIMESTAMP`` regardless of
    how the parquet encoded it (int64 nanos, TIMESTAMP_NTZ micros, or
    already-LTZ). Keeping one output type means every downstream query and
    oracle sees identical values across generator versions."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # int64 nanos → floor-truncate to micros (DuckDB does the same).
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(ts_type, T.TimestampNTZType):
        # NTZ micros: reinterpret the naive value as UTC wall-clock (the
        # session TZ is pinned to UTC, so this is value-preserving).
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view (the rebuild's 'catalog')."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema, header: bool = True) -> DataFrame:
    """CSV source with an explicit schema (never infer at scale — schema
    inference is a full extra pass over the data)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(
    spark: SparkSession, path: str, schema, mode: str = "FAILFAST"
) -> DataFrame:
    """JSON-lines source with an explicit schema (same no-infer rule).

    ``mode`` is the malformed-record policy: FAILFAST (default — a 100 TB
    load should die loudly, not silently null out), PERMISSIVE (quarantine
    bad lines in ``_corrupt_record`` for a dead-letter sink — the schema
    must include that string column), or DROPMALFORMED."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC source (the other columnar format a Glue/Hive catalog
    commonly serves). ORC files carry their own schema; pass one only
    to pin/project it. Predicate pushdown and column pruning work the
    same as parquet — the scan honors PushedFilters/ReadSchema."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default compression; schema travels with data)."""
    df.write.mode(mode).orc(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", schema=None
) -> DataFrame:
    """XML source (built into Spark 4: the former spark-xml package).
    ``rowTag`` names the repeated element that becomes one row; pass an
    explicit schema at scale for the same no-infer rule as CSV/JSON —
    inference reads the data twice. Unlike the columnar formats there
    is no predicate pushdown (XML is a row-oriented text format); treat
    it as an INGEST format: land → convert to parquet → query, so only
    one pass ever pays the parse cost."""
    reader = spark.read.option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format("xml").load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink — for the interchange/sidecar files some catalogs and
    feeds still require; one file per partition, same as any text sink."""
    (
        df.write.mode(mode)
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .format("xml")
        .save(path)
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC source — parity with the reference's catalog-backed MySQL
    scans (glue_rds_to_redshift.py:28-40). Always pass the partition
    bounds for large tables: without them Spark reads the whole table
    through ONE connection; with them it issues ``numPartitions``
    range-predicated queries in parallel, and pushdown-able filters
    (e.g. the incremental HWM predicate) reach the database as WHERE
    clauses. Untested in this container (no JDBC database)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    options: dict[str, str] | None = None,
    preactions: list[str] | None = None,
) -> None:
    """JDBC sink — parity with the reference's Redshift writer
    (glue_rds_to_redshift.py:86-92): ``preactions`` DDL runs ONCE over a
    direct driver-side connection before the save, exactly like Glue's
    ``preactions`` option (Spark's own ``sessionInitStatement`` is a
    read-path option and would re-run per session). Round-tripped in
    tests against the embedded Derby database that ships with Spark.
    """
    if preactions:
        jvm = df.sparkSession._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            stmt = conn.createStatement()
            for sql in preactions:
                stmt.execute(sql)
            stmt.close()
        finally:
            conn.close()
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    single_file: bool = False,
) -> None:
    """Parquet sink.

    ``single_file=True`` mirrors the reference's ``repartition(1)``
    (/root/reference/glue_rds_to_redshift.py:62,74) but uses
    ``coalesce(1)`` — no extra shuffle. At 100 TB you never do this;
    partitioned writes are the default path.
    """
    if single_file:
        df = df.coalesce(1)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction — the housekeeping pass every incremental
    sink eventually needs: append-mode micro-batches (streaming
    foreachBatch, per-run bookmark slices) accumulate files far below
    the ideal scan unit, and scan parallelism degrades into
    per-file-overhead noise.

    Strategy: size the output file count from the directory's actual
    bytes (ceil(total/target)), rewrite with ``coalesce`` (no shuffle —
    compaction must not pay a data-sized exchange), then swap the new
    files in atomically enough for a single-writer layout: write to a
    sibling staging dir, delete the old files, move the new ones in.
    On a real lakehouse this is table-format territory (Delta OPTIMIZE /
    Iceberg rewrite_data_files with snapshot isolation); the planning
    logic — bytes-driven target file count, shuffle-free rewrite — is
    identical here.

    Returns {"files_before", "files_after", "bytes"}.
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    files_before = [
        p for p in _glob.glob(_os.path.join(path, "*.parquet")) if _os.path.isfile(p)
    ]
    if not files_before:
        files_before = [
            p
            for p in _glob.glob(_os.path.join(path, "part-*"))
            if _os.path.isfile(p)
        ]
    # Hive-partitioned layouts keep data in key=value subdirectories; the
    # read-then-delete swap below only tracks top-level files, so compacting
    # such a dataset would merge partition data into new top-level files
    # while leaving the originals in place — silently doubling the table.
    partition_dirs = [
        d
        for d in _glob.glob(_os.path.join(path, "*"))
        if _os.path.isdir(d) and not _os.path.basename(d).startswith((".", "_"))
    ]
    if partition_dirs:
        raise ValueError(
            f"compact_parquet_dir: {path} contains partition subdirectories "
            f"({_os.path.basename(partition_dirs[0])}, ...); flat-layout "
            "compaction would duplicate their rows. Compact each partition "
            "directory individually instead."
        )
    if not files_before:
        raise ValueError(
            f"compact_parquet_dir: no top-level data files found under {path}"
        )
    total = sum(_os.path.getsize(p) for p in files_before)
    n_out = max(1, -(-total // target_file_bytes))
    staging = path.rstrip("/") + "__compact_staging"
    spark.read.parquet(path).coalesce(int(n_out)).write.mode("overwrite").parquet(staging)
    for p in files_before:
        _os.remove(p)
    moved = 0
    for p in _glob.glob(_os.path.join(staging, "part-*")):
        _shutil.move(p, _os.path.join(path, _os.path.basename(p)))
        moved += 1
    _shutil.rmtree(staging, ignore_errors=True)
    return {"files_before": len(files_before), "files_after": moved, "bytes": total}
