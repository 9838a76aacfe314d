"""Data-layout operators: Z-order (Morton) clustering keys.

Multi-dimensional pruning at rest: sorting 100 TB by one column makes
min/max (or partition) pruning work for THAT column only — a filter on
any other column scans everything. Writing the data ordered by the
interleaved-bit Z-value of two (or more) columns gives every prefix of
the sort key bits from BOTH dimensions, so a file/bucket range carries
tight min/max bounds on each dimension simultaneously and a box filter
prunes on all of them (the technique behind Delta/Iceberg Z-ORDER
clustering; Morton '66).

The key is built from shift/mask built-ins only — whole-stage codegen,
no UDF — and the identical arithmetic is emitted as ANSI SQL for the
DuckDB oracle from the same generator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table

ZORDER_BITS = 16


def zorder_key(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into a
    Morton code (a's bit i -> position 2i, b's -> 2i+1). Pure
    shift/mask expressions — one codegen projection, no Python."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_key_sql(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """The same Morton interleave as ANSI SQL text (DuckDB oracle),
    emitted from the same bit positions so parity is structural."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_ZBUCKET_SHIFT = 2 * ZORDER_BITS - 8  # top 8 interleaved bits -> 256 buckets

#: Knuth multiplicative constant: spreads a small-domain key across the
#: full 16-bit Z dimension with plain modular arithmetic — the identical
#: expression runs in both engines (production Z-ORDER uses the raw
#: column after range-scaling; toy-SF key domains are too small to
#: populate the high bits the buckets are built from).
_SPREAD = 2654435761


def _spread_sql(col: str) -> str:
    return f"(({col} * {_SPREAD}) % 65536)"


@query(
    "layout_zorder_buckets",
    oracle=f"""
    SELECT CAST(({zorder_key_sql(_spread_sql('l_partkey'), _spread_sql('l_suppkey'))})
                >> {_ZBUCKET_SHIFT} AS BIGINT) AS zbucket,
           COUNT(*) AS n_rows,
           MIN({_spread_sql('l_partkey')}) AS min_part,
           MAX({_spread_sql('l_partkey')}) AS max_part,
           MIN({_spread_sql('l_suppkey')}) AS min_supp,
           MAX({_spread_sql('l_suppkey')}) AS max_supp
    FROM lineitem
    GROUP BY 1
    """,
)
def q_layout_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering statistics: assign every row its 256-way
    Morton bucket over (partkey, suppkey) and report per-bucket min/max
    of BOTH dimensions — exactly the file-level stats a Z-ordered write
    would produce, and what makes two-dimensional box filters prunable.
    The pruning win over single-column sort is asserted in pytest."""
    l = load_table(spark, sf_dir, "lineitem")
    pk = (F.col("l_partkey") * _SPREAD) % 65536
    sk = (F.col("l_suppkey") * _SPREAD) % 65536
    z = zorder_key(pk, sk)
    return (
        l.select(
            F.shiftright(z, _ZBUCKET_SHIFT).cast("bigint").alias("zbucket"),
            pk.alias("pk"),
            sk.alias("sk"),
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("pk").alias("min_part"),
            F.max("pk").alias("max_part"),
            F.min("sk").alias("min_supp"),
            F.max("sk").alias("max_supp"),
        )
    )


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-clustered write: global range-partition on ``sort_cols``,
    sort within each partition, one parquet file per partition. Every
    file then owns a disjoint key range, so parquet footer min/max
    statistics prune whole FILES for any range/point predicate on the
    leading sort column — the single-dimension complement to the
    Z-order path (multi-dimension) above.

    One range-exchange shuffle (sampled boundaries, skew-resistant) +
    a spill-safe local sort; at 100 TB this is the standard "sorted
    table" materialization, and ``num_files`` is sized from total
    bytes / target file size (see sources.io.compact_parquet_dir)."""
    (
        df.repartitionByRange(num_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )
