"""Z-order layout: the multi-dimensional pruning win, measured.

A bucketed layout prunes a box query when the bucket's min/max bounds
miss the box. Sorting by ONE column gives tight bounds on that column
only; Z-ordering gives moderately tight bounds on BOTH. For a filter
selective only in the SECOND dimension, the single-column-sorted layout
must scan every bucket while the Z-ordered layout scans a small
fraction."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.layout import (
    _SPREAD,
    zorder_key,
)
from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table

from .conftest import SF_MEDIUM

N_BUCKETS = 64


def _bucket_stats(df, order_col):
    """Assign rows to N_BUCKETS equal-size buckets in order_col order
    (what a sorted write produces) and return per-bucket min/max of
    both dimensions."""
    w = Window.orderBy(order_col, "pk", "sk")
    n = df.count()
    per = (n + N_BUCKETS - 1) // N_BUCKETS
    return (
        df.withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("bucket", F.floor(F.col("rn") / per))
        .groupBy("bucket")
        .agg(
            F.min("pk").alias("min_pk"), F.max("pk").alias("max_pk"),
            F.min("sk").alias("min_sk"), F.max("sk").alias("max_sk"),
        )
        .collect()
    )


def test_zorder_prunes_second_dimension(spark):
    l = load_table(spark, SF_MEDIUM, "lineitem").select(
        ((F.col("l_partkey") * _SPREAD) % 65536).alias("pk"),
        ((F.col("l_orderkey") * _SPREAD) % 65536).alias("sk"),
    )
    # box: all pk, sk in a 1/16 slice of its domain
    sk_max = 65536 // 16

    def survivors(stats):
        return sum(1 for r in stats if r["min_sk"] < sk_max)

    z_stats = _bucket_stats(l.withColumn("z", zorder_key(F.col("pk"), F.col("sk"))), "z")
    p_stats = _bucket_stats(l, "pk")

    z_frac = survivors(z_stats) / len(z_stats)
    p_frac = survivors(p_stats) / len(p_stats)
    # pk-sorted layout: every bucket spans the full sk range -> no pruning
    assert p_frac == 1.0
    # z-ordered layout: only buckets whose interleaved prefix admits the
    # sk slice survive — at most ~a quarter at this bucket granularity
    assert z_frac <= 0.3, (z_frac, p_frac)


def test_range_sorted_write_produces_disjoint_file_ranges(spark, tmp_path):
    """After write_range_sorted, parquet files own disjoint key ranges
    (footer min/max don't overlap) — the property that lets a point or
    range predicate skip whole files."""
    import pyarrow.parquet as pq
    import glob as g

    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.layout import (
        write_range_sorted,
    )
    from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table
    from .conftest import SF_SMALL

    out = str(tmp_path / "orders_sorted")
    orders = load_table(spark, SF_SMALL, "orders")
    write_range_sorted(orders, out, ["o_orderkey"], num_files=6)

    ranges = []
    for f in g.glob(out + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "o_orderkey"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"

    # data intact
    assert spark.read.parquet(out).count() == orders.count()


def test_hilbert_locality_beats_zorder(spark):
    """Mean bounding-box perimeter of 256 contiguous curve buckets:
    Hilbert must be at least as tight as Z-order on the same uniform
    point set (the reason liquid clustering uses Hilbert). Both curves
    run on the identical 8-bit spread grid."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.layout import (
        hilbert_index,
        zorder_key,
    )

    pts = load_table(spark, SF_MEDIUM, "lineitem").select(
        ((F.col("l_partkey") * _SPREAD) % 256).alias("x0"),
        ((F.col("l_suppkey") * _SPREAD) % 256).alias("y0"),
    )

    def mean_perimeter(bucket_col_df):
        rows = (
            bucket_col_df.groupBy("bucket")
            .agg(
                (F.max("x0") - F.min("x0")).alias("dx"),
                (F.max("y0") - F.min("y0")).alias("dy"),
            )
            .agg(F.avg(F.col("dx") + F.col("dy")).alias("p"))
            .collect()
        )
        return rows[0]["p"]

    hil = hilbert_index(pts, bits=8).select(
        F.shiftright(F.col("hd"), 8).alias("bucket"), "x0", "y0"
    )
    # zorder_key interleaves 16-bit inputs; an 8-bit grid fills bits
    # 0..15 of the Morton code, so >> 8 yields the same 256-way split
    zor = pts.select(
        F.shiftright(zorder_key(F.col("x0"), F.col("y0"), bits=8), 8).alias("bucket"),
        "x0",
        "y0",
    )
    p_h, p_z = mean_perimeter(hil), mean_perimeter(zor)
    assert p_h <= p_z * 1.01, (p_h, p_z)


def test_compact_parquet_binpacks_and_preserves_content(spark, tmp_path):
    """compact_parquet: file count drops to the byte-derived target and
    content (count + checksum) is unchanged."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.maintenance import (
        compact_parquet,
        parquet_files,
    )

    target = str(tmp_path / "frag")
    df = load_table(spark, SF_MEDIUM, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    df.repartition(32).write.parquet(target)
    before_files = len(parquet_files(target))
    before = spark.read.parquet(target).agg(
        F.count("*").alias("n"), F.sum("l_orderkey").alias("s")
    ).collect()[0]

    total = sum(__import__("os").path.getsize(f) for f in parquet_files(target))
    stats = compact_parquet(spark, target, target_file_bytes=max(1, total // 3))

    assert stats["files_before"] == before_files
    assert stats["files_after"] < before_files
    assert stats["files_after"] <= 4  # ceil(total / (total//3)) ≤ 4
    after = spark.read.parquet(target).agg(
        F.count("*").alias("n"), F.sum("l_orderkey").alias("s")
    ).collect()[0]
    assert (before["n"], before["s"]) == (after["n"], after["s"])
