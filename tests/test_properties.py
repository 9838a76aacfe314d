"""Property-based spot checks (SURVEY §5 item 5, hypothesis): invariants
that must hold for ANY input, not just the shipped testdata."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.skew import (
    salted_decimal_sum,
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-10**6, max_value=10**6),
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=8, deadline=None)
@given(rows_strategy)
def test_groupby_sum_partition_invariant(spark, rows):
    """Sum of per-group totals == global total (exact, via decimals)."""
    df = spark.createDataFrame(rows, "k string, v long")
    per_group = df.groupBy("k").agg(F.sum("v").alias("t"))
    total_of_groups = per_group.agg(F.sum("t")).collect()[0][0]
    global_total = df.agg(F.sum("v")).collect()[0][0]
    assert total_of_groups == global_total


@settings(max_examples=6, deadline=None)
@given(rows_strategy)
def test_salted_sum_equals_direct_sum(spark, rows):
    """Two-phase salted aggregation is result-invariant for any input."""
    df = spark.createDataFrame(rows, "k string, v long")
    direct = {
        r.k: r.t
        for r in df.groupBy("k").agg(F.sum(F.col("v").cast("decimal(18,2)")).alias("t")).collect()
    }
    salted = {
        r.k: r.t
        for r in salted_decimal_sum(
            df, ["k"], F.col("v").cast("decimal(18,2)"), alias="t", salt_buckets=4
        ).collect()
    }
    assert {k: Decimal(v) for k, v in direct.items()} == {
        k: Decimal(v) for k, v in salted.items()
    }


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.binary(min_size=0, max_size=400),
)
@settings(max_examples=40, deadline=None)
def test_decode_rgb_ppm_bmp_roundtrip(w, h, noise):
    """decode_rgb inverts both writers for arbitrary geometry/pixels, and
    truncated PPM payloads zero-pad rather than crash."""
    import numpy as np

    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.multimodal import (
        decode_rgb,
    )
    from .test_multimodal_decode import _make_bmp, _make_ppm

    need = w * h * 3
    noise = noise or b"\x00"
    pixels = np.frombuffer((noise * (need // len(noise) + 1))[:need], np.uint8)
    img = pixels.reshape(h, w, 3)
    np.testing.assert_array_equal(decode_rgb(_make_ppm(img)), img)
    np.testing.assert_array_equal(decode_rgb(_make_bmp(img)), img)
    cut = _make_ppm(img)[: len(_make_ppm(img)) - min(need, 5)]
    out = decode_rgb(cut)
    assert out.shape == (h, w, 3)
