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


@given(
    n_frames=st.integers(1, 6),
    w8=st.integers(1, 4),
    h8=st.integers(1, 3),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_avi_container_roundtrip_any_geometry(n_frames, w8, h8, fps, seed):
    """encode_avi_mjpeg ∘ decode_avi_frames preserves frame count,
    header metadata, and per-frame pixels (within the JPEG quant=1
    bound) for arbitrary block-aligned geometry and frame counts."""
    import numpy as np

    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.avi import (
        decode_avi_frames,
        encode_avi_mjpeg,
    )
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.jpeg import (
        encode_gray_baseline,
    )

    w, h = 8 * w8, 8 * h8
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n_frames)]
    payload = encode_avi_mjpeg([encode_gray_baseline(f) for f in frames], w, h, fps)
    meta, dec = decode_avi_frames(payload)
    assert meta["n_frames"] == n_frames and meta["stream_frames"] == n_frames
    assert (meta["width"], meta["height"], meta["fps"]) == (w, h, fps)
    assert len(dec) == n_frames
    for src, out in zip(frames, dec):
        assert out.shape == (h, w, 3)
        assert int(np.max(np.abs(out[:, :, 0].astype(int) - src.astype(int)))) <= 4


@given(
    duration_ms=st.integers(0, 10**10),
    w=st.integers(1, 8192),
    h=st.integers(1, 8192),
    codec=st.sampled_from([b"avc1", b"hvc1", b"av01", b"mp4v"]),
    timescale=st.integers(1, 1_000_000),
)
@settings(max_examples=40, deadline=None)
def test_mp4_skeleton_roundtrip_any_params(duration_ms, w, h, codec, timescale):
    """parse_mp4 inverts encode_mp4_skeleton across the parameter space
    (duration quantized to the chosen timescale, 16.16 geometry)."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
        encode_mp4_skeleton,
        parse_mp4,
    )

    m = parse_mp4(encode_mp4_skeleton(duration_ms, w, h, codec, timescale))
    # writer quantizes duration to mvhd units; parser returns floor-ms —
    # the exact composed quantization, asserted bit-for-bit
    assert m["duration_ms"] == (duration_ms * timescale // 1000) * 1000 // timescale
    t = m["tracks"][0]
    assert (t["width"], t["height"], t["codec"]) == (w, h, codec.decode())
    assert m["timescale"] == timescale and m["n_tracks"] == 1
