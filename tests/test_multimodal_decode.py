"""Real (non-stub) media decode: dependency-free PPM/BMP raster decoding
through the same mapInPandas plumbing as the stub path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.multimodal import (
    decode_media,
    decode_rgb,
    extract_features,
)


def _make_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def _make_bmp(img: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP: BGR, 4-byte-aligned rows, bottom-up."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = b"".join(
        img[r, :, ::-1].tobytes() + b"\x00" * (stride - w * 3)
        for r in range(h - 1, -1, -1)
    )
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + dib + rows


@pytest.fixture
def rng_img():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)


def test_decode_ppm_roundtrip(rng_img):
    np.testing.assert_array_equal(decode_rgb(_make_ppm(rng_img)), rng_img)


def test_decode_ppm_truncated_zero_pads(rng_img):
    payload = _make_ppm(rng_img)
    out = decode_rgb(payload[:-7])
    expect = rng_img.reshape(-1).copy()
    expect[-7:] = 0
    np.testing.assert_array_equal(out, expect.reshape(rng_img.shape))


def test_decode_bmp_roundtrip(rng_img):
    np.testing.assert_array_equal(decode_rgb(_make_bmp(rng_img)), rng_img)


def test_codec_formats_still_gated():
    # jpeg now routes to the real baseline decoder (see test_jpeg.py);
    # decode_rgb must hand it off rather than gate it...
    from .test_jpeg import encode_baseline_jpeg

    img = np.full((8, 8), 77, np.uint8)
    out = decode_rgb(encode_baseline_jpeg(img))
    assert out.shape == (8, 8, 3) and abs(int(out[0, 0, 0]) - 77) <= 1
    # ...while progressive stays a NAMED NotImplementedError
    payload = bytearray(encode_baseline_jpeg(img))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_rgb(bytes(payload))
    # png now routes to the real stdlib-zlib decoder (test_png.py);
    # a malformed png fails loudly inside it rather than being gated
    with pytest.raises(Exception):
        decode_rgb(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    # gif now routes to the real LZW decoder (test_gif.py); a malformed
    # gif fails loudly inside it rather than being gated
    with pytest.raises(ValueError):
        decode_rgb(b"GIF89a" + b"\x00" * 4)
    with pytest.raises(NotImplementedError, match="riff"):
        decode_rgb(b"RIFF" + b"\x00" * 64)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_rgb(b"????junk")


def test_extract_features_real_decode(spark, rng_img):
    other = (255 - rng_img)[::-1].copy()
    rows = [(1, _make_ppm(rng_img)), (2, _make_bmp(other))]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in extract_features(media, decode_stub=False).collect()
    }
    assert got[1]["mean_byte"] == pytest.approx(float(rng_img.mean()))
    assert got[2]["mean_byte"] == pytest.approx(float(other.mean()))
    assert got[1]["n_bytes"] == len(rows[0][1])


def test_decode_media_channel_means(spark, rng_img):
    media = spark.createDataFrame([(9, _make_ppm(rng_img))], "doc_id long, payload binary")
    row = decode_media(media).collect()[0]
    assert (row["width"], row["height"]) == (rng_img.shape[1], rng_img.shape[0])
    means = rng_img.reshape(-1, 3).mean(axis=0)
    assert row["mean_r"] == pytest.approx(float(means[0]))
    assert row["mean_g"] == pytest.approx(float(means[1]))
    assert row["mean_b"] == pytest.approx(float(means[2]))


def test_phash_determinism_and_separation(spark):
    """pHash: equal texts hash equal; structured vs constant images
    separate; the registered aggregate pins noise robustness."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY
    from .conftest import SF_SMALL

    row = REGISTRY["multimodal_image_phash"].fn(spark, SF_SMALL).collect()[0]
    assert row["all_noise_robust"] is True
    assert row["phash_respects_equality"] is True
    assert row["n_docs"] > 0
