"""WAV decode/feature tests: canonical PCM16 containers round-trip
losslessly, unknown chunks are skipped, and non-PCM/odd-width payloads
are rejected loudly."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.audio import (
    decode_wav,
    encode_wav_pcm16,
    wav_features,
)


def test_mono_roundtrip_lossless():
    rng = np.random.RandomState(1)
    samples = rng.randint(-32768, 32768, 1000).astype(np.int16)
    sr, back = decode_wav(encode_wav_pcm16(samples, 44100))
    assert sr == 44100
    np.testing.assert_array_equal(back[:, 0], samples)


def test_stereo_roundtrip_and_features():
    rng = np.random.RandomState(2)
    samples = rng.randint(-1000, 1000, (500, 2)).astype(np.int16)
    payload = encode_wav_pcm16(samples, 8000)
    sr, back = decode_wav(payload)
    assert sr == 8000 and back.shape == (500, 2)
    np.testing.assert_array_equal(back, samples)
    f = wav_features(payload)
    assert f["n_samples"] == 1000
    assert f["duration_sec"] == pytest.approx(500 / 8000)
    expect_rms = float(np.sqrt((samples.astype(np.int64) ** 2).sum() / 1000))
    assert f["rms"] == pytest.approx(expect_rms)
    assert f["peak"] == int(np.abs(samples).max())


def test_unknown_chunks_skipped():
    samples = np.array([1, -2, 3], np.int16)
    payload = bytearray(encode_wav_pcm16(samples, 16000))
    # splice a LIST chunk (odd length -> exercises word alignment) after WAVE
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    payload[12:12] = extra
    sr, back = decode_wav(bytes(payload))
    assert sr == 16000
    np.testing.assert_array_equal(back[:, 0], samples)


def test_non_pcm_and_widths_rejected():
    samples = np.array([0, 1], np.int16)
    payload = bytearray(encode_wav_pcm16(samples, 8000))
    fmt_off = payload.find(b"fmt ") + 8
    p = bytearray(payload)
    struct.pack_into("<H", p, fmt_off, 3)  # float PCM
    with pytest.raises(NotImplementedError, match="format tag 3"):
        decode_wav(bytes(p))
    p = bytearray(payload)
    struct.pack_into("<H", p, fmt_off + 14, 12)  # 12-bit: not a PCM width
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_wav(bytes(p))
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(b"garbage")


@pytest.mark.parametrize("bits,lo,hi", [(8, -128, 128), (24, -(1 << 23), 1 << 23),
                                        (32, -(1 << 31), 1 << 31)])
def test_other_pcm_widths_roundtrip(bits, lo, hi):
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.audio import (
        encode_wav_pcm,
    )

    rng = np.random.RandomState(bits)
    samples = rng.randint(lo, hi, (300, 2)).astype(np.int64)
    sr, back = decode_wav(encode_wav_pcm(samples, 22050, bits=bits))
    assert sr == 22050 and back.shape == (300, 2)
    np.testing.assert_array_equal(back, samples)


def test_24bit_sign_extension_known_bytes():
    """Hand-built 24-bit data chunk: 0xFFFFFF = -1, 0x800000 = -2^23,
    0x7FFFFF = +2^23-1, 0x000001 = 1 — independent of the encoder."""
    data = bytes([0xFF, 0xFF, 0xFF, 0x00, 0x00, 0x80, 0xFF, 0xFF, 0x7F, 0x01, 0x00, 0x00])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    _, back = decode_wav(payload)
    np.testing.assert_array_equal(back[:, 0], [-1, -(1 << 23), (1 << 23) - 1, 1])


def test_32bit_features_no_overflow():
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.audio import (
        encode_wav_pcm,
    )

    full = (1 << 31) - 1
    samples = np.array([full, -full, full, -full], np.int64)
    f = wav_features(encode_wav_pcm(samples, 8000, bits=32))
    # exact integer sum of squares: 4 * full^2 (would overflow int64)
    expect_rms = float(np.sqrt(float(4 * full * full) / 4.0))
    assert f["rms"] == pytest.approx(expect_rms)
    assert f["peak"] == full


def test_empty_data_features():
    payload = encode_wav_pcm16(np.zeros(0, np.int16), 8000)
    f = wav_features(payload)
    assert f == {"sample_rate": 8000, "n_samples": 0, "duration_sec": 0.0,
                 "rms": 0.0, "peak": 0}
