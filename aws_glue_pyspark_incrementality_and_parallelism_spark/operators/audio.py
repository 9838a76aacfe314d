"""Dependency-free WAV (RIFF/PCM) audio decode + feature extraction.

The audio half of E5: audio assets are opaque binary payloads; the
engine decodes RIFF/WAVE PCM containers with stdlib ``struct`` + numpy
and extracts the features a training-data pipeline filters on
(duration, RMS loudness, clipping peak) inside the same Arrow batch
pass the image paths use — payload bytes never cross a shuffle.

Supported: canonical PCM WAV — format tag 1 (integer PCM), 8/16/24/32
bit sample widths (8-bit unsigned recentred, 24-bit sign-extended; all
returned as int32 "as stored"), any channel count/sample rate,
``fmt ``/``data`` chunks in any order with unknown chunks skipped.
Non-goals raise ``NotImplementedError`` naming the feature: float PCM
(tag 3 — features would lose the exact-integer RMS contract), ADPCM/
mu-law. Corrupt payloads raise ``ValueError``.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM payload → (sample_rate, samples[n, channels] int32,
    values as stored: ±2^(bits-1) full scale, 8-bit recentred to ±128)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    n = len(payload)
    sample_rate = channels = bits = fmt_tag = None
    data: bytes | None = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
        elif cid == b"data":
            data = body
    if sample_rate is None:
        raise ValueError("WAV missing fmt chunk")
    if data is None:
        raise ValueError("WAV missing data chunk")
    if fmt_tag != 1:
        raise NotImplementedError(
            f"WAV format tag {fmt_tag}: only integer PCM (tag 1) is supported"
        )
    if bits not in (8, 16, 24, 32):
        raise NotImplementedError(f"{bits}-bit WAV: only 8/16/24/32-bit PCM")
    if channels == 0:
        raise ValueError("WAV declares zero channels")
    frame = (bits // 8) * channels
    usable = (len(data) // frame) * frame
    if bits == 8:  # 8-bit WAV is unsigned, midpoint 128
        samples = np.frombuffer(data, np.uint8, count=usable).astype(np.int32) - 128
    elif bits == 16:
        samples = np.frombuffer(data, "<i2", count=usable // 2).astype(np.int32)
    elif bits == 32:
        samples = np.frombuffer(data, "<i4", count=usable // 4).astype(np.int32)
    else:  # 24-bit: 3-byte little-endian two's complement
        raw = np.frombuffer(data, np.uint8, count=usable).reshape(-1, 3).astype(np.int32)
        val = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        samples = val - ((val & 0x800000) << 1)
    return sample_rate, samples.reshape(-1, channels)


def wav_features(payload: bytes) -> dict:
    """Per-asset features from a decoded WAV: duration, RMS (exact
    integer sum of squares → one float division/sqrt, so cross-engine
    reproducible), absolute peak."""
    sr, samples = decode_wav(payload)
    mono = samples.astype(np.int64)
    n = mono.shape[0] * mono.shape[1]
    if n == 0:
        return {"sample_rate": sr, "n_samples": 0, "duration_sec": 0.0,
                "rms": 0.0, "peak": 0}
    # Python-int accumulation: a 32-bit sample squares to ~4.6e18, so an
    # int64 sum could overflow after two full-scale samples.
    ss = int((mono.astype(object) * mono.astype(object)).sum())
    rms = float(np.sqrt(float(ss) / float(n)))
    return {
        "sample_rate": sr,
        "n_samples": int(n),
        "duration_sec": float(samples.shape[0]) / float(sr),
        "rms": rms,
        "peak": int(np.abs(mono).max()),
    }


def encode_wav_pcm(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Minimal canonical PCM WAV writer (mono or (n, ch); 8/16/24/32-bit
    widths, 8-bit stored unsigned per spec). Exists so pipelines can
    materialize audio fixtures/sidecars without codec libraries — the
    audio twin of ``jpeg.encode_gray_baseline``."""
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported PCM width {bits}")
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    if bits == 8:
        data = (samples.astype(np.int32) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = samples.astype("<i2").tobytes()
    elif bits == 32:
        data = samples.astype("<i4").tobytes()
    else:  # 24-bit: low/mid/high bytes of the two's-complement value
        v = samples.astype(np.int64).reshape(-1) & 0xFFFFFF
        triples = np.empty((len(v), 3), np.uint8)
        triples[:, 0] = v & 0xFF
        triples[:, 1] = (v >> 8) & 0xFF
        triples[:, 2] = (v >> 16) & 0xFF
        data = triples.tobytes()
    bpf = (bits // 8) * ch
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * bpf, bpf, bits)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Canonical PCM16 writer (the common case; kept as the stable name
    the queries and tests use)."""
    return encode_wav_pcm(samples, sample_rate, bits=16)


from ..session import pickle_module_by_value  # noqa: E402

# Worker-side functions (decode runs inside mapInPandas closures): ship
# by value so executors never need the package on their own sys.path.
pickle_module_by_value(__name__)
