"""Dependency-free WAV (RIFF/PCM) audio decode + feature extraction.

The audio half of E5: audio assets are opaque binary payloads; the
engine decodes RIFF/WAVE PCM containers with stdlib ``struct`` + numpy
and extracts the features a training-data pipeline filters on
(duration, RMS loudness, clipping peak) inside the same Arrow batch
pass the image paths use — payload bytes never cross a shuffle.

Supported: canonical PCM WAV — format tag 1 (integer PCM), 16-bit
samples, any channel count/sample rate, ``fmt ``/``data`` chunks in
any order with unknown chunks skipped. Non-goals raise
``NotImplementedError`` naming the feature: float PCM (tag 3), ADPCM/
mu-law, 8/24/32-bit sample widths. Corrupt payloads raise
``ValueError``.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM payload → (sample_rate, samples[n, channels] int16)."""
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
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit WAV: only 16-bit PCM is supported")
    frame = 2 * channels
    usable = (len(data) // frame) * frame
    samples = np.frombuffer(data, "<i2", count=usable // 2).reshape(-1, channels)
    return sample_rate, samples


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
    ss = int((mono * mono).sum())
    rms = float(np.sqrt(float(ss) / float(n)))
    return {
        "sample_rate": sr,
        "n_samples": int(n),
        "duration_sec": float(samples.shape[0]) / float(sr),
        "rms": rms,
        "peak": int(np.abs(mono).max()),
    }


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal canonical PCM16 WAV writer (mono or (n, ch)). Exists so
    pipelines can materialize audio fixtures/sidecars without codec
    libraries — the audio twin of ``jpeg.encode_gray_baseline``."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * 2 * ch, 2 * ch, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


from ..session import pickle_module_by_value  # noqa: E402

# Worker-side functions (decode runs inside mapInPandas closures): ship
# by value so executors never need the package on their own sys.path.
pickle_module_by_value(__name__)
