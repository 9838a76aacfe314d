"""Dependency-free AVI (RIFF) container codec for the MJPEG video lane.

The reference has no media handling at all (its whole job is
glue_rds_to_redshift.py's relational ETL); this module gives the E5
multimodal surface a REAL video container to exercise the ingest
topology end-to-end: RIFF/AVI parsing (the 1992 Microsoft spec — the
same chunk grammar as the WAV support in ``operators.audio``), MJPEG
frame extraction, and per-frame decode through the baseline JPEG
decoder in ``operators.jpeg``.

Spec shape (AVI RIFF form):

    RIFF('AVI '
      LIST('hdrl'
        avih(<MainAVIHeader>)            -- µs/frame, frames, w, h
        LIST('strl' strh(<AVIStreamHeader>) strf(<BITMAPINFOHEADER>)))
      LIST('movi' '00dc'(<jpeg bytes>) ...)
      idx1(<AVIINDEXENTRY> ...))          -- offsets relative to 'movi'

Like the WAV parser: chunk-order agnostic, unknown chunks (JUNK, INFO)
skipped with RIFF word alignment, truncated/malformed payloads rejected
loudly with named errors. Only 'vids'/MJPG streams are supported —
anything else raises NotImplementedError naming the fourCC, which the
capability registry turns into a routing predicate upstream
(multimodal.decode_or_defer) so no mixed corpus hits the raise mid-job.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_baseline_jpeg

#: RIFF flag: index entry is a keyframe (every MJPEG frame is).
_AVIIF_KEYFRAME = 0x10
#: MainAVIHeader flag: file carries an idx1 index.
_AVIF_HASINDEX = 0x10


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap already-encoded JPEG payloads in a canonical AVI/MJPEG
    container (single 'vids' stream, idx1 index, word-aligned chunks).
    The canonical writer for tests and the round-trip query; the parser
    below is additionally pinned against hand-assembled spec bytes so
    writer and parser cannot cancel out a shared misreading."""
    n = len(jpeg_frames)
    max_sz = max((len(f) for f in jpeg_frames), default=0)

    avih = struct.pack(
        "<10I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_sz * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_sz,  # dwSuggestedBufferSize
        width,
        height,
    ) + struct.pack("<4I", 0, 0, 0, 0)

    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = dwRate / dwScale)
            0,  # dwStart
            n,  # dwLength (frames)
            max_sz,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0 = varying)
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )

    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0,
        0,
        0,
        0,
    )

    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b""
    idx_entries = []
    for f in jpeg_frames:
        # Offset convention: from the start of the 'movi' fourCC to the
        # chunk's own fourCC (the common writer convention; the parser
        # accepts absolute offsets too).
        idx_entries.append((4 + len(movi_body), len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_body)

    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, ln)
            for off, ln in idx_entries
        ),
    )

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) over a RIFF chunk span."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + ln > end:
            raise ValueError(
                f"AVI: chunk {fourcc!r} at {pos} overruns its parent "
                f"({body + ln} > {end})"
            )
        yield fourcc, body, ln
        pos = body + ln + (ln % 2)  # word alignment


def parse_avi(payload: bytes) -> dict:
    """Parse an AVI container into header metadata + raw frame payloads.

    Returns ``{n_frames, width, height, usec_per_frame, fps, handler,
    stream_frames, frames: list[bytes]}``. Cross-checks the idx1 index
    against the movi chunks actually found (entry count, per-frame
    lengths) when present — a corrupted index is a loud error, not a
    silent wrong sample order."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_len, len(payload))

    meta: dict = {}
    frames: list[bytes] = []
    idx: list[tuple[int, int]] = []

    def walk_list(start: int, stop: int) -> None:
        for fourcc, body, ln in _walk(payload, start, stop):
            if fourcc == b"LIST":
                kind = payload[body : body + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk_list(body + 4, body + ln)
                # other LIST kinds (INFO, odml) skipped
            elif fourcc == b"avih":
                f = struct.unpack_from("<10I", payload, body)
                meta.update(
                    usec_per_frame=f[0],
                    n_frames=f[4],
                    width=f[8],
                    height=f[9],
                )
            elif fourcc == b"strh":
                fcc_type = payload[body : body + 4]
                handler = payload[body + 4 : body + 8]
                if fcc_type != b"vids":
                    continue  # audio/text streams: frames not extracted here
                if handler not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"AVI video codec {handler!r}: only MJPG is "
                        "decodable without codec libraries"
                    )
                scale, rate, _start, length = struct.unpack_from(
                    "<IIII", payload, body + 20
                )
                meta.update(
                    handler="MJPG",
                    stream_frames=length,
                    fps=(rate // scale) if scale else 0,
                )
            elif fourcc == b"00dc":
                frames.append(payload[body : body + ln])
            elif fourcc == b"idx1":
                for off in range(0, ln - 15, 16):
                    ckid = payload[body + off : body + off + 4]
                    _flags, _ckoff, cklen = struct.unpack_from(
                        "<III", payload, body + off + 4
                    )
                    if ckid == b"00dc":
                        idx.append((_ckoff, cklen))
            # JUNK / unknown chunks: skipped by the walk itself

    walk_list(12, end)

    if "width" not in meta:
        raise ValueError("AVI: missing avih main header")
    if "handler" not in meta:
        raise NotImplementedError("AVI: no 'vids' stream found")
    if idx:
        if len(idx) != len(frames):
            raise ValueError(
                f"AVI: idx1 has {len(idx)} video entries but movi has "
                f"{len(frames)} '00dc' chunks"
            )
        for k, ((_off, cklen), frame) in enumerate(zip(idx, frames)):
            if cklen != len(frame):
                raise ValueError(f"AVI: idx1 length mismatch at frame {k}")
    meta["frames"] = frames
    return meta


def decode_avi_frames(payload: bytes) -> tuple[dict, list[np.ndarray]]:
    """Parse + per-frame MJPEG decode: returns (meta-without-bytes,
    [HxWx3 uint8 arrays]). Each frame is an independent baseline JPEG —
    the property that makes MJPEG the parallel-friendly video codec:
    frame decode needs no inter-frame state, so a corpus of AVI
    payloads splits across executors at frame granularity if needed."""
    meta = parse_avi(payload)
    frames = [decode_baseline_jpeg(f) for f in meta.pop("frames")]
    return meta, frames


from ..session import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)
