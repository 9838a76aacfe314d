"""AVI/MJPEG container tests: parser pinned against hand-assembled
spec bytes (independent of the engine writer, so writer and parser
can't cancel out a shared misreading), writer round-trips, error paths,
and the decode_rgb / capability-registry integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.avi import (
    decode_avi_frames,
    encode_avi_mjpeg,
    parse_avi,
)
from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.jpeg import (
    encode_gray_baseline,
)
from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.multimodal import (
    decode_rgb,
    supported_formats,
)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _hand_assembled_avi(frame_payloads, w, h, fps=5, junk=False, handler=b"MJPG"):
    """Build AVI bytes straight from the 1992 spec, sharing nothing with
    encode_avi_mjpeg (independent field-by-field packing, optional JUNK
    chunk, no idx1 unless asked)."""
    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, len(frame_payloads), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 2, 2 * fps, 0,
                      len(frame_payloads), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, handler, w * h * 3,
                       0, 0, 0, 0)
    strl = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)
    movi_body = b"".join(_chunk(b"00dc", f) for f in frame_payloads)
    movi = _chunk(b"LIST", b"movi" + movi_body)
    body = b"AVI " + hdrl
    if junk:
        body += _chunk(b"JUNK", b"\x00" * 13)  # odd length: exercises alignment
    body += movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_hand_assembled_spec_bytes():
    img = np.full((8, 8), 77, np.uint8)
    jpg = encode_gray_baseline(img)
    payload = _hand_assembled_avi([jpg, jpg, jpg], 8, 8, fps=5, junk=True)
    meta = parse_avi(payload)
    assert meta["n_frames"] == 3 and meta["stream_frames"] == 3
    assert (meta["width"], meta["height"]) == (8, 8)
    assert meta["fps"] == 5  # dwRate/dwScale = 10/2
    assert meta["usec_per_frame"] == 200_000
    assert len(meta["frames"]) == 3 and meta["frames"][0] == jpg


def test_writer_parser_roundtrip_with_index_crosscheck():
    frames = [np.arange(128, dtype=np.uint8).reshape(8, 16) + i for i in range(4)]
    payload = encode_avi_mjpeg([encode_gray_baseline(f) for f in frames], 16, 8, 10)
    meta, dec = decode_avi_frames(payload)
    assert meta["n_frames"] == 4 and meta["fps"] == 10
    assert len(dec) == 4
    for src, out in zip(frames, dec):
        assert out.shape == (8, 16, 3)
        assert int(np.max(np.abs(out[:, :, 0].astype(int) - src.astype(int)))) <= 4


def test_corrupted_index_is_loud():
    jpg = encode_gray_baseline(np.zeros((8, 8), np.uint8))
    payload = bytearray(encode_avi_mjpeg([jpg, jpg], 8, 8))
    at = payload.rindex(b"idx1")
    # falsify the second entry's recorded length
    struct.pack_into("<I", payload, at + 8 + 16 + 12, 1)
    with pytest.raises(ValueError, match="idx1 length mismatch"):
        parse_avi(bytes(payload))


def test_non_mjpeg_codec_and_non_avi_riff_are_named_errors():
    jpg = encode_gray_baseline(np.zeros((8, 8), np.uint8))
    with pytest.raises(NotImplementedError, match="XVID"):
        parse_avi(_hand_assembled_avi([jpg], 8, 8, handler=b"XVID"))
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_decode_rgb_dispatches_avi_to_first_frame():
    frames = [np.full((8, 8), v, np.uint8) for v in (10, 200)]
    payload = encode_avi_mjpeg([encode_gray_baseline(f) for f in frames], 8, 8)
    out = decode_rgb(payload)
    assert out.shape == (8, 8, 3)
    assert abs(int(out[0, 0, 0]) - 10) <= 4  # first frame, not second
    assert "avi (mjpeg)" in supported_formats()
    assert "wav (riff audio)" not in supported_formats()
