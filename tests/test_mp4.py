"""MP4 box parser tests: hand-assembled spec bytes (independent of the
engine writer), version-1 full boxes, largesize, error paths."""

from __future__ import annotations

import struct

import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
    encode_mp4_skeleton,
    parse_mp4,
    walk_boxes,
)


def _b(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def test_writer_parser_roundtrip():
    m = parse_mp4(encode_mp4_skeleton(90_500, 1920, 1080, codec=b"hvc1"))
    assert m["brand"] == "isom"
    assert m["duration_ms"] == 90_500
    assert m["n_tracks"] == 1
    t = m["tracks"][0]
    assert (t["width"], t["height"], t["handler"], t["codec"]) == (
        1920, 1080, "vide", "hvc1",
    )


def test_hand_assembled_version1_and_largesize():
    # version-1 mvhd: 64-bit creation/modification/duration
    mvhd = _b(
        b"mvhd",
        bytes([1, 0, 0, 0])
        + struct.pack(">QQIQ", 0, 0, 90_000, 270_000)  # timescale 90k, 3 s
        + b"\x00" * 80,
    )
    moov = _b(b"moov", mvhd)
    # largesize mdat: size=1 + u64 largesize
    mdat_body = b"\x00" * 4
    mdat = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(mdat_body)) + mdat_body
    )
    payload = _b(b"ftyp", b"mp42" + b"\x00" * 8) + moov + mdat
    m = parse_mp4(payload)
    assert m["brand"] == "mp42"
    assert m["timescale"] == 90_000
    assert m["duration_ms"] == 3_000
    assert [t for t, _, _ in walk_boxes(payload)] == [b"ftyp", b"moov", b"mdat"]


def test_unknown_boxes_skipped_by_size():
    junk = _b(b"zzzz", b"\xff" * 21)
    payload = junk + encode_mp4_skeleton(1000, 8, 8)
    assert parse_mp4(payload)["duration_ms"] == 1000


def test_overrun_and_tiny_boxes_are_loud():
    good = encode_mp4_skeleton(1000, 8, 8)
    with pytest.raises(ValueError, match="overruns"):
        # declare a box larger than the remaining payload
        bad = struct.pack(">I", 10_000) + b"free" + good
        parse_mp4(bad)
    with pytest.raises(ValueError, match="size 2 < 8"):
        parse_mp4(struct.pack(">I", 2) + b"free")
    with pytest.raises(ValueError, match="no mvhd"):
        parse_mp4(_b(b"ftyp", b"isom" + b"\x00" * 8))
