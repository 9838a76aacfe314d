"""ISO base media file format (MP4, ISO/IEC 14496-12) box-level parser.

MP4 is the one capability-registry format whose SAMPLE DATA cannot be
decoded without codec libraries (H.264/AAC), so ``decode_rgb`` keeps
its NotImplementedError gate. But a 100 TB ingest still needs to
CATALOG MP4 payloads — duration, geometry, track layout, codec fourCC —
to route them (transcode queue, quarantine, license triage) without
decoding a single frame. All of that lives in the box structure, which
is pure spec: a length-prefixed tree of fourCC boxes. This module walks
it.

Box grammar (14496-12 §4.2): each box is ``u32 size | 4cc type |
payload``; size==1 switches to a u64 largesize, size==0 means
"to end of file"; container boxes (moov/trak/mdia/minf/stbl) nest
children directly; "full boxes" (mvhd/tkhd/mdhd) start with
``u8 version | u24 flags`` and widen their time fields to u64 at
version 1. Parsed here: ftyp (brand), mvhd (timescale/duration →
milliseconds), per-trak tkhd (dimensions, 16.16 fixed point) + hdlr
(handler type) + stsd (sample-entry codec fourCC). Unknown boxes are
skipped by size — the property that makes the format forward
compatible and the walker robust to real-world files. Truncated or
overrunning boxes raise named ValueErrors.
"""

from __future__ import annotations

import struct

#: Container boxes whose payload is a sequence of child boxes.
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


def _u64(b: bytes, off: int) -> int:
    return struct.unpack_from(">Q", b, off)[0]


def walk_boxes(payload: bytes, start: int = 0, end: int | None = None):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    end = len(payload) if end is None else end
    pos = start
    while pos + 8 <= end:
        size = _u32(payload, pos)
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if body + 8 > end:
                raise ValueError(f"mp4: truncated largesize box {btype!r} at {pos}")
            size = _u64(payload, body)
            body += 8
            if size < 16:
                raise ValueError(f"mp4: largesize {size} too small at {pos}")
            box_end = pos + size
        elif size == 0:  # to end of enclosing scope
            box_end = end
        elif size < 8:
            raise ValueError(f"mp4: box size {size} < 8 at {pos}")
        else:
            box_end = pos + size
        if box_end > end:
            raise ValueError(
                f"mp4: box {btype!r} at {pos} overruns its parent ({box_end} > {end})"
            )
        yield btype, body, box_end
        pos = box_end


def parse_mp4(payload: bytes) -> dict:
    """Parse MP4 structure into routing metadata: ``{brand,
    duration_ms, timescale, n_tracks, tracks: [{handler, codec, width,
    height}]}``. Walks only the box tree — no sample data is touched,
    so this is O(header bytes) regardless of media size (the property
    that lets a catalog pass over PB of video run at listing speed)."""
    if len(payload) < 8:
        raise ValueError("mp4: payload shorter than one box header")
    meta: dict = {"brand": None, "n_tracks": 0, "tracks": []}

    def visit(start: int, end: int) -> None:
        for btype, body, box_end in walk_boxes(payload, start, end):
            if btype == b"ftyp":
                meta["brand"] = payload[body : body + 4].decode("latin1")
            elif btype in _CONTAINERS:
                if btype == b"trak":
                    meta["n_tracks"] += 1
                    meta["tracks"].append({})
                visit(body, box_end)
            elif btype == b"mvhd":
                ver = payload[body]
                if ver == 1:
                    timescale = _u32(payload, body + 20)
                    duration = _u64(payload, body + 24)
                else:
                    timescale = _u32(payload, body + 12)
                    duration = _u32(payload, body + 16)
                meta["timescale"] = timescale
                meta["duration_ms"] = (
                    duration * 1000 // timescale if timescale else 0
                )
            elif btype == b"tkhd":
                ver = payload[body]
                # width/height are the LAST two u32s (16.16 fixed point)
                w = _u32(payload, box_end - 8) >> 16
                h = _u32(payload, box_end - 4) >> 16
                if meta["tracks"]:
                    meta["tracks"][-1].update(width=w, height=h)
            elif btype == b"hdlr":
                handler = payload[body + 8 : body + 12].decode("latin1")
                if meta["tracks"]:
                    meta["tracks"][-1]["handler"] = handler
            elif btype == b"stsd":
                # full box: ver/flags (4) + entry_count (4), then the
                # first sample entry is itself a box whose type is the
                # codec fourCC
                first = body + 8
                if first + 8 <= box_end:
                    codec = payload[first + 4 : first + 8].decode("latin1")
                    if meta["tracks"]:
                        meta["tracks"][-1]["codec"] = codec
            # mdat and unknown boxes: skipped by size

    visit(0, len(payload))
    if "duration_ms" not in meta:
        raise ValueError("mp4: no mvhd (movie header) box found")
    return meta


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def encode_mp4_skeleton(
    duration_ms: int,
    width: int,
    height: int,
    codec: bytes = b"avc1",
    timescale: int = 1000,
) -> bytes:
    """Canonical minimal MP4: ftyp + moov(mvhd, trak(tkhd, mdia(mdhd,
    hdlr, minf(stbl(stsd(<codec entry>)))))) + empty mdat. Carries real
    header semantics (duration in mvhd units, 16.16 dimensions in tkhd,
    codec fourCC in stsd) with no sample data — the writer for tests
    and the metadata round-trip query; the parser is additionally
    pinned against hand-assembled spec bytes so the two cannot cancel
    out a shared misreading."""
    duration = duration_ms * timescale // 1000
    if duration > 0xFFFFFFFF:
        # version-1 full box: 64-bit creation/modification/duration
        # (14496-12 §8.2.2.2) — what real muxers emit for long media
        mvhd = _box(
            b"mvhd",
            bytes([1, 0, 0, 0])
            + struct.pack(">QQIQ", 0, 0, timescale, duration)
            + b"\x00" * 80,
        )
    else:
        mvhd = _box(
            b"mvhd",
            struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration) + b"\x00" * 80,
        )
    # tkhd/mdhd duration fields are not parsed here; clamp to keep the
    # version-0 layout valid rather than emit an overflowed u32
    tk_dur = min(duration, 0xFFFFFFFF)
    tkhd = _box(
        b"tkhd",
        struct.pack(">BxxxIIII", 0, 0, 0, 1, tk_dur)
        + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16),
    )
    sample_entry = _box(codec, b"\x00" * 78)  # VisualSampleEntry-sized stub
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + sample_entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdhd = _box(
        b"mdhd", struct.pack(">BxxxIIII", 0, 0, 0, timescale, tk_dur) + b"\x00" * 4
    )
    hdlr = _box(b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 13)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = _box(b"mdat", b"")
    return ftyp + moov + mdat


from ..session import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)
