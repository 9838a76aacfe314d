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

from .jpeg import decode_baseline_jpeg

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
    # tkhd v0 (14496-12 §8.3.2): creation, modification, track_ID,
    # reserved u32, duration — then reserved[2]/layer/volume/matrix
    # (52 zero bytes) and 16.16 geometry; 84-byte body
    tkhd = _box(
        b"tkhd",
        struct.pack(">BxxxIIIII", 0, 0, 0, 1, 0, tk_dur)
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


#: Sample-entry fourCCs whose samples are independent baseline JPEGs
#: (motion-JPEG in ISO-BMFF); everything else needs a codec library.
_MJPEG_CODECS = (b"jpeg", b"mjpa")


def encode_mp4_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    fast_start: bool = True,
) -> bytes:
    """Wrap already-encoded JPEG payloads in a spec-real MP4: full
    sample tables — stsd('jpeg' VisualSampleEntry with true geometry),
    stts (uniform frame duration), stsc (one sample per chunk), stsz
    (per-sample sizes), stco (ABSOLUTE file offsets into mdat). The
    canonical writer for tests and the frame-decode queries;
    ``parse_mp4_samples`` is additionally pinned against hand-assembled
    spec bytes so writer and parser cannot cancel out a shared
    misreading.

    ``fast_start=True`` writes moov before mdat (the streaming-friendly
    layout); ``fast_start=False`` writes mdat first and trails the moov
    — the layout capture muxers produce, which the capability registry
    sub-types from the LAST 4 KB of the payload
    (multimodal.detect_format_col tail window). Both layouts parse and
    decode identically — stco offsets are absolute either way."""
    n = len(jpeg_frames)
    timescale = 1000
    dur = timescale // fps if fps else 0

    def moov(offsets: list[int]) -> bytes:
        mvhd = _box(
            b"mvhd",
            struct.pack(">BxxxIIII", 0, 0, 0, timescale, n * dur) + b"\x00" * 80,
        )
        # tkhd v0 spec layout: reserved u32 between track_ID and
        # duration (84-byte body) — external MP4 tools read duration
        # and geometry at the spec offsets
        tkhd = _box(
            b"tkhd",
            struct.pack(">BxxxIIIII", 0, 0, 0, 1, 0, n * dur)
            + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16),
        )
        # VisualSampleEntry (14496-12 §12.1.3): 6 reserved + data-ref
        # index, 16 pre_defined/reserved, geometry, 72 dpi fixed-point,
        # frame_count=1, 32-byte compressorname, depth, pre_defined=-1
        entry = _box(
            b"jpeg",
            b"\x00" * 6
            + struct.pack(">H", 1)
            + b"\x00" * 16
            + struct.pack(">HHIIIH", width, height, 0x00480000, 0x00480000, 0, 1)
            + b"\x00" * 32
            + struct.pack(">Hh", 24, -1),
        )
        stsd = _box(b"stsd", struct.pack(">II", 0, 1) + entry)
        stts = _box(
            b"stts",
            struct.pack(">II", 0, 0)
            if n == 0
            else struct.pack(">IIII", 0, 1, n, dur),
        )
        stsc = _box(b"stsc", struct.pack(">IIIII", 0, 1, 1, 1, 1))
        stsz = _box(
            b"stsz",
            struct.pack(">III", 0, 0, n)
            + b"".join(struct.pack(">I", len(f)) for f in jpeg_frames),
        )
        stco = _box(
            b"stco",
            struct.pack(">II", 0, n) + b"".join(struct.pack(">I", o) for o in offsets),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        mdhd = _box(
            b"mdhd", struct.pack(">BxxxIIII", 0, 0, 0, timescale, n * dur) + b"\x00" * 4
        )
        hdlr = _box(
            b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 13
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = _box(b"mdat", b"".join(jpeg_frames))
    if fast_start:
        # stco holds absolute offsets: fixed-width u32, so the moov
        # length is offset-independent — size with zeros, then rebuild
        header_len = len(ftyp) + len(moov([0] * n)) + 8  # +8 = mdat header
    else:
        # moov-at-end: mdat directly follows ftyp, so the sample
        # offsets are known without the size-then-rebuild pass
        header_len = len(ftyp) + 8
    offsets, pos = [], header_len
    for f in jpeg_frames:
        offsets.append(pos)
        pos += len(f)
    if fast_start:
        return ftyp + moov(offsets) + mdat
    return ftyp + mdat + moov(offsets)


def parse_mp4_samples(payload: bytes) -> dict:
    """Parse the first video track's SAMPLE TABLES and extract raw
    sample payloads: ``{codec, width, height, fps, n_frames, frames:
    list[bytes]}``. Full stsc expansion (sample→chunk mapping), stco
    absolute offsets, stsz sizes — the general spec path, not just the
    one-sample-per-chunk layout the encoder emits. Only MJPEG sample
    entries (fourCC 'jpeg'/'mjpa') are extractable without codec
    libraries; anything else raises NotImplementedError naming the
    fourCC, which the capability registry turns into a routing
    predicate upstream so no mixed corpus hits the raise mid-job."""
    tracks: list[dict] = []

    def visit(start: int, end: int) -> None:
        for btype, body, box_end in walk_boxes(payload, start, end):
            if btype in _CONTAINERS:
                if btype == b"trak":
                    tracks.append({})
                visit(body, box_end)
            elif not tracks:
                continue
            elif btype == b"tkhd":
                tracks[-1]["width"] = _u32(payload, box_end - 8) >> 16
                tracks[-1]["height"] = _u32(payload, box_end - 4) >> 16
            elif btype == b"mdhd":
                ver = payload[body]
                tracks[-1]["timescale"] = _u32(
                    payload, body + (20 if ver == 1 else 12)
                )
            elif btype == b"hdlr":
                tracks[-1]["handler"] = payload[body + 8 : body + 12].decode("latin1")
            elif btype == b"stsd":
                first = body + 8
                if first + 8 <= box_end:
                    tracks[-1]["codec"] = payload[first + 4 : first + 8]
            elif btype == b"stts":
                cnt = _u32(payload, body + 4)
                if cnt:
                    tracks[-1]["sample_dur"] = _u32(payload, body + 12)
            elif btype == b"stsc":
                cnt = _u32(payload, body + 4)
                tracks[-1]["stsc"] = [
                    (
                        _u32(payload, body + 8 + 12 * k),
                        _u32(payload, body + 12 + 12 * k),
                    )
                    for k in range(cnt)
                ]
            elif btype == b"stsz":
                fixed = _u32(payload, body + 4)
                cnt = _u32(payload, body + 8)
                tracks[-1]["sizes"] = (
                    [fixed] * cnt
                    if fixed
                    else [_u32(payload, body + 12 + 4 * k) for k in range(cnt)]
                )
            elif btype == b"stco":
                cnt = _u32(payload, body + 4)
                tracks[-1]["stco"] = [
                    _u32(payload, body + 8 + 4 * k) for k in range(cnt)
                ]

    visit(0, len(payload))
    vide = next((t for t in tracks if t.get("handler") == "vide"), None)
    if vide is None:
        raise ValueError("mp4: no video ('vide' handler) track found")
    codec = vide.get("codec", b"????")
    if codec not in _MJPEG_CODECS:
        raise NotImplementedError(
            f"mp4 video codec {codec.decode('latin1')!r}: only MJPEG "
            "('jpeg'/'mjpa' sample entries) is decodable without codec "
            "libraries"
        )
    sizes = vide.get("sizes", [])
    stco = vide.get("stco", [])
    stsc = vide.get("stsc", [])
    if not (sizes and stco and stsc):
        raise ValueError("mp4: video track missing stsz/stco/stsc sample tables")
    # stsc expansion: entry (first_chunk, samples_per_chunk) applies to
    # chunks [first_chunk, next_entry.first_chunk)
    frames: list[bytes] = []
    sample = 0
    for k, (first_chunk, spc) in enumerate(stsc):
        last_chunk = (
            stsc[k + 1][0] - 1 if k + 1 < len(stsc) else len(stco)
        )
        for chunk in range(first_chunk, last_chunk + 1):
            off = stco[chunk - 1]
            for _ in range(spc):
                if sample >= len(sizes):
                    break
                sz = sizes[sample]
                if off + sz > len(payload):
                    raise ValueError(
                        f"mp4: sample {sample} (offset {off}, size {sz}) "
                        "overruns the payload"
                    )
                frames.append(payload[off : off + sz])
                off += sz
                sample += 1
    if sample != len(sizes):
        raise ValueError(
            f"mp4: sample tables inconsistent — stsz names {len(sizes)} "
            f"samples but stsc/stco cover {sample}"
        )
    ts = vide.get("timescale", 0)
    dur = vide.get("sample_dur", 0)
    return {
        "codec": codec.decode("latin1"),
        "width": vide.get("width", 0),
        "height": vide.get("height", 0),
        "fps": ts // dur if dur else 0,
        "n_frames": len(frames),
        "frames": frames,
    }


def decode_mp4_frames(payload: bytes) -> tuple[dict, list]:
    """Parse + per-frame MJPEG decode: returns (meta-without-bytes,
    [HxWx3 uint8 arrays]) — the MP4 mirror of ``avi.decode_avi_frames``.
    Each sample is an independent baseline JPEG, so decode parallelizes
    at frame granularity with zero inter-frame state."""
    meta = parse_mp4_samples(payload)
    frames = [decode_baseline_jpeg(f) for f in meta.pop("frames")]
    return meta, frames


from ..session import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)
