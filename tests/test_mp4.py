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


class TestMp4MjpegSamples:
    """Round-4 E5 close: MJPEG-in-MP4 sample extraction + frame decode
    (the mirror of the AVI lane), with the stsc expansion pinned
    against hand-assembled multi-sample-per-chunk tables the encoder
    itself never emits."""

    def _frames(self, n=3, w=16, h=8):
        import numpy as np

        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.multimodal import (
            encode_gray_baseline,
        )

        srcs = [
            (np.arange(w * h, dtype=np.uint8).reshape(h, w) + 7 * k) for k in range(n)
        ]
        return srcs, [encode_gray_baseline(s) for s in srcs]

    def test_mux_parse_decode_roundtrip(self):
        import numpy as np

        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
            decode_mp4_frames,
            encode_mp4_mjpeg,
            parse_mp4_samples,
        )

        srcs, jpgs = self._frames()
        payload = encode_mp4_mjpeg(jpgs, 16, 8, fps=12)
        meta = parse_mp4_samples(payload)
        assert meta["frames"] == jpgs, "sample extraction must be byte-exact"
        assert (meta["codec"], meta["width"], meta["height"], meta["fps"]) == (
            "jpeg", 16, 8, 12,
        )
        m2, decoded = decode_mp4_frames(payload)
        assert m2["n_frames"] == 3
        for d, s in zip(decoded, srcs):
            assert int(np.max(np.abs(d[:, :, 0].astype(int) - s.astype(int)))) <= 4

    def test_generic_metadata_parser_agrees(self):
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
            encode_mp4_mjpeg,
            parse_mp4,
        )

        _, jpgs = self._frames()
        m = parse_mp4(encode_mp4_mjpeg(jpgs, 16, 8, fps=12))
        assert m["tracks"][0]["codec"] == "jpeg"
        assert m["duration_ms"] == 3 * (1000 // 12)  # n * per-frame ms

    def test_non_mjpeg_codec_raises_named(self):
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
            encode_mp4_skeleton,
            parse_mp4_samples,
        )

        with pytest.raises(NotImplementedError, match="avc1"):
            parse_mp4_samples(encode_mp4_skeleton(1000, 64, 48, codec=b"avc1"))

    def test_stsc_multi_sample_chunks_hand_assembled(self):
        """Two chunks x two samples, then one chunk x one sample —
        stsc layout the encoder never writes, parsed from spec bytes."""
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
            parse_mp4_samples,
        )

        samples = [b"s0", b"s1!", b"s2ab", b"s3cde", b"s4"]
        # layout: chunk1=[s0,s1], chunk2=[s2,s3], chunk3=[s4]
        stsd = _b(b"stsd", struct.pack(">II", 0, 1) + _b(b"jpeg", b"\x00" * 78))
        stts = _b(b"stts", struct.pack(">IIII", 0, 1, 5, 100))
        stsc = _b(b"stsc", struct.pack(">I", 0) + struct.pack(">I", 2)
                  + struct.pack(">III", 1, 2, 1) + struct.pack(">III", 3, 1, 1))
        stsz = _b(b"stsz", struct.pack(">III", 0, 0, 5)
                  + b"".join(struct.pack(">I", len(s)) for s in samples))

        def build(offsets):
            stco = _b(b"stco", struct.pack(">II", 0, 3)
                      + b"".join(struct.pack(">I", o) for o in offsets))
            stbl = _b(b"stbl", stsd + stts + stsc + stsz + stco)
            mdhd = _b(b"mdhd", struct.pack(">BxxxIIII", 0, 0, 0, 1000, 500) + b"\x00" * 4)
            hdlr = _b(b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 13)
            tkhd = _b(b"tkhd", struct.pack(">BxxxIIIII", 0, 0, 0, 1, 0, 500)
                      + b"\x00" * 52 + struct.pack(">II", 8 << 16, 8 << 16))
            trak = _b(b"trak", tkhd + _b(b"mdia", mdhd + hdlr + _b(b"minf", stbl)))
            mvhd = _b(b"mvhd", struct.pack(">BxxxIIII", 0, 0, 0, 1000, 500) + b"\x00" * 80)
            moov = _b(b"moov", mvhd + trak)
            ftyp = _b(b"ftyp", b"isom" + b"\x00" * 8)
            return ftyp, moov

        ftyp, moov = build([0, 0, 0])
        base = len(ftyp) + len(moov) + 8
        offs = [base, base + len(samples[0]) + len(samples[1]),
                base + sum(len(s) for s in samples[:4])]
        ftyp, moov = build(offs)
        payload = ftyp + moov + _b(b"mdat", b"".join(samples))
        meta = parse_mp4_samples(payload)
        assert meta["frames"] == samples
        assert meta["fps"] == 10  # timescale 1000 / dur 100

    def test_registry_routes_mjpeg_mp4_decodable(self, spark):
        """Routing: fast-start MJPEG MP4 → 'mp4 (mjpeg)' decodable lane;
        avc1 MP4 stays deferred; the decode stage returns real pixels
        for the routed payload (no NotImplementedError mid-job)."""
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
            encode_mp4_mjpeg,
            encode_mp4_skeleton,
        )
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.multimodal import (
            decode_or_defer,
            supported_formats,
        )

        assert "mp4 (mjpeg)" in supported_formats()
        assert "mp4/iso-bmff" not in supported_formats()

        _, jpgs = self._frames()
        rows = [
            (1, bytearray(encode_mp4_mjpeg(jpgs, 16, 8, fps=12))),
            (2, bytearray(encode_mp4_skeleton(1000, 64, 48, codec=b"avc1"))),
        ]
        media = spark.createDataFrame(rows, "doc_id long, payload binary")
        decoded, deferred = decode_or_defer(media)
        dec = {r.doc_id: r for r in decoded.collect()}
        defr = {r.doc_id: r.format for r in deferred.collect()}
        assert set(dec) == {1} and dec[1].width == 16 and dec[1].height == 8
        assert defr == {2: "mp4/iso-bmff"}

    def test_moov_at_end_layout_roundtrip_and_tail_sniff(self, spark):
        """Round-5 slice: fast_start=False trails the moov after mdat —
        the capture-muxer layout. The parser/decoder are layout-blind
        (absolute stco offsets) and routing sub-types it from the TAIL
        window, so the payload lands in the decodable lane."""
        import numpy as np

        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
            decode_mp4_frames,
            encode_mp4_mjpeg,
        )
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.multimodal import (
            decode_or_defer,
        )

        srcs, jpgs = self._frames()
        payload = encode_mp4_mjpeg(jpgs, 16, 8, fps=12, fast_start=False)
        assert payload.find(b"moov") > payload.find(b"mdat")
        meta, frames = decode_mp4_frames(payload)
        assert meta["n_frames"] == 3 and len(frames) == 3
        for frame, src in zip(frames, srcs):
            assert int(np.max(np.abs(frame[:, :, 0].astype(int) - src.astype(int)))) <= 4

        media = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, payload binary"
        )
        decoded, deferred = decode_or_defer(media)
        assert deferred.count() == 0
        row = decoded.collect()[0]
        assert (row.width, row.height) == (16, 8)

    def test_sniff_is_structural_and_decode_errors_reroute(self, spark):
        """ADVICE r4: (a) a 'jpeg'+NULs pattern floating in early mdat
        of an avc1 MP4 must NOT route to the MJPEG lane (the sniff is
        anchored at the stsd sample-entry offset); (b) a payload that
        DOES sniff as decodable but fails to decode reroutes to the
        deferred lane instead of aborting the job."""
        import struct as st

        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
            _box,
            encode_mp4_mjpeg,
            encode_mp4_skeleton,
        )
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.multimodal import (
            decode_or_defer,
        )

        ftyp = _box(b"ftyp", b"isom" + st.pack(">I", 512) + b"isomiso2")
        avc = encode_mp4_skeleton(1000, 8, 8, codec=b"avc1")
        adversarial = (
            ftyp
            + _box(b"mdat", b"xx" + b"jpeg" + b"\x00" * 6 + b"yy")
            + avc[len(ftyp):]
        )
        _, jpgs = self._frames()
        good = encode_mp4_mjpeg(jpgs, 16, 8, fps=12)
        truncated = good[: len(good) - 20]  # stco points past EOF
        rows = [
            (1, bytearray(adversarial)),
            (2, bytearray(good)),
            (3, bytearray(truncated)),
        ]
        media = spark.createDataFrame(rows, "doc_id long, payload binary")
        decoded, deferred = decode_or_defer(media)
        assert {r.doc_id for r in decoded.collect()} == {2}
        defr = {r.doc_id: r.format for r in deferred.collect()}
        assert defr[1] == "mp4/iso-bmff"  # structural sniff: not MJPEG
        assert defr[3] == "mp4 (mjpeg)"  # sniffed decodable, rerouted on error

    def test_long_moov_at_end_video_routes_decodable(self, spark):
        """A moov-at-end video long enough that its sample tables push
        the stsd box PAST a 4 KB tail window (the round-5 initial
        window) must still route to the decodable lane — the tail
        window is 64 KB, reaching stsd through ~16 bytes/frame of
        stsz+stco for videos up to ~4000 frames."""
        import numpy as np

        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.jpeg import (
            encode_gray_baseline,
        )
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
            encode_mp4_mjpeg,
        )
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.multimodal import (
            decode_or_defer,
        )

        frame = encode_gray_baseline(np.arange(64, dtype=np.uint8).reshape(8, 8))
        n = 1000
        payload = encode_mp4_mjpeg([frame] * n, 8, 8, fps=30, fast_start=False)
        moov_at = payload.find(b"moov")
        assert moov_at > payload.find(b"mdat")
        moov_size = len(payload) - (moov_at - 4)
        assert moov_size > 4096, "fixture must defeat a 4 KB tail window"
        # stsd itself must sit beyond 4 KB from EOF but inside 64 KB
        stsd_from_eof = len(payload) - payload.find(b"stsd")
        assert 4096 < stsd_from_eof <= 65536

        media = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, payload binary"
        )
        decoded, deferred = decode_or_defer(media)
        assert deferred.count() == 0
        row = decoded.collect()[0]
        assert (row.width, row.height) == (8, 8)

    def test_fake_stsd_bytes_before_moov_do_not_shadow(self, spark):
        """ADVICE r5: a coincidental 'stsd' byte run that the tail
        window picks up BEFORE the real moov box (JPEG entropy data in
        an mdat prefix, here a skippable 'free' box) must not shadow
        the real sample description — a first-occurrence anchor read
        garbage fourCC and silently deferred a decodable file. The
        sniff now anchors on the first 'stsd' AFTER 'moov' (and,
        independently, the LAST occurrence), so the file still routes
        to the decodable lane."""
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.mp4 import (
            _box,
            encode_mp4_mjpeg,
        )
        from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.multimodal import (
            decode_or_defer,
        )

        _, jpgs = self._frames()
        payload = encode_mp4_mjpeg(jpgs, 16, 8, fps=12, fast_start=False)
        moov_start = payload.find(b"moov") - 4  # box size field precedes tag
        # a skippable box whose body carries a fake 'stsd' + garbage
        # "fourCC" bytes, spliced between mdat and moov: stco offsets
        # (absolute, into the untouched mdat prefix) stay valid
        fake = _box(b"free", b"!!stsd" + b"\x00" * 24)
        adversarial = payload[:moov_start] + fake + payload[moov_start:]
        assert adversarial.find(b"stsd") < adversarial.find(b"moov")

        media = spark.createDataFrame(
            [(1, bytearray(adversarial))], "doc_id long, payload binary"
        )
        decoded, deferred = decode_or_defer(media)
        assert deferred.count() == 0, "fake stsd shadowed the real box"
        row = decoded.collect()[0]
        assert (row.width, row.height) == (16, 8)
