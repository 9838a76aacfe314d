"""PNG decoder tests: an INDEPENDENT minimal encoder (spec-derived,
sharing no code with the decoder) produces real chunked/zlib streams —
including every filter type, RGB/RGBA/gray/palette color types — that
the decoder must reproduce exactly (PNG is lossless)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.png import decode_png


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    img: np.ndarray,
    color_type: int = 2,
    filter_type: int = 0,
    palette: np.ndarray | None = None,
) -> bytes:
    """Minimal PNG encoder. ``img``: (H,W,3) for RGB, (H,W,4) for RGBA,
    (H,W) for gray/palette-index. Applies ONE filter type to every row
    (0/1/2/3/4) — enough to exercise each reconstruction path."""
    if img.ndim == 2:
        h, w = img.shape
        ch = 1
        flat = img[:, :, None]
    else:
        h, w, ch = img.shape
        flat = img
    stride = w * ch

    rows = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = flat[y].reshape(-1).astype(np.int32)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:  # Paeth

            def paeth(a, b, c):
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    return a
                if pb <= pc:
                    return b
                return c

            enc = cur.copy()
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                enc[i] = (int(cur[i]) - paeth(left, int(prev[i]), ul)) & 0xFF
        rows.append(filter_type)
        rows += bytes(enc.astype(np.uint8))
        prev = cur

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if palette is not None:
        out += _chunk(b"PLTE", bytes(palette.astype(np.uint8).reshape(-1)))
    out += _chunk(b"IDAT", zlib.compress(bytes(rows)))
    out += _chunk(b"IEND", b"")
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_rgb_roundtrip_every_filter(ftype):
    rng = np.random.RandomState(ftype)
    img = rng.randint(0, 256, (13, 17, 3)).astype(np.uint8)
    out = decode_png(encode_png(img, color_type=2, filter_type=ftype))
    np.testing.assert_array_equal(out, img)


def test_gray_replicates_channels():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (6, 5)).astype(np.uint8)
    out = decode_png(encode_png(img, color_type=0, filter_type=2))
    assert out.shape == (6, 5, 3)
    np.testing.assert_array_equal(out[:, :, 0], img)
    np.testing.assert_array_equal(out[:, :, 1], img)


def test_rgba_drops_alpha():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (4, 7, 4)).astype(np.uint8)
    out = decode_png(encode_png(img, color_type=6, filter_type=1))
    np.testing.assert_array_equal(out, img[:, :, :3])


def test_palette_lookup():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    out = decode_png(encode_png(idx, color_type=3, filter_type=0, palette=palette))
    np.testing.assert_array_equal(out, palette[idx])


def test_interlaced_and_16bit_rejected_loudly():
    img = np.zeros((2, 2, 3), np.uint8)
    payload = bytearray(encode_png(img))
    # IHDR data starts at offset 16: w(4) h(4) depth comp filt interlace
    depth_off = 8 + 8 + 8  # sig + len/type + w+h
    p16 = bytearray(payload)
    p16[depth_off] = 16
    # CRC now wrong but IHDR parse happens before any CRC enforcement
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_png(bytes(p16))
    pi = bytearray(payload)
    pi[depth_off + 4] = 1  # interlace flag
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(bytes(pi))


def test_garbage_and_truncation_fail_loudly():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    img = np.zeros((4, 4, 3), np.uint8)
    payload = encode_png(img)
    with pytest.raises((ValueError, zlib.error, struct.error)):
        decode_png(payload[:40])
