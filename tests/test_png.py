"""PNG decoder tests: an INDEPENDENT minimal encoder (spec-derived,
sharing no code with the decoder) produces real chunked/zlib streams —
every filter type, RGB/RGBA/gray/palette color types, 1/2/4/8/16-bit
depths, and Adam7 interlacing — that the decoder must reproduce exactly
(PNG is lossless; 16-bit keeps the high byte, sub-byte grays scale)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.png import decode_png

_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _row_bytes(row: np.ndarray, bit_depth: int) -> np.ndarray:
    """One scanline of samples (w, ch) → its byte serialization."""
    if bit_depth == 16:
        return np.frombuffer(row.astype(">u2").tobytes(), np.uint8)
    if bit_depth == 8:
        return row.astype(np.uint8).reshape(-1)
    per_sample = np.unpackbits(row.astype(np.uint8).reshape(-1, 1), axis=1)[
        :, 8 - bit_depth :
    ]
    return np.packbits(per_sample.reshape(-1))


def _filter_scanlines(
    sample_rows: list[np.ndarray], bit_depth: int, ch: int, filter_type: int
) -> bytes:
    """Apply ONE filter type to every scanline, byte-wise per spec."""
    bpp = max(1, ch * bit_depth // 8)
    out = bytearray()
    prev: np.ndarray | None = None
    for samples in sample_rows:
        cur = _row_bytes(samples, bit_depth).astype(np.int32)
        stride = len(cur)
        p = prev if prev is not None else np.zeros(stride, np.int32)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) if stride > bpp else np.zeros(stride, np.int32)
            enc = (cur - left) & 0xFF
        elif filter_type == 2:  # Up
            enc = (cur - p) & 0xFF
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) if stride > bpp else np.zeros(stride, np.int32)
            enc = (cur - ((left + p) >> 1)) & 0xFF
        else:  # Paeth

            def paeth(a, b, c):
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                if pa <= pb and pa <= pc:
                    return a
                if pb <= pc:
                    return b
                return c

            enc = cur.copy()
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                ul = int(p[i - bpp]) if i >= bpp else 0
                enc[i] = (int(cur[i]) - paeth(left, int(p[i]), ul)) & 0xFF
        out.append(filter_type)
        out += bytes(enc.astype(np.uint8))
        prev = cur
    return bytes(out)


def encode_png(
    img: np.ndarray,
    color_type: int = 2,
    filter_type: int = 0,
    palette: np.ndarray | None = None,
    bit_depth: int = 8,
    interlace: int = 0,
) -> bytes:
    """Minimal PNG encoder. ``img``: (H,W,3) RGB, (H,W,4) RGBA, (H,W)
    gray/palette-index; uint16 values for ``bit_depth=16``. Applies one
    filter type to every row; ``interlace=1`` writes Adam7 passes."""
    flat = img[:, :, None] if img.ndim == 2 else img
    h, w, ch = flat.shape

    def pass_stream(sub: np.ndarray) -> bytes:
        return _filter_scanlines(list(sub), bit_depth, ch, filter_type)

    if interlace:
        stream = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = flat[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                stream += pass_stream(sub)
        stream = bytes(stream)
    else:
        stream = pass_stream(flat)

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    )
    if palette is not None:
        out += _chunk(b"PLTE", bytes(palette.astype(np.uint8).reshape(-1)))
    out += _chunk(b"IDAT", zlib.compress(stream))
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


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_16bit_rgb_keeps_high_byte(ftype):
    rng = np.random.RandomState(40 + ftype)
    img = rng.randint(0, 65536, (9, 11, 3)).astype(np.uint16)
    out = decode_png(encode_png(img, color_type=2, filter_type=ftype, bit_depth=16))
    np.testing.assert_array_equal(out, (img >> 8).astype(np.uint8))


def test_16bit_gray():
    rng = np.random.RandomState(51)
    img = rng.randint(0, 65536, (5, 6)).astype(np.uint16)
    out = decode_png(encode_png(img, color_type=0, filter_type=2, bit_depth=16))
    np.testing.assert_array_equal(out[:, :, 0], (img >> 8).astype(np.uint8))


@pytest.mark.parametrize("depth,scale", [(1, 255), (2, 85), (4, 17)])
def test_subbyte_gray_scales_to_full_range(depth, scale):
    rng = np.random.RandomState(60 + depth)
    img = rng.randint(0, 1 << depth, (7, 13)).astype(np.uint8)
    out = decode_png(encode_png(img, color_type=0, filter_type=0, bit_depth=depth))
    np.testing.assert_array_equal(out[:, :, 0], img * scale)


def test_subbyte_palette():
    rng = np.random.RandomState(71)
    palette = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (6, 9)).astype(np.uint8)
    out = decode_png(
        encode_png(idx, color_type=3, filter_type=0, palette=palette, bit_depth=4)
    )
    np.testing.assert_array_equal(out, palette[idx])


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (8, 8), (13, 17), (16, 9)])
@pytest.mark.parametrize("ftype", [0, 1, 4])
def test_adam7_rgb_roundtrip(shape, ftype):
    rng = np.random.RandomState(shape[0] * 31 + ftype)
    img = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
    out = decode_png(encode_png(img, color_type=2, filter_type=ftype, interlace=1))
    np.testing.assert_array_equal(out, img)


def test_adam7_16bit_gray_alpha():
    rng = np.random.RandomState(83)
    img = rng.randint(0, 65536, (10, 7, 2)).astype(np.uint16)
    out = decode_png(
        encode_png(img, color_type=4, filter_type=2, bit_depth=16, interlace=1)
    )
    np.testing.assert_array_equal(out[:, :, 0], (img[:, :, 0] >> 8).astype(np.uint8))


def test_illegal_depth_combo_rejected():
    img = np.zeros((2, 2, 3), np.uint8)
    payload = bytearray(encode_png(img))
    depth_off = 8 + 8 + 8  # sig + len/type + w+h
    p = bytearray(payload)
    p[depth_off] = 4  # 4-bit RGB is spec-invalid
    with pytest.raises(ValueError, match="invalid PNG depth"):
        decode_png(bytes(p))
    p2 = bytearray(payload)
    p2[depth_off + 4] = 9  # bogus interlace method
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(p2))


def test_garbage_and_truncation_fail_loudly():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    img = np.zeros((4, 4, 3), np.uint8)
    payload = encode_png(img)
    with pytest.raises((ValueError, zlib.error, struct.error)):
        decode_png(payload[:40])
