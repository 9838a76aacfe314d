"""GIF codec tests.

The engine decoder is exercised against an INDEPENDENT encoder written
here from the GIF89a spec: it uses the fixed-width "no-compression" LZW
construction (a CLEAR code before every run of ``clear-1`` literals, so
the code width never grows) with its own LSB-first bit packer — a
different construction from the engine's dictionary encoder, so the two
cannot cancel out a shared bug.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


class _BitWriter:
    """LSB-first bit packer (independent of the engine's)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, code: int, width: int) -> None:
        for i in range(width):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                byte |= bit << j
            out.append(byte)
        return bytes(out)


def naive_lzw(indices: bytes, min_code_size: int) -> bytes:
    """Fixed-width LZW: re-CLEAR before the decoder's table could force
    a width change, then emit every pixel as a literal code."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    w = _BitWriter()
    # After a CLEAR the decoder appends one entry per literal after the
    # first; width grows once the table reaches 2*clear, i.e. after
    # clear-1 literals. Stay strictly below that.
    run = clear - 2
    for start in range(0, len(indices), run):
        w.write(clear, width)
        for byte in indices[start : start + run]:
            w.write(byte, width)
    if not indices:
        w.write(clear, width)
    w.write(eoi, width)
    return w.bytes()


def naive_gif(
    indices: np.ndarray, palette: np.ndarray, *, interlace: bool = False
) -> bytes:
    """Spec-derived single-frame writer around ``naive_lzw``."""
    h, w = indices.shape
    ct_bits = max(2, int(np.ceil(np.log2(len(palette)))))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0)
    table = np.zeros((1 << ct_bits, 3), np.uint8)
    table[: len(palette)] = palette
    out += table.tobytes()
    iflags = 0x40 if interlace else 0x00
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        indices = indices[order]
    min_code = max(2, ct_bits)
    out.append(min_code)
    data = naive_lzw(indices.tobytes(), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += bytes([0x00, 0x3B])
    return bytes(out)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def test_lzw_roundtrip_simple():
    data = bytes([0, 1, 2, 1, 0, 3, 3, 3, 2, 1, 0])
    assert lzw_decode(lzw_encode(data, 2), 2, len(data)) == data


def test_lzw_roundtrip_random_all_widths():
    rng = _rng(7)
    for min_code in (2, 4, 8):
        data = bytes(rng.integers(0, 1 << min_code, 5000, dtype=np.uint8))
        assert lzw_decode(lzw_encode(data, min_code), min_code, len(data)) == data


def test_lzw_table_full_reset_roundtrip():
    # 60k random bytes over 256 symbols forces the dictionary past 4096
    # entries -> encoder emits CLEAR mid-stream; decoder must resync.
    rng = _rng(11)
    data = bytes(rng.integers(0, 256, 60000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(data, 8), 8, len(data)) == data


def test_engine_decodes_foreign_lzw():
    rng = _rng(13)
    data = bytes(rng.integers(0, 16, 3000, dtype=np.uint8))
    assert lzw_decode(naive_lzw(data, 4), 4, len(data)) == data


def test_gif_roundtrip_random():
    rng = _rng(17)
    idx = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    palette = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    out = decode_gif(encode_gif(idx, palette))
    np.testing.assert_array_equal(out, palette[idx])


def test_gif_roundtrip_small_palette():
    rng = _rng(19)
    idx = rng.integers(0, 3, (9, 7), dtype=np.uint8)
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    out = decode_gif(encode_gif(idx, palette))
    np.testing.assert_array_equal(out, palette[idx])


def test_gif_decodes_foreign_payload():
    rng = _rng(23)
    idx = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    palette = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    out = decode_gif(naive_gif(idx, palette))
    np.testing.assert_array_equal(out, palette[idx])


@pytest.mark.parametrize("height", [1, 7, 8, 29])
def test_gif_interlace_roundtrip(height):
    rng = _rng(29 + height)
    idx = rng.integers(0, 64, (height, 13), dtype=np.uint8)
    palette = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    engine = decode_gif(encode_gif(idx, palette, interlace=True))
    foreign = decode_gif(naive_gif(idx, palette, interlace=True))
    np.testing.assert_array_equal(engine, palette[idx])
    np.testing.assert_array_equal(foreign, palette[idx])


def test_gif_transparency_keeps_background():
    # Palette: bg=0 is blue; index 1 red, declared transparent.
    palette = np.array([[0, 0, 255], [255, 0, 0], [0, 255, 0]], np.uint8)
    idx = np.array([[1, 2], [2, 1]], np.uint8)
    out = decode_gif(encode_gif(idx, palette, transparent=1))
    expected = np.array(
        [[[0, 0, 255], [0, 255, 0]], [[0, 255, 0], [0, 0, 255]]], np.uint8
    )
    np.testing.assert_array_equal(out, expected)


def test_gif_animated_returns_first_frame():
    rng = _rng(31)
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    first = rng.integers(0, 16, (6, 6), dtype=np.uint8)
    second = rng.integers(0, 16, (6, 6), dtype=np.uint8)
    payload = bytearray(encode_gif(first, palette))
    assert payload[-1] == 0x3B
    frame2 = bytearray([0x2C]) + struct.pack("<HHHHB", 0, 0, 6, 6, 0)
    frame2.append(4)
    data = lzw_encode(second.tobytes(), 4)
    frame2.append(len(data))
    frame2 += data
    frame2 += bytes([0x00])
    payload[-1:] = frame2 + bytes([0x3B])
    out = decode_gif(bytes(payload))
    np.testing.assert_array_equal(out, palette[first])


def test_gif_local_color_table_wins():
    # Build a payload whose image block carries a local table that
    # inverts the global one; decode must use the local table.
    palette = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    local = palette[::-1].copy()
    idx = np.array([[0, 1]], np.uint8)
    base = bytearray(encode_gif(idx, palette))
    # find the image descriptor (0x2C after the 6+7+GCT header region)
    img_at = base.index(0x2C, 13)
    iflags = base[img_at + 9]
    rebuilt = bytearray(base[:img_at])
    rebuilt += bytes([0x2C]) + base[img_at + 1 : img_at + 9]
    rebuilt.append(iflags | 0x80 | 0x00)  # local table, size bits 0 -> 2 entries...
    # size field: 2 << (bits) entries; need 4 min -> use existing gct bits
    rebuilt[-1] = iflags | 0x80 | 0x01  # 2<<1 = 4 entries
    table = np.zeros((4, 3), np.uint8)
    table[:2] = local
    rebuilt += table.tobytes()
    rebuilt += base[img_at + 10 :]
    out = decode_gif(bytes(rebuilt))
    np.testing.assert_array_equal(out[0, 0], local[0])
    np.testing.assert_array_equal(out[0, 1], local[1])


def test_gif_87a_accepted():
    idx = np.zeros((2, 2), np.uint8)
    palette = np.array([[7, 8, 9]], np.uint8)
    out = decode_gif(encode_gif(idx, palette, version=b"GIF87a"))
    assert (out == [7, 8, 9]).all()


def test_gif_rejects_bad_magic_and_truncation():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    rng = _rng(37)
    idx = rng.integers(0, 16, (8, 8), dtype=np.uint8)
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    payload = encode_gif(idx, palette)
    with pytest.raises(ValueError):
        decode_gif(payload[: len(payload) // 2])


def test_gif_rejects_index_beyond_palette():
    with pytest.raises(ValueError, match="exceeds palette"):
        encode_gif(np.full((2, 2), 5, np.uint8), np.zeros((3, 3), np.uint8))


# ---- animation / multi-frame decode ----

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.gif import (  # noqa: E402
    decode_gif_frames,
    encode_gif_animation,
)


def test_animation_full_frames_roundtrip():
    rng = _rng(41)
    palette = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    frames = [rng.integers(0, 256, (5, 9), dtype=np.uint8) for _ in range(4)]
    decoded = decode_gif_frames(encode_gif_animation(frames, palette))
    assert len(decoded) == 4
    for idx, out in zip(frames, decoded):
        np.testing.assert_array_equal(out, palette[idx])


def test_animation_disposal_none_composites_transparency():
    # disposal 1 + transparency: frame 2's transparent pixels must show
    # frame 1's pixels (not the background).
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)
    f1 = np.full((2, 2), 1, np.uint8)  # all red
    f2 = np.array([[0, 2], [2, 0]], np.uint8)  # 0 = transparent
    payload = encode_gif_animation(
        [f1, f2], palette, disposals=[1, 1], transparents=[None, 0]
    )
    decoded = decode_gif_frames(payload)
    red, green = palette[1], palette[2]
    np.testing.assert_array_equal(decoded[0], palette[f1])
    expected = np.array([[red, green], [green, red]], np.uint8)
    np.testing.assert_array_equal(decoded[1], expected)


def test_animation_disposal_background_resets_rect():
    # disposal 2 after frame 1: frame 2's transparent pixels show the
    # BACKGROUND color (palette[0]), not frame 1's pixels.
    palette = np.array([[9, 9, 9], [255, 0, 0], [0, 255, 0]], np.uint8)
    f1 = np.full((2, 2), 1, np.uint8)
    f2 = np.array([[0, 2], [2, 0]], np.uint8)
    payload = encode_gif_animation(
        [f1, f2], palette, disposals=[2, 1], transparents=[None, 0]
    )
    decoded = decode_gif_frames(payload)
    bg, green = palette[0], palette[2]
    expected = np.array([[bg, green], [green, bg]], np.uint8)
    np.testing.assert_array_equal(decoded[1], expected)


def test_animation_disposal_previous_restores_canvas():
    # disposal 3 on frame 2: frame 3's transparent pixels must show
    # frame 1's pixels again (frame 2 was reverted).
    palette = np.array([[9, 9, 9], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    f1 = np.full((2, 2), 1, np.uint8)  # red
    f2 = np.full((2, 2), 2, np.uint8)  # green, disposal=previous
    f3 = np.array([[0, 3], [3, 0]], np.uint8)  # 0 transparent
    payload = encode_gif_animation(
        [f1, f2, f3], palette, disposals=[1, 3, 1], transparents=[None, None, 0]
    )
    decoded = decode_gif_frames(payload)
    np.testing.assert_array_equal(decoded[1], palette[f2])
    red, blue = palette[1], palette[3]
    expected = np.array([[red, blue], [blue, red]], np.uint8)
    np.testing.assert_array_equal(decoded[2], expected)


def test_animation_max_frames_stops_early():
    rng = _rng(43)
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    frames = [rng.integers(0, 16, (3, 3), dtype=np.uint8) for _ in range(5)]
    decoded = decode_gif_frames(encode_gif_animation(frames, palette), max_frames=2)
    assert len(decoded) == 2
    np.testing.assert_array_equal(decoded[0], palette[frames[0]])
