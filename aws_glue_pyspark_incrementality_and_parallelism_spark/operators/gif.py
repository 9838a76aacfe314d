"""Dependency-free GIF codec (numpy + stdlib only).

Third codec closure for the E5 multimodal lane (after baseline JPEG and
PNG): a GIF87a/GIF89a *decoder* good enough for an ingest corpus —
global/local color tables, variable-width LZW with deferred clear,
interlacing, transparency against the logical-screen background, and
first-frame extraction from animated files — plus a spec-faithful LZW
*encoder* so round-trip queries and tests can fabricate real payloads.

Reference parity note: the reference ETL
(`glue_rds_to_redshift.py:28-47`) has no media handling at all; this
module belongs to the driver-mandated multimodal extension
(BASELINE.json:6). Everything here derives from the public GIF89a
specification (CompuServe, 1990) and the classic LZW literature.

Scale stance: the decoder is per-payload CPU with zero cross-row state,
invoked from ``decode_media``'s mapInPandas batches — embarrassingly
parallel, payload bytes never shuffle. The Python LZW loop is
per-symbol; for thumbnail/fixture-sized frames that is microseconds,
and at 100 TB the decode stage is I/O-bound on payload bytes long
before the symbol loop matters.
"""

from __future__ import annotations

import struct

import numpy as np

from ..session import pickle_module_by_value

_MAX_CODE = 1 << 12  # GIF LZW codes are capped at 12 bits


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block sequence starting at ``pos``; returns
    (data, position after the 0x00 terminator)."""
    chunks = []
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF: unterminated sub-block sequence")
        size = buf[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise ValueError("truncated GIF: sub-block overruns payload")
        chunks.append(buf[pos : pos + size])
        pos += size


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: variable code width (min+1 .. 12 bits,
    LSB-first), CLEAR resets the table, table growth stops at 4096
    (deferred-clear streams keep emitting 12-bit codes)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"invalid LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev: bytes | None = None
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + code_size <= nbits and len(out) < n_pixels:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(
            f"truncated GIF image data: {len(out)} of {n_pixels} pixels"
        )
    return bytes(out[:n_pixels])


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real dictionary LZW (not the fixed-width no-compression trick —
    the test suite's independent encoder uses that, so the two cannot
    share a bug). Emits CLEAR, grows code width in lockstep with the
    decoder's table, resets via CLEAR when the table fills."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"invalid LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    acc_bits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += code_size
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    def fresh_table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    emit(clear)
    prefix = b""
    for byte in indices:
        if byte >= clear:
            raise ValueError(f"index {byte} exceeds color table of {clear}")
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        if next_code < _MAX_CODE:
            table[cand] = next_code
            next_code += 1
            # The decoder's table trails the encoder's by one entry (the
            # KwKwK timing), so its width change lands one code later
            # than next_code reaching 2^width — grow at 2^width + 1.
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = fresh_table()
            next_code = eoi + 1
            code_size = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


#: GIF interlace passes: (row offset, row step) in storage order.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    order: list[int] = []
    for offset, step in _INTERLACE_PASSES:
        order.extend(range(offset, height, step))
    return order


def decode_gif_frames(payload: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """GIF payload → list of composited HxWx3 uint8 RGB frames (the
    logical screen after each rendering block).

    Full animation semantics: per-frame graphic control extensions
    (transparency index, disposal method) are honored — disposal 0/1
    leaves the frame composited for the next one, 2 restores the
    frame's rectangle to the background color, 3 restores the previous
    canvas. This is the dependency-free "video" decode path: an
    animated GIF is the one multi-frame format decodable without codec
    libraries, so the frame-sampling lane gets real decoded frames."""
    if not (payload.startswith(b"GIF87a") or payload.startswith(b"GIF89a")):
        raise ValueError("not a GIF87a/GIF89a payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF: no logical screen descriptor")
    width, height, flags, bg_index, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + n * 3 > len(payload):
            raise ValueError("truncated GIF: global color table overruns payload")
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    background = (
        gct[bg_index] if gct is not None and bg_index < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.empty((height, width, 3), np.uint8)
    canvas[:] = background
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated GIF: extension without label")
            label = payload[pos]
            pos += 1
            data, pos = _read_sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:
                disposal = (data[0] >> 2) & 0x07
                transparent = data[3] if data[0] & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unrecognized GIF block 0x{block:02x}")
        # image descriptor
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            if pos + n * 3 > len(payload):
                raise ValueError("truncated GIF: local color table overruns payload")
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image has neither global nor local color table")
        if left + iw > width or top + ih > height:
            raise ValueError("GIF frame extends beyond the logical screen")
        if pos >= len(payload):
            raise ValueError("truncated GIF: missing LZW minimum code size")
        min_code_size = payload[pos]
        pos += 1
        data, pos = _read_sub_blocks(payload, pos)
        idx = np.frombuffer(lzw_decode(data, min_code_size, iw * ih), np.uint8)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index exceeds color table")
        rows = idx.reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows are stored in pass order
            ordered = np.empty_like(rows)
            ordered[_interlace_order(ih)] = rows
            rows = ordered
        saved = canvas.copy() if disposal == 3 else None
        frame = ct[rows]  # (ih, iw, 3) palette lookup
        region = canvas[top : top + ih, left : left + iw]
        if transparent is not None and transparent < len(ct):
            opaque = rows != transparent
            region[opaque] = frame[opaque]
        else:
            region[:] = frame
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:  # restore the rect to background
            canvas[top : top + ih, left : left + iw] = background
        elif disposal == 3:  # restore the pre-frame canvas
            canvas = saved
        transparent = None  # a GCE applies to ONE rendering block
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF payload → HxWx3 uint8 RGB (the logical screen; first frame
    of an animation). Transparent pixels keep the background color."""
    return decode_gif_frames(payload, max_frames=1)[0]


def _frame_block(
    indices: np.ndarray,
    ct_bits: int,
    *,
    interlace: bool = False,
    left: int = 0,
    top: int = 0,
) -> bytes:
    """One image descriptor + dictionary-LZW pixel data in ≤255-byte
    sub-blocks (no local color table)."""
    h, w = indices.shape
    iflags = 0x40 if interlace else 0x00
    out = bytearray([0x2C]) + struct.pack("<HHHHB", left, top, w, h, iflags)
    rows = indices[_interlace_order(h)] if interlace else indices
    min_code_size = max(2, ct_bits)
    out.append(min_code_size)
    compressed = lzw_encode(rows.tobytes(), min_code_size)
    for i in range(0, len(compressed), 255):
        chunk = compressed[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0x00)
    return bytes(out)


def _gce(disposal: int, delay_cs: int, transparent: int | None) -> bytes:
    """Graphic control extension for the following rendering block."""
    packed = ((disposal & 0x07) << 2) | (0x01 if transparent is not None else 0x00)
    return bytes(
        [0x21, 0xF9, 0x04, packed, delay_cs & 0xFF, (delay_cs >> 8) & 0xFF,
         (transparent or 0) & 0xFF, 0x00]
    )


def _header(w: int, h: int, palette: np.ndarray, version: bytes) -> tuple[bytearray, int]:
    """GIF header + logical screen descriptor + global color table;
    returns (buffer, ct_bits)."""
    # GCT size: power of two ≥ max(palette size, 4); field stores log2-1.
    ct_bits = max(2, int(np.ceil(np.log2(len(palette)))))
    ct_size = 1 << ct_bits
    out = bytearray(version)
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0)
    table = np.zeros((ct_size, 3), np.uint8)
    table[: len(palette)] = palette
    out += table.tobytes()
    return out, ct_bits


def _check_frame(indices: np.ndarray, palette: np.ndarray) -> np.ndarray:
    indices = np.asarray(indices, np.uint8)
    if indices.ndim != 2:
        raise ValueError("indices must be HxW")
    if int(indices.max(initial=0)) >= len(palette):
        raise ValueError("index exceeds palette")
    return indices


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    *,
    interlace: bool = False,
    transparent: int | None = None,
    version: bytes = b"GIF89a",
) -> bytes:
    """Single-frame GIF writer: HxW uint8 palette indices + Nx3 palette
    → a real GIF payload (global color table, one image descriptor,
    dictionary-LZW pixel data in ≤255-byte sub-blocks)."""
    palette = np.asarray(palette, np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not len(palette):
        raise ValueError("palette must be Nx3")
    indices = _check_frame(indices, palette)
    h, w = indices.shape
    out, ct_bits = _header(w, h, palette, version)
    if transparent is not None:
        out += _gce(0, 0, transparent)
    out += _frame_block(indices, ct_bits, interlace=interlace)
    out.append(0x3B)
    return bytes(out)


def encode_gif_animation(
    frames: list[np.ndarray],
    palette: np.ndarray,
    *,
    delays_cs: list[int] | None = None,
    disposals: list[int] | None = None,
    transparents: list[int | None] | None = None,
    interlace: bool = False,
    version: bytes = b"GIF89a",
) -> bytes:
    """Animated GIF writer: each frame is HxW palette indices rendered
    full-screen with its own graphic control extension (delay in
    centiseconds, disposal method, optional transparency index)."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    palette = np.asarray(palette, np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not len(palette):
        raise ValueError("palette must be Nx3")
    checked = [_check_frame(f, palette) for f in frames]
    h, w = checked[0].shape
    if any(f.shape != (h, w) for f in checked):
        raise ValueError("all frames must share one geometry")
    out, ct_bits = _header(w, h, palette, version)
    for k, frame in enumerate(checked):
        delay = delays_cs[k] if delays_cs else 4
        disposal = disposals[k] if disposals else 1
        transparent = transparents[k] if transparents else None
        out += _gce(disposal, delay, transparent)
        out += _frame_block(frame, ct_bits, interlace=interlace)
    out.append(0x3B)
    return bytes(out)


# decode_gif runs inside mapInPandas workers (via multimodal.decode_rgb);
# ship it by value so executors never need the package on sys.path.
pickle_module_by_value(__name__)
