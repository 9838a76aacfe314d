"""Dependency-free PNG decoder (stdlib zlib + numpy).

Extends the E5 decodable set to PNG — the dominant lossless web
format — with the same dependency budget as the PPM/BMP/JPEG/GIF paths:
DEFLATE comes from Python's stdlib ``zlib``, everything else is chunk
parsing, per-row unfiltering, and numpy reshapes, all from the public
PNG spec (RFC 2083 / W3C PNG).

Supported: every legal bit depth / color type combination — 1/2/4/8-bit
grayscale and palette, 8/16-bit gray, RGB, gray+alpha and RGBA — plus
Adam7 interlacing. Alpha is dropped and 16-bit samples keep their high
byte (the decode contract is HxWx3 uint8 RGB); sub-byte grays scale to
full range (255/3/15 steps). Corrupt payloads and spec-invalid
depth/color combinations raise ``ValueError``.

Filter reconstruction: Up/None are vectorized; Sub/Average/Paeth are
per-pixel sequential by definition (each pixel depends on the
reconstructed left neighbor), so those rows run a short Python loop —
fine for fixture/thumbnail payloads, and the mapInPandas decode stage
parallelizes across payloads anyway. Filters operate on scanline BYTES
(per spec), so one unfilter routine serves every depth.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: legal bit depths per color type (PNG spec §11.2.2)
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

#: Adam7 passes: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, off: int, height: int, stride: int, bpp: int):
    """Reconstruct ``height`` scanlines of ``stride`` bytes starting at
    ``off`` in the decompressed stream; returns ((h, stride) uint8 array,
    offset after the last scanline)."""
    if len(raw) < off + height * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(height):
        ftype = raw[off]
        row = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1).astype(np.int32)
        off += stride + 1
        if ftype == 0:  # None
            recon = row
        elif ftype == 2:  # Up
            recon = (row + prev) & 0xFF
        elif ftype == 1:  # Sub
            recon = row.copy()
            for i in range(bpp, stride):
                recon[i] = (recon[i] + recon[i - bpp]) & 0xFF
        elif ftype == 3:  # Average
            recon = row.copy()
            for i in range(stride):
                left = recon[i - bpp] if i >= bpp else 0
                recon[i] = (recon[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = row.copy()
            for i in range(stride):
                left = recon[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                recon[i] = (recon[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = recon
        prev = recon
    return out, off


def _to_samples(rows: np.ndarray, width: int, ch: int, depth: int) -> np.ndarray:
    """Scanline bytes (h, stride) → samples (h, width, ch); dtype uint16
    for 16-bit, uint8 otherwise. Sub-byte rows unpack MSB-first and drop
    the scanline's padding bits."""
    h = rows.shape[0]
    if depth == 16:
        pairs = rows.reshape(h, width * ch, 2).astype(np.uint16)
        return ((pairs[:, :, 0] << 8) | pairs[:, :, 1]).reshape(h, width, ch)
    if depth == 8:
        return rows.reshape(h, width, ch)
    # depth in (1, 2, 4): single-channel by spec
    bits = np.unpackbits(rows, axis=1)[:, : width * depth].reshape(h, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[:, :, None]


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to an HxWx3 uint8 RGB array."""
    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload (missing signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette: np.ndarray | None = None
    idat = bytearray()
    n = len(payload)

    while pos + 8 <= n:
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if color_type not in _CHANNELS:
                raise ValueError(f"invalid PNG color type {color_type}")
            if bit_depth not in _LEGAL_DEPTHS[color_type]:
                raise ValueError(
                    f"invalid PNG depth {bit_depth} for color type {color_type}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"invalid PNG interlace method {interlace}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break

    if width is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    raw = zlib.decompress(bytes(idat))
    ch = _CHANNELS[color_type]
    bpp = max(1, ch * bit_depth // 8)  # filter distance in BYTES

    def stride_of(w: int) -> int:
        return (w * ch * bit_depth + 7) // 8

    if interlace == 0:
        rows, _ = _unfilter(raw, 0, height, stride_of(width), bpp)
        samples = _to_samples(rows, width, ch, bit_depth)
    else:  # Adam7: seven independently-filtered reduced images
        dtype = np.uint16 if bit_depth == 16 else np.uint8
        samples = np.zeros((height, width, ch), dtype)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes zero scanlines
            rows, off = _unfilter(raw, off, ph, stride_of(pw), bpp)
            samples[y0::dy, x0::dx] = _to_samples(rows, pw, ch, bit_depth)

    if color_type == 3:  # palette: indices, never scaled
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[idx]
    if bit_depth == 16:  # keep the high byte (uint8 contract)
        samples = (samples >> 8).astype(np.uint8)
    elif bit_depth < 8:  # scale 1/2/4-bit gray to full range
        samples = (samples * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
    if color_type == 2:  # RGB
        return samples.copy()
    if color_type == 6:  # RGBA -> drop alpha
        return samples[:, :, :3].copy()
    g = samples[:, :, 0]  # gray / gray+alpha
    return np.stack([g, g, g], axis=2)


from ..session import pickle_module_by_value  # noqa: E402

# Worker-side functions (decode runs inside mapInPandas closures): ship
# by value so executors never need the package on their own sys.path.
pickle_module_by_value(__name__)
