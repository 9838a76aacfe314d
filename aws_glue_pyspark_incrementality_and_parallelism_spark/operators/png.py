"""Dependency-free PNG decoder (stdlib zlib + numpy).

Extends the E5 decodable set to PNG — the dominant lossless web
format — with the same dependency budget as the PPM/BMP/JPEG paths:
DEFLATE comes from Python's stdlib ``zlib``, everything else is chunk
parsing, per-row unfiltering, and numpy reshapes, all from the public
PNG spec (RFC 2083 / W3C PNG).

Supported: 8-bit samples, color types 0 (grayscale), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced. Alpha is
dropped (the decode contract is HxWx3 RGB). Explicit non-goals raise
``NotImplementedError`` naming the feature: 16-bit and sub-byte
depths, Adam7 interlacing. Corrupt payloads raise ``ValueError``.

Filter reconstruction: Up/None are vectorized; Sub/Average/Paeth are
per-pixel sequential by definition (each pixel depends on the
reconstructed left neighbor), so those rows run a short Python loop —
fine for fixture/thumbnail payloads, and the mapInPandas decode stage
parallelizes across payloads anyway.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


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
            if bit_depth != 8:
                raise NotImplementedError(f"{bit_depth}-bit PNG (only 8-bit samples)")
            if color_type not in _CHANNELS:
                raise ValueError(f"invalid PNG color type {color_type}")
            if interlace != 0:
                raise NotImplementedError("Adam7-interlaced PNG")
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
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG pixel data truncated")

    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    bpp = ch  # bytes per pixel at 8-bit depth
    off = 0
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

    px = out.reshape(height, width, ch)
    if color_type == 2:  # RGB
        return px.copy()
    if color_type == 6:  # RGBA -> drop alpha
        return px[:, :, :3].copy()
    if color_type == 0:  # gray
        g = px[:, :, 0]
        return np.stack([g, g, g], axis=2)
    if color_type == 4:  # gray+alpha
        g = px[:, :, 0]
        return np.stack([g, g, g], axis=2)
    # palette
    if palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("palette index out of range")
    return palette[idx]


from ..session import pickle_module_by_value  # noqa: E402

# Worker-side functions (decode runs inside mapInPandas closures): ship
# by value so executors never need the package on their own sys.path.
pickle_module_by_value(__name__)
