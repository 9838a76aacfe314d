"""Dependency-free baseline JPEG decoder (numpy only).

Closes the last E5 codec gap for fixture-sized payloads: baseline
sequential DCT JPEGs (SOF0, 8-bit, 1 or 3 components, any sampling
factors, optional restart intervals) decode to an HxWx3 uint8 RGB
array with nothing but numpy — the same dependency budget as the
PPM/BMP paths in ``multimodal.decode_rgb``, which dispatches JPEG
payloads here.

Explicit non-goals (each raises ``NotImplementedError`` naming the
feature): progressive (SOF2) and the other rare SOF modes, arithmetic
coding, 12-bit precision, 4-component CMYK/YCCK. Production corpora
containing those route to the deferred lane via the capability
registry (``multimodal.route_media``) or fail loudly per payload —
never silently.

Implementation notes (all from the public JPEG spec, ITU-T T.81):

* Entropy decode: canonical Huffman tables from DHT (16 length counts
  + symbols), MSB-first bit reader over the byte-stuffed scan (0xFF00
  unstuffed, RSTn resets the DC predictors).
* Coefficients: DC = category + EXTEND()ed diff against the per-
  component predictor; AC = (run, size) pairs with EOB/ZRL, zigzag
  order.
* Reconstruction: dequantize -> dezigzag -> 2-D IDCT as two dense
  8x8 orthonormal DCT-III matrix products (numpy matmul over all
  blocks at once) -> +128 level shift -> clamp.
* Color: per-component planes at their sampling resolution,
  nearest-neighbor (pixel-replication) chroma upsample, BT.601
  YCbCr -> RGB.
"""

from __future__ import annotations

import struct

import numpy as np

def encode_gray_baseline(img: "np.ndarray") -> bytes:
    """Minimal grayscale baseline JPEG ENCODER (numpy only): all-ones
    quantization (near-lossless), flat-length canonical Huffman tables.
    Exists so pipelines (and the driver-oracled round-trip query) can
    materialize real JPEG payloads without codec libraries — e.g.
    thumbnail sidecars for a training corpus. The decoder's round-trip
    tests use a SEPARATE spec-derived encoder in tests/test_jpeg.py so
    encoder and decoder bugs cannot cancel out."""
    h, w = img.shape
    mcus_x, mcus_y = (w + 7) // 8, (h + 7) // 8
    plane = np.pad(
        img.astype(np.float64), ((0, 8 * mcus_y - h), (0, 8 * mcus_x - w)), mode="edge"
    )

    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    ac_code = {sym: i for i, sym in enumerate(ac_syms)}
    dc_counts = [0] * 16
    dc_counts[7] = len(dc_syms)
    ac_counts = [0] * 16
    ac_counts[8] = len(ac_syms)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    for tc, counts, syms in ((0, dc_counts, dc_syms), (1, ac_counts, ac_syms)):
        body = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])

    # r9 (guide §4.2): the DCT runs over ALL blocks as one broadcast
    # 8x8 matmul pair (same per-block operands and products as the old
    # per-block loop — byte-identical output, asserted by the
    # old-vs-new equivalence sweep in tests/test_jpeg.py), and the
    # entropy coder packs whole symbols into an int accumulator instead
    # of looping per BIT (the old encoder's dominant cost at ~12
    # Python ops per output bit).
    blocks = (
        plane.reshape(mcus_y, 8, mcus_x, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coefs = np.rint(_M[None] @ (blocks - 128.0) @ _M.T[None]).astype(np.int64)
    zz_all = coefs.reshape(-1, 64)[:, _ZIGZAG]
    nzmask = zz_all[:, 1:] != 0
    any_nz = nzmask.any(axis=1)
    # index (1..63) of the last nonzero AC coefficient, 0 when none
    last_all = np.where(any_nz, 63 - np.argmax(nzmask[:, ::-1], axis=1), 0)
    zz_list = zz_all.tolist()
    last_list = last_all.tolist()

    bits = bytearray()
    append = bits.append
    acc = 0
    nbits = 0

    def put(value: int, n: int) -> None:
        nonlocal acc, nbits
        acc = (acc << n) | (value & ((1 << n) - 1))
        nbits += n
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            append(byte)
            if byte == 0xFF:
                append(0x00)
        acc &= (1 << nbits) - 1

    pred = 0
    for bi, zz in enumerate(zz_list):
        dc = zz[0]
        diff = dc - pred
        pred = dc
        s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
        put(s, 8)  # dc code for symbol s IS s (flat 8-bit canonical table)
        if s:
            put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        last = last_list[bi]
        run = 0
        for k in range(1, last + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                put(1, 9)  # ac_code[0xF0] == 1
                run -= 16
            s = v.bit_length() if v >= 0 else (-v).bit_length()
            put(ac_code[(run << 4) | s], 9)
            put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            put(0, 9)  # ac_code[0x00] == 0 (EOB)
    if nbits:
        pad = 8 - nbits
        acc = (acc << pad) | ((1 << pad) - 1)
        append(acc & 0xFF)
        if (acc & 0xFF) == 0xFF:
            append(0x00)
    out += bits + b"\xff\xd9"
    return bytes(out)


#: Zigzag index of each coefficient position (zigzag order -> row-major).
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_basis() -> np.ndarray:
    """8x8 orthonormal DCT-II basis matrix M; IDCT(X) = M.T @ X @ M."""
    k = np.arange(8)
    M = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    M[0, :] /= np.sqrt(2.0)
    return M


_M = _dct_basis()


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment (already
    unstuffed; RST markers handled by the caller via segment splits).

    r9 (guide §4.2): int-accumulator refill + 16-bit peeks replace the
    old per-BIT loop (the decoder's dominant cost — ~8 Python ops per
    input bit). Reads past the end yield 0-bits, as before."""

    __slots__ = ("data", "n", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8  # past the end: 0-bits (matches old reader)
            self.nbits += 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1


#: (counts, symbols) -> peek-table cache. Corpus decodes see the same
#: few DHT segments thousands of times; building the 64 KiB peek table
#: once per distinct table makes _decode_symbol one lookup per symbol.
_HUFF_CACHE: dict[bytes, tuple[list[int], list[int]]] = {}


def _build_huffman(counts: list[int], symbols: bytes) -> tuple[list[int], list[int]]:
    """Canonical Huffman as a 16-bit peek table: (sym_at, len_at) lists
    of size 65536 — index with the next 16 bits of the stream, read the
    symbol and its true code length (0 length = invalid prefix)."""
    key = bytes(counts) + bytes(symbols)
    cached = _HUFF_CACHE.get(key)
    if cached is not None:
        return cached
    sym_at = [0] * 65536
    len_at = [0] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if code >= (1 << length):
                # Over-subscribed DHT (ADVICE r9): without this check the
                # slice assignment below would silently GROW the tables
                # past 64 Ki and decode garbage; the pre-r9 tree walker
                # raised on such tables, so keep that contract.
                raise ValueError("over-subscribed Huffman table in DHT")
            prefix = code << (16 - length)
            span = 1 << (16 - length)
            sym_at[prefix : prefix + span] = [symbols[k]] * span
            len_at[prefix : prefix + span] = [length] * span
            code += 1
            k += 1
        code <<= 1
    while len(_HUFF_CACHE) > 64:
        # Evict oldest-inserted only (ADVICE r9): clear() dropped the hot
        # standard tables too, causing rebuild bursts on mixed corpora.
        _HUFF_CACHE.pop(next(iter(_HUFF_CACHE)))
    _HUFF_CACHE[key] = (sym_at, len_at)
    return sym_at, len_at


def _decode_symbol(reader: _BitReader, table: tuple[list[int], list[int]]) -> int:
    sym_at, len_at = table
    idx = reader.peek16()
    ln = len_at[idx]
    if ln == 0:
        raise ValueError("invalid Huffman code in entropy stream")
    reader.skip(ln)
    return sym_at[idx]


def _extend(value: int, size: int) -> int:
    """EXTEND() of T.81 F.2.2.1: map a SIZE-bit magnitude to its signed
    coefficient value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks -> (n, 8, 8) samples."""
    # X = M.T @ C @ M for every block at once
    return np.clip(
        np.rint(np.einsum("ij,njk,kl->nil", _M.T, coefs, _M) + 128.0), 0, 255
    ).astype(np.uint8)


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc_table", "ac_table", "blocks", "pred")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.dc_table = self.ac_table = None
        self.blocks: list[np.ndarray] = []
        self.pred = 0


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an HxWx3 uint8 RGB array.

    Grayscale inputs are replicated across the three channels so the
    output shape matches the raster-decode contract of
    ``multimodal.decode_rgb``.
    """
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    comps: list[_Component] = []
    height = width = 0
    restart_interval = 0
    n = len(payload)

    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: no segment
            continue
        seg_len, = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seg_len]
        pos += seg_len

        if marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = seg[p + 17 : p + 17 + nsym]
                table = _build_huffman(counts, symbols)
                if tc_th >> 4 == 0:
                    dc_tables[tc_th & 0xF] = table
                else:
                    ac_tables[tc_th & 0xF] = table
                p += 17 + nsym
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4 != 0:
                    raise NotImplementedError("16-bit quantization tables")
                q = np.frombuffer(seg, np.uint8, count=64, offset=p + 1).astype(np.int32)
                qtables[pq_tq & 0xF] = q
                p += 65
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline(-ish)
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit sample precision")
            height, width = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG (CMYK?)")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = "progressive (SOF2)" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise NotImplementedError(f"{kind} JPEG: only baseline sequential is supported")
        elif marker == 0xDD:  # DRI
            restart_interval, = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                cs, td_ta = seg[1 + 2 * c : 3 + 2 * c]
                for comp in comps:
                    if comp.cid == cs:
                        comp.dc_table = dc_tables[td_ta >> 4]
                        comp.ac_table = ac_tables[td_ta & 0xF]
            # Entropy-coded data runs from here to the next real marker.
            scan_start = pos
            scan_end = scan_start
            while scan_end < n - 1:
                if payload[scan_end] == 0xFF and payload[scan_end + 1] not in (0x00,) and not (
                    0xD0 <= payload[scan_end + 1] <= 0xD7
                ):
                    break
                scan_end += 1
            scan = payload[scan_start:scan_end]
            pos = scan_end
            _decode_scan(scan, comps, qtables, width, height, restart_interval)
        # APPn / COM / anything else: skipped via seg_len

    if not comps or not comps[0].blocks:
        raise ValueError("no scan data decoded")
    return _assemble(comps, width, height)


def _decode_scan(
    scan: bytes,
    comps: list[_Component],
    qtables: dict[int, np.ndarray],
    width: int,
    height: int,
    restart_interval: int,
) -> None:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    # Split on RST markers (predictors reset per restart segment) and
    # unstuff 0xFF00 inside each segment — C-speed bytes ops (r9) in
    # place of the old per-byte Python loop. The scan contains no other
    # markers (the caller already stopped at the first non-RST,
    # non-stuffing 0xFF), so splitting on FF D0-D7 then collapsing
    # FF 00 is exactly the old state machine.
    import re as _re

    segments = [
        s.replace(b"\xff\x00", b"\xff")
        for s in _re.split(b"\xff[\xd0-\xd7]", scan)
    ]

    seg_idx = 0
    reader = _BitReader(segments[0])
    mcu_count = 0
    zz_rows: dict[int, list[list[int]]] = {id(c): [] for c in comps}
    for comp in comps:
        comp.pred = 0
    for _ in range(mcus_x * mcus_y):
        if restart_interval and mcu_count == restart_interval:
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            mcu_count = 0
            for comp in comps:
                comp.pred = 0
        for comp in comps:
            rows = zz_rows[id(comp)]
            dc_table, ac_table = comp.dc_table, comp.ac_table
            for _ in range(comp.h * comp.v):
                zz = [0] * 64
                t = _decode_symbol(reader, dc_table)
                diff = _extend(reader.read_bits(t), t)
                comp.pred += diff
                zz[0] = comp.pred
                k = 1
                while k < 64:
                    rs = _decode_symbol(reader, ac_table)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL: 16 zeros
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _extend(reader.read_bits(s), s)
                    k += 1
                rows.append(zz)
        mcu_count += 1
    # Dequantize + dezigzag every block of the scan at once (was one
    # 64-element scatter per block).
    for comp in comps:
        rows = zz_rows[id(comp)]
        if not rows:
            continue
        deq = np.asarray(rows, np.int32) * qtables[comp.tq][None, :]
        blocks = np.zeros((len(rows), 64), np.int32)
        blocks[:, _ZIGZAG] = deq
        comp.blocks.append(blocks.reshape(-1, 8, 8))


def _assemble(comps: list[_Component], width: int, height: int) -> np.ndarray:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    planes: list[np.ndarray] = []
    for comp in comps:
        samples = _idct_blocks(np.concatenate(comp.blocks)).astype(np.float64)
        pw, ph = 8 * comp.h * mcus_x, 8 * comp.v * mcus_y
        if comp.h == 1 and comp.v == 1:
            # one block per MCU for this component: MCU scan order IS
            # (my, mx) row-major — a pure reshape places every block
            plane = (
                samples.reshape(mcus_y, mcus_x, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(ph, pw)
            )
        else:
            plane = np.zeros((ph, pw), np.float64)
            bi = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for by in range(comp.v):
                        for bx in range(comp.h):
                            y0 = (my * comp.v + by) * 8
                            x0 = (mx * comp.h + bx) * 8
                            plane[y0 : y0 + 8, x0 : x0 + 8] = samples[bi]
                            bi += 1
        # nearest-neighbor upsample to full resolution, crop to size
        plane = np.repeat(np.repeat(plane, vmax // comp.v, axis=0), hmax // comp.h, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        g = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


from ..session import pickle_module_by_value  # noqa: E402

# Worker-side functions (decode/encode run inside mapInPandas closures):
# ship by value so executors never need the package on sys.path.
pickle_module_by_value(__name__)
