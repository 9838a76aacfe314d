"""Baseline-JPEG decoder tests: a minimal INDEPENDENT encoder (written
from the T.81 spec, sharing no code with the decoder) produces real
bitstreams — SOI/DQT/SOF0/DHT/SOS/EOI, byte stuffing, optional 4:2:0
subsampling and restart intervals — that the decoder must reproduce
within IDCT rounding. Plus hand-computable known-answer cases (uniform
blocks: only the DC coefficient is nonzero, so expected pixels are
arithmetic, not another decoder)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.jpeg import (
    decode_baseline_jpeg,
)

# ---------------------------------------------------------------- encoder

_ZZ = [
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _fdct(block: np.ndarray) -> np.ndarray:
    k = np.arange(8)
    M = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    M[0, :] /= np.sqrt(2.0)
    return M @ (block - 128.0) @ M.T


# Flat-length canonical Huffman tables (valid per T.81: N symbols all at
# one code length L, N <= 2^L): DC symbols 0..11 at 8 bits, the 162
# standard AC (run,size) symbols at 9 bits.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]


def _flat_table(symbols, length):
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    codes = {sym: (length, i) for i, sym in enumerate(symbols)}
    return counts, symbols, codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def encode_baseline_jpeg(
    img: np.ndarray, subsample: bool = False, restart_every: int = 0
) -> bytes:
    """Minimal baseline encoder: quant tables all ones (near-lossless),
    flat-length Huffman tables, optional 4:2:0 and restart intervals.
    Grayscale input: pass shape (H, W)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            def ds(p):
                ph = (p.shape[0] + 1) // 2 * 2
                pw = (p.shape[1] + 1) // 2 * 2
                pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
                return (pad[0::2, 0::2] + pad[0::2, 1::2] + pad[1::2, 0::2] + pad[1::2, 1::2]) / 4.0
            planes = [y, ds(cb), ds(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = 8 * sv * mcus_y, 8 * sh * mcus_x
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        )

    dc_counts, dc_syms, dc_codes = _flat_table(_DC_SYMS, 8)
    ac_counts, ac_syms, ac_codes = _flat_table(_AC_SYMS, 9)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: table 0, all ones
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    # SOF0
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: DC table 0 + AC table 0
    for tc, (counts, syms) in ((0, (dc_counts, dc_syms)), (1, (ac_counts, ac_syms))):
        body = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_every:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_every)
    # SOS
    sos = bytes([ncomp]) + b"".join(bytes([i + 1, 0x00]) for i in range(ncomp)) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_idx = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_every and mcu_idx and mcu_idx % restart_every == 0:
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * ncomp
            for ci, (plane, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        coef = np.rint(_fdct(block)).astype(int)
                        zz = [int(coef.flat[_ZZ[k]]) for k in range(64)]
                        diff = zz[0] - preds[ci]
                        preds[ci] = zz[0]
                        s = _category(diff)
                        length, code = dc_codes[s]
                        writer.write(code, length)
                        if s:
                            writer.write(_amplitude(diff, s), s)
                        run = 0
                        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                        for k in range(1, last_nz + 1):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                length, code = ac_codes[0xF0]
                                writer.write(code, length)
                                run -= 16
                            s = _category(zz[k])
                            length, code = ac_codes[(run << 4) | s]
                            writer.write(code, length)
                            writer.write(_amplitude(zz[k], s), s)
                            run = 0
                        if last_nz < 63:
                            length, code = ac_codes[0x00]
                            writer.write(code, length)
            mcu_idx += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ tests


def test_uniform_gray_known_answer():
    """Uniform 8x8 grayscale: only the DC coefficient is nonzero, so the
    expected output is hand-computable (the input value itself)."""
    img = np.full((8, 8), 200, np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert out.shape == (8, 8, 3)
    assert np.all(np.abs(out.astype(int) - 200) <= 1)
    assert np.all(out[:, :, 0] == out[:, :, 1]) and np.all(out[:, :, 1] == out[:, :, 2])


def test_uniform_color_known_answer():
    """Uniform color: per-channel DC only; RGB round-trips through the
    BT.601 matrices within rounding."""
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = 180, 90, 30
    out = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert out.shape == (16, 16, 3)
    assert np.all(np.abs(out.astype(int) - [180, 90, 30]) <= 2)


def test_gradient_roundtrip_444():
    rng = np.random.RandomState(7)
    img = np.clip(
        np.linspace(0, 255, 24 * 17 * 3).reshape(24, 17, 3)
        + rng.randint(-8, 8, (24, 17, 3)),
        0,
        255,
    ).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert out.shape == img.shape
    # all-ones quant: error bounded by fdct rounding + idct rounding
    assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 4


def test_random_roundtrip_420_subsampled():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (19, 21, 3)).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img, subsample=True))
    assert out.shape == img.shape
    # Reference reconstruction computed in the test: exact Y plane,
    # chroma 2x2-mean downsampled (the encoder's path) then pixel-
    # replicated (the decoder's upsample), same BT.601 inverse + clip.
    # The decoder must match this within DCT rounding.
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    def ds_us(p):
        ph = (p.shape[0] + 1) // 2 * 2
        pw = (p.shape[1] + 1) // 2 * 2
        pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        d = (pad[0::2, 0::2] + pad[0::2, 1::2] + pad[1::2, 0::2] + pad[1::2, 1::2]) / 4.0
        return np.repeat(np.repeat(d, 2, axis=0), 2, axis=1)[: p.shape[0], : p.shape[1]]

    cbu, cru = ds_us(cb), ds_us(cr)
    exp = np.clip(
        np.rint(
            np.stack(
                [
                    y + 1.402 * (cru - 128.0),
                    y - 0.344136 * (cbu - 128.0) - 0.714136 * (cru - 128.0),
                    y + 1.772 * (cbu - 128.0),
                ],
                axis=2,
            )
        ),
        0,
        255,
    )
    assert np.max(np.abs(out.astype(np.float64) - exp)) <= 5


def test_restart_interval_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)  # 15 MCUs
    payload = encode_baseline_jpeg(img, restart_every=4)
    assert any(
        payload[i] == 0xFF and 0xD0 <= payload[i + 1] <= 0xD7
        for i in range(len(payload) - 1)
    ), "encoder must have emitted RST markers"
    out = decode_baseline_jpeg(payload)
    assert np.max(np.abs(out[:, :, 0].astype(int) - img.astype(int))) <= 4


def test_byte_stuffing_survives():
    """Brute a few seeds until the scan contains stuffed 0xFF00 bytes,
    then decode — exercises the unstuffing path for real."""
    for seed in range(40):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (8, 8)).astype(np.uint8)
        payload = encode_baseline_jpeg(img)
        scan = payload[payload.find(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            out = decode_baseline_jpeg(payload)
            assert np.max(np.abs(out[:, :, 0].astype(int) - img.astype(int))) <= 4
            return
    pytest.skip("no seed produced a stuffed byte (unexpected)")


def test_progressive_rejected_loudly():
    img = np.full((8, 8), 100, np.uint8)
    payload = bytearray(encode_baseline_jpeg(img))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_baseline_jpeg(bytes(payload))


def test_truncated_and_garbage_fail_loudly():
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"\x00\x01\x02")
    img = np.full((8, 8), 100, np.uint8)
    payload = encode_baseline_jpeg(img)
    with pytest.raises((ValueError, struct.error, IndexError)):
        decode_baseline_jpeg(payload[:20])


# ------------------------------------------- r9 fast-path equivalence


def test_encoder_bit_packer_matches_per_bit_reference():
    """r9 pin: encode_gray_baseline's int-accumulator bit packer (and
    batched DCT) must be byte-identical to the original per-bit
    formulation. Reference = the pre-r9 algorithm, inlined."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.jpeg import (
        _M,
        _ZIGZAG,
        encode_gray_baseline,
    )

    def reference_entropy(img: np.ndarray) -> bytes:
        h, w = img.shape
        mcus_x, mcus_y = (w + 7) // 8, (h + 7) // 8
        plane = np.pad(
            img.astype(np.float64),
            ((0, 8 * mcus_y - h), (0, 8 * mcus_x - w)),
            mode="edge",
        )
        dc_codes = {s: (8, s) for s in range(12)}
        ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
        ac_codes = {sym: (9, i) for i, sym in enumerate(ac_syms)}
        bits = bytearray()
        acc = nbits = 0

        def put(value, n):
            nonlocal acc, nbits
            for i in range(n - 1, -1, -1):
                acc = (acc << 1) | ((value >> i) & 1)
                nbits += 1
                if nbits == 8:
                    bits.append(acc)
                    if acc == 0xFF:
                        bits.append(0x00)
                    acc = 0
                    nbits = 0

        pred = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                block = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                coef = np.rint(_M @ (block - 128.0) @ _M.T).astype(int)
                zz = coef.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - pred
                pred = int(zz[0])
                s = abs(diff).bit_length()
                ln, code = dc_codes[s]
                put(code, ln)
                if s:
                    put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                nz = np.nonzero(zz[1:])[0]
                last = (int(nz[-1]) + 1) if len(nz) else 0
                run = 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[0xF0]
                        put(code, ln)
                        run -= 16
                    s = abs(v).bit_length()
                    ln, code = ac_codes[(run << 4) | s]
                    put(code, ln)
                    put(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    ln, code = ac_codes[0x00]
                    put(code, ln)
        while nbits:
            put(1, 1)
        return bytes(bits)

    rng = np.random.RandomState(7)
    for shape in [(8, 8), (12, 16), (9, 7), (16, 24), (1, 1)]:
        for img in (
            rng.randint(0, 256, shape).astype(np.uint8),
            np.full(shape, 128, np.uint8),
            (np.add.outer(np.arange(shape[0]), np.arange(shape[1])) % 256).astype(
                np.uint8
            ),
        ):
            payload = encode_gray_baseline(img)
            sos = payload.find(b"\xff\xda")
            scan = payload[sos + 2 + 8 : -2]  # between SOS header and EOI
            assert scan == reference_entropy(img), shape


def test_peek_table_huffman_matches_canonical_walk():
    """r9 pin: the 16-bit peek-table decode must agree with a
    bit-by-bit canonical-code walk on a NON-flat table (mixed code
    lengths, like real optimized JPEGs)."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.jpeg import (
        _BitReader,
        _build_huffman,
        _decode_symbol,
    )

    # lengths: 1 code of 2 bits, 3 of 3 bits, 2 of 5 bits
    counts = [0, 1, 3, 0, 2] + [0] * 11
    symbols = bytes([10, 20, 21, 22, 30, 31])
    table = _build_huffman(counts, symbols)

    # canonical codes, by construction
    codes = {10: (2, 0b00), 20: (3, 0b010), 21: (3, 0b011), 22: (3, 0b100),
             30: (5, 0b10100), 31: (5, 0b10101)}
    seq = [10, 30, 22, 20, 31, 21, 10, 10, 30]
    acc = 0
    nbits = 0
    for sym in seq:
        ln, code = codes[sym]
        acc = (acc << ln) | code
        nbits += ln
    pad = (8 - nbits % 8) % 8
    acc <<= pad
    nbits += pad
    data = acc.to_bytes(nbits // 8, "big")

    reader = _BitReader(data)
    assert [_decode_symbol(reader, table) for _ in seq] == seq


def test_bit_reader_past_end_yields_zero_bits():
    """r9 pin: reads past the segment end return 0-bits (the pre-r9
    reader's convention — decoders rely on it for final-block EOBs)."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.jpeg import (
        _BitReader,
    )

    r = _BitReader(b"\xa5")
    assert r.read_bits(8) == 0xA5
    assert r.read_bits(5) == 0
    assert r.read_bits(16) == 0
