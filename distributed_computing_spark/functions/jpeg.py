"""Baseline JPEG (JFIF) codec in pure numpy (round 5 — VERDICT r4 item 5).

A REAL codec for the real format (ITU-T T.81 baseline sequential DCT,
8-bit, Huffman): the encoder emits SOI/APP0/DQT/SOF0/DHT/SOS/EOI with
the standard Annex K Huffman tables and 0xFF byte stuffing — stock
viewers open the output — and the decoder walks markers, rebuilds
canonical Huffman tables from DHT, entropy-decodes MCUs (DC prediction,
run/size AC with ZRL/EOB), dequantizes through the zigzag, applies the
8×8 IDCT, upsamples subsampled chroma, and converts YCbCr back to RGB.
This closes the last fake-kernel path in operators/multimodal.py: PNG
fell to stdlib zlib in round 4; JPEG's DCT falls to numpy here. Only
MP3's psychoacoustic MDCT still genuinely needs a library.

Rounding contract (load-bearing for the oracle gate): every
float→integer step in BOTH directions is ``floor(x + 0.5)`` —
color-space conversion, quantization, and final pixel reconstruction.
With that fixed, the full pipeline over a block-constant image is
closed-form arithmetic a SQL oracle can replicate exactly (see
registry.multimodal_jpeg_decode): a constant 8×8 block has all-zero AC
and DC = 8·(c−128), so with a flat quant table q the decoded constant
is clamp(q·floor(8·(c−128)/q + 0.5)/8 + 128) — bit-exact, not
approximate, because /8 and ·q are exact in binary floating point and
the IDCT of a DC-only block is constant.

Scope (baseline subset, ValueError on the rest): SOF0 only (no
progressive SOF2 / arithmetic coding), 8-bit precision, no restart
markers (DRI with a non-zero interval is rejected), sampling factors
that divide the max factor (covers 4:4:4, 4:2:2, 4:2:0). The encoder
always writes 4:4:4 (or single-component grayscale).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — public spec constants)
# ---------------------------------------------------------------------------

# zigzag scan order: index i -> (row, col); diagonals alternate direction
_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _d = [(r, _s - r) for r in range(8) if 0 <= _s - r < 8]
    _ZIGZAG += _d if _s % 2 == 1 else _d[::-1]
_ZZ_ROWS = np.array([rc[0] for rc in _ZIGZAG])
_ZZ_COLS = np.array([rc[1] for rc in _ZIGZAG])

Q_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

Q_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# FLAT quant table for the planted-content query: q=16 everywhere means
# DC'/8 is always an even integer, so no reconstruction value ever lands
# within float-epsilon of a rounding boundary (see module docstring).
Q_FLAT16 = np.full((8, 8), 16, dtype=np.int64)

# standard Huffman specs: (bits[1..16] counts, symbol values)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)

# 8×8 DCT-II basis matrix: forward D = T @ B @ T.T, inverse B = T.T @ D @ T
_T = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else np.sqrt(0.25)
    for _n in range(8):
        _T[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _round_half_up(x: np.ndarray | float) -> np.ndarray | float:
    """The codec-wide rounding contract: floor(x + 0.5)."""
    return np.floor(x + 0.5)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via T.81 canonical code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Bit IO with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 §B.1.1.5)
                self.buf.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy data")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed zero
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy data")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y = planes[..., 0].astype(np.float64)
    cb = planes[..., 1].astype(np.float64) - 128.0
    cr = planes[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_coefficient_bits(v: int, cat: int) -> int:
    # T.81 §F.1.2.1: negative values are stored as v + 2^cat - 1
    return v if v >= 0 else v + (1 << cat) - 1


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    qtables: tuple[np.ndarray, np.ndarray] | None = None,
) -> bytes:
    """Encode (H, W, 3) uint8 RGB or (H, W) uint8 grayscale as baseline
    JFIF, 4:4:4 (or single-component), standard Annex K Huffman tables.

    ``qtables`` overrides the (luma, chroma) quantization tables; the
    default is the Annex K pair scaled by ``quality`` (IJG convention).
    """
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("need (H, W, 3) or (H, W) uint8")
    gray = pixels.ndim == 2
    if not gray and pixels.shape[2] != 3:
        raise ValueError("need 3 channels for color input")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    if qtables is None:
        ql, qc = scale_qtable(Q_LUMA, quality), scale_qtable(Q_CHROMA, quality)
    else:
        ql, qc = (np.asarray(t, dtype=np.int64) for t in qtables)

    if gray:
        planes = [pixels.astype(np.float64)]
        comp_q = [ql]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        planes = [ycc[..., i].astype(np.float64) for i in range(3)]
        comp_q = [ql, qc, qc]

    # pad each plane to a multiple of 8 by edge replication
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]

    dc_specs = [_DC_LUMA_SPEC] + ([] if gray else [_DC_CHROMA_SPEC])
    ac_specs = [_AC_LUMA_SPEC] + ([] if gray else [_AC_CHROMA_SPEC])
    dc_codes = [_canonical_codes(*s) for s in dc_specs]
    ac_codes = [_canonical_codes(*s) for s in ac_specs]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT: table 0 = luma, table 1 = chroma (8-bit precision)
    qt0 = bytes([0]) + bytes(int(ql[_ZZ_ROWS[i], _ZZ_COLS[i]]) for i in range(64))
    out += _marker(0xDB, qt0)
    if not gray:
        qt1 = bytes([1]) + bytes(
            int(qc[_ZZ_ROWS[i], _ZZ_COLS[i]]) for i in range(64)
        )
        out += _marker(0xDB, qt1)
    # SOF0: 8-bit, components (id, sampling 0x11 = 1x1, quant table)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _marker(0xC0, sof)
    # DHT segments (class<<4 | id)
    for cls, tid, spec in (
        (0, 0, _DC_LUMA_SPEC),
        (1, 0, _AC_LUMA_SPEC),
    ) + (() if gray else ((0, 1, _DC_CHROMA_SPEC), (1, 1, _AC_CHROMA_SPEC))):
        bits, vals = spec
        out += _marker(0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    out += _marker(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * ncomp
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(ncomp):
                q = comp_q[ci]
                block = planes[ci][by : by + 8, bx : bx + 8] - 128.0
                coef = _T @ block @ _T.T
                # Exact-DC contract: the matrix product leaves ±1e-14 on
                # DC, which sits exactly ON the rounding half-boundary
                # whenever sum(block)/(8q) is a half-integer — the float
                # noise would flip floor(x+0.5) nondeterministically vs
                # the closed-form oracle. sum/8 is exact dyadic (integer
                # sums are exact in double), and IEEE division returns
                # the exact half-integer when the true quotient IS one,
                # so the boundary case becomes deterministic.
                coef[0, 0] = block.sum() / 8.0
                qz = _round_half_up(coef / q).astype(np.int64)
                zz = qz[_ZZ_ROWS, _ZZ_COLS]
                ti = 0 if ci == 0 else 1 if not gray else 0
                # DC
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                cat = _category(diff)
                code, ln = dc_codes[ti][cat]
                bw.write(code, ln)
                if cat:
                    bw.write(_encode_coefficient_bits(diff, cat), cat)
                # AC
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = ac_codes[ti][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    cat = _category(v)
                    code, ln = ac_codes[ti][(run << 4) | cat]
                    bw.write(code, ln)
                    bw.write(_encode_coefficient_bits(v, cat), cat)
                    run = 0
                if run:
                    code, ln = ac_codes[ti][0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _extend(bits: int, cat: int) -> int:
    # T.81 §F.2.2.1 EXTEND
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline sequential JPEG to (H, W, C) uint8 (C = 1 or 3).

    ValueError contract on anything outside the supported baseline
    subset (progressive, arithmetic, 12-bit, restart intervals,
    non-dividing sampling factors) and on malformed containers.
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    scan = None  # ([(comp_idx, dc_tid, ac_tid)], entropy_start)

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        tag = data[pos + 1]
        if tag == 0xFF:  # legal fill byte between markers (T.81 §B.1.1.2)
            pos += 1
            continue
        if tag == 0xD9:  # EOI before SOS
            break
        if tag == 0x01 or 0xD0 <= tag <= 0xD8:
            # ADVICE r5: TEM / RSTn / a stray second SOI are standalone
            # markers with NO length field — reading payload bytes as a
            # segment length would silently skip an arbitrary span.
            # Outside an entropy-coded scan they're malformed here, so
            # fail with the documented clean contract instead.
            raise ValueError(f"standalone marker 0x{tag:02X} before SOS")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if tag == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise ValueError("only 8-bit quant tables supported")
                vals = body[b + 1 : b + 65]
                if len(vals) != 64:
                    raise ValueError("short DQT table")
                q = np.zeros((8, 8), np.int64)
                q[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(vals, np.uint8)
                qtables[tid] = q
                b += 65
        elif tag == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                if len(vals) != n:
                    raise ValueError("short DHT table")
                htables[(cls, tid)] = _decode_table(bits, vals)
                b += 17 + n
        elif tag == 0xC0 or tag == 0xC1:  # SOF0/1 (baseline/ext sequential)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (fh, fw, comps)
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                     0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif tag == 0xDD:  # DRI
            (interval,) = struct.unpack_from(">H", body, 0)
            if interval != 0:
                raise ValueError("restart intervals not supported")
        elif tag == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            mapping = []
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                idx = next(
                    (j for j, c in enumerate(frame[2]) if c[0] == cid), None
                )
                if idx is None:
                    raise ValueError("SOS references unknown component")
                mapping.append((idx, tids >> 4, tids & 0x0F))
            scan = (mapping, pos + 2 + seglen)
            break
        # APPn/COM/others: skip
        pos += 2 + seglen

    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    fh, fw, comps = frame
    mapping, entropy_start = scan
    if len(mapping) != len(comps):
        raise ValueError("partial scans not supported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or any(
        c[1] < 1 or c[2] < 1 or hmax % c[1] or vmax % c[2] for c in comps
    ):
        raise ValueError("unsupported sampling factors")
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    planes = [
        np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), np.float64)
        for c in comps
    ]
    br = _BitReader(data, entropy_start)
    preds = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, dc_tid, ac_tid in mapping:
                _, hs, vs, tq = comps[ci]
                if tq not in qtables:
                    raise ValueError("missing quant table")
                dc_t = htables.get((0, dc_tid))
                ac_t = htables.get((1, ac_tid))
                if dc_t is None or ac_t is None:
                    raise ValueError("missing Huffman table")
                q = qtables[tq]
                for bv in range(vs):
                    for bh in range(hs):
                        zz = np.zeros(64, np.int64)
                        cat = br.read_symbol(dc_t)
                        preds[ci] += _extend(br.read_bits(cat), cat)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(ac_t)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            cat = rs & 0x0F
                            zz[k] = _extend(br.read_bits(cat), cat)
                            k += 1
                        coef = np.zeros((8, 8), np.float64)
                        coef[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
                        # mirror of the encoder's exact-DC contract: add
                        # the DC term as an exact dyadic (coef00/8) and
                        # run the matrix IDCT on the AC part only — by
                        # linearity identical, but a DC-only block now
                        # reconstructs exactly (no ±1e-14 under the
                        # floor(x+0.5) boundary)
                        dc = coef[0, 0]
                        coef[0, 0] = 0.0
                        block = _T.T @ coef @ _T + (dc / 8.0 + 128.0)
                        y0 = (my * vs + bv) * 8
                        x0 = (mx * hs + bh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample subsampled components by replication, crop, stack
    full = []
    for i, (_, hs, vs, _) in enumerate(comps):
        p = planes[i]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        return np.clip(_round_half_up(full[0]), 0, 255).astype(np.uint8)[
            ..., None
        ]
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    return _ycbcr_to_rgb(np.stack(full, axis=-1))
