"""Baseline-sequential JPEG (JFIF) codec in pure numpy — no Spark, no
third-party image libs (closes the round-3 "compressed image decode"
environment gap for JPEG the same way decode_png did for PNG).

Scope: 8-bit baseline DCT, 4:4:4 (no chroma subsampling), one scan, no
restart markers — a spec-legal subset that every JPEG reader accepts.
The DECODER is real: full marker walk, DHT canonical-Huffman rebuild from
the stream (it decodes ANY baseline 4:4:4 JPEG's tables, not just ours),
byte-unstuffing bit reader, run-length/size entropy decode, dequantize,
vectorized IDCT (orthonormal 8x8 basis matmul), YCbCr->RGB.

The ENCODER emits self-describing DHT segments built canonically (uniform
code lengths over the used symbol alphabet — valid per Annex C, never the
reserved all-ones code), so no hand-transcribed Annex K Huffman tables
exist anywhere (a classic source of silent bugs). Quantization uses the
Annex K matrices with libjpeg quality scaling; quality=100 degenerates to
all-ones tables, making the entropy+quant path LOSSLESS in coefficient
space — the bit-level differential the tests pin.

Determinism: every step is integer or IEEE-double arithmetic with
explicit rounding; the same payload decodes to the same pixels on any
host.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

#: ITU-T T.81 Annex K.1 luminance / K.2 chrominance quantization matrices
QTBL_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QTBL_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

#: orthonormal 8x8 DCT-II basis: F = A @ f @ A.T, f = A.T @ F @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

#: AC symbol alphabet: EOB, ZRL, and (run 0-15, size 1-10)
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
_DC_SYMBOLS = list(range(12))


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling; quality=100 -> all ones (lossless
    coefficient path)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for tbl in (QTBL_LUM, QTBL_CHROM):
        q = (tbl * scale + 50) // 100
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# canonical Huffman (Annex C): build from BITS/HUFFVAL, used by BOTH sides

def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's code-assignment algorithm."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _uniform_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """BITS/HUFFVAL giving every symbol the same code length L with
    2**L > len(symbols) (so the all-ones code stays unused — Annex C's
    reserved pattern)."""
    L = 1
    while (1 << L) <= len(symbols):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(symbols)
    return bits, list(symbols)


# ---------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1  # skip stuffed 0x00
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _decode_symbol(br: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read(1)
        length += 1
        sym = lut.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits back to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _size_cat(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# color transforms (JFIF)

def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# blocking + DCT

def _to_blocks(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) -> (nby, nbx, 8, 8) with edge replication padding."""
    h, w = chan.shape
    nby, nbx = -(-h // 8), -(-w // 8)
    padded = np.pad(chan, ((0, nby * 8 - h), (0, nbx * 8 - w)), mode="edge")
    blocks = padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    return blocks, nby, nbx


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    padded = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return padded[:h, :w]


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,...xy,vy->...uv", _A, blocks, _A)


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("xu,...uv,yv->...xy", _A.T, coefs, _A.T)


# ---------------------------------------------------------------------------
# encoder

def encode_jpeg(rgb: np.ndarray, quality: int = 75) -> bytes:
    """RGB uint8 (h, w, 3) -> baseline JFIF bytes."""
    ycc = rgb_to_ycbcr(rgb)
    qlum, qchrom = quant_tables(quality)
    coefs = []
    h, w = rgb.shape[:2]
    for c in range(3):
        blocks, nby, nbx = _to_blocks(ycc[..., c] - 128.0)
        F = fdct_blocks(blocks)
        q = (qlum if c == 0 else qchrom).reshape(8, 8)
        Q = np.round(F / q).astype(np.int64)
        coefs.append(Q.reshape(nby * nbx, 64))
    return encode_jpeg_from_coefs(coefs, h, w, quality)


def encode_jpeg_from_coefs(coefs: list[np.ndarray], h: int, w: int,
                           quality: int = 75) -> bytes:
    """Entropy-encode pre-quantized coefficient blocks (3 channels, each
    (n_blocks, 64) in NATURAL row-major order). With quality=100 the
    quant tables are all ones, so decode returns these exact integers —
    the lossless coefficient path the tests exploit."""
    qlum, qchrom = quant_tables(quality)
    dc_bits, dc_vals = _uniform_table(_DC_SYMBOLS)
    ac_bits, ac_vals = _uniform_table(_AC_SYMBOLS)
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    n_blocks = coefs[0].shape[0]
    for b in range(n_blocks):
        for c in range(3):
            zz = coefs[c][b][ZIGZAG]
            diff = int(zz[0]) - prev_dc[c]
            prev_dc[c] = int(zz[0])
            s = _size_cat(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = _size_cat(v)
                if s > 10:
                    raise ValueError(f"AC coefficient {v} too large for baseline")
                code, ln = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last < 63:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qlum[ZIGZAG].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qchrom[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, qid in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, qid)  # 4:4:4
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, bytes([0x00] + dc_bits + dc_vals))   # DC table 0
    out += seg(0xFFC4, bytes([0x10] + ac_bits + ac_vals))   # AC table 0
    out += seg(0xFFC4, bytes([0x01] + dc_bits + dc_vals))   # DC table 1
    out += seg(0xFFC4, bytes([0x11] + ac_bits + ac_vals))   # AC table 1
    sos = b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += entropy + b"\xff\xd9"  # EOI
    return out


# ---------------------------------------------------------------------------
# decoder

def decode_jpeg_coefs(payload: bytes):
    """Parse + entropy-decode -> (coefs [3 x (n_blocks, 64) natural
    order, DEQUANTIZED], h, w). Real marker walk; Huffman tables rebuilt
    from the stream's own DHT segments."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    hufs: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q: list[int] = []
    comp_huf: list[tuple[int, int]] = []
    entropy = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = struct.unpack(">H", payload[pos:pos + 2])[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + length]
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, off + 1).astype(np.int64)
                nat = np.empty(64, np.int64)
                nat[ZIGZAG] = zz
                qtabs[tq] = nat
                off += 65
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc != 3:
                raise NotImplementedError("only 8-bit 3-component baseline")
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i:9 + 3 * i]
                if samp != 0x11:
                    raise NotImplementedError("chroma subsampling unsupported (4:4:4 only)")
                comp_q.append(qid)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise NotImplementedError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                vals = list(body[off + 17:off + 17 + n])
                codes = _canonical_codes(bits, vals)
                hufs[(tc, th)] = {(c, ln): sym for sym, (c, ln) in codes.items()}
                off += 17 + n
        elif marker == 0xFFDA:
            ns = body[0]
            for i in range(ns):
                _cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                comp_huf.append((tabs >> 4, tabs & 0x0F))
            entropy = payload[pos + 2 + length:]
            break
        pos += 2 + length
    if entropy is None or h is None:
        raise ValueError("JPEG missing SOS/SOF")
    end = entropy.rfind(b"\xff\xd9")
    if end >= 0:
        entropy = entropy[:end]

    br = _BitReader(entropy)
    nby, nbx = -(-h // 8), -(-w // 8)
    n_blocks = nby * nbx
    coefs = [np.zeros((n_blocks, 64), np.int64) for _ in range(3)]
    prev_dc = [0, 0, 0]
    for b in range(n_blocks):
        for c in range(3):
            dc_lut = hufs[(0, comp_huf[c][0])]
            ac_lut = hufs[(1, comp_huf[c][1])]
            zz = np.zeros(64, np.int64)
            s = _decode_symbol(br, dc_lut)
            diff = _extend(br.read(s), s) if s else 0
            prev_dc[c] += diff
            zz[0] = prev_dc[c]
            k = 1
            while k < 64:
                sym = _decode_symbol(br, ac_lut)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, s = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(br.read(s), s)
                k += 1
            nat = np.empty(64, np.int64)
            nat[ZIGZAG] = zz
            coefs[c][b] = nat * qtabs[comp_q[c]]
    return coefs, h, w


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB."""
    coefs, h, w = decode_jpeg_coefs(payload)
    nby, nbx = -(-h // 8), -(-w // 8)
    chans = []
    for c in range(3):
        blocks = coefs[c].astype(np.float64).reshape(nby, nbx, 8, 8)
        spatial = idct_blocks(blocks) + 128.0
        chans.append(_from_blocks(spatial, h, w))
    return ycbcr_to_rgb(np.stack(chans, axis=-1))
