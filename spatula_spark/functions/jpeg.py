"""Pure-python/numpy baseline JPEG (JFIF) encoder & decoder.

Un-stubs the last container-limited codec (reference parity:
``spatula`` hands image responses to user code via PIL; this container
has no libjpeg/PIL, so the entropy coding itself is implemented here).
Scope: baseline sequential DCT, 8-bit, YCbCr 4:4:4 (no chroma
subsampling), standard ITU T.81 Annex K quantization + Huffman tables,
libjpeg-convention quality scaling. The emitted stream is a real JFIF
file (SOI/APP0/DQT/SOF0/DHT/SOS/EOI, byte-stuffed entropy data) that
any standard decoder reads; the decoder here handles what the encoder
emits plus any single-scan 4:4:4 baseline stream.

The DCT/quantization/Huffman stages are vectorized across all 8x8
blocks with numpy; only the entropy-coded bitstream itself is built /
parsed sequentially (it is inherently serial). At crawl benchmark
scale the synthetic web keeps its closed-form fast codec
(``images.lossy_encode``); this module is the parity path, exercised
by the media pipeline whenever payload bytes carry the JPEG magic.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------- Annex K constant tables

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
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
    0xF9, 0xFA,
]

# 8-point orthonormal DCT-II basis (C @ block @ C.T == forward DCT)
_K = np.arange(8)
_DCT = np.cos(np.pi * (2 * _K[None, :] + 1) * _K[:, None] / 16.0)
_DCT[0, :] *= 1.0 / np.sqrt(2.0)
_DCT *= 0.5


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman (T.81 C.2): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


_ENC_DC = (_build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
           _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
_ENC_AC = (_build_codes(AC_LUMA_BITS, AC_LUMA_VALS),
           _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))


def quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling of a quantization table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# ------------------------------------------------------------------ encode


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float -> (n_blocks, 8, 8), edge-replicated to 8-multiples."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        plane.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def jpeg_encode(px: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4)."""
    h, w, _ = px.shape
    qy = quality_scaled(QUANT_LUMA, quality)
    qc = quality_scaled(QUANT_CHROMA, quality)
    ycc = _rgb_to_ycbcr(px)

    # vectorized DCT + quantize + zigzag per component
    comp_zz: list[np.ndarray] = []
    for ci in range(3):
        blocks = _blocks(ycc[..., ci]) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qy if ci == 0 else qc
        qd = np.round(coef / q).astype(np.int32)
        comp_zz.append(qd.reshape(-1, 64)[:, ZIGZAG])

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    n_blocks = comp_zz[0].shape[0]
    for bi in range(n_blocks):
        for ci in range(3):
            t = 0 if ci == 0 else 1
            dc_codes, ac_codes = _ENC_DC[t], _ENC_AC[t]
            zz = comp_zz[ci][bi]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            s = _category(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if k > last_nz:
                    code, ln = ac_codes[0x00]  # EOB
                    bw.write(code, ln)
                    break
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(seg(0xFFDB, b"\x00" + bytes(qy.reshape(-1)[ZIGZAG].astype(np.uint8))))
    out.append(seg(0xFFDB, b"\x01" + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8))))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)  # 1x1 sampling (4:4:4)
    out.append(seg(0xFFC0, sof))
    for tc_th, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out.append(seg(0xFFC4, bytes([tc_th] + bits) + bytes(vals)))
    sos = b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out.append(seg(0xFFDA, sos))
    out.append(scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# ------------------------------------------------------------------ decode


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            # else: a marker — baseline single-scan streams end here;
            # treat as padding (reading past it means corrupt data)
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline single-scan 4:4:4 JFIF bytes -> (h, w, 3) uint8 RGB."""
    try:
        return _jpeg_decode_impl(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"corrupt/truncated JPEG stream: {exc}") from exc


def _jpeg_decode_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []  # (cid, sampling, tq)
    scan_comps: list[tuple[int, int, int]] = []  # (cid, td, ta)
    scan_data = b""
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + ln]
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = np.frombuffer(
                    body[off + 1:off + 65], dtype=np.uint8
                ).astype(np.int32)
                qtables[pq_tq & 0x0F] = t.reshape(8, 8)
                off += 65
        elif marker == 0xC0:
            h, w = struct.unpack(">HH", body[1:5])
            n = body[5]
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i])
                for i in range(n)
            ]
            if any(samp != 0x11 for _, samp, _ in comps):
                raise NotImplementedError("only 4:4:4 sampling supported")
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1:off + 17])
                nv = sum(bits)
                vals = list(body[off + 17:off + 17 + nv])
                table = _build_decode(bits, vals)
                if tc_th >> 4:
                    huff_ac[tc_th & 0x0F] = table
                else:
                    huff_dc[tc_th & 0x0F] = table
                off += 17 + nv
        elif marker == 0xDA:
            n = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(n)
            ]
            # entropy data runs from after this segment to EOI
            scan_data = data[pos + ln:]
            break
        pos += ln

    if not comps or not scan_comps:
        raise ValueError("truncated JPEG stream")
    bh, bw_ = -(-h // 8), -(-w // 8)
    n_blocks = bh * bw_
    br = _BitReader(scan_data)
    coefs = [np.zeros((n_blocks, 64), dtype=np.int32) for _ in comps]
    prev_dc = [0] * len(comps)
    for bi in range(n_blocks):
        for ci, (cid, td, ta) in enumerate(scan_comps):
            zz = coefs[ci][bi]
            s = _decode_symbol(br, huff_dc[td])
            diff = _extend(br.bits(s), s) if s else 0
            prev_dc[ci] += diff
            zz[0] = prev_dc[ci]
            k = 1
            while k < 64:
                rs = _decode_symbol(br, huff_ac[ta])
                if rs == 0x00:  # EOB
                    break
                run, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if run != 15:
                        raise ValueError("bad AC run/size")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC index out of range")
                zz[k] = _extend(br.bits(s), s)
                k += 1

    planes = []
    for ci, (cid, samp, tq) in enumerate(comps):
        q = qtables[tq]
        deq = (coefs[ci][:, UNZIGZAG].reshape(-1, 8, 8) * q).astype(np.float64)
        blocks = np.einsum("ji,njk,kl->nil", _DCT, deq, _DCT) + 128.0
        plane = (
            blocks.reshape(bh, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)[:h, :w]
        )
        planes.append(plane)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
