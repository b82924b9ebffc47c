"""Vendored baseline JPEG codec — pure Python + numpy, zero dependencies.

Closes the r10-r13 "lossy codecs" carry-over (r13 verdict #8, option A:
"vendor a pure-python baseline-JPEG decode behind the existing guard").
Scope is baseline sequential DCT JFIF (ITU-T T.81 / ISO 10918-1):

- **decode_jpeg(data) -> (height, width, rgb_bytes)**: SOI/APPn/COM/DQT/
  DHT/SOF0/DRI/SOS parsing, stream-defined Huffman and quantization
  tables (NEVER assumes the canonical tables — a spec decoder reads DHT/
  DQT from the file), byte-unstuffed entropy decoding with RST handling,
  dequant + 2-D IDCT, 4:4:4 / 4:2:2 / 4:2:0 chroma upsampling, JFIF
  (BT.601 full-range) YCbCr -> RGB. Grayscale (1-component) supported.
- **encode_jpeg_baseline(rgb, h, w, quality) -> bytes**: the fixture
  writer the tests and registry entries use to synthesize deterministic
  payloads in-container (4:4:4, Annex-K tables scaled by the IJG quality
  curve, standard Annex-K.3 Huffman tables).

Not supported (raise ValueError, never mis-decode): progressive (SOF2),
arithmetic coding, 12-bit precision, differential/lossless modes.

Encoder and decoder share only the zigzag order and the DCT basis; the
decoder consumes tables from the bitstream, so a decoder bug cannot be
masked by a matching encoder bug in table handling. Reconstruction
closeness to the pre-encode image is pinned in tests (mean abs error
bound at quality 90), which catches self-consistent-but-wrong transform
pairs the roundtrip alone would hide.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan: ZIGZAG[k] = row-major index of the k-th coefficient in the
# entropy-coded stream (T.81 Figure A.6).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 example quantization tables (row-major).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
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


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: F = T @ f @ T.T."""
    k = np.arange(8)
    t = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    t[0, :] = 1.0
    t *= np.sqrt(2.0 / 8.0)
    t[0, :] *= np.sqrt(0.5)
    return t


_DCT_T = _dct_matrix()


def _ijg_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve: 1..100 -> scaled table clipped to [1, 255]."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# -- canonical Huffman construction ----------------------------------------

def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) via the canonical T.81 assignment."""
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


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-at-a-time decoder."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# -- bit I/O ----------------------------------------------------------------

class _BitWriter:
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
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy segment")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: record and feed zero bits (the decoder
                # layer handles RST/EOI at block boundaries)
                self.marker = nxt
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to and consume the pending marker (used for RST)."""
        self.acc = 0
        self.nbits = 0
        while self.pos < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and self.pos + 1 < len(self.data)
                and self.data[self.pos + 1] != 0x00
            ):
                m = self.data[self.pos + 1]
                self.pos += 2
                self.marker = None
                return m
            self.pos += 1
        raise ValueError("expected restart marker, hit end of data")


def _receive_extend(reader: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = reader.read_bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


# -- encoder ----------------------------------------------------------------

def _bit_category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: list[int],
    ci: int,
    tsel: int,
    dc_codes,
    ac_codes,
) -> None:
    coef = _DCT_T @ (block - 128.0) @ _DCT_T.T
    qz = np.round(coef.reshape(-1)[ZIGZAG] / q.reshape(-1)[ZIGZAG]).astype(
        np.int64
    )
    diff = int(qz[0]) - pred[ci]
    pred[ci] = int(qz[0])
    s = _bit_category(diff)
    code, ln = dc_codes[tsel][s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(qz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(qz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[tsel][0xF0]
            writer.write(code, ln)
            run -= 16
        s = _bit_category(v)
        code, ln = ac_codes[tsel][(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[tsel][0x00]
        writer.write(code, ln)


def encode_jpeg_baseline(
    rgb: bytes,
    height: int,
    width: int,
    quality: int = 90,
    subsample: str = "444",
) -> bytes:
    """Baseline sequential JFIF encoder: 4:4:4 or 4:2:0 (2x2 box-filtered
    chroma, interleaved Y1 Y2 Y3 Y4 Cb Cr MCUs), Annex-K tables scaled by
    the IJG quality curve, standard Huffman tables. ``rgb`` is row-major
    top-down RGB24."""
    if len(rgb) != width * height * 3:
        raise ValueError("pixel buffer size != width*height*3")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(
        np.float64
    )
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qy = _ijg_scale(QUANT_LUMA, quality)
    qc = _ijg_scale(QUANT_CHROMA, quality)
    dc_codes = [_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    writer = _BitWriter()
    pred = [0, 0, 0]

    def pad_to(ch: np.ndarray, mh: int, mw: int) -> np.ndarray:
        ph = (ch.shape[0] + mh - 1) // mh * mh
        pw = (ch.shape[1] + mw - 1) // mw * mw
        return np.pad(
            ch, ((0, ph - ch.shape[0]), (0, pw - ch.shape[1])), mode="edge"
        )

    if subsample == "444":
        planes = [(pad_to(y, 8, 8), qy), (pad_to(cb, 8, 8), qc),
                  (pad_to(cr, 8, 8), qc)]
        ph, pw = planes[0][0].shape
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci, (plane, q) in enumerate(planes):
                    _encode_block(
                        writer, plane[by:by + 8, bx:bx + 8], q, pred, ci,
                        0 if ci == 0 else 1, dc_codes, ac_codes,
                    )
        samp = ((1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1))
    else:
        yp = pad_to(y, 16, 16)
        # 2x2 box filter then pad chroma to the 8-aligned subsampled grid
        cbp = pad_to(cb, 2, 2)
        crp = pad_to(cr, 2, 2)
        cb_s = pad_to(cbp.reshape(cbp.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3)), 8, 8)
        cr_s = pad_to(crp.reshape(crp.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3)), 8, 8)
        ph, pw = yp.shape
        for my in range(0, ph, 16):
            for mx in range(0, pw, 16):
                for dy, dx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                    _encode_block(
                        writer, yp[my + dy:my + dy + 8, mx + dx:mx + dx + 8],
                        qy, pred, 0, 0, dc_codes, ac_codes,
                    )
                sy, sx = my // 2, mx // 2
                _encode_block(writer, cb_s[sy:sy + 8, sx:sx + 8], qc, pred,
                              1, 1, dc_codes, ac_codes)
                _encode_block(writer, cr_s[sy:sy + 8, sx:sx + 8], qc, pred,
                              2, 1, dc_codes, ac_codes)
        samp = ((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1))
    entropy = writer.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(q.reshape(-1)[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for cid, hv, tq in samp:
        out += bytes([cid, hv, tq])
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tsel in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tsel])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ----------------------------------------------------------------

def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline sequential JPEG. Returns (height, width,
    row-major top-down RGB24 bytes). Tables come from the STREAM (DQT/
    DHT), not from any built-in assumption. Raises ValueError on
    progressive/arithmetic/12-bit streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    height = width = 0
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8).astype(
                    np.int64
                )
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                qtabs[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, height, width, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential DCT (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cid, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cid] = (tsel >> 4, tsel & 0x0F)
            pos += seg_len
            return _decode_scan(
                data, pos, height, width, comps, scan_sel, qtabs, htabs,
                restart_interval,
            )
        pos += seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(
    data, pos, height, width, comps, scan_sel, qtabs, htabs, restart_interval
) -> tuple[int, int, bytes]:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RSTn, got 0x{m:02x}")
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = htabs[(0, scan_sel[c["id"]][0])]
                ac_tab = htabs[(1, scan_sel[c["id"]][1])]
                q = qtabs[c["tq"]]
                for v_blk in range(c["v"]):
                    for h_blk in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _read_huff(reader, dc_tab)
                        diff = _receive_extend(reader, s)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _read_huff(reader, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _receive_extend(reader, s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        # zz is stream(zigzag)-ordered; q is row-major —
                        # permute q into stream order before multiplying
                        # (a row-major q here decodes q=100 streams fine,
                        # since every entry is 1, and garbles all others)
                        coef[ZIGZAG] = zz * q[ZIGZAG]
                        block = (
                            _DCT_T.T @ coef.reshape(8, 8) @ _DCT_T
                        ) + 128.0
                        py = (my * c["v"] + v_blk) * 8
                        px = (mx * c["h"] + h_blk) * 8
                        planes[ci][py:py + 8, px:px + 8] = block
            mcu_count += 1

    # upsample chroma to luma grid, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:height, :width])
    if len(comps) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([y, y, y], axis=-1)
        return height, width, rgb.tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )
    return height, width, rgb.tobytes()


def _read_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in entropy segment")
