"""Pure-numpy baseline JPEG (ITU-T T.81) encoder + decoder.

The real lossy codec path for the image table's ``fmt="jpeg"`` rows —
no external image library.  Sequential baseline DCT, 8-bit, 4:4:4 (no
chroma subsampling), single interleaved scan, standard Annex-K
quantization and Huffman tables (public spec constants).  The decoder
reads DQT/DHT from the file, so it decodes any baseline 4:4:4 stream,
not just this encoder's output.

Encode: RGB → JFIF YCbCr (rounded to uint8) → level shift → 8×8
orthonormal DCT (matrix form, vectorized over all blocks) → quality-
scaled quantization → zigzag → DC-diff/AC run-length Huffman, byte
stuffing.  Decode mirrors it exactly in reverse.

The per-row invariant (BASELINE.json input_hint) for lossy formats is
decoded-pixel allclose at PSNR ≥ 40 dB — tests/test_jpeg.py gates real
encode→decode round trips on that bound.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------- constants

# zigzag position k → natural (row-major) coefficient index
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1/K.2 base quantization tables (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
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

# orthonormal 8×8 DCT-II matrix: C @ block @ C.T == JPEG FDCT
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    _C[_k] = _a * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16.0)
del _k, _a


def quality_scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K base tables (1..100)."""
    q = max(1, min(100, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QUANT_LUMA * s + 50) // 100, 1, 255)
    chr_ = np.clip((QUANT_CHROMA * s + 50) // 100, 1, 255)
    return lum.astype(np.int64), chr_.astype(np.int64)


# -------------------------------------------------------- color space


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr, rounded to uint8 (the deterministic
    encoder-side representation)."""
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    y, cb, cr = p[..., 0], p[..., 1] - 128.0, p[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


# ----------------------------------------------------------- blocking


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) plane → (n_blocks, 8, 8) float blocks, edge-replicated to
    8-multiples.  Returns (blocks, blocks_y, blocks_x)."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((H, W), dtype=np.float64)
    padded[:h, :w] = plane
    if W > w:
        padded[:h, w:] = plane[:, -1:]
    if H > h:
        padded[h:, :] = padded[h - 1 : h, :]
    by, bx = H // 8, W // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, by, bx


def _from_blocks(blocks: np.ndarray, by: int, bx: int, h: int, w: int) -> np.ndarray:
    plane = (
        blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    )
    return plane[:h, :w]


# --------------------------------------------------------- bit writer


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _huff_encode_table(bits, vals) -> dict:
    """(BITS, HUFFVAL) → {symbol: (code, length)} canonical codes."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits for a coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


# ------------------------------------------------------------- encode


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF 4:4:4 JPEG bytes."""
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    qt_l, qt_c = quality_scaled_tables(quality)
    ycc = rgb_to_ycbcr(pixels)

    comp_q = (qt_l, qt_c, qt_c)
    all_zz = []
    nblocks = None
    for ci in range(3):
        blocks, by, bx = _to_blocks(ycc[..., ci].astype(np.float64) - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
        q = comp_q[ci].reshape(8, 8).astype(np.float64)
        # round-half-away-from-zero, like the reference libjpeg path
        quant = np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)
        zz = quant.reshape(-1, 64)[:, ZIGZAG].astype(np.int64)
        all_zz.append(zz)
        if nblocks is None:
            nblocks = len(zz)

    dc_l = _huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c = _huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_l = _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    ac_c = _huff_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    comp_dc = (dc_l, dc_c, dc_c)
    comp_ac = (ac_l, ac_c, ac_c)

    bw = _BitWriter()
    pred = [0, 0, 0]
    for bidx in range(nblocks):
        for ci in range(3):
            zz = all_zz[ci][bidx]
            dc_table, ac_table = comp_dc[ci], comp_ac[ci]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc_table[size]
            bw.write(code, length)
            bw.write(bits, size)
            run = 0
            last_nz = np.flatnonzero(zz[1:])
            end = (last_nz[-1] + 2) if len(last_nz) else 1
            for k in range(1, end):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_table[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_table[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if end < 64:
                code, length = ac_table[0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return _marker(0xDB, bytes([tid]) + bytes(int(x) for x in table[ZIGZAG]))

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return _marker(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    sof_comps = b""
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof_comps += bytes([cid, 0x11, tq])  # 4:4:4 sampling
    sof = _marker(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3]) + sof_comps,
    )
    sos_comps = b""
    for cid, (td, ta) in ((1, (0, 0)), (2, (1, 1)), (3, (1, 1))):
        sos_comps += bytes([cid, (td << 4) | ta])
    sos = _marker(0xDA, bytes([3]) + sos_comps + bytes([0, 63, 0]))
    app0 = _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")

    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qt_l)
        + dqt(1, qt_c)
        + sof
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )


# ------------------------------------------------------------- decode


class _HuffDecoder:
    """Canonical Huffman decoder state: per-length min/max codes."""

    def __init__(self, bits, vals):
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        self.vals = list(vals)
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def decode_symbol(self, h: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if h.maxcode[length] >= code >= h.mincode[length]:
                return h.vals[h.valptr[length] + code - h.mincode[length]]
        raise ValueError("bad Huffman code in JPEG stream")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline 4:4:4 JPEG bytes → (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    h = w = 0
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_sel: list[tuple[int, int]] = []  # (dc table id, ac table id)
    scan_data = None
    while pos < len(data):
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG stream")
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at byte {pos}")
        tag = data[pos + 1]
        if tag == 0xD9:  # EOI
            break
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG stream")
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        seg = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if tag == 0xDB:  # DQT (may hold several tables)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                zz = np.frombuffer(seg[o + 1 : o + 65], dtype=np.uint8).astype(
                    np.int64
                )
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat
                o += 65
        elif tag == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                cls, tid = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                n = sum(bits)
                vals = list(seg[o + 17 : o + 17 + n])
                htables[(cls, tid)] = _HuffDecoder(bits, vals)
                o += 17 + n
        elif tag == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc != 3:
                raise ValueError("only 3-component JPEG supported")
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 sampling supported")
                comps.append((cid, tq))
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif tag == 0xDD:
            raise ValueError("restart intervals not supported")
        elif tag == 0xDA:  # SOS — entropy data follows to EOI
            ns = seg[0]
            for c in range(ns):
                _cid, sel = seg[1 + 2 * c : 3 + 2 * c]
                scan_sel.append((sel >> 4, sel & 0xF))
            # unstuff 0xFF00 and stop at the next marker
            raw = bytearray()
            p = pos
            while p < len(data):
                b = data[p]
                if b == 0xFF:
                    nxt = data[p + 1]
                    if nxt == 0x00:
                        raw.append(0xFF)
                        p += 2
                        continue
                    break  # a real marker (EOI)
                raw.append(b)
                p += 1
            scan_data = bytes(raw)
            pos = p
        # other markers (APPn, COM) are skipped by the generic length hop

    if scan_data is None or not comps:
        raise ValueError("JPEG stream missing SOS/SOF")
    by, bx = (h + 7) // 8, (w + 7) // 8
    nblocks = by * bx
    reader = _BitReader(scan_data)
    coefs = [np.zeros((nblocks, 64), dtype=np.float64) for _ in comps]
    pred = [0] * len(comps)
    for bidx in range(nblocks):
        for ci in range(len(comps)):
            dc_h = htables[(0, scan_sel[ci][0])]
            ac_h = htables[(1, scan_sel[ci][1])]
            size = reader.decode_symbol(dc_h)
            diff = _extend(reader.read_bits(size), size)
            pred[ci] += diff
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                rs = reader.decode_symbol(ac_h)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                zz[k] = _extend(reader.read_bits(size), size)
                k += 1
            q = qtables[comps[ci][1]]
            nat = np.empty(64, dtype=np.float64)
            nat[ZIGZAG] = zz * q[ZIGZAG]
            coefs[ci][bidx] = nat

    planes = []
    for ci in range(len(comps)):
        blocks = coefs[ci].reshape(-1, 8, 8)
        spatial = np.einsum("ji,njk,kl->nil", _C, blocks, _C) + 128.0
        spatial = np.clip(np.floor(spatial + 0.5), 0, 255)
        planes.append(_from_blocks(spatial, by, bx, h, w))
    ycc = np.stack(planes, axis=-1)
    return ycbcr_to_rgb(ycc)
