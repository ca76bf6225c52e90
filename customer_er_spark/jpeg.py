"""Baseline sequential JPEG (ITU-T T.81) encoder/decoder in pure
numpy/stdlib — no libjpeg in this container.

Scope (honest, documented): 8-bit baseline DCT, Huffman entropy coding
with the standard Annex K tables, grayscale (1 component) and 4:4:4 YCbCr
(3 components, no chroma subsampling).  The decoder rejects progressive
scans, arithmetic coding, 12-bit depth and subsampled chroma with a clear
error instead of guessing.  This makes the engine's lossy decoded-pixel
invariant (PSNR >= 40dB, BASELINE.json input_hint) bite on a real-world
interchange format rather than only the homemade qpng.

Quality scaling follows the libjpeg convention (quality 1-100 scales the
Annex K quantization tables); the default quality 92 keeps re-encode PSNR
comfortably above the 40dB budget.

References: ITU-T T.81 Annex F (sequential DCT), Annex K (example tables).
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K quantization tables (natural, row-major) -----------------------
QT_LUMA = np.array(
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
    dtype=np.int32,
).reshape(8, 8)

QT_CHROMA = np.array(
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
    dtype=np.int32,
).reshape(8, 8)

# zigzag scan order: ZIGZAG[k] = flat index (row*8+col) of the k-th coeff
_zz = []
for s in range(15):
    idxs = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
    if s % 2 == 0:
        idxs = idxs[::-1]
    _zz.extend(i * 8 + j for i, j in idxs)
ZIGZAG = np.array(_zz, dtype=np.int64)

# --- Annex K Huffman table specs: (BITS[1..16], HUFFVAL) --------------------
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


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# orthonormal 8x8 DCT-II basis (JPEG's FDCT/IDCT definition)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.sqrt(0.25) * np.cos((2 * _x + 1) * _u * np.pi / 16)
_C[0, :] *= 1 / np.sqrt(2)


def _fdct2(blocks: np.ndarray) -> np.ndarray:
    """(n,8,8) spatial -> (n,8,8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)


def _idct2(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("xu,nuv,yv->nxy", _C.T, coefs, _C.T)


def scaled_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., 0].astype(np.float64), img[..., 1].astype(np.float64),
               img[..., 2].astype(np.float64))
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


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, code bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _encode_block(
    bw: _BitWriter, zz: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    dc = int(zz[0])
    s, code = _magnitude(dc - pred)
    c, ln = dc_codes[s]
    bw.write(c, ln)
    if s:
        bw.write(code, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        s, code = _magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(code, s)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return dc


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """pad to multiples of 8 (edge replicate) and split into (n,8,8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = p.shape
    return (
        p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8),
        H // 8,
        W // 8,
    )


def jpeg_encode(img: np.ndarray, quality: int = 92) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("jpeg_encode expects HxW or HxWx3 uint8")
    h, w = img.shape[:2]
    qt_l = scaled_quant_table(QT_LUMA, quality)
    qt_c = scaled_quant_table(QT_CHROMA, quality)

    planes = (
        [img.astype(np.float64)]
        if gray
        else [p for p in np.moveaxis(_rgb_to_ycbcr(img), -1, 0)]
    )
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    quantized = []
    for ci, plane in enumerate(planes):
        blocks, _, _ = _component_blocks(plane)
        coefs = _fdct2(blocks - 128.0)
        qt = qt_l if ci == 0 else qt_c
        q = np.round(coefs / qt).astype(np.int32)
        quantized.append(q.reshape(-1, 64)[:, ZIGZAG])

    bw = _BitWriter()
    preds = [0] * len(planes)
    n_blocks = quantized[0].shape[0]
    for b in range(n_blocks):  # 4:4:4 -> one block per component per MCU
        for ci in range(len(planes)):
            dc_codes, ac_codes = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            preds[ci] = _encode_block(
                bw, quantized[ci][b], preds[ci], dc_codes, ac_codes
            )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(
            int(x) for x in table.reshape(64)[ZIGZAG]
        ))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 4:4:4
    out += seg(0xFFC0, sof)
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed 0xFF
                else:
                    # a real marker (EOI) — stop consuming, pad with 1s
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_huff(self, lookup: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            sym = lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtable id)
    scan: list[tuple[int, int, int]] = []   # (comp idx, dc table, ac table)
    entropy_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (length,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + length]
        pos += length
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = np.frombuffer(payload[i + 1:i + 65], dtype=np.uint8)
                qtables[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1:i + 17])
                n = sum(bits)
                vals = list(payload[i + 17:i + 17 + n])
                codes = _canonical_codes(bits, vals)
                htables[(tc, th)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            depth = payload[0]
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            if depth != 8:
                raise ValueError("only 8-bit baseline supported")
            for ci in range(ncomp):
                cid, samp, tq = payload[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError(
                        "subsampled chroma unsupported (4:4:4 only)"
                    )
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} "
                             "(progressive/extended/arithmetic)")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            if ns != len(comps):
                # the entropy loop below assumes ONE fully interleaved scan
                # covering all SOF components; a non-interleaved baseline
                # file (one SOS per component) would decode as garbage, so
                # honor the module contract: clear error, never guess
                raise ValueError(
                    f"non-interleaved scan unsupported ({ns} of "
                    f"{len(comps)} components in SOS)"
                )
            for si in range(ns):
                cs, tt = payload[1 + 2 * si], payload[2 + 2 * si]
                idx = next(i for i, c in enumerate(comps) if c[0] == cs)
                scan.append((idx, tt >> 4, tt & 0xF))
            entropy_start = pos
            break
    if entropy_start is None or not comps:
        raise ValueError("truncated jpeg (no scan)")

    br = _BitReader(data[entropy_start:])
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    n_blocks = bh * bw_
    coefs = [np.zeros((n_blocks, 64), dtype=np.float64) for _ in comps]
    preds = [0] * len(comps)
    for b in range(n_blocks):
        for (ci, dc_id, ac_id) in scan:
            dc_lut = htables[(0, dc_id)]
            ac_lut = htables[(1, ac_id)]
            s = br.read_huff(dc_lut)
            diff = _extend(br.read_bits(s), s) if s else 0
            preds[ci] += diff
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = preds[ci]
            k = 1
            while k < 64:
                rs = br.read_huff(ac_lut)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(br.read_bits(s), s)
                k += 1
            qt = qtables[comps[ci][2]]
            blk = np.zeros(64, dtype=np.float64)
            blk[ZIGZAG] = zz * qt.reshape(64)[ZIGZAG]
            coefs[ci][b] = blk

    planes = []
    for ci in range(len(comps)):
        spatial = _idct2(coefs[ci].reshape(-1, 8, 8)) + 128.0
        full = (
            spatial.reshape(bh, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        planes.append(full[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
