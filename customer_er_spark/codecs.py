"""Pure-numpy/stdlib image codecs + PSNR.

The container has no PIL/cv2, so the engine ships a minimal, deterministic
codec layer used by datagen and by the verification stage's decoded-pixel
invariant (BASELINE.json input_hint: decoded-pixel allclose, PSNR>=40dB for
lossy formats, exact for lossless).

Formats:
    raw   — uncompressed: 8-byte header (H,W,C uint16 each + magic) + uint8 pixels
    png   — real PNG (zlib, filter 0, 8-bit grayscale or RGB); round-trips
            through any standard PNG reader
    qpng  — quantize pixels to step Q then png-encode: a deterministic lossy
            stand-in (quantization error <= Q/2 -> PSNR ~46.9dB at Q=4,
            above the 40dB invariant)

Everything here is plain numpy on byte arrays — called only from inside
Arrow-batched pandas UDFs (never per-row Python UDFs) or driver-side datagen.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

RAW_MAGIC = b"RW01"
QPNG_STEP = 4

# ---------------------------------------------------------------------------
# raw
# ---------------------------------------------------------------------------


def raw_encode(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    return RAW_MAGIC + struct.pack(">HHH", h, w, c) + img.tobytes()


def raw_decode(data: bytes) -> np.ndarray:
    if data[:4] != RAW_MAGIC:
        raise ValueError("not a raw image")
    h, w, c = struct.unpack(">HHH", data[4:10])
    img = np.frombuffer(data[10:10 + h * w * c], dtype=np.uint8).reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


# ---------------------------------------------------------------------------
# png (8-bit grayscale / RGB, filter 0 on encode, filters 0-4 on decode)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError(f"unsupported channel count {c}")
    color_type = 0 if c == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to every scanline
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * c)], axis=1
    )
    idat = zlib.compress(scanlines.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # up
            rec = (line + prev) & 0xFF
        else:  # sub(1) / average(3) / paeth(4) need sequential left-neighbor
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    cc = int(out[y - 1, x - bpp]) if (x >= bpp and y > 0) else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    rec[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad filter {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a png")
    pos, w = 8, 0
    h = bit_depth = color_type = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if bit_depth != 8 or color_type not in (0, 2):
        raise ValueError(f"unsupported png (depth={bit_depth}, color={color_type})")
    c = 1 if color_type == 0 else 3
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    img = _unfilter(raw, h, w * c, c).reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


# ---------------------------------------------------------------------------
# qpng (deterministic lossy path)
# ---------------------------------------------------------------------------


def qpng_encode(img: np.ndarray, step: int = QPNG_STEP) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    q = (img.astype(np.int32) // step) * step + step // 2
    return png_encode(np.clip(q, 0, 255).astype(np.uint8))


qpng_decode = png_decode  # payload is a valid PNG


# ---------------------------------------------------------------------------
# jpeg (baseline sequential DCT, pure numpy — customer_er_spark.jpeg)
# ---------------------------------------------------------------------------

def jpeg_encode(img: np.ndarray, quality: int = 92) -> bytes:
    from customer_er_spark.jpeg import jpeg_encode as _enc

    return _enc(img, quality)


def jpeg_decode(data: bytes) -> np.ndarray:
    from customer_er_spark.jpeg import jpeg_decode as _dec

    return _dec(data)


# ---------------------------------------------------------------------------
# dispatch + PSNR
# ---------------------------------------------------------------------------

ENCODERS = {
    "raw": raw_encode, "png": png_encode, "qpng": qpng_encode,
    "jpeg": jpeg_encode, "jpg": jpeg_encode,
}
DECODERS = {
    "raw": raw_decode, "png": png_decode, "qpng": qpng_decode,
    "jpeg": jpeg_decode, "jpg": jpeg_decode,
}
LOSSLESS = {"raw", "png"}


def encode(img: np.ndarray, fmt: str) -> bytes:
    return ENCODERS[fmt](img)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return DECODERS[fmt](bytes(data))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
