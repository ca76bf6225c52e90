"""64-bit perceptual hash (pHash) in pure numpy.

Classic DCT pHash: resize to 32x32 grayscale (area mean), 2-D DCT-II,
take the top-left 8x8 low-frequency block, threshold at its median,
pack 64 bits into a signed int64 (two's complement, Spark LongType).

Fully vectorized over a batch of images — this is the kernel inside the
signature-stage pandas UDF.  The reference's analog is Zingg's learned
per-field blocking/compare functions (black box, see SURVEY.md §2.B B5/B6);
ours is deterministic so the same input always yields the same bands.
"""

from __future__ import annotations

import numpy as np

_N = 32
_K = 8


def _dct_basis(n: int = _N) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    basis = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    basis[0] *= 1 / np.sqrt(2)
    return basis * np.sqrt(2 / n)


_BASIS = _dct_basis()


def to_gray(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 3:
        if img.shape[2] == 3:
            img = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
        else:
            img = img[:, :, 0]
    return img


def resize_area(img: np.ndarray, out_h: int = _N, out_w: int = _N) -> np.ndarray:
    """Deterministic area-mean resize (nearest-bin averaging)."""
    h, w = img.shape
    ys = (np.arange(out_h + 1) * h / out_h).round().astype(int)
    xs = (np.arange(out_w + 1) * w / out_w).round().astype(int)
    ys = np.clip(ys, 0, h)
    xs = np.clip(xs, 0, w)
    out = np.empty((out_h, out_w), dtype=np.float64)
    # cumulative-sum trick: area means via 2-D integral image (no Python per-pixel loop)
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = np.cumsum(np.cumsum(img, axis=0), axis=1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    y1 = np.clip(y1, 0, h)
    x1 = np.clip(x1, 0, w)
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    out = (
        ii[np.ix_(y1, x1)] - ii[np.ix_(y0, x1)] - ii[np.ix_(y1, x0)] + ii[np.ix_(y0, x0)]
    ) / np.maximum(areas, 1)
    return out


def phash64(img: np.ndarray) -> int:
    """pHash of one image (any HxW or HxWxC uint8 array) -> signed int64."""
    g = resize_area(to_gray(img))
    d = _BASIS @ g @ _BASIS.T
    block = d[:_K, :_K].copy()
    flat = block.flatten()
    med = np.median(flat[1:])  # exclude DC term from the median
    bits = (flat > med).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def phash64_batch(gray_batch: np.ndarray) -> np.ndarray:
    """Vectorized pHash over a (B, 32, 32) float batch -> (B,) int64."""
    d = np.einsum("ij,bjk,lk->bil", _BASIS, gray_batch, _BASIS)
    flat = d[:, :_K, :_K].reshape(len(gray_batch), _K * _K)
    med = np.median(flat[:, 1:], axis=1, keepdims=True)
    bits = (flat > med).astype(np.int64)
    # int64 arithmetic with wraparound (uint64 binary ufuncs are slow on
    # this numpy build); bit 0 (the MSB weight) wraps to int64 min, which
    # matches the two's-complement packing of phash64()
    weights = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)).view(np.int64)
    with np.errstate(over="ignore"):
        return (bits * weights).sum(axis=1).astype(np.int64)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
