"""Deterministic 64-bit hashing kernels (numpy, overflow-wrapping).

splitmix64 finalizer for avalanche mixing, a polynomial rolling hash for
character shingles, and seeded per-permutation mixing keys for MinHash.

Implementation note: all arithmetic runs on **int64** arrays (two's
complement wraparound — bit-identical to uint64 for xor/add/multiply), with
logical right shifts done through a free uint64 view.  This numpy build
dispatches uint64 binary ufuncs to a ~100x slower scalar loop than int64
(measured: 16M-element uint64 xor 5.3s vs int64 0.046s), so staying in
int64 is what makes the MinHash kernel batch-speed.
"""

from __future__ import annotations

import numpy as np

_C1 = np.int64(np.uint64(0xBF58476D1CE4E5B9).astype(np.int64))
_C2 = np.int64(np.uint64(0x94D049BB133111EB).astype(np.int64))
_C3 = np.int64(np.uint64(0xFF51AFD7ED558CCD).astype(np.int64))
_GOLDEN = np.int64(np.uint64(0x9E3779B97F4A7C15).astype(np.int64))
_FNV_PRIME = np.int64(1099511628211)
_FNV_OFFSET = np.int64(np.uint64(14695981039346656037).astype(np.int64))


def lshr(a: np.ndarray, k: int) -> np.ndarray:
    """Logical (unsigned) right shift of an int64 array — uint64-view shift
    is fast on every numpy build; int64 >> would sign-extend."""
    return (a.view(np.uint64) >> np.uint64(k)).view(np.int64)


def splitmix64(z: np.ndarray) -> np.ndarray:
    """Avalanche finalizer of splitmix64 (public-domain PRNG by Steele et al.).

    Accepts/returns int64 arrays (bit pattern identical to the canonical
    uint64 formulation).
    """
    z = np.asarray(z).astype(np.int64, copy=True)
    with np.errstate(over="ignore"):
        z ^= lshr(z, 30)
        z *= _C1
        z ^= lshr(z, 27)
        z *= _C2
        z ^= lshr(z, 31)
    return z


def mix_keys(n: int, seed: int) -> np.ndarray:
    """n deterministic int64 mixing keys derived from seed."""
    idx = np.arange(1, n + 1, dtype=np.int64)
    with np.errstate(over="ignore"):
        return splitmix64(idx * _GOLDEN + np.int64(np.uint64(seed % (1 << 64)).astype(np.int64)))


def murmur_mix(z: np.ndarray) -> np.ndarray:
    """MurmurHash3 fmix64 finalizer over int64 arrays."""
    with np.errstate(over="ignore"):
        z = z ^ lshr(z, 33)
        z = z * _C3
        z = z ^ lshr(z, 33)
    return z


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """int64 hashes of all k-char shingles of `text` (deduplicated).

    FNV-1a-style polynomial over utf-8 bytes, vectorized across shingle
    positions (k passes over the codes array, no per-shingle Python loop).
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(data) - k + 1
    if n <= 0:
        acc = _FNV_OFFSET
        with np.errstate(over="ignore"):
            for b in data:
                acc = (acc ^ np.int64(b)) * _FNV_PRIME
        return splitmix64(np.array([acc], dtype=np.int64))
    acc = np.full(n, _FNV_OFFSET, dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = (acc ^ data[j:j + n].astype(np.int64)) * _FNV_PRIME
    return np.unique(splitmix64(acc))


def token_hashes(text: str) -> np.ndarray:
    """int64 hash per whitespace token (duplicates kept, for SimHash)."""
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.int64)
    out = np.empty(len(toks), dtype=np.int64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(toks):
            acc = _FNV_OFFSET
            for b in t.encode("utf-8"):
                acc = (acc ^ np.int64(b)) * _FNV_PRIME
            out[i] = acc
    return splitmix64(out)
