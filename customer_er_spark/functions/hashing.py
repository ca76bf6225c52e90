"""Deterministic uint64 hashing kernels (numpy, overflow-wrapping).

splitmix64 finalizer for avalanche mixing, a polynomial rolling hash for
character shingles, and seeded per-permutation mixing keys for MinHash.
All operate on uint64 arrays with C wraparound semantics — no Python-int
bigmath, fully vectorizable inside Arrow batches.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


def splitmix64(z: np.ndarray) -> np.ndarray:
    """Avalanche finalizer of splitmix64 (public-domain PRNG by Steele et al.)."""
    z = np.asarray(z, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        z ^= z >> np.uint64(30)
        z *= _C1
        z ^= z >> np.uint64(27)
        z *= _C2
        z ^= z >> np.uint64(31)
    return z


def mix_keys(n: int, seed: int) -> np.ndarray:
    """n deterministic uint64 mixing keys derived from seed."""
    idx = np.arange(1, n + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return splitmix64(idx * _GOLDEN + np.uint64(seed))


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 hashes of all k-char shingles of `text` (deduplicated).

    FNV-1a-style polynomial over utf-8 bytes, vectorized across shingle
    positions (k passes over the codes array, no per-shingle Python loop).
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(data) - k + 1
    if n <= 0:
        # shorter than one shingle: hash the whole string once
        acc = _FNV_OFFSET
        with np.errstate(over="ignore"):
            for b in data:
                acc = (acc ^ np.uint64(b)) * _FNV_PRIME
        return splitmix64(np.array([acc], dtype=np.uint64))
    acc = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = (acc ^ data[j:j + n].astype(np.uint64)) * _FNV_PRIME
    return np.unique(splitmix64(acc))


def token_hashes(text: str) -> np.ndarray:
    """uint64 hash per whitespace token (with duplicates kept, for SimHash)."""
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    out = np.empty(len(toks), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(toks):
            acc = _FNV_OFFSET
            for b in t.encode("utf-8"):
                acc = (acc ^ np.uint64(b)) * _FNV_PRIME
            out[i] = acc
    return splitmix64(out)
