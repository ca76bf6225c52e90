"""MinHash signatures over character shingles — batch-vectorized kernel
plus the Arrow pandas UDF the signature stage uses.

Replaces the learned blocking of the reference's Zingg `findTrainingData`/
`train` phases (/root/reference/02_Initial_Workflow_Part_A.py:167-191,
02B:229 — black-box "blocking tree") with deterministic MinHash LSH:
same config -> same signature -> same bands on every run, which is what
makes checkpoint/resume and the recall>=0.99-at-fixed-config contract
possible.

Kernel layout: all shingles of a batch are concatenated into one flat
uint64 array; each hash-permutation chunk mixes the whole flat array at
once and `np.minimum.reduceat` takes per-document minima — no per-row
Python work beyond shingling itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from customer_er_spark.functions.hashing import mix_keys, murmur_mix, shingle_hashes

_HASH_CHUNK = 16  # permutations mixed per pass; bounds peak memory to
                  # _HASH_CHUNK * total_shingles uint64s per Arrow batch


def minhash_batch(
    texts: "pd.Series | list[str]",
    k: int,
    num_hashes: int,
    seed: int,
) -> np.ndarray:
    """(B, num_hashes) int64 MinHash signatures for a batch of strings."""
    keys = mix_keys(num_hashes, seed)
    shingle_arrays = [shingle_hashes(t if t is not None else "", k) for t in texts]
    lens = np.array([len(a) for a in shingle_arrays], dtype=np.int64)
    flat = (
        np.concatenate(shingle_arrays)
        if shingle_arrays
        else np.zeros(0, dtype=np.int64)
    )
    n_docs = len(lens)
    # int64 throughout (see functions/hashing.py); "infinity" sentinel for
    # empty docs = int64 max
    sig = np.full((n_docs, num_hashes), np.iinfo(np.int64).max, dtype=np.int64)
    if len(flat):
        offsets = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        nonempty = lens > 0
        # reduceat needs strictly valid segment starts; empty docs keep max
        starts = offsets[nonempty]
        # In-place mixing into two reused buffers: large fresh allocations
        # page-fault expensively in sandboxed kernels, so the hot loop must
        # not allocate.  Per permutation: murmur fmix64 (shift/xor/mult) of
        # flat^key, then segment-min via reduceat.
        buf = np.empty_like(flat)
        tmp = np.empty_like(flat)
        C3 = np.int64(np.uint64(0xFF51AFD7ED558CCD).astype(np.int64))
        bu = buf.view(np.uint64)
        tu = tmp.view(np.uint64)
        with np.errstate(over="ignore"):
            for h in range(num_hashes):
                np.bitwise_xor(flat, keys[h], out=buf)
                np.right_shift(bu, np.uint64(33), out=tu)
                np.bitwise_xor(buf, tmp, out=buf)
                np.multiply(buf, C3, out=buf)
                np.right_shift(bu, np.uint64(33), out=tu)
                np.bitwise_xor(buf, tmp, out=buf)
                # reduceat segment i spans starts[i]..starts[i+1]; the last
                # spans to the end of flat — correct because empty docs are
                # excluded via `nonempty`.
                sig[nonempty, h] = np.minimum.reduceat(buf, starts)
    return sig


def make_minhash_udf(k: int, num_hashes: int, seed: int):
    """pandas UDF: caption string -> array<long> MinHash signature."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(captions: pd.Series) -> pd.Series:
        sig = minhash_batch(captions, k, num_hashes, seed)
        return pd.Series(list(sig))

    return minhash_udf


def jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(np.asarray(sig_a) == np.asarray(sig_b)))
