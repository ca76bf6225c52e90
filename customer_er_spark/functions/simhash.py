"""SimHash (64-bit) over whitespace tokens — batch kernel + pandas UDF.

Near-duplicate texts land within a small Hamming distance; used both as an
auxiliary band source for captions and as the `simhash_dedup` operator on
the documents table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from customer_er_spark.functions.hashing import token_hashes

_BITS = np.arange(64, dtype=np.uint64)


def simhash64(text: str | None) -> int:
    h = token_hashes(text or "")
    if len(h) == 0:
        return 0
    # uint64 view for the (fast) shifts, int64 view for the (fast) mask —
    # uint64 binary ufuncs hit a slow path on this numpy build
    shifted = (h.view(np.uint64)[:, None] >> _BITS[None, :]).view(np.int64)
    bits = shifted & np.int64(1)  # (T, 64)
    votes = bits * 2 - 1
    acc = votes.sum(axis=0)
    val = 0
    for i in range(64):
        if acc[i] > 0:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def simhash_batch(texts) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        out[i] = simhash64(t)
    return out


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return pd.Series(simhash_batch(texts))
