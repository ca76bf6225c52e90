"""Caption/text utilities: normalization (Spark-side column expression),
suffix-array longest-common-substring, and the verification pandas UDF.

The reference scores string fields with Zingg's FUZZY MatchType
(/root/reference/02_Initial_Workflow_Part_A.py:132-136 — black box);
our deterministic replacement is an exact-equality short-circuit plus a
suffix-array longest-common-substring ratio (north_rule names this
algorithm explicitly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_caption(col: Column) -> Column:
    """lower + collapse whitespace + strip; pure Catalyst expressions."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


# ---------------------------------------------------------------------------
# suffix-array longest common substring
# ---------------------------------------------------------------------------


def _suffix_array(s: np.ndarray) -> np.ndarray:
    """O(n log^2 n) prefix-doubling suffix array over an int array."""
    n = len(s)
    rank = np.asarray(s, dtype=np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        sa = order
        tmp[sa[0]] = 0
        prev = sa[:-1]
        cur = sa[1:]
        changed = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        tmp[cur] = np.cumsum(changed)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def _lcp_kasai(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    n = len(s)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: str, b: str) -> int:
    """Length (in CODEPOINTS) of the longest common substring via suffix
    array + Kasai LCP over a#b with a unique separator.

    Codepoints, not utf-8 bytes: lcs_ratio divides by a character-level
    max(len), so the numerator must be in the same units or multibyte
    overlap is overweighted (ratio could exceed 1.0 for non-ASCII)."""
    if not a or not b:
        return 0
    ab = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) + 2
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) + 2
    s = np.concatenate([ab, np.array([1], dtype=np.int64), bb])
    na = len(ab)
    sa = _suffix_array(s)
    lcp = _lcp_kasai(s, sa)
    from_a = sa < na  # per SA position: suffix starts in a
    diff = from_a[1:] != from_a[:-1]
    if not diff.any():
        return 0
    return int(lcp[1:][diff].max())


def lcs_ratio(a: str | None, b: str | None) -> float:
    """LCS length / max(len) in [0,1]; 1.0 iff one contains the other fully
    and lengths match, ~ similarity of near-identical captions."""
    a = a or ""
    b = b or ""
    if a == b:
        return 1.0
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    return longest_common_substring(a, b) / m


@F.pandas_udf(T.DoubleType())
def lcs_ratio_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    # exact-equality pairs are filtered out Spark-side before this UDF runs;
    # still cheap-guard here for safety.
    return pd.Series(
        [lcs_ratio(l, r) for l, r in zip(left, right)], dtype="float64"
    )
