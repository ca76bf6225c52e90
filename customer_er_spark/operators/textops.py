"""Text-analysis operators for a training-data pipeline: token counting,
quality scoring, language-ID, document fingerprinting.

Counting/ratio operators are pure Catalyst expressions (integer outputs, so
the DuckDB oracle matches bit-for-bit); language-ID and fingerprints use the
deterministic hash kernels via pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from customer_er_spark.functions.hashing import shingle_hashes


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (runs of word chars / digits /
    punctuation each count as one token) — integer outputs only."""
    t = F.trim(F.col(text_col))
    ws = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    bpe = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.regexp_replace(t, r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])", "$1 ")), r"\s+"))
    )
    return docs.select(
        F.col(id_col),
        ws.alias("n_tokens_ws").cast("int").alias("n_tokens_ws"),
        bpe.cast("int").alias("n_tokens_bpe"),
    )


def quality_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Integer quality signals: chars, alpha chars, digits, punctuation,
    stopword hits.  Ratios are left to the consumer so every column hashes
    identically in the oracle."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = n_chars - F.length(F.regexp_replace(t, r"[a-zA-Z]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_space = n_chars - F.length(F.regexp_replace(t, r"\s", ""))
    n_punct = n_chars - n_alpha - n_digit - n_space
    stop = r"(?i)\b(the|a|an|and|or|of|to|in|is|it)\b"
    n_stop = F.size(F.split(t, stop)) - 1
    return docs.select(
        F.col(id_col),
        n_chars.cast("int").alias("n_chars_q"),
        n_alpha.cast("int").alias("n_alpha"),
        n_digit.cast("int").alias("n_digit"),
        n_punct.cast("int").alias("n_punct"),
        n_stop.cast("int").alias("n_stop"),
    )


# character-frequency profiles per language (tiny n-gram heuristic; the
# container has no langid lib — deterministic and test-stable)
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of ", " is ", "ing "),
    "es": (" el ", " la ", " de ", " que ", "ción"),
    "fr": (" le ", " la ", " de ", " est ", " les "),
    "de": (" der ", " die ", " und ", " ist ", "sch"),
}


@F.pandas_udf(T.StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    out = []
    for t in texts:
        t = f" {(t or '').lower()} "
        scores = {
            lang: sum(t.count(m) for m in marks)
            for lang, marks in _LANG_MARKERS.items()
        }
        best = max(sorted(scores), key=lambda k: scores[k])
        out.append(best if scores[best] > 0 else "unknown")
    return pd.Series(out)


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), lang_id_udf(F.col(text_col)).alias("lang_pred"))


@F.pandas_udf(T.LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Winnowing-style document fingerprint: min shingle hash (rolling
    polynomial, k=8) — stable under whitespace-preserving edits elsewhere."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        hs = shingle_hashes((t or "").lower(), 8)
        out[i] = np.int64(hs.min().astype(np.int64)) if len(hs) else 0
    return pd.Series(out)


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), fingerprint_udf(F.col(text_col)).alias("fingerprint"))
