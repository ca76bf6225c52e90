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
    """Reference implementation of the marker heuristic (kept as the test
    twin of the Catalyst expression in language_id)."""
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


def _marker_score(t, markers: tuple[str, ...]):
    """Non-overlapping occurrence count of each marker, summed — expressed
    as (length(t) - length(replace(t, m))) / len(m), the same greedy
    left-to-right count Python's str.count produces.  Pure Catalyst, and
    replayable verbatim in any SQL engine."""
    score = F.lit(0.0)
    for m in markers:
        score = score + (F.length(t) - F.length(F.replace(t, F.lit(m)))) / F.lit(
            float(len(m))
        )
    return score


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred) — marker-count argmax, ties broken by
    lexicographically smallest language, 'unknown' when no marker hits.
    Pure Catalyst expressions (no UDF), matching lang_id_udf exactly."""
    t = F.concat(F.lit(" "), F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(" "))
    scores = {
        lang: _marker_score(t, marks) for lang, marks in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang in sorted(scores):  # first max in sorted order wins ties
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return docs.select(F.col(id_col), pred.alias("lang_pred"))


@F.pandas_udf(T.LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """GLOBAL-min shingle hash (rolling polynomial, k=8).  NOT winnowing —
    a single edit anywhere can flip it; kept as the cheap whole-document
    `min_shingle_hash` summary.  Robust per-window fingerprints are
    winnow_fingerprints below."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        hs = shingle_hashes((t or "").lower(), 8)
        out[i] = np.int64(hs.min().astype(np.int64)) if len(hs) else 0
    return pd.Series(out)


def min_shingle_hash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), fingerprint_udf(F.col(text_col)).alias("min_shingle_hash"))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """True winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every k-gram of the normalized text (md5 — deterministic and
    SQL-replayable), slide a w-gram window over the hash sequence, keep
    each window's minimum; the doc's fingerprint set is the distinct
    window minima.  Guarantee: any shared substring of length >= k + w - 1
    yields a shared fingerprint, and a single edit perturbs at most the
    k + w - 1 windows that overlap it.

    Output (doc_id, fp) — one row per distinct fingerprint.  Docs shorter
    than k + w - 1 chars (no complete window) produce no rows.  Pure
    Catalyst: positions explode -> substring -> md5 -> min over a
    ROWS-based window frame; the DuckDB oracle replays it verbatim.
    """
    from customer_er_spark.functions.text import normalize_caption
    from pyspark.sql import Window

    n_grams = F.length("t") - (k - 1)
    grams = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            normalize_caption(F.col(text_col)).alias("t"),
        )
        .where(F.length("t") >= k + w - 1)
        .select(
            "doc_id",
            n_grams.alias("n_grams"),
            F.explode(F.sequence(F.lit(1), n_grams)).alias("p"),
            "t",
        )
        .select(
            "doc_id",
            "n_grams",
            "p",
            F.md5(F.substring(F.col("t"), F.col("p"), k)).alias("gh"),
        )
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        grams.withColumn("fp", F.min("gh").over(win))
        .where(F.col("p") <= F.col("n_grams") - (w - 1))  # complete windows only
        .select("doc_id", "fp")
        .distinct()
    )
