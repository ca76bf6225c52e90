"""Pretraining-corpus preparation operators: PII scrubbing, boilerplate
(stop-gram) detection, deterministic mixture sampling, and GPT-style
sequence packing.

These sit downstream of the dedup/quality family (`dedup.py`,
`textops.py`) in a training-data pipeline: after near-dups are dropped
and quality stats computed, a corpus is scrubbed, re-weighted per
source/language, and packed into fixed-length training sequences.  The
reference (customer-er) stops at entity resolution; this module is the
corpus-side continuation SURVEY.md §2's LLM-pipeline table tracks.

Everything here is pure Catalyst (no UDFs) with integer/string outputs,
so the DuckDB oracles in `__spark_entry__.py` replay bit-for-bit.  The
shared regex/threshold constants are module-level so the oracle SQL is
built from the SAME strings the Spark plan compiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# PII patterns — deliberately conservative subsets valid (and identically
# interpreted: no backrefs, no lookaround, fixed-width classes) in both
# Java regex (Spark) and RE2 (DuckDB).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def pii_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, text_redacted): per-doc PII
    hit counts plus the scrubbed text (matches replaced, in a fixed
    email -> ipv4 -> phone order, by <EMAIL>/<IP>/<PHONE> tokens).

    Counts are taken on the ORIGINAL text, then redaction applies
    sequentially — the email pattern cannot match a bare IPv4 (its TLD is
    alphabetic), so the passes never steal each other's matches.

    Scale shape: narrow projection, zero shuffles — runs inside the scan
    stage's whole-stage codegen at any corpus size.
    """
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("int").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                IPV4_RE,
                "<IP>",
            ),
            PHONE_RE,
            "<PHONE>",
        ).alias("text_redacted"),
    )


def stopgram_df(
    docs: DataFrame,
    n: int = 2,
    min_df: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(gram, df): word-n-grams whose DOCUMENT frequency is >= min_df —
    the boilerplate/stop-gram detector (CCNet-style): grams shared by a
    large fraction of documents are template/boilerplate text, and the
    caller strips or down-weights them.

    Scale shape: distinct-per-doc then one hash aggregate on gram;
    map-side partial aggregation absorbs the per-doc explosion, and the
    output is bounded by the gram vocabulary, not the corpus.
    """
    from customer_er_spark.operators.textops import word_grams

    return (
        word_grams(docs, n, id_col, text_col)
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").cast("int").alias("df"))
        .where(F.col("df") >= min_df)
    )


def hash_rate_threshold(rate: float) -> str:
    """8-hex-digit threshold for a deterministic keep-if-below sample at
    `rate`: a row is kept when the first 8 hex chars of md5(id) compare
    lexicographically below this string.  Exact for rates that are
    multiples of 16^-8 (~4e-10) — effectively any practical rate."""
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    strat_col: str = "lang",
) -> DataFrame:
    """Deterministic per-stratum hash sampling — the mixture-weighting
    primitive of corpus assembly (e.g. up-weight books, down-weight web).
    A row is kept iff md5(id)'s 8-hex prefix falls below its stratum's
    rate threshold: reproducible across runs/engines, no RNG state, and
    a row's fate never depends on partitioning.

    Scale shape: a filter — fully pushed into the scan stage.
    """
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    thr = F.lit(hash_rate_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strat_col) == stratum, F.lit(hash_rate_threshold(rate))
        ).otherwise(thr)
    return docs.where(key < thr)


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shard, chunk_id, tok_in_chunk, start_off): GPT-style
    concat-and-chunk packing.  Within each shard, documents are laid out
    contiguously in doc-id order and the token stream is cut every
    `seq_len` tokens; a document straddling a cut emits one row per chunk
    it touches, with the token count it contributes to that chunk.
    `sum(tok_in_chunk)` per (shard, chunk_id) is exactly seq_len except
    each shard's final chunk — the packing invariant the test asserts.

    Sharding is the scale story: a single global token order would be one
    executor's window.  Packing independently inside `n_shards` id-modulo
    shards keeps every window partition-local (one shuffle by shard),
    mirrors how training jobs shard their corpus anyway, and lets
    `n_shards` scale with the cluster.  Zero-token docs emit nothing.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col).cast("long") % n_shards).alias("shard"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        .cast("long")
        .alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)

    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid = toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off"),
    )
    end = F.col("start_off") + F.col("n_tokens")  # exclusive
    first_c = F.floor(F.col("start_off") / seq_len)
    last_c = F.floor((end - 1) / seq_len)
    return laid.select(
        "doc_id",
        "shard",
        "start_off",
        F.explode(F.sequence(first_c, last_c)).alias("chunk_id"),
        end.alias("_end"),
    ).select(
        "doc_id",
        F.col("shard").cast("int").alias("shard"),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        (
            F.least(F.col("_end"), (F.col("chunk_id") + 1) * F.lit(seq_len))
            - F.greatest(F.col("start_off"), F.col("chunk_id") * F.lit(seq_len))
        )
        .cast("int")
        .alias("tok_in_chunk"),
        F.col("start_off").cast("long").alias("start_off"),
    )
